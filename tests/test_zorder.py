"""Z-order layout: the point is FOOTER-LEVEL data skipping — a 2-D range
query must be able to exclude most files from their parquet min/max stats
alone, which a natural (unclustered) layout cannot."""

import glob
import os

import pyarrow.parquet as pq

from orc_spark.operators.layout import write_zordered
from orc_spark.sources.tables import load_table

N_FILES = 16


def _overlap_fraction(path, lo1, hi1, lo2, hi2):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert files, path
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin1 = fmax1 = fmin2 = fmax2 = None
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                st = col.statistics
                if st is None:
                    continue
                name = col.path_in_schema
                if name == "l_partkey":
                    fmin1 = st.min if fmin1 is None else min(fmin1, st.min)
                    fmax1 = st.max if fmax1 is None else max(fmax1, st.max)
                elif name == "l_suppkey":
                    fmin2 = st.min if fmin2 is None else min(fmin2, st.min)
                    fmax2 = st.max if fmax2 is None else max(fmax2, st.max)
        if fmin1 is None or fmin2 is None:
            hit += 1  # no stats → must read
            continue
        if fmax1 >= lo1 and fmin1 <= hi1 and fmax2 >= lo2 and fmin2 <= hi2:
            hit += 1
    return hit / len(files)


def test_zorder_prunes_2d_rectangle(spark, sf_mid, tmp_path):
    li = load_table(spark, sf_mid, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    mp = li.agg({"l_partkey": "max"}).collect()[0][0]
    ms = li.agg({"l_suppkey": "max"}).collect()[0][0]
    zpath = str(tmp_path / "z")
    npath = str(tmp_path / "n")
    write_zordered(li, zpath, "l_partkey", mp, "l_suppkey", ms, n_files=N_FILES)
    li.repartition(N_FILES).write.parquet(npath)
    lo1, hi1 = mp // 4, mp // 4 + mp // 8
    lo2, hi2 = ms // 4, ms // 4 + ms // 8
    z_frac = _overlap_fraction(zpath, lo1, hi1, lo2, hi2)
    n_frac = _overlap_fraction(npath, lo1, hi1, lo2, hi2)
    # natural layout: every file spans the whole domain → ~all files read
    assert n_frac >= 0.9, n_frac
    # Morton tiles: a ~1/8 × 1/8 rectangle must exclude >= half the files
    assert z_frac <= 0.5, z_frac
    # and the layout must not lose rows
    zcount = spark.read.parquet(zpath).count()
    assert zcount == li.count()


def test_global_sort_produces_disjoint_file_ranges(spark, sf_mid, tmp_path):
    """Total ordering at scale = repartitionByRange + in-partition sort:
    every output file must cover a disjoint, ordered l_shipdate range
    (what makes a time-range scan read one file, not all of them)."""
    li = load_table(spark, sf_mid, "lineitem").select("l_orderkey", "l_shipdate")
    path = str(tmp_path / "sorted")
    (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.parquet(path)
    )
    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                if col.path_in_schema == "l_shipdate" and col.statistics:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4
    for (a_min, a_max), (b_min, b_max) in zip(ranges, ranges[1:]):
        assert a_max <= b_min, (a_max, b_min)
