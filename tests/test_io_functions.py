"""ORC/Parquet/CSV/JSON round-trips (ORC is the north-star format — pushdown
asserted on its scans), SQL-registered functions, UDTF, and the gyro offset
calibration recurrence."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from orc_spark.functions.register import register_all
from orc_spark.operators.offset_cal import gyro_offset_replay, offset_scan
from orc_spark.plans.explain import has_pushed_filters, pruned_columns
from orc_spark.sources.io import read_table, write_table
from orc_spark.sources.tables import load_table


@pytest.mark.parametrize("fmt", ["orc", "parquet", "json"])
def test_roundtrip_formats(spark, sf_small, tmp_path, fmt):
    df = load_table(spark, sf_small, "orders")
    path = str(tmp_path / fmt)
    write_table(df, path, fmt)
    back = read_table(spark, path, fmt, schema=df.schema)
    assert back.count() == df.count()
    a = df.orderBy("o_orderkey").toPandas()
    b = back.orderBy("o_orderkey").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_csv_roundtrip_lossy_types(spark, sf_small, tmp_path):
    df = load_table(spark, sf_small, "nation")
    path = str(tmp_path / "csv")
    write_table(df, path, "csv")
    back = read_table(spark, path, "csv", schema=df.schema)
    assert back.orderBy("n_nationkey").collect() == df.orderBy("n_nationkey").collect()


def test_orc_pushdown_and_pruning(spark, sf_small, tmp_path):
    """The north-star format must get predicate pushdown + column pruning."""
    df = load_table(spark, sf_small, "lineitem")
    path = str(tmp_path / "orc_li")
    write_table(df, path, "orc")
    q = (
        read_table(spark, path, "orc", schema=df.schema)
        .where(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    assert has_pushed_filters(q), "ORC scan must receive the pushed predicate"
    assert set(pruned_columns(q)) == {"l_orderkey", "l_quantity"}


def test_orc_partitioned_write_prunes(spark, sf_small, tmp_path):
    df = load_table(spark, sf_small, "orders").withColumn(
        "year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orc_part")
    write_table(df, path, "orc", partition_by=["year"])
    q = read_table(spark, path, "orc").where(F.col("year") == 1995)
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan
    got = q.count()
    exp = df.where(F.col("year") == 1995).count()
    assert got == exp


def test_registered_sql_functions(spark):
    register_all(spark)
    row = spark.sql(
        "SELECT orc_t_cdf(0.0D, 10.0D) AS c, orc_deadband(0.5D, 0.003D) AS d, "
        "orc_corner(1000.0D, 0.0D, 0.0D).act1 AS a1"
    ).collect()[0]
    assert row["c"] == pytest.approx(0.5, abs=1e-12)
    assert row["d"] == pytest.approx(0.497)
    assert row["a1"] == int(0.018 / 0.058 * 1000 + 32768)


def test_udtf_parse_line(spark):
    register_all(spark)
    rows = spark.sql(
        """
        SELECT t.* FROM VALUES
          ('Log #: 42'), ('Actuators enabled'), ('Interval:0.01'),
          ('0.1, 0.2, 0.3'), ('Log Paused, now resuming:'), ('garbage')
        AS v(line), LATERAL parse_orclog_line(line) t
        """
    ).collect()
    kinds = [r["kind"] for r in rows]
    assert kinds == ["log", "group", "interval", "data", "pause", "other"]
    assert rows[0]["log_id"] == 42
    assert rows[1]["enabled"] is True
    assert rows[2]["interval_s"] == 0.01
    assert rows[3]["accel"] == pytest.approx(0.1)


def test_gyro_offset_scan():
    """Stationary residual (2 dps) gets pulled into the offset after the 5 s
    threshold; a motion burst resets the timer."""
    rate = 100.0
    n = int(30 * rate)
    g = np.full((n, 3), 2.0)
    out = offset_scan(g, rate, f32=False)
    # early samples uncorrected, late samples near zero
    assert out[0, 0] == pytest.approx(2.0)
    assert abs(out[-1, 0]) < 0.5
    # motion keeps the timer reset → no correction accumulates
    g2 = np.tile([50.0, 0.0, 0.0], (int(10 * rate), 1))
    out2 = offset_scan(g2, rate, f32=False)
    np.testing.assert_allclose(out2[:, 0], 50.0)


def test_gyro_offset_distributed(spark):
    rate = 100.0
    n = 800
    pdf = pd.DataFrame(
        {
            "run_idx": [0] * n,
            "sample_idx": np.arange(n),
            "gy_x": 2.0,
            "gy_y": -1.5,
            "gy_z": 0.5,
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        gyro_offset_replay(df, ["run_idx"], "sample_idx", rate)
        .orderBy("sample_idx")
        .toPandas()
    )
    local = offset_scan(pdf[["gy_x", "gy_y", "gy_z"]].to_numpy(), rate)
    np.testing.assert_allclose(got["gy_x_corr"].to_numpy(), local[:, 0])


def _orc_scan_output_rows(df) -> int:
    """Execute df and return the total numOutputRows of its ORC scan nodes —
    rows the reader EMITTED after stripe/stride skipping (skipped strides
    never reach the metric)."""
    df.collect()
    total = 0
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "orc" not in node.nodeName().lower():
            continue
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numOutputRows":
                total += kv._2().value()
    return total


def test_io_orc_skipping_skips_strides(spark, sf_mid):
    """The registry's io_orc_skipping layout must actually SKIP: the probe's
    ORC scan emits a small fraction of the table (sorted layout → disjoint
    stride stats → pushed predicate excludes strides before decode), while
    the identical probe of an UNSORTED ORC copy of the same data reads
    ~everything — proving the stats+pushdown do the work, not the filter."""
    import os
    import tempfile

    from orc_spark.plans.e2e_q import _orc_sorted_path, io_orc_skipping

    total = load_table(spark, sf_mid, "lineitem").count()
    path, mx = _orc_sorted_path(spark, sf_mid)
    lo, hi = mx // 2, mx // 2 + mx // 64

    # measure on the bare filtered scan (no aggregate): an AQE plan hides
    # executed-stage metrics behind AdaptiveSparkPlanExec, but the scan
    # and its skipping behavior are identical. Min-of-3 fresh probes: a
    # task retry on a contended host double-counts numOutputRows (two
    # flaky suite failures observed), and a retry can only INFLATE the
    # metric, so the min is the true decode count.
    def _sorted_probe():
        return _orc_scan_output_rows(
            spark.read.orc(path).where(
                (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)
            )
        )

    sorted_rows = min(_sorted_probe() for _ in range(3))
    # bound = worst case TWO of the 8 range-sorted files decode (the probe
    # window straddling a file boundary): 2/8 plus boundary slop. The r09
    # flake was exactly this — 15666/60000 = 0.261 against a 0.25 bound.
    # Still a 2.6x margin to the unsorted control's >= 0.9 floor below.
    assert 0 < sorted_rows <= 0.34 * total, (sorted_rows, total)

    # control: unsorted layout, same data, same probe → no skipping possible
    upath = os.path.join(tempfile.mkdtemp(prefix="orc_unsorted_"), "li")
    (
        load_table(spark, sf_mid, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
        .repartition(8)
        .write.mode("overwrite")
        .option("orc.stripe.size", 262144)
        .orc(upath)
    )
    uq = spark.read.orc(upath).where(
        (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)
    )
    unsorted_rows = _orc_scan_output_rows(uq)
    assert unsorted_rows >= 0.9 * total, (unsorted_rows, total)

    # the pushed predicate must be visible on the REGISTRY query's ORC scan
    probe = io_orc_skipping(spark, sf_mid)
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "l_orderkey" in plan.split("PushedFilters", 1)[1][:200]

    # and the layout rewrite must not change the answer
    raw = (
        load_table(spark, sf_mid, "lineitem")
        .where((F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            ).alias("price_cents"),
            F.sum(F.round(F.col("l_quantity"), 0).cast("bigint")).alias("qty"),
            F.min("l_orderkey").alias("min_ok"),
            F.max("l_orderkey").alias("max_ok"),
        )
    )
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(probe.collect()) == key(raw.collect())
