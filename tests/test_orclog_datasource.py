"""orclog Python DataSource == declarative parser, on dirty and real logs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from orc_spark.sources.orclog import parse_orclog
from orc_spark.sources.orclog_datasource import OrclogDataSource

REAL_CSV = (
    "/root/reference/Python Plotting/Vibration_test/High Speed/"
    "ORCLOG_vibration_HS.CSV"
)

DIRTY = """garbage preamble
Log #: 42
Actuators enabled
Interval:0.25
Acceleration, Pitch, Roll
1.0, 2.0, 3.0
not, a, row
4.0, 5.0, 6.0
Log Paused, now resuming:
7.0, 8.0, 9.0
Log #: 43
Actuators disabled
Interval:notafloat
10.0, 11.0, 12.0
"""


def _canon(df):
    return sorted(
        tuple(r)
        for r in df.drop("file").collect()
    )


def _register(spark):
    try:
        spark.dataSource.register(OrclogDataSource)
    except Exception:
        pass  # already registered in this session


def test_datasource_matches_parser_dirty(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(DIRTY)
    _register(spark)
    ds = spark.read.format("orclog").load(str(p))
    plan = parse_orclog(spark, str(p))
    assert _canon(ds) == _canon(plan)
    # interval parse failure fell back to 1.0 (main.py:44-45)
    assert (
        ds.where(F.col("log_id") == 43).select("interval_s").first()[0] == 1.0
    )


def test_datasource_matches_parser_real_log(spark):
    if not os.path.exists(REAL_CSV):
        return
    _register(spark)
    agg = [
        F.count(F.lit(1)).alias("n"),
        F.sum("accel_g").alias("sa"),
        F.sum("pitch_deg").alias("sp"),
        F.sum(F.col("sample_idx") * F.col("run_idx")).alias("sx"),
        F.countDistinct("run_idx", "actuators_enabled").alias("nruns"),
    ]
    ds = spark.read.format("orclog").load(REAL_CSV).agg(*agg).first()
    pl = parse_orclog(spark, REAL_CSV).agg(*agg).first()
    assert (ds.n, ds.nruns, ds.sx) == (pl.n, pl.nruns, pl.sx)
    # float sums agree up to summation order
    assert abs(ds.sa - pl.sa) < 1e-6 * max(1.0, abs(pl.sa))
    assert abs(ds.sp - pl.sp) < 1e-6 * max(1.0, abs(pl.sp))
