"""Stateful-recurrence queries (AHRS O4, PID O9, full steady-loop replay).

These are genuinely non-SQL-expressible (per-sample state), so they carry no
oracle entry — the driver records the rows-only check, and the semantics are
covered by tests/test_stateful_replay.py (physical-sanity + distributed ==
local recurrence equality).

Inputs are synthesized deterministically FROM the driver's events table
(value → int16 counts), since the firmware never logged raw counts
(SURVEY §7.1 M4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orc_spark.operators.ahrs import ahrs_replay
from orc_spark.operators.control import Z_XL_GAINS, pid_params, pid_replay
from orc_spark.operators.imu_pipeline import imu_pipeline_replay
from orc_spark.plans import Query
from orc_spark.sources.tables import load_table

DT = 0.000282


def _imu_fixture(spark: SparkSession, sf: str) -> DataFrame:
    """events → F3-shaped raw-count stream: one run per user, ordered by ts.
    Deterministic int16 synthesis: counts scale with value, z-accel near 1 g."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value")
    return ev.select(
        F.col("user_id").alias("run_idx"),
        (F.row_number().over(w) - 1).cast("bigint").alias("sample_idx"),
        (v * 37).cast("int").alias("xl_x"),
        (v * -23).cast("int").alias("xl_y"),
        (F.lit(8197) + (v * 11).cast("int")).alias("xl_z"),
        (v * 53).cast("int").alias("gy_x"),
        (v * -41).cast("int").alias("gy_y"),
        (v * 29).cast("int").alias("gy_z"),
        F.lit(DT).alias("interval_s"),
    )


def st_ahrs_replay(spark: SparkSession, sf: str) -> DataFrame:
    fx = _imu_fixture(spark, sf).select(
        "run_idx",
        "sample_idx",
        (F.col("gy_x") * 0.0175).alias("gy_x"),
        (F.col("gy_y") * 0.0175).alias("gy_y"),
        (F.col("gy_z") * 0.0175).alias("gy_z"),
        (F.col("xl_x") * 0.000122).alias("ax_x"),
        (F.col("xl_y") * 0.000122).alias("ax_y"),
        (F.col("xl_z") * 0.000122).alias("ax_z"),
    )
    # f32=False → the fast plain-float engine (10×); the bit-faithful f32
    # path stays the default for firmware replay (st_imu_pipeline)
    return ahrs_replay(fx, ["run_idx"], "sample_idx", f32=False)


def st_pid_replay(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    series = ev.select(
        "user_id",
        (F.row_number().over(w) - 1).cast("bigint").alias("ord"),
        (F.col("value") / 100.0).alias("meas"),
    )
    params = pid_params(*Z_XL_GAINS, DT, -30000.0, 30000.0)
    return pid_replay(series, "meas", ["user_id"], "ord", params, f32=False)


def st_imu_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    return imu_pipeline_replay(
        _imu_fixture(spark, sf), ["run_idx"], "sample_idx", f32=False
    )


QUERIES = [
    Query("st_ahrs_replay", st_ahrs_replay, None, "O4 AHRS fusion recurrence (applyInPandas)"),
    Query("st_pid_replay", st_pid_replay, None, "O9 PID recurrence (applyInPandas)"),
    Query("st_imu_pipeline", st_imu_pipeline, None, "full firmware steady-loop replay"),
]
