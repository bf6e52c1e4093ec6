"""Stateful-recurrence queries (AHRS O4, PID O9, full steady-loop replay).

The AHRS and full-pipeline replays are non-SQL-expressible (quaternion
state per sample), so they carry no oracle entry — the driver records the
rows-only check, and the semantics are covered by
tests/test_stateful_replay.py (physical-sanity + distributed == local
recurrence equality).

The PID replay, however, IS oracle-checked: with the fixture's Z_XL gains
(ki = -0.0) the integrator term is identically +0.0, so the recurrence
reduces to a strict per-row sequential form (P term + band-limited
derivative, PID.c:24-91) that a DuckDB RECURSIVE CTE replays one sample
per iteration with bit-identical IEEE-double operation order — the same
pattern that made the Welch t CDF hash-checkable (ts_welch_p).

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


def _pid_sql() -> str:
    """DuckDB recursive-CTE replay of st_pid_replay, one sample per
    iteration for every run in parallel (max run length ≈ 90 → ≈ 90
    iterations). Every float constant is the repr round-trip of the exact
    double the Python engine folds (e.g. -2.0·kd → 3600.0), every
    expression mirrors _pid_scan_fast_f64's operation order, and the
    integrator is omitted because ki = -0.0 keeps it at +0.0 (adding +0.0
    cannot change prop + diff, and diff can never be -0.0 starting from
    0.0). Seed row is ord = -1 with zero state so every real sample goes
    through the one uniform recursive step."""
    import numpy as np

    kp, _ki, kd = Z_XL_GAINS
    tau = 1.0 / (np.pi * 100.0)  # DERIVATIVE_CUTOFF_HZ, ORC_Main.c:429-430
    n2kd = -2.0 * kd
    ttm = 2.0 * tau - DT
    ttp = 2.0 * tau + DT
    lim_min, lim_max = -30000.0, 30000.0
    d = "CAST(0 AS DOUBLE)"
    diff_expr = (
        f"(CAST({n2kd!r} AS DOUBLE) * (b.meas - s.prev_m)"
        f" + CAST({ttm!r} AS DOUBLE) * s.diff)"
        f" / CAST({ttp!r} AS DOUBLE)"
    )
    prop_expr = f"CAST({kp!r} AS DOUBLE) * ({d} - b.meas)"
    return f"""
WITH RECURSIVE base AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS ord,
         value / CAST(100 AS DOUBLE) AS meas
  FROM events
),
scan AS (
  SELECT user_id, CAST(-1 AS BIGINT) AS ord, {d} AS meas,
         {d} AS diff, {d} AS prev_m, CAST(NULL AS DOUBLE) AS pid_out
  FROM (SELECT DISTINCT user_id FROM events)
  UNION ALL
  SELECT b.user_id, b.ord, b.meas,
         {diff_expr} AS diff,
         b.meas AS prev_m,
         least(greatest({prop_expr} + {diff_expr},
                        CAST({lim_min!r} AS DOUBLE)),
               CAST({lim_max!r} AS DOUBLE)) AS pid_out
  FROM scan s
  JOIN base b ON b.user_id = s.user_id AND b.ord = s.ord + 1
)
SELECT user_id, ord, meas, pid_out
FROM scan WHERE ord >= 0
"""


def st_imu_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    return imu_pipeline_replay(
        _imu_fixture(spark, sf), ["run_idx"], "sample_idx", f32=False
    )


QUERIES = [
    Query("st_ahrs_replay", st_ahrs_replay, None, "O4 AHRS fusion recurrence (applyInPandas)"),
    Query("st_pid_replay", st_pid_replay, _pid_sql(), "O9 PID recurrence, hash-checked via recursive-CTE sequential replay"),
    Query("st_imu_pipeline", st_imu_pipeline, None, "full firmware steady-loop replay"),
]
