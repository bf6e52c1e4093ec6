"""Hypertable-style continuous aggregates + timeseries resampling.

- tr_hier_rollup: multi-granularity time rollup (minute/hour/day) in ONE
  pass via grouping sets over pre-computed bucket columns — the batch form
  of a continuous aggregate; the streaming form is the same aggregation
  under a watermark (orc_spark.streaming.windows).
- ts_resample: gap-fill to a regular time grid per user with linear
  interpolation — grid generation is a sequence explode (no driver loop),
  the surrounding samples come from ordered LOCF in both directions (the
  as-of pattern), so the whole resample is two window passes, no join
  explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orc_spark.plans import Query
from orc_spark.sources.tables import load_table


def tr_hier_rollup(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")  # ts = bigint epoch micros
    base = ev.select(
        "event_type",
        "value",
        (F.expr("ts div 60000000") * 60).alias("minute_s"),
        (F.expr("ts div 3600000000") * 3600).alias("hour_s"),
        (F.expr("ts div 86400000000") * 86400).alias("day_s"),
    )
    return (
        base.groupingSets(
            [
                ["event_type", "minute_s"],
                ["event_type", "hour_s"],
                ["event_type", "day_s"],
            ],
            "event_type",
            "minute_s",
            "hour_s",
            "day_s",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


TR_HIER_SQL = """
SELECT event_type, minute_s, hour_s, day_s,
       count(*)   AS n_events,
       sum(value) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM (
  SELECT event_type, value,
         (epoch_us(ts) // 60000000) * 60       AS minute_s,
         (epoch_us(ts) // 3600000000) * 3600   AS hour_s,
         (epoch_us(ts) // 86400000000) * 86400 AS day_s
  FROM events
)
GROUP BY event_type, GROUPING SETS ((minute_s), (hour_s), (day_s))
"""


# 1-hour grid: events span ~30 days, so this is ~720 grid points per user —
# the output stays small enough to hash-compare while the plan shape is
# identical to any finer grid (the step is a literal).
GRID_STEP_S = 3600


def ts_resample(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user regular-grid resample over the user's own [min, max] span,
    value linearly interpolated between the nearest samples on each side."""
    ev = load_table(spark, sf, "events").select(
        "user_id", F.expr("ts div 1000000").alias("t_s"), "value", "event_id"
    )
    step = GRID_STEP_S
    span = ev.groupBy("user_id").agg(
        (F.ceil(F.min("t_s") / step) * step).cast("bigint").alias("t0"),
        (F.floor(F.max("t_s") / step) * step).cast("bigint").alias("t1"),
    )
    # a user whose whole span fits strictly inside one grid interval has
    # t0 > t1 (no grid point in range). Spark's sequence() THROWS on
    # backwards bounds where DuckDB's range() returns empty — filter those
    # users out first (they contribute no grid rows, same as the oracle)
    grid = (
        span.where(F.col("t0") <= F.col("t1"))
        .select(
            "user_id",
            F.explode(F.sequence("t0", "t1", F.lit(step))).alias("t_s"),
        )
        .withColumn("is_grid", F.lit(1))
    )
    samples = ev.select("user_id", "t_s", "value", "event_id").withColumn(
        "is_grid", F.lit(0)
    )
    allpts = grid.select(
        "user_id", "t_s", F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("bigint").alias("event_id"), "is_grid",
    ).unionByName(samples)
    # order real samples BEFORE grid points at the same instant so an exact
    # hit interpolates to itself in both directions
    w = Window.partitionBy("user_id").orderBy("t_s", "is_grid", "event_id")
    wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    sample_t = F.when(F.col("is_grid") == 0, F.col("t_s"))
    sample_v = F.when(F.col("is_grid") == 0, F.col("value"))
    pts = allpts.select(
        "user_id",
        "t_s",
        "is_grid",
        F.last(sample_t, ignorenulls=True).over(wb).alias("t_prev"),
        F.last(sample_v, ignorenulls=True).over(wb).alias("v_prev"),
        F.first(sample_t, ignorenulls=True).over(wf).alias("t_next"),
        F.first(sample_v, ignorenulls=True).over(wf).alias("v_next"),
    ).where(F.col("is_grid") == 1)
    frac = F.when(
        F.col("t_next") == F.col("t_prev"), F.lit(0.0)
    ).otherwise(
        (F.col("t_s") - F.col("t_prev")) / (F.col("t_next") - F.col("t_prev"))
    )
    interp = (
        F.when(F.col("t_prev").isNull() | F.col("t_next").isNull(), F.lit(None))
        .otherwise(F.col("v_prev") + frac * (F.col("v_next") - F.col("v_prev")))
    )
    return pts.select(
        "user_id", "t_s", F.round(interp, 9).alias("value_interp")
    )


TS_RESAMPLE_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS t_s, value, event_id FROM events
),
span AS (
  SELECT user_id,
         CAST(ceil(min(t_s) / {GRID_STEP_S}.0) * {GRID_STEP_S} AS BIGINT) AS t0,
         CAST(floor(max(t_s) / {GRID_STEP_S}.0) * {GRID_STEP_S} AS BIGINT) AS t1
  FROM ev GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(range(t0, t1 + 1, {GRID_STEP_S})) AS t_s, 1 AS is_grid
  FROM span
),
allpts AS (
  SELECT user_id, t_s, NULL::DOUBLE AS value, NULL::BIGINT AS event_id, is_grid FROM grid
  UNION ALL
  SELECT user_id, t_s, value, event_id, 0 AS is_grid FROM ev
),
pts AS (
  SELECT user_id, t_s, is_grid,
         last_value(CASE WHEN is_grid = 0 THEN t_s END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t_s, is_grid, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_prev,
         last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t_s, is_grid, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_prev,
         first_value(CASE WHEN is_grid = 0 THEN t_s END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t_s, is_grid, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t_next,
         first_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t_s, is_grid, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_next
  FROM allpts
)
SELECT user_id, t_s,
       round(CASE WHEN t_prev IS NULL OR t_next IS NULL THEN NULL
            ELSE v_prev + (CASE WHEN t_next = t_prev THEN 0.0
                           ELSE (t_s - t_prev) * 1.0 / (t_next - t_prev) END)
                         * (v_next - v_prev)
       END, 9) AS value_interp
FROM pts WHERE is_grid = 1
"""


QUERIES = [
    Query("tr_hier_rollup", tr_hier_rollup, TR_HIER_SQL, "multi-granularity continuous aggregate (grouping sets)"),
    Query("ts_resample", ts_resample, TS_RESAMPLE_SQL, "regular-grid resample with linear interpolation"),
]
