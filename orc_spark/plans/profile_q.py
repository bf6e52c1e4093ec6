"""Data-profiling query: per-column statistics over lineitem (count, nulls,
distinct, mean/stddev/min/max, approx quantiles) — the standard first pass of
any large-scale pipeline intake. One aggregation pass for everything
(map-side partials; no per-column jobs).

Measured job floor at sf0.1 (r11 statusTracker decomposition): 3 job
rounds = scan/partial-agg + Expand-distinct exchange + final (the four
exact count_distinct columns share ONE Expand operator — x5 row
multiplication inside a single shuffle, not four jobs). 3 rounds is the
floor for multi-column EXACT distinct counts; approx_count_distinct would
drop one round but change semantics (dp_profile is the exactness anchor —
the sketch variants live in sk_*)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orc_spark.plans import Query
from orc_spark.sources.tables import load_table

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def dp_profile(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in NUM_COLS:
        aggs += [
            F.count(c).alias(f"{c}_nonnull"),
            F.count_distinct(c).alias(f"{c}_distinct"),
            F.avg(c).alias(f"{c}_mean"),
            F.stddev_samp(c).alias(f"{c}_std"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
    wide = li.agg(*aggs)
    # reshape: one row per column (single select; no subtree recompute)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"{c}_nonnull").alias("n_nonnull"),
            F.col(f"{c}_distinct").alias("n_distinct"),
            F.col(f"{c}_mean").alias("mean"),
            F.col(f"{c}_std").alias("std"),
            F.col(f"{c}_min").alias("min_val"),
            F.col(f"{c}_max").alias("max_val"),
        )
        for c in NUM_COLS
    ]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def _profile_sql() -> str:
    selects = []
    for c in NUM_COLS:
        selects.append(
            f"""
SELECT '{c}' AS column,
       count(*)              AS n_rows,
       count({c})            AS n_nonnull,
       count(DISTINCT {c})   AS n_distinct,
       avg({c})              AS mean,
       stddev_samp({c})      AS std,
       min({c})              AS min_val,
       max({c})              AS max_val
FROM lineitem"""
        )
    return "\nUNION ALL\n".join(selects)


QUERIES = [
    Query("dp_profile", dp_profile, _profile_sql(), "per-column intake profiling (single pass)"),
]
