"""Testdata table loaders (TPC-H-ish star schema + events/documents/embeddings).

Readers are plain ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning and partition pruning for free. At 100 TB each table would be a
partitioned directory; the same code path applies (parquet scan of a
directory), so nothing here is scale-bound.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
        # as a timestamp; read it as raw nanosecond bigint (runtime-settable
        # conf). DuckDB reads the same column as TIMESTAMP (microseconds,
        # TRUNCATING sub-µs — verified empirically), so we truncate to µs here
        # too: every downstream comparison/ordering/derivation then agrees
        # bit-for-bit with the oracle. ts is therefore BIGINT EPOCH MICROS.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.expr("ts div 1000"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the DataFrames."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
