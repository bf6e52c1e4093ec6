"""Format surface: ORC (the north-star format), Parquet, CSV, JSON — thin
wrappers that standardize options so every operator output can round-trip
through any of them. Spark's native writers/readers do the real work
(columnar encode, predicate pushdown, schema evolution)."""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

FORMATS = ("orc", "parquet", "csv", "json")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "orc",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt}")
    w = df.write.mode(mode).format(fmt)
    if compression:
        w = w.option("compression", compression)
    if fmt == "csv":
        w = w.option("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "orc", schema=None
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt}")
    r: DataFrameReader = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("inferSchema", schema is None)
    return r.load(path)
