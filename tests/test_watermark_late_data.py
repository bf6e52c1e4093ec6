"""Watermark semantics: a late row beyond the watermark horizon is dropped
from a streaming windowed aggregation (the engine's late-data contract,
SURVEY §2.C streaming row)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_late_row_dropped_by_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    schema = "event_id bigint, ts timestamp, value double"

    def run_batch(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .select(F.unix_millis(F.col("w.start")).alias("ws"), "n", "s")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: two on-time windows; watermark advances to 01:00 - 10min
    run_batch(
        [
            (1, "2024-01-01 00:05:00", 1.0),
            (2, "2024-01-01 00:07:00", 2.0),
            (3, "2024-01-01 01:00:00", 3.0),
        ]
    )
    # batch 2: one VERY late row (00:06, watermark is now 00:50) → dropped;
    # one on-time row advancing further
    run_batch(
        [
            (4, "2024-01-01 00:06:00", 100.0),
            (5, "2024-01-01 02:00:00", 5.0),
        ]
    )
    # batch 3: empty-ish push to flush closed windows
    run_batch([(6, "2024-01-01 03:00:00", 6.0)])

    out = spark.read.parquet(sink).toPandas()
    w0 = out[out.ws == pd.Timestamp("2024-01-01 00:00:00").value // 10**6]
    # the 00:00 window must contain ONLY the two on-time rows — the late
    # row's 100.0 never entered
    assert len(w0) == 1
    assert w0.iloc[0]["n"] == 2
    assert w0.iloc[0]["s"] == pytest.approx(3.0)
