"""Stream-stream join and streaming dedup: stream result == batch result."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from orc_spark.streaming.joins import stream_dedup, stream_stream_join


def _write_two_files(spark, path, rows, schema):
    """Two parquet files so maxFilesPerTrigger=1 yields 2 micro-batches."""
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(stream_df, out_dir, chk_dir):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_stream_join_matches_batch(spark, tmp_path):
    base = 1_700_000_000
    lrows = [(k, base + 10 * k) for k in range(40)]
    rrows = []
    for k in range(40):
        rrows.append((k, base + 10 * k + (k % 90)))  # in-range iff k%90 < 60
        rrows.append((k, base + 10 * k - 5))  # before the window: never joins
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    _write_two_files(spark, ldir, lrows, "k bigint, sec bigint")
    _write_two_files(spark, rdir, rrows, "k bigint, sec_r bigint")

    def prep(df, sec, ts):
        return df.withColumn(ts, F.timestamp_seconds(F.col(sec))).drop(sec)

    lb = prep(spark.read.parquet(ldir), "sec", "ts")
    rb = prep(spark.read.parquet(rdir), "sec_r", "ts_r")
    expected = {
        (r.k, r.ts, r.ts_r)
        for r in stream_stream_join(lb, rb).collect()
    }
    assert len(expected) == sum(1 for k in range(40) if k % 90 < 60)

    ls = prep(
        spark.readStream.schema("k bigint, sec bigint").option(
            "maxFilesPerTrigger", 1
        ).parquet(ldir),
        "sec",
        "ts",
    )
    rs = prep(
        spark.readStream.schema("k bigint, sec_r bigint").option(
            "maxFilesPerTrigger", 1
        ).parquet(rdir),
        "sec_r",
        "ts_r",
    )
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    _drain(stream_stream_join(ls, rs), out, chk)
    got = {(r.k, r.ts, r.ts_r) for r in spark.read.parquet(out).collect()}
    assert got == expected


def test_stream_dedup_within_watermark(spark, tmp_path):
    base = 1_700_000_000
    # 30 logical events, each duplicated 3× at slightly different times —
    # the halves overlap so duplicates also span micro-batches
    rows = []
    for i in range(30):
        for d in range(3):
            rows.append((i, base + i + d))
    src = str(tmp_path / "src")
    _write_two_files(spark, src, rows, "event_id bigint, sec bigint")
    stream = (
        spark.readStream.schema("event_id bigint, sec bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.timestamp_seconds(F.col("sec")))
        .drop("sec")
    )
    out, chk = str(tmp_path / "o"), str(tmp_path / "c")
    _drain(stream_dedup(stream, "ts", ["event_id"]), out, chk)
    got = spark.read.parquet(out)
    assert got.count() == 30
    assert got.select("event_id").distinct().count() == 30


def test_stream_join_colliding_payload_columns(spark):
    """Both sides carrying a same-named non-key payload column must not raise
    an ambiguous-reference error (ADVICE r01); the right copy gets _r."""
    from orc_spark.streaming.joins import stream_stream_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10.0)], "k int, ts string, payload double"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30", 99.0)], "k int, ts_r string, payload double"
    ).withColumn("ts_r", F.to_timestamp("ts_r"))
    out = stream_stream_join(left, right).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert row["payload"] == 10.0 and row["payload_r"] == 99.0
