"""Streaming ORCLOG ingestion + firmware-format log sink.

Streaming model (SURVEY §2.A O12-O15): the log format is order-dependent
WITHIN a file and independent ACROSS files, so the streaming unit is the
file. `spark.readStream.text(..., wholetext=True)` delivers one row per
newly-arrived file per micro-batch; `posexplode(split(..))` recovers exact
line numbers declaratively (no RDD), and the batch parser's window plan runs
unchanged inside each micro-batch. Rate limiting (the firmware's bounded
queue, O12) maps to `maxFilesPerTrigger`.

The sink side (O13/O14) writes byte-compatible firmware logs — "%.4f, %.4f,
%.4f" rows framed by `Log #:` / `Actuators` / `Interval:` / header markers
and `Log Paused` run separators — so engine output can be re-read by the
reference's own tooling. Round-trip parse(write(x)) == x is tested.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orc_spark.sources.orclog import parse_orclog


def lines_from_wholetext(files: DataFrame) -> DataFrame:
    """(value=whole file, path) → (file, line_no, value) with exact order."""
    return (
        files.select(
            F.col("path").alias("file"),
            F.posexplode(F.split(F.col("value"), "\n")).alias("line_no", "value"),
        )
        .select("file", F.col("line_no").cast("long").alias("line_no"), "value")
    )


def stream_orclog_parse(
    spark: SparkSession,
    in_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    out_format: str = "orc",
    max_files_per_trigger: int = 10,
):
    """File-stream replay: watch ``in_dir`` for new ORCLOG files, parse each
    to the canonical table, append to ``out_dir`` (default ORC — the north-star
    format). Returns the StreamingQuery."""
    files = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(in_dir)
        .withColumn("path", F.col("_metadata.file_path"))
    )

    def handle_batch(batch_df: DataFrame, _batch_id: int) -> None:
        lines = lines_from_wholetext(batch_df)
        parsed = parse_orclog(batch_df.sparkSession, lines=lines)
        parsed.write.mode("append").format(out_format).save(out_dir)

    return (
        files.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def write_orclog_format(
    df: DataFrame,
    path: str,
    log_id: int = 1,
    interval_s: float = 0.000282,
) -> None:
    """Render a canonical orclog DataFrame back to firmware CSV bytes
    (ORC_Main.c:774-856 framing, one file per (file, actuators_enabled)
    group in input order). Driver-side only for the header framing; row
    formatting happens distributed, small results are collected per group."""
    rows = (
        df.select(
            "actuators_enabled",
            "run_idx",
            "sample_idx",
            F.format_string(
                "%.4f, %.4f, %.4f", F.col("accel_g"), F.col("pitch_deg"), F.col("roll_deg")
            ).alias("line"),
        )
        .orderBy("actuators_enabled", "run_idx", "sample_idx")
        .collect()
    )
    groups: dict[bool, list] = {}
    for r in rows:
        groups.setdefault(r["actuators_enabled"], []).append(r)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        lid = log_id
        for enabled, grp in groups.items():
            fh.write(f"Log #: {lid}\n")
            fh.write(f"Actuators {'enabled' if enabled else 'disabled'}\n")
            fh.write(f"Interval:{interval_s:f}\n")
            fh.write("Acceleration, Pitch, Roll\n")
            prev_run = grp[0]["run_idx"]
            for r in grp:
                if r["run_idx"] != prev_run:
                    fh.write("Log Paused, now resuming:\n")
                    prev_run = r["run_idx"]
                fh.write(r["line"] + "\n")
            lid += 1
