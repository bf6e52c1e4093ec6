"""load_table contract tests: events.ts is BIGINT EPOCH MICROS regardless of
the physical parquet type the testdata generator used.

The driver has shipped events.ts as two different physical types across
testdata generations (TIMESTAMP(NANOS) read by Spark as raw bigint nanos;
TIMESTAMP(MICROS, isAdjustedToUTC=false) read as TIMESTAMP_NTZ). Every
downstream plan — and every DuckDB oracle via epoch_us(ts) — relies on
load_table normalizing both to the same bigint-micros value.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orc_spark.sources.tables import load_table

# 2024-01-01 00:00:01.234567 UTC and a second-of-day later value, in micros.
MICROS = [1704067201234567, 1704070801000001]


def _write_events(tmpdir: str, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


@pytest.mark.parametrize(
    "arrow_type",
    [pa.timestamp("us"), pa.timestamp("ns")],
    ids=["timestamp_us_ntz", "timestamp_ns"],
)
def test_load_table_normalizes_events_ts(spark, tmp_path, arrow_type):
    ts = pa.array(MICROS, pa.int64()).cast(pa.timestamp("us")).cast(arrow_type)
    sf_dir = _write_events(str(tmp_path), ts)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == MICROS


def test_load_table_matches_duckdb_epoch_us(spark, sf_small):
    """Same-bit check against the oracle's view of the real testdata."""
    import duckdb

    spark_vals = (
        load_table(spark, sf_small, "events")
        .orderBy("event_id")
        .limit(50)
        .select("event_id", "ts")
        .collect()
    )
    duck = duckdb.sql(
        "select event_id, epoch_us(ts) as ts from "
        f"read_parquet('{sf_small}/events.parquet') order by event_id limit 50"
    ).fetchall()
    assert [(r.event_id, r.ts) for r in spark_vals] == duck
