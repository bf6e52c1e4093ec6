"""Stream-stream join and streaming dedup.

Two Structured Streaming surfaces the batch engine already has relational
twins for:

- ``stream_stream_join``: watermarked equi-join with an event-time range
  condition. Spark buffers both sides in state; the watermark + the range
  bound tell the engine when a buffered row can never match again, so state
  is bounded by (watermark + range) × arrival rate — the knob that keeps a
  100 TB/day join from accumulating unbounded state.
- ``stream_dedup``: exact dedup within the watermark horizon
  (``dropDuplicatesWithinWatermark``) — the streaming form of the batch
  ``dd_exact`` query: state holds one key per id seen inside the horizon,
  then ages out.

Batch equivalence for both is asserted in tests/test_stream_join_dedup.py
(stream result == the same plan run as a batch DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "k",
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    range_s: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner join left/right on `key` where right_ts ∈ [left_ts,
    left_ts + range_s). Works identically on batch and streaming frames;
    watermarks are only applied to streaming inputs."""
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (left[key] == right[key])
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] < left[left_ts] + F.expr(f"INTERVAL {range_s} SECONDS"))
    )
    # qualify every trailing projection through its side and alias collisions
    # (left name wins, right gets a _r suffix) — a bare string select would
    # raise an ambiguous-reference AnalysisException whenever the two sides
    # share any non-key column name
    left_rest = [c for c in left.columns if c not in (key, left_ts)]
    right_rest = [c for c in right.columns if c not in (key, right_ts)]
    return left.join(right, cond, "inner").select(
        left[key].alias(key),
        left[left_ts].alias(left_ts),
        right[right_ts].alias(right_ts),
        *[left[c].alias(c) for c in left_rest],
        *[
            right[c].alias(f"{c}_r" if c in set(left_rest) | {key, left_ts} else c)
            for c in right_rest
        ],
    )


def stream_dedup(df: DataFrame, ts_col: str, id_cols: list[str], watermark: str = "10 minutes") -> DataFrame:
    """First occurrence per id within the watermark horizon."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)
    return df.dropDuplicates(id_cols)
