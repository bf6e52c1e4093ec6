"""LTTB (largest-triangle-three-buckets) time-series downsampling.

The reference renders every per-run series through its plot sink
(`Python Plotting/ORC_Plot.py`); at engine scale the plot-prep step is
downsampling — LTTB (Steinarsson 2013) is the standard visual-fidelity
algorithm: keep first/last, split the middle into equal buckets, and from
each bucket keep the point forming the largest triangle with the
previously kept point and the next bucket's centroid.

Determinism contract (what makes this oracle-checkable): the selection is
computed in pure int64 arithmetic —
- x is seconds since the series start (integer),
- y is fixed-point value × 1e4 (integer),
- the triangle area is multiplied through by the next bucket's count, so
  the centroid never becomes a float:
      area2·cnt = |(x_a·cnt − Σx)(y_j − y_a) − (x_a − x_j)(y_a·cnt − Σy)|
- ties broken by smallest position.
With 4 middle buckets the bucket index is (4·j) div (n−2) — also pure
integer. Both engines therefore select bit-identical points.

Scale shape: sequential per series but O(n) and embarrassingly parallel
across series — runs through the cores-not-bytes recurrence harness
(one mapInPandas per partition, runs contiguous). Magnitude bounds for
int64: |x| ≤ series span in seconds (~3e7/year), |y| ≤ 1e4·max|value|,
bucket count ≤ n/4 — products stay far below 2^63 for any realistic
telemetry series (documented per-term bound ~1e16 on the testdata).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from orc_spark.operators.recurrence import partitioned_group_scan

LTTB_T = 6        # output points per series: first + 4 buckets + last
LTTB_YSCALE = 10000

LTTB_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("sel_idx", T.IntegerType()),
        T.StructField("x_s", T.LongType()),
        T.StructField("y_fp", T.LongType()),
    ]
)


# int64 headroom: area terms are (x·cnt − Σx)·(Δy) with x in seconds and
# y = value·1e4 — safe through |value| ≲ 1e8 on month-long spans. Inputs are
# null-filtered by the caller (ts_lttb): a NULL would hit an undefined
# NaN→int64 cast here. Rescale Y at ingest for wilder domains (the
# ts_autocorr convention).


def _lttb_kernel(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"], kind="mergesort")
    uid = int(g["user_id"].iloc[0])
    ids = g["event_id"].to_numpy(np.int64)
    tsu = g["ts"].to_numpy(np.int64)
    y = np.floor(g["value"].to_numpy(np.float64) * LTTB_YSCALE).astype(np.int64)
    x = (tsu - tsu[0]) // 1_000_000
    n = len(g)
    if n <= LTTB_T:
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": ids,
                "sel_idx": np.arange(n, dtype=np.int32),
                "x_s": x,
                "y_fp": y,
            }
        )
    m = n - 2
    k = (4 * np.arange(m, dtype=np.int64)) // m  # bucket of middle point j
    sel = [0]
    a = 0
    for kk in range(4):
        cand = np.flatnonzero(k == kk) + 1  # array positions of bucket kk
        if kk < 3:
            nxt = np.flatnonzero(k == kk + 1) + 1
            cnt = np.int64(len(nxt))
            sx, sy = x[nxt].sum(), y[nxt].sum()
        else:
            cnt, sx, sy = np.int64(1), x[n - 1], y[n - 1]
        area2 = np.abs(
            (x[a] * cnt - sx) * (y[cand] - y[a])
            - (x[a] - x[cand]) * (y[a] * cnt - sy)
        )
        a = int(cand[np.argmax(area2)])  # first max — smallest-position tie
        sel.append(a)
    sel.append(n - 1)
    sel = np.asarray(sel)
    return pd.DataFrame(
        {
            "user_id": uid,
            "event_id": ids[sel],
            "sel_idx": np.arange(LTTB_T, dtype=np.int32),
            "x_s": x[sel],
            "y_fp": y[sel],
        }
    )


def lttb_downsample(df: DataFrame) -> DataFrame:
    """Downsample each user's (ts, value) series to LTTB_T points.
    Input: user_id, event_id, ts (bigint epoch micros), value (double)."""
    return partitioned_group_scan(
        df.select("user_id", "event_id", "ts", "value"),
        ["user_id"],
        "ts",
        _lttb_kernel,
        LTTB_SCHEMA,
    )
