"""Time-series operator pack (reference operators O2/O3/O8/O17/O18/O19).

All operators are pure column expressions over window frames — no Python in
the hot path, whole-stage-codegen friendly, shuffle only on the window
partition keys. Partitioning contract: one (file, group, run) never spans
executors (runs are seconds of data); parallelism is across runs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _run_window(partition_cols: Sequence[str], order_col: str) -> Window:
    return Window.partitionBy(*partition_cols).orderBy(order_col)


def median_filter(
    df: DataFrame,
    col: str,
    partition_cols: Sequence[str],
    order_col: str,
    k: int = 15,
    out_col: str | None = None,
) -> DataFrame:
    """Centered odd-``k`` median filter with ZERO padding at partition edges —
    exact ``scipy.signal.medfilt(x, k)`` semantics (reference main.py:69-70).

    Implemented as sort_array over a k-element array of lag/lead values with
    out-of-range positions coalesced to 0.0, then the middle element. This is
    a pure codegen expression: no UDF, no shuffle beyond the window partition.
    scipy's median of exactly k values = element (k+1)/2 of the sorted array.
    """
    if k % 2 != 1:
        raise ValueError("kernel size must be odd")
    half = k // 2
    w = _run_window(partition_cols, order_col)
    c = F.col(col)
    vals = (
        [F.coalesce(F.lag(c, i).over(w), F.lit(0.0)) for i in range(half, 0, -1)]
        + [F.coalesce(c, F.lit(0.0))]
        + [F.coalesce(F.lead(c, i).over(w), F.lit(0.0)) for i in range(1, half + 1)]
    )
    arr = F.sort_array(F.array(*vals))
    return df.withColumn(out_col or f"{col}_medfilt", F.element_at(arr, half + 1))


def np_gradient(
    df: DataFrame,
    col: str,
    partition_cols: Sequence[str],
    order_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """``np.gradient(x)`` with unit spacing (reference main.py:99-100):
    2nd-order central differences in the interior, one-sided at partition
    edges. Output units are <x>/sample (the reference uses index spacing,
    not seconds — preserved as documented behavior).

    A single-row partition yields 0.0 (np.gradient raises there; the engine
    defines it as 0 and documents the divergence).
    """
    w = _run_window(partition_cols, order_col)
    c = F.col(col)
    prev, nxt = F.lag(c, 1).over(w), F.lead(c, 1).over(w)
    grad = (
        F.when(prev.isNull() & nxt.isNull(), F.lit(0.0))
        .when(prev.isNull(), nxt - c)          # forward difference at start
        .when(nxt.isNull(), c - prev)          # backward difference at end
        .otherwise((nxt - prev) / F.lit(2.0))  # central difference
    )
    return df.withColumn(out_col or f"{col}_grad", grad)


def deadband(
    df: DataFrame, col: str, floor: float = 0.003, out_col: str | None = None
) -> DataFrame:
    """Noise-floor crush (reference O8, ORC_Main.c:264-271; floor from
    ORC_CONFIG.h:56): |x| ≤ floor → 0, else shrink toward zero by floor."""
    c = F.col(col)
    out = (
        F.when(c > floor, c - floor)
        .when(c < -floor, c + floor)
        .otherwise(F.lit(0.0))
    )
    return df.withColumn(out_col or f"{col}_db", out)


def locf(
    df: DataFrame,
    col: str,
    partition_cols: Sequence[str],
    order_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward over nulls within a run."""
    w = _run_window(partition_cols, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(
        out_col or f"{col}_locf", F.last(F.col(col), ignorenulls=True).over(w)
    )


# int16 full-scale → engineering units (reference O2, ORC_Main.c:239-252)
ACCEL_G_PER_LSB = 0.000122   # ±4 g range
GYRO_DPS_PER_LSB = 0.0175    # ±500 dps range
# peak-rejection thresholds in raw counts (ORC_CONFIG.h:54-55)
ACCEL_REJECT_COUNTS = 30738  # ≈ 3.75 g
GYRO_REJECT_COUNTS = 28572   # ≈ 500 dps


def scale_counts(raw: Column, scale: float) -> Column:
    """Raw int16 sensor counts → engineering units (plain column arithmetic)."""
    return raw.cast("double") * F.lit(scale)


def peak_reject_locf(
    df: DataFrame,
    col: str,
    gate_col: str,
    threshold: int,
    partition_cols: Sequence[str],
    order_col: str,
    out_col: str | None = None,
    faithful_quirk: bool = True,
) -> DataFrame:
    """Peak rejection with LOCF (reference O3, ORC_Main.c:185-198, 239-252):
    when |gate| ≥ threshold, replace the value with the previous surviving
    value (null if none yet).

    ``faithful_quirk=True`` reproduces the reference bug where the ACCEL
    channels are gated by the GYRO raw magnitude (ORC_Main.c:195,249 test
    ``data_raw_angular_rate[i]`` inside the accel loop): pass the gyro column
    as ``gate_col``. With ``faithful_quirk=False`` callers should pass
    ``gate_col == col`` (self-gating, the intended behavior).
    """
    gate = gate_col if faithful_quirk else col
    w = _run_window(partition_cols, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    kept = F.when(F.abs(F.col(gate)) < threshold, F.col(col))
    return df.withColumn(
        out_col or f"{col}_pr", F.last(kept, ignorenulls=True).over(w)
    )
