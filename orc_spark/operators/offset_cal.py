"""Gyroscope runtime offset calibration (reference O25, FusionOffset.c:40-74
— vendored in the reference build but not called by app code; included for
operator-inventory completeness).

Semantics: while |gyro axis| < threshold (3 dps) continuously for 5 s, a
0.02 Hz one-pole low-pass filter pulls the residual into a per-axis offset
that is subtracted from every sample. Stateful per-sample recurrence →
applyInPandas per run, same harness as AHRS/PID.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

CUTOFF_HZ = 0.02
THRESHOLD_DPS = 3.0
TIMEOUT_S = 5.0


def offset_scan(
    gyro: np.ndarray, sample_rate_hz: float, f32: bool = True
) -> np.ndarray:
    """Run the offset recurrence over an (n, 3) dps array; returns the
    corrected (n, 3) array."""
    d = np.float32 if f32 else np.float64
    g = np.asarray(gyro, dtype=d)
    coeff = d(2.0 * np.pi * CUTOFF_HZ * (1.0 / sample_rate_hz))
    timeout = int(TIMEOUT_S * sample_rate_hz)
    offset = np.zeros(3, dtype=d)
    timer = 0
    out = np.empty_like(g)
    for i in range(g.shape[0]):
        corrected = (g[i] - offset).astype(d)
        out[i] = corrected
        if np.any(np.abs(corrected) > THRESHOLD_DPS):
            timer = 0
            continue
        if timer < timeout:
            timer += 1
            continue
        offset = (offset + coeff * corrected).astype(d)
    return out


def gyro_offset_replay(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    sample_rate_hz: float,
    gyro_cols: Sequence[str] = ("gy_x", "gy_y", "gy_z"),
    f32: bool = True,
) -> DataFrame:
    keep = list(partition_cols) + [order_col]
    gcols = list(gyro_cols)
    schema = T.StructType(
        [df.schema[c] for c in keep]
        + [T.StructField(f"{c}_corr", T.DoubleType()) for c in gcols]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        corr = offset_scan(pdf[gcols].to_numpy(dtype=np.float64), sample_rate_hz, f32)
        out = pdf[keep].copy()
        for j, c in enumerate(gcols):
            out[f"{c}_corr"] = corr[:, j].astype(np.float64)
        return out

    from orc_spark.operators.recurrence import partitioned_group_scan

    return partitioned_group_scan(df, partition_cols, order_col, fn, schema)
