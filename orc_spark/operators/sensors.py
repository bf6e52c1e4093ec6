"""Remaining sensor-path operators for inventory completeness (SURVEY §2.A
O11, O26, O27) — all pure column expressions.

- dac_write_codes: per-channel offset with wraparound-safe clamping + the
  physical channel remap (LTC2664_reg.c:46-90; remap ORC_Main.c:283-286)
- calibrate_inertial: C = M·((u − offset) ∘ sensitivity)
  (FusionCalibration.h:26-28)
- compass_heading: tilt-compensated heading from accel × mag cross products,
  ENU convention (FusionCompass.c:25-47)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UINT16_MAX = 65535

# actuator → physical DAC channel remap (ORC_Main.c:283-286):
# act1→DAC_1, act2→DAC_2, act3→DAC_0, act4→DAC_3
ACT_TO_DAC = {"act1": 1, "act2": 2, "act3": 0, "act4": 3}


def dac_offset_limits(offset: int) -> tuple[int, int, int, int]:
    """(pos, neg, lower, upper) per ltc2664_save_offset semantics."""
    if offset < 0:
        return 0, -offset, -offset, UINT16_MAX
    return offset, 0, 0, UINT16_MAX - offset


def dac_write_code(code: Column, offset: int) -> Column:
    """Wraparound-safe offset application (ltc2664_write_and_update_1_dac):
    above upper → 65535, below lower → 0, else code + pos − neg."""
    pos, neg, lower, upper = dac_offset_limits(offset)
    return (
        F.when(code > upper, F.lit(UINT16_MAX))
        .when(code < lower, F.lit(0))
        .otherwise(code + pos - neg)
    )


def dac_write_codes(
    df: DataFrame, offsets: dict[int, int], act_cols: dict[str, str] | None = None
) -> DataFrame:
    """Apply per-channel offsets + remap actuator columns to dac_{0..3}
    columns. ``offsets``: {dac_channel: calibration_offset} (the firmware
    uses fixed code 32625→offset per channel, ORC_Main.c:579-618)."""
    act_cols = act_cols or {k: k for k in ACT_TO_DAC}
    out = df
    for act, col in act_cols.items():
        dac = ACT_TO_DAC[act]
        out = out.withColumn(
            f"dac_{dac}", dac_write_code(F.col(col), offsets.get(dac, 0))
        )
    return out


def calibrate_inertial(
    df: DataFrame,
    cols: tuple[str, str, str],
    misalignment: list[list[float]],
    sensitivity: tuple[float, float, float],
    offset: tuple[float, float, float],
    prefix: str = "cal_",
) -> DataFrame:
    """C = M · ((u − offset) ∘ sensitivity), unrolled to column arithmetic."""
    u = [F.col(c) for c in cols]
    adj = [(u[i] - offset[i]) * sensitivity[i] for i in range(3)]
    out = df
    for r, axis in enumerate(("x", "y", "z")):
        expr = (
            F.lit(misalignment[r][0]) * adj[0]
            + F.lit(misalignment[r][1]) * adj[1]
            + F.lit(misalignment[r][2]) * adj[2]
        )
        out = out.withColumn(f"{prefix}{axis}", expr)
    return out


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _norm3(v):
    mag = F.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    return (v[0] / mag, v[1] / mag, v[2] / mag)


def compass_heading(
    df: DataFrame,
    accel_cols: tuple[str, str, str],
    mag_cols: tuple[str, str, str],
    out_col: str = "heading_deg",
) -> DataFrame:
    """Tilt-compensated heading, ENU (FusionCompass.c ENU branch):
    west = norm(a × m); north = norm(west × a); east = −west;
    heading = degrees(atan2(north.x, east.x))."""
    a = tuple(F.col(c) for c in accel_cols)
    m = tuple(F.col(c) for c in mag_cols)
    west = _norm3(_cross(a, m))
    north = _norm3(_cross(west, a))
    east = tuple(-w for w in west)
    return df.withColumn(out_col, F.degrees(F.atan2(north[0], east[0])))
