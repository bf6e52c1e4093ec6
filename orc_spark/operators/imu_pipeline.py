"""Full firmware steady-loop replay (ORC_Main.c:227-289) over raw IMU counts
(FIXTURES.md F3): peak-reject/scale → AHRS fusion → log triple, plus the
control branch deadband → 3×PID → corner transform → DAC codes.

One applyInPandas per run executes the whole per-sample chain — the same
operator fusion the firmware does in its loop — so the sequential state
(fusion quaternion, PID integrators, carried-forward floats) stays local.

Faithful quirks reproduced (flag-controlled):
- gyro-gates-accel peak rejection: BOTH conversion loops test the GYRO raw
  magnitude (`data_raw_angular_rate[i]`, ORC_Main.c:240,249) — with
  ``faithful_quirk=False`` the accel loop gates on the accel raw instead.
- rejected samples "reuse old data": the float vector keeps its previous
  value (initial 0.0 before any sample passes).
- swapped PID gains: the pitch controller runs ROLL_K* and vice versa
  (ORC_Main.c:456-470); ``swap_pid_gains=True`` by default.
- PID outputs pass through an (int16_t) cast before the transform
  (PID.c:89) — integer-valued floats.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from orc_spark.operators.ahrs import AhrsReplay, AhrsSettings
from orc_spark.operators.control import (
    A_2AB,
    B_2AB,
    INV_2AB,
    INV_2CD,
    PITCH_GAINS,
    ROLL_GAINS,
    Z_XL_GAINS,
    pid_params,
)
from orc_spark.operators.timeseries import (
    ACCEL_G_PER_LSB,
    ACCEL_REJECT_COUNTS,
    GYRO_DPS_PER_LSB,
    GYRO_REJECT_COUNTS,
)

IMU_NOISE_FLOOR = 0.003  # g (ORC_CONFIG.h:56)


class _Pid:
    """Inline float32 PID state machine (PID.c:24-91)."""

    def __init__(self, kp, ki, kd, T_, tau, lim_min, lim_max, dt=np.float32):
        self.d = dt
        d = dt
        self.kp, self.ki, self.kd = d(kp), d(ki), d(kd)
        self.T, self.tau = d(T_), d(tau)
        self.lim_min, self.lim_max = d(lim_min), d(lim_max)
        self.integ = d(0.0)
        self.prev_err = d(0.0)
        self.diff = d(0.0)
        self.prev_m = d(0.0)

    def step(self, setpoint, measurement):
        d = self.d
        err = d(setpoint - measurement)
        prop = d(self.kp * err)
        self.integ = d(self.integ + d(0.5) * self.ki * self.T * (err + self.prev_err))
        lim_max_int = d(self.lim_max - prop) if self.lim_max > prop else d(0.0)
        lim_min_int = d(self.lim_min - prop) if self.lim_min < prop else d(0.0)
        if self.integ > lim_max_int:
            self.integ = lim_max_int
        elif self.integ < lim_min_int:
            self.integ = lim_min_int
        self.diff = d(
            (d(-2.0) * self.kd * (measurement - self.prev_m)
             + (d(2.0) * self.tau - self.T) * self.diff)
            / (d(2.0) * self.tau + self.T)
        )
        out = d(prop + self.integ + self.diff)
        if out > self.lim_max:
            out = self.lim_max
        elif out < self.lim_min:
            out = self.lim_min
        self.prev_err = err
        self.prev_m = measurement
        # (int16_t) return cast, PID.c:89 — clamp first to avoid C UB on
        # overflow (documented divergence; firmware limits keep values sane)
        return d(np.int16(np.clip(float(out), -32768, 32767)))


def replay_run(
    xl_raw: np.ndarray,
    gy_raw: np.ndarray,
    sample_time: float,
    faithful_quirk: bool = True,
    swap_pid_gains: bool = True,
    actuators: bool = True,
    f32: bool = True,
) -> dict[str, np.ndarray]:
    """Replay one run of raw int16 counts through the whole steady loop."""
    d = np.float32 if f32 else np.float64
    n = xl_raw.shape[0]
    settings = AhrsSettings(
        sample_time=sample_time,
        recovery_trigger_period=int(5.0 / sample_time),
    )
    ahrs = AhrsReplay(settings, f32=f32)

    tau = 1.0 / (np.pi * 100.0)
    max_accel_coeff = 1.1 * max(A_2AB, B_2AB)
    max_angle_coeff = 1.1 * max(INV_2AB, INV_2CD)
    accel_lims = (-32768.0 / max_accel_coeff, 32767.0 / max_accel_coeff)
    angle_lims = (-32768.0 / max_angle_coeff, 32767.0 / max_angle_coeff)
    pg = ROLL_GAINS if swap_pid_gains else PITCH_GAINS
    rg = PITCH_GAINS if swap_pid_gains else ROLL_GAINS
    pid_z = _Pid(*Z_XL_GAINS, sample_time, tau, *accel_lims, dt=d)
    pid_p = _Pid(*pg, sample_time, tau, *angle_lims, dt=d)
    pid_r = _Pid(*rg, sample_time, tau, *angle_lims, dt=d)

    gyro = np.zeros(3, dtype=d)
    accel = np.zeros(3, dtype=d)
    cols = ["accel_g", "pitch_deg", "roll_deg", "cond_accel", "act1", "act2", "act3", "act4"]
    out = {c: np.zeros(n) for c in cols}
    for i in range(n):
        for ax in range(3):
            if abs(int(gy_raw[i, ax])) < GYRO_REJECT_COUNTS:
                gyro[ax] = d(d(gy_raw[i, ax]) * d(GYRO_DPS_PER_LSB))
            gate = gy_raw[i, ax] if faithful_quirk else xl_raw[i, ax]
            if abs(int(gate)) < ACCEL_REJECT_COUNTS:
                accel[ax] = d(d(xl_raw[i, ax]) * d(ACCEL_G_PER_LSB))
        _q, (roll, pitch, _yaw), lin = ahrs.update_no_magnetometer(gyro, accel)
        az = lin[2]
        out["accel_g"][i] = az
        out["pitch_deg"][i] = pitch
        out["roll_deg"][i] = roll
        cond = d(0.0)
        if az > IMU_NOISE_FLOOR:
            cond = d(az - d(IMU_NOISE_FLOOR))
        elif az < -IMU_NOISE_FLOOR:
            cond = d(az + d(IMU_NOISE_FLOOR))
        out["cond_accel"][i] = cond
        if actuators:
            fz = pid_z.step(d(0.0), cond)
            ft = pid_p.step(d(0.0), d(pitch))
            fp = pid_r.step(d(0.0), d(roll))
            b_fz, a_fz = d(d(B_2AB) * fz), d(d(A_2AB) * fz)
            p_ft, p_fp = d(d(INV_2AB) * ft), d(d(INV_2CD) * fp)
            acts = [
                d(b_fz - p_ft + p_fp + d(32768.0)),
                d(b_fz - p_ft - p_fp + d(32768.0)),
                d(a_fz + p_ft + p_fp + d(32768.0)),
                d(a_fz + p_ft - p_fp + d(32768.0)),
            ]
            for j, a_ in enumerate(acts):
                out[f"act{j + 1}"][i] = float(np.uint16(np.clip(float(a_), 0.0, 65535.0)))
    return out


def _locf_gated(raw: np.ndarray, gate: np.ndarray, threshold: int, scale: float) -> np.ndarray:
    """Vectorized peak-reject + carry-forward: where |gate| >= threshold the
    previous ACCEPTED scaled value persists (0.0 before any acceptance)."""
    n = raw.shape[0]
    valid = np.abs(gate) < threshold
    scaled = raw.astype(np.float64) * scale
    idx = np.where(valid, np.arange(n), -1)
    last = np.maximum.accumulate(idx)
    out = np.where(last >= 0, scaled[np.clip(last, 0, None)], 0.0)
    return out


def replay_run_fast_f64(
    xl_raw: np.ndarray,
    gy_raw: np.ndarray,
    sample_time: float,
    faithful_quirk: bool = True,
    swap_pid_gains: bool = True,
    actuators: bool = True,
) -> dict[str, np.ndarray]:
    """Float64 fast path (~10×): phase-decomposed — vectorized gating/LOCF,
    the plain-float AHRS kernel, vectorized deadband, plain-float PID ×3,
    vectorized transform. Same math, same order, as replay_run(f32=False)."""
    from orc_spark.operators.ahrs import AhrsSettings, ahrs_scan_fast_f64
    from orc_spark.operators.control import pid_scan

    n = xl_raw.shape[0]
    gyro = np.empty((n, 3))
    accel = np.empty((n, 3))
    for ax in range(3):
        gyro[:, ax] = _locf_gated(
            gy_raw[:, ax], gy_raw[:, ax], GYRO_REJECT_COUNTS, GYRO_DPS_PER_LSB
        )
        gate = gy_raw[:, ax] if faithful_quirk else xl_raw[:, ax]
        accel[:, ax] = _locf_gated(
            xl_raw[:, ax], gate, ACCEL_REJECT_COUNTS, ACCEL_G_PER_LSB
        )
    settings = AhrsSettings(
        sample_time=sample_time, recovery_trigger_period=int(5.0 / sample_time)
    )
    fused = ahrs_scan_fast_f64(gyro, accel, settings)
    az = fused["lin_z"]
    cond = np.where(
        az > IMU_NOISE_FLOOR,
        az - IMU_NOISE_FLOOR,
        np.where(az < -IMU_NOISE_FLOOR, az + IMU_NOISE_FLOOR, 0.0),
    )
    out = {
        "accel_g": az,
        "pitch_deg": fused["pitch_deg"],
        "roll_deg": fused["roll_deg"],
        "cond_accel": cond,
        "act1": np.zeros(n),
        "act2": np.zeros(n),
        "act3": np.zeros(n),
        "act4": np.zeros(n),
    }
    if actuators:
        tau = 1.0 / (np.pi * 100.0)
        max_accel_coeff = 1.1 * max(A_2AB, B_2AB)
        max_angle_coeff = 1.1 * max(INV_2AB, INV_2CD)
        accel_lims = (-32768.0 / max_accel_coeff, 32767.0 / max_accel_coeff)
        angle_lims = (-32768.0 / max_angle_coeff, 32767.0 / max_angle_coeff)
        pg = ROLL_GAINS if swap_pid_gains else PITCH_GAINS
        rg = PITCH_GAINS if swap_pid_gains else ROLL_GAINS

        def run_pid(gains, lims, meas):
            p = dict(kp=gains[0], ki=gains[1], kd=gains[2], T=sample_time,
                     tau=tau, lim_min=lims[0], lim_max=lims[1])
            o = pid_scan(meas, 0.0, p, f32=False)
            return np.int16(np.clip(o, -32768, 32767)).astype(np.float64)

        fz = run_pid(Z_XL_GAINS, accel_lims, cond)
        ft = run_pid(pg, angle_lims, fused["pitch_deg"])
        fp = run_pid(rg, angle_lims, fused["roll_deg"])
        b_fz, a_fz = B_2AB * fz, A_2AB * fz
        p_ft, p_fp = INV_2AB * ft, INV_2CD * fp
        acts = (
            b_fz - p_ft + p_fp + 32768.0,
            b_fz - p_ft - p_fp + 32768.0,
            a_fz + p_ft + p_fp + 32768.0,
            a_fz + p_ft - p_fp + 32768.0,
        )
        for j, arr in enumerate(acts):
            out[f"act{j + 1}"] = np.uint16(np.clip(arr, 0.0, 65535.0)).astype(np.float64)
    return out


_OUT_COLS = [
    ("accel_g", T.DoubleType()),
    ("pitch_deg", T.DoubleType()),
    ("roll_deg", T.DoubleType()),
    ("cond_accel", T.DoubleType()),
    ("act1", T.DoubleType()),
    ("act2", T.DoubleType()),
    ("act3", T.DoubleType()),
    ("act4", T.DoubleType()),
]


def imu_pipeline_replay(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    sample_time_col: str = "interval_s",
    faithful_quirk: bool = True,
    f32: bool = True,
) -> DataFrame:
    """Distributed replay over the F3 fixture schema
    (run cols + xl_x/y/z, gy_x/y/z int16 + interval_s)."""
    keep = list(partition_cols) + [order_col]
    schema = T.StructType(
        [df.schema[c] for c in keep] + [T.StructField(nm, tp) for nm, tp in _OUT_COLS]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        runner = replay_run if f32 else replay_run_fast_f64
        kwargs = {"f32": True} if f32 else {}
        res = runner(
            pdf[["xl_x", "xl_y", "xl_z"]].to_numpy(dtype=np.int64),
            pdf[["gy_x", "gy_y", "gy_z"]].to_numpy(dtype=np.int64),
            float(pdf[sample_time_col].iloc[0]),
            faithful_quirk=faithful_quirk,
            **kwargs,
        )
        out = pdf[keep].copy()
        for nm, _ in _OUT_COLS:
            out[nm] = res[nm]
        return out

    from orc_spark.operators.recurrence import partitioned_group_scan

    return partitioned_group_scan(df, partition_cols, order_col, fn, schema)
