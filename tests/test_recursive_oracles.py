"""Bitwise validation of the recursive-CTE oracles for the stateful
recurrences (plans/stateful_q.py): the DuckDB replay must match the f64
Python engines EXACTLY (struct-level double equality), not merely to the
gate's 9 significant digits — any drift (libm change, constant-folding
change, association-order edit) fails here before it can surface as a
driver hash mismatch. Pure DuckDB + numpy; no Spark session needed."""

from __future__ import annotations

import struct

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
DT = 0.000282


def _events(con):
    df = con.execute(
        f"SELECT user_id, epoch_us(ts) AS ts, event_id, value "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    return df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)


def _bit_equal(a: np.ndarray, b: np.ndarray) -> int:
    return sum(
        1 for x, y in zip(a, b) if struct.pack("d", x) != struct.pack("d", y)
    )


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    return c


def test_pid_oracle_bitwise(con):
    from orc_spark.operators.control import Z_XL_GAINS, pid_params, pid_scan
    from orc_spark.plans.stateful_q import _pid_sql

    ev = _events(con)
    params = pid_params(*Z_XL_GAINS, DT, -30000.0, 30000.0)
    exp = []
    for _, g in ev.groupby("user_id", sort=True):
        out = pid_scan((g["value"] / 100.0).to_numpy(), 0.0, params, f32=False)
        exp.extend(out.tolist())
    got = (
        con.execute(_pid_sql())
        .df()
        .sort_values(["user_id", "ord"])["pid_out"]
        .to_numpy()
    )
    assert _bit_equal(np.asarray(exp), got) == 0


def test_ahrs_oracle_bitwise(con):
    from orc_spark.operators.ahrs import AhrsSettings, ahrs_scan_fast_f64
    from orc_spark.plans.stateful_q import _ahrs_sql

    ev = _events(con)
    s = AhrsSettings()
    toint = lambda x: np.trunc(x).astype(np.int64)  # noqa: E731
    cols = ["qw", "qx", "qy", "qz", "roll_deg", "pitch_deg", "yaw_deg",
            "lin_x", "lin_y", "lin_z"]
    exp = {c: [] for c in cols}
    for _, g in ev.groupby("user_id", sort=True):
        v = g["value"].to_numpy()
        gyro = np.stack(
            [toint(v * 53) * 0.0175, toint(v * -41) * 0.0175,
             toint(v * 29) * 0.0175], axis=1)
        acc = np.stack(
            [toint(v * 37) * 0.000122, toint(v * -23) * 0.000122,
             (8197 + toint(v * 11)) * 0.000122], axis=1)
        out = ahrs_scan_fast_f64(gyro, acc, s)
        for c in cols:
            exp[c].extend(out[c].tolist())
    got = (
        con.execute(_ahrs_sql()).df().sort_values(["run_idx", "sample_idx"])
    )
    for c in cols:
        assert _bit_equal(np.asarray(exp[c]), got[c].to_numpy()) == 0, c


def test_imu_oracle_bitwise(con):
    from orc_spark.operators.imu_pipeline import replay_run_fast_f64
    from orc_spark.plans.stateful_q import _imu_sql

    ev = _events(con)
    toint = lambda x: np.trunc(x).astype(np.int64)  # noqa: E731
    cols = ["accel_g", "pitch_deg", "roll_deg", "cond_accel",
            "act1", "act2", "act3", "act4"]
    exp = {c: [] for c in cols}
    for _, g in ev.groupby("user_id", sort=True):
        v = g["value"].to_numpy()
        xl = np.stack(
            [toint(v * 37), toint(v * -23), 8197 + toint(v * 11)], axis=1)
        gy = np.stack(
            [toint(v * 53), toint(v * -41), toint(v * 29)], axis=1)
        out = replay_run_fast_f64(xl, gy, DT)
        for c in cols:
            exp[c].extend(out[c].tolist())
    got = (
        con.execute(_imu_sql()).df().sort_values(["run_idx", "sample_idx"])
    )
    for c in cols:
        assert _bit_equal(np.asarray(exp[c]), got[c].to_numpy()) == 0, c
