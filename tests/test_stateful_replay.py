"""Physical-sanity and semantics tests for the stateful replay operators
(AHRS fusion O4, PID O9, full steady-loop pipeline)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from orc_spark.operators.ahrs import (
    AhrsReplay,
    AhrsSettings,
    ahrs_replay,
    fast_inverse_sqrt_f32,
)
from orc_spark.operators.control import pid_params, pid_scan
from orc_spark.operators.imu_pipeline import imu_pipeline_replay, replay_run

DT = 0.000282


def test_fast_inverse_sqrt():
    # the bit-trick approximation is within ~0.2% of the true value
    for x in (0.25, 1.0, 2.0, 123.456, 1e-4):
        approx = float(fast_inverse_sqrt_f32(np.float32(x)))
        assert approx == pytest.approx(1.0 / np.sqrt(x), rel=2.5e-3)


def test_ahrs_stationary_convergence():
    """Flat, motionless device (accel = +1g ENU z, zero gyro): after the 3 s
    init ramp pitch/roll → 0 and linear acceleration → 0."""
    n = int(4.0 / DT)
    eng = AhrsReplay(AhrsSettings(sample_time=DT, recovery_trigger_period=int(5 / DT)), f32=True)
    roll = pitch = None
    for _ in range(n):
        _q, (roll, pitch, _yaw), lin = eng.update_no_magnetometer(
            np.zeros(3), np.array([0.0, 0.0, 1.0])
        )
    assert not eng.state.initialising
    assert abs(roll) < 1e-3 and abs(pitch) < 1e-3
    assert np.all(np.abs(lin) < 1e-3)


def test_ahrs_tilt_recovers_angle():
    """Static 30° roll: gravity measured as (0, -sin30, cos30) in ENU body
    frame → fusion should report roll ≈ ±30° after convergence."""
    n = int(6.0 / DT)
    eng = AhrsReplay(AhrsSettings(sample_time=DT, recovery_trigger_period=int(5 / DT)), f32=True)
    a = np.array([0.0, np.sin(np.radians(30.0)), np.cos(np.radians(30.0))])
    roll = None
    for _ in range(n):
        _q, (roll, _pitch, _yaw), _lin = eng.update_no_magnetometer(np.zeros(3), a)
    assert abs(abs(roll) - 30.0) < 0.5


def test_ahrs_gyro_integration():
    """Pure rotation about body x at 10 dps for 1 s (post-init) shifts roll
    by ≈ 10°."""
    eng = AhrsReplay(AhrsSettings(sample_time=DT, recovery_trigger_period=int(5 / DT)), f32=False)
    a = np.array([0.0, 0.0, 1.0])
    for _ in range(int(4.0 / DT)):
        _, (roll0, _, _), _ = eng.update_no_magnetometer(np.zeros(3), a)
    # rotate: gyro-only information (zero accel → no gravity correction)
    for _ in range(int(1.0 / DT)):
        _, (roll1, _, _), _ = eng.update_no_magnetometer(
            np.array([10.0, 0.0, 0.0]), np.zeros(3)
        )
    assert abs((roll1 - roll0) - 10.0) < 0.2


def test_ahrs_f32_matches_f64_loosely():
    rng = np.random.default_rng(7)
    n = 2000
    gyro = rng.normal(0, 5, (n, 3))
    accel = np.tile([0.0, 0.0, 1.0], (n, 1)) + rng.normal(0, 0.02, (n, 3))
    s = AhrsSettings(sample_time=DT, recovery_trigger_period=int(5 / DT))
    e32, e64 = AhrsReplay(s, f32=True), AhrsReplay(s, f32=False)
    for i in range(n):
        _, (r32, p32, _), _ = e32.update_no_magnetometer(gyro[i], accel[i])
        _, (r64, p64, _), _ = e64.update_no_magnetometer(gyro[i], accel[i])
    assert r32 == pytest.approx(r64, abs=0.1)
    assert p32 == pytest.approx(p64, abs=0.1)


def test_pid_proportional_only():
    """Ki=Kd=0 → output = clamp(Kp·error) exactly; int16 cast truncates."""
    params = pid_params(-100.0, 0.0, 0.0, DT, -30000.0, 30000.0)
    m = np.array([1.0, -2.0, 0.5, 100.0])
    out = pid_scan(m, 0.0, params, f32=False)
    # error = setpoint - measurement; Kp = -100 → out = 100·m
    np.testing.assert_allclose(out, [100.0, -200.0, 50.0, 10000.0])


def test_pid_integrator_antiwindup():
    """Constant error with dominant Ki: the integrator grows then clamps so
    the output never exceeds lim_max."""
    params = pid_params(0.0, 1000.0, 0.0, 0.01, -5.0, 5.0)
    out = pid_scan(np.full(2000, -1.0), 0.0, params, f32=False)
    assert out.max() <= 5.0
    assert out[-1] == pytest.approx(5.0)


def test_pipeline_replay_shapes_and_quirk():
    """Gyro spike gates the ACCEL conversion in faithful mode (the reference
    bug) but not in corrected mode."""
    n = 300
    rng = np.random.default_rng(3)
    xl = np.zeros((n, 3), dtype=np.int64)
    xl[:, 2] = 8197  # ≈ 1 g
    gy = rng.normal(0, 50, (n, 3)).astype(np.int64)
    gy[100:110, 2] = 30000  # gyro spike above GY threshold but below XL one
    faith = replay_run(xl, gy, DT, faithful_quirk=True)
    # gyro spike is ABOVE the accel threshold too? 30000 < 30738 → accel loop
    # (gated on gyro raw) still passes; use a bigger spike to see gating:
    gy[100:110, 2] = 31000
    # accel must CHANGE during the spike for the gating to be observable
    # (frozen previous value == current value otherwise)
    xl[100:110, 2] = np.linspace(8197, 12000, 10).astype(np.int64)
    faith2 = replay_run(xl, gy, DT, faithful_quirk=True)
    fixed = replay_run(xl, gy, DT, faithful_quirk=False)
    assert all(len(v) == n for v in faith.values())
    # in corrected mode the accel channel keeps converting during the spike;
    # outputs must differ somewhere inside the spike window
    assert not np.allclose(faith2["accel_g"][100:110], fixed["accel_g"][100:110])


def test_fast_f64_pipeline_matches_slow():
    """Phase-decomposed fast path == the per-sample f64 loop, bit-for-bit."""
    from orc_spark.operators.imu_pipeline import replay_run_fast_f64

    rng = np.random.default_rng(23)
    n = 600
    xl = rng.integers(-9000, 9000, (n, 3))
    xl[:, 2] += 8197
    gy = rng.integers(-4000, 4000, (n, 3))
    gy[50:60] = 31000   # exercise both gates + gyro-range reinit
    slow = replay_run(xl, gy, DT, f32=False)
    fast = replay_run_fast_f64(xl, gy, DT)
    for k in slow:
        np.testing.assert_allclose(fast[k], slow[k], rtol=1e-12, atol=1e-12, err_msg=k)


def test_distributed_replay_matches_local(spark):
    """applyInPandas replay == the plain numpy recurrence, per run."""
    import pandas as pd

    rng = np.random.default_rng(11)
    frames = []
    for run in range(3):
        n = 400
        pdf = pd.DataFrame(
            {
                "run_idx": run,
                "sample_idx": np.arange(n),
                "xl_x": rng.integers(-2000, 2000, n),
                "xl_y": rng.integers(-2000, 2000, n),
                "xl_z": rng.integers(7000, 9000, n),
                "gy_x": rng.integers(-3000, 3000, n),
                "gy_y": rng.integers(-3000, 3000, n),
                "gy_z": rng.integers(-3000, 3000, n),
                "interval_s": DT,
            }
        )
        frames.append(pdf)
    pdf_all = pd.concat(frames)
    df = spark.createDataFrame(pdf_all)
    got = (
        imu_pipeline_replay(df, ["run_idx"], "sample_idx")
        .orderBy("run_idx", "sample_idx")
        .toPandas()
    )
    for run in range(3):
        local = replay_run(
            frames[run][["xl_x", "xl_y", "xl_z"]].to_numpy(),
            frames[run][["gy_x", "gy_y", "gy_z"]].to_numpy(),
            DT,
        )
        sub = got[got.run_idx == run]
        np.testing.assert_allclose(sub["accel_g"].to_numpy(), local["accel_g"])
        np.testing.assert_allclose(sub["act1"].to_numpy(), local["act1"])
