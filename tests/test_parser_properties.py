"""Property-based tests (hypothesis): the Spark ORCLOG parser must agree with
the reference-semantics oracle on ARBITRARY interleavings of markers, data,
and garbage — the reference's tolerance behavior is a core semantic."""

import os

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from orc_spark.sources.orclog import parse_orclog
from tests import oracle_ref

# line generators
data_line = st.tuples(
    st.floats(-100, 100, allow_nan=False), st.floats(-100, 100, allow_nan=False),
    st.floats(-100, 100, allow_nan=False),
).map(lambda t: f"{t[0]:.4f}, {t[1]:.4f}, {t[2]:.4f}")
log_line = st.integers(0, 9999).map(lambda n: f"Log #: {n}")
act_line = st.booleans().map(lambda b: f"Actuators {'enabled' if b else 'disabled'}")
interval_line = st.sampled_from(
    ["Interval:0.01", "Interval:1.5", "Interval:notafloat", "Interval:0.000282"]
)
pause_line = st.just("Log Paused, now resuming:")
garbage_line = st.sampled_from(
    [
        "random junk",
        "Acceleration, Pitch, Roll",
        "1.0, 2.0",            # 2 fields → ignored
        "a, b, c",             # 3 fields, not floats → skipped
        "1.0, 2.0, 3.0, 4.0",  # 4 fields → ignored
        "",
        "  ",
        ", ,",
    ]
)
any_line = st.one_of(data_line, log_line, act_line, interval_line, pause_line, garbage_line)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=st.lists(any_line, min_size=0, max_size=60))
def test_parser_matches_oracle_on_random_logs(spark, tmp_path_factory, lines):
    path = str(tmp_path_factory.mktemp("prop") / "log.csv")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))

    got = (
        parse_orclog(spark, path)
        .orderBy("line_no")
        .select("actuators_enabled", "run_idx", "sample_idx", "accel_g", "pitch_deg", "roll_deg", "time_s")
        .collect()
    )
    store = oracle_ref.parse_log(path)

    # flatten oracle to (enabled, run, idx) → (a, p, r, t)
    exp = {}
    for grp, metrics in store.items():
        enabled = "enabled" in grp
        for run_i in range(len(metrics["accel"])):
            for si in range(len(metrics["accel"][run_i])):
                exp[(enabled, run_i, si)] = (
                    metrics["accel"][run_i][si],
                    metrics["pitch"][run_i][si],
                    metrics["roll"][run_i][si],
                    metrics["time"][run_i][si],
                )
    got_map = {
        (r["actuators_enabled"], r["run_idx"], r["sample_idx"]): (
            r["accel_g"], r["pitch_deg"], r["roll_deg"], r["time_s"]
        )
        for r in got
    }
    assert got_map.keys() == exp.keys()
    for k, v in exp.items():
        np.testing.assert_allclose(got_map[k], v, rtol=1e-12, err_msg=str(k))
