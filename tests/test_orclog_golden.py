"""Golden end-to-end tests: parse the real 129k-row HS-vibration log and
reproduce the reference pipeline (Q1-Q7 of SURVEY §2.B) against the
numpy/scipy oracle and the published golden statistics."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from orc_spark.operators import median_filter, np_gradient
from orc_spark.operators.stats import group_means, run_stats, welch_ttest
from orc_spark.sources.orclog import parse_orclog

from tests.conftest import REAL_CSV
from tests import oracle_ref

pytestmark = pytest.mark.skipif(
    not os.path.exists(REAL_CSV), reason="reference CSV unavailable"
)

RUN = ["file", "actuators_enabled", "run_idx"]


@pytest.fixture(scope="module")
def parsed(spark):
    df = parse_orclog(spark, REAL_CSV).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def oracle_store():
    return oracle_ref.parse_log(REAL_CSV)


def test_q1_segmentation(parsed, oracle_store):
    # known campaign shape: 5 enabled + 5 disabled runs, 128,960 data rows
    counts = {
        (r["actuators_enabled"], r["run_idx"]): r["n"]
        for r in parsed.groupBy("actuators_enabled", "run_idx").agg(
            F.count("*").alias("n")
        ).collect()
    }
    exp = {}
    for grp, metrics in oracle_store.items():
        enabled = "enabled" in grp
        for i, run in enumerate(metrics["accel"]):
            if run:
                exp[(enabled, i)] = len(run)
    assert counts == exp
    assert sum(counts.values()) == 128960


def test_q2_time_and_values(parsed, oracle_store):
    # spot-check full value equality + time synthesis for one run per group
    for enabled in (True, False):
        grp = next(g for g in oracle_store if ("enabled" in g) == enabled)
        run0 = np.array(oracle_store[grp]["accel"][0])
        t0 = np.array(oracle_store[grp]["time"][0])
        rows = (
            parsed.where(
                (F.col("actuators_enabled") == enabled) & (F.col("run_idx") == 0)
            )
            .orderBy("sample_idx")
            .select("accel_g", "time_s")
            .collect()
        )
        got = np.array([r["accel_g"] for r in rows])
        gott = np.array([r["time_s"] for r in rows])
        np.testing.assert_allclose(got, run0, rtol=0, atol=0)
        np.testing.assert_allclose(gott, t0, rtol=1e-12)


def test_q3_q5_medfilt_stats(parsed, oracle_store):
    # per-run RMS/min/max of median-filtered acceleration == scipy oracle
    filt = median_filter(parsed, "accel_g", RUN, "sample_idx", 15, "f")
    stats = {
        (r["actuators_enabled"], r["run_idx"]): (r["rms"], r["min_val"], r["max_val"])
        for r in run_stats(filt, "f", RUN).collect()
    }
    for grp, runs in oracle_ref.filtered_runs(oracle_store, "accel").items():
        enabled = "enabled" in grp
        for i, (rms, mn, mx) in enumerate(oracle_ref.run_stats(runs)):
            got = stats[(enabled, i)]
            np.testing.assert_allclose(got, (rms, mn, mx), rtol=1e-12)


def test_q4_jerk(parsed, oracle_store):
    filt = median_filter(parsed, "accel_g", RUN, "sample_idx", 15, "f")
    jerk = np_gradient(filt, "f", RUN, "sample_idx", "jerk")
    grp = next(g for g in oracle_store if "enabled" in g)
    exp = np.gradient(
        oracle_ref.filtered_runs(oracle_store, "accel")[grp][2]
    )
    got = np.array(
        [
            r["jerk"]
            for r in jerk.where(F.col("actuators_enabled") & (F.col("run_idx") == 2))
            .orderBy("sample_idx")
            .select("jerk")
            .collect()
        ]
    )
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-15)


def test_full_report_golden(spark, oracle_store):
    """The one-pass 4-metric report (orclog_e2e) reproduces every group mean
    and Welch test the metric-by-metric oracle produces."""
    from orc_spark.plans.orclog_e2e import orclog_full_report

    rows = {r["metric"]: r for r in orclog_full_report(spark, REAL_CSV).collect()}
    assert set(rows) == {"accel", "pitch", "roll", "jerk"}
    metric_map = {"accel": "accel", "pitch": "pitch", "roll": "roll", "jerk": "accel"}
    for label, src in metric_map.items():
        deriv = label == "jerk"
        flt = oracle_ref.filtered_runs(oracle_store, src, derivative=deriv)
        pops = {("enabled" in g): oracle_ref.run_stats(r) for g, r in flt.items()}
        r = rows[label]
        for si, (stat, alt) in enumerate(
            [("rms", "less"), ("min", "greater"), ("max", "less")]
        ):
            exp_on = np.mean([s[si] for s in pops[True]])
            exp_off = np.mean([s[si] for s in pops[False]])
            np.testing.assert_allclose(r[f"avg_{stat}_on"], exp_on, rtol=1e-10)
            np.testing.assert_allclose(r[f"avg_{stat}_off"], exp_off, rtol=1e-10)
            exp_t, exp_p = oracle_ref.welch(
                [s[si] for s in pops[True]], [s[si] for s in pops[False]], alt
            )
            np.testing.assert_allclose(r[f"t_{stat}"], exp_t, rtol=1e-9)
            np.testing.assert_allclose(r[f"p_{stat}"], exp_p, rtol=1e-8)


def test_q6_q7_golden_stats(parsed, oracle_store):
    """Reproduce ORC Result Summary.pdf p.1 (HS vibration column)."""
    filt = median_filter(parsed, "accel_g", RUN, "sample_idx", 15, "f")
    per_run = run_stats(filt, "f", RUN).cache()
    means = {
        r["actuators_enabled"]: (r["avg_rms"], r["avg_min"], r["avg_max"])
        for r in group_means(per_run, ["actuators_enabled"]).collect()
    }
    # Group means vs the numpy oracle. (BASELINE.md quotes PDF RMS avgs
    # 0.0662/0.0758, but running the reference's own pipeline on the surviving
    # CSV yields 0.1011/0.1493 — the PDF row was produced from a different
    # data cut. The PDF p-values DO match this CSV exactly, so they are the
    # authoritative golden anchor; asserted below.)
    flt_acc = oracle_ref.filtered_runs(oracle_store, "accel")
    for grp, runs in flt_acc.items():
        st = oracle_ref.run_stats(runs)
        exp = tuple(np.mean([s[i] for s in st]) for i in range(3))
        np.testing.assert_allclose(means["enabled" in grp], exp, rtol=1e-12)

    # Welch one-sided t-tests on per-run stats populations (enabled = pop a)
    flt = oracle_ref.filtered_runs(oracle_store, "accel")
    pops = {("enabled" in g): oracle_ref.run_stats(r) for g, r in flt.items()}
    for stat_col, idx, alt, golden_p in [
        ("rms", 0, "less", 1.06e-6),
        ("min_val", 1, "greater", 4.42e-5),
        ("max_val", 2, "less", 1.52e-6),
    ]:
        row = welch_ttest(per_run, stat_col, "actuators_enabled", alt).collect()[0]
        exp_t, exp_p = oracle_ref.welch(
            [s[idx] for s in pops[True]], [s[idx] for s in pops[False]], alt
        )
        np.testing.assert_allclose(row["t_stat"], exp_t, rtol=1e-10)
        np.testing.assert_allclose(row["p_value"], exp_p, rtol=1e-9)
        assert float(f"{row['p_value']:.3g}") == pytest.approx(golden_p, rel=5e-3)
    per_run.unpersist()
