"""Property-based end-to-end checks for the round-4 analytics operators:
random event tables are written as parquet, the REAL registry queries run on
them, and the results are compared against brute-force Python oracles —
independent of the DuckDB SQL oracles the driver uses (which share the
query's algebraic structure; these do not)."""

import os
import tempfile

import pytest

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

DAY_US = 86400 * 1000000
GAP_US = 1800 * 1000000  # 30 min, matches cdc_q.SESSION_GAP_US


def _write_events(spark, rows):
    """Write rows (list of dicts) as an events.parquet the loaders accept."""
    d = tempfile.mkdtemp(prefix="orc_props_")
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf["ts_us"], unit="us")
    pdf = pdf.drop(columns=["ts_us"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def _mk_rows(user_times, extra=None):
    rows = []
    eid = 0
    for ui, times in enumerate(user_times):
        for t in sorted(times):
            r = {
                "event_id": eid,
                "ts_us": int(t),
                "user_id": ui + 1,
                "event_type": "view",
                "value": 1.0,
                "props": "{}",
            }
            if extra:
                r.update(extra(ui, eid, t))
            rows.append(r)
            eid += 1
    return rows


times_strategy = st.lists(
    st.integers(0, 3 * DAY_US), min_size=1, max_size=25, unique=True
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.sweep  # long-tail value check: full/nightly tier
@given(user_times=st.lists(times_strategy, min_size=1, max_size=3))
def test_ev_concurrency_matches_bruteforce(spark, user_times):
    from orc_spark.plans.cdc_q import ev_concurrency

    sf = _write_events(spark, _mk_rows(user_times))
    got = {
        r["day"]: r
        for r in ev_concurrency(spark, sf).collect()
    }

    # brute-force: sessions by the 30-min gap rule, concurrency evaluated
    # on continuous time: conc(t) = #{sessions: start <= t <= end}
    sessions = []
    for times in user_times:
        ts = sorted(times)
        start = prev = ts[0]
        for t in ts[1:]:
            if t - prev > GAP_US:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))

    def conc(t):
        return sum(1 for s, e in sessions if s <= t <= e)

    bdays = {s // DAY_US for s, _ in sessions} | {
        (e + 1) // DAY_US for _, e in sessions
    }
    # the spine fills quiet middle days (ongoing sessions, no boundaries)
    days = list(range(min(bdays), max(bdays) + 1))
    assert sorted(got) == days
    for d in days:
        # peak is reached at the day start or at a session start within it
        candidates = [d * DAY_US] + [
            s for s, _ in sessions if s // DAY_US == d
        ]
        assert got[d]["peak_concurrency"] == max(conc(t) for t in candidates)
        assert got[d]["eod_concurrency"] == conc((d + 1) * DAY_US - 1)
        assert got[d]["n_starts"] == sum(
            1 for s, _ in sessions if s // DAY_US == d
        )
        assert got[d]["n_ends"] == sum(
            1 for _, e in sessions if (e + 1) // DAY_US == d
        )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=2, max_size=4),
    purchase_mask=st.lists(st.booleans(), min_size=4, max_size=4),
)
@pytest.mark.sweep  # long-tail value check: full/nightly tier
def test_ev_survival_matches_bruteforce(spark, user_times, purchase_mask):
    from orc_spark.plans.cdc_q import _KM_SCALE, ev_survival

    def extra(ui, eid, t):
        # a user's LAST event becomes a purchase when its mask bit is set
        return {
            "event_type": "purchase"
            if purchase_mask[ui % len(purchase_mask)]
            and t == max(user_times[ui])
            else "view"
        }

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = ev_survival(spark, sf).orderBy("t").collect()

    end_ts = max(t for times in user_times for t in times)
    durs = []
    for ui, times in enumerate(user_times):
        o = min(times)
        if purchase_mask[ui % len(purchase_mask)]:
            durs.append(((max(times) - o) // DAY_US, 1))
        else:
            durs.append(((end_ts - o) // DAY_US, 0))
    steps = {}
    for t, ev in durs:
        d, c = steps.get(t, (0, 0))
        steps[t] = (d + ev, c + (1 - ev))
    n_at_risk = len(durs)
    s = _KM_SCALE
    expected = []
    for t in sorted(steps):
        d, c = steps[t]
        s = s * (n_at_risk - d) // n_at_risk
        expected.append((t, d, c, n_at_risk, s))
        n_at_risk -= d + c
    assert [
        (r["t"], r["d"], r["c"], r["n_at_risk"], r["surv_fp"]) for r in got
    ] == expected
    # survival is a probability and non-increasing
    fps = [r["surv_fp"] for r in got]
    assert all(0 <= f <= _KM_SCALE for f in fps)
    assert all(a >= b for a, b in zip(fps, fps[1:]))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    series=st.lists(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=64),
            min_size=2,
            max_size=15,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_ts_mannkendall_matches_naive(spark, series):
    from orc_spark.plans.timeseries_q import ts_mannkendall

    def extra_factory(vals_by_user):
        def extra(ui, eid, t):
            # deterministic per-event value via the event counter
            return {"value": vals_by_user[ui].pop(0)}

        return extra

    user_times = [
        [i * 1000000 for i in range(len(vs))] for vs in series
    ]
    vals_by_user = [list(vs) for vs in series]
    sf = _write_events(spark, _mk_rows(user_times, extra_factory(vals_by_user)))
    got = {r["user_id"]: r for r in ts_mannkendall(spark, sf).collect()}

    for ui, vs in enumerate(series):
        arr = np.asarray(vs)
        s_stat = sum(
            int(np.sign(arr[j] - arr[i]))
            for i in range(len(arr))
            for j in range(i + 1, len(arr))
        )
        n_pairs = len(arr) * (len(arr) - 1) // 2
        r = got[ui + 1]
        assert r["s_stat"] == s_stat
        assert r["n_pairs"] == n_pairs
        assert -1.0 <= r["tau"] <= 1.0


basket_strategy = st.lists(
    st.lists(st.integers(1, 12), min_size=1, max_size=5, unique=True),
    min_size=1,
    max_size=20,
)


def _write_lineitem(spark, baskets):
    d = tempfile.mkdtemp(prefix="orc_props_li_")
    rows = []
    for oi, items in enumerate(baskets):
        for ln, it in enumerate(items):
            rows.append(
                {
                    "l_orderkey": oi + 1,
                    "l_partkey": it,
                    "l_suppkey": it,  # suppliers mirror parts for the graph
                    "l_linenumber": ln + 1,
                }
            )
    spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "lineitem.parquet"))
    return d


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(baskets=basket_strategy)
def test_gr_triangles_matches_bruteforce(spark, baskets):
    from itertools import combinations

    from orc_spark.plans.graph_q import TRI_K, gr_triangles

    sf = _write_lineitem(spark, baskets)
    got = {r["s_suppkey"]: r for r in gr_triangles(spark, sf).collect()}

    # brute force: co-occurrence weights -> per-node top-K -> mutual edges
    from collections import Counter, defaultdict

    w = Counter()
    for items in baskets:
        for a, b in combinations(sorted(set(items)), 2):
            w[(a, b)] += 1
    nbrs = defaultdict(list)
    for (a, b), c in w.items():
        nbrs[a].append((c, b))
        nbrs[b].append((c, a))
    top = {
        u: {v for c, v in sorted(lst, key=lambda cv: (-cv[0], cv[1]))[:TRI_K]}
        for u, lst in nbrs.items()
    }
    edges = {
        (a, b)
        for (a, b) in w
        if b in top.get(a, set()) and a in top.get(b, set())
    }
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # enumerate each triangle once as a<b<c, credit all three corners
    tri = Counter()
    for a, b in edges:
        for c in sorted(adj[a] & adj[b]):
            if c > b:
                for n in (a, b, c):
                    tri[n] += 1
    for node, r in got.items():
        assert r["degree"] == len(adj[node])
        assert r["n_tri"] == tri.get(node, 0)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(baskets=basket_strategy)
def test_mb_rules_matches_bruteforce(spark, baskets):
    from itertools import combinations

    from orc_spark.plans.graph_q import MB_MIN_SUPPORT, mb_rules

    sf = _write_lineitem(spark, baskets)
    got = mb_rules(spark, sf).collect()

    from collections import Counter

    item = Counter()
    pair = Counter()
    for items in baskets:
        s = sorted(set(items))
        for it in s:
            item[it] += 1
        for a, b in combinations(s, 2):
            pair[(a, b)] += 1
    n_baskets = len(baskets)
    for r in got:
        a, b = r["pa"], r["pb"]
        assert pair[(a, b)] == r["c_ab"] >= MB_MIN_SUPPORT
        assert item[a] == r["c_a"] and item[b] == r["c_b"]
        # _r6, not bare round(): integer ratios DO land on exact decimal
        # halves at the 7th digit, where Python's binary half-even rounding
        # disagrees with both engines' decimal HALF_UP (r14 funnel finding)
        assert abs(
            r["lift"]
            - _r6(pair[(a, b)] * n_baskets / (item[a] * item[b]))
        ) < 1e-9


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=3))
def test_ts_twap_conserves_coverage(spark, user_times):
    """Conservation law: across all of a user's days, TWAP weights must sum
    EXACTLY to (last_ts − first_ts) and the weighted sum to Σ v_i·Δt_i —
    catches any day-boundary clipping loss (the review-found bug class).
    Each day's weight is also bounded by the day length."""
    from orc_spark.plans.timeseries_q import ts_twap

    rng_vals = {}

    def extra(ui, eid, t):
        v = float((eid * 37 % 500) + 1) / 7.0
        rng_vals[(ui, t)] = v
        return {"value": v}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    rows = ts_twap(spark, sf).collect()

    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for ui, times in enumerate(user_times):
        ts = sorted(times)
        uid = ui + 1
        got = by_user.get(uid, [])
        if len(ts) < 2 or ts[-1] == ts[0]:
            assert got == []
            continue
        assert sum(r["sum_dt"] for r in got) == ts[-1] - ts[0]
        expected_wv = sum(
            round(rng_vals[(ui, a)] * 10000) * (b - a)
            for a, b in zip(ts, ts[1:])
        )
        assert sum(r["sum_wv"] for r in got) == expected_wv
        assert all(0 < r["sum_dt"] <= DAY_US for r in got)


THROTTLE_US = 120 * 1000000


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=3))
def test_st_throttle_and_token_bucket_match_bruteforce(spark, user_times):
    from orc_spark.plans.stateful_q import (
        TB_CAP,
        TB_REFILL_DIV,
        TB_SCALE,
        st_throttle,
        st_token_bucket,
    )

    sf = _write_events(spark, _mk_rows(user_times))
    thr = {
        (r["user_id"], r["event_id"]): r
        for r in st_throttle(spark, sf).collect()
    }
    tb = {
        (r["user_id"], r["event_id"]): r
        for r in st_token_bucket(spark, sf).collect()
    }

    eid = 0
    for ui, times in enumerate(user_times):
        uid = ui + 1
        # greedy throttle
        last = None
        kept_n = 0
        # token bucket
        tok = TB_CAP
        prev = None
        adm_n = 0
        for t in sorted(times):
            keep = last is None or t - last >= THROTTLE_US
            if keep:
                kept_n += 1
                last = t
            r = thr[(uid, eid)]
            assert r["kept"] == int(keep) and r["n_kept"] == kept_n

            if prev is not None:
                tok = min(TB_CAP, tok + (t - prev) // TB_REFILL_DIV)
            prev = t
            admit = tok >= TB_SCALE
            if admit:
                tok -= TB_SCALE
                adm_n += 1
            r = tb[(uid, eid)]
            assert r["admitted"] == int(admit)
            assert r["tokens_after"] == tok and r["n_admitted"] == adm_n
            eid += 1


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    langs=st.lists(
        st.sampled_from(["en", "de", "fr", "es", "zh", "pt"]),
        min_size=1,
        max_size=40,
    )
)
def test_cu_repetition_matches_bruteforce(spark, langs):
    import hashlib

    from orc_spark.plans.curation_q import (
        CU_REP_DEFAULT,
        CU_REP_FACTORS,
        cu_repetition,
    )

    d = tempfile.mkdtemp(prefix="orc_props_docs_")
    pdf = pd.DataFrame(
        {
            "doc_id": range(1, len(langs) + 1),
            "text": ["w " * 5] * len(langs),
            "lang": langs,
            "source": ["s"] * len(langs),
            "n_chars": [10] * len(langs),
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {r["lang"]: r for r in cu_repetition(spark, d).collect()}

    exp = {}
    for doc_id, lang in zip(range(1, len(langs) + 1), langs):
        f = CU_REP_FACTORS.get(lang, CU_REP_DEFAULT)
        h = int(hashlib.md5(f"rep:{doc_id}".encode()).hexdigest()[:15], 16)
        n = f // 1000 + (1 if h % 1000 < f % 1000 else 0)
        di, do = exp.get(lang, (0, 0))
        exp[lang] = (di + 1, do + n)
    assert set(got) == set(exp)
    for lang, (di, do) in exp.items():
        assert got[lang]["docs_in"] == di
        assert got[lang]["docs_out"] == do
        assert got[lang]["chars_out"] == 10 * do


def test_st_bursts_semantics(spark):
    """Semantic sanity for the Kleinberg detector: perfectly uniform
    arrivals never enter the burst state; a dense cluster embedded in a
    sparse stream is labeled as a burst while the sparse tails are not."""
    from orc_spark.plans.stateful_q import st_bursts

    hour = 3600 * 1000000
    uniform = [i * hour for i in range(30)]
    # sparse hourly tail, then 10 events 1s apart, then sparse again
    clustered = (
        [i * hour for i in range(10)]
        + [10 * hour + i * 1000000 for i in range(10)]
        + [11 * hour + i * hour for i in range(1, 10)]
    )
    sf = _write_events(spark, _mk_rows([uniform, clustered]))
    rows = st_bursts(spark, sf).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)

    u1 = sorted(by_user[1], key=lambda r: r["event_id"])
    assert all(r["in_burst"] == 0 for r in u1), "uniform stream burst-free"

    u2 = sorted(by_user[2], key=lambda r: r["event_id"])
    # events 40..49 are the cluster (user 2's events start at id 30);
    # the gaps ENDING at events 41..49 are the 1-second gaps
    labels = {r["event_id"]: r["in_burst"] for r in u2}
    assert all(labels[eid] == 1 for eid in range(41, 50)), labels
    # the sparse tail after the cluster returns to the base state
    assert all(labels[eid] == 0 for eid in range(52, 59)), labels


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=3))
def test_ts_m4_matches_bruteforce(spark, user_times):
    from orc_spark.plans.timeseries_q import M4_BUCKETS, ts_m4

    def extra(ui, eid, t):
        v = float((eid * 37 % 11) - 5)  # deterministic, includes repeats
        return {"value": v}

    rows = _mk_rows(user_times, extra=extra)
    sf = _write_events(spark, rows)
    got = {
        (r["user_id"], r["bucket"]): r for r in ts_m4(spark, sf).collect()
    }

    # brute force per user
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    want = {}
    for uid, rs in per_user.items():
        rs = sorted(rs, key=lambda r: (r["ts_us"], r["event_id"]))
        tmin = min(r["ts_us"] for r in rs)
        tmax = max(r["ts_us"] for r in rs)
        for r in rs:
            b = min(
                (r["ts_us"] - tmin) * M4_BUCKETS // (tmax - tmin + 1),
                M4_BUCKETS - 1,
            )
            k = (uid, b)
            w = want.setdefault(
                k,
                {
                    "n_pts": 0,
                    "ts_first": r["ts_us"],
                    "ts_last": r["ts_us"],
                    "v_min": r["value"],
                    "v_max": r["value"],
                    "v_first": r["value"],
                    "v_last": r["value"],
                },
            )
            w["n_pts"] += 1
            w["ts_first"] = min(w["ts_first"], r["ts_us"])
            w["ts_last"] = max(w["ts_last"], r["ts_us"])
            w["v_min"] = min(w["v_min"], r["value"])
            w["v_max"] = max(w["v_max"], r["value"])
            w["v_last"] = r["value"]  # rows arrive in rn order
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for f in (
            "n_pts", "ts_first", "ts_last", "v_min", "v_max", "v_first", "v_last",
        ):
            assert g[f] == w[f], (k, f, g, w)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_ev_bot_detect_matches_bruteforce(spark, user_times, seed):
    from orc_spark.plans.cdc_q import BOT_MAX_EPM, ev_bot_detect

    rng = np.random.RandomState(seed)

    def extra(ui, eid, t):
        return {
            "event_type": ["view", "click"][int(rng.randint(2))],
            "value": float(rng.randint(2)),  # small domain → real dups
        }

    rows = _mk_rows(user_times, extra=extra)
    sf = _write_events(spark, rows)
    got = {r["user_id"]: r for r in ev_bot_detect(spark, sf).collect()}

    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    for uid, rs in per_user.items():
        rs = sorted(rs, key=lambda r: (r["ts_us"], r["event_id"]))
        minutes = {}
        for r in rs:
            m = r["ts_us"] // 60000000
            minutes[m] = minutes.get(m, 0) + 1
        n_dup = sum(
            1
            for a, b in zip(rs, rs[1:])
            if a["event_type"] == b["event_type"] and a["value"] == b["value"]
        )
        g = got[uid]
        assert g["n_events"] == len(rs)
        assert g["max_epm"] == max(minutes.values())
        assert g["n_dup_consec"] == n_dup
        # _r6: integer-ratio halves round like the engines (r14 finding)
        want_ratio = 0.0 if len(rs) == 1 else _r6(n_dup / (len(rs) - 1))
        assert abs(g["dup_ratio"] - want_ratio) < 1e-12
        want_bot = g["max_epm"] > BOT_MAX_EPM or want_ratio >= 0.5
        assert g["is_bot"] == want_bot


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=3))
def test_ts_theilsen_matches_bruteforce(spark, user_times):
    """Median pairwise slope + median-residual intercept vs a plain numpy
    oracle (independent of the DuckDB SQL the driver compares against)."""
    import math

    from orc_spark.plans.timeseries_q import TS_DAY_US, ts_theilsen

    def val(t):
        return ((t // 1000003) % 17) * 0.5 - 4.0

    rows = _mk_rows(
        user_times, extra=lambda ui, eid, t: {"value": val(t)}
    )
    sf = _write_events(spark, rows)
    got = {r["user_id"]: r for r in ts_theilsen(spark, sf).collect()}

    for ui, times in enumerate(user_times):
        uid = ui + 1
        ts = sorted(times)
        vs = [val(t) for t in ts]
        slopes = [
            (vs[j] - vs[i]) / ((ts[j] - ts[i]) / TS_DAY_US)
            for i in range(len(ts))
            for j in range(i + 1, len(ts))
        ]
        if not slopes:
            assert uid not in got  # n == 1: no pairs, user absent
            continue
        g = got[uid]
        slope = float(np.median(slopes))
        resid = [v - slope * (t / TS_DAY_US) for t, v in zip(ts, vs)]
        assert g["n"] == len(ts)
        assert g["n_pairs"] == len(slopes)
        # The plan emits round(...,6) outputs (ulp cushion, see ts_theilsen):
        # abs_tol must absorb the ≤5e-7 rounding error; rel_tol=1e-9 governs
        # large magnitudes where round-to-6-decimals is a double no-op.
        assert math.isclose(g["slope_med"], slope, rel_tol=1e-9, abs_tol=5.1e-7)
        assert math.isclose(
            g["intercept"], float(np.median(resid)), rel_tol=1e-9, abs_tol=5.1e-7
        )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=3))
def test_ts_outlier_mad_matches_bruteforce(spark, user_times):
    """Per-user median/MAD screening vs plain numpy."""
    import math

    from orc_spark.plans.timeseries_q import MAD_THRESH_MULT, ts_outlier_mad

    def val(t):
        return ((t // 999983) % 23) * 0.25 - 2.0

    rows = _mk_rows(
        user_times, extra=lambda ui, eid, t: {"value": val(t)}
    )
    sf = _write_events(spark, rows)
    got = {r["user_id"]: r for r in ts_outlier_mad(spark, sf).collect()}

    for ui, times in enumerate(user_times):
        uid = ui + 1
        vs = np.array([val(t) for t in sorted(times)], dtype=np.float64)
        med = float(np.median(vs))
        adev = np.abs(vs - med)
        mad = float(np.median(adev))
        n_out = int(np.sum(adev > mad * MAD_THRESH_MULT))
        g = got[uid]
        assert g["n"] == len(vs)
        assert math.isclose(g["med"], round(med, 6), abs_tol=1e-9)
        assert math.isclose(g["mad"], round(mad, 6), abs_tol=1e-9)
        assert g["n_outliers"] == n_out


def test_io_compaction_matches_bruteforce(spark, sf_small):
    """Greedy per-partition packing vs a plain-Python replay of the rule
    (bin = rows-before div target) on the real sf0.001 manifest."""
    import collections

    import pyarrow.parquet as pq

    from orc_spark.plans.e2e_q import COMPACT_TARGET_ROWS, io_compaction

    got = [tuple(r) for r in io_compaction(spark, sf_small).collect()]

    li = pq.read_table(
        os.path.join(sf_small, "lineitem.parquet"), columns=["l_orderkey"]
    ).to_pandas()
    od = pq.read_table(
        os.path.join(sf_small, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
    ).to_pandas()
    rows_per = li.groupby("l_orderkey").size().to_dict()
    man = collections.defaultdict(list)
    for _, r in od.iterrows():
        fid = int(r["o_orderkey"])
        if fid not in rows_per:
            continue
        part = r["o_orderdate"].year * 100 + r["o_orderdate"].month
        man[part].append(fid)
    want = []
    for part in sorted(man):
        cum = 0
        bins = collections.defaultdict(list)
        for fid in sorted(man[part]):
            bins[cum // COMPACT_TARGET_ROWS].append(fid)
            cum += rows_per[fid]
        for b in sorted(bins):
            fids = bins[b]
            want.append(
                (
                    part,
                    b,
                    len(fids),
                    sum(rows_per[f] for f in fids),
                    min(fids),
                    max(fids),
                )
            )
    assert [(g[0], g[1], g[2], g[3], g[4], g[5]) for g in got] == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=3))
def test_ev_feature_snapshot_matches_bruteforce(spark, user_times):
    """Point-in-time features vs a brute-force replay: for each label
    event, count/sum over events with label_ts - 7d <= ts <= label_ts - 1
    (strictly before — same-instant events must NOT leak)."""
    from orc_spark.plans.cdc_q import FEAT_WIN_US, ev_feature_snapshot

    def typ(eid):
        return ["view", "click", "purchase"][eid % 3]

    def val(t):
        return ((t // 777767) % 31) * 0.37 + 0.5

    rows = _mk_rows(
        user_times,
        extra=lambda ui, eid, t: {"event_type": typ(eid), "value": val(t)},
    )
    sf = _write_events(spark, rows)
    got = {r["event_id"]: r for r in ev_feature_snapshot(spark, sf).collect()}

    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    n_labels = 0
    for r in rows:
        if r["event_type"] != "purchase":
            continue
        n_labels += 1
        t = r["ts_us"]
        prior = [
            o
            for o in by_user[r["user_id"]]
            if t - FEAT_WIN_US <= o["ts_us"] <= t - 1
        ]
        g = got[r["event_id"]]
        assert g["n_prior_7d"] == len(prior)
        assert g["n_views_7d"] == sum(
            1 for o in prior if o["event_type"] == "view"
        )
        assert g["n_clicks_7d"] == sum(
            1 for o in prior if o["event_type"] == "click"
        )
        assert g["spend_cents_7d"] == sum(
            int(round(o["value"] * 100)) for o in prior
        )
        assert g["label_cents"] == int(round(r["value"] * 100))
    assert len(got) == n_labels


def test_tx_zipf_recovers_planted_zipf_slope(spark):
    """A corpus whose term frequencies are planted as floor(2000/rank)
    must fit a log-log slope near -1 with exact integer head shares."""
    from orc_spark.plans.ir_q import tx_zipf

    # letter-only names: the tokenizer is '[a-z]+', so digits would
    # collapse every term into one (how this test found the single-term
    # division-by-zero guard)
    letters = "abcdefghij"
    terms = [
        f"t{letters[k // 10]}{letters[k % 10]}" for k in range(100)
    ]
    counts = {t: 2000 // k for k, t in enumerate(terms, start=1)}
    text = " ".join(t for t in terms for _ in range(counts[t]))
    d = tempfile.mkdtemp(prefix="orc_props_zipf_")
    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "text": [text],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [len(text)],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    row = tx_zipf(spark, d).collect()[0]
    total = sum(counts.values())
    head10 = sum(2000 // k for k in range(1, 11))
    assert row["n_terms"] == 100
    assert row["total_tokens"] == total
    assert abs(row["top1_share"] - round(2000 / total, 6)) < 1e-9
    assert abs(row["head10_share"] - round(head10 / total, 6)) < 1e-9
    # floor() distorts the pure 1/k law slightly; the OLS slope stays
    # within a few percent of -1
    assert -1.06 < row["zipf_slope"] < -0.94, row["zipf_slope"]


def test_tx_zipf_single_term_vocab_is_null_slope(spark):
    """A one-term vocabulary has x = ln(1) = 0 everywhere — the OLS
    denominator is exactly 0; the slope must be NULL, not an ANSI
    division-by-zero crash."""
    from orc_spark.plans.ir_q import tx_zipf

    d = tempfile.mkdtemp(prefix="orc_props_zipf1_")
    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["aaa aaa aaa"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [11],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    row = tx_zipf(spark, d).collect()[0]
    assert row["n_terms"] == 1
    assert row["total_tokens"] == 3
    assert row["zipf_slope"] is None


def test_dd_substring_flags_planted_repeat(spark):
    """dd_substring planted-duplication semantics: two docs sharing a
    verbatim 60-char span (>= the K + W - 1 = 47-char MOSS guarantee) must
    both report shared fingerprints — and the SAME shared set (equal
    shared_xor), since nothing else repeats; a unique doc reports zero;
    a doc shorter than the guarantee bound has no fingerprints at all and
    is absent from the audit."""
    import random

    from orc_spark.plans.dedup_q import DD_SUB_K, DD_SUB_W, dd_substring

    rng = random.Random(421)

    def rand_text(n):
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))

    planted = "the exact same sixty characters appear verbatim in both docs!"
    assert len(planted) >= DD_SUB_K + DD_SUB_W - 1
    d = tempfile.mkdtemp(prefix="orc_props_sub_")
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                rand_text(150) + planted + rand_text(150),
                rand_text(140) + planted + rand_text(160),
                rand_text(300),
                rand_text(20),  # below the guarantee bound: no fingerprints
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [0] * 4,
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {r["doc_id"]: r for r in dd_substring(spark, d).collect()}

    assert set(got) == {1, 2, 3}  # doc 4 too short to fingerprint
    assert got[1]["n_shared_fp"] >= 1
    assert got[2]["n_shared_fp"] >= 1
    # only the planted span repeats, so both docs share the identical set
    assert got[1]["n_shared_fp"] == got[2]["n_shared_fp"]
    assert got[1]["shared_xor"] == got[2]["shared_xor"] != 0
    assert got[3]["n_shared_fp"] == 0 and got[3]["shared_xor"] == 0
    for doc in (1, 2, 3):
        # _r6: integer-ratio halves round like the engines (r14 finding)
        want = _r6(got[doc]["n_shared_fp"] / got[doc]["n_fp"])
        assert abs(got[doc]["shared_ratio"] - want) < 1e-12


def test_dq_referential_planted_orphans(spark):
    """The orphan-counting branch is dead on the intact driver testdata, so
    exercise it synthetically: planted missing parents must produce exact
    n_orphans (row-level) and n_orphan_keys (distinct), an EMPTY child
    table must still emit its edge row (sentinel path) with zero counts,
    and intact edges stay intact."""
    from orc_spark.plans.dq_q import dq_referential

    d = tempfile.mkdtemp(prefix="orc_props_fk_")

    def w(name, pdf):
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, f"{name}.parquet")
        )

    w("region", pd.DataFrame({"r_regionkey": [0, 1]}))
    # nation EMPTY: its child edge (nation.regionkey->region) must still
    # appear via the sentinel path, and customer/supplier nationkeys become
    # orphans
    spark.createDataFrame(
        [], "n_nationkey long, n_regionkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "nation.parquet")
    )
    w("customer", pd.DataFrame({"c_custkey": [1, 2], "c_nationkey": [7, 7]}))
    w("supplier", pd.DataFrame({"s_suppkey": [10], "s_nationkey": [8]}))
    w("part", pd.DataFrame({"p_partkey": [100]}))
    w("orders", pd.DataFrame({"o_orderkey": [1000, 1001],
                              "o_custkey": [1, 99]}))  # 99: planted orphan
    # two rows pointing at the same missing order 9999 (n_orphans 2,
    # n_orphan_keys 1), one missing part, suppliers intact
    w("lineitem", pd.DataFrame({
        "l_orderkey": [1000, 9999, 9999],
        "l_partkey": [100, 100, 555],
        "l_suppkey": [10, 10, 10],
    }))

    got = {r["fk_edge"]: r for r in dq_referential(spark, d).collect()}
    assert len(got) == 7

    def check(edge, n_child, n_orphans, n_orphan_keys):
        g = got[edge]
        assert (g["n_child"], g["n_orphans"], g["n_orphan_keys"]) == (
            n_child, n_orphans, n_orphan_keys
        ), (edge, tuple(g))
        assert g["intact"] == (n_orphans == 0)

    check("lineitem.orderkey->orders", 3, 2, 1)
    check("lineitem.partkey->part", 3, 1, 1)
    check("lineitem.suppkey->supplier", 3, 0, 0)
    check("orders.custkey->customer", 2, 1, 1)
    check("customer.nationkey->nation", 2, 2, 1)
    check("supplier.nationkey->nation", 1, 1, 1)
    check("nation.regionkey->region", 0, 0, 0)  # empty child, sentinel row


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    span_len=st.integers(47, 120),
    seeds=st.tuples(st.integers(0, 2**30), st.integers(0, 2**30)),
)
def test_dd_substring_moss_guarantee(spark, span_len, seeds):
    """MOSS guarantee property: ANY cross-doc verbatim repeat of length
    >= K + W - 1 = 47 chars must surface as at least one shared
    fingerprint in BOTH carrying docs, for arbitrary span lengths and
    surrounding contexts."""
    import random

    from orc_spark.plans.dedup_q import dd_substring

    rngs = [random.Random(s) for s in seeds]

    def rand_text(rng, n):
        return "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 .,") for _ in range(n)
        )

    span_rng = random.Random(span_len * 7919 + 13)
    planted = rand_text(span_rng, span_len)
    d = tempfile.mkdtemp(prefix="orc_props_moss_")
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                rand_text(rngs[0], 80) + planted + rand_text(rngs[0], 80),
                rand_text(rngs[1], 120) + planted + rand_text(rngs[1], 40),
            ],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [0, 0],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {r["doc_id"]: r for r in dd_substring(spark, d).collect()}
    assert got[1]["n_shared_fp"] >= 1, dict(got[1].asDict())
    assert got[2]["n_shared_fp"] >= 1, dict(got[2].asDict())


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    custs=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 1000),  # orderdate as day offset
                st.floats(0.01, 99999.99, allow_nan=False, width=64),
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_cdc_scd2_matches_bruteforce(spark, custs):
    """SCD2 history vs a plain-Python oracle: version numbers, the
    [valid_from, valid_to) interval chain, current flags, and the exact
    integer-cents running spend (Spark round = HALF_UP on the binary
    double, replicated via Decimal)."""
    import datetime
    from decimal import ROUND_HALF_UP, Decimal

    from orc_spark.plans.cdc_q import cdc_scd2

    d = tempfile.mkdtemp(prefix="orc_props_scd2_")
    rows = []
    okey = 0
    for ci, orders in enumerate(custs):
        for day, price in orders:
            okey += 1
            rows.append(
                {
                    "o_orderkey": okey,
                    "o_custkey": ci + 1,
                    "o_orderdate": datetime.date(2020, 1, 1)
                    + datetime.timedelta(days=day),
                    "o_totalprice": price,
                }
            )
    spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "orders.parquet"))
    got = {r["o_orderkey"]: r for r in cdc_scd2(spark, d).collect()}
    assert len(got) == okey

    def cents(p):
        return int(
            Decimal(p * 100).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    def ms(date):
        return (date - datetime.date(1970, 1, 1)).days * 86400000

    okey2 = 0
    by_cust = {}
    for ci, orders in enumerate(custs):
        for day, price in orders:
            okey2 += 1
            by_cust.setdefault(ci + 1, []).append(
                (datetime.date(2020, 1, 1) + datetime.timedelta(days=day), okey2, price)
            )
    for ck, orders in by_cust.items():
        orders.sort(key=lambda t: (t[0], t[1]))
        cum = 0
        for i, (date, okey3, price) in enumerate(orders):
            cum += cents(price)
            g = got[okey3]
            assert g["o_custkey"] == ck
            assert g["version"] == i + 1
            assert g["valid_from_ms"] == ms(date)
            want_to = ms(orders[i + 1][0]) if i + 1 < len(orders) else None
            assert g["valid_to_ms"] == want_to
            assert g["is_current"] == (1 if i == len(orders) - 1 else 0)
            assert g["order_cents"] == cents(price)
            assert g["cum_spend_cents"] == cum


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(
        st.lists(st.integers(0, 10 * DAY_US), min_size=1, max_size=20, unique=True),
        min_size=1,
        max_size=3,
    ),
    type_bits=st.lists(st.integers(0, 2), min_size=1, max_size=60),
)
def test_ev_attribution_matches_bruteforce(spark, user_times, type_bits):
    """Last-touch attribution vs plain Python: per purchase, the most
    recent prior view/click of the same user (ties on event_id), credited
    only within the 7-day window; exact integer-micro staleness."""
    from orc_spark.plans.cdc_q import ATTR_WINDOW_US, ev_attribution

    kinds = ["view", "click", "purchase"]

    def extra(ui, eid, t):
        return {"event_type": kinds[type_bits[eid % len(type_bits)]]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {r["event_id"]: r for r in ev_attribution(spark, sf).collect()}

    # replay: same (user, ts sorted then event_id) order as _mk_rows built
    eid = 0
    events = []
    for ui, times in enumerate(user_times):
        for t in sorted(times):
            events.append(
                (eid, ui + 1, int(t), kinds[type_bits[eid % len(type_bits)]])
            )
            eid += 1
    purchases = 0
    for uid in {e[1] for e in events}:
        stream = sorted(
            [e for e in events if e[1] == uid], key=lambda e: (e[2], e[0])
        )
        last_touch = None
        for e_id, _u, ts, kind in stream:
            if kind != "purchase":
                last_touch = (e_id, ts, kind)
                continue
            purchases += 1
            g = got[e_id]
            if last_touch is not None and ts - last_touch[1] <= ATTR_WINDOW_US:
                assert g["touch_event_id"] == last_touch[0]
                assert g["touch_type"] == last_touch[2]
                want = round((ts - last_touch[1]) / 1000000.0, 6)
                assert abs(g["touch_latency_s"] - want) < 5.1e-7
            else:
                assert g["touch_event_id"] is None
                assert g["touch_type"] is None
                assert g["touch_latency_s"] is None
    assert len(got) == purchases


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    vals=st.lists(st.floats(0, 500, allow_nan=False, width=64), min_size=1, max_size=40),
    purchase_mod=st.integers(2, 5),
)
def test_ev_sessionize_matches_bruteforce(spark, user_times, vals, purchase_mod):
    """Gap sessionization vs plain Python: session boundaries on the exact
    30-min integer-micro gap rule, per-session counts, floor-cents value
    sums, and 6-dp durations."""
    import math

    from orc_spark.plans.cdc_q import SESSION_GAP_US, ev_sessionize

    def extra(ui, eid, t):
        return {
            "event_type": "purchase" if eid % purchase_mod == 0 else "view",
            "value": vals[eid % len(vals)],
        }

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {
        (r["user_id"], r["session_idx"]): r
        for r in ev_sessionize(spark, sf).collect()
    }

    eid = 0
    events = []
    for ui, times in enumerate(user_times):
        for t in sorted(times):
            events.append(
                (
                    ui + 1,
                    int(t),
                    eid,
                    "purchase" if eid % purchase_mod == 0 else "view",
                    vals[eid % len(vals)],
                )
            )
            eid += 1
    seen = set()
    for uid in {e[0] for e in events}:
        stream = sorted(
            [e for e in events if e[0] == uid], key=lambda e: (e[1], e[2])
        )
        sessions = []
        for e in stream:
            if not sessions or e[1] - sessions[-1][-1][1] > SESSION_GAP_US:
                sessions.append([e])
            else:
                sessions[-1].append(e)
        for si, sess in enumerate(sessions, start=1):
            g = got[(uid, si)]
            seen.add((uid, si))
            start, end = sess[0][1], sess[-1][1]
            assert g["n_events"] == len(sess)
            assert g["start_us"] == start and g["end_us"] == end
            assert math.isclose(
                g["duration_s"],
                round((end - start) / 1000000.0, 6),
                rel_tol=1e-9,
                abs_tol=5.1e-7,
            )
            assert g["n_purchases"] == sum(1 for e in sess if e[3] == "purchase")
            assert g["value_cents"] == sum(math.floor(e[4] * 100) for e in sess)
    assert set(got) == seen


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    kind_bits=st.lists(st.integers(0, 2), min_size=1, max_size=50),
)
def test_aj_asof_join_matches_bruteforce(spark, user_times, kind_bits):
    """As-of join vs plain Python replay: every click gets the latest
    prior-or-same-ts view of the same user (event_id tie-break), exact
    integer-millisecond gap via trunc division, clicks with no prior view
    carry NULLs."""
    from orc_spark.plans.relational2 import aj_asof_join

    kinds = ["view", "click", "other"]

    def extra(ui, eid, t):
        return {"event_type": kinds[kind_bits[eid % len(kind_bits)]],
                "value": float(eid) * 0.5}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {r["click_id"]: r for r in aj_asof_join(spark, sf).collect()}

    eid = 0
    events = []
    for ui, times in enumerate(user_times):
        for t in sorted(times):
            events.append(
                (ui + 1, int(t), eid, kinds[kind_bits[eid % len(kind_bits)]],
                 float(eid) * 0.5)
            )
            eid += 1
    clicks = 0
    for uid in {e[0] for e in events}:
        stream = sorted(
            [e for e in events if e[0] == uid and e[3] in ("view", "click")],
            key=lambda e: (e[1], e[2]),
        )
        last_view = None
        for _u, ts, e_id, kind, value in stream:
            if kind == "view":
                last_view = (e_id, ts, value)
                continue
            clicks += 1
            g = got[e_id]
            assert g["user_id"] == uid
            if last_view is None:
                assert g["last_view_id"] is None
                assert g["last_view_value"] is None
                assert g["gap_ms"] is None
            else:
                assert g["last_view_id"] == last_view[0]
                assert g["last_view_value"] == last_view[2]
                assert g["gap_ms"] == (ts - last_view[1]) // 1000
    assert len(got) == clicks


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(
        st.lists(st.integers(0, 30 * DAY_US), min_size=1, max_size=15, unique=True),
        min_size=1,
        max_size=4,
    )
)
def test_ev_retention_matches_bruteforce(spark, user_times):
    """Cohort retention matrix vs plain Python: per-user first-seen week
    anchors, (cohort, age) cell membership deduped per user, exact counts
    (float week division + trunc cast mirrored)."""
    from orc_spark.plans.relational3 import _WEEK_US, ev_retention

    sf = _write_events(spark, _mk_rows(user_times))
    got = {
        (r["cohort_week"], r["age_week"]): r["n_active_users"]
        for r in ev_retention(spark, sf).collect()
    }

    cells = {}
    for times in user_times:
        t0 = min(times)
        user_cells = {
            (int(t0 / _WEEK_US), int((t - t0) / _WEEK_US)) for t in times
        }
        for c in user_cells:
            cells[c] = cells.get(c, 0) + 1
    assert got == cells


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=4),
    kind_bits=st.lists(st.integers(0, 3), min_size=1, max_size=60),
)
def test_ev_funnel_matches_bruteforce(spark, user_times, kind_bits):
    """Ordered funnel vs plain Python: first view, first click strictly
    after it, first purchase strictly after that; stage counts and the
    6-dp mean view-to-purchase latency."""
    import math

    from orc_spark.plans.relational3 import ev_funnel

    kinds = ["view", "click", "purchase", "other"]

    def extra(ui, eid, t):
        return {"event_type": kinds[kind_bits[eid % len(kind_bits)]]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    g = ev_funnel(spark, sf).collect()[0]

    eid = 0
    per_user = {}
    for ui, times in enumerate(user_times):
        for t in sorted(times):
            per_user.setdefault(ui + 1, []).append(
                (int(t), kinds[kind_bits[eid % len(kind_bits)]])
            )
            eid += 1
    n1 = n2 = n3 = 0
    lats = []
    for stream in per_user.values():
        views = [t for t, k in stream if k == "view"]
        if not views:
            continue
        n1 += 1
        t1 = min(views)
        clicks = [t for t, k in stream if k == "click" and t > t1]
        if not clicks:
            continue
        n2 += 1
        t2 = min(clicks)
        purchases = [t for t, k in stream if k == "purchase" and t > t2]
        if not purchases:
            continue
        n3 += 1
        lats.append(min(purchases) - t1)  # integer µs, like the engines
    assert g["n_viewed"] == n1
    assert g["n_clicked_after"] == n2
    assert g["n_purchased_after"] == n3
    if lats:
        # the engines' cross-engine-exact half-up (r14): exact µs sum → one
        # double division → +0.5, floor → /1e6. Identical IEEE ops here, so
        # the comparison is exact equality, not isclose (hypothesis found
        # the old round(avg, 6) disagreeing on an exact half-microsecond).
        want = math.floor(sum(lats) / len(lats) + 0.5) / 1000000.0
        assert g["avg_view_to_purchase_s"] == want
    else:
        assert g["avg_view_to_purchase_s"] is None


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=4))
def test_ev_rolling_uniques_matches_bruteforce(spark, user_times):
    """DAU + trailing-7-day rolling uniques vs plain Python set math;
    output rows exist exactly for the active days."""
    from orc_spark.plans.cdc_q import ROLL_DAYS, ev_rolling_uniques

    sf = _write_events(spark, _mk_rows(user_times))
    got = {r["day"]: r for r in ev_rolling_uniques(spark, sf).collect()}

    active = {}  # day -> set of users
    for ui, times in enumerate(user_times):
        for t in times:
            active.setdefault(int(t) // DAY_US, set()).add(ui + 1)
    assert set(got) == set(active)
    for day, users in active.items():
        assert got[day]["dau"] == len(users)
        window = set()
        for d in range(day - ROLL_DAYS + 1, day + 1):
            window |= active.get(d, set())
        assert got[day]["rolling_users"] == len(window)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    vals=st.lists(st.floats(-50, 50, allow_nan=False, width=64), min_size=1, max_size=40),
)
def test_ev_anomaly_matches_bruteforce(spark, user_times, vals):
    """Fixed-point rolling z-score vs plain Python: integer moments over
    the trailing window, the identical float z expression, and the
    degenerate zero-variance rows (NULL z, not-anomalous)."""
    import math

    from orc_spark.plans.cdc_q import (
        ANOM_LOOKBACK,
        ANOM_MIN_N,
        ANOM_SCALE,
        ANOM_Z,
        ev_anomaly,
    )

    def extra(ui, eid, t):
        return {"value": vals[eid % len(vals)]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {r["event_id"]: r for r in ev_anomaly(spark, sf).collect()}

    eid = 0
    expected_ids = set()
    for ui, times in enumerate(user_times):
        stream = []
        for t in sorted(times):
            fv = math.floor(vals[eid % len(vals)] * ANOM_SCALE)
            win = stream[-ANOM_LOOKBACK:]
            n = len(win)
            if n >= ANOM_MIN_N:
                expected_ids.add(eid)
                s, ss = sum(win), sum(x * x for x in win)
                g = got[eid]
                assert g["win_n"] == n
                var_num = n * ss - s * s
                if var_num > 0:
                    z = (n * fv - s) * math.sqrt((n - 1) / (n * var_num))
                    assert math.isclose(
                        g["z_score"], round(z, 6), rel_tol=1e-9, abs_tol=5.1e-7
                    )
                    assert g["is_anomaly"] == (1 if abs(z) > ANOM_Z else 0)
                else:
                    assert g["z_score"] is None
                    assert g["is_anomaly"] == 0
            stream.append(fv)
            eid += 1
    assert set(got) == expected_ids


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False, width=64), min_size=1, max_size=40),
)
def test_st_ewma_matches_bruteforce(spark, user_times, vals):
    """EWMA recurrence vs a plain-Python scalar replay in the identical
    IEEE op order (alpha*v first, then +) — BIT-identical doubles, no
    tolerance."""
    from orc_spark.plans.stateful_q import EWMA_ALPHA, st_ewma

    def extra(ui, eid, t):
        return {"value": vals[eid % len(vals)]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {r["event_id"]: r["ewma"] for r in st_ewma(spark, sf).collect()}

    eid = 0
    expect = {}
    for ui, times in enumerate(user_times):
        s = None
        for t in sorted(times):
            v = vals[eid % len(vals)]
            s = v if s is None else EWMA_ALPHA * v + (1.0 - EWMA_ALPHA) * s
            expect[eid] = s
            eid += 1
    assert set(got) == set(expect)
    for e_id, want in expect.items():
        assert got[e_id] == want  # bit-identical, no isclose


# --- r08: brute-force replays for the remaining st_* recurrences -------------
# Motive (r07 verdict directive #3): these queries' DuckDB oracles are
# recursive CTEs that MIRROR the engine's own IEEE operation order — a
# shared-bug circularity risk. Each test below replays the recurrence in
# plain Python scalars, independent of both engines' algebra, and demands
# bit-identical (or integer-exact) agreement with the REAL registry query.

_ST_VALS = st.lists(
    st.floats(-1e6, 1e6, allow_nan=False, width=64), min_size=1, max_size=40
)


def _st_table(spark, user_times, vals):
    def extra(ui, eid, t):
        return {"value": vals[eid % len(vals)]}

    return _write_events(spark, _mk_rows(user_times, extra))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    vals=_ST_VALS,
)
def test_st_kalman_matches_bruteforce(spark, user_times, vals):
    """Scalar Kalman recurrence vs a plain-Python replay in the identical
    IEEE op order (p'=p+q; k=p'/(p'+r); x+=k·(v−x); p=(1−k)·p') —
    bit-identical doubles, no tolerance."""
    from orc_spark.plans.stateful_q import KALMAN_Q, KALMAN_R, st_kalman

    sf = _st_table(spark, user_times, vals)
    got = {r["event_id"]: r for r in st_kalman(spark, sf).collect()}

    eid = 0
    expect = {}
    for ui, times in enumerate(user_times):
        x = p = None
        for t in sorted(times):
            v = vals[eid % len(vals)]
            if x is None:
                x, p, k = v, 1.0, 0.0
            else:
                p_pred = p + KALMAN_Q
                k = p_pred / (p_pred + KALMAN_R)
                x = x + k * (v - x)
                p = (1.0 - k) * p_pred
            expect[eid] = (x, k)
            eid += 1
    assert set(got) == set(expect)
    for e_id, (x, k) in expect.items():
        assert got[e_id]["x_est"] == x and got[e_id]["gain"] == k


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    vals=_ST_VALS,
)
def test_st_holt_matches_bruteforce(spark, user_times, vals):
    """Holt level+trend recurrence vs a plain-Python replay (f=l+t;
    l'=α·v+(1−α)·f; t'=β·(l'−l)+(1−β)·t) — bit-identical doubles."""
    from orc_spark.plans.stateful_q import HOLT_ALPHA, HOLT_BETA, st_holt

    a, ma = HOLT_ALPHA, 1.0 - HOLT_ALPHA
    b, mb = HOLT_BETA, 1.0 - HOLT_BETA
    sf = _st_table(spark, user_times, vals)
    got = {r["event_id"]: r for r in st_holt(spark, sf).collect()}

    eid = 0
    expect = {}
    for ui, times in enumerate(user_times):
        l = t = None
        for ts_ in sorted(times):
            v = vals[eid % len(vals)]
            if l is None:
                l, t, f = v, 0.0, v
            else:
                f = l + t
                l_new = a * v + ma * f
                t = b * (l_new - l) + mb * t
                l = l_new
            expect[eid] = (l, t, f)
            eid += 1
    assert set(got) == set(expect)
    for e_id, (l, t, f) in expect.items():
        g = got[e_id]
        assert g["level"] == l and g["trend"] == t and g["forecast"] == f


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    # span the 45/55 slack band and the 150 threshold so alarms + resets fire
    vals=st.lists(
        st.floats(-300, 400, allow_nan=False, width=64), min_size=1, max_size=40
    ),
)
def test_st_cusum_matches_bruteforce(spark, user_times, vals):
    """Two-sided CUSUM vs a plain-Python replay: clamped partial sums in
    the kernel's exact op order, threshold alarms + resets — bit-identical
    doubles, integer-exact alarm counts."""
    from orc_spark.plans.stateful_q import (
        _CUSUM_HI,
        _CUSUM_LO,
        CUSUM_THRESH,
        st_cusum,
    )

    sf = _st_table(spark, user_times, vals)
    got = {r["event_id"]: r for r in st_cusum(spark, sf).collect()}

    eid = 0
    expect = {}
    for ui, times in enumerate(user_times):
        sp = sn = 0.0
        alarms = 0
        for t in sorted(times):
            x = vals[eid % len(vals)]
            tp = sp + (x - _CUSUM_HI)
            sp = tp if tp > 0.0 else 0.0
            tn = sn + (_CUSUM_LO - x)
            sn = tn if tn > 0.0 else 0.0
            if sp > CUSUM_THRESH:
                alarms += 1
                sp = 0.0
            if sn > CUSUM_THRESH:
                alarms += 1
                sn = 0.0
            expect[eid] = (sp, sn, alarms)
            eid += 1
    assert set(got) == set(expect)
    for e_id, (sp, sn, alarms) in expect.items():
        g = got[e_id]
        assert g["s_pos"] == sp and g["s_neg"] == sn and g["n_alarms"] == alarms


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    # span both thresholds (LO=100, HI=350) so the trigger flips and holds
    vals=st.lists(
        st.floats(-50, 500, allow_nan=False, width=64), min_size=1, max_size=40
    ),
)
def test_st_hysteresis_matches_bruteforce(spark, user_times, vals):
    """Schmitt-trigger hysteresis vs a plain-Python replay: integer state,
    flip counts — exact."""
    from orc_spark.plans.stateful_q import HYST_HI, HYST_LO, st_hysteresis

    sf = _st_table(spark, user_times, vals)
    got = {r["event_id"]: r for r in st_hysteresis(spark, sf).collect()}

    eid = 0
    expect = {}
    for ui, times in enumerate(user_times):
        s = 0
        flips = 0
        for t in sorted(times):
            x = vals[eid % len(vals)]
            ns = 1 if x > HYST_HI else (0 if x < HYST_LO else s)
            if ns != s:
                flips += 1
            s = ns
            expect[eid] = (s, flips)
            eid += 1
    assert set(got) == set(expect)
    for e_id, (s, flips) in expect.items():
        assert got[e_id]["state"] == s and got[e_id]["n_flips"] == flips


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    vals=st.lists(
        st.floats(-1e4, 1e4, allow_nan=False, width=64), min_size=1, max_size=40
    ),
)
def test_st_goertzel_matches_bruteforce(spark, user_times, vals):
    """Fixed-point Goertzel vs a plain-Python integer replay: quantize
    floor(v·1e4+0.5), step s = x + trunc(c·s1/1e4) − s2 in exact ints, one
    float division at the end — bit-identical p4/p8/p16."""
    import math

    from orc_spark.plans.stateful_q import (
        GOERTZEL_CFP,
        GOERTZEL_SCALE,
        st_goertzel,
    )

    sf = _st_table(spark, user_times, vals)
    got = {r["user_id"]: r for r in st_goertzel(spark, sf).collect()}

    sc = GOERTZEL_SCALE

    def tdiv(a):
        return a // sc if a >= 0 else -((-a) // sc)

    eid = 0
    expect = {}
    for ui, times in enumerate(user_times):
        xs = []
        for t in sorted(times):
            v = vals[eid % len(vals)]
            xs.append(int(math.floor(v * float(sc) + 0.5)))
            eid += 1
        powers = []
        for p in (4, 8, 16):
            c = GOERTZEL_CFP[p]
            s1 = s2 = 0
            for x in xs:
                s = x + tdiv(c * s1) - s2
                s2, s1 = s1, s
            powers.append(float(s1 * s1 + s2 * s2 - tdiv(c * s1) * s2) / float(sc * sc))
        expect[ui + 1] = (len(xs), powers)
    assert set(got) == set(expect)
    for uid, (n, (p4, p8, p16)) in expect.items():
        g = got[uid]
        assert g["n"] == n
        assert g["p4"] == p4 and g["p8"] == p8 and g["p16"] == p16


# --- r08: short-run brute-force replays for the flagship firmware loops ------
# st_ahrs_replay / st_pid_replay are the two most intricate recurrences in
# the repo, and their DuckDB oracles are recursive CTEs that MIRROR the
# engines' operation order. These replays re-derive the recurrences in plain
# Python, written fresh from the documented firmware semantics
# (FusionAhrs.c:113-217 / PID.c:24-91 — see orc_spark/operators/ahrs.py,
# control.py), and demand BIT-identical outputs from the real registry
# queries on short synthetic runs. Validity envelope (also CLAUDE.md): the
# AHRS oracle assumes runs stay inside the init ramp (< ~10.6k samples/run);
# these runs are <= 200 samples — the deterministic case below forces a
# mid-run gyro-range trip to cover the reset branch too.

_AHRS_GAIN = 0.5
_AHRS_DT = 0.000282
_AHRS_GYRO_RANGE = 0.98 * 500.0
_AHRS_PERIOD = 17730


def _ahrs_f64_replay_py(gyro, accel):
    """Plain-Python f64 AHRS replay (app config: ENU, gain 0.5, 10° accel
    rejection, 490 dps reinit, ~5 s recovery, no mag). Returns one dict of
    the 10 output fields per sample."""
    import math

    hs = 0.5 * math.sin(math.radians(10.0))
    acc_rej = hs * hs
    ramp_step = (10.0 - _AHRS_GAIN) / 3.0
    half_rad = math.radians(0.5)
    qw, qx, qy, qz = 1.0, 0.0, 0.0, 0.0
    initialising, ramped, trig, timeout = True, 10.0, 0, _AHRS_PERIOD
    rows = []
    for (gx, gy, gz), (ax, ay, az) in zip(gyro, accel):
        # gyro-range reinit keeps the quaternion, restarts the ramp
        if (
            abs(gx) > _AHRS_GYRO_RANGE
            or abs(gy) > _AHRS_GYRO_RANGE
            or abs(gz) > _AHRS_GYRO_RANGE
        ):
            initialising, ramped, trig, timeout = True, 10.0, 0, _AHRS_PERIOD
        if initialising:
            ramped -= ramp_step * _AHRS_DT
            if ramped < _AHRS_GAIN:
                ramped = _AHRS_GAIN
                initialising = False
        # half gravity = third column of R^T / 2 (ENU)
        hgx = qx * qz - qw * qy
        hgy = qy * qz + qw * qx
        hgz = qw * qw - 0.5 + qz * qz
        fbx = fby = fbz = 0.0
        if ax != 0.0 or ay != 0.0 or az != 0.0:
            inv = 1.0 / math.sqrt(ax * ax + ay * ay + az * az)
            sx, sy, sz = ax * inv, ay * inv, az * inv
            cx = sy * hgz - sz * hgy
            cy = sz * hgx - sx * hgz
            cz = sx * hgy - sy * hgx
            if sx * hgx + sy * hgy + sz * hgz < 0.0:  # error > 90°
                m2 = cx * cx + cy * cy + cz * cz
                if m2 > 0.0:
                    inv = 1.0 / math.sqrt(m2)
                    cx, cy, cz = cx * inv, cy * inv, cz * inv
            ignored = True
            if initialising or cx * cx + cy * cy + cz * cz <= acc_rej:
                ignored = False
                trig -= 9
            else:
                trig += 1
            if trig > timeout:
                timeout = 0
                ignored = False
            else:
                timeout = _AHRS_PERIOD
            if trig < 0:
                trig = 0
            elif trig > _AHRS_PERIOD:
                trig = _AHRS_PERIOD
            if not ignored:
                fbx, fby, fbz = cx, cy, cz
        adjx = (gx * half_rad + fbx * ramped) * _AHRS_DT
        adjy = (gy * half_rad + fby * ramped) * _AHRS_DT
        adjz = (gz * half_rad + fbz * ramped) * _AHRS_DT
        nqw = qw + (-qx * adjx - qy * adjy - qz * adjz)
        nqx = qx + (qw * adjx + qy * adjz - qz * adjy)
        nqy = qy + (qw * adjy - qx * adjz + qz * adjx)
        nqz = qz + (qw * adjz + qx * adjy - qy * adjx)
        inv = 1.0 / math.sqrt(nqw * nqw + nqx * nqx + nqy * nqy + nqz * nqz)
        qw, qx, qy, qz = nqw * inv, nqx * inv, nqy * inv, nqz * inv
        if initialising:  # heading stays zeroed during the ramp
            yaw_r = math.atan2(qw * qz + qx * qy, 0.5 - qy * qy - qz * qz)
            half = 0.5 * yaw_r
            rw, rz = math.cos(half), -math.sin(half)
            qw, qx, qy, qz = (
                rw * qw - rz * qz,
                rw * qx - rz * qy,
                rw * qy + rz * qx,
                rw * qz + rz * qw,
            )
        hmq = 0.5 - qy * qy
        sp = 2.0 * (qw * qy - qz * qx)
        if sp > 1.0:
            sp = 1.0
        elif sp < -1.0:
            sp = -1.0
        rows.append(
            {
                "qw": qw, "qx": qx, "qy": qy, "qz": qz,
                "roll_deg": math.degrees(
                    math.atan2(qw * qx + qy * qz, hmq - qx * qx)
                ),
                "pitch_deg": math.degrees(math.asin(sp)),
                "yaw_deg": math.degrees(
                    math.atan2(qw * qz + qx * qy, hmq - qz * qz)
                ),
                "lin_x": ax - 2.0 * (qx * qz - qw * qy),
                "lin_y": ay - 2.0 * (qy * qz + qw * qx),
                "lin_z": az - 2.0 * (qw * qw - 0.5 + qz * qz),
            }
        )
    return rows


def _pid_replay_py(meas):
    """Plain-Python PID replay (Z_XL gains kp=-30000, ki=-0.0, kd=-1800,
    dt=0.000282, ±30000 clamp, setpoint 0): P + trapezoidal I with dynamic
    anti-windup + band-limited derivative on measurement."""
    import math

    kp, ki, kd = -30000.0, -0.0, -1800.0
    t_, tau = _AHRS_DT, 1.0 / (math.pi * 100.0)
    lim_min, lim_max = -30000.0, 30000.0
    ttm, ttp = 2.0 * tau - t_, 2.0 * tau + t_
    integ = prev_err = diff = prev_m = 0.0
    out = []
    for mi in meas:
        err = 0.0 - mi
        prop = kp * err
        integ = integ + 0.5 * ki * t_ * (err + prev_err)
        lim_max_int = lim_max - prop if lim_max > prop else 0.0
        lim_min_int = lim_min - prop if lim_min < prop else 0.0
        if integ > lim_max_int:
            integ = lim_max_int
        elif integ < lim_min_int:
            integ = lim_min_int
        diff = (-2.0 * kd * (mi - prev_m) + ttm * diff) / ttp
        o = prop + integ + diff
        if o > lim_max:
            o = lim_max
        elif o < lim_min:
            o = lim_min
        out.append(o)
        prev_err = err
        prev_m = mi
    return out


def _ahrs_inputs_from_vals(vals_seq):
    """Mirror _imu_fixture + st_ahrs_replay's synthesis: int truncation of
    value scaling (Spark double→int cast truncates), then dps/g scaling."""
    gyro = [
        (
            float(int(v * 53)) * 0.0175,
            float(int(v * -41)) * 0.0175,
            float(int(v * 29)) * 0.0175,
        )
        for v in vals_seq
    ]
    accel = [
        (
            float(int(v * 37)) * 0.000122,
            float(int(v * -23)) * 0.000122,
            float(8197 + int(v * 11)) * 0.000122,
        )
        for v in vals_seq
    ]
    return gyro, accel


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    # ±700 spans the 490 dps gyro reinit (700·53·0.0175 ≈ 649 dps)
    vals=st.lists(
        st.floats(-700, 700, allow_nan=False, width=64), min_size=1, max_size=40
    ),
)
def test_st_ahrs_replay_matches_bruteforce(spark, user_times, vals):
    """Full AHRS quaternion update vs the independent plain-Python replay —
    all 10 output fields bit-identical, including runs that trip the
    gyro-range reinit."""
    from orc_spark.plans.stateful_q import st_ahrs_replay

    def extra(ui, eid, t):
        return {"value": vals[eid % len(vals)]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {
        (r["run_idx"], r["sample_idx"]): r
        for r in st_ahrs_replay(spark, sf).collect()
    }

    eid = 0
    n_checked = 0
    for ui, times in enumerate(user_times):
        vs = []
        for t in sorted(times):
            vs.append(vals[eid % len(vals)])
            eid += 1
        gyro, accel = _ahrs_inputs_from_vals(vs)
        for si, want in enumerate(_ahrs_f64_replay_py(gyro, accel)):
            g = got[(ui + 1, si)]
            for k, v in want.items():
                assert g[k] == v, (ui + 1, si, k, g[k], v)
            n_checked += 1
    assert n_checked == len(got)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, width=64), min_size=1, max_size=40
    ),
)
def test_st_pid_replay_matches_bruteforce(spark, user_times, vals):
    """PID recurrence vs the independent plain-Python replay — bit-identical
    pid_out, output clamps and anti-windup exercised (|meas| up to 1e4)."""
    from orc_spark.plans.stateful_q import st_pid_replay

    def extra(ui, eid, t):
        return {"value": vals[eid % len(vals)]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {(r["user_id"], r["ord"]): r["pid_out"] for r in st_pid_replay(spark, sf).collect()}

    eid = 0
    n_checked = 0
    for ui, times in enumerate(user_times):
        meas = []
        for t in sorted(times):
            meas.append(vals[eid % len(vals)] / 100.0)
            eid += 1
        for si, want in enumerate(_pid_replay_py(meas)):
            assert got[(ui + 1, si)] == want, (ui + 1, si, got[(ui + 1, si)], want)
            n_checked += 1
    assert n_checked == len(got)


def test_st_ahrs_replay_200_sample_run_with_range_trip(spark):
    """Deterministic 200-sample single run with a forced mid-run gyro-range
    trip (value 650 → 602 dps at sample 100): the reset branch (quaternion
    kept, ramp restarted) replays bit-identically end to end."""
    from orc_spark.plans.stateful_q import st_ahrs_replay

    vs = [((i * 37) % 100) - 50 + 0.25 for i in range(200)]
    vs[100] = 650.0

    def extra(ui, eid, t):
        return {"value": vs[eid]}

    sf = _write_events(spark, _mk_rows([list(range(200))], extra))
    got = {r["sample_idx"]: r for r in st_ahrs_replay(spark, sf).collect()}
    assert len(got) == 200

    gyro, accel = _ahrs_inputs_from_vals(vs)
    # sanity: the trip actually exceeds the 490 dps range on x
    assert abs(gyro[100][0]) > _AHRS_GYRO_RANGE
    for si, want in enumerate(_ahrs_f64_replay_py(gyro, accel)):
        g = got[si]
        for k, v in want.items():
            assert g[k] == v, (si, k, g[k], v)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=3))
def test_st_throttle_matches_bruteforce(spark, user_times):
    """Greedy debounce vs a plain-Python replay: keep iff >= 2 min since
    the last KEPT event — integer-exact."""
    from orc_spark.plans.stateful_q import THROTTLE_US, st_throttle

    sf = _write_events(spark, _mk_rows(user_times))
    got = {r["event_id"]: r for r in st_throttle(spark, sf).collect()}

    eid = 0
    expect = {}
    for ui, times in enumerate(user_times):
        last = None
        kept = 0
        for t in sorted(times):
            if last is None or t - last >= THROTTLE_US:
                k = 1
                kept += 1
                last = t
            else:
                k = 0
            expect[eid] = (k, kept)
            eid += 1
    assert set(got) == set(expect)
    for e_id, (k, kept) in expect.items():
        assert got[e_id]["kept"] == k and got[e_id]["n_kept"] == kept


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=3))
def test_st_token_bucket_matches_bruteforce(spark, user_times):
    """Token bucket vs a plain-Python replay: integer micro-tokens,
    truncating refill division, 5-token cap — exact."""
    from orc_spark.plans.stateful_q import (
        TB_CAP,
        TB_REFILL_DIV,
        TB_SCALE,
        st_token_bucket,
    )

    sf = _write_events(spark, _mk_rows(user_times))
    got = {r["event_id"]: r for r in st_token_bucket(spark, sf).collect()}

    eid = 0
    expect = {}
    for ui, times in enumerate(user_times):
        tok = TB_CAP
        prev = None
        n = 0
        for t in sorted(times):
            if prev is not None:
                tok = min(TB_CAP, tok + (t - prev) // TB_REFILL_DIV)
            prev = t
            if tok >= TB_SCALE:
                a = 1
                tok -= TB_SCALE
                n += 1
            else:
                a = 0
            expect[eid] = (a, tok, n)
            eid += 1
    assert set(got) == set(expect)
    for e_id, (a, tok, n) in expect.items():
        g = got[e_id]
        assert g["admitted"] == a and g["tokens_after"] == tok and g["n_admitted"] == n


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=3))
def test_st_bursts_matches_bruteforce(spark, user_times):
    """Kleinberg 2-state burst Viterbi vs a plain-Python replay: forward
    min-plus costs bit-identical f64, backtrack labels integer-exact;
    single-event runs emit nothing."""
    import math

    from orc_spark.plans.stateful_q import BURST_INF, BURST_S, st_bursts

    sf = _write_events(spark, _mk_rows(user_times))
    got = {r["event_id"]: r for r in st_bursts(spark, sf).collect()}

    eid = 0
    expect = {}
    for ui, times in enumerate(user_times):
        ts_sorted = sorted(times)
        eids = list(range(eid, eid + len(ts_sorted)))
        eid += len(ts_sorted)
        n = len(ts_sorted)
        span = ts_sorted[-1] - ts_sorted[0]
        if n < 2 or span <= 0:
            continue
        a0 = float(n - 1) / float(span)
        a1 = BURST_S * a0
        l0 = -math.log(a0)
        l1 = -math.log(a1)
        gam = math.log(float(n))
        m = n - 1
        c0s, c1s, p0s, p1s = [], [], [], []
        c0, c1 = 0.0, BURST_INF
        for i in range(m):
            x = float(ts_sorted[i + 1] - ts_sorted[i])
            cost0 = l0 + a0 * x
            cost1 = l1 + a1 * x
            p0s.append(0 if c0 <= c1 else 1)
            m0 = c0 if c0 <= c1 else c1
            up = c0 + gam
            p1s.append(0 if up < c1 else 1)
            m1 = up if up < c1 else c1
            c0, c1 = m0 + cost0, m1 + cost1
            c0s.append(c0)
            c1s.append(c1)
        s = [0] * m
        s[m - 1] = 1 if c1 < c0 else 0
        for i in range(m - 1, 0, -1):
            s[i - 1] = p1s[i] if s[i] == 1 else p0s[i]
        for i in range(m):
            expect[eids[i + 1]] = (c0s[i], c1s[i], s[i])
    assert set(got) == set(expect)
    for e_id, (c0, c1, lab) in expect.items():
        g = got[e_id]
        assert g["c0"] == c0 and g["c1"] == c1 and g["in_burst"] == lab


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    vals=st.lists(
        st.floats(-1e4, 1e4, allow_nan=False, width=64), min_size=1, max_size=40
    ),
)
def test_ts_lttb_matches_bruteforce(spark, user_times, vals):
    """LTTB downsample vs a plain-Python integer replay (Steinarsson 2013,
    fixed-point y, integer triangle areas, first-max tie → smallest
    position) — exact selection, including the n<=6 passthrough."""
    import math

    from orc_spark.operators.downsample import LTTB_T, LTTB_YSCALE
    from orc_spark.plans.timeseries_q import ts_lttb

    def extra(ui, eid, t):
        return {"value": vals[eid % len(vals)]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {
        (r["user_id"], r["sel_idx"]): (r["event_id"], r["x_s"], r["y_fp"])
        for r in ts_lttb(spark, sf).collect()
    }

    eid = 0
    expect = {}
    for ui, times in enumerate(user_times):
        ts_sorted = sorted(times)
        ids = list(range(eid, eid + len(ts_sorted)))
        eid += len(ts_sorted)
        x = [(t - ts_sorted[0]) // 1_000_000 for t in ts_sorted]
        y = [
            int(math.floor(vals[e % len(vals)] * LTTB_YSCALE)) for e in ids
        ]
        n = len(ts_sorted)
        if n <= LTTB_T:
            for i in range(n):
                expect[(ui + 1, i)] = (ids[i], x[i], y[i])
            continue
        m = n - 2
        sel = [0]
        a = 0
        for kk in range(4):
            cand = [j + 1 for j in range(m) if (4 * j) // m == kk]
            if kk < 3:
                nxt = [j + 1 for j in range(m) if (4 * j) // m == kk + 1]
                cnt = len(nxt)
                sx, sy = sum(x[j] for j in nxt), sum(y[j] for j in nxt)
            else:
                cnt, sx, sy = 1, x[n - 1], y[n - 1]
            best, best_area = None, -1
            for c in cand:
                area2 = abs(
                    (x[a] * cnt - sx) * (y[c] - y[a])
                    - (x[a] - x[c]) * (y[a] * cnt - sy)
                )
                if area2 > best_area:  # strict: first max wins ties
                    best, best_area = c, area2
            a = best
            sel.append(a)
        sel.append(n - 1)
        for i, p in enumerate(sel):
            expect[(ui + 1, i)] = (ids[p], x[p], y[p])
    assert got == expect


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=4))
def test_sk_countmin_matches_bruteforce(spark, user_times):
    """Count-min sketch vs a plain-Python dict rebuild over h60_py
    (bit-identical to the engines' h60/h60_sql): cell counts, min-probe
    estimates, never-under flag — exact."""
    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.relational3 import (
        CMS_DEPTH,
        CMS_QUERY_USERS,
        CMS_WIDTH,
        sk_countmin,
    )

    sf = _write_events(spark, _mk_rows(user_times))
    got = {r["user_id"]: r for r in sk_countmin(spark, sf).collect()}

    uids = [ui + 1 for ui, times in enumerate(user_times) for _ in times]
    cells = {}
    for uid in uids:
        for j in range(CMS_DEPTH):
            col = h60_py(f"cms{j}:{uid}") % CMS_WIDTH
            cells[(j, col)] = cells.get((j, col), 0) + 1
    assert set(got) == set(CMS_QUERY_USERS)
    for u in CMS_QUERY_USERS:
        est = min(
            cells.get((j, h60_py(f"cms{j}:{u}") % CMS_WIDTH), 0)
            for j in range(CMS_DEPTH)
        )
        true_n = uids.count(u)
        g = got[u]
        assert g["true_n"] == true_n and g["cms_est"] == est
        assert g["never_under"] == (est >= true_n)
        assert est >= true_n  # the CMS guarantee itself


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=4))
def test_sk_bloom_matches_bruteforce(spark, user_times):
    """Bloom filter vs a plain-Python set rebuild over h60_py: set bits,
    membership verdicts, no-false-negative flag — exact."""
    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.relational3 import (
        BLOOM_BITS,
        BLOOM_K,
        BLOOM_PROBES,
        sk_bloom,
    )

    sf = _write_events(spark, _mk_rows(user_times))
    got = {r["probe_id"]: r for r in sk_bloom(spark, sf).collect()}

    users = {ui + 1 for ui, times in enumerate(user_times)}
    bits = {
        (j, h60_py(f"bloom{j}:{uid}") % BLOOM_BITS)
        for uid in users
        for j in range(BLOOM_K)
    }
    assert set(got) == set(BLOOM_PROBES)
    for p in BLOOM_PROBES:
        member = all(
            (j, h60_py(f"bloom{j}:{p}") % BLOOM_BITS) in bits
            for j in range(BLOOM_K)
        )
        in_set = p in users
        g = got[p]
        assert g["in_set"] == in_set and g["bloom_member"] == member
        assert g["no_false_negative"] == (member or not in_set)
        assert not in_set or member  # no false negatives, ever


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(
        st.lists(st.integers(0, 3 * DAY_US), min_size=1, max_size=3, unique=True),
        min_size=35,
        max_size=45,
    )
)
@pytest.mark.sweep  # long-tail value check: full/nightly tier
def test_sk_kmv_matches_bruteforce(spark, user_times):
    """KMV sketch vs a plain-Python replay over h60_py: per-type k-th mins,
    xor digests, estimates (exact fallback under K, the (K-1)·2^60/h_K
    formula at/over K — Spark round() is HALF-UP, not banker's), and the
    merged-vs-direct ALL row with its merge_ok proof — exact. 35-45 users
    so the ALL row (and often a per-type row) crosses K=32."""
    import math
    from functools import reduce

    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.relational3 import KMV_K, sk_kmv

    def extra(ui, eid, t):
        return {"event_type": ["view", "click"][eid % 2]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {r["event_type"]: r for r in sk_kmv(spark, sf).collect()}

    # rebuild (type -> distinct users) exactly as _mk_rows assigns types
    eid = 0
    by_type = {}
    all_users = set()
    for ui, times in enumerate(user_times):
        for t in sorted(times):
            by_type.setdefault(["view", "click"][eid % 2], set()).add(ui + 1)
            all_users.add(ui + 1)
            eid += 1

    def sketch(users):
        hs = sorted({h60_py(f"kmv:{u}") for u in users})
        kept = hs[:KMV_K]
        return kept, max(kept), reduce(lambda a, b: a ^ b, kept)

    def est_formula(kth):
        v = float(KMV_K - 1) * (float(1 << 60) / float(kth))
        return int(math.floor(v + 0.5))  # Spark round(x, 0) is HALF-UP

    assert set(got) == set(by_type) | {"ALL"}
    kept_union = set()
    for et, users in by_type.items():
        kept, kth, dig = sketch(users)
        kept_union |= set(kept)
        g = got[et]
        assert g["kth_min"] == kth and g["kmv_digest"] == dig
        assert g["exact_distinct"] == len(users)
        want_est = (
            len(users) if len(kept) < KMV_K else est_formula(kth)
        )
        assert g["est_distinct"] == want_est
        assert g["merge_ok"] is True

    # ALL row: direct sketch from the full stream; merged must equal it
    d_kept, d_kth, d_dig = sketch(all_users)
    m_kept = sorted(kept_union)[:KMV_K]
    g = got["ALL"]
    assert g["kth_min"] == d_kth and g["kmv_digest"] == d_dig
    assert g["exact_distinct"] == len(all_users)
    assert g["est_distinct"] == est_formula(d_kth)
    assert g["merge_ok"] == (
        max(m_kept) == d_kth
        and reduce(lambda a, b: a ^ b, m_kept) == d_dig
    )
    assert g["merge_ok"] is True  # KMV union-merge is exact


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(
        st.lists(st.integers(0, 3 * DAY_US), min_size=1, max_size=3, unique=True),
        min_size=70,
        max_size=85,
    )
)
@pytest.mark.sweep  # long-tail value check: full/nightly tier
def test_sk_theta_ops_matches_bruteforce(spark, user_times):
    """Theta-sketch set algebra vs a plain-Python replay over h60_py:
    per-type thetas (2^60 unsaturated, k-th min at K=64), fixed-theta
    pairwise union/intersection/difference estimates with Spark's
    BigDecimal HALF_UP round(x,3), and the exact counts — exact. 70-85
    users across 3 types so sketches saturate in some examples."""
    from decimal import ROUND_HALF_UP, Decimal

    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.relational3 import THETA_K, sk_theta_ops

    TYPES = ["view", "click", "purchase"]

    def extra(ui, eid, t):
        return {"event_type": TYPES[eid % 3]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {(r["ta"], r["tb"]): r for r in sk_theta_ops(spark, sf).collect()}

    eid = 0
    users_of = {}
    for ui, times in enumerate(user_times):
        for t in sorted(times):
            users_of.setdefault(TYPES[eid % 3], set()).add(ui + 1)
            eid += 1

    TWO60 = float(1 << 60)

    def spark_round3(v):
        # Spark round(double, 3) = BigDecimal.valueOf(v).setScale(3, HALF_UP):
        # shortest-repr decimal, half-up — repr() is the Python equivalent
        return float(Decimal(repr(v)).quantize(Decimal("0.001"), ROUND_HALF_UP))

    kept_of, theta_of = {}, {}
    for et, users in users_of.items():
        hs = sorted({h60_py(f"kmv:{u}") for u in users})
        kept = hs[:THETA_K]
        kept_of[et] = set(kept)
        theta_of[et] = (1 << 60) if len(kept) < THETA_K else max(kept)

    expect_keys = {
        (a, b) for a in users_of for b in users_of if a < b
    }
    assert set(got) == expect_keys
    for ta, tb in expect_keys:
        tp = min(theta_of[ta], theta_of[tb])
        ca = sum(1 for h in kept_of[ta] if h < tp)
        cb = sum(1 for h in kept_of[tb] if h < tp)
        ci = sum(1 for h in kept_of[ta] & kept_of[tb] if h < tp)
        ei = len(users_of[ta] & users_of[tb])
        na, nb = len(users_of[ta]), len(users_of[tb])
        g = got[(ta, tb)]
        assert g["theta_p"] == tp
        scale = TWO60 / float(tp)
        assert g["est_union"] == spark_round3(float(ca + cb - ci) * scale)
        assert g["est_inter"] == spark_round3(float(ci) * scale)
        assert g["est_diff_ab"] == spark_round3(float(ca - ci) * scale)
        assert g["exact_union"] == na + nb - ei
        assert g["exact_inter"] == ei
        assert g["exact_diff_ab"] == na - ei


def _write_documents(spark, docs):
    """Write (lang, text) tuples as a documents.parquet the loaders accept
    (doc_id = position, source/n_chars filled deterministically)."""
    d = tempfile.mkdtemp(prefix="orc_docs_")
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [t for _, t in docs],
            "lang": [l for l, _ in docs],
            "source": ["synthetic"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr"]),
            st.text(alphabet=" \tabcXYZ123", min_size=0, max_size=40),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_cu_split_matches_bruteforce(spark, docs):
    """Hash-bucket train/val/test assignment vs a plain-Python replay over
    h60_py: split membership, token counts (regex \\s+ over trimmed text,
    empty string -> 1), min/max ids and the xor membership digest — exact.
    The property a training pipeline needs: no doc ever migrates splits."""
    import re
    from functools import reduce

    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.curation_q import (
        SPLIT_TEST_PCT,
        SPLIT_VAL_PCT,
        cu_split,
    )

    sf = _write_documents(spark, docs)
    got = {(r["lang"], r["split"]): r for r in cu_split(spark, sf).collect()}

    groups = {}
    for doc_id, (lang, text) in enumerate(docs):
        b = h60_py(str(doc_id)) % 100
        split = (
            "test"
            if b < SPLIT_TEST_PCT
            else ("val" if b < SPLIT_TEST_PCT + SPLIT_VAL_PCT else "train")
        )
        # Spark/DuckDB trim() strips ONLY the space character (not \t)
        n_tok = len(re.split(r"\s+", text.strip(" ")))
        groups.setdefault((lang, split), []).append((doc_id, n_tok))
    assert set(got) == set(groups)
    for key, members in groups.items():
        g = got[key]
        assert g["n_docs"] == len(members)
        assert g["n_tokens"] == sum(n for _, n in members)
        assert g["min_doc"] == min(i for i, _ in members)
        assert g["max_doc"] == max(i for i, _ in members)
        dig = reduce(lambda a, b: a ^ b, (h60_py(str(i)) for i, _ in members))
        assert g["members_digest"] == dig


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.text(alphabet=" abXY12", min_size=0, max_size=60),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_cu_pack_matches_bruteforce(spark, docs):
    """Sequence packing vs a plain-Python replay: md5-rank concat order per
    language, start-offset bin placement (trunc of double division), bin
    audits and fill fractions (Spark HALF_UP round(x,6)) — exact."""
    import hashlib
    import re
    from decimal import ROUND_HALF_UP, Decimal

    from orc_spark.plans.curation_q import CU_SEQ_LEN, cu_pack

    sf = _write_documents(spark, docs)
    got = {(r["lang"], r["bin_id"]): r for r in cu_pack(spark, sf).collect()}

    def spark_round6(v):
        return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    by_lang = {}
    for doc_id, (lang, text) in enumerate(docs):
        n_tok = len(re.split(r"\s+", text.strip(" ")))  # space-only trim
        by_lang.setdefault(lang, []).append((doc_id, n_tok))

    expect = {}
    for lang, members in by_lang.items():
        members.sort(
            key=lambda m: (hashlib.md5(str(m[0]).encode()).hexdigest(), m[0])
        )
        cum = 0
        for doc_id, n_tok in members:
            b = int(float(cum) / CU_SEQ_LEN)  # cast(double as bigint) = trunc
            g = expect.setdefault((lang, b), [0, 0])
            g[0] += 1
            g[1] += n_tok
            cum += n_tok
    assert set(got) == set(expect)
    for key, (n_docs, tokens) in expect.items():
        g = got[key]
        assert g["n_docs"] == n_docs and g["tokens"] == tokens
        assert g["fill_frac"] == spark_round6(min(float(tokens) / CU_SEQ_LEN, 1.0))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.lists(
                st.sampled_from(
                    ["the", "and", "of", "cat", "dog", "xylophone", "a", "run.", "go!"]
                ),
                min_size=1,
                max_size=100,
            ),
        ),
        min_size=1,
        max_size=100,
    )
)
def test_tx_quality_and_cu_budget_match_bruteforce(spark, docs):
    """tx_quality's composite score replayed from raw Python string ops
    (not the SQL algebra), then cu_budget's quality-ranked greedy fill on
    top of it: per-language kept counts, token mass at the budget cut and
    the min kept quality — exact, budget cut exercised (docs up to 100
    tokens, 3000-token budget)."""
    import re
    from decimal import ROUND_HALF_UP, Decimal

    from orc_spark.plans.curation_q import CU_TOKEN_BUDGET, cu_budget
    from orc_spark.plans.text_q import STOPWORDS, tx_quality

    docs = [(lang, " ".join(words)) for lang, words in docs]
    sf = _write_documents(spark, docs)

    def spark_round6(v):
        return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    # independent quality replay from plain string ops
    quality = {}
    n_tok_of = {}
    for doc_id, (lang, text) in enumerate(docs):
        toks = re.split(r"\s+", text.strip(" "))
        n_toks = float(len(toks))
        n_chars = float(len(text))
        n_stop = float(sum(1 for x in toks if x in STOPWORDS))
        n_space = float(text.count(" "))
        mtl = (n_chars - n_space) / n_toks
        stop_ratio = n_stop / n_toks
        score = (
            min(n_toks / 100.0, 1.0) * 0.4
            + min(stop_ratio * 5.0, 1.0) * 0.4
            + (0.2 if 3.0 <= mtl <= 10.0 else 0.0)
        )
        quality[doc_id] = spark_round6(score)
        n_tok_of[doc_id] = len(toks)

    got_q = {r["doc_id"]: r["quality_score"] for r in tx_quality(spark, sf).collect()}
    assert got_q == quality

    # greedy budget fill on the replayed scores
    by_lang = {}
    for doc_id, (lang, _) in enumerate(docs):
        by_lang.setdefault(lang, []).append(doc_id)
    expect = {}
    for lang, ids in by_lang.items():
        ids.sort(key=lambda i: (-quality[i], i))
        cum = 0
        kept = []
        for i in ids:
            cum += n_tok_of[i]
            if cum > CU_TOKEN_BUDGET:
                break
            kept.append((i, cum))
        if kept:
            expect[lang] = (
                len(kept),
                kept[-1][1],
                spark_round6(min(quality[i] for i, _ in kept)),
            )
    got = {r["lang"]: r for r in cu_budget(spark, sf).collect()}
    assert set(got) == set(expect)
    for lang, (n_kept, tokens_kept, min_q) in expect.items():
        g = got[lang]
        assert g["n_kept"] == n_kept and g["tokens_kept"] == tokens_kept
        assert g["min_quality_kept"] == min_q


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=4))
def test_ev_transitions_matches_bruteforce(spark, user_times):
    """First-order Markov transition matrix vs plain Python: pair counts
    from each user's (ts, event_id)-ordered sequence, row-normalized
    probabilities with Spark HALF_UP round(x,6) — exact."""
    from decimal import ROUND_HALF_UP, Decimal

    from orc_spark.plans.cdc_q import ev_transitions

    TYPES = ["view", "click", "purchase"]

    def extra(ui, eid, t):
        return {"event_type": TYPES[eid % 3]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {(r["from_type"], r["to_type"]): r for r in ev_transitions(spark, sf).collect()}

    eid = 0
    counts = {}
    for ui, times in enumerate(user_times):
        seq = []
        for t in sorted(times):
            seq.append(TYPES[eid % 3])
            eid += 1
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    row_tot = {}
    for (a, b), n in counts.items():
        row_tot[a] = row_tot.get(a, 0) + n
    assert set(got) == set(counts)
    for (a, b), n in counts.items():
        g = got[(a, b)]
        assert g["n"] == n
        want = float(
            Decimal(repr(float(n) / float(row_tot[a]))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        assert g["prob"] == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=4))
def test_ev_paths_matches_bruteforce(spark, user_times):
    """Top-20 session journeys vs plain Python: 30-min-gap sessionization,
    '>'-joined type paths in (ts, event_id) order, conversion counts,
    session shares (HALF_UP round 6), and the (n desc, path asc) top-20
    cut — exact."""
    from decimal import ROUND_HALF_UP, Decimal

    from orc_spark.plans.cdc_q import SESSION_GAP_US, ev_paths

    TYPES = ["view", "click", "purchase"]

    def extra(ui, eid, t):
        return {"event_type": TYPES[eid % 3]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = [tuple(r) for r in ev_paths(spark, sf).collect()]

    eid = 0
    by_path = {}
    n_sessions = 0
    for ui, times in enumerate(user_times):
        evs = []
        for t in sorted(times):
            evs.append((t, TYPES[eid % 3]))
            eid += 1
        sessions, cur = [], [evs[0]]
        for prev, nxt in zip(evs, evs[1:]):
            if nxt[0] - prev[0] > SESSION_GAP_US:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for s in sessions:
            n_sessions += 1
            path = ">".join(t for _, t in s)
            conv = 1 if any(t == "purchase" for _, t in s) else 0
            g = by_path.setdefault(path, [0, 0])
            g[0] += 1
            g[1] += conv
    ranked = sorted(by_path.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    expect = [
        (
            path,
            n,
            conv,
            float(
                Decimal(repr(float(n) / float(n_sessions))).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
            ),
        )
        for path, (n, conv) in ranked
    ]
    assert got == expect


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=5),
    vals=st.lists(
        st.floats(-500, 600, allow_nan=False, width=64), min_size=1, max_size=40
    ),
)
def test_ev_ab_test_matches_bruteforce(spark, user_times, vals):
    """Two-proportion A/B readout vs plain Python: parity arms over viewed
    users, qualified conversions (purchase AND value > 300), pooled z with
    the zero-SE null branch, HALF_UP round(x,6) — exact; empty arms emit
    no row, exactly like the cross join."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from orc_spark.plans.cdc_q import ev_ab_test

    TYPES = ["view", "click", "purchase"]

    def extra(ui, eid, t):
        return {"event_type": TYPES[eid % 3], "value": vals[eid % len(vals)]}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    rows = ev_ab_test(spark, sf).collect()

    def r6(v):
        return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    eid = 0
    users = {}
    for ui, times in enumerate(user_times):
        viewed = purchased = 0
        for t in sorted(times):
            et, v = TYPES[eid % 3], vals[eid % len(vals)]
            if et == "view":
                viewed = 1
            if et == "purchase" and v > 300.0:
                purchased = 1
            eid += 1
        if viewed:
            users[ui + 1] = purchased
    arm = {0: [0, 0], 1: [0, 0]}
    for uid, p in users.items():
        arm[uid % 2][0] += 1
        arm[uid % 2][1] += p
    (n_a, c_a), (n_b, c_b) = arm[0], arm[1]
    if n_a == 0 or n_b == 0:
        assert rows == []
        return
    assert len(rows) == 1
    g = rows[0]
    pa, pb = float(c_a) / n_a, float(c_b) / n_b
    pp = float(c_a + c_b) / float(n_a + n_b)
    se = math.sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b))
    assert (g["n_a"], g["c_a"], g["n_b"], g["c_b"]) == (n_a, c_a, n_b, c_b)
    assert g["rate_a"] == r6(pa) and g["rate_b"] == r6(pb)
    if se > 0:
        z = (pa - pb) / se
        assert g["z_stat"] == r6(z)
        assert g["significant"] == (1 if abs(z) > 1.96 else 0)
    else:
        assert g["z_stat"] is None and g["significant"] == 0


# --- graph-family brute-force replays (VERDICT r08 directive 3) ---------------
#
# The last mirrored-oracle circularity: gr_pagerank / gr_kcore / gr_bfs /
# gr_label_prop / gr_linkpred were checked only by (a) DuckDB CTEs that
# mirror the engine's algebra and (b) local==distributed equality (both
# paths share the repo's code). The replays below recompute EVERYTHING —
# including the mutual-kNN edge construction from raw lineitem rows — in
# plain Python dicts/sets, independent of orc_spark.plans.graph_q, and
# assert exact equality with the registry queries on temp-dir fixtures.
# (The only shared primitive is the 60-bit digest h60_py, itself pinned
# bit-identical to h60/h60_sql by tests/test_hashing.py.)


def _bf_mutual_edges(baskets):
    """Brute-force mutual-top-K co-occurrence edges from raw baskets,
    written from the SPEC (graph_q docstrings), not the code: pair weights
    = co-occurring-order counts; each node ranks neighbors (w desc, id
    asc) keeping TRI_K; an edge survives iff BOTH endpoints keep it."""
    from collections import Counter, defaultdict
    from itertools import combinations

    from orc_spark.plans.graph_q import TRI_K

    w = Counter()
    for items in baskets:
        for a, b in combinations(sorted(set(items)), 2):
            w[(a, b)] += 1
    nbrs = defaultdict(list)
    for (a, b), c in w.items():
        nbrs[a].append((c, b))
        nbrs[b].append((c, a))
    top = {
        u: {v for c, v in sorted(lst, key=lambda cv: (-cv[0], cv[1]))[:TRI_K]}
        for u, lst in nbrs.items()
    }
    return {
        (a, b)
        for (a, b) in w
        if b in top.get(a, set()) and a in top.get(b, set())
    }


def _bf_adj(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


# wider id range than basket_strategy so BFS seed nodes (id % 20 == 0)
# actually occur, and so some nodes exceed the top-K degree bound
graph_baskets = st.lists(
    st.lists(st.integers(1, 30), min_size=1, max_size=6, unique=True),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(baskets=graph_baskets)
def test_gr_kcore_matches_bruteforce(spark, baskets):
    from orc_spark.plans.graph_q import KCORE_K, gr_kcore

    sf = _write_lineitem(spark, baskets)
    got = sorted(tuple(r) for r in gr_kcore(spark, sf).collect())

    adj = _bf_adj(_bf_mutual_edges(baskets))
    while True:
        drop = {n for n, s in adj.items() if len(s) < KCORE_K}
        if not drop:
            break
        adj = {
            n: s - drop for n, s in adj.items() if n not in drop
        }
        adj = {n: s for n, s in adj.items() if s}
    want = sorted((n, len(s), True) for n, s in adj.items())
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(baskets=graph_baskets)
def test_gr_bfs_matches_bruteforce(spark, baskets):
    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.graph_q import BFS_HOPS, BFS_SOURCE_MOD, gr_bfs

    sf = _write_lineitem(spark, baskets)
    got = sorted(tuple(r) for r in gr_bfs(spark, sf).collect())

    adj = _bf_adj(_bf_mutual_edges(baskets))
    hop = {n: 0 for n in adj if n % BFS_SOURCE_MOD == 0}
    frontier = set(hop)
    for h in range(1, BFS_HOPS + 1):
        nxt = {
            v for u in frontier for v in adj[u] if v not in hop
        }
        for v in nxt:
            hop[v] = h
        frontier = nxt
    groups = {}
    for n in adj:
        g = groups.setdefault(hop.get(n, -1), [0, 0])
        g[0] += 1
        g[1] ^= h60_py(str(n))
    want = sorted((h, c, d) for h, (c, d) in groups.items())
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(baskets=graph_baskets)
def test_gr_label_prop_matches_bruteforce(spark, baskets):
    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.graph_q import LP_ROUNDS, gr_label_prop

    sf = _write_lineitem(spark, baskets)
    got = [tuple(r) for r in gr_label_prop(spark, sf).collect()]

    adj = _bf_adj(_bf_mutual_edges(baskets))
    lab = {n: n for n in adj}
    for _ in range(LP_ROUNDS):
        nxt = {}
        for n, nbrs in adj.items():
            cnt = {}
            for v in nbrs:
                cnt[lab[v]] = cnt.get(lab[v], 0) + 1
            nxt[n] = min(cnt, key=lambda c: (-cnt[c], c))
        lab = nxt
    comm = {}
    for n, c in lab.items():
        g = comm.setdefault(c, [0, 0])
        g[0] += 1
        g[1] ^= h60_py(str(n))
    want = sorted(
        ((c, s, d) for c, (s, d) in comm.items()), key=lambda r: (-r[1], r[0])
    )
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(baskets=graph_baskets)
def test_gr_linkpred_matches_bruteforce(spark, baskets):
    import math

    from orc_spark.plans.graph_q import LP_AA_SCALE, LP_TOP, gr_linkpred

    sf = _write_lineitem(spark, baskets)
    got = [tuple(r) for r in gr_linkpred(spark, sf).collect()]

    edges = _bf_mutual_edges(baskets)
    adj = _bf_adj(edges)
    cand = {}
    for z, nbrs in adj.items():
        if len(nbrs) < 2:
            continue
        term = math.floor(LP_AA_SCALE / math.log(float(len(nbrs))))
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                e = cand.setdefault((ns[i], ns[j]), [0, 0])
                e[0] += 1
                e[1] += term
    rows = []
    for (u, v), (cn, aa) in cand.items():
        if (u, v) in edges:
            continue
        du, dv = len(adj[u]), len(adj[v])
        rows.append((u, v, cn, du, dv, round(cn / (du + dv - cn), 6), aa))
    rows.sort(key=lambda r: (-r[2], -r[6], r[0], r[1]))
    assert got == rows[:LP_TOP]


pr_orders = st.lists(
    st.tuples(
        st.integers(1, 6),
        st.lists(st.integers(1, 10), min_size=1, max_size=4, unique=True),
    ),
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(orders=pr_orders)
def test_gr_pagerank_matches_bruteforce(spark, orders):
    from orc_spark.plans.graph_q import (
        PR_BASE,
        PR_ITERS,
        PR_SCALE,
        gr_pagerank,
    )

    d = tempfile.mkdtemp(prefix="orc_props_pr_")
    orows, lrows = [], []
    for oi, (cust, supps) in enumerate(orders):
        orows.append({"o_orderkey": oi + 1, "o_custkey": cust})
        for ln, s in enumerate(supps):
            lrows.append(
                {"l_orderkey": oi + 1, "l_suppkey": s, "l_linenumber": ln + 1}
            )
    for name, rows in (("orders", orows), ("lineitem", lrows)):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{name}.parquet"))

    got = sorted(tuple(r) for r in gr_pagerank(spark, d).collect())

    # brute force: distinct bipartite pairs, both directions, integer
    # power iteration in plain dicts (rank div outdeg, 85/100 damping)
    cs = {(2 * c, 2 * s + 1) for c, supps in orders for s in supps}
    directed = [(a, b) for a, b in cs] + [(b, a) for a, b in cs]
    outdeg = {}
    for a, _ in directed:
        outdeg[a] = outdeg.get(a, 0) + 1
    r = {n: PR_SCALE for n in outdeg}
    for _ in range(PR_ITERS):
        s = {}
        for a, b in directed:
            s[b] = s.get(b, 0) + r[a] // outdeg[a]
        r = {n: PR_BASE + 85 * s.get(n, 0) // 100 for n in outdeg}
    want = sorted(
        (n, "cust" if n % 2 == 0 else "supp", n // 2, rk)
        for n, rk in r.items()
    )
    assert got == want


def test_graph_family_hand_computed_fixture(spark):
    """Hand-checkable hub+clique fixture exercising the top-K cut and the
    mutuality drop (hypothesis baskets rarely push a node past TRI_K=8):

    - 3 orders {1..6}          -> clique, every pair w=3
    - (13-k) orders {50, k}    -> hub 50 with spoke weights w(50,k)=13-k
      for k=1..12: hub keeps only its top-8 (k=1..8); spokes 9..12 keep
      the hub but are NOT kept back -> dropped by mutuality, isolated
    - 2 orders {20, 1}         -> BFS seed 20 (20 % BFS_SOURCE_MOD == 0)

    Expected graph (verified by hand): 24 edges = 15 clique + 8 hub
    spokes + (1,20); nodes 9..12 absent. k-core(4) = {1..6, 50} all at
    core degree 6 (spokes 7, 8, 20 peel off, one effective round). BFS:
    hop0={20}, hop1={1}, hop2={2..6,50}, hop3={7,8}, nothing unreached.
    Label prop converges to ONE community of all 10 nodes."""
    import functools

    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.graph_q import (
        gr_bfs,
        gr_kcore,
        gr_label_prop,
        gr_triangles,
    )

    baskets = (
        [[1, 2, 3, 4, 5, 6]] * 3
        + [[50, k] for k in range(1, 13) for _ in range(13 - k)]
        + [[20, 1]] * 2
    )
    edges = _bf_mutual_edges(baskets)
    clique = {(a, b) for a in range(1, 7) for b in range(a + 1, 7)}
    spokes = {(k, 50) for k in range(1, 9)}
    assert edges == clique | spokes | {(1, 20)}

    sf = _write_lineitem(spark, baskets)
    core = sorted(tuple(r) for r in gr_kcore(spark, sf).collect())
    assert core == [(n, 6, True) for n in [1, 2, 3, 4, 5, 6, 50]]

    hops = {r["hop"]: r["n_nodes"] for r in gr_bfs(spark, sf).collect()}
    assert hops == {0: 1, 1: 1, 2: 6, 3: 2}

    tri = {r["s_suppkey"]: r["n_tri"] for r in gr_triangles(spark, sf).collect()}
    # C(6,3)=20 clique triangles + 15 (i,j,50) triangles; each clique node
    # is in C(5,2)=10 clique + 5 hub triangles, the hub in all 15 hub ones
    assert tri == {1: 15, 2: 15, 3: 15, 4: 15, 5: 15, 6: 15, 50: 15,
                   7: 0, 8: 0, 20: 0}

    comms = [tuple(r) for r in gr_label_prop(spark, sf).collect()]
    all10 = functools.reduce(
        lambda a, b: a ^ b,
        (h60_py(str(n)) for n in [1, 2, 3, 4, 5, 6, 7, 8, 20, 50]),
    )
    assert comms == [(1, 10, all10)]


# --- r09 head replays: dq_benford / dq_kanon / ts_crossings -------------------
#
# These three r04-stale gate-head queries had no independent check beyond
# the structure-sharing SQL oracle; same pattern as above — raw synthetic
# parquet, REAL registry query, plain-Python brute force.


def _r6(v):
    """round-half-up to 6 dp — Spark's round() semantics (Python round is
    banker's)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    prices=st.lists(st.integers(1, 10**8), min_size=1, max_size=60)
)
def test_dq_benford_matches_bruteforce(spark, prices):
    import math

    from orc_spark.plans.dq_q import dq_benford

    d = tempfile.mkdtemp(prefix="orc_props_bf_")
    pdf = pd.DataFrame(
        {
            "l_orderkey": range(1, len(prices) + 1),
            "l_extendedprice": [k / 100.0 for k in prices],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "lineitem.parquet")
    )
    got = [tuple(r) for r in dq_benford(spark, d).collect()]

    obs = {}
    for k in prices:
        fd = int(str(math.floor(k / 100.0))[0])
        if 1 <= fd <= 9:
            obs[fd] = obs.get(fd, 0) + 1
    n = sum(obs.values())
    want = []
    for dg in sorted(obs):
        exp = math.log10((dg + 1) / dg) * n
        want.append(
            (dg, obs[dg], _r6(exp), _r6((obs[dg] - exp) ** 2 / exp))
        )
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    custs=st.lists(
        st.tuples(
            st.integers(0, 4),
            st.sampled_from(["AUTOMOBILE", "BUILDING", "MACHINERY"]),
            st.integers(-999999, 999999),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_dq_kanon_matches_bruteforce(spark, custs):
    import math

    from orc_spark.plans.dq_q import KANON_K, dq_kanon

    d = tempfile.mkdtemp(prefix="orc_props_ka_")
    pdf = pd.DataFrame(
        {
            "c_custkey": range(1, len(custs) + 1),
            "c_nationkey": [c[0] for c in custs],
            "c_mktsegment": [c[1] for c in custs],
            "c_acctbal": [c[2] / 100.0 for c in custs],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "customer.parquet")
    )
    got = [tuple(r) for r in dq_kanon(spark, d).collect()]

    classes = {}
    for nk, seg, bal in custs:
        key = (nk, seg, math.floor(bal / 100.0 / 1000.0))
        classes[key] = classes.get(key, 0) + 1
    want = sorted(
        (
            (nk, seg, bk, cn, cn < KANON_K)
            for (nk, seg, bk), cn in classes.items()
        ),
        key=lambda r: (r[3], r[0], r[1], r[2]),
    )[:50]
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=4))
def test_ts_crossings_matches_bruteforce(spark, user_times):
    import math

    from orc_spark.plans.timeseries_q import ts_crossings

    vals = {}

    def extra(ui, eid, t):
        v = float((eid * 131 % 997) - 498) / 13.0
        vals[(ui + 1, t)] = v
        return {"value": v}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {r["user_id"]: tuple(r) for r in ts_crossings(spark, sf).collect()}

    assert set(got) == set(range(1, len(user_times) + 1))
    for ui, times in enumerate(user_times):
        uid = ui + 1
        series = [
            math.floor(vals[(uid, t)] * 1000) for t in sorted(times)
        ]
        n, s = len(series), sum(series)
        sgn = [1 if n * v - s >= 0 else -1 for v in series]
        if n == 1:
            assert got[uid] == (uid, 1, None, None)
            continue
        x = sum(1 for a, b in zip(sgn, sgn[1:]) if a != b)
        assert got[uid] == (uid, n, x, _r6(x / (n - 1)))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=4))
def test_ev_ltv_matches_bruteforce(spark, user_times):
    from orc_spark.plans.cdc_q import _LTV_WEEK_US, ev_ltv

    TYPES = ["view", "purchase", "click"]
    vals = {}

    def extra(ui, eid, t):
        et = TYPES[eid % 3]
        v = float((eid * 53 % 160))  # integral → cents = v*100 exact
        vals[eid] = (et, v)
        return {"event_type": et, "value": v}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = [tuple(r) for r in ev_ltv(spark, sf).collect()]

    eid = 0
    cohort, weekly = {}, {}
    for ui, times in enumerate(user_times):
        uid = ui + 1
        for t in sorted(times):
            et, v = vals[eid]
            wk = t // _LTV_WEEK_US
            cohort[uid] = min(cohort.get(uid, wk), wk)
            eid += 1
    eid = 0
    for ui, times in enumerate(user_times):
        uid = ui + 1
        for t in sorted(times):
            et, v = vals[eid]
            if et == "purchase":
                key = (cohort[uid], t // _LTV_WEEK_US - cohort[uid])
                weekly[key] = weekly.get(key, 0) + int(v * 100)
            eid += 1
    sizes = {}
    for c in cohort.values():
        sizes[c] = sizes.get(c, 0) + 1
    want, cum = [], {}
    for c, age in sorted(weekly):
        cum[c] = cum.get(c, 0) + weekly[(c, age)]
        want.append(
            (c, age, sizes[c], weekly[(c, age)], cum[c], cum[c] // sizes[c])
        )
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["cat", "dog", "the", "sat", "runs", "Dog!"]),
            min_size=0,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
def test_tx_ngram_lm_matches_bruteforce(spark, texts):
    import math
    import re

    from orc_spark.plans.ir_q import tx_ngram_lm

    d = tempfile.mkdtemp(prefix="orc_props_lm_")
    pdf = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = [tuple(r) for r in tx_ngram_lm(spark, d).collect()]

    doc_bi = {}
    for i, text in enumerate(texts):
        toks = re.findall(r"[a-z]+", text.lower())
        bi = {}
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
        if bi:
            doc_bi[i + 1] = bi
    corpus = {}
    for bi in doc_bi.values():
        for g, k in bi.items():
            corpus[g] = corpus.get(g, 0) + k
    want = []
    for doc_id in sorted(doc_bi):
        bi = doc_bi[doc_id]
        n_bi = sum(bi.values())
        sum_cxy = sum(k * corpus[g] for g, k in bi.items())
        n_novel = sum(1 for g, k in bi.items() if corpus[g] == k)
        want.append(
            (doc_id, n_bi, sum_cxy, n_novel, _r6(math.log(sum_cxy / n_bi)))
        )
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    )
)
@pytest.mark.sweep  # long-tail value check: full/nightly tier
def test_dd_containment_matches_bruteforce(spark, base):
    """Full-pipeline replay of dd_containment INCLUDING candidate
    generation: 5-char shingles → h60 → 16 affine perms → 4 band keys →
    same-band pairs → distinct-trigram containment — all in plain Python
    (h60_py is the shared, independently-pinned primitive). A copy of
    doc 1 is planted so at least one (identical-signature) candidate pair
    always exists and must classify as mutual with containment 1.0."""
    from orc_spark.functions.hashing import MERSENNE_P, MINHASH_PERMS, h60_py
    from orc_spark.plans.dedup_q import (
        CONTAIN_MIN,
        N_BANDS,
        NGRAM_N,
        ROWS_PER_BAND,
        SHINGLE_K,
        dd_containment,
    )

    texts = base + [base[0]]  # planted exact duplicate of doc 1
    d = tempfile.mkdtemp(prefix="orc_props_dc_")
    pdf = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = sorted(tuple(r) for r in dd_containment(spark, d).collect())

    def shingles(t):
        t = t.lower()
        return {t[i : i + SHINGLE_K] for i in range(max(len(t) - SHINGLE_K + 1, 1))}

    def sig(t):
        hs = [h60_py(s) for s in shingles(t)]
        return [
            min((a * (h % MERSENNE_P) + b) % MERSENNE_P for h in hs)
            for a, b in MINHASH_PERMS
        ]

    def grams(t):
        t = t.lower()
        return {t[i : i + NGRAM_N] for i in range(max(len(t) - NGRAM_N + 1, 1))}

    sigs = {i + 1: sig(t) for i, t in enumerate(texts)}
    bands = {}
    for doc_id, s in sigs.items():
        for band in range(N_BANDS):
            key = (
                band,
                ",".join(
                    str(v)
                    for v in s[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                ),
            )
            bands.setdefault(key, []).append(doc_id)
    cand = set()
    for ids in bands.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                if a != b:
                    cand.add((min(a, b), max(a, b)))
    gsets = {i + 1: grams(t) for i, t in enumerate(texts)}
    want = []
    for a, b in sorted(cand):
        inter = len(gsets[a] & gsets[b])
        c_ab, c_ba = inter / len(gsets[a]), inter / len(gsets[b])
        if c_ab < CONTAIN_MIN and c_ba < CONTAIN_MIN:
            continue
        rel = (
            "mutual"
            if c_ab >= CONTAIN_MIN and c_ba >= CONTAIN_MIN
            else ("a_in_b" if c_ab >= CONTAIN_MIN else "b_in_a")
        )
        want.append((a, b, _r6(c_ab), _r6(c_ba), rel))
    assert got == want
    # the planted duplicate is always a candidate and fully mutual
    assert (1, len(texts), 1.0, 1.0, "mutual") in got


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_tx_winnow_matches_bruteforce(spark, texts):
    from functools import reduce

    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.text_q import WINNOW_K, WINNOW_W, tx_winnow

    d = tempfile.mkdtemp(prefix="orc_props_wn_")
    pdf = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = sorted(tuple(r) for r in tx_winnow(spark, d).collect())

    want = []
    for i, text in enumerate(texts):
        t = text.lower()
        n_pos = max(len(t) - WINNOW_K + 1, 1)
        hs = [h60_py(t[p : p + WINNOW_K]) for p in range(n_pos)]
        fps = {
            min(hs[p : p + WINNOW_W]) for p in range(n_pos - WINNOW_W + 1)
        }
        if fps:  # docs shorter than one full window emit no fingerprints
            want.append(
                (i + 1, len(fps), reduce(lambda a, b: a ^ b, fps), min(fps))
            )
    assert got == sorted(want)


def _ntile5(n, i):
    """SQL ntile(5) for 0-based row i of n rows: the first n%5 tiles get
    one extra row."""
    q, r = divmod(n, 5)
    if i < r * (q + 1):
        return i // (q + 1) + 1
    return r + (i - r * (q + 1)) // q + 1 if q else r


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=6))
def test_ev_rfm_matches_bruteforce(spark, user_times):
    from orc_spark.plans.cdc_q import _RFM_DAY_US, ev_rfm

    TYPES = ["purchase", "view"]
    vals = {}

    def extra(ui, eid, t):
        et = TYPES[eid % 2]
        v = float(eid * 31 % 700)
        vals[eid] = (et, v)
        return {"event_type": et, "value": v}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = [tuple(r) for r in ev_rfm(spark, sf).collect()]

    per_user = {}
    eid = 0
    for ui, times in enumerate(user_times):
        uid = ui + 1
        for t in sorted(times):
            et, v = vals[eid]
            if et == "purchase":
                last, freq, cents = per_user.get(uid, (-1, 0, 0))
                per_user[uid] = (max(last, t), freq + 1, cents + int(v * 100))
            eid += 1
    if not per_user:
        assert got == []
        return
    end = max(last for last, _, _ in per_user.values())
    rows = {
        uid: ((end - last) // _RFM_DAY_US, freq, cents)
        for uid, (last, freq, cents) in per_user.items()
    }
    n = len(rows)
    scores = {uid: [0, 0, 0] for uid in rows}
    for si, key in enumerate(
        [
            lambda u: (rows[u][0], u),           # recency asc
            lambda u: (-rows[u][1], u),          # freq desc
            lambda u: (-rows[u][2], u),          # cents desc
        ]
    ):
        for i, uid in enumerate(sorted(rows, key=key)):
            scores[uid][si] = _ntile5(n, i)
    cells = {}
    for uid, (rec, freq, cents) in rows.items():
        key = tuple(scores[uid])
        cnt, tot, samp = cells.get(key, (0, 0, None))
        cells[key] = (
            cnt + 1,
            tot + cents,
            uid if samp is None else min(samp, uid),
        )
    want = [
        (r, f, m, c, t, s) for (r, f, m), (c, t, s) in sorted(cells.items())
    ]
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(1, 3),      # custkey
            st.integers(0, 40),     # order day offset
            st.integers(1, 10**6),  # price cents
            st.lists(st.integers(-5, 45), min_size=1, max_size=2),  # ship days
        ),
        min_size=1,
        max_size=12,
    )
)
@pytest.mark.sweep  # long-tail value check: full/nightly tier
def test_cdc_pit_lookup_matches_bruteforce(spark, orders):
    """AS-OF point-in-time join replay: SCD2 intervals, version ranks and
    cumulative spend recomputed with plain Python sorting; every 97th-key
    probe must land in exactly the interval containing its ship date (and
    ships before a customer's first version must vanish — inner-join
    semantics)."""
    import datetime as dt

    from orc_spark.plans.cdc_q import cdc_pit_lookup

    base = dt.date(1995, 1, 1)
    d = tempfile.mkdtemp(prefix="orc_props_pit_")
    orows, lrows = [], []
    for i, (ck, od, price_c, ships) in enumerate(orders):
        okey = 97 * (i + 1) if i % 3 != 2 else 97 * (i + 1) + 1  # some non-probes
        orows.append((okey, ck, base + dt.timedelta(days=od), price_c / 100.0))
        for ln, sd in enumerate(ships):
            lrows.append((okey, ln + 1, base + dt.timedelta(days=sd)))
    spark.createDataFrame(
        orows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        lrows, "l_orderkey long, l_linenumber long, l_shipdate date"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))

    got = [tuple(r) for r in cdc_pit_lookup(spark, d).collect()]

    def ms(date):
        return int(
            dt.datetime(
                date.year, date.month, date.day, tzinfo=dt.timezone.utc
            ).timestamp()
            * 1000
        )

    hist = {}  # custkey -> [(valid_from, valid_to, version, cum_cents)]
    by_ck = {}
    for i, (ck, od, price_c, _ships) in enumerate(orders):
        okey = 97 * (i + 1) if i % 3 != 2 else 97 * (i + 1) + 1
        by_ck.setdefault(ck, []).append((base + dt.timedelta(days=od), okey, price_c))
    for ck, lst in by_ck.items():
        lst.sort()
        cum = 0
        vers = []
        for v, (od, okey, price_c) in enumerate(lst):
            cum += price_c
            vers.append([ms(od), None, v + 1, cum])
        for a, b in zip(vers, vers[1:]):
            a[1] = b[0]
        hist[ck] = vers
    want = []
    for i, (ck, od, price_c, ships) in enumerate(orders):
        okey = 97 * (i + 1) if i % 3 != 2 else 97 * (i + 1) + 1
        if okey % 97 != 0:
            continue
        for ln, sd in enumerate(ships):
            ship = ms(base + dt.timedelta(days=sd))
            for vf, vt, ver, cum in hist[ck]:
                if vf <= ship and (vt is None or ship < vt):
                    want.append((okey, ln + 1, ck, ship, ver, cum))
    want.sort()
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=4))
def test_ts_seasonal_matches_bruteforce(spark, user_times):
    from orc_spark.plans.timeseries_q import ts_seasonal

    TYPES = ["view", "click", "purchase"]
    vals = {}

    def extra(ui, eid, t):
        et = TYPES[eid % 3]
        v = float(eid * 7 % 41) / 2.0  # exact binary fraction: *1e4 exact
        vals[eid] = (et, v)
        return {"event_type": et, "value": v}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = [tuple(r) for r in ts_seasonal(spark, sf).collect()]

    cells = {}
    eid = 0
    for times in user_times:
        for t in sorted(times):
            et, v = vals[eid]
            key = (et, (t // 3600000000) % 24)
            n, s = cells.get(key, (0, 0))
            cells[key] = (n + 1, s + int(v * 10000))
            eid += 1
    totals = {}
    for (et, _h), (n, s) in cells.items():
        tn, ts_ = totals.get(et, (0, 0))
        totals[et] = (tn + n, ts_ + s)
    want = []
    for (et, h) in sorted(cells):
        n, s = cells[(et, h)]
        tn, ts_ = totals[et]
        dev = s * tn - ts_ * n
        want.append((et, h, n, s, _r6(s / n / 10000.0), dev, dev > 0))
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=4))
def test_dq_drift_matches_bruteforce(spark, user_times):
    import math

    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.dq_q import PSI_BINS, dq_drift

    TYPES = ["view", "click"]
    vals = {}

    def extra(ui, eid, t):
        et = TYPES[eid % 2]
        # pin the global span so mx > mn always (bin math stays on the
        # main path; degenerate spans are test_empty_inputs territory)
        v = -10.0 if eid == 0 else (110.0 if eid == 1 else float(eid * 13 % 100))
        vals[eid] = (et, v)
        return {"event_type": et, "value": v}

    # ensure >= 2 events so both span pins exist
    user_times = [sorted(set(ts) | {0, 3 * DAY_US}) for ts in user_times]
    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = {r["event_type"]: tuple(r) for r in dq_drift(spark, sf).collect()}

    rows = []
    eid = 0
    for ui, times in enumerate(user_times):
        for t in sorted(times):
            et, v = vals[eid]
            rows.append((et, t, v))
            eid += 1
    mn = min(v for _, _, v in rows)
    mx = max(v for _, _, v in rows)
    ts_mid = (min(t for _, t, _ in rows) + max(t for _, t, _ in rows)) // 2
    binned = {}
    for et, t, v in rows:
        b = min(math.floor((v - mn) / (mx - mn) * PSI_BINS), PSI_BINS - 1)
        cr, cc = binned.get((et, b), (0, 0))
        if t <= ts_mid:
            binned[(et, b)] = (cr + 1, cc)
        else:
            binned[(et, b)] = (cr, cc + 1)
    want = {}
    for et in {k[0] for k in binned}:
        cells = sorted((b, cr, cc) for (e, b), (cr, cc) in binned.items() if e == et)
        dr = sum(cr + 1 for _, cr, _ in cells)
        dc = sum(cc + 1 for _, _, cc in cells)
        psi = sum(
            ((cr + 1) / dr - (cc + 1) / dc)
            * math.log(((cr + 1) / dr) / ((cc + 1) / dc))
            for _, cr, cc in cells
        )
        dig = 0
        for b, cr, cc in cells:
            dig ^= h60_py(f"{b}:{cr}:{cc}")
        want[et] = (
            et,
            _r6(psi),
            sum(cr for _, cr, _ in cells),
            sum(cc for _, _, cc in cells),
            dig,
        )
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=5))
def test_ev_funnel_windowed_matches_bruteforce(spark, user_times):
    from orc_spark.plans.relational3 import FUNNEL_WINDOW_US, ev_funnel_windowed

    TYPES = ["view", "click", "purchase"]
    vals = {}

    def extra(ui, eid, t):
        et = TYPES[eid % 3]
        vals[eid] = et
        return {"event_type": et}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = [tuple(r) for r in ev_funnel_windowed(spark, sf).collect()]
    assert len(got) == 1

    W = FUNNEL_WINDOW_US
    eid = 0
    by_user = {}
    for ui, times in enumerate(user_times):
        uid = ui + 1
        for t in sorted(times):
            by_user.setdefault(uid, []).append((t, vals[eid]))
            eid += 1
    n1 = n2 = n3 = 0
    lat_sum = 0
    for evs in by_user.values():
        views = [t for t, e in evs if e == "view"]
        if not views:
            continue
        n1 += 1
        t1 = min(views)
        clicks = [t for t, e in evs if e == "click" and t1 < t <= t1 + W]
        if not clicks:
            continue
        n2 += 1
        t2 = min(clicks)
        purch = [t for t, e in evs if e == "purchase" and t2 < t <= t2 + W]
        if not purch:
            continue
        n3 += 1
        lat_sum += min(purch) - t1
    # the engines' cross-engine-exact half-up (r14): scale the exact
    # integers, ONE double division, +0.5, floor, /1e6 — identical IEEE
    # ops here, so the tuple comparison stays exact equality
    import math

    def _hu6(num, den):
        return math.floor(num / den + 0.5) / 1000000.0

    want = (
        n1,
        n2,
        n3,
        _hu6(n2 * 1000000.0, n1) if n1 else None,
        _hu6(n3 * 1000000.0, n1) if n1 else None,
        _hu6(lat_sum, n3) if n3 else None,
    )
    # every global eid cycle starts with a view for user 1, so n1 >= 1
    assert got[0] == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_times=st.lists(times_strategy, min_size=1, max_size=4))
def test_dq_freshness_matches_bruteforce(spark, user_times):
    from orc_spark.plans.dq_q import _DAY_US, dq_freshness

    TYPES = ["view", "click", "purchase"]
    vals = {}

    def extra(ui, eid, t):
        et = TYPES[eid % 3]
        vals[eid] = et
        return {"event_type": et}

    sf = _write_events(spark, _mk_rows(user_times, extra))
    got = [tuple(r) for r in dq_freshness(spark, sf).collect()]

    rows = []
    eid = 0
    for times in user_times:
        for t in sorted(times):
            rows.append((vals[eid], t))
            eid += 1
    end = max(t for _, t in rows)
    start = min(t for _, t in rows)
    span_days = (end - start) // _DAY_US + 1
    want = []
    for et in sorted({e for e, _ in rows}):
        ts_ = [t for e, t in rows if e == et]
        n_total = len(ts_)
        last_age_s = (end - max(ts_)) // 1000000
        recent = sum(1 for t in ts_ if t >= end - 7 * _DAY_US)
        ratio = (recent * span_days * 100) // (7 * n_total)
        want.append(
            (
                et,
                n_total,
                last_age_s,
                recent,
                span_days,
                ratio,
                last_age_s > 86400,
                ratio < 50,
            )
        )
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["cat", "dog", "the", "sat", "runs"]),
            min_size=0,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_tx_hashclf_matches_bruteforce(spark, texts):
    import math
    import re

    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.ir_q import CLF_BUCKETS, CLF_W_RANGE, tx_hashclf

    d = tempfile.mkdtemp(prefix="orc_props_clf_")
    pdf = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = [tuple(r) for r in tx_hashclf(spark, d).collect()]

    want = []
    for i, text in enumerate(texts):
        toks = re.findall(r"[a-z]+", text.lower())
        if not toks:
            continue
        score = sum(
            h60_py(f"w:{h60_py(tok) % CLF_BUCKETS}") % CLF_W_RANGE - 1000
            for tok in toks
        )
        prob = _r6(1.0 / (1.0 + math.exp(-(score / (1000.0 * len(toks))))))
        want.append((i + 1, len(toks), score, prob, 1 if score > 0 else 0))
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    langs=st.lists(
        st.sampled_from(["en", "de", "fr", "ja", "sw"]), min_size=1, max_size=40
    )
)
def test_cu_anneal_mixture_matches_bruteforce(spark, langs):
    import math

    from orc_spark.plans.curation_q import ANNEAL_SCALE, cu_anneal_mixture

    d = tempfile.mkdtemp(prefix="orc_props_am_")
    pdf = pd.DataFrame(
        {
            "doc_id": range(1, len(langs) + 1),
            "text": ["w"] * len(langs),
            "lang": langs,
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = [tuple(r) for r in cu_anneal_mixture(spark, d).collect()]

    counts = {}
    for lg in langs:
        counts[lg] = counts.get(lg, 0) + 1
    sq = {
        lg: math.floor(math.sqrt(float(n)) * float(ANNEAL_SCALE) + 0.5)
        for lg, n in counts.items()
    }
    n_tot, sq_tot = sum(counts.values()), sum(sq.values())
    want = [
        (
            lg,
            counts[lg],
            _r6(counts[lg] / n_tot),
            _r6(sq[lg] / sq_tot),
            _r6((sq[lg] / sq_tot) / (counts[lg] / n_tot)),
        )
        for lg in sorted(counts)
    ]
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=500),
        min_size=1,
        max_size=5,
    )
)
def test_cu_chunk_matches_bruteforce(spark, texts):
    import re

    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.curation_q import CHUNK_LEN, CHUNK_STRIDE, cu_chunk

    d = tempfile.mkdtemp(prefix="orc_props_ck_")
    pdf = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = [tuple(r) for r in cu_chunk(spark, d).collect()]

    want = []
    for i, text in enumerate(texts):
        for idx, start in enumerate(
            range(1, max(len(text), 1) + 1, CHUNK_STRIDE)
        ):
            chunk = text[start - 1 : start - 1 + CHUNK_LEN]
            want.append(
                (
                    i + 1,
                    idx,
                    start,
                    len(chunk),
                    len(re.split(r"\s+", chunk.strip())),
                    h60_py(chunk),
                )
            )
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    )
)
def test_dd_minhash_quality_matches_bruteforce(spark, base):
    """Full replay of the estimator-QA pipeline: candidates + the 16-perm
    estimate + exact shingle Jaccard + fixed-point quartile calibration —
    all in plain Python (a planted duplicate of doc 1 guarantees at least
    one candidate pair in the top quartile)."""
    import math

    from orc_spark.functions.hashing import MERSENNE_P, MINHASH_PERMS, h60_py
    from orc_spark.plans.dedup_q import (
        MHQ_ERR_SCALE,
        N_BANDS,
        ROWS_PER_BAND,
        SHINGLE_K,
        dd_minhash_quality,
    )

    texts = base + [base[0]]
    d = tempfile.mkdtemp(prefix="orc_props_mq_")
    pdf = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = [tuple(r) for r in dd_minhash_quality(spark, d).collect()]

    def shingles(t):
        t = t.lower()
        return {t[i : i + SHINGLE_K] for i in range(max(len(t) - SHINGLE_K + 1, 1))}

    def sig(t):
        hs = [h60_py(s) for s in shingles(t)]
        return [
            min((a * (h % MERSENNE_P) + b) % MERSENNE_P for h in hs)
            for a, b in MINHASH_PERMS
        ]

    sigs = {i + 1: sig(t) for i, t in enumerate(texts)}
    shs = {i + 1: shingles(t) for i, t in enumerate(texts)}
    bands = {}
    for doc_id, s in sigs.items():
        for band in range(N_BANDS):
            key = (band, tuple(s[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]))
            bands.setdefault(key, []).append(doc_id)
    cand = set()
    for ids in bands.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    S = float(MHQ_ERR_SCALE)
    fp = lambda x: math.floor(x * S + 0.5)  # noqa: E731
    cells = {}
    for a, b in sorted(cand):
        est = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y) / len(sigs[a])
        inter = len(shs[a] & shs[b])
        exact = inter / (len(shs[a]) + len(shs[b]) - inter)
        err = abs(est - exact)
        q = min(math.floor(est * 4.0), 3)
        n, se, sx, serr, mx = cells.get(q, (0, 0, 0, 0, 0.0))
        cells[q] = (n + 1, se + fp(est), sx + fp(exact), serr + fp(err), max(mx, err))
    want = [
        (q, n, _r6(se / n / S), _r6(sx / n / S), _r6(serr / n / S), _r6(mx))
        for q, (n, se, sx, serr, mx) in sorted(cells.items())
    ]
    assert got == want
    assert any(q == 3 for q, *_ in got)  # the planted duplicate pair


def _gopher_py(text):
    """Plain-Python Gopher signals (spec re-derivation, independent of
    orc_spark.plans.text_q.gopher_signals)."""
    import re

    from orc_spark.plans.text_q import (
        GOPHER_MAX_MWL,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MWL,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
    )

    n_words = len(re.split(r"\s+", text.strip()))
    n_space = text.count(" ")
    mwl = (len(text) - n_space) / n_words
    symbol_ratio = len(re.findall(r"#|\.\.\.", text)) / n_words
    alpha_frac = len(re.findall(r"[^ ]*[a-z][^ ]*", text)) / n_words
    padded = f" {text} "
    n_stop = sum(1 for w in GOPHER_STOPWORDS if f" {w} " in padded)
    passes = (
        GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS,
        GOPHER_MIN_MWL <= mwl <= GOPHER_MAX_MWL,
        symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO,
        alpha_frac >= GOPHER_MIN_ALPHA_FRAC,
        n_stop >= GOPHER_MIN_STOPWORDS,
    )
    return n_words, mwl, symbol_ratio, alpha_frac, n_stop, passes


gopher_text = st.lists(
    st.sampled_from(
        ["the", "of", "cat", "dog#", "...", "a", "to", "interdisciplinary", "xx", "#"]
    ),
    min_size=1,
    max_size=60,
).map(" ".join)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(gopher_text, min_size=1, max_size=8))
def test_tx_gopher_quality_matches_bruteforce(spark, texts):
    from orc_spark.plans.text_q import tx_gopher_quality

    d = tempfile.mkdtemp(prefix="orc_props_gq_")
    pdf = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = sorted(tuple(r) for r in tx_gopher_quality(spark, d).collect())

    want = []
    for i, text in enumerate(texts):
        n_words, mwl, sym, alpha, n_stop, p = _gopher_py(text)
        want.append(
            (
                i + 1,
                n_words,
                _r6(mwl),
                _r6(sym),
                _r6(alpha),
                n_stop,
                *p,
                all(p),
            )
        )
    assert got == sorted(want)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(
        st.one_of(st.none(), gopher_text),
        min_size=1,
        max_size=8,
    )
)
@pytest.mark.sweep  # long-tail value check: full/nightly tier
def test_cu_corpus_report_matches_bruteforce(spark, base):
    """Capstone replay: the one-row corpus health report recomputed from
    raw texts — exact-dup accounting, the full MinHash LSH pipeline for
    near-dup pairs, Gopher fail count, token totals — with a planted
    duplicate of doc 1 (when non-null) guaranteeing both an exact dup and
    a near-dup candidate."""
    import re

    from orc_spark.functions.hashing import MERSENNE_P, MINHASH_PERMS, h60_py
    from orc_spark.plans.curation_q import REPORT_NEAR_DUP_EST, cu_corpus_report
    from orc_spark.plans.dedup_q import (
        N_BANDS,
        N_PERM,
        ROWS_PER_BAND,
        SHINGLE_K,
    )

    texts = base + [base[0]]
    d = tempfile.mkdtemp(prefix="orc_props_cr_")
    rows = [(i + 1, t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = [tuple(r) for r in cu_corpus_report(spark, d).collect()]
    assert len(got) == 1

    nn = [t for t in texts if t is not None]
    n_docs = len(texts)
    n_null = len(texts) - len(nn)
    n_digests = len(set(nn))
    # Spark sum() over zero non-null rows is NULL, not 0 — mirror it
    total_tokens = (
        sum(len(re.split(r"\s+", t.strip())) for t in nn) if nn else None
    )
    n_gopher_fail = (
        sum(1 for t in nn if not all(_gopher_py(t)[5])) if nn else None
    )

    def shingles(t):
        t = t.lower()
        return {t[i : i + SHINGLE_K] for i in range(max(len(t) - SHINGLE_K + 1, 1))}

    def sig(t):
        hs = [h60_py(s) for s in shingles(t)]
        return [
            min((a * (h % MERSENNE_P) + b) % MERSENNE_P for h in hs)
            for a, b in MINHASH_PERMS
        ]

    sigs = {i + 1: sig(t) for i, t in enumerate(texts) if t is not None}
    bands = {}
    for doc_id, s in sigs.items():
        for band in range(N_BANDS):
            key = (band, tuple(s[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]))
            bands.setdefault(key, []).append(doc_id)
    cand = set()
    for ids in bands.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    n_near = sum(
        1
        for a, b in cand
        if sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y) / N_PERM
        >= REPORT_NEAR_DUP_EST
    )
    want = (
        n_docs,
        n_null,
        n_docs - n_null - n_digests,
        n_near,
        n_gopher_fail,
        total_tokens,
    )
    assert got[0] == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(
        st.lists(
            st.sampled_from(["cat", "dog", "the", "sat", "runs", "x#y"]),
            min_size=0,
            max_size=10,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_dd_simhash_and_pairs_match_bruteforce(spark, base):
    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.dedup_q import SIMHASH_BITS, dd_simhash, dd_simhash_pairs

    texts = base + [base[0]]  # planted duplicate → a guaranteed hamming-0 pair
    d = tempfile.mkdtemp(prefix="orc_props_sh_")
    pdf = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got_sig = sorted(tuple(r) for r in dd_simhash(spark, d).collect())
    got_pairs = sorted(tuple(r) for r in dd_simhash_pairs(spark, d).collect())

    sigs = {}
    for i, text in enumerate(texts):
        toks = [t for t in text.lower().split() if t]  # \s+ split, drop ''
        if not toks:
            continue
        sh = 0
        for b in range(SIMHASH_BITS):
            w = sum(1 if (h60_py(t) >> b) & 1 else -1 for t in toks)
            if w > 0:
                sh |= 1 << b
        sigs[i + 1] = sh
    assert got_sig == sorted(sigs.items())

    bands = {}
    for doc_id, sh in sigs.items():
        for b in range(4):
            bands.setdefault((b, (sh >> (15 * b)) & 0x7FFF), []).append(doc_id)
    pairs = set()
    for ids in bands.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b_ = min(ids[i], ids[j]), max(ids[i], ids[j])
                hd = bin(sigs[a] ^ sigs[b_]).count("1")
                if hd <= 3:
                    pairs.add((a, b_, hd))
    assert got_pairs == sorted(pairs)
    if base[0].strip():
        assert (1, len(texts), 0) in pairs  # the planted duplicate


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    items=st.lists(
        st.tuples(
            st.integers(1, 500),   # orderkey
            st.integers(1, 7),     # linenumber
            st.integers(1, 10**6), # price quarters
            st.integers(1, 100),   # qty halves
        ),
        min_size=1,
        max_size=80,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_dp_sample_matches_bruteforce(spark, items):
    import hashlib

    from orc_spark.plans.relational3 import SAMPLE_BUCKETS, dp_sample

    d = tempfile.mkdtemp(prefix="orc_props_ds_")
    pdf = pd.DataFrame(
        {
            "l_orderkey": [r[0] for r in items],
            "l_linenumber": [r[1] for r in items],
            "l_extendedprice": [r[2] / 4.0 for r in items],  # exact binary
            "l_quantity": [r[3] / 2.0 for r in items],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "lineitem.parquet")
    )
    got = [tuple(r) for r in dp_sample(spark, d).collect()]

    kept = [
        r
        for r in items
        if int(hashlib.md5(f"{r[0]}-{r[1]}".encode()).hexdigest()[:15], 16)
        % SAMPLE_BUCKETS
        == 0
    ]
    want = (
        len(kept),
        sum(r[2] / 4.0 for r in kept) if kept else None,
        (sum(r[3] / 2.0 for r in kept) / len(kept)) if kept else None,
    )
    assert got == [want]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "zh", "es", "it"]),  # it → DEFAULT_PCT
            st.integers(0, 5000),                       # n_chars
        ),
        min_size=1,
        max_size=60,
    )
)
def test_dp_stratified_matches_bruteforce(spark, docs):
    import hashlib

    from orc_spark.plans.relational3 import (
        DEFAULT_PCT,
        SAMPLE_BUCKETS,
        STRATA_PCT,
        dp_stratified,
    )

    d = tempfile.mkdtemp(prefix="orc_props_dst_")
    pdf = pd.DataFrame(
        {
            "doc_id": range(1, len(docs) + 1),
            "text": ["w"] * len(docs),
            "lang": [r[0] for r in docs],
            "n_chars": [r[1] for r in docs],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = sorted(tuple(r) for r in dp_stratified(spark, d).collect())

    agg = {}
    for i, (lang, n_chars) in enumerate(docs):
        bucket = (
            int(hashlib.md5(str(i + 1).encode()).hexdigest()[:15], 16)
            % SAMPLE_BUCKETS
        )
        keep = bucket < STRATA_PCT.get(lang, DEFAULT_PCT)
        tot, ns, sc = agg.get(lang, (0, 0, 0))
        agg[lang] = (tot + 1, ns + keep, sc + (n_chars if keep else 0))
    want = sorted((lg, t, ns, sc) for lg, (t, ns, sc) in agg.items())
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.integers(-8, 8).map(float), min_size=4, max_size=4
        ).filter(lambda v: any(x != 0.0 for x in v)),
        min_size=2,
        max_size=30,
    )
)
def test_ann_topk_matches_bruteforce(spark, vecs):
    """Exact cosine top-k replay: normalize + dot + round-6 + (cos desc,
    neighbor asc) ranking recomputed per query with plain numpy on the raw
    vectors — independent of the broadcast/matmul/partition-top-k plumbing
    (including the +8 tie headroom at the per-partition cut)."""
    import numpy as np

    from orc_spark.plans.dedup_q import ANN_K, ANN_N_QUERIES, ann_topk

    d = tempfile.mkdtemp(prefix="orc_props_ann_")
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [list(v) for v in vecs]}
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    got = sorted(tuple(r) for r in ann_topk(spark, d).collect())

    m = np.asarray(vecs, dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    want = []
    for q in range(min(ANN_N_QUERIES, len(vecs))):
        sims = np.round(m[q] @ m.T, 6)
        order = sorted(
            (i for i in range(len(vecs)) if i != q),
            key=lambda i: (-sims[i], i),
        )
        for rank, i in enumerate(order[:ANN_K], start=1):
            want.append((q, i, float(sims[i]), rank))
    assert got == sorted(want)


# --- r10: ts_autocorr replay (VERDICT r09 directive 5) ------------------------
#
# The one plan rewritten in r09 (per-lag groupBy union -> single-pass stack
# unpivot) had no oracle-independent check: its evidence was the mirrored
# fixed-point SQL + the driver hash. This is a plain-Python lag-aligned
# Pearson on hypothesis fixtures, exercising ragged series (runs shorter
# than the lag emit NO row) and the degenerate constant-series case.


def _bf_autocorr(series_by_user, lags, scale):
    """Plain-Python lag-k Pearson in the query's fixed-point arithmetic:
    x = floor(value*scale) exact ints, ONE float expression at the end."""
    import math

    out = {}
    for u, vals in series_by_user.items():
        xs = [math.floor(v * scale) for v in vals]
        for k in lags:
            pairs = [(xs[i], xs[i - k]) for i in range(k, len(xs))]
            if not pairs:
                continue  # lag filter leaves no rows -> no output row
            n = len(pairs)
            sx = sum(p[0] for p in pairs)
            sy = sum(p[1] for p in pairs)
            sxy = sum(p[0] * p[1] for p in pairs)
            sxx = sum(p[0] * p[0] for p in pairs)
            syy = sum(p[1] * p[1] for p in pairs)
            num = float(n * sxy - sx * sy)
            den = math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
            # den == 0 (a constant side) forces num == 0 (Cauchy-Schwarz):
            # 0.0/0.0 is NaN in Spark double math -> represent as None
            out[(u, k)] = (n, None if den == 0.0 else _r6(num / den))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_ts_autocorr_matches_bruteforce(spark, user_times, seed):
    from orc_spark.plans.timeseries_q import AC_LAGS, AC_SCALE, ts_autocorr

    rng = np.random.default_rng(seed)

    def extra(ui, eid, t):
        return {"value": float(rng.integers(-5000, 5000)) / 100.0}

    rows = _mk_rows(user_times, extra)
    series = {}
    for r in rows:  # _mk_rows emits each user's rows already time-sorted
        series.setdefault(r["user_id"], []).append(r["value"])
    want = _bf_autocorr(series, AC_LAGS, AC_SCALE)

    sf = _write_events(spark, rows)
    got = {
        (r["user_id"], r["lag"]): (r["n_pairs"], r["autocorr"])
        for r in ts_autocorr(spark, sf).collect()
    }
    assert set(got) == set(want)
    for key, (n, r_exp) in want.items():
        n_got, r_got = got[key]
        assert n_got == n
        if r_exp is None:
            assert r_got is None or r_got != r_got  # NULL or NaN
        else:
            assert r_got == r_exp


def test_ts_autocorr_degenerate_constant_series(spark):
    """A constant-value user has zero variance at every lag: n_pairs still
    counts the aligned pairs but the Pearson denominator is 0 -> NaN/NULL.
    A varied user alongside it must be unaffected."""
    from orc_spark.plans.timeseries_q import AC_LAGS, AC_SCALE, ts_autocorr

    user_times = [
        [i * 1000000 for i in range(8)],   # user 1: constant value
        [i * 1000000 for i in range(10)],  # user 2: alternating value
    ]
    vals = {1: [7.25] * 8, 2: [(-1.5 if i % 2 else 3.75) for i in range(10)]}
    counters = {}

    def extra(ui, eid, t):
        i = counters.get(ui, 0)
        counters[ui] = i + 1
        return {"value": vals[ui + 1][i]}

    rows = _mk_rows(user_times, extra)
    want = _bf_autocorr(vals, AC_LAGS, AC_SCALE)
    sf = _write_events(spark, rows)
    got = {
        (r["user_id"], r["lag"]): (r["n_pairs"], r["autocorr"])
        for r in ts_autocorr(spark, sf).collect()
    }
    assert set(got) == set(want)
    for key, (n, r_exp) in want.items():
        n_got, r_got = got[key]
        assert n_got == n
        if r_exp is None:
            assert r_got is None or r_got != r_got
        else:
            assert r_got == r_exp
    # the alternating series is perfectly anti-correlated at lag 1,
    # perfectly correlated at lag 2
    assert got[(2, 1)][1] == -1.0
    assert got[(2, 2)][1] == 1.0


# --- event-time window family + rollup + resample replays (r11 directive 8):
# the r8* batch window replays pin tumbling/sliding/session SEMANTICS
# (bucket assignment, the 4-windows-per-event sliding rule incl. negative
# starts near the epoch, the >=30min session break) against plain-Python
# oracles independent of both engines' window machinery. Values are
# multiples of 0.25 so every sum is binary-exact regardless of
# accumulation order — the comparisons are exact equality, not isclose.

def _quarter_vals(rng):
    def extra(ui, eid, t):
        return {
            "value": float(rng.integers(-32, 33)) / 4.0,
            "event_type": ["view", "click", "buy"][eid % 3],
        }
    return extra


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_r8_tumbling_matches_bruteforce(spark, user_times, seed):
    from orc_spark.plans.relational import r8_tumbling

    rng = np.random.default_rng(seed)
    rows = _mk_rows(user_times, _quarter_vals(rng))
    want = {}
    for r in rows:
        key = ((r["ts_us"] // 1_000_000 // 3600) * 3600, r["event_type"])
        n, s = want.get(key, (0, 0.0))
        want[key] = (n + 1, s + r["value"])
    sf = _write_events(spark, rows)
    got = {
        (r["window_start_s"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in r8_tumbling(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_r8b_sliding_matches_bruteforce(spark, user_times, seed):
    from orc_spark.plans.relational import r8b_sliding

    rng = np.random.default_rng(seed)
    rows = _mk_rows(user_times, _quarter_vals(rng))
    # every event lies in exactly the 4 hour-long windows whose 15-min-
    # aligned starts satisfy w <= ts < w + 3600 (starts may precede the
    # epoch for events in the first hour)
    acc = {}
    for r in rows:
        ts_s = r["ts_us"] // 1_000_000
        for k in range(4):
            w = (ts_s // 900 - k) * 900
            n, s = acc.get(w, (0, 0.0))
            acc[w] = (n + 1, s + r["value"])
    want = {w: (n, s / n) for w, (n, s) in acc.items()}
    sf = _write_events(spark, rows)
    got = {
        r["window_start_s"]: (r["n_events"], r["avg_value"])
        for r in r8b_sliding(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_r8c_sessions_matches_bruteforce(spark, user_times, seed):
    from orc_spark.plans.relational import r8c_sessions

    rng = np.random.default_rng(seed)
    rows = _mk_rows(user_times, _quarter_vals(rng))
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["ts_us"], r["value"])
        )
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        sid = 0
        prev = None
        for t, v in evs:
            if prev is not None and t - prev >= GAP_US:
                sid += 1
            key = (u, sid)
            if key not in want:
                want[key] = [t // 1_000_000, 0, 0.0]
            want[key][1] += 1
            want[key][2] += v
            prev = t
    want = {k: tuple(v) for k, v in want.items()}
    sf = _write_events(spark, rows)
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start_s"], r["n_events"], r["sum_value"]
        )
        for r in r8c_sessions(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_tr_hier_rollup_matches_bruteforce(spark, user_times, seed):
    from orc_spark.plans.rollup_q import tr_hier_rollup

    rng = np.random.default_rng(seed)
    rows = _mk_rows(user_times, _quarter_vals(rng))
    want = {}
    for r in rows:
        us = r["ts_us"]
        buckets = {
            "minute_s": (us // 60_000_000) * 60,
            "hour_s": (us // 3_600_000_000) * 3600,
            "day_s": (us // 86_400_000_000) * 86400,
        }
        for which in ("minute_s", "hour_s", "day_s"):
            key = (
                r["event_type"],
                buckets["minute_s"] if which == "minute_s" else None,
                buckets["hour_s"] if which == "hour_s" else None,
                buckets["day_s"] if which == "day_s" else None,
            )
            if key not in want:
                want[key] = [0, 0.0, r["value"], r["value"]]
            a = want[key]
            a[0] += 1
            a[1] += r["value"]
            a[2] = min(a[2], r["value"])
            a[3] = max(a[3], r["value"])
    want = {k: tuple(v) for k, v in want.items()}
    sf = _write_events(spark, rows)
    got = {
        (r["event_type"], r["minute_s"], r["hour_s"], r["day_s"]): (
            r["n_events"], r["sum_value"], r["min_value"], r["max_value"]
        )
        for r in tr_hier_rollup(spark, sf).collect()
    }
    assert got == want


def _r9(v):
    """round-half-up to 9 dp on the shortest decimal repr — Spark round()."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(v)).quantize(Decimal("1e-9"), ROUND_HALF_UP))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_ts_resample_matches_bruteforce(spark, user_times, seed):
    """Grid/interp edge cases the SQL oracle structurally shares: span
    shorter than one step (no grid rows), grid-aligned samples (exact hit
    interpolates to itself via the prev side), the last grid point when the
    max sample is grid-aligned (t_next is NULL -> NULL, both engines)."""
    import math

    from orc_spark.plans.rollup_q import GRID_STEP_S, ts_resample

    rng = np.random.default_rng(seed)

    def extra(ui, eid, t):
        return {"value": float(rng.integers(-5000, 5000)) / 100.0}

    rows = _mk_rows(user_times, extra)
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["ts_us"] // 1_000_000, r["value"])
        )
    step = GRID_STEP_S
    want = {}
    for u, samples in per_user.items():
        # one sample per instant is NOT guaranteed (distinct ts_us can
        # floor to the same second). The window order (t_s, is_grid,
        # event_id) makes the PRECEDING frame's last sample in a second the
        # max-event_id one, but the FOLLOWING frame's first sample the
        # min-event_id one — keep both.
        by_t_last = {}
        by_t_first = {}
        for t, v in samples:  # rows are emitted in event_id order
            by_t_last[t] = v
            by_t_first.setdefault(t, v)
        ts = sorted(by_t_last)
        t0 = int(math.ceil(min(ts) / step) * step)
        t1 = int(math.floor(max(ts) / step) * step)
        for g in range(t0, t1 + 1, step):
            prevs = [t for t in ts if t <= g]
            nexts = [t for t in ts if t > g]
            tp = max(prevs)  # t0 >= min sample time, so prevs is never empty
            vp = by_t_last[tp]
            if not nexts:
                want[(u, g)] = None
                continue
            tn = min(nexts)
            vn = by_t_first[tn]
            frac = 0.0 if tn == tp else (g - tp) / (tn - tp)
            want[(u, g)] = _r9(vp + frac * (vn - vp))
    sf = _write_events(spark, rows)
    got = {
        (r["user_id"], r["t_s"]): r["value_interp"]
        for r in ts_resample(spark, sf).collect()
    }
    assert got == want


# --- relational/dedup replays (r11, continued): range join, salted agg,
# exact dedup — brute-force Python on synthetic parquet, independent of the
# SQL oracles (which share each query's algebraic structure).

def _write_orders_lineitem(spark, orders, items):
    """orders: list of (o_orderkey, day_offset, priority); items: list of
    (l_orderkey, ship_day_offset, price_quarters). Dates are real
    timestamps off a fixed base; prices are quarter-units so sums compare
    exactly."""
    import datetime as dt

    base = dt.datetime(1995, 1, 1)
    d = tempfile.mkdtemp(prefix="orc_props_rj_")
    opdf = pd.DataFrame(
        {
            "o_orderkey": [ok for ok, _, _ in orders],
            "o_custkey": [1] * len(orders),
            "o_orderstatus": ["O"] * len(orders),
            "o_totalprice": [100.0] * len(orders),
            "o_orderdate": [base + dt.timedelta(days=od) for _, od, _ in orders],
            "o_orderpriority": [p for _, _, p in orders],
        }
    )
    lpdf = pd.DataFrame(
        {
            "l_orderkey": [ok for ok, _, _ in items],
            "l_partkey": [1] * len(items),
            "l_suppkey": [1] * len(items),
            "l_linenumber": list(range(1, len(items) + 1)),
            "l_quantity": [1.0] * len(items),
            "l_extendedprice": [q / 4.0 for _, _, q in items],
            "l_discount": [0.0] * len(items),
            "l_tax": [0.0] * len(items),
            "l_returnflag": ["N"] * len(items),
            "l_linestatus": ["O"] * len(items),
            "l_shipdate": [base + dt.timedelta(days=sd) for _, sd, _ in items],
        }
    )
    oschema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    lschema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    )
    # explicit schemas: an all-empty items list cannot infer one
    spark.createDataFrame(opdf, oschema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(lpdf, lschema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "lineitem.parquet"))
    return d


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    spec=st.lists(
        st.tuples(
            st.integers(0, 60),                # order day offset
            st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
            st.lists(                          # per-order items
                st.tuples(st.integers(-5, 45), st.integers(1, 400)),
                min_size=0,
                max_size=5,
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_rj_range_join_matches_bruteforce(spark, spec):
    """Equi+range join boundary semantics: shipdate >= orderdate (same-day
    INCLUDED) and shipdate < orderdate + 30 days (day-30 EXCLUDED) — the
    two off-by-one edges a range join gets wrong first."""
    from orc_spark.plans.relational2 import rj_range_join

    orders = [(i + 1, od, pr) for i, (od, pr, _) in enumerate(spec)]
    items = [
        (i + 1, od + rel, q)
        for i, (od, _, its) in enumerate(spec)
        for rel, q in its
    ]
    sf = _write_orders_lineitem(spark, orders, items)
    want = {}
    for od, pr, its in spec:
        for rel, q in its:
            if 0 <= rel < 30:  # ship in [orderdate, orderdate+30d)
                n, s = want.get(pr, (0, 0.0))
                want[pr] = (n + 1, s + q / 4.0)
    got = {
        r["o_orderpriority"]: (r["n_fast_items"], r["fast_revenue"])
        for r in rj_range_join(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.integers(1, 200),   # quantity quarters
            st.integers(1, 4000),  # price quarters
        ),
        min_size=1,
        max_size=40,
    )
)
def test_sk_salted_agg_matches_bruteforce(spark, rows):
    """The salted two-phase aggregation must be EXACTLY a plain groupBy:
    count/sum/min/max re-derived in Python over the same rows. This is the
    semantic contract that makes the skew-mitigation shape safe to swap in
    for any hot-key aggregate."""
    from orc_spark.plans.curation_q import sk_salted_agg

    d = tempfile.mkdtemp(prefix="orc_props_salt_")
    pdf = pd.DataFrame(
        {
            "l_orderkey": range(1, len(rows) + 1),
            "l_partkey": [1] * len(rows),
            "l_suppkey": [1] * len(rows),
            "l_linenumber": [1] * len(rows),
            "l_quantity": [q / 4.0 for _, q, _ in rows],
            "l_extendedprice": [p / 4.0 for _, _, p in rows],
            "l_discount": [0.0] * len(rows),
            "l_tax": [0.0] * len(rows),
            "l_returnflag": [f for f, _, _ in rows],
            "l_linestatus": ["O"] * len(rows),
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "lineitem.parquet")
    )
    want = {}
    for f, q, p in rows:
        n, sq, mn, mx = want.get(f, (0, 0.0, float("inf"), float("-inf")))
        want[f] = (n + 1, sq + q / 4.0, min(mn, p / 4.0), max(mx, p / 4.0))
    got = {
        r["l_returnflag"]: (
            r["n_rows"], r["sum_qty"], r["min_price"], r["max_price"]
        )
        for r in sk_salted_agg(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet="abcd ",
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_dd_exact_matches_bruteforce(spark, texts):
    """Exact dedup: group identity is the TEXT itself (brute force groups
    on the raw string, not any hash), representative = min doc_id, so a
    digest collision or a normalization bug in the query would diverge."""
    from orc_spark.plans.dedup_q import dd_exact

    sf = _write_documents(spark, [("en", t) for t in texts])
    want = {}
    for i, t in enumerate(texts):
        rep, n = want.get(t, (i, 0))
        want[t] = (min(rep, i), n + 1)
    got = {
        r["digest"]: (r["rep_doc_id"], r["n_copies"])
        for r in dd_exact(spark, sf).collect()
    }
    import hashlib

    want_by_digest = {
        hashlib.md5(t.encode()).hexdigest(): v for t, v in want.items()
    }
    assert got == want_by_digest


def _write_documents_nchars(spark, rows):
    """Write (doc_id, text, n_chars) with the n_chars COLUMN independent of
    len(text) — dd_keepbest's keep policy orders by the stored column, and
    only a disagreeing column exercises the longest-wins branch on
    identical texts."""
    d = tempfile.mkdtemp(prefix="orc_docs_nc_")
    pdf = pd.DataFrame(
        {
            "doc_id": [i for i, _, _ in rows],
            "text": [t for _, t, _ in rows],
            "lang": ["en"] * len(rows),
            "source": ["synthetic"] * len(rows),
            "n_chars": [n for _, _, n in rows],
        }
    )
    spark.createDataFrame(
        pdf, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["alpha", "beta", "gamma"]),  # few texts -> dup groups
            st.integers(0, 50),                           # stored n_chars
        ),
        min_size=1,
        max_size=12,
    )
)
def test_dd_keepbest_matches_bruteforce(spark, rows):
    """Keep policy: per content group keep the doc with the LARGEST stored
    n_chars, ties broken by smallest doc_id — both orderings exercised by
    duplicate texts with disagreeing n_chars."""
    from orc_spark.plans.curation_q import dd_keepbest

    docs = [(i, t, n) for i, (t, n) in enumerate(rows)]
    sf = _write_documents_nchars(spark, docs)
    best = {}
    counts = {}
    for i, t, n in docs:
        counts[t] = counts.get(t, 0) + 1
        cur = best.get(t)
        # larger n_chars wins; equal n_chars -> smaller doc_id wins
        if cur is None or (n, -i) > (cur[1], -cur[0]):
            best[t] = (i, n)
    import hashlib

    want = {
        hashlib.md5(t.encode()).hexdigest(): (kept, counts[t])
        for t, (kept, _) in best.items()
    }
    got = {
        r["digest"]: (r["kept_doc_id"], r["n_copies"])
        for r in dd_keepbest(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab \t", min_size=0, max_size=20),
        min_size=1,
        max_size=10,
    )
)
def test_tx_fingerprint_matches_bruteforce(spark, texts):
    """Whitespace normalization + 5-token prefix + h60, all re-derived in
    plain Python (hashing.h60_py is the same md5-prefix hash)."""
    import re as _re

    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.text_q import tx_fingerprint

    sf = _write_documents(spark, [("en", t) for t in texts])
    want = {}
    for i, t in enumerate(texts):
        norm = _re.sub(r"\s+", " ", t.lower()).strip()
        prefix = " ".join(norm.split(" ")[:5])
        want[i] = (h60_py(norm), h60_py(prefix))
    got = {
        r["doc_id"]: (r["fingerprint"], r["prefix_fp"])
        for r in tx_fingerprint(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base_keys=st.lists(st.integers(1, 12), min_size=0, max_size=8, unique=True),
    chg_spec=st.lists(
        st.tuples(st.integers(1, 15), st.integers(1, 8)),  # (custkey, n_orders)
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    seed=st.integers(0, 2**31 - 1),
)
def test_cdc_merge_matches_bruteforce(spark, base_keys, chg_spec, seed):
    """MERGE INTO semantics: keep base rows with no change row, upsert
    op='u' (including keys NOT in the base — the insert path), drop
    op='d' (n_orders % 7 == 0) even when the base had the key. Balances in
    integer cents so the comparison is exact."""
    import datetime as dt

    from orc_spark.plans.cdc_q import cdc_merge

    rng = np.random.default_rng(seed)
    d = tempfile.mkdtemp(prefix="orc_props_cdc_")
    cust = pd.DataFrame(
        {
            "c_custkey": base_keys,
            "c_name": [f"c{k}" for k in base_keys],
            "c_nationkey": [1] * len(base_keys),
            "c_acctbal": [float(rng.integers(0, 40000)) / 4.0 for _ in base_keys],
            "c_mktsegment": ["BUILDING"] * len(base_keys),
        }
    )
    orows = []
    base_date = dt.datetime(1995, 1, 1)
    okey = 1
    for ck, n in chg_spec:
        for _ in range(n):
            orows.append(
                {
                    "o_orderkey": okey,
                    "o_custkey": ck,
                    "o_orderstatus": "O",
                    "o_totalprice": float(rng.integers(1, 40000)) / 4.0,
                    "o_orderdate": base_date,
                    "o_orderpriority": "3-MEDIUM",
                }
            )
            okey += 1
    ordf = pd.DataFrame(
        orows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        ordf,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))

    # brute force merge
    bal = {r["c_custkey"]: int(round(r["c_acctbal"] * 100)) for _, r in cust.iterrows()}
    chg = {}
    for _, r in ordf.iterrows():
        ck = r["o_custkey"]
        cents, n = chg.get(ck, (0, 0))
        chg[ck] = (cents + int(round(r["o_totalprice"] * 100)), n + 1)
    want = {}
    for ck, cents in bal.items():
        if ck not in chg:
            want[ck] = (cents, 0, "base")
    for ck, (cents, n) in chg.items():
        if n % 7 != 0:  # op 'u' upserts/inserts; op 'd' deletes
            want[ck] = (cents, n, "chg")
    got = {
        r["c_custkey"]: (r["acctbal_cents"], r["ver"], r["src"])
        for r in cdc_merge(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["O", "F", "P"]),
            st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
            st.integers(1, 4000),  # price quarters
        ),
        min_size=1,
        max_size=25,
    )
)
def test_r4b_cube_matches_bruteforce(spark, rows):
    """CUBE semantics: all four grouping sets, the NULL placeholder rows,
    and grouping_id encoding (status bit 2, priority bit 1) — re-derived by
    enumerating the lattice in plain Python."""
    import datetime as dt

    from orc_spark.plans.relational2 import r4b_cube

    d = tempfile.mkdtemp(prefix="orc_props_cube_")
    pdf = pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [1] * len(rows),
            "o_orderstatus": [s for s, _, _ in rows],
            "o_totalprice": [q / 4.0 for _, _, q in rows],
            "o_orderdate": [dt.datetime(1995, 1, 1)] * len(rows),
            "o_orderpriority": [p for _, p, _ in rows],
        }
    )
    spark.createDataFrame(
        pdf,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    want = {}
    for s, p, q in rows:
        for key, gid in (
            ((s, p), 0),
            ((s, None), 1),
            ((None, p), 2),
            ((None, None), 3),
        ):
            n, rev = want.get((key, gid), (0, 0.0))
            want[(key, gid)] = (n + 1, rev + q / 4.0)
    got = {
        ((r["o_orderstatus"], r["o_orderpriority"]), r["gid"]): (
            r["n_orders"], r["revenue"]
        )
        for r in r4b_cube(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    quarters=st.lists(
        st.tuples(st.integers(-400, 400), st.booleans()),  # (value, null?)
        min_size=2,
        max_size=30,
    )
)
def test_dp_profile_matches_bruteforce(spark, quarters):
    """Per-column profile vs plain Python: counts/distinct/min/max/mean
    exact (quarter-unit values make sums binary-exact); stddev compared at
    1e-12 relative — Spark's var_samp uses incremental central moments, not
    the textbook sum-of-squares, so the last ulp can differ legitimately."""
    import math

    from orc_spark.plans.profile_q import NUM_COLS, dp_profile

    d = tempfile.mkdtemp(prefix="orc_props_prof_")
    vals = [None if isnull else q / 4.0 for q, isnull in quarters]
    n = len(vals)
    pdf = pd.DataFrame(
        {
            "l_orderkey": range(1, n + 1),
            "l_partkey": [1] * n,
            "l_suppkey": [1] * n,
            "l_linenumber": [1] * n,
            # all four profiled columns share the same value list: one
            # brute-force check covers every column's pipeline
            "l_quantity": vals,
            "l_extendedprice": vals,
            "l_discount": vals,
            "l_tax": vals,
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
        }
    )
    spark.createDataFrame(
        pdf,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))

    nn = [v for v in vals if v is not None]
    mean = sum(nn) / len(nn) if nn else None
    if len(nn) >= 2:
        var = sum((v - mean) ** 2 for v in nn) / (len(nn) - 1)
        std = math.sqrt(var)
    else:
        std = None
    got = {r["column"]: r for r in dp_profile(spark, d).collect()}
    assert set(got) == set(NUM_COLS)
    for c in NUM_COLS:
        r = got[c]
        assert r["n_rows"] == n
        assert r["n_nonnull"] == len(nn)
        assert r["n_distinct"] == len(set(nn))
        assert r["min_val"] == (min(nn) if nn else None)
        assert r["max_val"] == (max(nn) if nn else None)
        if nn:
            assert r["mean"] == mean  # exact: quarter units sum exactly
        else:
            assert r["mean"] is None
        if std is None:
            assert r["std"] is None or r["std"] != r["std"]
        else:
            assert math.isclose(r["std"], std, rel_tol=1e-12, abs_tol=1e-15)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abcdef 01", min_size=0, max_size=24),
        min_size=1,
        max_size=9,
    )
)
def test_mm_frame_sample_matches_bruteforce(spark, texts):
    """The multimodal frame-sampling PLUMBING (kind routing by doc_id % 3,
    synthesized duration, 1 s frame grid, stride-7919 payload slice, hex
    digest) re-derived byte-for-byte in plain Python — the declared-stub
    decode means the grid/slice/digest pipeline IS the operator surface."""
    import hashlib

    from orc_spark.plans.mm_q import mm_frame_sample

    sf = _write_documents(spark, [("en", t) for t in texts])
    want = {}
    for i, t in enumerate(texts):
        if i % 3 != 2:
            continue  # video kind = doc_id % 3 == 2
        payload = t.encode("utf-8")
        hexstr = payload.hex()
        duration_ms = ((len(t) % 10) + 1) * 1000
        for t_ms in range(0, duration_ms, 1000):
            start = 2 * ((t_ms * 7919) % max(len(payload), 1))
            s = hexstr[start : start + 128]
            digest = hashlib.md5((s if s else "00").encode()).hexdigest()
            want[(i, t_ms // 1000)] = (t_ms, digest)
    got = {
        (r["media_id"], r["frame_idx"]): (r["t_ms"], r["frame_digest"])
        for r in mm_frame_sample(spark, sf).collect()
    }
    assert got == want


# --- O18/O19/O8/O3 firmware-operator replays on the events surface (r11):
# the golden tests pin these operators on the real 129k log; these replays
# additionally pin the REGISTRY queries (events-table surface, per-user
# ordinal series) against plain-Python re-derivations on random inputs.

def _ts_rows(user_times, rng, types=("view", "click", "error")):
    counters = {}

    def extra(ui, eid, t):
        i = counters.get(ui, 0)
        counters[ui] = i + 1
        return {
            "value": float(rng.integers(-8000, 8000)) / 100.0,
            "event_type": types[int(rng.integers(0, len(types)))],
        }

    return _mk_rows(user_times, extra)


def _series_by_user(rows):
    s = {}
    for r in rows:  # _mk_rows emits per-user rows already (ts, eid)-sorted
        s.setdefault(r["user_id"], []).append(r)
    return s


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_ts_medfilt_matches_bruteforce(spark, user_times, seed):
    """k=15 zero-padded median: sort the window of 15 (zero-filled at the
    series edges), take element 8 — pure selection, so equality is exact."""
    from orc_spark.plans.timeseries_q import ts_medfilt

    rows = _ts_rows(user_times, np.random.default_rng(seed))
    sf = _write_events(spark, rows)
    want = {}
    for u, rs in _series_by_user(rows).items():
        vals = [r["value"] for r in rs]
        for i, r in enumerate(rs):
            win = [
                vals[j] if 0 <= j < len(vals) else 0.0
                for j in range(i - 7, i + 8)
            ]
            want[r["event_id"]] = (r["value"], sorted(win)[7])
    got = {
        r["event_id"]: (r["value"], r["value_medfilt"])
        for r in ts_medfilt(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_ts_gradient_matches_bruteforce(spark, user_times, seed):
    """np.gradient semantics: central difference /2.0 interior, one-sided
    at the edges, 0.0 for a single-point series — identical float ops."""
    from orc_spark.plans.timeseries_q import ts_gradient

    rows = _ts_rows(user_times, np.random.default_rng(seed))
    sf = _write_events(spark, rows)
    want = {}
    for u, rs in _series_by_user(rows).items():
        vals = [r["value"] for r in rs]
        n = len(vals)
        for i, r in enumerate(rs):
            if n == 1:
                g = 0.0
            elif i == 0:
                g = vals[1] - vals[0]
            elif i == n - 1:
                g = vals[-1] - vals[-2]
            else:
                g = (vals[i + 1] - vals[i - 1]) / 2.0
            want[r["event_id"]] = g
    got = {r["event_id"]: r["value_grad"] for r in ts_gradient(spark, sf).collect()}
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_ts_deadband_peakreject_locf_match_bruteforce(spark, user_times, seed):
    """Three per-row/LOCF operators in one fixture: deadband (±1.0 floor
    subtraction), peak rejection (|v| >= 18 replaced by last kept value,
    NULL before any kept), and LOCF over gapped 'error' events."""
    from orc_spark.plans.timeseries_q import ts_deadband, ts_locf, ts_peak_reject

    rows = _ts_rows(user_times, np.random.default_rng(seed))
    sf = _write_events(spark, rows)

    want_db = {}
    for r in rows:
        v = r["value"]
        want_db[r["event_id"]] = (
            v - 1.0 if v > 1.0 else (v + 1.0 if v < -1.0 else 0.0)
        )
    got_db = {r["event_id"]: r["value_db"] for r in ts_deadband(spark, sf).collect()}
    assert got_db == want_db

    want_pr = {}
    want_locf = {}
    for u, rs in _series_by_user(rows).items():
        last_kept = None
        last_seen = None
        for r in rs:
            v = r["value"]
            if abs(v) < 18:
                last_kept = v
            want_pr[r["event_id"]] = last_kept
            if r["event_type"] != "error":
                last_seen = v
                want_locf[r["event_id"]] = (v, last_seen)
            else:
                want_locf[r["event_id"]] = (None, last_seen)
    got_pr = {
        r["event_id"]: r["value_pr"] for r in ts_peak_reject(spark, sf).collect()
    }
    assert got_pr == want_pr
    got_locf = {
        r["event_id"]: (r["value_gapped"], r["value_locf"])
        for r in ts_locf(spark, sf).collect()
    }
    assert got_locf == want_locf


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_ts_zero_cal_matches_bruteforce(spark, user_times, seed):
    """Baseline = mean of the first 50 ordinals (all of them at test
    sizes), subtracted per user. Quarter-unit values make the sum — and
    hence the mean and the centered values — binary-exact."""
    from orc_spark.plans.timeseries_q import ts_zero_cal

    rng = np.random.default_rng(seed)
    counters = {}

    def extra(ui, eid, t):
        i = counters.get(ui, 0)
        counters[ui] = i + 1
        return {"value": float(rng.integers(-4000, 4000)) / 4.0}

    rows = _mk_rows(user_times, extra)
    sf = _write_events(spark, rows)
    want = {}
    for u, rs in _series_by_user(rows).items():
        vals = [r["value"] for r in rs]
        baseline = sum(vals[:50]) / len(vals[:50])
        for r in rs:
            want[r["event_id"]] = r["value"] - baseline
    got = {
        r["event_id"]: r["value_centered"]
        for r in ts_zero_cal(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=2),
    seed=st.integers(0, 2**31 - 1),
)
def test_ts_transform_matches_bruteforce(spark, user_times, seed):
    """3-DoF -> 4-corner mix (Transform.c semantics): the exact float
    expression (left-assoc mix + 32768.0), clamp to [0, 65535], floor —
    re-derived with the same Python doubles the engine folds in."""
    from orc_spark.operators.control import A_2AB, B_2AB, INV_2AB, INV_2CD
    from orc_spark.plans.timeseries_q import ts_transform

    rng = np.random.default_rng(seed)

    def extra(ui, eid, t):
        return {"value": float(rng.integers(-6000, 6000)) / 100.0}

    rows = _mk_rows(user_times, extra)
    sf = _write_events(spark, rows)
    want = {}
    for r in rows:
        v = r["value"]
        z, th, ph = v * 1000, v * 500, v * 250
        acts = (
            B_2AB * z - INV_2AB * th + INV_2CD * ph + 32768.0,
            B_2AB * z - INV_2AB * th - INV_2CD * ph + 32768.0,
            A_2AB * z + INV_2AB * th + INV_2CD * ph + 32768.0,
            A_2AB * z + INV_2AB * th - INV_2CD * ph + 32768.0,
        )
        import math

        want[r["event_id"]] = tuple(
            int(math.floor(min(max(a, 0.0), 65535.0))) for a in acts
        )
    got = {
        r["event_id"]: (r["act1"], r["act2"], r["act3"], r["act4"])
        for r in ts_transform(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_ts_runstats_matches_bruteforce(spark, user_times, seed):
    """Per-user RMS/min/max over the k=15 zero-pad median-filtered series:
    the filter output is a selection (exact), quarter-unit values make
    sum(f²) binary-exact, so rms = sqrt(exact/n) compares exactly."""
    import math

    from orc_spark.plans.timeseries_q import ts_runstats

    rng = np.random.default_rng(seed)
    counters = {}

    def extra(ui, eid, t):
        i = counters.get(ui, 0)
        counters[ui] = i + 1
        return {"value": float(rng.integers(-400, 400)) / 4.0}

    rows = _mk_rows(user_times, extra)
    sf = _write_events(spark, rows)
    want = {}
    for u, rs in _series_by_user(rows).items():
        vals = [r["value"] for r in rs]
        f = []
        for i in range(len(vals)):
            win = [
                vals[j] if 0 <= j < len(vals) else 0.0
                for j in range(i - 7, i + 8)
            ]
            f.append(sorted(win)[7])
        rms = math.sqrt(sum(x * x for x in f) / len(f))
        want[u] = (rms, min(f), max(f), len(f))
    got = {
        r["user_id"]: (r["rms"], r["min_val"], r["max_val"], r["n_samples"])
        for r in ts_runstats(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab1 .,\t!x9", min_size=0, max_size=25),
        min_size=1,
        max_size=10,
    )
)
def test_tx_tokens_matches_bruteforce(spark, texts):
    """Token counting re-derived with Python re on the same patterns:
    whitespace split (empty -> ['']), alpha runs, digit runs, and the
    BPE-ish subtoken pattern (alpha run | single digit | non-alnum mark)."""
    import re as _re

    from orc_spark.plans.text_q import tx_tokens

    sf = _write_documents(spark, [("en", t) for t in texts])
    want = {}
    for i, t in enumerate(texts):
        want[i] = (
            len(t),
            # trim() in Spark/DuckDB strips SPACES only — not \t — so the
            # brute force must strip(" "), not Python's all-whitespace strip
            len(_re.split(r"\s+", t.strip(" "))),
            len(_re.findall(r"[a-z]+", t)),
            len(_re.findall(r"[0-9]+", t)),
            len(_re.findall(r"[a-z]+|[0-9]|[^a-z0-9\s]", t)),
        )
    got = {
        r["doc_id"]: (
            r["n_chars_calc"], r["n_tokens"], r["n_alpha_words"],
            r["n_numbers"], r["n_subtokens"],
        )
        for r in tx_tokens(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(
                ["the", "and", "of", "to", "xylophone", "qwerty", "data",
                 "中", "engine", "in", "is"]
            ),
            min_size=1,
            max_size=20,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_tx_langid_matches_bruteforce(spark, docs):
    """Stopword-density language heuristic: ratio, round-6, threshold
    bands, and the CJK override — recomputed from the same STOPWORDS list."""
    from orc_spark.plans.text_q import STOPWORDS, tx_langid

    texts = [" ".join(words) for words in docs]
    sf = _write_documents(spark, [("en", t) for t in texts])
    sw = set(STOPWORDS)
    want = {}
    for i, words in enumerate(docs):
        toks = [w.lower() for w in words]  # join/split round-trips the words
        ratio = sum(1 for w in toks if w in sw) / len(toks)
        has_cjk = any("一" <= c <= "鿿" for c in texts[i])
        pred = (
            "zh" if has_cjk
            else "en" if ratio >= 0.08
            else "en_maybe" if ratio >= 0.02
            else "unk"
        )
        want[i] = (_r6(ratio), pred)
    got = {
        r["doc_id"]: (r["stop_ratio"], r["pred_lang"])
        for r in tx_langid(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(
                ["plain", "a@b.co", "x@y.org", "https://e.com/p", "http://q.io",
                 "1234567", "123456789", "12345", "a@b", "https://",
                 "tail"]
            ),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_tx_redact_matches_bruteforce(spark, docs):
    """PII redaction: match counts and the digest of the REPLACED text,
    re-derived with Python re.sub/findall on the identical patterns —
    including the order of the three passes (emails, then URLs, then long
    numbers) which changes the result when patterns overlap."""
    import hashlib
    import re as _re

    from orc_spark.plans.curation_q import EMAIL, LONGNUM, URL, tx_redact

    texts = [" ".join(words) for words in docs]
    sf = _write_documents(spark, [("en", t) for t in texts])
    want = {}
    for i, t in enumerate(texts):
        red = _re.sub(EMAIL, "<EMAIL>", t)
        red = _re.sub(URL, "<URL>", red)
        red = _re.sub(LONGNUM, "<NUM>", red)
        want[i] = (
            len(_re.findall(EMAIL, t)),
            len(_re.findall(URL, t)),
            len(_re.findall(LONGNUM, t)),
            len(red),
            hashlib.md5(red.encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (
            r["n_emails"], r["n_urls"], r["n_longnums"],
            r["redacted_len"], r["redacted_digest"],
        )
        for r in tx_redact(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abcAB ", min_size=0, max_size=18),
        min_size=1,
        max_size=8,
    )
)
def test_dd_minhash_sig_matches_bruteforce(spark, texts):
    """Full MinHash signature re-derived in plain Python: 5-char shingles
    of the lowercased text (short docs yield their whole text as the one
    shingle), h60, and all 16 affine permutations mod 2^31-1 — exact
    integer equality on every signature slot."""
    from orc_spark.functions.hashing import MERSENNE_P, MINHASH_PERMS, h60_py
    from orc_spark.plans.dedup_q import SHINGLE_K, dd_minhash_sig

    sf = _write_documents(spark, [("en", t) for t in texts])
    want = {}
    for i, t in enumerate(texts):
        lt = t.lower()
        n_pos = max(len(lt) - (SHINGLE_K - 1), 1)
        hs = {h60_py(lt[p : p + SHINGLE_K]) for p in range(n_pos)}
        want[i] = tuple(
            min((a * (h % MERSENNE_P) + b) % MERSENNE_P for h in hs)
            for a, b in MINHASH_PERMS
        )
    got = {
        r["doc_id"]: tuple(r[f"m{j}"] for j in range(len(MINHASH_PERMS)))
        for r in dd_minhash_sig(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="the and of data xq.,!: ", min_size=1, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_tx_quality_matches_bruteforce(spark, texts):
    """Quality ratios + composite score re-derived in Python with the same
    single-division float expressions (trim = spaces only, like the
    engines)."""
    import re as _re

    from orc_spark.plans.text_q import STOPWORDS, tx_quality

    sf = _write_documents(spark, [("en", t) for t in texts])
    sw = set(STOPWORDS)
    want = {}
    for i, t in enumerate(texts):
        n_chars = float(len(t))
        toks = _re.split(r"\s+", t.strip(" "))
        n_toks = float(len(toks))
        n_stop = float(sum(1 for x in toks if x in sw))
        n_punct = float(len(_re.findall(r"[.,!?;:]", t)))
        n_space = float(t.count(" "))
        mean_tok_len = (n_chars - n_space) / n_toks
        stop_ratio = n_stop / n_toks
        punct_ratio = n_punct / n_chars if n_chars else None
        score = (
            min(n_toks / 100.0, 1.0) * 0.4
            + min(stop_ratio * 5.0, 1.0) * 0.4
            + (0.2 if 3.0 <= mean_tok_len <= 10.0 else 0.0)
        )
        want[i] = (
            _r6(mean_tok_len),
            _r6(stop_ratio),
            _r6(punct_ratio) if punct_ratio is not None else None,
            _r6(score),
        )
    got = {
        r["doc_id"]: (
            r["mean_tok_len"], r["stop_ratio"], r["punct_ratio"],
            r["quality_score"],
        )
        for r in tx_quality(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.sampled_from(["O", "F"]),
            st.integers(1, 200),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_r_pivot_matches_bruteforce(spark, rows):
    """Pivot = conditional aggregation: per returnflag, qty sums split by
    linestatus columns, NULL where a cell has no rows."""
    from orc_spark.plans.relational2 import r_pivot

    d = tempfile.mkdtemp(prefix="orc_props_piv_")
    pdf = pd.DataFrame(
        {
            "l_orderkey": range(1, len(rows) + 1),
            "l_partkey": [1] * len(rows),
            "l_suppkey": [1] * len(rows),
            "l_linenumber": [1] * len(rows),
            "l_quantity": [q / 4.0 for _, _, q in rows],
            "l_extendedprice": [1.0] * len(rows),
            "l_discount": [0.0] * len(rows),
            "l_tax": [0.0] * len(rows),
            "l_returnflag": [f for f, _, _ in rows],
            "l_linestatus": [s for _, s, _ in rows],
        }
    )
    spark.createDataFrame(
        pdf,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    cells = {}
    for f, s, q in rows:
        cells[(f, s)] = cells.get((f, s), 0.0) + q / 4.0
    want = {
        f: (cells.get((f, "O")), cells.get((f, "F")))
        for f in {f for f, _, _ in rows}
    }
    got = {
        r["l_returnflag"]: (r["qty_open"], r["qty_filled"])
        for r in r_pivot(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=1, max_size=3),
    seed=st.integers(0, 2**31 - 1),
)
def test_ts_groupmeans_matches_bruteforce(spark, user_times, seed):
    """Group means over per-(user, type) runs: medfilt (exact selection) ->
    RMS (exact on quarter units) -> avg over runs. The final averages sum
    IRRATIONAL rms doubles whose accumulation order Spark doesn't fix, so
    they compare at 1e-12 relative; counts compare exactly."""
    import math

    from orc_spark.plans.timeseries_q import ts_groupmeans

    rng = np.random.default_rng(seed)
    types = ("view", "click")
    counters = {}

    def extra(ui, eid, t):
        i = counters.get(ui, 0)
        counters[ui] = i + 1
        return {
            "value": float(rng.integers(-400, 400)) / 4.0,
            "event_type": types[int(rng.integers(0, 2))],
        }

    rows = _mk_rows(user_times, extra)
    sf = _write_events(spark, rows)
    runs = {}
    for r in rows:  # per (user, type) series in (ts, eid) order
        runs.setdefault((r["user_id"], r["event_type"]), []).append(r["value"])
    per_type = {}
    for (u, ty), vals in runs.items():
        f = []
        for i in range(len(vals)):
            win = [
                vals[j] if 0 <= j < len(vals) else 0.0
                for j in range(i - 7, i + 8)
            ]
            f.append(sorted(win)[7])
        rms = math.sqrt(sum(x * x for x in f) / len(f))
        per_type.setdefault(ty, []).append((rms, min(f), max(f)))
    want = {
        ty: (
            sum(r for r, _, _ in rs) / len(rs),
            sum(m for _, m, _ in rs) / len(rs),
            sum(m for _, _, m in rs) / len(rs),
            len(rs),
        )
        for ty, rs in per_type.items()
    }
    got = {
        r["event_type"]: (r["avg_rms"], r["avg_min"], r["avg_max"], r["n_runs"])
        for r in ts_groupmeans(spark, sf).collect()
    }
    assert set(got) == set(want)
    for ty, (arms, amin, amax, n) in want.items():
        g = got[ty]
        assert g[3] == n
        assert math.isclose(g[0], arms, rel_tol=1e-12)
        assert math.isclose(g[1], amin, rel_tol=1e-12)
        assert math.isclose(g[2], amax, rel_tol=1e-12)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(
        st.lists(st.integers(-8, 8), min_size=4, max_size=4).filter(
            lambda v: any(x != 0 for x in v)
        ),
        min_size=2,
        max_size=10,
    ),
    dup_of=st.integers(0, 9),
)
def test_dd_embcos_matches_bruteforce(spark, base, dup_of):
    """Exact all-pairs cosine near-dup vs a plain numpy loop: normalize,
    dot, round-6, threshold. A planted duplicate of one base vector
    guarantees at least one pair above the threshold every run."""
    import numpy as np

    from orc_spark.plans.dedup_q import COS_THRESHOLD, dd_embcos

    vecs = [list(map(float, v)) for v in base]
    vecs.append(list(vecs[dup_of % len(base)]))  # exact dup -> cos 1.0
    d = tempfile.mkdtemp(prefix="orc_props_emb_")
    pdf = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    spark.createDataFrame(pdf, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    m = np.asarray(vecs, dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    want = {}
    for a in range(len(vecs)):
        for b in range(a + 1, len(vecs)):
            c = round(float(m[a] @ m[b]), 6)
            if c >= COS_THRESHOLD:
                want[(a, b)] = c
    got = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in dd_embcos(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.integers(-8, 8), min_size=3, max_size=3).filter(
            lambda v: any(x != 0 for x in v)
        ),
        min_size=2,
        max_size=20,
    )
)
def test_ann_bruteforce_fast_matches_bruteforce(spark, vecs):
    """The production streamed-matmul top-k (query set pushed down and
    bounded) vs a plain numpy ranking with the same round-6 + (cos desc,
    id asc) order, including the rank column."""
    import numpy as np

    from orc_spark.plans.mm_q import ANN_FAST_K, ANN_N_Q, ann_bruteforce_fast

    d = tempfile.mkdtemp(prefix="orc_props_annf_")
    fl = [list(map(float, v)) for v in vecs]
    pdf = pd.DataFrame({"vec_id": range(len(fl)), "embedding": fl})
    spark.createDataFrame(pdf, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    m = np.asarray(fl, dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    want = {}
    for q in range(min(ANN_N_Q, len(fl))):
        sims = {i: round(float(m[q] @ m[i]), 6) for i in range(len(fl)) if i != q}
        order = sorted(sims, key=lambda i: (-sims[i], i))
        for rank, i in enumerate(order[:ANN_FAST_K], 1):
            want[(q, i)] = (sims[i], rank)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cos_sim"], r["rank"])
        for r in ann_bruteforce_fast(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=15),
        min_size=2,
        max_size=8,
    ),
    dup_of=st.integers(0, 7),
)
def test_dd_minhash_pairs_matches_bruteforce(spark, texts, dup_of):
    """Banded LSH candidates + signature-match estimate, re-derived from
    raw text: shingles -> h60 -> 16 perms -> 4 bands of 4 -> pairs sharing
    any band -> est = matching slots / 16. A planted exact duplicate
    guarantees candidates."""
    from orc_spark.functions.hashing import MERSENNE_P, MINHASH_PERMS, h60_py
    from orc_spark.plans.dedup_q import (
        N_BANDS,
        N_PERM,
        ROWS_PER_BAND,
        SHINGLE_K,
        dd_minhash_pairs,
    )

    texts = list(texts) + [texts[dup_of % len(texts)]]
    sf = _write_documents(spark, [("en", t) for t in texts])
    sigs = {}
    for i, t in enumerate(texts):
        lt = t.lower()
        n_pos = max(len(lt) - (SHINGLE_K - 1), 1)
        hs = {h60_py(lt[p : p + SHINGLE_K]) for p in range(n_pos)}
        sigs[i] = [
            min((a * (h % MERSENNE_P) + b) % MERSENNE_P for h in hs)
            for a, b in MINHASH_PERMS
        ]
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = sigs[a], sigs[b]
            shared_band = any(
                sa[k * ROWS_PER_BAND : (k + 1) * ROWS_PER_BAND]
                == sb[k * ROWS_PER_BAND : (k + 1) * ROWS_PER_BAND]
                for k in range(N_BANDS)
            )
            if shared_band:
                est = sum(1 for i in range(N_PERM) if sa[i] == sb[i]) / N_PERM
                want[(a, b)] = est
    got = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dd_minhash_pairs(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    user_times=st.lists(times_strategy, min_size=2, max_size=4),
    seed=st.integers(0, 2**31 - 1),
)
def test_ts_welch_matches_bruteforce(spark, user_times, seed):
    """Welch t + dof re-derived in plain Python: per-(user, type) RMS
    populations (exact on quarter units), textbook sample stats, then the
    IDENTICAL closed-form float expression the operator computes.
    mean/var use sum-based formulas, so tiny ulp drift vs Spark's
    incremental avg/var_samp is absorbed by a 1e-9 relative compare."""
    import math

    from orc_spark.plans.timeseries_q import ts_welch

    rng = np.random.default_rng(seed)
    types = ("click", "view")
    counters = {}

    def extra(ui, eid, t):
        i = counters.get(ui, 0)
        counters[ui] = i + 1
        return {
            "value": float(rng.integers(-400, 400)) / 4.0,
            "event_type": types[int(rng.integers(0, 2))],
        }

    rows = _mk_rows(user_times, extra)
    sf = _write_events(spark, rows)
    pops = {"click": [], "view": []}
    per_run = {}
    for r in rows:
        if r["event_type"] in pops:
            per_run.setdefault((r["user_id"], r["event_type"]), []).append(
                r["value"]
            )
    for (u, ty), vals in per_run.items():
        pops[ty].append(math.sqrt(sum(v * v for v in vals) / len(vals)))
    a, b = pops["click"], pops["view"]
    rows_out = ts_welch(spark, sf).collect()
    if not a or not b:
        assert rows_out == []
        return
    [r] = rows_out

    def stats(xs):
        n = float(len(xs))
        mean = sum(xs) / n
        var = (
            sum((x - mean) ** 2 for x in xs) / (n - 1) if len(xs) >= 2 else None
        )
        return n, mean, var

    n1, m1, v1 = stats(a)
    n2, m2, v2 = stats(b)
    if v1 is None or v2 is None:
        assert r["t_stat"] is None or r["t_stat"] != r["t_stat"]
        return
    q1, q2 = v1 / n1, v2 / n2
    se2 = q1 + q2
    if se2 == 0.0:
        assert r["t_stat"] is None
        assert r["dof"] is None
        return
    t = (m1 - m2) / math.sqrt(se2)
    dof = (se2 * se2) / (q1 * q1 / (n1 - 1) + q2 * q2 / (n2 - 1))
    assert math.isclose(r["t_stat"], t, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(r["dof"], dof, rel_tol=1e-9)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    custs=st.lists(st.integers(1, 10), min_size=1, max_size=8, unique=True),
    orders=st.lists(
        st.tuples(
            st.integers(1, 12),
            st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
        ),
        min_size=0,
        max_size=15,
    ),
)
def test_r10_outer_hist_matches_bruteforce(spark, custs, orders):
    """TPC-H Q13 shape: LEFT join with the priority filter ON THE JOIN
    CONDITION (zero-order customers must appear in the c_count=0 bucket,
    which a WHERE would silently drop) — re-counted in plain Python."""
    import datetime as dt

    from orc_spark.plans.relational3 import r10_outer_hist

    d = tempfile.mkdtemp(prefix="orc_props_hist_")
    cpdf = pd.DataFrame(
        {
            "c_custkey": custs,
            "c_name": [f"c{k}" for k in custs],
            "c_nationkey": [1] * len(custs),
            "c_acctbal": [0.0] * len(custs),
            "c_mktsegment": ["BUILDING"] * len(custs),
        }
    )
    opdf = pd.DataFrame(
        {
            "o_orderkey": range(1, len(orders) + 1),
            "o_custkey": [c for c, _ in orders],
            "o_orderstatus": ["O"] * len(orders),
            "o_totalprice": [1.0] * len(orders),
            "o_orderdate": [dt.datetime(1995, 1, 1)] * len(orders),
            "o_orderpriority": [p for _, p in orders],
        }
    )
    spark.createDataFrame(
        cpdf,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        opdf,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    per_cust = {c: 0 for c in custs}
    for c, p in orders:
        if p != "1-URGENT" and c in per_cust:
            per_cust[c] += 1
    want = {}
    for c, n in per_cust.items():
        want[n] = want.get(n, 0) + 1
    got = {
        r["c_count"]: r["custdist"] for r in r10_outer_hist(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["BUILDING", "MACHINERY"]),
            st.integers(1, 4000),   # price quarters
            st.integers(-2000, 2000),  # acctbal quarters
        ),
        min_size=2,
        max_size=25,
    )
)
def test_r11_stats_agg_matches_bruteforce(spark, rows):
    """The moment-sketch battery re-derived: exact interpolated
    percentiles (rank = p·(n-1) linear interpolation), sample var/std,
    corr composed covar/(sd·sd), and least-squares slope/intercept —
    float stats at 1e-9 relative (Spark accumulates incrementally),
    percentiles and counts exact."""
    import datetime as dt
    import math

    from orc_spark.plans.relational3 import r11_stats_agg

    d = tempfile.mkdtemp(prefix="orc_props_r11_")
    segs = [s for s, _, _ in rows]
    prices = [q / 4.0 for _, q, _ in rows]
    bals = [b / 4.0 for _, _, b in rows]
    cpdf = pd.DataFrame(
        {
            "c_custkey": range(1, len(rows) + 1),
            "c_name": [f"c{i}" for i in range(len(rows))],
            "c_nationkey": [1] * len(rows),
            "c_acctbal": bals,
            "c_mktsegment": segs,
        }
    )
    opdf = pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": range(1, len(rows) + 1),
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": prices,
            "o_orderdate": [dt.datetime(1995, 1, 1)] * len(rows),
            "o_orderpriority": ["3-MEDIUM"] * len(rows),
        }
    )
    spark.createDataFrame(
        cpdf,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        opdf,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))

    def pct(xs, p):
        xs = sorted(xs)
        r = p * (len(xs) - 1)
        lo, hi = int(math.floor(r)), int(math.ceil(r))
        frac = r - lo
        return xs[lo] * (1 - frac) + xs[hi] * frac

    groups = {}
    for s, p, b in zip(segs, prices, bals):
        groups.setdefault(s, []).append((p, b))
    got = {r["c_mktsegment"]: r for r in r11_stats_agg(spark, d).collect()}
    assert set(got) == set(groups)
    for s, pb in groups.items():
        ps = [p for p, _ in pb]
        bs = [b for _, b in pb]
        n = len(ps)
        r = got[s]
        assert r["n"] == n
        assert r["p25_price"] == pct(ps, 0.25)
        assert r["p50_price"] == pct(ps, 0.5)
        assert r["p95_price"] == pct(ps, 0.95)
        mp, mb = sum(ps) / n, sum(bs) / n
        if n >= 2:
            var = sum((x - mp) ** 2 for x in ps) / (n - 1)
            cov = sum((x - mp) * (y - mb) for x, y in zip(ps, bs)) / (n - 1)
            sdp = math.sqrt(var)
            sdb = math.sqrt(sum((y - mb) ** 2 for y in bs) / (n - 1))
            assert math.isclose(r["var_price"], var, rel_tol=1e-9, abs_tol=1e-12)
            assert math.isclose(r["sd_price"], sdp, rel_tol=1e-9, abs_tol=1e-12)
            assert math.isclose(
                r["covar_price_bal"], cov, rel_tol=1e-9, abs_tol=1e-12
            )
            den = sdp * sdb
            if den == 0.0:
                assert r["corr_price_bal"] is None
            else:
                assert math.isclose(
                    r["corr_price_bal"], cov / den, rel_tol=1e-9, abs_tol=1e-9
                )
            sxx = sum((y - mb) ** 2 for y in bs)  # regr x = c_acctbal
            sxy = sum((y - mb) * (x - mp) for x, y in zip(ps, bs))
            if sxx == 0.0:
                assert r["slope"] is None
            else:
                slope = sxy / sxx
                assert math.isclose(r["slope"], slope, rel_tol=1e-9, abs_tol=1e-9)
                assert math.isclose(
                    r["intercept"], mp - slope * mb, rel_tol=1e-9, abs_tol=1e-9
                )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abcdef 01", min_size=0, max_size=24),
        min_size=1,
        max_size=9,
    )
)
def test_mm_audio_windows_matches_bruteforce(spark, texts):
    """Audio-window plumbing (kind doc_id % 3 == 1, 500 ms grid,
    sample-rate-aware n_samples, stride-6151 64-hex-char slice, h60 energy
    proxy) re-derived byte-for-byte in plain Python."""
    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.mm_q import mm_audio_windows

    sf = _write_documents(spark, [("en", t) for t in texts])
    want = {}
    for i, t in enumerate(texts):
        if i % 3 != 1:
            continue
        payload = t.encode("utf-8")
        hexstr = payload.hex()
        duration_ms = ((len(t) % 10) + 1) * 1000
        for t_ms in range(0, duration_ms, 500):
            n_samples = 16000 * min(500, duration_ms - t_ms) // 1000
            start = 2 * ((t_ms * 6151) % max(len(payload), 1))
            s = hexstr[start : start + 64]
            want[(i, t_ms // 500)] = (t_ms, n_samples, h60_py(s if s else "00"))
    rows = mm_audio_windows(spark, sf).collect()
    got = {
        (r["media_id"], r["window_idx"]): (
            r["t_ms"], r["n_samples"], r["energy_h60"]
        )
        for r in rows
    }
    assert got == want


def _write_orders_simple(spark, rows):
    """rows: (o_custkey, price_quarters) -> orders.parquet (okey = idx+1)."""
    import datetime as dt

    d = tempfile.mkdtemp(prefix="orc_props_ord_")
    pdf = pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [c for c, _ in rows],
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [q / 4.0 for _, q in rows],
            "o_orderdate": [dt.datetime(1995, 1, 1)] * len(rows),
            "o_orderpriority": ["3-MEDIUM"] * len(rows),
        }
    )
    spark.createDataFrame(
        pdf,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    return d


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 5), st.integers(1, 4000)),
        min_size=1,
        max_size=25,
    )
)
def test_r5_window_topk_matches_bruteforce(spark, rows):
    """Per-customer top-2 by (price desc, key asc) with the running spend
    along that exact order — re-derived by sorting in Python."""
    from orc_spark.plans.relational import r5_window_topk

    d = _write_orders_simple(spark, rows)
    per_cust = {}
    for i, (c, q) in enumerate(rows):
        per_cust.setdefault(c, []).append((q / 4.0, i + 1))
    want = {}
    for c, lst in per_cust.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        run = 0.0
        for rn, (p, ok) in enumerate(lst, 1):
            run += p
            if rn <= 2:
                want[ok] = (c, p, rn, run)
    got = {
        r["o_orderkey"]: (r["o_custkey"], r["o_totalprice"], r["rn"],
                          r["running_spend"])
        for r in r5_window_topk(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 4), st.integers(1, 12000)),
        min_size=1,
        max_size=25,
    )
)
def test_r5b_range_frame_matches_bruteforce(spark, rows):
    """RANGE ±1000 value frame: per order, count/sum of the SAME
    customer's orders within ±1000 of its price (bounds inclusive),
    independent of row order — re-derived by value comparison."""
    from orc_spark.plans.relational2 import r5b_range_frame

    d = _write_orders_simple(spark, rows)
    per_cust = {}
    for i, (c, q) in enumerate(rows):
        per_cust.setdefault(c, []).append((q / 4.0, i + 1))
    want = {}
    for c, lst in per_cust.items():
        for p, ok in lst:
            near = [p2 for p2, _ in lst if abs(p2 - p) <= 1000.0]
            want[ok] = (c, p, len(near), sum(sorted(near)))
    got = {
        r["o_orderkey"]: (r["o_custkey"], r["o_totalprice"], r["n_near"],
                          r["sum_near"])
        for r in r5b_range_frame(spark, d).collect()
    }
    # sums are quarter-exact, so exact equality incl. the float sums
    assert got == want


def _write_lineitem_part(spark, items, parts):
    """items: (l_partkey, qty_quarters, price_quarters); parts:
    (p_partkey, p_brand, p_size)."""
    d = tempfile.mkdtemp(prefix="orc_props_lp_")
    lpdf = pd.DataFrame(
        {
            "l_orderkey": range(1, len(items) + 1),
            "l_partkey": [p for p, _, _ in items],
            "l_suppkey": [1] * len(items),
            "l_linenumber": [1] * len(items),
            "l_quantity": [q / 4.0 for _, q, _ in items],
            "l_extendedprice": [pr / 4.0 for _, _, pr in items],
            "l_discount": [0.0] * len(items),
            "l_tax": [0.0] * len(items),
            "l_returnflag": ["N"] * len(items),
            "l_linestatus": ["O"] * len(items),
        }
    )
    ppdf = pd.DataFrame(
        {
            "p_partkey": [k for k, _, _ in parts],
            "p_name": [f"part {k}" for k, _, _ in parts],
            "p_brand": [b for _, b, _ in parts],
            "p_type": ["STANDARD"] * len(parts),
            "p_size": [s for _, _, s in parts],
            "p_retailprice": [1.0] * len(parts),
        }
    )
    spark.createDataFrame(
        lpdf,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        ppdf,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    return d


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    items=st.lists(
        st.tuples(st.integers(1, 10), st.integers(1, 240), st.integers(1, 100)),
        min_size=1,
        max_size=20,
    ),
    parts=st.lists(
        st.tuples(st.integers(1, 10), st.integers(20, 60)),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    ),
)
def test_r6_setops_matches_bruteforce(spark, items, parts):
    """INTERSECT / EXCEPT / UNION-distinct over the heavy-lineitem and
    big-part key sets, re-derived with Python set algebra."""
    from orc_spark.plans.relational import r6_setops

    d = _write_lineitem_part(
        spark, items, [(k, "Brand#1", s) for k, s in parts]
    )
    heavy = {p for p, q, _ in items if q / 4.0 >= 45}
    big = {k for k, s in parts if s >= 40}
    [r] = r6_setops(spark, d).collect()
    assert (r["n_intersect"], r["n_except"], r["n_union"]) == (
        len(heavy & big), len(heavy - big), len(heavy | big)
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    items=st.lists(
        st.tuples(st.integers(1, 6), st.integers(1, 240), st.integers(1, 400)),
        min_size=1,
        max_size=20,
    ),
    brand1=st.lists(st.integers(1, 6), min_size=1, max_size=6, unique=True),
)
def test_r9_scalar_subquery_matches_bruteforce(spark, items, brand1):
    """Decorrelated scalar subquery (TPC-H Q17 shape): per-part mean
    quantity, rows strictly below half of it, revenue / 7.0 — re-derived
    per part in Python on quarter-exact values."""
    from orc_spark.plans.relational3 import r9_scalar_subquery

    parts = [(k, "Brand#1" if k in set(brand1) else "Brand#2", 10)
             for k in range(1, 7)]
    d = _write_lineitem_part(spark, items, parts)
    b1 = set(brand1)
    per_part = {}
    for k, q, pr in items:
        if k in b1:
            per_part.setdefault(k, []).append((q / 4.0, pr / 4.0))
    tot, n = 0.0, 0
    for k, lst in per_part.items():
        avg_q = sum(q for q, _ in lst) / len(lst)
        for q, pr in lst:
            if q < 0.5 * avg_q:
                tot += pr
                n += 1
    [r] = r9_scalar_subquery(spark, d).collect()
    assert r["n_small"] == n
    if n == 0:
        assert r["avg_yearly"] is None
    else:
        assert r["avg_yearly"] == tot / 7.0


def _write_cust_orders_nation(spark, custs, orders):
    """custs: (c_custkey, nationkey, segment); orders: (o_custkey,
    price_quarters, year). Nation table is 3 fixed rows."""
    import datetime as dt

    d = tempfile.mkdtemp(prefix="orc_props_con_")
    cpdf = pd.DataFrame(
        {
            "c_custkey": [k for k, _, _ in custs],
            "c_name": [f"c{k}" for k, _, _ in custs],
            "c_nationkey": [nk for _, nk, _ in custs],
            "c_acctbal": [0.0] * len(custs),
            "c_mktsegment": [s for _, _, s in custs],
        }
    )
    opdf = pd.DataFrame(
        {
            "o_orderkey": range(1, len(orders) + 1),
            "o_custkey": [c for c, _, _ in orders],
            "o_orderstatus": ["O"] * len(orders),
            "o_totalprice": [q / 4.0 for _, q, _ in orders],
            "o_orderdate": [dt.datetime(y, 6, 1) for _, _, y in orders],
            "o_orderpriority": ["3-MEDIUM"] * len(orders),
        }
    )
    npdf = pd.DataFrame(
        {
            "n_nationkey": [0, 1, 2],
            "n_name": ["ALPHA", "BETA", "GAMMA"],
            "n_regionkey": [0, 0, 1],
        }
    )
    spark.createDataFrame(
        cpdf,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        opdf,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        npdf, "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "nation.parquet"))
    return d


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    items=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.sampled_from(["O", "F"]),
            st.integers(1, 200),     # qty quarters
            st.integers(1, 4000),    # price quarters
            st.integers(0, 1),       # discount in quarters (0 or 0.25)
            st.integers(0, 1),       # tax in quarters
            st.integers(1995, 2000),  # ship year (cutoff 1998-09-02)
        ),
        min_size=1,
        max_size=25,
    )
)
def test_r1_pricing_summary_matches_bruteforce(spark, items):
    """TPC-H Q1 re-derived in Python: the shipdate cutoff, the disc/charge
    product sums (quarter-unit prices and quarter discounts/taxes keep
    every product and sum binary-exact), and avg = sum/count."""
    import datetime as dt

    from orc_spark.plans.relational import r1_pricing_summary

    d = tempfile.mkdtemp(prefix="orc_props_r1_")
    pdf = pd.DataFrame(
        {
            "l_orderkey": range(1, len(items) + 1),
            "l_partkey": [1] * len(items),
            "l_suppkey": [1] * len(items),
            "l_linenumber": [1] * len(items),
            "l_quantity": [q / 4.0 for _, _, q, _, _, _, _ in items],
            "l_extendedprice": [p / 4.0 for _, _, _, p, _, _, _ in items],
            "l_discount": [dc / 4.0 for _, _, _, _, dc, _, _ in items],
            "l_tax": [tx / 4.0 for _, _, _, _, _, tx, _ in items],
            "l_returnflag": [f for f, _, _, _, _, _, _ in items],
            "l_linestatus": [s for _, s, _, _, _, _, _ in items],
            "l_shipdate": [dt.datetime(y, 1, 15) for *_, y in items],
        }
    )
    spark.createDataFrame(
        pdf,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    want = {}
    for f, s, q, p, dc, tx, y in items:
        if dt.datetime(y, 1, 15) > dt.datetime(1998, 9, 2):
            continue
        qq, pp, dd_, tt = q / 4.0, p / 4.0, dc / 4.0, tx / 4.0
        a = want.setdefault((f, s), [0.0, 0.0, 0.0, 0.0, 0])
        a[0] += qq
        a[1] += pp
        a[2] += pp * (1 - dd_)
        a[3] += pp * (1 - dd_) * (1 + tt)
        a[4] += 1
    want_full = {}
    for key, (sq, sp, sd, sc, n) in want.items():
        dsum = sum(
            dc / 4.0
            for f, s, _, _, dc, _, y in items
            if (f, s) == key and dt.datetime(y, 1, 15) <= dt.datetime(1998, 9, 2)
        )
        want_full[key] = (sq, sp, sd, sc, sq / n, sp / n, dsum / n, n)
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["sum_qty"], r["sum_base_price"], r["sum_disc_price"],
            r["sum_charge"], r["avg_qty"], r["avg_price"], r["avg_disc"],
            r["count_order"],
        )
        for r in r1_pricing_summary(spark, d).collect()
    }
    assert got == want_full


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    custs=st.lists(
        st.tuples(st.integers(1, 10), st.integers(0, 2),
                  st.sampled_from(["BUILDING", "MACHINERY"])),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    orders=st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 4000),
                  st.integers(1995, 1998)),
        min_size=0,
        max_size=15,
    ),
)
def test_r2_r2b_r4_match_bruteforce(spark, custs, orders):
    """Three battery shapes on one fixture: segment join-agg (r2),
    semi/anti existence counts (r2b), and the nation×year ROLLUP with
    grouping_id (r4) — all re-derived in Python. Orders referencing
    non-existent customers drop out of every inner join, exactly like
    production late-arriving facts."""
    from orc_spark.plans.relational import r2_join_agg, r2b_semi_anti, r4_rollup

    d = _write_cust_orders_nation(spark, custs, orders)
    cust_by_key = {k: (nk, s) for k, nk, s in custs}
    nation_name = {0: "ALPHA", 1: "BETA", 2: "GAMMA"}
    joined = [
        (c, q / 4.0, y, *cust_by_key[c]) for c, q, y in orders if c in cust_by_key
    ]

    # r2: per segment
    seg = {}
    for _, p, _, _, s in joined:
        n, tot = seg.get(s, (0, 0.0))
        seg[s] = (n + 1, tot + p)
    want_r2 = {s: (n, tot, tot / n) for s, (n, tot) in seg.items()}
    got_r2 = {
        r["c_mktsegment"]: (r["n_orders"], r["total_revenue"],
                            r["avg_order_price"])
        for r in r2_join_agg(spark, d).collect()
    }
    assert got_r2 == want_r2

    # r2b: existence split
    with_orders = {c for c, _, _ in orders if c in cust_by_key}
    [rb] = r2b_semi_anti(spark, d).collect()
    assert (rb["n_with_orders"], rb["n_without_orders"]) == (
        len(with_orders), len(custs) - len(with_orders)
    )

    # r4: rollup (nation, year) -> 3 grouping sets with gid 0/1/3
    want_r4 = {}
    for _, p, y, nk, _ in joined:
        nname = nation_name[nk]
        for key, gid in (
            ((nname, y), 0),
            ((nname, None), 1),
            ((None, None), 3),
        ):
            n, tot = want_r4.get((key, gid), (0, 0.0))
            want_r4[(key, gid)] = (n + 1, tot + p)
    got_r4 = {
        ((r["n_name"], r["order_year"]), r["gid"]): (r["n_orders"], r["revenue"])
        for r in r4_rollup(spark, d).collect()
    }
    assert got_r4 == want_r4


def _write_supplier(spark, d, n_supp):
    pdf = pd.DataFrame(
        {
            "s_suppkey": range(1, n_supp + 1),
            "s_name": [f"Supplier#{k:09d}" for k in range(1, n_supp + 1)],
            "s_nationkey": [1] * n_supp,
            "s_acctbal": [0.0] * n_supp,
        }
    )
    spark.createDataFrame(
        pdf, "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "supplier.parquet"))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    items=st.lists(
        st.tuples(
            st.integers(1, 5),          # suppkey
            st.integers(1, 4000),       # price quarters
            st.integers(0, 1),          # discount quarters
            st.integers(0, 200),        # ship day offset from 1996-01-01
        ),
        min_size=1,
        max_size=20,
    )
)
def test_r13_top_supplier_matches_bruteforce(spark, items):
    """Q15 shape: 90-day revenue view in integer 1e-4 units, max-equality
    tie semantics (ALL suppliers at the max revenue return) — re-derived
    in Python with the same fixed-point accumulation."""
    import datetime as dt

    from orc_spark.plans.relational2 import r13_top_supplier

    d = tempfile.mkdtemp(prefix="orc_props_r13_")
    base = dt.datetime(1996, 1, 1)
    pdf = pd.DataFrame(
        {
            "l_orderkey": range(1, len(items) + 1),
            "l_partkey": [1] * len(items),
            "l_suppkey": [s for s, _, _, _ in items],
            "l_linenumber": [1] * len(items),
            "l_quantity": [1.0] * len(items),
            "l_extendedprice": [p / 4.0 for _, p, _, _ in items],
            "l_discount": [dc / 4.0 for _, _, dc, _ in items],
            "l_tax": [0.0] * len(items),
            "l_returnflag": ["N"] * len(items),
            "l_linestatus": ["O"] * len(items),
            "l_shipdate": [base + dt.timedelta(days=off) for *_, off in items],
        }
    )
    spark.createDataFrame(
        pdf,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    _write_supplier(spark, d, 5)
    rev = {}
    hi = dt.datetime(1996, 3, 31)
    for s, p, dc, off in items:
        if base + dt.timedelta(days=off) <= hi:
            fp = int(round((p / 4.0) * (1 - dc / 4.0) * 10000))
            rev[s] = rev.get(s, 0) + fp
    want = {}
    if rev:
        mx = max(rev.values())
        for s, fp in rev.items():
            if fp == mx:
                want[s] = (f"Supplier#{s:09d}", _r6(fp / 10000.0))
    got = {
        r["s_suppkey"]: (r["s_name"], r["total_revenue"])
        for r in r13_top_supplier(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    orders=st.lists(
        st.tuples(
            st.sampled_from(["F", "O"]),       # order status
            st.lists(                          # (suppkey, late_days) lines
                st.tuples(st.integers(1, 4), st.integers(0, 120)),
                min_size=1,
                max_size=5,
            ),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_r14_waiting_supplier_matches_bruteforce(spark, orders):
    """Q21 shape re-derived: only finished orders count, late = shipped
    strictly more than 60 days after the order date, and a supplier waits
    only when the order had >= 2 distinct suppliers and the late set is
    exactly one DISTINCT supplier (multiple late lines of the same
    supplier still qualify)."""
    import datetime as dt

    from orc_spark.plans.relational2 import r14_waiting_supplier

    d = tempfile.mkdtemp(prefix="orc_props_r14_")
    base = dt.datetime(1995, 1, 1)
    lrows, orows = [], []
    ln = 1
    for ok, (status, lines) in enumerate(orders, 1):
        orows.append((ok, 1, status, 1.0, base, "3-MEDIUM"))
        for s, days in lines:
            lrows.append((ok, 1, s, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                          base + dt.timedelta(days=days)))
            ln += 1
    spark.createDataFrame(
        pd.DataFrame(
            orows,
            columns=["o_orderkey", "o_custkey", "o_orderstatus",
                     "o_totalprice", "o_orderdate", "o_orderpriority"],
        ),
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        pd.DataFrame(
            lrows,
            columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                     "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                     "l_returnflag", "l_linestatus", "l_shipdate"],
        ),
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    _write_supplier(spark, d, 4)
    waits = {}
    for ok, (status, lines) in enumerate(orders, 1):
        if status != "F":
            continue
        supps = {s for s, _ in lines}
        late = {s for s, days in lines if days > 60}
        if len(supps) >= 2 and len(late) == 1:
            (s,) = late
            waits[s] = waits.get(s, 0) + 1
    ranked = sorted(
        ((f"Supplier#{s:09d}", n) for s, n in waits.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = [(r["s_name"], r["numwait"])
           for r in r14_waiting_supplier(spark, d).collect()]
    assert got == ranked


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(1, 6),                   # custkey
            st.integers(0, 120),                 # orderdate day offset
            st.lists(                            # lines: (qty_quarters, price_q, flag)
                st.tuples(st.integers(1, 800), st.integers(1, 4000),
                          st.sampled_from(["R", "N"])),
                min_size=1,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_r16_r18_match_bruteforce(spark, orders):
    """Q18 (big-quantity orders, HAVING > 300, top-50) and Q10 (returned-
    item revenue top-20 in a date window) re-derived on one fixture —
    including the tie-ordered top-k and the fixed-point revenue sums."""
    import datetime as dt

    from orc_spark.plans.relational2 import r16_big_orders, r18_returned_items

    base = dt.datetime(1996, 1, 1)
    d = tempfile.mkdtemp(prefix="orc_props_r16_")
    orows, lrows = [], []
    ln = 1
    for ok, (ck, off, lines) in enumerate(orders, 1):
        orows.append((ok, ck, "F", 1.0, base + dt.timedelta(days=off), "3-MEDIUM"))
        for q, p, fl in lines:
            lrows.append((ok, 1, 1, ln, q / 4.0, p / 4.0, 0.25, 0.0, fl, "O",
                          base + dt.timedelta(days=off + 10)))
            ln += 1
    spark.createDataFrame(
        pd.DataFrame(orows, columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]),
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        pd.DataFrame(lrows, columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate"]),
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    custs = sorted({ck for ck, _, _ in orders} | {1, 2, 3, 4, 5, 6})
    spark.createDataFrame(
        pd.DataFrame({
            "c_custkey": custs,
            "c_name": [f"Customer#{k:09d}" for k in custs],
            "c_nationkey": [k % 3 for k in custs],
            "c_acctbal": [0.0] * len(custs),
            "c_mktsegment": ["BUILDING"] * len(custs),
        }),
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        pd.DataFrame({"n_nationkey": [0, 1, 2],
                      "n_name": ["ALPHA", "BETA", "GAMMA"],
                      "n_regionkey": [0, 0, 1]}),
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "nation.parquet"))

    # r16 brute force
    want16 = []
    for ok, (ck, off, lines) in enumerate(orders, 1):
        tq = sum(q / 4.0 for q, _, _ in lines)
        if tq > 300:
            odate = base + dt.timedelta(days=off)
            want16.append((
                ck, f"Customer#{ck:09d}", ok,
                int(odate.replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
                int(tq),
            ))
    want16.sort(key=lambda t: (-t[4], t[2]))
    got16 = [
        (r["c_custkey"], r["c_name"], r["orderkey"], r["order_ms"],
         r["total_qty"])
        for r in r16_big_orders(spark, d).collect()
    ]
    assert got16 == want16[:50]

    # r18 brute force: returned lines of orders in [1996-01-01, 1996-04-01)
    nation_name = {0: "ALPHA", 1: "BETA", 2: "GAMMA"}
    rev = {}
    for ok, (ck, off, lines) in enumerate(orders, 1):
        odate = base + dt.timedelta(days=off)
        if not (dt.datetime(1996, 1, 1) <= odate < dt.datetime(1996, 4, 1)):
            continue
        for q, p, fl in lines:
            if fl == "R":
                fp = int(round((p / 4.0) * (1 - 0.25) * 10000))
                rev[ck] = rev.get(ck, 0) + fp
    want18 = sorted(
        (
            (ck, f"Customer#{ck:09d}", nation_name[ck % 3], fp)
            for ck, fp in rev.items()
        ),
        key=lambda t: (-t[3], t[0]),
    )[:20]
    got18 = [
        (r["c_custkey"], r["c_name"], r["nation"], r["revenue_fp"])
        for r in r18_returned_items(spark, d).collect()
    ]
    assert got18 == want18


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    items=st.lists(
        st.tuples(
            st.integers(1, 8),                     # partkey
            st.integers(1, 160),                   # qty quarters (<= 40)
            st.integers(1, 4000),                  # price quarters
            st.integers(0, 23),                    # ship month offset
        ),
        min_size=1,
        max_size=20,
    ),
    parts=st.lists(
        st.tuples(
            st.integers(1, 8),
            st.sampled_from(["PROMO", "STANDARD", "Brand#12", "Brand#23",
                             "Brand#34"]),
            st.integers(1, 50),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
)
def test_r19_r20_match_bruteforce(spark, items, parts):
    """Q14 (monthly promo share ratio on fixed-point sums) and Q19 (the
    three disjunctive brand/size/quantity arms) re-derived in Python on
    one fixture. p_type doubles as brand for the bracket arms."""
    import datetime as dt

    from orc_spark.plans.relational2 import r19_promo_share, r20_bracket_revenue

    d = tempfile.mkdtemp(prefix="orc_props_r19_")
    base = dt.datetime(1995, 1, 15)

    def ship(off):
        return dt.datetime(1995 + off // 12, 1 + off % 12, 15)

    lpdf = pd.DataFrame(
        {
            "l_orderkey": range(1, len(items) + 1),
            "l_partkey": [k for k, _, _, _ in items],
            "l_suppkey": [1] * len(items),
            "l_linenumber": [1] * len(items),
            "l_quantity": [q / 4.0 for _, q, _, _ in items],
            "l_extendedprice": [p / 4.0 for _, _, p, _ in items],
            "l_discount": [0.25] * len(items),
            "l_tax": [0.0] * len(items),
            "l_returnflag": ["N"] * len(items),
            "l_linestatus": ["O"] * len(items),
            "l_shipdate": [ship(off) for *_, off in items],
        }
    )
    ppdf = pd.DataFrame(
        {
            "p_partkey": [k for k, _, _ in parts],
            "p_name": [f"part {k}" for k, _, _ in parts],
            "p_brand": [b for _, b, _ in parts],
            "p_type": [b for _, b, _ in parts],  # brand == type in fixture
            "p_size": [s for _, _, s in parts],
            "p_retailprice": [1.0] * len(parts),
        }
    )
    spark.createDataFrame(
        lpdf,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        ppdf,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))

    pinfo = {k: (b, s) for k, b, s in parts}
    joined = [
        (k, q / 4.0, int(round((p / 4.0) * 0.75 * 10000)), ship(off),
         *pinfo[k])
        for k, q, p, off in items
        if k in pinfo
    ]
    # r19
    months = {}
    for _, _, fp, sd, b, _ in joined:
        a = months.setdefault((sd.year, sd.month), [0, 0])
        if b == "PROMO":
            a[0] += fp
        a[1] += fp
    want19 = [
        (y, m, pf, tf, _r6(100.0 * pf / tf))
        for (y, m), (pf, tf) in sorted(months.items())
    ]
    got19 = [
        (r["ship_year"], r["ship_month"], r["promo_fp"], r["total_fp"],
         r["promo_pct"])
        for r in r19_promo_share(spark, d).collect()
    ]
    assert got19 == want19
    # r20
    n = rev = tq = 0
    for _, q, fp, _, b, s in joined:
        hit = (
            (b == "Brand#12" and 1 <= s <= 15 and 1 <= q <= 15)
            or (b == "Brand#23" and 10 <= s <= 30 and 10 <= q <= 25)
            or (b == "Brand#34" and 20 <= s <= 50 and 20 <= q <= 40)
        )
        if hit:
            n += 1
            rev += fp
            tq += int(q)  # cast truncates
    [r20] = r20_bracket_revenue(spark, d).collect()
    if n == 0:
        assert (r20["n_items"], r20["revenue_fp"], r20["total_qty"]) == (
            0, None, None
        )
    else:
        assert (r20["n_items"], r20["revenue_fp"], r20["total_qty"]) == (
            n, rev, tq
        )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    custs=st.lists(
        st.tuples(st.integers(1, 10),
                  st.sampled_from(["BUILDING", "MACHINERY"])),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    orders=st.lists(
        st.tuples(st.integers(1, 12), st.sampled_from(["P", "F"]),
                  st.integers(0, 400)),
        min_size=0,
        max_size=15,
    ),
)
def test_r21_null_semantics_matches_bruteforce(spark, custs, orders):
    """The NULL battery re-derived: count(*) vs count(col), null-safe
    equality of the NULLIF pair (true iff n_orders is NULL or not in
    {1,2}), coalesced sums, NULL-skipping avg/min, and NULLS FIRST
    ordering."""
    import datetime as dt

    from orc_spark.plans.relational2 import r21_null_semantics

    base = dt.datetime(1995, 1, 1)
    d = tempfile.mkdtemp(prefix="orc_props_r21_")
    cpdf = pd.DataFrame(
        {
            "c_custkey": [k for k, _ in custs],
            "c_name": [f"c{k}" for k, _ in custs],
            "c_nationkey": [1] * len(custs),
            "c_acctbal": [0.0] * len(custs),
            "c_mktsegment": [s for _, s in custs],
        }
    )
    opdf = pd.DataFrame(
        {
            "o_orderkey": range(1, len(orders) + 1),
            "o_custkey": [c for c, _, _ in orders],
            "o_orderstatus": [s for _, s, _ in orders],
            "o_totalprice": [1.0] * len(orders),
            "o_orderdate": [base + dt.timedelta(days=off)
                            for _, _, off in orders],
            "o_orderpriority": ["3-MEDIUM"] * len(orders),
        }
    )
    spark.createDataFrame(
        cpdf,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        opdf,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))

    def ms(dtv):
        return int(dtv.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)

    recent = {}
    for c, s, off in orders:
        if s == "P":
            n, last = recent.get(c, (0, None))
            t = ms(base + dt.timedelta(days=off))
            recent[c] = (n + 1, t if last is None else max(last, t))
    segs = {}
    for k, s in custs:
        segs.setdefault(s, []).append(recent.get(k))
    want = []
    for s, vals in segs.items():
        matched = [v for v in vals if v is not None]
        n_orders = [n for n, _ in matched]
        want.append((
            s,
            len(vals),
            len(matched),
            len(vals) - len(matched),
            # nullif(n,1) <=> nullif(n,2): true iff n is NULL or n not in {1,2}
            sum(1 for v in vals if v is None or v[0] not in (1, 2)),
            sum(n_orders),
            _r6(sum(n_orders) / len(n_orders)) if n_orders else None,
            min((t for _, t in matched), default=None),
        ))
    want.sort(key=lambda t: (t[2], t[0]))
    got = [
        (r["c_mktsegment"], r["n_cust"], r["n_matched"], r["n_null_nullsafe"],
         r["n_nullif_nullsafe_eq"], r["total_orders_coalesced"],
         r["avg_orders_skipnull"], r["min_last_ms_skipnull"])
        for r in r21_null_semantics(spark, d).collect()
    ]
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(1, 6),            # custkey
            st.integers(-40, 40),         # orderdate offset vs 1995-03-15
            st.lists(                     # lines: (ship offset, price_q, disc 0/1)
                st.tuples(st.integers(-40, 40), st.integers(1, 4000),
                          st.integers(0, 1)),
                min_size=1,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=10,
    ),
    building=st.lists(st.integers(1, 6), min_size=0, max_size=6, unique=True),
)
def test_r3_shipping_priority_matches_bruteforce(spark, orders, building):
    """TPC-H Q3 re-derived: strict date cutoffs on BOTH sides of the join,
    BUILDING-segment filter, quarter-exact revenue sums, and the
    (revenue desc, orderdate, orderkey) top-10 tie order."""
    import datetime as dt

    from orc_spark.plans.relational import r3_shipping_priority

    cutoff = dt.datetime(1995, 3, 15)
    d = tempfile.mkdtemp(prefix="orc_props_r3_")
    bset = set(building)
    orows, lrows = [], []
    ln = 1
    for ok, (ck, odoff, lines) in enumerate(orders, 1):
        orows.append((ok, ck, "O", 1.0, cutoff + dt.timedelta(days=odoff),
                      "3-MEDIUM"))
        for soff, p, dc in lines:
            lrows.append((ok, 1, 1, ln, 1.0, p / 4.0, dc / 4.0, 0.0, "N", "O",
                          cutoff + dt.timedelta(days=soff)))
            ln += 1
    spark.createDataFrame(
        pd.DataFrame(orows, columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]),
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        pd.DataFrame(lrows, columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate"]),
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    custs = list(range(1, 7))
    spark.createDataFrame(
        pd.DataFrame({
            "c_custkey": custs,
            "c_name": [f"c{k}" for k in custs],
            "c_nationkey": [1] * len(custs),
            "c_acctbal": [0.0] * len(custs),
            "c_mktsegment": ["BUILDING" if k in bset else "MACHINERY"
                             for k in custs],
        }),
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))

    def ms(dtv):
        return int(dtv.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)

    agg = {}
    for ok, (ck, odoff, lines) in enumerate(orders, 1):
        if ck not in bset or odoff >= 0:  # o_orderdate < cutoff
            continue
        for soff, p, dc in lines:
            if soff > 0:  # l_shipdate > cutoff
                key = (ok, ms(cutoff + dt.timedelta(days=odoff)), "3-MEDIUM")
                agg[key] = agg.get(key, 0.0) + (p / 4.0) * (1 - dc / 4.0)
    want = sorted(
        ((k[0], k[1], k[2], rev) for k, rev in agg.items()),
        key=lambda t: (-t[3], t[1], t[0]),
    )[:10]
    got = [
        (r["l_orderkey"], r["orderdate_ms"], r["o_orderpriority"], r["revenue"])
        for r in r3_shipping_priority(spark, d).collect()
    ]
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    custs=st.lists(
        st.tuples(st.integers(1, 8),
                  st.sampled_from(["BUILDING", "MACHINERY", "FURNITURE"])),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    orders=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 4000)),
        min_size=1,
        max_size=15,
    ),
    nat_pairs=st.lists(
        st.tuples(st.integers(1, 4), st.integers(0, 2), st.integers(0, 2),
                  st.integers(1, 4000), st.integers(1995, 1997)),
        min_size=0,
        max_size=12,
    ),
)
def test_r12_unpivot_and_r17_nation_volume_match_bruteforce(
    spark, custs, orders, nat_pairs
):
    """r12: wide per-segment aggregate melted to (segment, metric, value)
    rows. r17: Q7 nation-pair revenue flow with the supp_nation <
    cust_nation asymmetry filter — both re-derived in Python. The r17
    fixture routes supplier/customer nations through nat_pairs:
    (suppkey&custkey, supp_nat, cust_nat, price_q, ship_year)."""
    import datetime as dt

    from orc_spark.plans.relational2 import r17_nation_volume
    from orc_spark.plans.relational3 import r12_unpivot

    nation_name = {0: "ALPHA", 1: "BETA", 2: "GAMMA"}
    cust_by_key = dict(custs)
    d = tempfile.mkdtemp(prefix="orc_props_r12_")

    # r12 fixture (cust + orders)
    sup_rows = []
    extra_custs = []
    lrows, orows2 = [], []
    okey = 1000  # r17 orders start here, away from r12's
    ln = 1
    for i, (k, sn, cn, p, y) in enumerate(nat_pairs):
        sup_rows.append((100 + i, sn))
        extra_custs.append((200 + i, cn))
        orows2.append((okey, 200 + i, dt.datetime(y, 6, 1)))
        lrows.append((okey, 100 + i, p, dt.datetime(y, 6, 1)))
        okey += 1
    cpdf = pd.DataFrame(
        {
            "c_custkey": [k for k, _ in custs] + [k for k, _ in extra_custs],
            "c_name": ["x"] * (len(custs) + len(extra_custs)),
            "c_nationkey": [0] * len(custs) + [n for _, n in extra_custs],
            "c_acctbal": [0.0] * (len(custs) + len(extra_custs)),
            "c_mktsegment": [s for _, s in custs]
            + ["OTHER"] * len(extra_custs),
        }
    )
    opdf = pd.DataFrame(
        {
            "o_orderkey": list(range(1, len(orders) + 1))
            + [o for o, _, _ in orows2],
            "o_custkey": [c for c, _ in orders] + [c for _, c, _ in orows2],
            "o_orderstatus": ["O"] * (len(orders) + len(orows2)),
            "o_totalprice": [q / 4.0 for _, q in orders]
            + [1.0] * len(orows2),
            "o_orderdate": [dt.datetime(1995, 1, 1)] * len(orders)
            + [dte for _, _, dte in orows2],
            "o_orderpriority": ["3-MEDIUM"] * (len(orders) + len(orows2)),
        }
    )
    lpdf = pd.DataFrame(
        {
            "l_orderkey": [o for o, _, _, _ in lrows],
            "l_partkey": [1] * len(lrows),
            "l_suppkey": [s for _, s, _, _ in lrows],
            "l_linenumber": range(1, len(lrows) + 1),
            "l_quantity": [1.0] * len(lrows),
            "l_extendedprice": [p / 4.0 for _, _, p, _ in lrows],
            "l_discount": [0.25] * len(lrows),
            "l_tax": [0.0] * len(lrows),
            "l_returnflag": ["N"] * len(lrows),
            "l_linestatus": ["O"] * len(lrows),
            "l_shipdate": [dte for _, _, _, dte in lrows],
        }
    )
    spdf = pd.DataFrame(
        {
            "s_suppkey": [k for k, _ in sup_rows],
            "s_name": ["s"] * len(sup_rows),
            "s_nationkey": [n for _, n in sup_rows],
            "s_acctbal": [0.0] * len(sup_rows),
        }
    )
    npdf = pd.DataFrame({"n_nationkey": [0, 1, 2],
                         "n_name": ["ALPHA", "BETA", "GAMMA"],
                         "n_regionkey": [0, 0, 1]})
    spark.createDataFrame(
        cpdf,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        opdf,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        lpdf,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        spdf, "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "supplier.parquet"))
    spark.createDataFrame(
        npdf, "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "nation.parquet"))

    # r12 brute force: per segment (cnt, sum, avg) melted
    seg = {}
    for c, q in orders:
        if c in cust_by_key:
            s = cust_by_key[c]
            n, tot = seg.get(s, (0, 0.0))
            seg[s] = (n + 1, tot + q / 4.0)
    # r17 extra custs (segment OTHER) also join r12's aggregate
    for _, ck, _ in orows2:
        pass  # their orders have price 1.0 and segment OTHER
    other_orders = [(c, 4) for _, c, _ in orows2]  # 1.0 = 4 quarters
    for c, q in other_orders:
        s = "OTHER"
        n, tot = seg.get(s, (0, 0.0))
        seg[s] = (n + 1, tot + q / 4.0)
    want12 = {}
    for s, (n, tot) in seg.items():
        want12[(s, "cnt_orders")] = float(n)
        want12[(s, "sum_price")] = tot
        want12[(s, "avg_price")] = tot / n
    got12 = {
        (r["c_mktsegment"], r["metric"]): r["value"]
        for r in r12_unpivot(spark, d).collect()
    }
    assert got12 == want12

    # r17 brute force
    flows = {}
    for k, sn, cn, p, y in nat_pairs:
        a, b = nation_name[sn], nation_name[cn]
        if a < b:
            fp = int(round((p / 4.0) * 0.75 * 10000))
            key = (a, b, y)
            flows[key] = flows.get(key, 0) + fp
    want17 = sorted(
        ((a, b, y, fp) for (a, b, y), fp in flows.items()),
        key=lambda t: (-t[3], t[0], t[1], t[2]),
    )[:25]
    got17 = [
        (r["supp_nation"], r["cust_nation"], r["ship_year"], r["revenue_fp"])
        for r in r17_nation_volume(spark, d).collect()
    ]
    assert got17 == want17


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["1-URGENT", "3-MEDIUM"]),
                  st.integers(1, 50)),   # price quarters (small -> many ties)
        min_size=1,
        max_size=20,
    )
)
def test_r5c_rank_battery_matches_bruteforce(spark, rows):
    """Every ranking function re-derived along the exact (price desc, key
    asc) order. The ORDER BY tuple is UNIQUE (orderkey tiebreak — the
    determinism requirement for hash-checking), so rank/dense_rank equal
    row_number and cume_dist has singleton peer groups: rnk = rn,
    prnk = (rn-1)/(n-1) with the n=1 zero case, cdist = rn/n, plus the
    standard ntile split and lag/lead/first."""
    import datetime as dt

    from orc_spark.plans.relational2 import r5c_rank_battery

    d = tempfile.mkdtemp(prefix="orc_props_r5c_")
    pdf = pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [1] * len(rows),
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [q / 4.0 for _, q in rows],
            "o_orderdate": [dt.datetime(1995, 1, 1)] * len(rows),
            "o_orderpriority": [p_ for p_, _ in rows],
        }
    )
    spark.createDataFrame(
        pdf,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    per = {}
    for i, (pr, q) in enumerate(rows):
        per.setdefault(pr, []).append((q / 4.0, i + 1))
    want = {}
    for pr, lst in per.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        n = len(lst)
        for idx, (p, ok) in enumerate(lst):
            rn = idx + 1
            rnk = rn            # unique ordering tuple -> no peers
            drnk = rn
            prnk = 0.0 if n == 1 else (rn - 1) / (n - 1)
            cdist = rn / n
            # standard ntile(4): first (n % 4) tiles get ceil(n/4)
            sz, rem = divmod(n, 4)
            tile, pos = 1, 0
            for t in range(1, 5):
                width = sz + (1 if t <= rem else 0)
                if pos + width >= rn:
                    tile = t
                    break
                pos += width
            want[ok] = (
                pr, rn, rnk, drnk, _r9(prnk), _r9(cdist), tile,
                lst[idx - 1][1] if idx > 0 else None,
                lst[idx + 1][1] if idx < n - 1 else None,
                lst[0][1],
            )
            if rn > 50:
                del want[ok]
    got = {
        r["o_orderkey"]: (
            r["o_orderpriority"], r["rn"], r["rnk"], r["drnk"], r["prnk"],
            r["cdist"], r["quartile"], r["prev_key"], r["next_key"],
            r["top_key"],
        )
        for r in r5c_rank_battery(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    custs=st.lists(
        st.tuples(st.integers(1, 10), st.integers(-2000, 8000),
                  st.sampled_from(["BUILDING", "MACHINERY"])),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    orders=st.lists(
        st.tuples(st.integers(1, 12), st.integers(0, 1400)),  # day offset
        min_size=1,
        max_size=12,
    ),
)
def test_r15_idle_customers_matches_bruteforce(spark, custs, orders):
    """Q22 shape re-derived: strict above-average balance (avg over
    POSITIVE balances only), 'idle' = no order within 2 years of the
    dataset's max order date, grouped cents-exact sums."""
    import datetime as dt

    from orc_spark.plans.relational2 import r15_idle_customers

    base = dt.datetime(1994, 1, 1)
    d = tempfile.mkdtemp(prefix="orc_props_r15_")
    cpdf = pd.DataFrame(
        {
            "c_custkey": [k for k, _, _ in custs],
            "c_name": [f"c{k}" for k, _, _ in custs],
            "c_nationkey": [1] * len(custs),
            "c_acctbal": [b / 4.0 for _, b, _ in custs],
            "c_mktsegment": [s for _, _, s in custs],
        }
    )
    opdf = pd.DataFrame(
        {
            "o_orderkey": range(1, len(orders) + 1),
            "o_custkey": [c for c, _ in orders],
            "o_orderstatus": ["O"] * len(orders),
            "o_totalprice": [1.0] * len(orders),
            "o_orderdate": [base + dt.timedelta(days=off) for _, off in orders],
            "o_orderpriority": ["3-MEDIUM"] * len(orders),
        }
    )
    spark.createDataFrame(
        cpdf,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        opdf,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    pos = [b / 4.0 for _, b, _ in custs if b / 4.0 > 0]
    avg_bal = sum(pos) / len(pos) if pos else None
    max_off = max(off for _, off in orders)
    recent = {
        c for c, off in orders
        if off * 86400000 >= max_off * 86400000 - 2 * 365 * 86400000
    }
    want = {}
    for k, b, s in custs:
        bal = b / 4.0
        if avg_bal is not None and bal > avg_bal and k not in recent:
            n, cents = want.get(s, (0, 0))
            want[s] = (n + 1, cents + int(round(bal * 100)))
    got = {
        r["c_mktsegment"]: (r["n_cust"], r["total_bal_cents"])
        for r in r15_idle_customers(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "x9", "q"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    ),
    n_phrase=st.integers(5, 9),
)
def test_ir_family_matches_bruteforce(spark, docs, n_phrase):
    """The whole IR pack re-derived in plain Python on one corpus:
    tx_tfidf (smoothed idf, per-doc top-5 with term tiebreak), tx_postings
    (xor-folded posting digests via h60_py), tx_collocations (PMI over
    adjacent bigrams, min-count 5 guaranteed by a planted repeated
    phrase), and tx_bm25 (the full Okapi expression in the identical float
    op order). Token extraction mirrors regexp [a-z]+ — '9' in 'x9'
    splits the token, exactly like the engines."""
    import math
    import re as _re
    from functools import reduce

    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.ir_q import (
        BM25_B,
        BM25_K1,
        COLLOC_MIN_C,
        COLLOC_TOPK,
        TOPK,
        tx_bm25,
        tx_collocations,
        tx_postings,
        tx_tfidf,
    )

    texts = [" ".join(ws) for ws in docs]
    # planted collocation: one doc repeating "alpha beta" n_phrase times
    texts.append(" ".join(["alpha beta"] * n_phrase))
    sf = _write_documents(spark, [("en", t) for t in texts])

    toks = {i: _re.findall(r"[a-z]+", t.lower()) for i, t in enumerate(texts)}
    n_docs = len(texts)

    # tf / df
    tf = {}
    for i, ts in toks.items():
        for w in ts:
            tf[(i, w)] = tf.get((i, w), 0) + 1
    df = {}
    for (i, w), c in tf.items():
        df[w] = df.get(w, 0) + 1

    # tx_tfidf
    want_tfidf = {}
    for i in toks:
        scored = []
        for (d_, w), c in tf.items():
            if d_ != i:
                continue
            raw = c * (math.log((n_docs + 1) / (df[w] + 1)) + 1.0)
            scored.append((w, c, df[w], raw))
        scored.sort(key=lambda t: (-t[3], t[0]))
        for rank, (w, c, dfw, raw) in enumerate(scored[:TOPK], 1):
            want_tfidf[(i, w)] = (c, dfw, _r6(raw), rank)
    got_tfidf = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"], r["rank"])
        for r in tx_tfidf(spark, sf).collect()
    }
    assert got_tfidf == want_tfidf

    # tx_postings
    want_post = {}
    for w in df:
        entries = [(i, c) for (i, w2), c in tf.items() if w2 == w]
        digest = reduce(
            lambda a, b: a ^ b, (h60_py(f"{i}:{c}") for i, c in entries)
        )
        want_post[w] = (
            len(entries),
            sum(c for _, c in entries),
            min(i for i, _ in entries),
            max(i for i, _ in entries),
            digest,
        )
    got_post = {
        r["term"]: (r["df"], r["total_tf"], r["doc_min"], r["doc_max"],
                    r["postings_digest"])
        for r in tx_postings(spark, sf).collect()
    }
    assert got_post == want_post

    # tx_collocations
    uni = {}
    n_tok = 0
    bi = {}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
            n_tok += 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    scored = []
    for (a, b), cxy in bi.items():
        if cxy >= COLLOC_MIN_C:
            pmi = _r6(math.log(n_tok * cxy / (uni[a] * uni[b])))
            scored.append((f"{a} {b}", cxy, uni[a], uni[b], pmi))
    scored.sort(key=lambda t: (-t[4], t[0]))
    want_colloc = scored[:COLLOC_TOPK]
    got_colloc = [
        (r["bigram"], r["c_xy"], r["c_x"], r["c_y"], r["pmi"])
        for r in tx_collocations(spark, sf).collect()
    ]
    assert got_colloc == want_colloc

    # tx_bm25 (n_docs here = docs WITH at least one token)
    dl = {}
    for (i, w), c in tf.items():
        dl[i] = dl.get(i, 0) + c
    nd = len(dl)
    tot_dl = sum(dl.values())
    want_bm25 = {}
    for i in dl:
        scored = []
        for (d_, w), c in tf.items():
            if d_ != i:
                continue
            idf = math.log(1.0 + (float(nd - df[w]) + 0.5) / (float(df[w]) + 0.5))
            raw = (
                idf
                * (float(c) * (BM25_K1 + 1.0))
                / (
                    float(c)
                    + BM25_K1
                    * (
                        (1.0 - BM25_B)
                        + BM25_B * (float(dl[i]) * float(nd)) / float(tot_dl)
                    )
                )
            )
            scored.append((w, c, raw))
        scored.sort(key=lambda t: (-t[2], t[0]))
        for rank, (w, c, raw) in enumerate(scored[:TOPK], 1):
            want_bm25[(i, w)] = (c, dl[i], _r6(raw), rank)
    got_bm25 = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"], r["bm25"], r["rank"])
        for r in tx_bm25(spark, sf).collect()
    }
    assert got_bm25 == want_bm25


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abcdef 01", min_size=0, max_size=30),
        min_size=1,
        max_size=9,
    )
)
def test_mm_image_features_matches_bruteforce(spark, texts):
    """The image decode-stub -> features path re-derived in plain Python:
    MINSTD pixel stream from the payload md5 seed, integer channel-sum
    stats, and the md5 digest over the 64 edge-padded 8x8 block sums."""
    import hashlib

    from orc_spark.plans.mm_q import mm_image_features

    sf = _write_documents(spark, [("en", t) for t in texts])
    want = {}
    for i, t in enumerate(texts):
        if i % 3 != 0:
            continue  # image kind = doc_id % 3 == 0
        payload = t.encode("utf-8")
        nc = len(t)
        w, h = nc % 32 + 8, nc % 24 + 8
        seed = int(hashlib.md5(payload).hexdigest()[:15], 16) % 2147483647
        tt = np.arange(h * w * 3, dtype=np.int64)
        v = ((seed + 1 + tt) * 48271) % 2147483647 % 256
        raw = v.reshape(h, w, 3)
        l3 = raw.sum(axis=2)
        ph, pw = -h % 8, -w % 8
        lp3 = np.pad(l3, ((0, ph), (0, pw)), mode="edge")
        bs = lp3.reshape(8, lp3.shape[0] // 8, 8, lp3.shape[1] // 8).sum(
            axis=(1, 3)
        )
        digest = hashlib.md5(
            ",".join(str(int(x)) for x in bs.ravel()).encode()
        ).hexdigest()
        want[i] = (
            len(payload), w, h, int(l3.sum()), int((l3 * l3).sum()), digest
        )
    got = {
        r["media_id"]: (
            r["n_bytes"], r["width"], r["height"], r["luma_sum3"],
            r["luma_sumsq3"], r["thumb_digest"]
        )
        for r in mm_image_features(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    ),
    dup_of=st.integers(0, 7),
)
def test_dd_ngram_jaccard_matches_bruteforce(spark, texts, dup_of):
    """Exact trigram Jaccard on RAW STRING sets (the query hashes grams
    with xxhash64 — injective w.h.p. — so string-set Jaccard must match),
    with the floor(len/50) length-bucket candidate rule. Planted duplicate
    guarantees at least one qualifying pair."""
    from orc_spark.plans.dedup_q import (
        JACCARD_THRESHOLD,
        LEN_BUCKET,
        NGRAM_N,
        dd_ngram_jaccard,
    )

    texts = list(texts) + [texts[dup_of % len(texts)]]
    sf = _write_documents(spark, [("en", t) for t in texts])

    def grams(t):
        lt = t.lower()
        n_pos = max(len(lt) - (NGRAM_N - 1), 1)
        return {lt[p : p + NGRAM_N] for p in range(n_pos)}

    gs = {i: grams(t) for i, t in enumerate(texts)}
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if len(texts[a]) // LEN_BUCKET != len(texts[b]) // LEN_BUCKET:
                continue
            inter = len(gs[a] & gs[b])
            union = len(gs[a] | gs[b])
            j = inter / union if union else 0.0
            if j >= JACCARD_THRESHOLD:
                want[(a, b)] = j
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd_ngram_jaccard(spark, sf).collect()
    }
    assert set(got) == set(want)
    for k, j in want.items():
        assert got[k] == j


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=15),
        min_size=1,
        max_size=6,
    ),
    dups=st.lists(st.integers(0, 5), min_size=1, max_size=4),
)
@pytest.mark.sweep  # long-tail value check: full/nightly tier
def test_dd_cluster_matches_bruteforce(spark, texts, dups):
    """Near-dup clustering re-derived end to end: MinHash signatures ->
    banded candidates -> est >= 0.5 edges -> plain-Python union-find;
    cluster_id = the component's min doc_id, sizes exact. Planted
    duplicates create real multi-doc components."""
    from orc_spark.functions.hashing import MERSENNE_P, MINHASH_PERMS, h60_py
    from orc_spark.plans.cluster_q import JACCARD_MIN, dd_cluster
    from orc_spark.plans.dedup_q import (
        N_BANDS,
        N_PERM,
        ROWS_PER_BAND,
        SHINGLE_K,
    )

    texts = list(texts) + [texts[i % len(texts)] for i in dups]
    sf = _write_documents(spark, [("en", t) for t in texts])
    sigs = {}
    for i, t in enumerate(texts):
        lt = t.lower()
        n_pos = max(len(lt) - (SHINGLE_K - 1), 1)
        hs = {h60_py(lt[p : p + SHINGLE_K]) for p in range(n_pos)}
        sigs[i] = [
            min((a * (h % MERSENNE_P) + b) % MERSENNE_P for h in hs)
            for a, b in MINHASH_PERMS
        ]
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = sigs[a], sigs[b]
            shared = any(
                sa[k * ROWS_PER_BAND : (k + 1) * ROWS_PER_BAND]
                == sb[k * ROWS_PER_BAND : (k + 1) * ROWS_PER_BAND]
                for k in range(N_BANDS)
            )
            if not shared:
                continue
            est = sum(1 for i in range(N_PERM) if sa[i] == sb[i]) / N_PERM
            if est >= JACCARD_MIN:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {i: find(i) for i in range(len(texts))}
    sizes = {}
    for i, c in comp.items():
        sizes[c] = sizes.get(c, 0) + 1
    want = {i: (comp[i], sizes[comp[i]]) for i in comp}
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dd_cluster(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abcdefgh ", min_size=0, max_size=60),
        min_size=2,
        max_size=10,
    ),
    contaminated=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
)
def test_cu_decontaminate_matches_bruteforce(spark, texts, contaminated, seed):
    """Winnowing decontamination re-derived: 20-gram h60 hashes, window-8
    minima as fingerprints, doc_id % 13 == 0 as the eval split, shared-fp
    counts and contamination fraction. A >= 27-char substring planted into
    doc 0 (eval) and one train doc guarantees the MOSS bound fires."""
    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.curation_q import (
        DECON_EVAL_MOD,
        DECON_K,
        DECON_W,
        cu_decontaminate,
    )

    rng = np.random.default_rng(seed)
    shared = "".join(
        "abcdefgh "[rng.integers(0, 9)] for _ in range(DECON_K + DECON_W + 5)
    )
    texts = list(texts)
    texts[0] = texts[0] + shared                     # doc 0 -> eval split
    ci = contaminated % (len(texts) - 1) + 1          # some train doc
    texts[ci] = shared + texts[ci]
    sf = _write_documents(spark, [("en", t) for t in texts])

    def fps(t):
        lt = t.lower()
        n_pos = max(len(lt) - (DECON_K - 1), 1)
        hs = [h60_py(lt[p : p + DECON_K]) for p in range(n_pos)]
        out = set()
        for p in range(n_pos - (DECON_W - 1)):
            out.add(min(hs[p : p + DECON_W]))
        return out

    ev = set()
    train = {}
    for i, t in enumerate(texts):
        if i % DECON_EVAL_MOD == 0:
            ev |= fps(t)
        else:
            train[i] = fps(t)
    want = {}
    for i, f in train.items():
        shared_n = len(f & ev)
        if shared_n:
            want[i] = (len(f), shared_n, _r6(shared_n / len(f)))
    assert ci in want, "planted contamination must fire"
    got = {
        r["doc_id"]: (r["n_fp"], r["n_shared_fp"], r["contam_frac"])
        for r in cu_decontaminate(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    langs=st.lists(
        st.sampled_from(["en", "zh", "de", "es", "fr"]),
        min_size=1,
        max_size=30,
    )
)
def test_cu_mixture_matches_bruteforce(spark, langs):
    """Deterministic mixture sampling re-derived: per-lang md5-rank
    ordering, k = min(n_l / w_l) over PRESENT languages, floor(k·w_l)
    kept per language, achieved-share audit."""
    import hashlib

    from orc_spark.plans.curation_q import CU_MIX, cu_mixture

    sf = _write_documents(spark, [(l, f"doc {i}") for i, l in enumerate(langs)])
    by_lang = {}
    for i, l in enumerate(langs):
        by_lang.setdefault(l, []).append(i)
    k = min(len(ids) / CU_MIX[l] for l, ids in by_lang.items())
    import math

    kept_n = {}
    for l, ids in by_lang.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        kept_n[l] = min(len(ids), int(math.floor(k * CU_MIX[l])))
    tot_kept = sum(kept_n.values())
    want = {
        l: (
            len(by_lang[l]),
            kept_n[l],
            _r6(CU_MIX[l]),
            _r6(kept_n[l] / tot_kept) if tot_kept else None,
        )
        for l in by_lang
        if kept_n[l] > 0 or True
    }
    # languages whose floor(k*w) is 0 keep no rows and drop from the audit
    want = {l: v for l, v in want.items() if v[1] > 0}
    got = {
        r["lang"]: (r["n_total"], r["n_kept"], r["target_share"],
                    r["achieved_share"])
        for r in cu_mixture(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    dup_cust=st.integers(0, 3),
    dup_line=st.integers(0, 3),
    orphans=st.integers(0, 4),
    null_vals=st.integers(0, 4),
    bad_nchars=st.integers(0, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_dq_expectations_matches_bruteforce(
    spark, dup_cust, dup_line, orphans, null_vals, bad_nchars, seed
):
    """The expectation audit re-derived with PLANTED violations of every
    check: duplicate customer keys, duplicate (orderkey, linenumber)
    pairs, orphan order custkeys, NULL event values, and n_chars columns
    disagreeing with length(text) — each check's n_failed must count
    exactly the planted rows."""
    import datetime as dt

    from orc_spark.plans.dq_q import dq_expectations

    rng = np.random.default_rng(seed)
    d = tempfile.mkdtemp(prefix="orc_props_dq_")
    n_cust, n_li, n_ord, n_ev, n_doc = 6, 8, 6, 6, 5

    ckeys = list(range(1, n_cust + 1))
    for i in range(dup_cust):
        ckeys[i % n_cust] = 1  # duplicates of key 1
    spark.createDataFrame(
        pd.DataFrame({
            "c_custkey": ckeys,
            "c_name": [f"c{i}" for i in range(n_cust)],
            "c_nationkey": [1] * n_cust,
            "c_acctbal": [0.0] * n_cust,
            "c_mktsegment": ["BUILDING"] * n_cust,
        }),
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))

    pairs = [(i + 1, 1) for i in range(n_li)]
    for i in range(dup_line):
        pairs[i % n_li] = (1, 1)
    qty = [float(rng.integers(1, 100)) for _ in range(n_li)]
    spark.createDataFrame(
        pd.DataFrame({
            "l_orderkey": [a for a, _ in pairs],
            "l_partkey": [1] * n_li,
            "l_suppkey": [1] * n_li,
            "l_linenumber": [b for _, b in pairs],
            "l_quantity": qty,
            "l_extendedprice": [1.0] * n_li,
            "l_discount": [0.0] * n_li,
            "l_tax": [0.0] * n_li,
            "l_returnflag": ["N"] * n_li,
            "l_linestatus": ["O"] * n_li,
        }),
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))

    okeys = [int(rng.integers(1, n_cust + 1)) for _ in range(n_ord)]
    for i in range(orphans):
        okeys[i % n_ord] = 999  # no such customer
    spark.createDataFrame(
        pd.DataFrame({
            "o_orderkey": range(1, n_ord + 1),
            "o_custkey": okeys,
            "o_orderstatus": ["O"] * n_ord,
            "o_totalprice": [1.0] * n_ord,
            "o_orderdate": [dt.datetime(1995, 1, 1)] * n_ord,
            "o_orderpriority": ["3-MEDIUM"] * n_ord,
        }),
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))

    vals = [1.5] * n_ev
    for i in range(null_vals):
        vals[i % n_ev] = None
    spark.createDataFrame(
        pd.DataFrame({
            "event_id": range(n_ev),
            "ts": [pd.Timestamp("2024-01-01")] * n_ev,
            "user_id": [1] * n_ev,
            "event_type": ["view"] * n_ev,
            "value": vals,
            "props": ["{}"] * n_ev,
        }),
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

    texts = [f"doc number {i}" for i in range(n_doc)]
    ncs = [len(t) for t in texts]
    for i in range(bad_nchars):
        ncs[i % n_doc] += 7
    spark.createDataFrame(
        pd.DataFrame({
            "doc_id": range(n_doc),
            "text": texts,
            "lang": ["en"] * n_doc,
            "source": ["synthetic"] * n_doc,
            "n_chars": ncs,
        }),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    dup_cust_fail = n_cust - len(set(ckeys))
    dup_line_fail = n_li - len(set(pairs))
    # duplicating custkey 1 REMOVES the overwritten keys from the customer
    # table, so orders referencing them are orphans too — not just the 999s
    orphan_fail = sum(1 for k in okeys if k not in set(ckeys))
    range_fail = sum(1 for q in qty if q <= 0 or q > 100)
    null_fail = sum(1 for v in vals if v is None)
    nchars_fail = sum(1 for t, nc in zip(texts, ncs) if nc != len(t))
    want = {
        "customer.c_custkey unique": (n_cust, dup_cust_fail),
        "lineitem (l_orderkey, l_linenumber) unique": (n_li, dup_line_fail),
        "lineitem.l_quantity in (0, 100]": (n_li, range_fail),
        "orders.o_custkey references customer": (n_ord, orphan_fail),
        "events.value not null": (n_ev, null_fail),
        "documents.n_chars == length(text)": (n_doc, nchars_fail),
    }
    got = {
        r["check_name"]: (r["n_checked"], r["n_failed"], r["passed"])
        for r in dq_expectations(spark, d).collect()
    }
    assert set(got) == set(want)
    for name, (n, fails) in want.items():
        assert got[name] == (n, fails, fails == 0), name


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    parts=st.lists(
        st.tuples(
            st.lists(st.sampled_from(["azure", "beige", "coral", "dim"]),
                     min_size=1, max_size=4),          # name words
            st.sampled_from(["STANDARD BRUSHED", "ECONOMY PLATED"]),
            st.integers(1, 60),                         # p_size
            st.integers(1, 8000),                       # retail quarters
        ),
        min_size=1,
        max_size=12,
    )
)
def test_r7_scalar_battery_matches_bruteforce(spark, parts):
    """Scalar-function battery re-derived per row in Python: string ops,
    regex head, array sort exact; sqrt/pow/fmod exact (IEEE correctly
    rounded); asin/atan2/ln at 1e-12 relative — the JVM's Math.asin
    differs from CPython's libm by 1 ulp (measured: asin(0.32) ends
    ...463014 vs ...4630 2), which the gate's 9-sig-fig rounding absorbs."""
    import math
    import re as _re

    from orc_spark.plans.relational import r7_scalar_battery

    d = tempfile.mkdtemp(prefix="orc_props_r7_")
    names = [" ".join(ws) for ws, _, _, _ in parts]
    pdf = pd.DataFrame(
        {
            "p_partkey": range(1, len(parts) + 1),
            "p_name": names,
            "p_brand": ["Brand#1"] * len(parts),
            "p_type": [t for _, t, _, _ in parts],
            "p_size": [s for _, _, s, _ in parts],
            "p_retailprice": [p / 4.0 for _, _, _, p in parts],
        }
    )
    spark.createDataFrame(
        pdf,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    want = {}
    for i, (ws, ty, s, pq) in enumerate(parts, 1):
        name = " ".join(ws)
        price = pq / 4.0
        m = _re.search(r"^(\w+)", ty)
        want[i] = (
            name[:5].upper(),
            len(name),
            m.group(1) if m else "",
            len(name.split(" ")),
            sorted(name.split(" "))[0],
            math.sqrt(price),
            float(s) ** 2.0,
            math.degrees(math.atan2(float(s), 100.0)),
            math.asin(min(s / 50.0, 1.0)),
            math.log(price + 1.0),
            math.fmod(price, 7.0),
        )
    got = {
        r["p_partkey"]: (
            r["name_prefix"], r["name_len"], r["type_head"], r["n_words"],
            r["first_word_sorted"], r["price_sqrt"], r["size_sq"],
            r["size_angle_deg"], r["size_asin"], r["price_ln"],
            r["price_mod7"],
        )
        for r in r7_scalar_battery(spark, d).collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g[:7] == w[:7], k          # strings/ints/sqrt/pow exact
        assert g[10] == w[10], k          # fmod exact
        for gi, wi in zip(g[7:10], w[7:10]):  # asin/atan2/ln: 1 ulp slack
            assert math.isclose(gi, wi, rel_tol=1e-12), (k, gi, wi)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    days=st.lists(st.integers(0, 2500), min_size=1, max_size=20),
)
def test_r7b_dates_matches_bruteforce(spark, days):
    """Date battery re-derived with Python datetime: calendar fields,
    quarter, month truncation in epoch ms, day diffs from the anchor, and
    the Sunday/Saturday weekend rule (Spark dayofweek 1=Sunday)."""
    import datetime as dt

    from orc_spark.plans.relational2 import r7b_dates

    base = dt.datetime(1993, 1, 1)
    d = _write_orders_simple(spark, [(1, 4)] * len(days))
    # overwrite orderdates with the generated offsets
    import glob

    pdf = pd.DataFrame(
        {
            "o_orderkey": range(1, len(days) + 1),
            "o_custkey": [1] * len(days),
            "o_orderstatus": ["O"] * len(days),
            "o_totalprice": [1.0] * len(days),
            "o_orderdate": [base + dt.timedelta(days=off) for off in days],
            "o_orderpriority": ["3-MEDIUM"] * len(days),
        }
    )
    spark.createDataFrame(
        pdf,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    anchor = dt.date(1995, 6, 15)
    want = {}
    for i, off in enumerate(days, 1):
        dv = (base + dt.timedelta(days=off))
        month_start = dv.replace(day=1, hour=0, minute=0, second=0)
        want[i] = (
            dv.year,
            dv.month,
            dv.day,
            (dv.month - 1) // 3 + 1,
            dv.strftime("%Y-%m"),
            int(month_start.replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
            (dv.date() - anchor).days,
            dv.isoweekday() in (6, 7),  # Sat=6, Sun=7
        )
    got = {
        r["o_orderkey"]: (
            r["y"], r["m"], r["dom"], r["q"], r["ym"], r["month_start_ms"],
            r["days_from_anchor"], r["is_weekend"],
        )
        for r in r7b_dates(spark, d).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=st.lists(
        st.tuples(
            st.sampled_from(["view", "click"]),
            st.one_of(st.none(), st.integers(0, 99)),  # k value / missing
        ),
        min_size=1,
        max_size=15,
    )
)
def test_r7c_json_map_matches_bruteforce(spark, evs):
    """JSON + map battery re-derived: $.k extraction (NULL when the key is
    missing), modulo, map lookup, and to_json output SHAPE (a NULL k field
    is omitted entirely — mirrored byte-for-byte)."""
    import json as _json

    from orc_spark.plans.relational2 import r7c_json_map

    rows = []
    for i, (ty, k) in enumerate(evs):
        props = _json.dumps({"k": k} if k is not None else {})
        rows.append(
            {
                "event_id": i,
                "ts_us": i * 1_000_000,
                "user_id": 1,
                "event_type": ty,
                "value": 1.0,
                "props": props,
            }
        )
    sf = _write_events(spark, rows)
    want = {}
    for i, (ty, k) in enumerate(evs):
        j_out = (
            f'{{"id":{i},"k":{k}}}' if k is not None else f'{{"id":{i}}}'
        )
        want[i] = (k, k % 10 if k is not None else None, ty, 2, j_out)
    got = {
        r["event_id"]: (r["k_val"], r["k_mod"], r["m_type"], r["m_nkeys"],
                        r["j_out"])
        for r in r7c_json_map(spark, sf).collect()
    }
    assert got == want


def test_cu_pipeline_matches_composition_replay(spark):
    """The flagship curation pass replayed stage by stage in plain Python:
    quality score from raw string ops, md5 keep-best (longest text, tie ->
    smallest doc_id, among quality survivors), MinHash banded candidates
    (shingles -> h60 -> 16 perms -> 4 bands) with est >= CU_JACCARD_MIN and
    both ends surviving exact dedup dropping doc_b, then the per-(source,
    lang, status) audit — counts, char mass, token mass exact. Fixture is
    deterministic and exercises all four statuses."""
    import hashlib
    import re

    from orc_spark.functions.hashing import MERSENNE_P, MINHASH_PERMS, h60_py
    from orc_spark.plans.curation_q import (
        CU_JACCARD_MIN,
        CU_QUALITY_MIN,
        cu_pipeline,
    )
    from orc_spark.plans.dedup_q import (
        N_BANDS,
        N_PERM,
        ROWS_PER_BAND,
        SHINGLE_K,
    )
    from orc_spark.plans.text_q import STOPWORDS

    long_a = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "chases the fox around the old mill by the river all afternoon"
    )
    docs = [
        ("en", long_a),                      # 0: kept (keeper of digest)
        ("en", long_a),                      # 1: exact_dup of 0
        ("en", long_a + " again today"),     # 2: near_dup candidate vs 0
        ("en", "tiny"),                      # 3: low_quality (short)
        ("de", "der hund und die katze laufen durch den garten und "
               "spielen mit dem ball bis es dunkel wird am abend"),   # 4 kept
        ("de", "zz"),                        # 5: low_quality
        ("en", "a completely different long document about engines and "
               "the turbines that spin inside them all day and night"),  # 6
    ]
    sf = _write_documents(spark, docs)

    # stage 0: quality replay (same string ops as the tx_quality replay)
    def q_score(text):
        toks = re.split(r"\s+", text.strip(" "))
        n_toks = float(len(toks))
        n_stop = float(sum(1 for x in toks if x in STOPWORDS))
        mtl = (float(len(text)) - float(text.count(" "))) / n_toks
        return (
            min(n_toks / 100.0, 1.0) * 0.4
            + min(n_stop / n_toks * 5.0, 1.0) * 0.4
            + (0.2 if 3.0 <= mtl <= 10.0 else 0.0)
        )

    quality = {i: q_score(t) for i, (_, t) in enumerate(docs)}
    passed = {i for i in quality if quality[i] >= CU_QUALITY_MIN}

    # stage 2: md5 keep-best among quality survivors
    by_digest = {}
    for i, (_, t) in enumerate(docs):
        if i in passed:
            by_digest.setdefault(
                hashlib.md5(t.encode()).hexdigest(), []
            ).append(i)
    keepers = set()
    exact_dups = set()
    for ids in by_digest.values():
        best = min(ids, key=lambda i: (-len(docs[i][1]), i))
        keepers.add(best)
        exact_dups.update(set(ids) - {best})

    # stage 3: MinHash candidates over ALL docs, both-ends-keeper filter
    sigs = {}
    for i, (_, t) in enumerate(docs):
        lt = t.lower()
        n_pos = max(len(lt) - (SHINGLE_K - 1), 1)
        hs = {h60_py(lt[p : p + SHINGLE_K]) for p in range(n_pos)}
        sigs[i] = [
            min((a * (h % MERSENNE_P) + b) % MERSENNE_P for h in hs)
            for a, b in MINHASH_PERMS
        ]
    near_drops = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = sigs[a], sigs[b]
            if not any(
                sa[kb * ROWS_PER_BAND : (kb + 1) * ROWS_PER_BAND]
                == sb[kb * ROWS_PER_BAND : (kb + 1) * ROWS_PER_BAND]
                for kb in range(N_BANDS)
            ):
                continue
            est = sum(1 for j in range(N_PERM) if sa[j] == sb[j]) / N_PERM
            if est >= CU_JACCARD_MIN and a in keepers and b in keepers:
                near_drops.add(b)

    def status_of(i):
        if quality[i] < CU_QUALITY_MIN:
            return "low_quality"
        if i in exact_dups:
            return "exact_dup"
        if i in near_drops:
            return "near_dup"
        return "kept"

    statuses = {status_of(i) for i in range(len(docs))}
    assert statuses == {"low_quality", "exact_dup", "near_dup", "kept"}, (
        f"fixture must exercise all four statuses, got {statuses}"
    )

    want = {}
    for i, (lang, t) in enumerate(docs):
        key = ("synthetic", lang, status_of(i))
        n, ch, tk = want.get(key, (0, 0, 0))
        want[key] = (
            n + 1,
            ch + len(t),
            tk + len(re.split(r"\s+", t.strip(" "))),
        )
    got = {
        (r["source"], r["lang"], r["status"]): (
            r["n_docs"],
            r["sum_chars"],
            r["sum_tokens"],
        )
        for r in cu_pipeline(spark, sf).collect()
    }
    assert got == want


def test_ts_e2e_report_matches_composition_replay(spark):
    """The flagship e2e report replayed in plain Python over a deterministic
    events fixture: per-(user, event_type) series -> zero-padded median-15
    filter -> np.gradient jerk -> per-run rms/min/max -> per-group
    mean/var_samp -> Welch t/dof per metric x stat. Integers exact; float
    columns compared at 1e-9 relative (sum-order drift between Spark's
    incremental aggregates and Python's sum, same tolerance as the
    ts_welch replay)."""
    import math

    import pytest

    from orc_spark.plans.e2e_q import GROUPS, ts_e2e_report

    rng = np.random.RandomState(11)
    rows = []
    eid = 0
    for ui in range(1, 7):
        for et in ("click", "view", "purchase"):  # purchase must be filtered
            n = 12 + (ui * 3 + len(et)) % 9
            for j in range(n):
                rows.append(
                    {
                        "event_id": eid,
                        "ts_us": 1_000_000 * (j + 1) + ui,
                        "user_id": ui,
                        "event_type": et,
                        "value": round(float(rng.uniform(-4, 4)), 3),
                        "props": "{}",
                    }
                )
                eid += 1
    sf = _write_events(spark, rows)

    # replay: per-run series in (ts, event_id) order
    runs = {}
    for r in rows:
        if r["event_type"] in GROUPS:
            runs.setdefault((r["user_id"], r["event_type"]), []).append(
                (r["ts_us"], r["event_id"], r["value"])
            )
    per_run = {}
    for key, evs in runs.items():
        vals = [v for _, _, v in sorted(evs)]
        n = len(vals)
        filt = []
        for i in range(n):
            window = [
                vals[i + d] if 0 <= i + d < n else 0.0 for d in range(-7, 8)
            ]
            filt.append(sorted(window)[7])
        jerk = []
        for i in range(n):
            if n == 1:
                jerk.append(0.0)
            elif i == 0:
                jerk.append(filt[1] - filt[0])
            elif i == n - 1:
                jerk.append(filt[i] - filt[i - 1])
            else:
                jerk.append((filt[i + 1] - filt[i - 1]) / 2.0)
        stats = {}
        for m, series in (("value", filt), ("jerk", jerk)):
            stats[f"rms_{m}"] = math.sqrt(
                sum(x * x for x in series) / len(series)
            )
            stats[f"min_{m}"] = min(series)
            stats[f"max_{m}"] = max(series)
        per_run[key] = stats

    def group_stats(et):
        members = [per_run[k] for k in per_run if k[1] == et]
        out = {"n_runs": float(len(members))}
        for c in members[0]:
            xs = [s[c] for s in members]
            mean = sum(xs) / len(xs)
            var = sum((x - mean) ** 2 for x in xs) / (len(xs) - 1)
            out[f"avg_{c}"] = mean
            out[f"var_{c}"] = var
        return out

    on, off = group_stats(GROUPS[0]), group_stats(GROUPS[1])
    want = {}
    for m in ("value", "jerk"):
        row = {
            "n_runs_on": int(on["n_runs"]),
            "n_runs_off": int(off["n_runs"]),
        }
        for stat in ("rms", "min", "max"):
            c = f"{stat}_{m}"
            q1 = on[f"var_{c}"] / on["n_runs"]
            q2 = off[f"var_{c}"] / off["n_runs"]
            se2 = q1 + q2
            dof_den = q1 * q1 / (on["n_runs"] - 1) + q2 * q2 / (
                off["n_runs"] - 1
            )
            row[f"avg_{stat}_on"] = on[f"avg_{c}"]
            row[f"avg_{stat}_off"] = off[f"avg_{c}"]
            row[f"t_{stat}"] = (on[f"avg_{c}"] - off[f"avg_{c}"]) / math.sqrt(
                se2
            )
            row[f"dof_{stat}"] = se2 * se2 / dof_den
        want[m] = row

    got = {r["metric"]: r.asDict() for r in ts_e2e_report(spark, sf).collect()}
    assert set(got) == set(want)
    for m, wrow in want.items():
        grow = got[m]
        for c, wv in wrow.items():
            gv = grow[c]
            if isinstance(wv, int):
                assert gv == wv, (m, c, gv, wv)
            else:
                assert gv == pytest.approx(wv, rel=1e-9), (m, c, gv, wv)


def test_dd_cdc_chunks_matches_replay_and_survives_insertion(spark):
    """dd_cdc_chunks exact-value replay (h60_py boundaries + chunk digests,
    the same math as the engines) AND the operator's reason to exist:
    content-defined boundaries re-synchronize after an insertion, so a doc
    and its edited copy still share downstream chunks — where fixed-width
    chunking (cu_chunk) would shift every subsequent chunk."""
    import random

    from orc_spark.functions.hashing import h60_py
    from orc_spark.plans.dedup_q import CDC_K, CDC_MOD, dd_cdc_chunks

    rng = random.Random(97)
    body = "".join(
        rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(600)
    )
    texts = {
        1: body,
        2: body[:50] + "INSERTED EDIT " + body[50:],  # shifted copy
        3: "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(300)
        ),
        4: "xy",  # shorter than one gram: single whole-text chunk
    }

    def replay():
        per_doc = {}
        for doc, text in texts.items():
            t = text.lower()
            n = len(t)
            n_pos = max(n - (CDC_K - 1), 1)
            cuts = [
                p
                for p in range(2, n_pos + 1)
                if h60_py(t[p - 1 : p - 1 + CDC_K]) % CDC_MOD == 0
            ]
            starts, ends = [1] + cuts, cuts + [n + 1]
            per_doc[doc] = [
                h60_py(t[s - 1 : e - 1]) for s, e in zip(starts, ends)
            ]
        docs_of = {}
        for doc, digs in per_doc.items():
            for dg in set(digs):
                docs_of.setdefault(dg, set()).add(doc)
        out = {}
        for doc, digs in per_doc.items():
            shared = [dg for dg in digs if len(docs_of[dg]) > 1]
            x = 0
            for dg in digs:
                x ^= dg
            out[doc] = (
                len(digs),
                len(shared),
                _r6(len(shared) / len(digs)),
                x,
            )
        return out

    d = tempfile.mkdtemp(prefix="orc_props_cdc_")
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    got = {
        r["doc_id"]: (
            r["n_chunks"],
            r["n_shared_chunks"],
            r["shared_ratio"],
            r["chunks_xor"],
        )
        for r in dd_cdc_chunks(spark, d).collect()
    }
    want = replay()
    assert got == want
    # the CDC property: the edited copy still shares chunks with the
    # original (re-synchronized boundaries), the unrelated docs share none
    assert want[1][1] > 0 and want[2][1] > 0
    assert want[3][1] == 0 and want[4][1] == 0
