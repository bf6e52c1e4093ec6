"""Value-level brute-force replays for the io_* layout queries.

These three queries already carry MECHANISM evidence (measured footer-stat
/ partition / stride skipping in tests/test_zorder.py and
tests/test_io_functions.py) and a DuckDB oracle; what was missing
(scripts/replay_inventory.py) is oracle-independent VALUE evidence that
the registry queries themselves aggregate correctly after their layout
rewrite. Each test runs the REAL registry query against sf0.001 and
compares every output value to a plain pandas/numpy recompute from the
raw parquet — independent of both Spark's aggregate machinery and the SQL
oracle's algebra.

Rounding note: Spark F.round is HALF_UP (away from zero for negatives);
Python round() is banker's — the replays use sign(v)*floor(|v|+0.5).
"""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _half_up(v: np.ndarray) -> np.ndarray:
    # Mirror Spark F.round's HALF_UP exactly: BigDecimal.valueOf(double)
    # rounds the SHORTEST-REPR decimal, so 0.49999999999999994 → 0, whereas
    # sign*floor(|v|+0.5) would float-add it to exactly 1.0 and flag a false
    # mismatch within one ulp of a .5 boundary (r12 ADVICE).
    from decimal import ROUND_HALF_UP, Decimal

    # Non-finite values propagate unchanged (Decimal('nan').quantize raises
    # InvalidOperation; a NaN input should surface as a value mismatch in
    # the caller's assert, not a crash here — r13 ADVICE).
    return np.array(
        [
            float(Decimal(repr(float(x))).quantize(Decimal("1"), ROUND_HALF_UP))
            if np.isfinite(x)
            else float(x)
            for x in np.asarray(v).ravel()
        ]
    ).reshape(np.shape(v))


def test_io_zorder_values_match_bruteforce(spark):
    from orc_spark.plans.e2e_q import io_zorder

    got = {
        r["l_returnflag"]: r for r in io_zorder(spark, SF).collect()
    }

    li = pq.read_table(
        os.path.join(SF, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_returnflag",
        ],
    ).to_pandas()
    mp, ms = int(li["l_partkey"].max()), int(li["l_suppkey"].max())
    lo1, hi1 = mp // 4, mp // 4 + mp // 8
    lo2, hi2 = ms // 4, ms // 4 + ms // 8
    sel = li[
        li["l_partkey"].between(lo1, hi1) & li["l_suppkey"].between(lo2, hi2)
    ]
    assert len(sel) > 0, "rectangle selected nothing — test is vacuous"
    want_flags = set(sel["l_returnflag"])
    assert set(got) == want_flags
    for flag, g in sel.groupby("l_returnflag"):
        r = got[flag]
        assert r["n_rows"] == len(g)
        assert r["price_cents"] == int(
            _half_up(g["l_extendedprice"].to_numpy() * 100).sum()
        )
        assert r["qty"] == int(_half_up(g["l_quantity"].to_numpy()).sum())
        assert r["min_ok"] == int(g["l_orderkey"].min())
        assert r["max_ok"] == int(g["l_orderkey"].max())


def _events_pdf() -> pd.DataFrame:
    ev = pq.read_table(os.path.join(SF, "events.parquet")).to_pandas()
    # mirror load_table's ts normalization: bigint epoch MICROS
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    return ev


def test_io_partition_prune_values_match_bruteforce(spark):
    from orc_spark.plans.e2e_q import io_partition_prune

    got = [tuple(r) for r in io_partition_prune(spark, SF).collect()]

    ev = _events_pdf()
    day = ev["ts_us"] // 86_400_000_000
    d0 = int(day.min())
    sel = ev[(ev["event_type"] == "purchase") & day.between(d0 + 2, d0 + 4)]
    assert len(sel) > 0, "window selected nothing — test is vacuous"
    want = []
    for d, g in sel.groupby(sel["ts_us"] // 86_400_000_000):
        v = g["value"].to_numpy()
        v = v[~np.isnan(v)]
        want.append(
            (
                int(d),
                len(g),
                int(g["user_id"].nunique()),
                int(_half_up(v * 100).sum()),
            )
        )
    assert got == sorted(want)


def test_io_orc_roundtrip_values_match_bruteforce(spark):
    from orc_spark.plans.e2e_q import io_orc_roundtrip

    got = {r["event_type"]: r for r in io_orc_roundtrip(spark, SF).collect()}

    ev = _events_pdf()
    assert set(got) == set(ev["event_type"].unique())
    for et, g in ev.groupby("event_type"):
        r = got[et]
        assert r["n_events"] == len(g)
        assert r["n_users"] == int(g["user_id"].nunique())
        assert r["min_event_id"] == int(g["event_id"].min())
        assert r["max_event_id"] == int(g["event_id"].max())
        # double sums accumulate in engine-specific order; the replay
        # compares at 1e-9 relative (counts/extrema above are exact)
        want_sum = float(g["value"].dropna().sum())
        assert abs(r["sum_value"] - want_sum) <= 1e-9 * max(
            1.0, abs(want_sum)
        )
