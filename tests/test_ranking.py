"""operators/ranking.py — the ntile-without-a-global-sort machinery behind
ev_rfm (VERDICT r14 directive 2).

Contract under test: boundary-key quintile scoring is BIT-IDENTICAL to
F.ntile over a single-partition window, on every n (including n < tiles),
under heavy value ties, and on BOTH the bounded-Arrow local path and the
distributed iterative-narrowing path (cap forced to 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from orc_spark.operators import ranking
from orc_spark.operators.ranking import (
    multi_metric_boundary_keys,
    ntile_boundary_ranks,
    order_stat_keys,
    tile_from_boundaries,
)


def _frame(spark, pairs):
    """(s, id) rows as a DataFrame without parallelize's 32-partition spray
    (the sk_countmin range+explode pattern from CLAUDE.md)."""
    arr = ", ".join(f"named_struct('s', {s}L, 'id', {i}L)" for s, i in pairs)
    return spark.range(0, 1, 1, 1).select(
        F.explode(F.expr(f"array({arr})")).alias("x")
    ).select("x.s", "x.id")


def _ntile_ref(df):
    w = Window.orderBy(F.col("s").asc(), F.col("id").asc())
    return {
        (r["s"], r["id"]): r["t"]
        for r in df.select("s", "id", F.ntile(5).over(w).alias("t")).collect()
    }


def _boundary_scores(df, cap=None):
    n = df.count()
    b = ntile_boundary_ranks(n, 5)
    keys_by_rank = order_stat_keys(df, b, cap=cap, n=n)
    keys = [keys_by_rank[r] for r in b if r in keys_by_rank]
    return {
        (r["s"], r["id"]): r["t"]
        for r in df.select(
            "s",
            "id",
            tile_from_boundaries(F.col("s"), F.col("id"), keys).alias("t"),
        ).collect()
    }


CASES = [
    # n < 5 (duplicate boundary ranks), exact-multiple, ragged, heavy ties
    [(7, 1)],
    [(3, 1), (3, 2), (1, 3)],
    [(5, i) for i in range(1, 6)],
    [(i % 4, i) for i in range(1, 24)],
    [(1, i) for i in range(1, 18)] + [(2, 100), (0, 101)],  # 1 dominant value
    [(10 - i, i) for i in range(1, 14)],
]


@pytest.mark.parametrize("pairs", CASES, ids=range(len(CASES)))
def test_boundary_scoring_equals_ntile_local_path(spark, pairs):
    df = _frame(spark, pairs)
    assert _boundary_scores(df) == _ntile_ref(df)


@pytest.mark.parametrize("pairs", CASES, ids=range(len(CASES)))
def test_boundary_scoring_equals_ntile_distributed_path(spark, pairs):
    """cap=1 forces the iterative-narrowing path (histogram rounds + tie
    fallback + id narrowing) on every case."""
    df = _frame(spark, pairs)
    assert _boundary_scores(df, cap=1) == _ntile_ref(df)


def test_distributed_path_on_larger_tied_frame(spark):
    """A frame large enough for several narrowing rounds, with ~40% of rows
    tied on one value so the exact-per-value tie path runs for at least
    one boundary; distributed keys must equal local keys exactly."""
    df = spark.range(0, 800, 1, 8).select(
        F.when(F.col("id") % 5 < 2, F.lit(17))
        .otherwise((F.col("id") * 37) % 211)
        .cast("bigint")
        .alias("s"),
        F.col("id").cast("bigint").alias("id"),
    )
    b = ntile_boundary_ranks(800, 5)
    local = order_stat_keys(df, b, n=800)
    dist = order_stat_keys(df, b, cap=32, n=800)
    assert dist == local


def test_multi_metric_signed_space(spark):
    """Descending metrics score via sign=-1: verify against ntile DESC."""
    df = spark.range(0, 60, 1, 4).select(
        ((F.col("id") * 13) % 7).cast("bigint").alias("v"),
        F.col("id").cast("bigint").alias("id"),
    )
    keys = multi_metric_boundary_keys(
        df, "id", [("v", -1)], ntile_boundary_ranks(60, 5)
    )["v"]
    got = {
        (r["v"], r["id"]): r["t"]
        for r in df.select(
            "v",
            "id",
            tile_from_boundaries(
                (F.col("v") * -1).cast("bigint"), F.col("id"), keys
            ).alias("t"),
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    ref = {
        (r["v"], r["id"]): r["t"]
        for r in df.select("v", "id", F.ntile(5).over(w).alias("t")).collect()
    }
    assert got == ref


def test_null_metric_scores_nulls_last(spark):
    """NULL metrics (the nullheavy sweep shape: a user whose purchase
    values are all NULL) must score like desc_nulls_last ntile — the
    sentinel path in signed_metric / the pandas local finish."""
    from orc_spark.operators.ranking import signed_metric

    df = spark.range(0, 40, 1, 4).select(
        F.when(F.col("id") % 3 == 0, F.lit(None))
        .otherwise((F.col("id") * 7) % 11)
        .cast("bigint")
        .alias("v"),
        F.col("id").cast("bigint").alias("id"),
    )
    keys = multi_metric_boundary_keys(
        df, "id", [("v", -1)], ntile_boundary_ranks(40, 5)
    )["v"]
    got = {
        r["id"]: r["t"]
        for r in df.select(
            "id",
            tile_from_boundaries(
                signed_metric(F.col("v"), -1), F.col("id"), keys
            ).alias("t"),
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc_nulls_last(), F.col("id").asc())
    ref = {
        r["id"]: r["t"]
        for r in df.select("id", F.ntile(5).over(w).alias("t")).collect()
    }
    assert got == ref


def test_ev_rfm_distributed_equals_local(spark, sf_small, monkeypatch):
    """ev_rfm end-to-end: the cap-forced distributed boundary selection must
    reproduce the default (local-finish) result bit-for-bit — the same
    equality contract every graph local-finish cap carries."""
    from orc_spark.plans.cdc_q import ev_rfm

    baseline = sorted(map(tuple, ev_rfm(spark, sf_small).collect()))
    monkeypatch.setattr(ranking, "ORDER_STAT_LOCAL_CAP", 1)
    forced = sorted(map(tuple, ev_rfm(spark, sf_small).collect()))
    assert forced == baseline
