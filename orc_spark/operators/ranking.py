"""Scale-safe positional quantile scoring (the ntile-without-a-global-sort
operator).

``ntile(K) OVER (ORDER BY ...)`` is the classic WindowExec "moving all data
to a single partition" hazard: one task sorts the whole frame. But ntile is
purely POSITIONAL — a row's tile depends only on its global rank r and the
total count n:

    tile(r) = 1 + #{k in 1..K-1 : r > b_k}

where b_k are the cumulative ceil-balanced tile sizes. And since the sort
key (s, id) is a total order (id unique), ``r > b_k`` holds iff the row's
key is strictly after the key of the row AT rank b_k. So K-1 exact boundary
KEYS replace the global sort with a narrow per-row comparison against
literals — no exchange over the scored frame at all.

Boundary keys are k-th order statistics, computed here with the repo's
bounded-local-finish policy (the gr_kcore pattern applied to selection):

* n ≤ cap — ONE Arrow ``toPandas`` handoff of the (s, id) int64 columns
  (~16 B/row/col, CLAUDE.md's measured transfer budget) and an
  ``np.lexsort``; this is the path every test-scale run takes.
* n > cap — iterative bucketed narrowing, fully distributed: approximate
  ``percentile_approx`` thresholds cut the candidate interval, EXACT bucket
  counts (one map-side-combined groupBy per round) locate the target rank's
  bucket, and the loop recurses into it — O(log_B n) rounds, each a
  predicate-pushed scan of a geometrically shrinking set. A value so tied
  it fills a whole bucket switches to narrowing on the unique id within
  that one value's run (guaranteed shrink). The returned keys are EXACT and
  bucketing-independent, so both paths give bit-identical scores
  (equality-tested in tests/test_ranking.py).

Used by plans/cdc_q.ev_rfm (VERDICT r14 directive 2). Public-knowledge
algorithm: distributed selection via iterative refinement is textbook
(e.g. the classic median-of-medians/bucket histogram selection family).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bounded driver handoff for the local finish: 2M rows × 2 int64 Arrow
# columns ≈ 32 MB — the same budget class as gr_pagerank's 4M-edge cap.
ORDER_STAT_LOCAL_CAP = 2_000_000

# NULL metrics sort LAST (matching Spark desc_nulls_last / DuckDB's
# NULLS-LAST default): in signed s-space that is a sentinel above any real
# metric (|metric| < 2^53 so the sentinel is also exact in the float64
# frames Arrow hands back for nullable bigint columns).
NULL_LAST_SENTINEL = 1 << 62


def signed_metric(col: Column, sign: int) -> Column:
    """The canonical s-space expression for one metric: sign-flipped for
    descending order, NULLs coalesced to the nulls-last sentinel. Scoring
    and boundary selection MUST build s identically — this is that single
    definition."""
    return F.coalesce(
        (col * sign).cast("bigint"), F.lit(NULL_LAST_SENTINEL)
    )

# Distinct-value ceiling for the exact per-value histogram taken when
# percentile thresholds cannot cut a bucket (possible only when one value
# carries ≥ ~1/B of the candidate mass, so the candidate set holds few
# distinct values; 10k rows collected is a trivial driver transfer).
_TIE_DISTINCT_CAP = 10_000

_HIST_BUCKETS = 64
_PCT_ACCURACY = 10_000


def ntile_boundary_ranks(n: int, k: int) -> list[int]:
    """The k-1 boundary ranks b_1..b_{k-1} (cumulative ceil-balanced tile
    sizes) of ntile(k) over n rows. May contain duplicates when n < k —
    the closed form above still scores correctly."""
    q, rem = divmod(n, k)
    sizes = [q + 1] * rem + [q] * (k - rem)
    out, cum = [], 0
    for s in sizes[: k - 1]:
        cum += s
        out.append(cum)
    return out


def tile_from_boundaries(
    s: Column, id_col: Column, keys: list[tuple[int, int]]
) -> Column:
    """Tile number (1-based) of a row with sort key (s, id) given the exact
    boundary keys, ordered ASC on (s, id). Pure codegen — literals only."""
    if not keys:
        return F.lit(1)
    after = [
        ((s > F.lit(sb)) | ((s == F.lit(sb)) & (id_col > F.lit(ib)))).cast(
            "int"
        )
        for sb, ib in keys
    ]
    return F.lit(1) + reduce(lambda a, b: a + b, after)


def order_stat_keys(
    per_s: DataFrame,
    ranks: list[int],
    cap: int | None = None,
    n: int | None = None,
) -> dict[int, tuple[int, int]]:
    """Exact (s, id) key at each 1-based rank under ORDER BY s ASC, id ASC.

    ``per_s`` must have bigint columns ``s`` and ``id`` with ``id`` unique.
    Runs Spark jobs eagerly (this is a plan-construction helper, like the
    graph convergence loops). Ranks outside [1, n] are dropped.
    """
    # cap must be >= 1: the distributed loops terminate via the bounded
    # collect, which a cap of 0 would never reach
    cap = max(1, ORDER_STAT_LOCAL_CAP if cap is None else cap)
    if n is None:
        n = per_s.count()
    want = sorted({r for r in ranks if 1 <= r <= n})
    if not want:
        return {}
    if n <= cap:
        import numpy as np

        pdf = per_s.select("s", "id").toPandas()
        sv = pdf["s"].to_numpy()
        iv = pdf["id"].to_numpy()
        order = np.lexsort((iv, sv))
        return {
            r: (int(sv[order[r - 1]]), int(iv[order[r - 1]])) for r in want
        }
    return {r: _one_order_stat(per_s, r, cap) for r in want}


def multi_metric_boundary_keys(
    per: DataFrame,
    id_col: str,
    metrics: list[tuple[str, int]],
    ranks: list[int],
    cap: int | None = None,
    n: int | None = None,
) -> dict[str, list[tuple[int, int]]]:
    """Boundary keys for several (column, sign) metrics of ONE frame —
    sign +1 = ascending, -1 = descending; keys come back in SIGNED s-space
    (compare against ``(col * sign)``). The local finish pays a single
    Arrow handoff for all metrics; above the cap each metric runs its own
    distributed selection. Duplicate ranks (n < tiles) are preserved in
    the returned lists."""
    cap = max(1, ORDER_STAT_LOCAL_CAP if cap is None else cap)
    if n is None:
        n = per.count()
    want = sorted({r for r in ranks if 1 <= r <= n})
    if not want:
        return {m: [] for m, _ in metrics}
    out: dict[str, list[tuple[int, int]]] = {}
    if n <= cap:
        pdf = per.select(id_col, *[m for m, _ in metrics]).toPandas()
        return multi_metric_boundary_keys_pdf(pdf, id_col, metrics, ranks)
    for m, sign in metrics:
        per_s = per.select(
            signed_metric(F.col(m), sign).alias("s"),
            F.col(id_col).alias("id"),
        )
        keys = order_stat_keys(per_s, ranks, cap=cap, n=n)
        out[m] = [keys[r] for r in ranks if r in keys]
    return out


def multi_metric_boundary_keys_pdf(
    pdf, id_col: str, metrics: list[tuple[str, int]], ranks: list[int]
) -> dict[str, list[tuple[int, int]]]:
    """Local-finish half of :func:`multi_metric_boundary_keys`, exposed so
    a caller that already paid the bounded Arrow handoff (ev_rfm folds its
    stream-end anchor into the same fetch) can reuse the pandas frame
    instead of a second toPandas job."""
    import numpy as np

    n = len(pdf)
    want = sorted({r for r in ranks if 1 <= r <= n})
    if not want:
        return {m: [] for m, _ in metrics}
    ids = pdf[id_col].to_numpy()
    out: dict[str, list[tuple[int, int]]] = {}
    for m, sign in metrics:
        sv = pdf[m].to_numpy() * sign
        if sv.dtype.kind == "f":
            # Arrow hands nullable bigint back as float64 + NaN; mirror
            # signed_metric's nulls-last sentinel (exact in float64)
            sv = np.nan_to_num(sv, nan=float(NULL_LAST_SENTINEL))
        sv = sv.astype(np.int64, copy=False)
        order = np.lexsort((ids, sv))
        keys = {
            r: (int(sv[order[r - 1]]), int(ids[order[r - 1]])) for r in want
        }
        out[m] = [keys[r] for r in ranks if r in keys]
    return out


def _collect_sorted_key(cand: DataFrame, local_rank: int) -> tuple[int, int]:
    """Bounded local finish: lexsort the (small) candidate set on the
    driver and return the key at ``local_rank`` (1-based)."""
    import numpy as np

    pdf = cand.select("s", "id").toPandas()
    sv = pdf["s"].to_numpy()
    iv = pdf["id"].to_numpy()
    order = np.lexsort((iv, sv))
    i = order[local_rank - 1]
    return (int(sv[i]), int(iv[i]))


def _bucketize(col: Column, ths: list[int]) -> Column:
    """Bucket index 0..len(ths): #thresholds strictly below the value."""
    terms = [(col > F.lit(int(t))).cast("int") for t in ths]
    return reduce(lambda a, b: a + b, terms)


def _histogram_narrow(
    cand: DataFrame, col: str, resid: int
) -> tuple[int | None, int | None, int]:
    """One narrowing round on ``col``: approximate thresholds, exact bucket
    counts, locate the bucket holding local rank ``resid``. Returns
    (bucket_lo, bucket_hi, rows_before_bucket) — the bucket interval is
    (bucket_lo, bucket_hi], None = unbounded on that side."""
    probs = [i / _HIST_BUCKETS for i in range(1, _HIST_BUCKETS)]
    row = cand.agg(
        F.percentile_approx(col, probs, _PCT_ACCURACY).alias("t")
    ).collect()[0]
    ths = sorted({int(t) for t in (row["t"] or []) if t is not None})
    if not ths:
        return None, None, 0
    counts = {
        r["b"]: r["c"]
        for r in cand.groupBy(_bucketize(F.col(col), ths).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    cum = 0
    for j in range(len(ths) + 1):
        c = counts.get(j, 0)
        if cum + c >= resid:
            lo = ths[j - 1] if j >= 1 else None
            hi = ths[j] if j < len(ths) else None
            return lo, hi, cum
        cum += c
    raise RuntimeError("order-stat narrowing lost the target rank")


def _one_order_stat(
    per_s: DataFrame, rank: int, cap: int
) -> tuple[int, int]:
    """Distributed path: narrow on s until the candidate set is bounded,
    falling to an exact per-value histogram + id narrowing when a single
    tied value fills the bucket."""
    lo: int | None = None
    hi: int | None = None
    offset = 0
    while True:
        cand = per_s
        if lo is not None:
            cand = cand.where(F.col("s") > F.lit(lo))
        if hi is not None:
            cand = cand.where(F.col("s") <= F.lit(hi))
        cnt = cand.count()
        if cnt <= cap:
            return _collect_sorted_key(cand, rank - offset)
        nlo, nhi, before = _histogram_narrow(cand, "s", rank - offset)
        # intersect the target bucket with the current interval; loop while
        # that makes progress (when it doesn't, every other bucket was
        # empty, so `before` is 0 and no offset is owed)
        lo2 = nlo if (nlo is not None and (lo is None or nlo > lo)) else lo
        hi2 = nhi if (nhi is not None and (hi is None or nhi < hi)) else hi
        if (lo2, hi2) != (lo, hi):
            offset += before
            lo, hi = lo2, hi2
            continue
        # bucket would not shrink: the rank falls inside one dominant
        # value's run. Resolve the value with an EXACT per-value histogram
        # (few distinct values by construction), then select the id within
        # that run by narrowing on the unique id.
        d = cand.select("s").distinct().count()
        if d > _TIE_DISTINCT_CAP:  # pragma: no cover — defensive
            raise RuntimeError(
                f"order-stat tie path saw {d} distinct values; "
                "raise _PCT_ACCURACY or ORDER_STAT_LOCAL_CAP"
            )
        vals = sorted(
            (
                (r["s"], r["c"])
                for r in cand.groupBy("s")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            ),
        )
        resid = rank - offset
        for v, c in vals:
            if c >= resid:
                return (int(v), _id_at_rank(per_s, int(v), resid, cap))
            resid -= c
        raise RuntimeError("order-stat tie path lost the target rank")


def _id_at_rank(per_s: DataFrame, v: int, resid: int, cap: int) -> int:
    """The ``resid``-th smallest id among rows with s == v. The id is
    unique, so histogram narrowing shrinks geometrically every round."""
    base = per_s.where(F.col("s") == F.lit(v)).select(
        F.col("id").alias("s"), F.col("id").alias("id")
    )
    lo: int | None = None
    hi: int | None = None
    while True:
        run = base
        if lo is not None:
            run = run.where(F.col("s") > F.lit(lo))
        if hi is not None:
            run = run.where(F.col("s") <= F.lit(hi))
        cnt = run.count()
        if cnt <= cap:
            return _collect_sorted_key(run, resid)[1]
        nlo, nhi, before = _histogram_narrow(run, "s", resid)
        lo2 = nlo if (nlo is not None and (lo is None or nlo > lo)) else lo
        hi2 = nhi if (nhi is not None and (hi is None or nhi < hi)) else hi
        if (lo2, hi2) == (lo, hi):  # pragma: no cover — ids always split
            raise RuntimeError("id narrowing failed to shrink")
        resid -= before
        lo, hi = lo2, hi2
