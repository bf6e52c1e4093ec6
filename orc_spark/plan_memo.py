"""Session-scoped memo for expensive deterministic subplans over the
immutable driver testdata.

Motive (r07 verdict, "What's wrong" #1): the five graph queries each rebuilt
the same ~0.7 s ``_mutual_knn_edges`` lineitem self-join before doing their
own work — ~3-4 s of the 74.6 s bench was one repeated subplan. The edge
definition is deterministic over immutable inputs, so the built (and
checkpointed) DataFrame can be shared per (session, sf dir), exactly like
``load_table``'s plan memo (orc_spark/sources/tables.py) and with the same
staleness rules:

* ONLY ``/root/testdata`` paths are cacheable — test fixtures writing fresh
  temp dirs always take the uncached path (a cached InMemoryFileIndex or
  checkpoint would go stale if the dir were rewritten).
* Entries keyed on stopped sessions are evicted (multi-session pytest runs
  must not pin dead sessions for the life of the process).

Checkpoint safety: a builder may ``localCheckpoint(eager=False)`` its
result. The persisted RDD ids created by the builder are captured (they
register in ``persistentRDDs`` immediately, before materializing — see
CLAUDE.md) and stored with the entry. On reuse the ids are re-validated
against the session's live ``persistentRDDs``: if an external cleaner
unpersisted them (a materialized-then-unpersisted local checkpoint CANNOT
be recomputed — lineage is truncated), the entry is discarded and rebuilt.
Cooperating cleaners (bench.py's between-query ``_drop_persisted``) consult
``pinned_rdd_ids`` so the shared frames survive their sweep; a one-edge-list
pin is a few MB at bench scale, not an accumulation hazard.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from orc_spark.sources.tables import evict_dead_sessions

# (session, abspath(sf_dir), tag) -> (DataFrame, frozenset of persisted RDD
# ids the builder created — empty for plain uncheckpointed plans)
_MEMO: dict = {}

# (session, abspath(sf_dir), "value:"+tag) -> plain Python value (memo_value)
_VALUE_MEMO: dict = {}

# Per-key in-flight locks (r13 ADVICE): without them two sweep threads that
# miss concurrently both run build(), and the `before` persistentRDDs
# snapshot taken outside any lock can attribute the OTHER builder's
# checkpoint ids to this entry — a later cleanup then spuriously fails the
# id revalidation (silent duplicate 240M-row rebuilds; correctness was never
# at risk). One lock per memo key serializes build + id attribution.
_BUILD_LOCKS: dict = {}

# Dirs whose contents never change after creation — the ONLY paths the memo
# may serve. Shared with load_table's plan memo (tables.CACHEABLE_PREFIXES
# is the single source of truth — the SAME list object, so an opt-in there
# enables both memos): scale-evidence scripts that materialize their own
# immutable replicas (scripts/dense_graph_check.py) and write-once test
# fixtures append their dir EXPLICITLY. Never add a mutable path: a cached
# checkpoint over a rewritten dir serves stale data silently.
from orc_spark.sources.tables import CACHEABLE_PREFIXES  # noqa: F401


def _persistent_ids(spark: SparkSession) -> set:
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(i) for i in jmap.keySet().toArray()}
    except Exception:  # noqa: BLE001 — a dead/odd session memoizes nothing
        return set()


def memo_subplan(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return ``build()``, memoized per (session, sf_dir, tag) when sf_dir
    is immutable driver testdata; always rebuilt otherwise."""
    from orc_spark.sources.tables import _MEMO_LOCK, _cacheable

    sf_abs = os.path.abspath(sf_dir)
    if not _cacheable(sf_abs):
        return build()
    key = (spark, sf_abs, tag)

    def _lookup():
        """Return the memoized frame iff its checkpoint ids are still live.
        Caller holds _MEMO_LOCK."""
        hit = _MEMO.get(key)
        if hit is None:
            return None
        df, ids = hit
        if ids <= _persistent_ids(spark):
            return df
        # an external cleaner dropped the checkpoint blocks — the frame
        # is unusable (truncated lineage), rebuild from scratch
        del _MEMO[key]
        return None

    with _MEMO_LOCK:  # dict bookkeeping only; build() runs outside it
        df = _lookup()
        if df is not None:
            return df
        evict_dead_sessions(_MEMO)
        evict_dead_sessions(_BUILD_LOCKS)  # same (session, ...) key shape
        build_lock = _BUILD_LOCKS.setdefault(key, __import__("threading").Lock())
    # Serialize the build per key: the thread that wins runs build() with an
    # exact `before` snapshot (no concurrent builder for THIS key can leak
    # its ids in); losers re-check the memo and return the winner's frame.
    with build_lock:
        with _MEMO_LOCK:
            df = _lookup()
            if df is not None:
                return df
            before = _persistent_ids(spark)
        df = build()
        with _MEMO_LOCK:
            _MEMO[key] = (df, frozenset(_persistent_ids(spark) - before))
    return df


def memo_value(spark: SparkSession, sf_dir: str, tag: str, compute: Callable):
    """Like ``memo_subplan`` but for a plain Python value (a scalar count,
    a small collected pandas frame) derived deterministically from the
    immutable driver testdata — e.g. the shared edge-frame row count that
    gates the graph local finishes, or the ANN probe set four mm_q queries
    collect identically. Same cacheability rules: only `/root/testdata`
    (and explicitly opted-in immutable replicas) are served from the memo;
    test fixtures always recompute. Values hold no RDDs, so there is no
    checkpoint-id revalidation; the first consumer per (session, sf) runs
    ``compute()`` (the Spark job still happens once per session — this is
    within-session sharing of a deterministic subresult, NOT cross-run
    result caching)."""
    from orc_spark.sources.tables import _MEMO_LOCK, _cacheable

    sf_abs = os.path.abspath(sf_dir)
    if not _cacheable(sf_abs):
        return compute()
    key = (spark, sf_abs, "value:" + tag)
    with _MEMO_LOCK:
        if key in _VALUE_MEMO:
            return _VALUE_MEMO[key]
        evict_dead_sessions(_VALUE_MEMO)
        lock = _BUILD_LOCKS.setdefault(key, __import__("threading").Lock())
    with lock:
        with _MEMO_LOCK:
            if key in _VALUE_MEMO:
                return _VALUE_MEMO[key]
        val = compute()
        with _MEMO_LOCK:
            _VALUE_MEMO[key] = val
    return val


def pinned_rdd_ids(spark: SparkSession) -> set:
    """Persisted RDD ids owned by live memo entries of this session —
    cache cleaners must skip these (dropping a local checkpoint kills the
    memoized frame for every later consumer in the session)."""
    return {
        i
        for (s, _, _), (_, ids) in _MEMO.items()
        if s is spark
        for i in ids
    }
