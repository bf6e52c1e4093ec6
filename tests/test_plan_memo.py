"""plan_memo: session-shared deterministic subplans (the graph edge list).

The contract under test (r07 verdict directive #2):
* /root/testdata paths are memoized per (session, sf, tag) — same object back;
* mutable (temp-dir) paths ALWAYS rebuild — fixtures never see stale plans;
* checkpoint RDD ids created by the builder are captured and pinned, and an
  external unpersist of those blocks invalidates the entry (rebuild, never a
  'Checkpoint block not found' crash);
* the memoized frame returns the same ROWS as a fresh build (gr_* parity is
  covered by the registry sweep; this pins the mechanism itself).
"""

import pytest

import orc_spark.plan_memo as pm


def _persistent_ids(spark):
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def test_memo_identity_and_fixture_bypass(spark, sf_small, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5)

    a = pm.memo_subplan(spark, sf_small, "t_identity", build)
    b = pm.memo_subplan(spark, sf_small, "t_identity", build)
    assert a is b and calls["n"] == 1
    # mutable path: every call rebuilds
    c = pm.memo_subplan(spark, str(tmp_path), "t_identity", build)
    d = pm.memo_subplan(spark, str(tmp_path), "t_identity", build)
    assert calls["n"] == 3 and c is not d


def test_memo_checkpoint_pinned_and_invalidated(spark, sf_small):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(7).localCheckpoint(eager=False)

    df = pm.memo_subplan(spark, sf_small, "t_ckpt", build)
    ids = pm._MEMO[(spark, sf_small, "t_ckpt")][1]
    assert ids, "builder's pending checkpoint must register an RDD id"
    assert ids <= pm.pinned_rdd_ids(spark)
    assert df.count() == 7  # materialize the checkpoint
    # valid entry → reuse, no rebuild
    assert pm.memo_subplan(spark, sf_small, "t_ckpt", build) is df
    assert calls["n"] == 1
    # an external cleaner drops the blocks → entry invalid → rebuild
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet().toArray()):
        if int(rid) in ids:
            jmap.get(rid).unpersist(False)
    df2 = pm.memo_subplan(spark, sf_small, "t_ckpt", build)
    assert calls["n"] == 2 and df2 is not df
    assert df2.count() == 7
    # the stale ids are no longer pinned; the new entry's are
    assert not (ids & pm.pinned_rdd_ids(spark))


def test_mutual_knn_edges_memoized_and_correct(spark, sf_small):
    import orc_spark.plans.graph_q as gq

    a = gq._mutual_knn_edges(spark, sf_small)
    b = gq._mutual_knn_edges(spark, sf_small)
    assert a is b, "edge build must be shared across graph queries"
    fresh = gq._mutual_knn_edges_build(spark, sf_small)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, fresh.collect()))


def test_dead_session_entries_evicted(spark, sf_small):
    class FakeStoppedSession:
        class _SC:
            _jsc = None

        sparkContext = _SC()

        def __hash__(self):
            return id(self)

    dead = FakeStoppedSession()
    pm._MEMO[(dead, sf_small, "t_dead")] = (None, frozenset())
    pm.memo_subplan(spark, sf_small, "t_evict_probe", lambda: spark.range(1))
    assert (dead, sf_small, "t_dead") not in pm._MEMO
