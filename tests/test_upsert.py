"""CDC upsert (MERGE INTO) semantics: batch merge correctness against a
pandas oracle, and the foreachBatch streaming maintenance producing the
same snapshot as one batch merge over all changes (stream == batch)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from orc_spark.streaming.upsert import apply_changes_stream, merge_upsert

BASE_ROWS = [(k, f"v{k}", 0) for k in range(10)]
# change log: multiple versions per key inside and across batches
BATCH1 = [
    (1, "v1a", 1, "u"),
    (1, "v1b", 2, "u"),   # same key twice in one batch — latest wins
    (2, None, 1, "d"),    # delete
    (10, "v10", 1, "u"),  # brand-new key
]
BATCH2 = [
    (1, "v1c", 3, "u"),   # update again in a later batch
    (10, None, 2, "d"),   # delete the key inserted in batch 1
    (2, "v2b", 2, "u"),   # re-insert a deleted key
    (11, "v11", 1, "u"),
]


def _base_df(spark):
    return spark.createDataFrame(BASE_ROWS, "k int, val string, ver int")


def _changes_df(spark, rows):
    return spark.createDataFrame(rows, "k int, val string, ver int, op string")


def _expected():
    # keys 0..9 minus updated/deleted, plus surviving inserts
    rows = {k: (k, f"v{k}", 0) for k in range(10)}
    rows[1] = (1, "v1c", 3)
    rows[2] = (2, "v2b", 2)
    rows[11] = (11, "v11", 1)  # key 10: inserted then deleted — absent
    return pd.DataFrame(sorted(rows.values()), columns=["k", "val", "ver"])


def _canon(pdf):
    return pdf.sort_values("k", ignore_index=True)


def test_merge_upsert_batch(spark):
    out = merge_upsert(
        _base_df(spark), _changes_df(spark, BATCH1 + BATCH2), ["k"], "ver"
    ).toPandas()
    pd.testing.assert_frame_equal(_canon(out), _expected(), check_dtype=False)


def test_merge_upsert_delete_wins_at_same_version(spark):
    changes = _changes_df(spark, [(3, "v3x", 5, "u"), (3, None, 5, "d")])
    out = merge_upsert(_base_df(spark), changes, ["k"], "ver").toPandas()
    assert 3 not in set(out["k"])


def test_stream_upsert_equals_batch(spark, tmp_path):
    snap = str(tmp_path / "snapshot")
    chk = str(tmp_path / "chk")
    src = str(tmp_path / "changes_in")
    os.makedirs(src)
    _base_df(spark).write.parquet(snap)
    # two change files → two micro-batches (maxFilesPerTrigger=1)
    _changes_df(spark, BATCH1).coalesce(1).write.parquet(str(tmp_path / "b1"))
    _changes_df(spark, BATCH2).coalesce(1).write.parquet(str(tmp_path / "b2"))
    for i, b in enumerate(["b1", "b2"]):
        for f in os.listdir(str(tmp_path / b)):
            if f.endswith(".parquet"):
                os.rename(
                    str(tmp_path / b / f), os.path.join(src, f"{i:02d}.parquet")
                )
    stream = (
        spark.readStream.schema("k int, val string, ver int, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = apply_changes_stream(stream, snap, ["k"], "ver", chk).start()
    q.awaitTermination(120)
    got = spark.read.parquet(snap).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _expected(), check_dtype=False)


def test_merge_upsert_random_sequences_match_model(spark):
    """Property: for random change logs, merge_upsert == a dict-replay
    model (highest version per key wins; delete beats upsert on a version
    tie). Change logs are deduped on (k, ver, op) so the only engine
    tie-break left is the one the operator defines."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        base_keys = rng.sample(range(30), 12)
        base_rows = [(k, f"b{k}", 0) for k in base_keys]
        seen, changes = set(), []
        for i in range(40):
            k = rng.randrange(30)
            op = "d" if rng.random() < 0.3 else "u"
            ver = rng.randrange(1, 6)
            if (k, ver, op) in seen:
                continue
            seen.add((k, ver, op))
            changes.append((k, f"c{k}_{i}" if op == "u" else None, ver, op))
        latest = {}
        for k, val, ver, op in changes:
            rank = (ver, 1 if op == "d" else 0)  # delete wins a version tie
            if k not in latest or rank > latest[k][0]:
                latest[k] = (rank, val, op)
        model = {k: f"b{k}" for k in base_keys}
        for k, (_rank, val, op) in latest.items():
            if op == "d":
                model.pop(k, None)
            else:
                model[k] = val
        base = spark.createDataFrame(base_rows, "k int, val string, ver int")
        got = merge_upsert(
            base, _changes_df(spark, changes), ["k"], "ver"
        ).toPandas()
        got_map = dict(zip(got["k"], got["val"]))
        assert got_map == model, f"trial {trial}"
