"""Incremental CDC upsert (MERGE INTO) maintenance.

The batch operator `merge_upsert` is the MERGE semantics: latest change
per key wins (ordered by a version column), deletes drop the key,
everything else inserts/overwrites. The streaming path maintains a keyed
snapshot table incrementally with `foreachBatch`: each micro-batch of
changes is first reduced to its per-key latest (change batches can carry
multiple versions of a key), then merged against the current snapshot.

Scale shape: one shuffle by key per merge (the window), and the snapshot
join is keyed — at 100 TB the snapshot would live partitioned/bucketed by
key so the merge join is co-located; deletes are tombstones filtered on
write. foreachBatch gives exactly-once via the checkpointed batch id, the
standard Spark CDC-sink recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(changes: DataFrame, keys: list[str], version_col: str) -> DataFrame:
    """Reduce a change set to the latest version per key (ties broken by
    the op column so a delete at the same version wins deterministically)."""
    order = [F.col(version_col).desc()]
    if "op" in changes.columns:
        order.append(F.col("op").asc())  # 'd' < 'u': delete wins a version tie
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """MERGE INTO semantics: apply `changes` (columns = base columns +
    `op` in ('u','d') + version_col) onto `base`. The latest change per
    key wins; 'd' removes the key; unchanged base rows pass through."""
    latest = latest_per_key(changes, keys, version_col)
    upserts = latest.where(F.col("op") == "u").drop("op")
    touched = latest.select(*keys)
    # one anti-join removes ALL touched keys (upserted AND deleted) from the
    # base; re-adding the upserts completes the merge — deletes are simply
    # the touched keys that never come back
    kept = base.join(touched, keys, "left_anti")
    out_cols = [c for c in base.columns]
    return kept.select(*out_cols).unionByName(upserts.select(*out_cols))


def apply_changes_stream(
    changes_stream: DataFrame,
    snapshot_path: str,
    keys: list[str],
    version_col: str,
    checkpoint: str,
):
    """Maintain a parquet snapshot from a stream of CDC rows via
    foreachBatch: read current snapshot, merge the micro-batch, rewrite.
    (A table format with transactional MERGE — Iceberg/Delta — replaces
    the rewrite at production scale; the merge plan itself is identical.)"""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        import shutil

        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        try:
            base = spark.read.parquet(snapshot_path)
        except AnalysisException as exc:
            # ONLY a missing snapshot means "first batch"; any other read
            # failure (partial files, permissions) must fail the batch —
            # swallowing it would silently rebuild from empty and drop every
            # untouched key
            if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
                raise
            base = spark.createDataFrame([], schema=batch.drop("op").schema)
        merged = merge_upsert(base, batch, keys, version_col)
        staging = snapshot_path + "._next"
        merged.write.mode("overwrite").parquet(staging)
        # rewrite target from the staged copy, then drop the staging dir.
        # The delete+rewrite window is the documented non-atomicity a
        # transactional table format (Iceberg/Delta) closes at production
        # scale; the streaming checkpoint replays the batch on crash.
        spark.read.parquet(staging).write.mode("overwrite").parquet(snapshot_path)
        shutil.rmtree(staging, ignore_errors=True)

    return (
        changes_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
