"""Shared harness for distributed per-run recurrences (AHRS, PID, IMU loop,
offset calibration).

``groupBy(run).applyInPandas`` invokes the Python kernel once PER GROUP; with
thousands of short runs the fixed per-call cost (pandas frame construction,
Arrow slice bookkeeping) dominates the actual recurrence — measured ~3x the
kernel time on the 1,500-run testdata replays. ``partitioned_group_scan``
keeps the identical semantics (one kernel call per sorted run) but executes
with ONE ``mapInPandas`` invocation per partition: runs are hash-placed into
``defaultParallelism`` partitions (cores-not-bytes — these stages are
CPU-bound in Python, and AQE would coalesce the small shuffle and serialize
the recurrences), sorted within the partition so each run is contiguous, and
group boundaries are streamed batch-by-batch with only the current partial
run buffered.

Memory contract at scale: peak buffering is (largest single run + one Arrow
batch) — the same bound the grouped-map path has, NOT the whole partition.
One run never spans executors; state never crosses runs.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def partitioned_group_scan(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """Apply ``kernel`` once per (partition_cols) group, rows sorted by
    ``order_col`` — same contract as groupBy().applyInPandas(kernel) on the
    pre-sorted group, amortizing Python-call overhead across all runs in a
    partition."""
    pcols = list(partition_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: pd.DataFrame | None = None

        def boundaries(keys: pd.DataFrame) -> np.ndarray:
            # Null-aware group-boundary detection: plain `!= shift()` calls
            # every null-keyed row a new group (NaN != NaN), splitting a
            # null-keyed run into per-row kernel calls. A boundary is a real
            # value change OR a null<->non-null transition, matching
            # groupBy().applyInPandas null-key grouping.
            sh = keys.shift()
            diff = keys.ne(sh) & ~(keys.isna() & sh.isna())
            change = diff.any(axis=1).to_numpy()
            change[0] = True  # first row always starts a group
            return np.flatnonzero(change)

        def emit(chunk: pd.DataFrame) -> Iterator[pd.DataFrame]:
            starts = boundaries(chunk[pcols])
            bounds = np.append(starts, len(chunk))
            outs = [
                kernel(chunk.iloc[s:e]) for s, e in zip(bounds[:-1], bounds[1:])
            ]
            if outs:
                yield pd.concat(outs, ignore_index=True)

        for pdf in batches:
            if pdf.empty:
                continue
            if buf is not None:
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            starts = boundaries(pdf[pcols])
            if len(starts) > 1:
                # all complete groups; the last group may continue next batch
                cut = int(starts[-1])
                yield from emit(pdf.iloc[:cut])
                buf = pdf.iloc[cut:].copy()
            else:
                buf = pdf
        if buf is not None and len(buf):
            yield from emit(buf)

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    # Deterministic HIGH-CARDINALITY spread key (guide §2.5), not the run
    # key itself (r16): repartition(n, *pcols) under an upstream window
    # already hash-partitioned by the same key collapsed into that window
    # exchange — an ENSURE_REQUIREMENTS exchange that AQE coalesces by
    # BYTES, which starved this CPU-bound Python stage down to 2 tasks on
    # 32 cores at sf0.1 (st_pid_replay: 1.8 s of kernel time serialized
    # onto 2 cores; 16/32 tasks at the sf1 replica). Hashing the run key
    # into 100·n buckets keeps this exchange a REPARTITION_BY_NUM that
    # neither collapses upstream nor is coalesced below the core count,
    # and the 100x key space spreads evenly (the guide's synthetic-key
    # collision warning). Runs stay whole: the key is a function of pcols.
    from pyspark.sql import functions as F

    spread = F.pmod(F.xxhash64(*pcols), F.lit(100 * n_parts))
    return (
        df.repartition(n_parts, spread)
        .sortWithinPartitions(*pcols, order_col)
        .mapInPandas(run, schema)
    )
