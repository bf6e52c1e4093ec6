"""Independent verification of dd_cluster at the ~sf1 replica.

The driver-style oracle for dd_cluster is a DuckDB RECURSIVE transitive
closure (`reach` = every (src, reachable dst) pair). At 50k docs / 10x
edges that closure ground >90 min at >50 GB RSS without finishing — the
closure row count is O(sum |component|^2) and DuckDB's recursion dedups
against the full ever-seen set each round. The closure formulation is the
oracle's scaling limit, not the query's.

This check replaces it with an equally-strong independent channel at sf1:

- the EDGE SET is exactly dd_minhash_pairs filtered to est_jaccard >=
  JACCARD_MIN (that is how dd_cluster constructs it, cluster_q.py:30) —
  and dd_minhash_pairs itself IS hash-verified against its DuckDB oracle
  at sf1 (COVERAGE.md round 12, 28.31 s OK);
- the CLOSURE is recomputed here by a plain-Python union-find with
  min-label canonicalization — an implementation sharing nothing with
  either the Spark pointer-jumping/local-finish path or the SQL CTE;
- the comparison is exact (doc_id, cluster_id, cluster_size) equality
  over all rows.

Usage: python scripts/sf1_cluster_check.py [sf_dir]   (default /tmp/orc_sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from orc_spark import get_spark
from orc_spark.plans.cluster_q import JACCARD_MIN, dd_cluster
from orc_spark.plans.dedup_q import dd_minhash_pairs


def union_find_min_label(doc_ids: np.ndarray, ea: np.ndarray, eb: np.ndarray):
    """Min-label connected components, plain Python union-find."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(ea.tolist(), eb.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min doc_id per component; with union-by-min the
    # root IS the minimum of all ids ever unioned into the tree
    return {int(d): find(int(d)) for d in doc_ids.tolist()}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/orc_sf1"
    spark = get_spark("sf1_cluster_check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))

    t0 = time.perf_counter()
    got = dd_cluster(spark, sf).toPandas()
    t_spark = time.perf_counter() - t0

    edges = (
        dd_minhash_pairs(spark, sf)
        .where(F.col("est_jaccard") >= JACCARD_MIN)
        .select("doc_a", "doc_b")
        .toPandas()
    )
    doc_ids = pq.read_table(
        os.path.join(sf, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_numpy()

    t1 = time.perf_counter()
    comp = union_find_min_label(
        doc_ids, edges["doc_a"].to_numpy(), edges["doc_b"].to_numpy()
    )
    sizes: dict[int, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    t_py = time.perf_counter() - t1

    got = got.sort_values("doc_id").reset_index(drop=True)
    bad = 0
    # Row-count check FIRST (an assert after the loop crashed on an
    # extra/unknown row instead of printing a MISMATCH — r12 ADVICE), and
    # comp.get so a doc_id absent from documents.parquet is a counted
    # failure rather than a KeyError traceback.
    if len(got) != len(doc_ids):
        bad += 1
        print(f"ROW-COUNT MISMATCH: got {len(got)} rows, want {len(doc_ids)}")
    for doc_id, cid, csz in zip(
        got["doc_id"], got["cluster_id"], got["cluster_size"]
    ):
        want_c = comp.get(int(doc_id))
        if want_c is None or int(cid) != want_c or int(csz) != sizes[want_c]:
            bad += 1
            if bad <= 5:
                want_s = sizes.get(want_c) if want_c is not None else None
                print(
                    f"MISMATCH doc {doc_id}: got ({cid},{csz}) "
                    f"want ({want_c},{want_s})"
                )
    status = "OK" if bad == 0 else f"FAILED ({bad} mismatches)"
    print(
        f"dd_cluster @ {sf}: {status} — {len(got)} docs, "
        f"{len(edges)} edges, {len(sizes)} clusters; "
        f"spark {t_spark:.1f}s, python union-find {t_py:.1f}s"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
