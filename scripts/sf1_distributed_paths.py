"""Distributed-path equivalence at the ~sf1 replica (VERDICT r11 item 4).

At sf1 the graph local-finish caps mostly do NOT flip on their own: the
mutual-kNN supplier graph has ~10k nodes and ~10^5 edges, far under the
1M-edge budgets (the one exception is gr_pagerank, whose 2*|lineitem| =
12M > PR_LOCAL_FINISH_EDGES = 4M guard flips it to the distributed
iterations — and that path IS DuckDB-hash-verified by the sf1 sweep).
The monkeypatch equality tests cover the distributed paths only at toy
scale; this script closes the gap in the other direction: run each
cap-bearing query at sf1 twice in one session — caps as shipped (local
finish), then caps forced to 0 (distributed finish) — and require EXACT
row-set equality. Combined with the sweep (local paths hash-verified vs
DuckDB at sf1) this transitively hash-verifies the distributed paths on
real data volume.

Usage: python scripts/sf1_distributed_paths.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orc_spark import get_spark
from orc_spark.operators import graph as graph_ops
from orc_spark.plans import cluster_q, graph_q

CASES = ["dd_cluster", "gr_bfs", "gr_linkpred", "gr_label_prop", "gr_kcore"]


def _run(spark, sf: str, name: str):
    fn = {
        "dd_cluster": cluster_q.dd_cluster,
        "gr_bfs": graph_q.gr_bfs,
        "gr_linkpred": graph_q.gr_linkpred,
        "gr_label_prop": graph_q.gr_label_prop,
        "gr_kcore": graph_q.gr_kcore,
    }[name]
    df = fn(spark, sf).toPandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/orc_sf1"
    spark = get_spark(
        "sf1_distributed", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    )
    failed = []
    for name in CASES:
        t0 = time.perf_counter()
        local = _run(spark, sf, name)
        t_local = time.perf_counter() - t0

        saved = (
            graph_ops.CC_LOCAL_FINISH_ROWS,
            graph_q.GRAPH_LOCAL_FINISH_EDGES,
            graph_q.KCORE_LOCAL_FINISH_EDGES,
            graph_q.PR_LOCAL_FINISH_EDGES,
        )
        graph_ops.CC_LOCAL_FINISH_ROWS = 0
        graph_q.GRAPH_LOCAL_FINISH_EDGES = 0
        graph_q.KCORE_LOCAL_FINISH_EDGES = 0
        graph_q.PR_LOCAL_FINISH_EDGES = 0
        try:
            t1 = time.perf_counter()
            dist = _run(spark, sf, name)
            t_dist = time.perf_counter() - t1
        finally:
            (
                graph_ops.CC_LOCAL_FINISH_ROWS,
                graph_q.GRAPH_LOCAL_FINISH_EDGES,
                graph_q.KCORE_LOCAL_FINISH_EDGES,
                graph_q.PR_LOCAL_FINISH_EDGES,
            ) = saved

        ok = local.equals(dist)
        if not ok:
            failed.append(name)
        print(
            f"{name:16s} local {t_local:6.1f}s  distributed {t_dist:6.1f}s  "
            f"{len(local)} rows  {'OK' if ok else 'MISMATCH'}",
            flush=True,
        )
    print(f"\n{len(CASES) - len(failed)}/{len(CASES)} OK; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
