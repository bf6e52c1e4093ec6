"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing counts full execution materialized via a cheap count-style action
(df.foreach would double-serialize; count() executes the whole plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orc_spark import get_spark
from orc_spark.plans import registry

# headline set: one per capability family (full registry is the correctness
# surface; bench tracks the representative heavy hitters)
HEADLINE = [
    "r1_pricing_summary",
    "r2_join_agg",
    "r3_shipping_priority",
    "r4_rollup",
    "r5_window_topk",
    "r8_tumbling",
    "r8c_sessions",
    "ts_medfilt",
    "ts_runstats",
    "ts_welch",
    "dd_exact",
    "dd_minhash_pairs",
    "dd_simhash",
    "dd_ngram_jaccard",
    "ann_topk",
    "tx_quality",
    "tx_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("orc_spark_bench")
    reg = registry()
    timings: dict[str, float] = {}
    # warm the JVM + file cache with a trivial action
    spark.range(1000).count()
    for name in HEADLINE:
        q = reg[name]
        t0 = time.perf_counter()
        n = q.spark_fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
