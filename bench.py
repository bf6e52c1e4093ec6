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

# the WHOLE registry is the bench: every capability family gets a recorded
# per-query number, so later rounds show per-operator progress
HEADLINE: list[str] | None = None  # None → all registry queries, sorted


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("orc_spark_bench")
    reg = registry()
    names = HEADLINE or sorted(reg)
    timings: dict[str, float] = {}
    # warm the JVM + file cache with a trivial action
    spark.range(1000).count()
    for name in names:
        q = reg[name]
        t0 = time.perf_counter()
        n = q.spark_fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
        # release caches a query may have pinned (LSH signatures etc.) so
        # later queries aren't measured under accumulated memory pressure
        spark.catalog.clearCache()
    # flagship reference workload: the full 4-metric analytics pass over the
    # real 129k-row firmware log (BASELINE.md row 1: target single-digit sec)
    real_csv = (
        "/root/reference/Python Plotting/Vibration_test/High Speed/"
        "ORCLOG_vibration_HS.CSV"
    )
    if os.path.exists(real_csv):
        from orc_spark.plans.orclog_e2e import orclog_full_report

        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = orclog_full_report(spark, real_csv).count()
        timings["orclog_e2e_real129k"] = round(time.perf_counter() - t0, 3)
        print(
            f"# orclog_e2e_real129k: {timings['orclog_e2e_real129k']:.3f}s ({n} rows)",
            file=sys.stderr,
        )
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
