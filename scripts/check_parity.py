"""Run the driver-style Spark vs DuckDB parity check over the full registry.

Usage: python scripts/check_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orc_spark import get_spark
from orc_spark.plans import registry
from tests.parity import compare, duck_con


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or sorted(registry())
    spark = get_spark("parity", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duck_con(sf_dir)
    reg = registry()
    failed = []
    for name in names:
        q = reg[name]
        t0 = time.perf_counter()
        try:
            sdf = q.spark_fn(spark, sf_dir)
            if q.oracle is None:
                n = sdf.count()
                status = f"rows-only ({n} rows)"
            else:
                problems = compare(sdf, con.execute(q.oracle).df(), name)
                status = "OK" if not problems else "; ".join(problems)
                if problems:
                    failed.append(name)
        except Exception as e:  # noqa: BLE001
            status = f"ERROR {type(e).__name__}: {e}"
            failed.append(name)
        print(f"{name:24s} {time.perf_counter() - t0:6.2f}s  {status}", flush=True)
    print(f"\n{len(names) - len(failed)}/{len(names)} OK; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
