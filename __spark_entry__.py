"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check at sf0.001.
queries()     — every implemented operator/query (SURVEY.md §2) as
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-runnable ANSI SQL equivalents for EVERY query
                (since round 4 the stateful recurrences are covered too,
                via recursive-CTE sequential replays — see
                orc_spark/plans/stateful_q.py).

Implementation lives in the orc_spark package (orc_spark/plans/* registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orc_spark.plans import registry  # noqa: E402
from orc_spark.session import ensure_package_on_workers  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shaped multi-join
    top-k (scan + predicate pushdown + broadcast join + agg + sort/limit)."""
    from orc_spark.plans.relational import r3_shipping_priority

    ensure_package_on_workers(spark)
    return r3_shipping_priority(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the harness's session may predate our PYTHONPATH: ship the package
        # to its UDF workers before building any plan with Python stages
        ensure_package_on_workers(spark)
        # NOTE: do NOT unpersist leftover RDDs here. A PENDING
        # localCheckpoint(eager=False) registers in persistentRDDs before
        # materializing, and unpersisting it corrupts its storage level
        # ("not appropriate for local checkpointing" on later execution) —
        # fatal if the harness builds several queries before collecting
        # them. bench.py can clean between queries because it fully
        # executes then discards each plan; the gate's pattern is unknown.
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(q.spark_fn) for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
