"""Query registry: every engine capability exposed as a named query.

Each :class:`Query` pairs an idiomatic DataFrame implementation (the engine)
with an ANSI-SQL oracle string that DuckDB executes on the same parquet
tables — the driver's correctness gate runs both and hash-compares.

Cross-engine rules observed throughout (Spark 4 vs DuckDB 1.0):
- alias every computed column identically on both sides;
- no raw timestamps in outputs (epoch millis / extracted ints instead);
- CAST(year(..) AS INTEGER) in DuckDB (bigint there, int in Spark);
- CAST(floor(..) AS BIGINT) on both (double in DuckDB, bigint in Spark);
- explicit double casts before division (DuckDB divides ints as floats,
  Spark truncates);
- deterministic cross-engine 60-bit hash: Spark
  ``conv(substr(md5(x),1,15),16,10)`` == DuckDB
  ``('0x' || substr(md5(x),1,15))::BIGINT``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None → rows-only check (non-SQL-expressible)
    doc: str = ""


def registry() -> dict[str, Query]:
    """All registered queries, name → Query."""
    from orc_spark.plans import (
        relational,
        relational2,
        relational3,
        timeseries_q,
        dedup_q,
        cluster_q,
        text_q,
        stateful_q,
        mm_q,
        profile_q,
        rollup_q,
        curation_q,
    )

    out: dict[str, Query] = {}
    for mod in (
        relational,
        relational2,
        relational3,
        timeseries_q,
        dedup_q,
        cluster_q,
        text_q,
        stateful_q,
        mm_q,
        profile_q,
        rollup_q,
        curation_q,
    ):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name {q.name}")
            out[q.name] = q
    return out
