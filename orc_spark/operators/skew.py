"""Skew-mitigation helpers for hot keys at scale.

AQE's skew-join splitting (enabled in the session factory) handles most
cases at runtime; these explicit operators cover the two patterns AQE can't:
aggregation skew (two-phase salted aggregate) and broadcast-infeasible
skewed joins (salt + replicate).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: phase 1 aggregates on
    (key, salt) — spreading one hot key over ``n_salts`` reducers — phase 2
    merges the partials. Supports decomposable aggregates (sum/count/min/max).

    agg_exprs: {out_col: "sum(col)" | "count(*)" | "min(col)" | "max(col)"}
    """
    salt = (F.spark_partition_id() + F.monotonically_increasing_id()) % n_salts
    salted = df.withColumn("__salt", salt)
    phase1_aggs = []
    phase2_aggs = []
    for out, expr in agg_exprs.items():
        fn, _, arg = expr.partition("(")
        arg = arg.rstrip(")")
        fn = fn.strip().lower()
        if fn == "count":
            # count(*) counts rows; count(col) must keep standard SQL
            # null-exclusion semantics, not silently widen to count(*)
            arg_col = F.lit(1) if arg.strip() in ("*", "1", "") else F.col(arg)
            phase1_aggs.append(F.count(arg_col).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(arg).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(arg).alias(f"__p_{out}"))
            phase2_aggs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(arg).alias(f"__p_{out}"))
            phase2_aggs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {expr}")
    partial = salted.groupBy(*key_cols, "__salt").agg(*phase1_aggs)
    return partial.groupBy(*key_cols).agg(*phase2_aggs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed-fact ⋈ small-dim join without broadcast: salt the fact side,
    replicate the dim side across all salts, join on (key, salt). The hot
    key's rows land on ``n_salts`` different reducers.

    Use when the dim side is too big to broadcast but small enough to
    replicate ``n_salts``× across the shuffle."""
    salt_f = (F.rand(seed=7) * n_salts).cast("int")
    fact = skewed.withColumn("__salt", salt_f)
    dim = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = fact.join(dim, [key, "__salt"], how)
    return out.drop("__salt")
