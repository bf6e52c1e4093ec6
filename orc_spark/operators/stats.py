"""Statistics pack (reference operators O20/O21/O22).

Two-level aggregation (per-run stats → per-group means) is native Spark
partial/final aggregation. The Welch t-test is a closed-form expression over
per-group (n, mean, var) aggregates — one tiny 2-row join, no data movement —
with the Student-t CDF evaluated in a vectorized pandas UDF (scipy), i.e.
Python only touches a handful of rows, never the data.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def rms(col: Column | str) -> Column:
    """Root-mean-square aggregate: sqrt(mean(x^2)) (reference main.py:73-76)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sqrt(F.avg(c * c))


def run_stats(
    df: DataFrame,
    value_col: str,
    run_cols: Sequence[str],
) -> DataFrame:
    """Per-run RMS / min / max in ONE pass (single partial+final aggregation)."""
    c = F.col(value_col)
    return df.groupBy(*run_cols).agg(
        rms(c).alias("rms"),
        F.min(c).alias("min_val"),
        F.max(c).alias("max_val"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def group_means(stats_df: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Per-group averages of per-run stats — the golden 'Average RMS/Min/Max'
    (reference main.py:109-112, ORC Result Summary.pdf p.1)."""
    return stats_df.groupBy(*group_cols).agg(
        F.avg("rms").alias("avg_rms"),
        F.avg("min_val").alias("avg_min"),
        F.avg("max_val").alias("avg_max"),
        F.count(F.lit(1)).alias("n_runs"),
    )


# DataType instance (not DDL string) so the decorator works without an
# active SparkContext at import time. The UDF only ever sees a handful of
# rows (one per tested metric), so the Python boundary cost is nil.
@pandas_udf(DoubleType())
def _t_cdf(t: pd.Series, dof: pd.Series) -> pd.Series:
    from orc_spark.functions.stat_math import student_t_cdf

    return pd.Series(student_t_cdf(t.to_numpy(), dof.to_numpy()))


def welch_components(v1: Column, n1: Column, v2: Column, n2: Column):
    """Welch t denominator pieces: (se^2, dof) from sample variances/counts.
    Zero variance on BOTH sides makes the dof denominator exactly 0 (and
    sqrt(se2) 0 in the caller) — NULL, not an ANSI DIVIDE_BY_ZERO; n=1
    sides are already NULL via var_samp."""
    q1 = v1 / n1
    q2 = v2 / n2
    se2 = q1 + q2
    dof = (se2 * se2) / F.nullif(
        q1 * q1 / (n1 - 1) + q2 * q2 / (n2 - 1), F.lit(0.0)
    )
    return se2, dof


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str | Column,
    alternative: str = "two-sided",
    with_p: bool = True,
) -> DataFrame:
    """Welch two-sample t-test, ``scipy.stats.ttest_ind(a, b, equal_var=False,
    alternative=...)`` semantics (reference main.py:113-115).

    ``group_col`` must be boolean; population *a* is group_col==true (for the
    reference pipeline: actuators enabled — first in file order, main.py:113).
    Returns one row: (t_stat, dof[, p_value]). Sample variance (ddof=1)
    matches numpy/scipy. Degenerate inputs (n<2, zero variance) produce
    NaN/null exactly as scipy does.

    alternative: 'two-sided' | 'less' | 'greater' (one-sided as in the
    reference: RMS 'less', min 'greater', max 'less').
    """
    gcol = F.col(group_col) if isinstance(group_col, str) else group_col
    agg = df.groupBy(gcol.alias("__g")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(value_col).alias("mean"),
        F.var_samp(value_col).alias("var"),
    )
    a = agg.where(F.col("__g")).select(
        F.col("n").alias("n1"), F.col("mean").alias("m1"), F.col("var").alias("v1")
    )
    b = agg.where(~F.col("__g")).select(
        F.col("n").alias("n2"), F.col("mean").alias("m2"), F.col("var").alias("v2")
    )
    j = a.crossJoin(b)
    se2, dof = welch_components(F.col("v1"), F.col("n1"), F.col("v2"), F.col("n2"))
    j = j.select(
        (
            (F.col("m1") - F.col("m2"))
            / F.nullif(F.sqrt(se2), F.lit(0.0))
        ).alias("t_stat"),
        dof.alias("dof"),
    )
    if not with_p:
        return j
    cdf = _t_cdf(F.col("t_stat"), F.col("dof"))
    if alternative == "less":
        p = cdf
    elif alternative == "greater":
        p = F.lit(1.0) - cdf
    elif alternative == "two-sided":
        p = F.lit(2.0) * F.least(cdf, F.lit(1.0) - cdf)
    else:
        raise ValueError(f"unknown alternative: {alternative}")
    return j.withColumn("p_value", p)
