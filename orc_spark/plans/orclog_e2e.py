"""The reference's full analytics workload as one pipeline (SURVEY §2.B
Q1-Q7): parse the firmware log → median-filter each metric per run → jerk →
per-run RMS/min/max → per-group means → Welch one-sided t-tests, all four
metrics (accel/pitch/roll/jerk) — the engine's equivalent of one complete
`main.py` execution minus the PNGs.

Plan shape (this is the whole point): ONE window stage computes all three
median filters plus the jerk gradient; ONE per-run aggregation computes all
12 (metric × rms/min/max) statistics; ONE per-group aggregation computes
every mean/variance/count the Welch tests need. Two shuffles end-to-end
regardless of how many metrics/tests ride on top — the same
multi-aggregate-single-pass structure the reference hand-codes
(main.py:73-76, 109-115).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orc_spark.operators.stats import _t_cdf, welch_components
from orc_spark.operators.timeseries import median_filter, np_gradient
from orc_spark.sources.orclog import parse_orclog

RUN = ["file", "actuators_enabled", "run_idx"]

# (report label, filtered column, derivative?)
METRICS = [
    ("accel", "accel_g", False),
    ("pitch", "pitch_deg", False),
    ("roll", "roll_deg", False),
    ("jerk", "accel_g", True),
]

# stat column → one-sided alternative (main.py:113-115)
ALTS = {"rms": "less", "min": "greater", "max": "less"}


def orclog_full_report(spark: SparkSession, paths) -> DataFrame:
    """One row per metric: group averages for both populations + the three
    Welch tests (t, p)."""
    parsed = parse_orclog(spark, paths)

    # one window stage: 3 median filters + jerk
    filt = parsed
    for label, src, deriv in METRICS:
        if not deriv:
            filt = median_filter(filt, src, RUN, "sample_idx", 15, f"f_{label}")
    filt = np_gradient(filt, "f_accel", RUN, "sample_idx", "f_jerk")

    # one per-run aggregation: 12 statistics
    aggs = []
    for label, _src, _d in METRICS:
        c = F.col(f"f_{label}")
        aggs += [
            F.sqrt(F.avg(c * c)).alias(f"rms_{label}"),
            F.min(c).alias(f"min_{label}"),
            F.max(c).alias(f"max_{label}"),
        ]
    per_run = filt.groupBy(*RUN).agg(*aggs)

    # one per-group aggregation: mean/var/count of every statistic
    gaggs = [F.count(F.lit(1)).cast("double").alias("n_runs")]
    for label, _src, _d in METRICS:
        for stat in ("rms", "min", "max"):
            col = f"{stat}_{label}"
            gaggs += [
                F.avg(col).alias(f"avg_{col}"),
                F.var_samp(col).alias(f"var_{col}"),
            ]
    g = per_run.groupBy("actuators_enabled").agg(*gaggs)

    on = g.where(F.col("actuators_enabled")).drop("actuators_enabled")
    off = g.where(~F.col("actuators_enabled")).drop("actuators_enabled")
    off = off.select([F.col(c).alias(f"{c}__off") for c in off.columns])
    wide = on.crossJoin(off)

    # reshape to one row per metric via explode-of-structs — a single select
    # over the single wide row (a union of per-metric selects would recompute
    # the whole upstream once per metric)
    metric_structs = []
    for label, _src, deriv in METRICS:
        fields = [
            F.lit(label).alias("metric"),
            F.lit(deriv).alias("derivative"),
            F.col("n_runs").alias("n_runs_on"),
            F.col("n_runs__off").alias("n_runs_off"),
        ]
        for stat in ("rms", "min", "max"):
            c = f"{stat}_{label}"
            fields += [
                F.col(f"avg_{c}").alias(f"avg_{stat}_on"),
                F.col(f"avg_{c}__off").alias(f"avg_{stat}_off"),
            ]
            se2, dof = welch_components(
                F.col(f"var_{c}"),
                F.col("n_runs"),
                F.col(f"var_{c}__off"),
                F.col("n_runs__off"),
            )
            t = (F.col(f"avg_{c}") - F.col(f"avg_{c}__off")) / F.sqrt(se2)
            cdf = _t_cdf(t, dof)
            p = cdf if ALTS[stat] == "less" else F.lit(1.0) - cdf
            fields += [t.alias(f"t_{stat}"), p.alias(f"p_{stat}")]
        metric_structs.append(F.struct(*fields))
    return wide.select(
        F.explode(F.array(*metric_structs)).alias("m")
    ).select("m.*")
