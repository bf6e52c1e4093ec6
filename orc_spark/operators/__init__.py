from orc_spark.operators.timeseries import (
    deadband,
    locf,
    median_filter,
    np_gradient,
    peak_reject_locf,
    scale_counts,
)
from orc_spark.operators.stats import run_stats, group_means, welch_ttest

__all__ = [
    "deadband",
    "locf",
    "median_filter",
    "np_gradient",
    "peak_reject_locf",
    "scale_counts",
    "run_stats",
    "group_means",
    "welch_ttest",
]
