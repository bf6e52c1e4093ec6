"""Quality tests for the mergeable sketches beyond cross-engine parity:
the histogram quantile sketch must actually approximate the exact
quantiles (within one bin width), and its bin counts must merge."""

import duckdb

from orc_spark.plans.relational3 import HISTQ_BINS, sk_histq


def test_histq_estimates_near_exact_quantiles(spark, sf_small):
    row = sk_histq(spark, sf_small).collect()[0]
    con = duckdb.connect()
    exact = con.execute(
        f"""SELECT quantile_cont(l_extendedprice, [0.5, 0.95, 0.99]),
                   min(l_extendedprice), max(l_extendedprice)
            FROM read_parquet('{sf_small}/lineitem.parquet')"""
    ).fetchone()
    (q50, q95, q99), mn, mx = exact[0], exact[1], exact[2]
    bin_w = (mx - mn) / HISTQ_BINS
    assert abs(row.p50_est - q50) <= bin_w
    assert abs(row.p95_est - q95) <= bin_w
    assert abs(row.p99_est - q99) <= bin_w
    assert row.total > 0 and 1 <= row.n_bins_used <= HISTQ_BINS
