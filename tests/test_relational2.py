"""Semantics tests for relational part 2 beyond the DuckDB parity gate:
as-of join correctness against a pandas oracle, approx-sketch error bounds."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from orc_spark.plans.relational2 import aj_asof_join, approx_sketches
from orc_spark.sources.tables import load_table


def test_asof_join_matches_pandas_oracle(spark, sf_small):
    got = aj_asof_join(spark, sf_small).toPandas().sort_values("click_id").reset_index(drop=True)
    ev = load_table(spark, sf_small, "events").toPandas()
    ev = ev[ev.event_type.isin(["click", "view"])].sort_values(["user_id", "ts", "event_id"])
    rows = []
    for uid, grp in ev.groupby("user_id"):
        last_view = None
        for _, r in grp.iterrows():
            if r.event_type == "view":
                last_view = r
            else:
                rows.append(
                    {
                        "click_id": r.event_id,
                        "last_view_id": None if last_view is None else last_view.event_id,
                    }
                )
    exp = pd.DataFrame(rows).sort_values("click_id").reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(
        got["last_view_id"].astype("float"),
        exp["last_view_id"].astype("float"),
        check_names=False,
    )
    # gap is non-negative whenever a prior view exists
    gaps = got["gap_ms"].dropna()
    assert (gaps >= 0).all()


def test_approx_sketches_error_bounds(spark, sf_small):
    # the error bound is now computed in-query (the oracle hash-checks it);
    # here we assert every group's sketch landed inside the bound
    pdf = approx_sketches(spark, sf_small).toPandas()
    assert len(pdf) > 0
    assert pdf["approx_parts_ok"].all(), pdf
    assert pdf["approx_median_ok"].all(), pdf


def test_hll_merge_error_bound(spark, sf_mid):
    from orc_spark.plans.relational3 import sk_hll_merge

    rows = sk_hll_merge(spark, sf_mid).collect()
    assert rows, "no regions"
    # the merged sketch's 5% bound is computed in-query; every region must
    # land inside it (nation-level keys are disjoint customer sets, so the
    # exact region count is the sum; HLL at default lgK=12 is well under 5%)
    for r in rows:
        assert r.approx_ok, r
