"""Property-based checks: the window operators (medfilt, gradient, LOCF)
match their numpy oracles on random series with random run boundaries."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from orc_spark.functions.stat_math import medfilt_zero_padded
from orc_spark.operators.timeseries import locf, median_filter, np_gradient

series_strategy = st.lists(
    st.floats(-1e6, 1e6, allow_nan=False, width=64), min_size=1, max_size=40
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(runs=st.lists(series_strategy, min_size=1, max_size=4))
def test_medfilt_gradient_match_numpy(spark, runs):
    rows = []
    for ri, run in enumerate(runs):
        for si, v in enumerate(run):
            rows.append({"run": ri, "idx": si, "x": v})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = median_filter(df, "x", ["run"], "idx", 15, "mf")
    out = np_gradient(out, "x", ["run"], "idx", "gr")
    got = out.orderBy("run", "idx").toPandas()
    for ri, run in enumerate(runs):
        arr = np.asarray(run, dtype=np.float64)
        exp_mf = medfilt_zero_padded(arr, 15)
        if arr.size == 1:
            exp_gr = np.array([0.0])  # engine-defined (np.gradient raises)
        else:
            exp_gr = np.gradient(arr)
        sub = got[got.run == ri].sort_values("idx")
        np.testing.assert_allclose(sub["mf"].to_numpy(), exp_mf, rtol=1e-12)
        np.testing.assert_allclose(sub["gr"].to_numpy(), exp_gr, rtol=1e-12, atol=1e-300)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
def test_locf_matches_pandas_ffill(spark, vals):
    pdf = pd.DataFrame({"run": 0, "idx": range(len(vals)), "x": vals})
    df = spark.createDataFrame(pdf.astype({"x": "float64"}))
    got = (
        locf(df, "x", ["run"], "idx", "f")
        .orderBy("idx")
        .toPandas()["f"]
    )
    exp = pdf["x"].astype("float64").ffill()
    pd.testing.assert_series_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_names=False
    )
