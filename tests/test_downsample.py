"""LTTB downsampling: structural invariants and visual-fidelity behavior
(the parity gate checks cross-engine selection; this checks the algorithm
actually does what a plot-prep downsampler must)."""

import numpy as np

from orc_spark.operators.downsample import LTTB_T, lttb_downsample


def _series_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts bigint, value double"
    )


def test_lttb_keeps_first_last_and_spike(spark):
    # flat series with one dramatic spike: LTTB must keep it
    n = 100
    rows = [
        (1, i, 1_000_000 * i, 500.0 if i == 57 else 1.0 + 0.001 * (i % 7))
        for i in range(n)
    ]
    out = lttb_downsample(_series_df(spark, rows)).orderBy("sel_idx").collect()
    assert len(out) == LTTB_T
    assert out[0].event_id == 0 and out[-1].event_id == n - 1
    assert any(r.event_id == 57 for r in out), "spike must survive downsampling"
    # x strictly increasing across selected points
    xs = [r.x_s for r in out]
    assert xs == sorted(xs) and len(set(xs)) == len(xs)


def test_lttb_short_series_passthrough(spark):
    rows = [(7, i, 2_000_000 * i, float(i)) for i in range(4)]
    out = lttb_downsample(_series_df(spark, rows)).orderBy("sel_idx").collect()
    assert [r.event_id for r in out] == [0, 1, 2, 3]
    assert [r.sel_idx for r in out] == [0, 1, 2, 3]


def test_lttb_many_series_isolated(spark):
    # two users interleaved: each downsampled independently
    rows = []
    for u in (1, 2):
        for i in range(50):
            rows.append((u, u * 1000 + i, 1_000_000 * i, float(np.sin(i / 5.0) * u)))
    out = lttb_downsample(_series_df(spark, rows)).toPandas()
    assert set(out.user_id) == {1, 2}
    for u in (1, 2):
        sub = out[out.user_id == u]
        assert len(sub) == LTTB_T
        assert (sub.event_id // 1000 == u).all()
