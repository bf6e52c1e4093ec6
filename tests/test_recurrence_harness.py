"""partitioned_group_scan contract: identical output to per-group
application of the kernel, including when a single run spans multiple Arrow
batches (the boundary-buffering path)."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import types as T

from orc_spark.operators.recurrence import partitioned_group_scan

SCHEMA = T.StructType(
    [
        T.StructField("run", T.LongType()),
        T.StructField("ord", T.LongType()),
        T.StructField("cumsum", T.DoubleType()),
    ]
)


def _fixture(spark, sizes):
    rows = []
    rng = np.random.default_rng(7)
    for run, size in enumerate(sizes):
        for i in rng.permutation(size):
            rows.append((run, int(i), float(run * 1000 + i)))
    return spark.createDataFrame(rows, "run long, ord long, v double")


@pytest.mark.parametrize("batch_size", [16, 10000])
def test_scan_equals_per_group_reference(spark, batch_size):
    """Sizes straddle the Arrow batch size (16): size-1 runs, runs exactly at
    the boundary, and a 75-row run that MUST span several input batches."""

    # defined in-test so cloudpickle ships it by value (the tests package is
    # not importable inside UDF workers)
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ord")
        out = pdf[["run", "ord"]].copy()
        # order-sensitive recurrence: wrong order/split => wrong cumsum
        out["cumsum"] = pdf["v"].cumsum().to_numpy()
        return out

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    try:
        df = _fixture(spark, sizes=[1, 16, 3, 75, 1, 32, 7])
        got = (
            partitioned_group_scan(df, ["run"], "ord", kernel, SCHEMA)
            .toPandas()
            .sort_values(["run", "ord"])
            .reset_index(drop=True)
        )
        ref = (
            pd.concat(
                [kernel(g) for _, g in df.toPandas().groupby("run", sort=True)],
                ignore_index=True,
            )
            .sort_values(["run", "ord"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref)
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
