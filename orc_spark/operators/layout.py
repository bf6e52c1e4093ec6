"""Z-order (Morton-curve) data layout for multi-dimensional data skipping.

A single-column sort clusters parquet min/max stats on one key only; a
2-D range query on (l_partkey, l_suppkey) then reads every file when it
filters the *other* key. Interleaving the bits of both keys (the Morton
curve) clusters BOTH dimensions: each output file covers a small tile of
the key plane, so its per-file/row-group min/max stats exclude most 2-D
rectangles — footer-level data skipping before a byte of data is read.

Scale shape: the z-value is a pure codegen projection; the layout write is
one repartitionByRange(z) + in-partition sort — exactly one shuffle, the
same cost as any clustered write. Query-side there is NO new machinery:
plain predicate pushdown against the laid-out files does the skipping
(tests/test_zorder.py asserts the file-stat pruning factor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 10  # 10 bits/dimension → 1024 buckets each → 20-bit z-value


def _bucket(col: Column, vmax: int) -> Column:
    """Scale [0, vmax] into [0, 2^Z_BITS): integer math, monotone."""
    return (col.cast("bigint") * (1 << Z_BITS)) / (vmax + 1)


def zorder_value(c1: Column, max1: int, c2: Column, max2: int) -> Column:
    """Morton interleave of two bucketed keys (c1 gets the odd bits)."""
    b1 = F.floor(_bucket(c1, max1)).cast("bigint")
    b2 = F.floor(_bucket(c2, max2)).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(Z_BITS):
        z = (
            z.bitwiseOR(
                F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            ).bitwiseOR(
                F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)), 2 * i)
            )
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    max1: int,
    c2: str,
    max2: int,
    n_files: int = 16,
) -> None:
    """Write df as parquet z-ordered on (c1, c2): one range shuffle on the
    z-value + an in-partition sort, so every file covers one Morton-curve
    tile and carries tight min/max stats on BOTH columns."""
    zv = zorder_value(F.col(c1), max1, F.col(c2), max2)
    (
        df.withColumn("_zv", zv)
        .repartitionByRange(n_files, "_zv")
        .sortWithinPartitions("_zv")
        .drop("_zv")
        .write.mode("overwrite")
        .parquet(path)
    )
