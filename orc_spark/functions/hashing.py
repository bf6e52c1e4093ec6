"""Cross-engine deterministic hashing primitives.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` are different
algorithms, so oracle-checkable dedup/fingerprint operators need a hash both
engines compute identically. MD5 is bit-identical everywhere; taking the
first 15 hex chars gives a 60-bit integer that fits bigint arithmetic in both:

    Spark : CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

MinHash permutations are universal hashes (a*h + b) mod p over p = 2^31 - 1
(largest Mersenne prime below 2^31): h is first reduced mod p so a*h stays
under 2^62 — no int64 overflow in either engine.

At 100 TB scale the md5-based hash is still a per-row projection (no shuffle);
Spark's native xxhash64 would be ~3× faster but is kept for non-oracle paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2147483647  # 2^31 - 1

# fixed universal-hash parameters for 16 MinHash permutations (odd a, a < p)
MINHASH_PERMS: list[tuple[int, int]] = [
    (1203114875, 552581159),
    (661983517, 1312439387),
    (671541685, 198904517),
    (925333799, 1801735117),
    (1984591693, 620943911),
    (973816669, 89913271),
    (467347459, 1397963209),
    (1513859437, 754493429),
    (110364251, 1056966377),
    (850607417, 1844317897),
    (710184551, 481569149),
    (1539174299, 224577077),
    (359373343, 1048559787),
    (1275899297, 903839629),
    (601435351, 1586662823),
    (219819695, 67867967),
]


def h60(col: Column | str) -> Column:
    """60-bit deterministic hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h60_sql(expr: str) -> str:
    """Same hash, DuckDB SQL side."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_col(hcol: Column, a: int, b: int) -> Column:
    """One MinHash permutation value for a pre-hashed 60-bit column."""
    return (F.lit(a) * (hcol % MERSENNE_P) + F.lit(b)) % MERSENNE_P


def minhash_sql(hexpr: str, a: int, b: int) -> str:
    return f"(({a} * ({hexpr} % {MERSENNE_P}) + {b}) % {MERSENNE_P})"


def h60_py(s: str) -> int:
    """Same 60-bit hash, driver-side Python (for bounded local-finish paths
    that must emit digests bit-identical to h60/h60_sql)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def xor_digest(*cols) -> Column:
    """Order-independent 60-bit digest AGGREGATE of ':'-joined columns —
    the canonical Spark-side partner of ``bit_xor(h60_sql(...))`` oracles
    (used by posting lists, sketch cell tables, drift bin tables)."""
    return F.bit_xor(h60(F.concat_ws(":", *[F.col(c) if isinstance(c, str) else c for c in cols]))).cast("bigint")
