"""Byte-domain positional gram extraction — the gram family's shared scan
stage (r15).

Why bytes, not chars: Spark's ``UTF8String.substring`` has NO ascii fast
path — a positional ``substring(text, pos, k)`` walks the string from byte
0 counting codepoints (verified in the spark-unsafe 4.1.2 bytecode), so a
per-position explode over one document costs O(doc_len²) byte-steps. On the
driver's ~2 KB docs that is invisible; ONE 10 MB document turns every
per-char gram query into a single >15-minute straggler task that no
repartition can split (measured r15: 0.25 MB → 186 s, 10 MB → unbounded).
``substring`` on BINARY is a plain byte slice — O(k) — so shingling the
UTF-8 byte stream makes the whole family linear again (measured: the same
10 MB doc, 10.8 M positions hashed in ~10 s).

An earlier r15 fix attempt ("lower the extracted gram, never the projected
whole text") addressed a SECOND quadratic — the optimizer collapsing a
projected ``lower(text)`` into the per-element loop (jstack: 100% of a 90 s
task in ``UTF8String.toLowerCase``) — but left the substring walk. Here the
whole-text ``lower(...).cast("binary")`` preparation is the generator
operand's sibling column, evaluated once per input row in the generate
stage (measured equal with and without an exchange barrier); the per-gram
expressions consume ``tb`` by reference in the same stage.

Semantics contract: positions are 1-based BYTE offsets and grams are BYTE
strings. For ASCII corpora (the driver's testdata, and the common case the
oracles certify) byte offsets == char offsets and ``md5(byte_gram)`` ==
``md5(char_gram)``, so the DuckDB oracles express the identical computation
with char-domain ``substr(lower(text), pos, k)`` (DuckDB has no BLOB
substring/md5 to mirror the byte form directly). On non-ASCII text the
Spark engine computes well-defined byte-shingles (standard practice —
ExactSubstr, CDC and most production dedup pipelines shingle bytes); the
oracle equivalence is certified for ASCII only, stated here once for the
whole family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def once_per_row(c: Column) -> Column:
    """Identity wrapper marked NONDETERMINISTIC so the optimizer cannot
    collapse the wrapped projection into a downstream per-element loop.

    Why this exists: CollapseProject freely substitutes a projected
    expression into the expressions that consume it — including into a
    Generate's per-element consume — and whether it does is PLAN-STATE
    dependent (the same shingle pipeline collapsed under dd_minhash_pairs'
    cached-signature plan but not standalone; r15 jstack: 100% of the task
    in ``UTF8String.toLowerCase``, re-lowercasing a 9.6 MB doc once per
    exploded position). A nondeterministic projection is never merged or
    duplicated, so the preparation below it runs exactly once per input
    row. ``monotonically_increasing_id() >= -1`` is always true (the id is
    non-negative), so the value and type pass through unchanged (NULL
    included) and results are fully deterministic — but the id expression
    is MARKED nondeterministic, which is all CollapseProject looks at, and
    it is whole-stage-codegen (a ``shuffle(array(c))[0]`` variant measured
    ~2× on the family at sf0.1 — Shuffle is interpreted; a ``rand() >= -1``
    variant worked but the rand was simplified out of the final plan,
    leaving no pinnable residue). The guard survives into the physical
    plan — asserted by the plan pin in tests/test_length_skew.py."""
    return F.when(F.monotonically_increasing_id() >= -1, c)


def byte_pos_stream(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    lowered: bool = True,
    first_pos: int = 1,
    extra_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Explode ``docs`` into one row per gram start position.

    Output columns: ``*extra_cols, n_pos, pos, tb`` where ``tb`` is the
    (optionally lowered) UTF-8 byte string, ``n_pos = max(octet_len - k +
    1, 1)`` and ``pos`` ranges ``first_pos..n_pos`` (1-based byte offsets;
    empty when n_pos < first_pos). ``tb`` is prepared ONCE PER DOCUMENT
    behind a :func:`once_per_row` barrier — without it the optimizer may
    inline the lower+cast into the per-element loop, which is O(doc_len²)
    on a giant document. Consume ``tb`` with :func:`gram` in the SAME
    select that follows — before any exchange — so the bytes never ride a
    shuffle."""
    t = F.col(text_col)
    prep = docs.select(
        *extra_cols,
        once_per_row((F.lower(t) if lowered else t).cast("binary")).alias(
            "tb"
        ),
    )
    n_pos = F.greatest(F.length("tb") - (k - 1), F.lit(1))
    seq = F.when(
        n_pos >= first_pos, F.sequence(F.lit(first_pos), n_pos)
    ).otherwise(F.array().cast("array<int>"))
    return prep.select(
        *extra_cols,
        n_pos.alias("n_pos"),
        F.explode(seq).alias("pos"),
        "tb",
    )


def gram(k: int, pos_col: str = "pos") -> Column:
    """The k-byte gram at ``pos_col`` of a :func:`byte_pos_stream` row —
    a binary slice, O(k) regardless of document size."""
    return F.expr(f"substring(tb, {pos_col}, {k})")
