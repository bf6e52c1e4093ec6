"""tx_repetition (Gopher within-document repetition filters, r15): planted
repetitions must produce the exact published-threshold verdicts, and every
signal must match a brute-force Python oracle that mirrors the stated
definitions (dup = occurrence beyond the first identical segment; top
n-gram tiebreak = count DESC then h60 ASC)."""

from __future__ import annotations

import os
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest

from orc_spark.functions.hashing import h60_py
from orc_spark.plans.text_q import (
    REP_DUP_CHAR,
    REP_DUP_FRAC,
    REP_TOP_SHARE,
    tx_repetition,
)


def _r6(v):
    """round-half-up to 6 dp (Spark/DuckDB round(); Python round is
    banker's — CLAUDE.md)."""
    if v is None:
        return None
    return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


DOCS = [
    # (doc_id, text, expected_keep_reason)
    # A: 3 of 5 line occurrences are the repeated 'a' -> dup_line_frac 0.4
    (1, "a\nb\na\nc\na", False),
    # B: long varied text, every 2/3/4-gram unique, no newlines -> keep
    (2, " ".join(f"w{i:02d}token" for i in range(40)), True),
    # C: one dominant 2-gram -> top2_share way over 0.20
    (3, "spam ham " * 30, False),
    # D: duplicate paragraph (1 of 3) -> dup_para_frac 1/3 > 0.30
    (4, "para one text\n\npara one text\n\npara two body", False),
    # E: single word (no 2-grams at all -> NULL shares count as pass)
    (5, "solitary", True),
]


def _brute(text: str) -> dict:
    def seg(parts):
        n = len(parts)
        dup = n - len(set(parts))
        chars = sum(map(len, parts))
        dup_chars = chars - sum(len(s) for s in set(parts))
        return n, dup, chars, dup_chars

    ln = seg(text.split("\n"))
    pa = seg(text.split("\n\n"))
    tlen = len(text)
    words = re.split(r"\s+", text)
    tops = {}
    for n in (2, 3, 4):
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        if not grams:
            tops[n] = None
            continue
        cnt = Counter(grams)
        best = min(cnt, key=lambda g: (-cnt[g], h60_py(g)))
        tops[n] = cnt[best] * len(best)
    viol = (
        ln[1] * REP_DUP_FRAC[1] > ln[0] * REP_DUP_FRAC[0]
        or pa[1] * REP_DUP_FRAC[1] > pa[0] * REP_DUP_FRAC[0]
        or ln[3] * REP_DUP_CHAR[1] > ln[2] * REP_DUP_CHAR[0]
        or pa[3] * REP_DUP_CHAR[1] > pa[2] * REP_DUP_CHAR[0]
        or any(
            tops[n] is not None
            and tops[n] * REP_TOP_SHARE[n][1] > tlen * REP_TOP_SHARE[n][0]
            for n in (2, 3, 4)
        )
    )
    return {
        "n_lines": ln[0],
        "dup_line_frac": _r6(ln[1] / ln[0]),
        "dup_line_char_frac": _r6(ln[3] / ln[2]) if ln[2] else None,
        "n_paras": pa[0],
        "dup_para_frac": _r6(pa[1] / pa[0]),
        "dup_para_char_frac": _r6(pa[3] / pa[2]) if pa[2] else None,
        **{
            f"top{n}_share": _r6(tops[n] / tlen)
            if tops[n] is not None and tlen
            else None
            for n in (2, 3, 4)
        },
        "keep": not viol,
    }


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planted_rep"))
    rows = [
        (i, t, "en", "planted", len(t)) for i, t, _ in DOCS
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_planted_repetitions(spark, planted_sf):
    got = {
        r["doc_id"]: r.asDict()
        for r in tx_repetition(spark, planted_sf).collect()
    }
    assert set(got) == {i for i, _, _ in DOCS}
    for doc_id, text, want_keep in DOCS:
        row = got[doc_id]
        exp = _brute(text)
        assert row["keep"] is want_keep, (doc_id, row)
        for k, v in exp.items():
            assert row[k] == v, (doc_id, k, row[k], v)


def test_text_stays_out_of_analytic_shuffles(spark, sf_small):
    """The gram-family contract (dd_cdc_chunks sibling): every
    planner-inserted (ENSURE_REQUIREMENTS) hashpartitioning exchange in
    tx_repetition carries ints (and the tiny source/doc_id assembly) —
    never the text or word-array columns. Text rides only the caller's
    own doc_id-keyed cores-not-bytes spread (REPARTITION_BY_NUM, r15),
    which every downstream doc_id-clustered fold reuses."""
    from orc_spark.plans.explain import formatted_plan

    plan = formatted_plan(tx_repetition(spark, sf_small))
    exchanges = [
        b
        for b in re.split(r"\n\n", plan)
        if re.match(r"\(\d+\) Exchange", b) and "hashpartitioning" in b
    ]
    spread = [b for b in exchanges if "REPARTITION_BY_NUM" in b]
    analytic = [b for b in exchanges if "ENSURE_REQUIREMENTS" in b]
    assert spread and all("doc_id" in b for b in spread), plan
    # since the r15 keyed spread, the line/para/gram folds all REUSE the
    # spread's doc_id partitioning — ZERO planner-inserted hash exchanges
    # is the pinned plan shape (ADVICE r15: an explicit count, so a
    # regression OR an explain-format drift that stops the regex matching
    # ENSURE_REQUIREMENTS blocks fails loudly instead of passing
    # vacuously). If a future Spark legitimately re-adds an ints-only
    # exchange, update this pin alongside a plans/ dump.
    assert len(analytic) == 0, [b.splitlines()[0] for b in analytic]
