"""Text-analysis pack over `documents` (training-data pipeline operators):
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure column expressions — per-row narrow maps, no
shuffle, fully pushdown/codegen friendly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orc_spark.functions.hashing import h60, h60_sql
from orc_spark.plans import Query
from orc_spark.sources.tables import load_table, spread_small_scan

# small fixed english stopword list for the heuristics (public knowledge)
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


# --- token counting ---------------------------------------------------------

def tx_tokens(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    t = F.col("text")
    toks = F.split(F.trim(t), r"\s+")
    return docs.select(
        "doc_id",
        F.length(t).cast("int").alias("n_chars_calc"),
        F.size(toks).alias("n_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+', 0)")).alias("n_alpha_words"),
        F.size(F.expr(r"regexp_extract_all(text, '[0-9]+', 0)")).alias("n_numbers"),
        # BPE-ish subword proxy: alpha chunks + digits + punctuation marks
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\\s]', 0)")
        ).alias("n_subtokens"),
    )


TX_TOKENS_SQL = r"""
SELECT doc_id,
       CAST(length(text) AS INTEGER)                                  AS n_chars_calc,
       CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)    AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER)       AS n_alpha_words,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER)       AS n_numbers,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\s]')) AS INTEGER)
                                                                      AS n_subtokens
FROM documents
"""


# --- quality scoring --------------------------------------------------------

def tx_quality(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    t = F.col("text")
    n_chars = F.length(t).cast("double")
    toks = F.split(F.trim(t), r"\s+")
    n_toks = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS))).cast("double")
    n_punct = F.size(F.expr(r"regexp_extract_all(text, '[.,!?;:]', 0)")).cast("double")
    n_space = F.size(F.expr(r"regexp_extract_all(text, ' ', 0)")).cast("double")
    # degenerate-text guards (r14 sweep): an EMPTY document has n_chars 0
    # (punct_ratio would throw ANSI DIVIDE_BY_ZERO) — its ratios are
    # undefined, NULL on both engines. n_toks is ≥ 1 by construction
    # (split('') = ['']) but gets the same guard for symmetry.
    mean_tok_len = (n_chars - n_space) / F.nullif(n_toks, F.lit(0.0))
    stop_ratio = n_stop / F.nullif(n_toks, F.lit(0.0))
    punct_ratio = n_punct / F.nullif(n_chars, F.lit(0.0))
    # simple composite score: longer docs with natural stopword density and
    # moderate token length score higher
    score = (
        F.least(n_toks / 100.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.4
        + F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0), 0.2).otherwise(0.0)
    )
    return docs.select(
        "doc_id",
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


_SW = ", ".join(f"'{w}'" for w in STOPWORDS)
TX_QUALITY_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n_toks,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x IN ({_SW}))) AS DOUBLE) AS n_stop,
         CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS n_punct,
         CAST(len(regexp_extract_all(text, ' ')) AS DOUBLE) AS n_space
  FROM documents
)
SELECT doc_id,
       round((n_chars - n_space) / NULLIF(n_toks, 0), 6) AS mean_tok_len,
       round(n_stop / NULLIF(n_toks, 0), 6)              AS stop_ratio,
       round(n_punct / NULLIF(n_chars, 0), 6)            AS punct_ratio,
       round(
         least(n_toks / 100.0, 1.0) * 0.4
         + least(n_stop / NULLIF(n_toks, 0) * 5.0, 1.0) * 0.4
         + CASE WHEN (n_chars - n_space) / NULLIF(n_toks, 0) >= 3.0
                 AND (n_chars - n_space) / NULLIF(n_toks, 0) <= 10.0
                THEN 0.2 ELSE 0.0 END, 6)     AS quality_score
FROM base
"""


# --- Gopher-style quality rule battery --------------------------------------

# The published Gopher (Rae et al. 2021) document-filter rules, adapted to
# the corpus (no line structure → the line-level bullet/ellipsis rules are
# represented by the '...' symbol ratio). Public-paper thresholds.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2


def tx_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-rule quality filter (the published heuristics LLM corpora are
    cleaned with): word-count window, mean-word-length window, symbol-to-
    word ratio, fraction of words containing a letter, and >=2 distinct
    required stopwords; emits each signal, each rule verdict, and the
    composite keep flag. Pure column expressions — per-row narrow map, no
    shuffle, codegen end-to-end at 100 TB. Letter-containing words are
    counted with a regex instead of a higher-order filter (HOFs are
    CodegenFallback — CLAUDE.md); stopword presence is a fixed 8-way
    padded-LIKE battery, not a token explode."""
    docs = load_table(spark, sf, "documents")
    s = gopher_signals()
    return docs.select(
        "doc_id",
        s["n_words"].cast("bigint").alias("n_words"),
        F.round(s["mwl"], 6).alias("mean_word_len"),
        F.round(s["symbol_ratio"], 6).alias("symbol_ratio"),
        F.round(s["alpha_frac"], 6).alias("alpha_frac"),
        s["n_stop"].cast("bigint").alias("n_stopwords"),
        s["pass_words"].alias("pass_words"),
        s["pass_mwl"].alias("pass_mwl"),
        s["pass_symbol"].alias("pass_symbol"),
        s["pass_alpha"].alias("pass_alpha"),
        s["pass_stop"].alias("pass_stop"),
        s["keep"].alias("keep"),
    )


def gopher_signals(text_col: str = "text") -> dict:
    """The Gopher quality signal/verdict COLUMN EXPRESSIONS over a text
    column, shared by tx_gopher_quality (per-doc battery) and
    cu_corpus_report (folds the fail count into its single documents-scan
    aggregate). Keeping one definition guarantees the report's
    n_gopher_fail is byte-identical to the battery it summarizes."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(F.trim(t), r"\s+")
    n_words = F.size(toks)
    n_space = F.size(F.expr(rf"regexp_extract_all({text_col}, ' ', 0)"))
    mwl = (n_chars - n_space).cast("double") / n_words.cast("double")
    n_symbols = F.size(
        F.expr(rf"regexp_extract_all({text_col}, '#|\\.\\.\\.', 0)")
    )
    symbol_ratio = n_symbols.cast("double") / n_words.cast("double")
    n_alpha_words = F.size(
        F.expr(rf"regexp_extract_all({text_col}, '[^ ]*[a-z][^ ]*', 0)")
    )
    alpha_frac = n_alpha_words.cast("double") / n_words.cast("double")
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    n_stop = sum(
        (F.instr(padded, f" {w} ") > 0).cast("int") for w in GOPHER_STOPWORDS
    )
    pass_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    pass_mwl = (mwl >= GOPHER_MIN_MWL) & (mwl <= GOPHER_MAX_MWL)
    pass_symbol = symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO
    pass_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    pass_stop = n_stop >= GOPHER_MIN_STOPWORDS
    return {
        "n_words": n_words,
        "mwl": mwl,
        "symbol_ratio": symbol_ratio,
        "alpha_frac": alpha_frac,
        "n_stop": n_stop,
        "pass_words": pass_words,
        "pass_mwl": pass_mwl,
        "pass_symbol": pass_symbol,
        "pass_alpha": pass_alpha,
        "pass_stop": pass_stop,
        "keep": pass_words & pass_mwl & pass_symbol & pass_alpha & pass_stop,
    }


# CAST(bool AS INT), not CASE WHEN: NULL text must null-propagate exactly
# like Spark's (instr > 0).cast("int") does (a CASE's ELSE 0 would turn a
# NULL doc into 0 on one engine only)
_GOPHER_STOP_SQL = " + ".join(
    f"CAST(position(' {w} ' IN ' ' || text || ' ') > 0 AS INTEGER)"
    for w in GOPHER_STOPWORDS
)
TX_GOPHER_QUALITY_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
         CAST(length(text) - len(regexp_extract_all(text, ' ')) AS DOUBLE)
           / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS mwl,
         CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
           / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS symbol_ratio,
         CAST(len(regexp_extract_all(text, '[^ ]*[a-z][^ ]*')) AS DOUBLE)
           / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS alpha_frac,
         CAST({_GOPHER_STOP_SQL} AS BIGINT) AS n_stopwords
  FROM documents
)
SELECT doc_id, n_words,
       round(mwl, 6)          AS mean_word_len,
       round(symbol_ratio, 6) AS symbol_ratio,
       round(alpha_frac, 6)   AS alpha_frac,
       n_stopwords,
       n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS} AS pass_words,
       mwl >= {GOPHER_MIN_MWL} AND mwl <= {GOPHER_MAX_MWL}             AS pass_mwl,
       symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}                       AS pass_symbol,
       alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}                           AS pass_alpha,
       n_stopwords >= {GOPHER_MIN_STOPWORDS}                           AS pass_stop,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
         AND (mwl >= {GOPHER_MIN_MWL} AND mwl <= {GOPHER_MAX_MWL})
         AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
         AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
         AND n_stopwords >= {GOPHER_MIN_STOPWORDS}                     AS keep
FROM base
"""


# --- language-ID heuristic --------------------------------------------------

def tx_langid(spark: SparkSession, sf: str) -> DataFrame:
    """N-gram/stopword language heuristic: english stopword density plus a
    CJK-codepoint check. (The testdata's `lang` column is synthetic noise —
    all text shares one vocabulary — so this is a deterministic operator
    demo, not a recovery task; accuracy on real corpora would come from
    per-language stopword tables plugged into the same shape.)"""
    docs = load_table(spark, sf, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_toks = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS))).cast("double")
    has_cjk = F.size(F.expr(r"regexp_extract_all(text, '[\\u4e00-\\u9fff]', 0)")) > 0
    ratio = n_stop / n_toks
    pred = (
        F.when(has_cjk, "zh")
        .when(ratio >= 0.08, "en")
        .when(ratio >= 0.02, "en_maybe")
        .otherwise("unk")
    )
    return docs.select(
        "doc_id", "lang", F.round(ratio, 6).alias("stop_ratio"), pred.alias("pred_lang")
    )


TX_LANGID_SQL = rf"""
WITH base AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              x -> x IN ({_SW}))) AS DOUBLE)
           / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE)
           AS ratio,
         len(regexp_extract_all(text, '[一-鿿]')) > 0 AS has_cjk
  FROM documents
)
SELECT doc_id, lang, round(ratio, 6) AS stop_ratio,
       CASE WHEN has_cjk THEN 'zh'
            WHEN ratio >= 0.08 THEN 'en'
            WHEN ratio >= 0.02 THEN 'en_maybe'
            ELSE 'unk' END AS pred_lang
FROM base
"""


# --- document fingerprinting ------------------------------------------------

def tx_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Content fingerprints: digest of whitespace-normalized text + a prefix
    fingerprint of the first 5 tokens (cheap near-dup blocking key)."""
    docs = load_table(spark, sf, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    prefix = F.concat_ws(" ", F.slice(F.split(norm, " "), 1, 5))
    return docs.select(
        "doc_id",
        h60(norm).alias("fingerprint"),
        h60(prefix).alias("prefix_fp"),
    )


TX_FINGERPRINT_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       {h60_sql('norm')} AS fingerprint,
       {h60_sql("array_to_string(string_split(norm, ' ')[1:5], ' ')")} AS prefix_fp
FROM base
"""


# --- winnowing fingerprints (rolling-hash document fingerprinting) ----------

WINNOW_K = 5  # k-gram size (shared with the MinHash shingler)
WINNOW_W = 8  # winnowing window: guarantees a shared fingerprint for any
              # match of length >= W + K - 1 (Schleimer et al., MOSS)


def tx_winnow(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprint selection: hash every k-gram, slide a window of
    W consecutive hashes, select each window's minimum — the classic
    rolling-hash fingerprinting scheme (robust to insertions: any
    sufficiently long shared substring shares a selected fingerprint).
    Output is the per-doc fingerprint-set summary (count + xor-fold), which
    hash-checks without exploding the set. One narrow explode + one window
    min + one groupBy; linear at any corpus size."""
    # doc_id-keyed spread (r15): window min, (doc_id, fp) distinct and the
    # per-doc rollup all reuse the spread exchange — the exploded gram
    # stream never re-shuffles
    docs = spread_small_scan(
        load_table(spark, sf, "documents"), key="doc_id"
    )
    from pyspark.sql import Window

    from orc_spark.operators.gramscan import byte_pos_stream, gram

    # BYTE-domain k-grams (gramscan.py, r15): positional STRING substring
    # walks codepoints from byte 0 — O(doc_len²) per exploded doc — which
    # one giant document turns into an unbounded straggler task
    grams = byte_pos_stream(docs, WINNOW_K).select(
        "doc_id",
        "n_pos",
        "pos",
        h60(gram(WINNOW_K)).alias("h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    wins = grams.select(
        "doc_id",
        "pos",
        "n_pos",
        F.min("h").over(w).alias("fp"),
    ).where(F.col("pos") <= F.col("n_pos") - (WINNOW_W - 1))
    fps = wins.select("doc_id", "fp").distinct()
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.expr("bit_xor(fp)").alias("fp_xor"),
        F.min("fp").alias("fp_min"),
    )


TX_WINNOW_SQL = f"""
WITH grams AS (
  SELECT doc_id,
         greatest(length(text) - {WINNOW_K - 1}, 1) AS n_pos,
         pos,
         {h60_sql(f'lower(substr(text, pos, {WINNOW_K}))')} AS h
  FROM (SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - {WINNOW_K - 1}, 1) + 1))
                 AS pos
        FROM documents)
),
wins AS (
  SELECT doc_id, pos, n_pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
           AS fp
  FROM grams
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM wins WHERE pos <= n_pos - {WINNOW_W - 1}
)
SELECT doc_id,
       count(*)                     AS n_fp,
       CAST(bit_xor(fp) AS BIGINT)  AS fp_xor,
       min(fp)                      AS fp_min
FROM fps GROUP BY doc_id
"""


# --- within-document repetition removal (Gopher repetition filters) ---------
#
# Rae et al. 2021 (Gopher), appendix A1.1 — the published repetition rules
# LLM corpora are cleaned with. Thresholds below are the published ones;
# the verdicts are evaluated as EXACT integer cross-multiplications
# (10*dup > 3*n instead of dup/n > 0.30) so keep/drop never touches a
# float literal — DuckDB parses float literals as DECIMAL (CLAUDE.md),
# which makes float threshold comparisons the one cross-engine hazard a
# filter like this has.

REP_DUP_FRAC = (3, 10)     # duplicate line / paragraph fraction > 0.30
REP_DUP_CHAR = (1, 5)      # duplicate line / paragraph char fraction > 0.20
REP_TOP_SHARE = {2: (1, 5), 3: (9, 50), 4: (4, 25)}  # 0.20 / 0.18 / 0.16


def tx_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition removal (the Gopher/Rae et al. 2021
    repetition filters, public knowledge): per doc, duplicate line and
    paragraph fractions (occurrence and character weighted) plus the
    character share of the single most frequent word 2/3/4-gram; emits
    every signal and the composite keep flag — the within-doc sibling of
    the cross-doc dedup family and of tx_gopher_quality's quality rules.

    Definitions (stated exactly, both engines): a segment occurrence is a
    DUPLICATE if an identical segment occurred earlier in the doc, so
    dup_frac = (n - n_distinct) / n and dup_char_frac counts the repeated
    occurrences' characters over all segment characters; lines split on
    \\n, paragraphs on \\n\\n (split semantics probed identical
    Spark/DuckDB incl. trailing empties); the top n-gram tiebreak is
    (count DESC, h60 ASC) — hash order is engine-identical where raw
    string order would need collation care. Empty docs: char-fraction and
    share denominators go NULL (never ANSI DIVIDE_BY_ZERO); NULL signals
    count as non-violations in `keep`.

    100 TB shape: segments and grams are narrow explodes whose projections
    hash to ints IN THE SCAN STAGE (the dd_cdc_chunks contract — text
    never enters an analytic shuffle; pinned by a plan test); per-doc
    rollups are map-side-combinable int groupBys; the top-gram pick is a
    (doc_id, n)-partitioned window (never global); the final assembly
    joins int frames on doc_id. Word arrays stay stage-local in the gram
    explode. Everything is linear in corpus characters."""
    from pyspark.sql import Window

    # doc_id-keyed spread (r15): every segment/gram rollup groupBy and the
    # final doc_id assembly joins are doc_id-clustered — one exchange
    # serves the whole query
    docs = spread_small_scan(
        load_table(spark, sf, "documents").where(F.col("text").isNotNull()),
        key="doc_id",
    )
    base = docs.select(
        "doc_id", "source", F.col("text").alias("t"),
        F.length("text").cast("bigint").alias("tlen"),
    )

    def seg_agg(delim: str, p: str) -> DataFrame:
        occ = base.select(
            "doc_id", F.explode(F.split(F.col("t"), delim)).alias("seg")
        ).select(
            "doc_id",
            h60(F.col("seg")).alias("h"),
            F.length("seg").cast("bigint").alias("len"),
        )
        grp = occ.groupBy("doc_id", "h").agg(
            F.count(F.lit(1)).alias("c"),
            # min, not first: deterministic even under a 60-bit collision
            F.min("len").alias("len"),
        )
        return grp.groupBy("doc_id").agg(
            F.sum("c").cast("bigint").alias(f"{p}_n"),
            (F.sum("c") - F.count(F.lit(1))).cast("bigint").alias(f"{p}_dup"),
            F.sum(F.col("c") * F.col("len")).cast("bigint").alias(f"{p}_chars"),
            F.sum((F.col("c") - 1) * F.col("len"))
            .cast("bigint")
            .alias(f"{p}_dup_chars"),
        )

    lines = seg_agg("\n", "line")
    paras = seg_agg("\n\n", "para")

    gram = F.expr("array_join(slice(w, i, n), ' ')")
    gocc = (
        base.select(
            "doc_id", F.split(F.col("t"), r"\s+").alias("w")
        )
        .select(
            "doc_id",
            F.explode(F.array(F.lit(2), F.lit(3), F.lit(4))).alias("n"),
            "w",
        )
        .select(
            "doc_id",
            "n",
            F.explode(
                F.when(
                    F.size("w") >= F.col("n"),
                    F.sequence(F.lit(1), F.size("w") - F.col("n") + 1),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            "n",
            h60(gram).alias("h"),
            F.length(gram).cast("bigint").alias("glen"),
        )
    )
    gcnt = gocc.groupBy("doc_id", "n", "h").agg(
        F.count(F.lit(1)).alias("c"), F.min("glen").alias("glen")
    )
    wtop = Window.partitionBy("doc_id", "n").orderBy(
        F.col("c").desc(), F.col("h").asc()
    )
    grams = (
        gcnt.withColumn("rn", F.row_number().over(wtop))
        .where(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("n") == n, F.col("c") * F.col("glen"))
                )
                .cast("bigint")
                .alias(f"top{n}_num")
                for n in (2, 3, 4)
            ]
        )
    )

    out = (
        base.select("doc_id", "source", "tlen")
        .join(lines, "doc_id")
        .join(paras, "doc_id")
        .join(grams, "doc_id", "left")
    )
    fa, fb = REP_DUP_FRAC
    ca, cb = REP_DUP_CHAR
    viol = F.lit(False)
    for term in (
        F.col("line_dup") * fb > F.col("line_n") * fa,
        F.col("para_dup") * fb > F.col("para_n") * fa,
        F.col("line_dup_chars") * cb > F.col("line_chars") * ca,
        F.col("para_dup_chars") * cb > F.col("para_chars") * ca,
        *[
            F.col(f"top{n}_num") * REP_TOP_SHARE[n][1]
            > F.col("tlen") * REP_TOP_SHARE[n][0]
            for n in (2, 3, 4)
        ],
    ):
        viol = viol | F.coalesce(term, F.lit(False))
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return out.select(
        "doc_id",
        "source",
        F.col("line_n").alias("n_lines"),
        r6(dbl("line_dup") / F.col("line_n")).alias("dup_line_frac"),
        r6(dbl("line_dup_chars") / F.nullif(F.col("line_chars"), F.lit(0))).alias(
            "dup_line_char_frac"
        ),
        F.col("para_n").alias("n_paras"),
        r6(dbl("para_dup") / F.col("para_n")).alias("dup_para_frac"),
        r6(dbl("para_dup_chars") / F.nullif(F.col("para_chars"), F.lit(0))).alias(
            "dup_para_char_frac"
        ),
        *[
            r6(dbl(f"top{n}_num") / F.nullif(F.col("tlen"), F.lit(0))).alias(
                f"top{n}_share"
            )
            for n in (2, 3, 4)
        ],
        (~viol).alias("keep"),
    )


def _rep_seg_sql(split_expr: str, p: str) -> str:
    """Per-doc duplicate-segment aggregate CTEs (DuckDB side)."""
    return f"""
{p}_occ AS (
  SELECT doc_id, {h60_sql('seg')} AS h, length(seg) AS len
  FROM (SELECT doc_id, unnest({split_expr}) AS seg FROM rep_base)
),
{p}_grp AS (
  SELECT doc_id, h, count(*) AS c, min(len) AS len
  FROM {p}_occ GROUP BY doc_id, h
),
{p}_agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT)              AS {p}_n,
         CAST(sum(c) - count(*) AS BIGINT)   AS {p}_dup,
         CAST(sum(c * len) AS BIGINT)        AS {p}_chars,
         CAST(sum((c - 1) * len) AS BIGINT)  AS {p}_dup_chars
  FROM {p}_grp GROUP BY doc_id
)"""


_REP_GRAM_SQL = f"""
rep_gpos AS (
  SELECT doc_id, n, ws,
         unnest(range(1, greatest(len(ws) - n + 2, 1))) AS i
  FROM (SELECT doc_id, string_split_regex(t, '\\s+') AS ws,
               unnest([2, 3, 4]) AS n
        FROM rep_base)
),
rep_gocc AS (
  SELECT doc_id, n,
         {h60_sql("array_to_string(list_slice(ws, i, i + n - 1), ' ')")} AS h,
         length(array_to_string(list_slice(ws, i, i + n - 1), ' ')) AS glen
  FROM rep_gpos
),
rep_gcnt AS (
  SELECT doc_id, n, h, count(*) AS c, min(glen) AS glen
  FROM rep_gocc GROUP BY doc_id, n, h
),
rep_gtop AS (
  SELECT doc_id, n, c, glen,
         row_number() OVER (PARTITION BY doc_id, n ORDER BY c DESC, h ASC)
           AS rn
  FROM rep_gcnt
),
rep_gagg AS (
  SELECT doc_id,
         CAST(max(CASE WHEN n = 2 THEN c * glen END) AS BIGINT) AS top2_num,
         CAST(max(CASE WHEN n = 3 THEN c * glen END) AS BIGINT) AS top3_num,
         CAST(max(CASE WHEN n = 4 THEN c * glen END) AS BIGINT) AS top4_num
  FROM rep_gtop WHERE rn = 1 GROUP BY doc_id
)"""

_REP_VIOL_SQL = " OR ".join(
    f"coalesce({t}, false)"
    for t in [
        f"l.line_dup * {REP_DUP_FRAC[1]} > l.line_n * {REP_DUP_FRAC[0]}",
        f"p.para_dup * {REP_DUP_FRAC[1]} > p.para_n * {REP_DUP_FRAC[0]}",
        f"l.line_dup_chars * {REP_DUP_CHAR[1]} > l.line_chars * {REP_DUP_CHAR[0]}",
        f"p.para_dup_chars * {REP_DUP_CHAR[1]} > p.para_chars * {REP_DUP_CHAR[0]}",
        *[
            f"g.top{n}_num * {REP_TOP_SHARE[n][1]} > b.tlen * {REP_TOP_SHARE[n][0]}"
            for n in (2, 3, 4)
        ],
    ]
)

TX_REPETITION_SQL = f"""
WITH rep_base AS (
  SELECT doc_id, source, text AS t, CAST(length(text) AS BIGINT) AS tlen
  FROM documents WHERE text IS NOT NULL
),
{_rep_seg_sql("string_split(t, chr(10))", "line").lstrip()},
{_rep_seg_sql("string_split(t, chr(10) || chr(10))", "para").lstrip()},
{_REP_GRAM_SQL.lstrip()}
SELECT b.doc_id, b.source,
       l.line_n AS n_lines,
       round(CAST(l.line_dup AS DOUBLE) / l.line_n, 6) AS dup_line_frac,
       round(CAST(l.line_dup_chars AS DOUBLE) / NULLIF(l.line_chars, 0), 6)
         AS dup_line_char_frac,
       p.para_n AS n_paras,
       round(CAST(p.para_dup AS DOUBLE) / p.para_n, 6) AS dup_para_frac,
       round(CAST(p.para_dup_chars AS DOUBLE) / NULLIF(p.para_chars, 0), 6)
         AS dup_para_char_frac,
       round(CAST(g.top2_num AS DOUBLE) / NULLIF(b.tlen, 0), 6) AS top2_share,
       round(CAST(g.top3_num AS DOUBLE) / NULLIF(b.tlen, 0), 6) AS top3_share,
       round(CAST(g.top4_num AS DOUBLE) / NULLIF(b.tlen, 0), 6) AS top4_share,
       NOT ({_REP_VIOL_SQL}) AS keep
FROM rep_base b
JOIN line_agg l USING (doc_id)
JOIN para_agg p USING (doc_id)
LEFT JOIN rep_gagg g USING (doc_id)
"""


QUERIES = [
    Query("tx_repetition", tx_repetition, TX_REPETITION_SQL, "within-document repetition removal (Gopher dup-line/paragraph fractions + top n-gram char share)"),
    Query("tx_tokens", tx_tokens, TX_TOKENS_SQL, "token/word/subtoken counting"),
    Query("tx_quality", tx_quality, TX_QUALITY_SQL, "document quality scoring"),
    Query("tx_gopher_quality", tx_gopher_quality, TX_GOPHER_QUALITY_SQL, "Gopher-rule quality filter battery (published thresholds)"),
    Query("tx_langid", tx_langid, TX_LANGID_SQL, "stopword/CJK language heuristic"),
    Query("tx_fingerprint", tx_fingerprint, TX_FINGERPRINT_SQL, "normalized-content fingerprints"),
    Query("tx_winnow", tx_winnow, TX_WINNOW_SQL, "winnowing rolling-hash fingerprints (MOSS scheme)"),
]
