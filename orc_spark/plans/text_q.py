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
    docs = spread_small_scan(load_table(spark, sf, "documents"))
    from pyspark.sql import Window

    t = F.lower(F.col("text"))
    n_pos = F.greatest(F.length(t) - (WINNOW_K - 1), F.lit(1))
    grams = docs.select(
        "doc_id",
        n_pos.alias("n_pos"),
        F.explode(F.sequence(F.lit(1), n_pos)).alias("pos"),
        t.alias("t"),
    ).select(
        "doc_id",
        "n_pos",
        "pos",
        h60(F.expr(f"substring(t, pos, {WINNOW_K})")).alias("h"),
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
         {h60_sql(f'substr(lower(text), pos, {WINNOW_K})')} AS h
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


QUERIES = [
    Query("tx_tokens", tx_tokens, TX_TOKENS_SQL, "token/word/subtoken counting"),
    Query("tx_quality", tx_quality, TX_QUALITY_SQL, "document quality scoring"),
    Query("tx_gopher_quality", tx_gopher_quality, TX_GOPHER_QUALITY_SQL, "Gopher-rule quality filter battery (published thresholds)"),
    Query("tx_langid", tx_langid, TX_LANGID_SQL, "stopword/CJK language heuristic"),
    Query("tx_fingerprint", tx_fingerprint, TX_FINGERPRINT_SQL, "normalized-content fingerprints"),
    Query("tx_winnow", tx_winnow, TX_WINNOW_SQL, "winnowing rolling-hash fingerprints (MOSS scheme)"),
]
