"""Corpus-statistics / information-retrieval pack over `documents`:
TF-IDF term weighting with per-document top-k terms, and inverted-index
(posting list) construction.

Reference analog: the text-analysis extensions mandated by the build plan
(SURVEY §7.1 — training-data pipeline operators are first-class).

100 TB shape:
- tokenize/explode is a narrow per-row map (no shuffle);
- term frequency is one groupBy(doc_id, term) shuffle with map-side
  partial aggregation;
- document frequency is a window over `term` on the tf table (one shuffle
  by term; the tf table is |doc×distinct-term| rows, far smaller than the
  token stream);
- the corpus size N is a 1-row aggregate broadcast-joined in;
- top-k per document is one window by doc_id.
No driver-side collection anywhere; vocabulary never materializes on one
node (posting digests are xor-folds, order-independent and mergeable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orc_spark.functions.hashing import h60_sql, xor_digest
from orc_spark.plans import Query
from orc_spark.sources.tables import load_table

TOPK = 5


def _tf(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("term"),
    )
    return terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


_TF_SQL = """
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents)
  GROUP BY doc_id, term
"""


# --- TF-IDF with per-doc top-k ----------------------------------------------

def tx_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    """TF-IDF: idf = ln((N+1)/(df+1)) + 1 (smoothed), score = tf * idf;
    top-5 terms per document (ties broken by term asc). The float math is
    identical expression-for-expression on both engines over exact integer
    inputs, so the scores are bit-identical before the 6-decimal round."""
    tf = _tf(spark, sf)
    docs = load_table(spark, sf, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # df: one window by term on the tf table (rows are per doc-term, so the
    # partition count IS the document frequency)
    dfw = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(dfw))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf_raw",
            F.col("tf").cast("double")
            * (
                F.log(
                    (F.col("n_docs") + 1).cast("double")
                    / (F.col("df") + 1).cast("double")
                )
                + F.lit(1.0)
            ),
        )
    )
    rk = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_raw").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk))
        .where(F.col("rank") <= TOPK)
        .select(
            "doc_id",
            "term",
            "tf",
            F.col("df").cast("bigint").alias("df"),
            F.round("tfidf_raw", 6).alias("tfidf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


TX_TFIDF_SQL = f"""
WITH tf AS ({_TF_SQL}),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         CAST(count(*) OVER (PARTITION BY tf.term) AS BIGINT) AS df,
         CAST(tf.tf AS DOUBLE)
           * (ln(CAST(n.n_docs + 1 AS DOUBLE)
                 / CAST(count(*) OVER (PARTITION BY tf.term) + 1 AS DOUBLE))
              + 1.0) AS tfidf_raw
  FROM tf, n
),
ranked AS (
  SELECT doc_id, term, tf, df, tfidf_raw,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_raw DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, round(tfidf_raw, 6) AS tfidf,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOPK}
"""


# --- inverted index (posting lists) -----------------------------------------

def tx_postings(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted-index construction: per term, the posting-list summary —
    document frequency, total term frequency, min/max doc id, and an
    order-independent xor digest of the (doc_id, tf) postings. The digest
    hash-checks the full posting-list CONTENT without shipping the list;
    xor-folds are mergeable, so at 100 TB this is a single combinable
    groupBy(term) over the tf table."""
    tf = _tf(spark, sf)
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.min("doc_id").alias("doc_min"),
        F.max("doc_id").alias("doc_max"),
        xor_digest("doc_id", "tf").alias("postings_digest"),
    ).select(
        "term", "df", F.col("total_tf").cast("bigint").alias("total_tf"),
        "doc_min", "doc_max", "postings_digest",
    )


TX_POSTINGS_SQL = f"""
WITH tf AS ({_TF_SQL})
SELECT term,
       CAST(count(*) AS BIGINT)  AS df,
       CAST(sum(tf) AS BIGINT)   AS total_tf,
       min(doc_id)               AS doc_min,
       max(doc_id)               AS doc_max,
       CAST(bit_xor({h60_sql("concat_ws(':', doc_id, tf)")}) AS BIGINT)
                                 AS postings_digest
FROM tf GROUP BY term
"""



# --- PMI collocation mining --------------------------------------------------

COLLOC_MIN_C = 5
COLLOC_TOPK = 20


def tx_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram collocation mining by pointwise mutual information:
    PMI = ln(N · c_xy / (c_x · c_y)) over adjacent-token bigrams, top-20
    by PMI (min bigram count 5, ties by bigram asc). Bigrams come from one
    window-lead by doc (not a self-join); unigram counts attach by two term
    joins; N is a 1-row broadcast. All counts integer → identical doubles."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("pos", "term"),
    )
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    n = toks.agg(F.count(F.lit(1)).alias("n_tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        toks.withColumn("nxt", F.lead("term").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("term").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= COLLOC_MIN_C)
    )
    scored = (
        bi.join(uni.select(F.col("term").alias("a"), F.col("c").alias("c_a")), "a")
        .join(uni.select(F.col("term").alias("b"), F.col("c").alias("c_b")), "b")
        .crossJoin(F.broadcast(n))
        .select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            "c_xy",
            F.col("c_a").alias("c_x"),
            F.col("c_b").alias("c_y"),
            F.round(
                F.log(
                    F.col("n_tok").cast("double") * F.col("c_xy").cast("double")
                    / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), F.col("bigram").asc()).limit(
        COLLOC_TOPK
    )


TX_COLLOC_SQL = f"""
WITH toks AS (
  SELECT doc_id, pos - 1 AS pos, term
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term,
               generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1)
                 AS pos
        FROM documents)
),
uni AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM toks),
bi AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c_xy
  FROM (SELECT term AS a,
               lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b
        FROM toks)
  WHERE b IS NOT NULL
  GROUP BY a, b
  HAVING count(*) >= {COLLOC_MIN_C}
)
SELECT a || ' ' || b AS bigram, c_xy,
       ua.c AS c_x, ub.c AS c_y,
       round(ln(CAST(n_tok AS DOUBLE) * CAST(c_xy AS DOUBLE)
                / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))), 6) AS pmi
FROM bi JOIN uni ua ON bi.a = ua.term
        JOIN uni ub ON bi.b = ub.term, n
ORDER BY pmi DESC, bigram ASC
LIMIT {COLLOC_TOPK}
"""


# --- BM25 ranking ------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def tx_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 term weights (k1=1.2, b=0.75): the standard IR ranking
    function over the same tf/df tables as tx_tfidf, plus per-doc length
    and corpus average length. idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
    Top-5 terms per doc. Same scale shape as tx_tfidf: tf groupBy, df
    window, (N, avgdl) as a 1-row broadcast, one top-k window — the length
    normalization adds a doc-length groupBy that reuses the tf table."""
    tf = _tf(spark, sf)
    # doc length dl = sum(tf) over the doc partition as a WINDOW, not a
    # separate groupBy + join — the dl window and the final top-k window
    # share one hash partitioning on doc_id, and the per-doc-grouped dl
    # table never exists as a join side. The corpus totals collapse to one
    # global aggregate over tf (count(distinct doc_id) ≡ |dl|, sum(tf) ≡
    # Σdl), so tf is computed twice total instead of four times.
    n_and_avg = tf.agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum("tf").alias("tot_dl"),
    )
    dfw = Window.partitionBy("term")
    dlw = Window.partitionBy("doc_id")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(dfw))
        .withColumn("dl", F.sum("tf").over(dlw))
        .crossJoin(F.broadcast(n_and_avg))
        .withColumn(
            "bm25_raw",
            F.log(
                F.lit(1.0)
                + (
                    (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
                )
                / (F.col("df").cast("double") + F.lit(0.5))
            )
            * (
                F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0)
            )
            / (
                F.col("tf").cast("double")
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0 - BM25_B)
                    + F.lit(BM25_B)
                    * (F.col("dl").cast("double") * F.col("n_docs").cast("double"))
                    / F.col("tot_dl").cast("double")
                )
            ),
        )
    )
    rk = Window.partitionBy("doc_id").orderBy(
        F.col("bm25_raw").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk))
        .where(F.col("rank") <= TOPK)
        .select(
            "doc_id",
            "term",
            "tf",
            F.col("dl").cast("bigint").alias("dl"),
            F.round("bm25_raw", 6).alias("bm25"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


TX_BM25_SQL = f"""
WITH tf AS ({_TF_SQL}),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
na AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(dl) AS BIGINT) AS tot_dl FROM dl),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dl.dl,
         ln(1.0 + (CAST(n_docs - count(*) OVER (PARTITION BY tf.term) AS DOUBLE) + 0.5)
                  / (CAST(count(*) OVER (PARTITION BY tf.term) AS DOUBLE) + 0.5))
           * (CAST(tf.tf AS DOUBLE) * CAST({BM25_K1 + 1.0!r} AS DOUBLE))
           / (CAST(tf.tf AS DOUBLE)
              + CAST({BM25_K1!r} AS DOUBLE) * (CAST({1.0 - BM25_B!r} AS DOUBLE)
                 + CAST({BM25_B!r} AS DOUBLE) * (CAST(dl.dl AS DOUBLE) * CAST(n_docs AS DOUBLE))
                   / CAST(tot_dl AS DOUBLE)))
           AS bm25_raw
  FROM tf JOIN dl USING (doc_id), na
),
ranked AS (
  SELECT doc_id, term, tf, dl, bm25_raw,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY bm25_raw DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, dl, round(bm25_raw, 6) AS bm25,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOPK}
"""

# --- bigram language-model familiarity ---------------------------------------

def tx_ngram_lm(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document bigram LM familiarity — the count-based stand-in for
    perplexity filtering in training-data curation (docs whose n-grams are
    rare corpus-wide are novel/noisy; docs made of common n-grams are
    familiar/fluent). Per doc: number of bigram tokens, the integer SUM of
    corpus-wide counts of its bigrams, and how many of its bigram types
    occur nowhere else in the corpus (novel types). The only float is one
    final ln(mean familiarity) per row — integer aggregation end-to-end,
    so cross-engine hashing is exact (the accumulated-doubles hazard never
    arises).

    100 TB shape: one window-lead per doc builds bigrams (no self-join),
    corpus counts are one groupBy with map-side combine, and the
    doc-bigram → corpus-count attach is a plain equi-join on the bigram
    key — all shuffle-bounded by the token count, no driver state."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("pos", "term"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    doc_bi = (
        toks.withColumn("nxt", F.lead("term").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy("doc_id", F.col("term").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("k"))
        # consumed twice (corpus rollup + the join-back); per-branch column
        # pruning defeats exchange reuse, so the token explode would run
        # twice — materialize the (much smaller) doc-bigram table instead
        .localCheckpoint(eager=False)
    )
    corpus = doc_bi.groupBy("a", "b").agg(F.sum("k").alias("c_xy"))
    return (
        doc_bi.join(corpus, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bi"),
            F.sum(F.col("k") * F.col("c_xy")).alias("sum_cxy"),
            F.sum(F.when(F.col("c_xy") == F.col("k"), 1).otherwise(0)).alias(
                "n_novel_types"
            ),
        )
        .select(
            "doc_id",
            "n_bi",
            "sum_cxy",
            F.col("n_novel_types").cast("bigint").alias("n_novel_types"),
            F.round(
                F.log(
                    F.col("sum_cxy").cast("double") / F.col("n_bi").cast("double")
                ),
                6,
            ).alias("familiarity"),
        )
        .orderBy("doc_id")
    )


TX_NGRAM_LM_SQL = """
WITH toks AS (
  SELECT doc_id, pos, term
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term,
               generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1)
                 AS pos
        FROM documents)
),
doc_bi AS (
  SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS k
  FROM (SELECT doc_id, term AS a,
               lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b
        FROM toks)
  WHERE b IS NOT NULL
  GROUP BY doc_id, a, b
),
corpus AS (
  SELECT a, b, CAST(sum(k) AS BIGINT) AS c_xy FROM doc_bi GROUP BY a, b
)
SELECT d.doc_id,
       CAST(sum(d.k) AS BIGINT) AS n_bi,
       CAST(sum(d.k * c.c_xy) AS BIGINT) AS sum_cxy,
       CAST(sum(CASE WHEN c.c_xy = d.k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel_types,
       round(ln(CAST(sum(d.k * c.c_xy) AS DOUBLE)
                / CAST(sum(d.k) AS DOUBLE)), 6) AS familiarity
FROM doc_bi d JOIN corpus c ON d.a = c.a AND d.b = c.b
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


# --- hashing-trick linear classifier inference --------------------------------

CLF_BUCKETS = 65536  # 2^16 feature buckets (the hashing trick)
CLF_W_RANGE = 2001  # pseudo-weights in [-1000, 1000]


def tx_hashclf(spark: SparkSession, sf: str) -> DataFrame:
    """Linear text-classifier INFERENCE via the hashing trick (Weinberger
    et al. 2009; the fastText-style quality/topic gate every curation
    pipeline runs at scale): hash each token into {CLF_BUCKETS} buckets,
    gather the bucket weight from a broadcast model table, sum per
    document, squash once. The model here is a deterministic pseudo-model
    (weight(b) = h60('w:'+b) mod {CLF_W_RANGE} − 1000 — no model files in
    this environment); the SHAPE is the production one: a real model swaps
    in as the same broadcast (bucket → weight) table.

    Determinism: scores accumulate as BIGINT weight sums (never floats);
    the sigmoid is ONE shared float expression over the integer score, and
    the accept label compares the INTEGER score against 0 so no float
    boundary decides it.

    100 TB shape: tokenize is a narrow map; the weight gather is a
    broadcast join (the model table is ~2^16 rows — megabytes — however
    big the corpus); one groupBy(doc_id) with map-side combine. Inference
    cost is linear in tokens with zero wide shuffles of the text."""
    from orc_spark.functions.hashing import h60

    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"),
    ).select(
        "doc_id", (h60(F.col("tok")) % CLF_BUCKETS).alias("bucket")
    )
    weights = spark.range(CLF_BUCKETS).select(
        F.col("id").alias("bucket"),
        (
            h60(F.concat(F.lit("w:"), F.col("id").cast("string")))
            % CLF_W_RANGE
            - 1000
        ).alias("w"),
    )
    scored = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w").cast("bigint").alias("score_fp"),
        )
    )
    z = "CAST(score_fp AS DOUBLE) / (CAST(1000 AS DOUBLE) * CAST(n_feats AS DOUBLE))"
    return scored.select(
        "doc_id",
        "n_feats",
        "score_fp",
        F.round(
            F.expr(f"CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-({z})))"),
            6,
        ).alias("prob"),
        F.when(F.col("score_fp") > 0, 1).otherwise(0).alias("accept"),
    ).orderBy("doc_id")


TX_HASHCLF_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         {h60_sql("tok")} % {CLF_BUCKETS} AS bucket
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
        FROM documents)
),
weights AS (
  SELECT b AS bucket,
         {h60_sql("'w:' || CAST(b AS VARCHAR)")} % {CLF_W_RANGE} - 1000 AS w
  FROM (SELECT unnest(range(0, {CLF_BUCKETS})) AS b)
),
scored AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum(w.w) AS BIGINT) AS score_fp
  FROM toks t JOIN weights w ON w.bucket = t.bucket
  GROUP BY t.doc_id
)
SELECT doc_id, n_feats, score_fp,
       round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)
         + exp(-(CAST(score_fp AS DOUBLE)
                 / (CAST(1000 AS DOUBLE) * CAST(n_feats AS DOUBLE))))), 6)
         AS prob,
       CASE WHEN score_fp > 0 THEN 1 ELSE 0 END AS accept
FROM scored
ORDER BY doc_id
"""


# --- Zipf corpus diagnostics --------------------------------------------------

ZIPF_SC1 = 1_000_000_000  # fixed-point scale for single-log sums
ZIPF_SC2 = 1_000_000  # scale for log-product sums (headroom at 1e8 vocab)

# The log-log OLS slope from the six integer sums, as ONE shared expression
# string — both engines parse the identical tree over identical BIGINTs, so
# the double is identical. x = ln(rank), y = ln(cf). A single-term
# vocabulary has x ≡ 0, making the OLS denominator exactly 0 (ANSI mode
# would throw): guarded to NULL identically on both engines.
_ZIPF_SLOPE_EXPR = (
    f"CASE WHEN n_terms <= 1 THEN NULL ELSE "
    f"(CAST(n_terms AS DOUBLE)"
    f" * (CAST(sxy_fp AS DOUBLE) / CAST({ZIPF_SC2} AS DOUBLE))"
    f" - (CAST(sx_fp AS DOUBLE) / CAST({ZIPF_SC1} AS DOUBLE))"
    f" * (CAST(sy_fp AS DOUBLE) / CAST({ZIPF_SC1} AS DOUBLE)))"
    f" / (CAST(n_terms AS DOUBLE)"
    f" * (CAST(sxx_fp AS DOUBLE) / CAST({ZIPF_SC2} AS DOUBLE))"
    f" - (CAST(sx_fp AS DOUBLE) / CAST({ZIPF_SC1} AS DOUBLE))"
    f" * (CAST(sx_fp AS DOUBLE) / CAST({ZIPF_SC1} AS DOUBLE)))"
    f" END"
)

_ZIPF_TERM_EXPRS = {
    "x_fp": f"CAST(floor(ln(CAST(rnk AS DOUBLE))"
    f" * CAST({ZIPF_SC1} AS DOUBLE)) AS BIGINT)",
    "y_fp": f"CAST(floor(ln(CAST(cf AS DOUBLE))"
    f" * CAST({ZIPF_SC1} AS DOUBLE)) AS BIGINT)",
    "xy_fp": f"CAST(floor(ln(CAST(rnk AS DOUBLE)) * ln(CAST(cf AS DOUBLE))"
    f" * CAST({ZIPF_SC2} AS DOUBLE)) AS BIGINT)",
    "xx_fp": f"CAST(floor(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE))"
    f" * CAST({ZIPF_SC2} AS DOUBLE)) AS BIGINT)",
}


def tx_zipf(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf-law corpus diagnostics: rank terms by corpus frequency and fit
    the log-log OLS slope (natural Zipf exponent ≈ −1), plus head-mass
    shares — the quick health check that a scraped corpus has a natural
    token distribution (a bot-generated or template-heavy crawl shows up
    immediately as a flattened head or truncated tail).

    Determinism: every per-term regression term floor-quantizes ONE
    correctly-rounded double expression (ln of an integer, or a product of
    two such lns) into BIGINT fixed point; only integer sums cross the
    aggregation, and the slope is one shared final expression
    (_ZIPF_SLOPE_EXPR) over those integers. Head shares are exact integer
    ratios.

    100 TB shape: corpus frequency is one groupBy(term) with map-side
    combine over the tf table; the rank assignment is a single sort of the
    VOCABULARY (≪ corpus — even web-scale vocab is ~1e8 rows, a few GB);
    production would two-phase the ranking (range-partitioned sort with
    sampled split points) exactly like Spark's own orderBy does."""
    cf = (
        _tf(spark, sf)
        .groupBy("term")
        .agg(F.sum("tf").cast("bigint").alias("cf"))
    )
    w = Window.orderBy(F.col("cf").desc(), F.col("term").asc())
    ranked = cf.withColumn("rnk", F.row_number().over(w).cast("bigint"))
    terms = ranked.select(
        "rnk",
        "cf",
        *[F.expr(e).alias(k) for k, e in _ZIPF_TERM_EXPRS.items()],
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("cf").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("rnk") == 1, F.col("cf")).otherwise(0))
        .cast("bigint")
        .alias("top1_tokens"),
        F.sum(F.when(F.col("rnk") <= 10, F.col("cf")).otherwise(0))
        .cast("bigint")
        .alias("head10_tokens"),
        F.sum("x_fp").cast("bigint").alias("sx_fp"),
        F.sum("y_fp").cast("bigint").alias("sy_fp"),
        F.sum("xy_fp").cast("bigint").alias("sxy_fp"),
        F.sum("xx_fp").cast("bigint").alias("sxx_fp"),
    )
    return agg.select(
        "n_terms",
        "total_tokens",
        F.round(
            F.col("top1_tokens").cast("double")
            / F.col("total_tokens").cast("double"),
            6,
        ).alias("top1_share"),
        F.round(
            F.col("head10_tokens").cast("double")
            / F.col("total_tokens").cast("double"),
            6,
        ).alias("head10_share"),
        F.round(F.expr(_ZIPF_SLOPE_EXPR), 6).alias("zipf_slope"),
    )


TX_ZIPF_SQL = f"""
WITH tf AS ({_TF_SQL}),
cf AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term
),
ranked AS (
  SELECT term, cf,
         CAST(row_number() OVER (ORDER BY cf DESC, term ASC) AS BIGINT)
           AS rnk
  FROM cf
),
terms AS (
  SELECT rnk, cf,
         {_ZIPF_TERM_EXPRS['x_fp']} AS x_fp,
         {_ZIPF_TERM_EXPRS['y_fp']} AS y_fp,
         {_ZIPF_TERM_EXPRS['xy_fp']} AS xy_fp,
         {_ZIPF_TERM_EXPRS['xx_fp']} AS xx_fp
  FROM ranked
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(cf) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN rnk = 1 THEN cf ELSE 0 END) AS BIGINT)
           AS top1_tokens,
         CAST(sum(CASE WHEN rnk <= 10 THEN cf ELSE 0 END) AS BIGINT)
           AS head10_tokens,
         CAST(sum(x_fp) AS BIGINT) AS sx_fp,
         CAST(sum(y_fp) AS BIGINT) AS sy_fp,
         CAST(sum(xy_fp) AS BIGINT) AS sxy_fp,
         CAST(sum(xx_fp) AS BIGINT) AS sxx_fp
  FROM terms
)
SELECT n_terms, total_tokens,
       round(CAST(top1_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6)
         AS top1_share,
       round(CAST(head10_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6)
         AS head10_share,
       round({_ZIPF_SLOPE_EXPR}, 6) AS zipf_slope
FROM agg
"""


QUERIES = [
    Query("tx_tfidf", tx_tfidf, TX_TFIDF_SQL, "TF-IDF weighting, top-5 terms per doc"),
    Query("tx_postings", tx_postings, TX_POSTINGS_SQL, "inverted-index posting-list digests"),
    Query("tx_collocations", tx_collocations, TX_COLLOC_SQL, "PMI bigram collocation mining, top-20"),
    Query("tx_bm25", tx_bm25, TX_BM25_SQL, "Okapi BM25 term weighting, top-5 terms per doc"),
    Query("tx_ngram_lm", tx_ngram_lm, TX_NGRAM_LM_SQL, "bigram LM familiarity scoring, integer aggregation + one final ln"),
    Query("tx_zipf", tx_zipf, TX_ZIPF_SQL, "Zipf-law corpus diagnostics: fixed-point log-log OLS slope + head shares"),
    Query("tx_hashclf", tx_hashclf, TX_HASHCLF_SQL, "hashing-trick linear classifier inference: broadcast weight table, integer scores"),
]
