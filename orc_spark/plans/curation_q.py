"""Corpus-curation pack: PII-style redaction, keep-best dedup resolution,
and the salted-aggregation skew path — each driver-checked against a DuckDB
oracle.

Scale notes:
- tx_redact is a pure per-row expression battery (regexp_extract_all /
  chained regexp_replace): shuffle-free, codegen'd, linear.
- dd_keepbest is one hash-partition window per duplicate group; group key
  is the content digest, so the shuffle is as skewed as the duplication
  itself — bounded because exact-dup groups are bounded.
- sk_salted_agg demonstrates the two-phase salted aggregate
  (operators/skew.py) the engine uses when a group key is pathologically
  hot (here l_returnflag: 3 distinct values over the whole fact table —
  the worst case for a naive one-phase shuffle). The oracle is the plain
  GROUP BY: identical results, different physical risk profile.

Regex patterns are restricted to syntax Java regex (Spark) and RE2 (DuckDB)
interpret identically; DuckDB regexp_replace needs the explicit 'g' flag to
match Spark's replace-all semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orc_spark.operators.skew import salted_count_agg
from orc_spark.functions.hashing import h60_sql
from orc_spark.plans import Query
from orc_spark.sources.tables import load_table

EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL = r"https?://[^ \t\n]+"
LONGNUM = r"[0-9]{6,}"


def tx_redact(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    t = F.col("text")
    red = F.regexp_replace(t, EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, URL, "<URL>")
    red = F.regexp_replace(red, LONGNUM, "<NUM>")
    return docs.select(
        "doc_id",
        # DSL regexp_extract_all, NOT F.expr(f"... '{pat}' ..."): embedding
        # the pattern in a SQL string literal re-processes backslash
        # escapes, so EMAIL's \. reached the regex engine as `.` (any char)
        # and "a@b plain" counted as an email — diverging from both the
        # redaction pass below (DSL, correct pattern) and the DuckDB oracle
        # (SQL literals don't process backslashes). Found by the r11
        # tx_redact brute-force replay; latent on testdata only because no
        # text there has the x@y<space>word shape.
        F.size(F.regexp_extract_all(t, F.lit(EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(URL), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all(t, F.lit(LONGNUM), 0)).alias("n_longnums"),
        F.length(red).cast("bigint").alias("redacted_len"),
        F.md5(red).alias("redacted_digest"),
    )


TX_REDACT_SQL = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL}')) AS INTEGER)   AS n_emails,
       CAST(len(regexp_extract_all(text, '{URL}')) AS INTEGER)     AS n_urls,
       CAST(len(regexp_extract_all(text, '{LONGNUM}')) AS INTEGER) AS n_longnums,
       length(redacted)                                            AS redacted_len,
       md5(redacted)                                               AS redacted_digest
FROM (
  SELECT doc_id, text,
         regexp_replace(regexp_replace(regexp_replace(text,
             '{EMAIL}', '<EMAIL>', 'g'),
             '{URL}', '<URL>', 'g'),
             '{LONGNUM}', '<NUM>', 'g') AS redacted
  FROM documents
)
"""


def dd_keepbest(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-dup resolution with a keep policy: per content digest keep the
    LONGEST doc (ties → smallest doc_id). The kept doc plus how many copies
    it displaced — the actionable output of a dedup pass."""
    docs = load_table(spark, sf, "documents").select(
        F.md5(F.col("text")).alias("digest"), "doc_id", "n_chars"
    )
    w = Window.partitionBy("digest").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select(
            "digest",
            "doc_id",
            "n_chars",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("digest")).alias("n_copies"),
        )
        .where(F.col("rn") == 1)
        .select("digest", F.col("doc_id").alias("kept_doc_id"), "n_copies")
    )


DD_KEEPBEST_SQL = """
SELECT digest, doc_id AS kept_doc_id, n_copies
FROM (
  SELECT md5(text) AS digest, doc_id, n_chars,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY n_chars DESC, doc_id ASC) AS rn,
         count(*)   OVER (PARTITION BY md5(text))              AS n_copies
  FROM documents
)
WHERE rn = 1
"""


def sk_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return salted_count_agg(
        li,
        ["l_returnflag"],
        {
            "n_rows": "count(*)",
            "sum_qty": "sum(l_quantity)",
            "min_price": "min(l_extendedprice)",
            "max_price": "max(l_extendedprice)",
        },
    )


SK_SALTED_SQL = """
SELECT l_returnflag,
       count(*)             AS n_rows,
       sum(l_quantity)      AS sum_qty,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


# --- end-to-end corpus curation pipeline ------------------------------------

CU_QUALITY_MIN = 0.45
CU_JACCARD_MIN = 0.5


def cu_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The flagship training-corpus curation pass, end to end: quality gate →
    exact-dup keep-best → MinHash-LSH near-dup drop → per-(source, lang,
    stage) audit table. This is the composition a 100 TB pretraining-data
    pipeline actually runs; each stage reuses the already-verified operator
    (tx_quality score, dd_keepbest policy, dd_minhash_pairs candidates), and
    the audit output accounts for every document exactly once.

    Stage policy (all deterministic, order matters):
      1. low_quality : quality_score < CU_QUALITY_MIN
      2. exact_dup   : among quality survivors, not the keep-best doc of its
                       content digest (longest text, tie → smallest doc_id)
      3. near_dup    : among exact-dedup survivors, the LARGER doc_id of any
                       LSH candidate pair with est_jaccard ≥ CU_JACCARD_MIN
                       whose BOTH ends survived stage 2
      4. kept        : everything else — the corpus that ships

    Scale: the only non-narrow stages are the digest window (bounded by
    duplication), the LSH band join (linear in candidates), and the final
    group-by — same contracts as the underlying operators."""
    from orc_spark.plans.dedup_q import dd_minhash_pairs
    from orc_spark.plans.text_q import tx_quality

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    quality = tx_quality(spark, sf).select("doc_id", "quality_score")
    base = docs.join(quality, "doc_id").withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    )
    # ONE digest window over ALL docs, ordered quality-passed first: for a
    # passed doc every in-partition predecessor is also passed (in the same
    # n_chars/doc_id order as before), so rn equals the old rank-among-
    # passed; failed docs never reach the rn test because the status CASE
    # checks low_quality first. This folds the old passed_q → ranked →
    # join-back-to-base shape into a single chain (the doc-level frame is
    # computed twice — status + keepers — instead of four times).
    passed = (F.col("quality_score") >= CU_QUALITY_MIN).cast("int")
    w = Window.partitionBy("digest").orderBy(
        passed.desc(), F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = base.withColumn("digest", F.md5(F.col("text"))).withColumn(
        "rn", F.row_number().over(w)
    )
    # keepers has exactly ONE consumer (r16): the old shape probed it with
    # two semi-joins (doc_a end, doc_b end), which needed a localCheckpoint
    # to stop each probe re-running the docs+quality+digest-window chain —
    # and that checkpoint compiled the full physical plan at build time
    # (~0.5 s of the query's 1.0 s driver build, profiled). Exploding each
    # candidate pair into its two ends and inner-joining keepers ONCE
    # (keepers' doc_ids are unique, so no fan-out), then requiring both
    # ends present (n_ends == 2, pairs are strict doc_a < doc_b), is the
    # same predicate with a single keepers evaluation at ANY scale — no
    # checkpoint, one keepers shuffle instead of two. Rows verified
    # identical; build 1.04 -> 0.49 s, total 2.06 -> 1.65 s isolated.
    keepers = ranked.where(
        (F.col("quality_score") >= CU_QUALITY_MIN) & (F.col("rn") == 1)
    ).select("doc_id")
    near_pairs = (
        dd_minhash_pairs(spark, sf)
        .where(F.col("est_jaccard") >= CU_JACCARD_MIN)
        .select("doc_a", "doc_b")
    )
    # drop doc_b only when BOTH ends survived exact dedup
    ends = near_pairs.select(
        "doc_a", "doc_b", F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    )
    near_drops = (
        ends.join(keepers, "doc_id")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_ends"))
        .where(F.col("n_ends") == 2)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    status = (
        ranked.join(near_drops.withColumn("nd", F.lit(1)), "doc_id", "left")
        .select(
            "source",
            "lang",
            "n_chars",
            "n_tokens",
            F.when(F.col("quality_score") < CU_QUALITY_MIN, "low_quality")
            .when(F.col("rn") > 1, "exact_dup")
            .when(F.col("nd") == 1, "near_dup")
            .otherwise("kept")
            .alias("status"),
        )
    )
    return status.groupBy("source", "lang", "status").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


def _cu_pipeline_sql() -> str:
    from orc_spark.plans.dedup_q import _minhash_pairs_sql
    from orc_spark.plans.text_q import TX_QUALITY_SQL

    return f"""
WITH quality AS ({TX_QUALITY_SQL}),
base AS (
  SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars,
         CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT)
           AS n_tokens,
         q.quality_score
  FROM documents d JOIN quality q ON q.doc_id = d.doc_id
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM base WHERE quality_score >= {CU_QUALITY_MIN}
),
keepers AS (SELECT doc_id FROM ranked WHERE rn = 1),
near_pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_pairs_sql()})
  WHERE est_jaccard >= {CU_JACCARD_MIN}
),
near_drops AS (
  SELECT DISTINCT p.doc_b AS doc_id
  FROM near_pairs p
  JOIN keepers ka ON ka.doc_id = p.doc_a
  JOIN keepers kb ON kb.doc_id = p.doc_b
),
status AS (
  SELECT b.source, b.lang, b.n_chars, b.n_tokens,
         CASE WHEN b.quality_score < {CU_QUALITY_MIN} THEN 'low_quality'
              WHEN r.rn > 1 THEN 'exact_dup'
              WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
              ELSE 'kept' END AS status
  FROM base b
  LEFT JOIN ranked r ON r.doc_id = b.doc_id
  LEFT JOIN near_drops nd ON nd.doc_id = b.doc_id
)
SELECT source, lang, status,
       count(*)                      AS n_docs,
       -- CAST: DuckDB sum(BIGINT) yields HUGEINT → pandas float64 decay
       CAST(sum(n_chars) AS BIGINT)  AS sum_chars,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM status GROUP BY source, lang, status
"""


# --- token-budget corpus sampler --------------------------------------------

CU_TOKEN_BUDGET = 3000  # per-language token budget (quality-ranked greedy fill)


def cu_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget sampling: per language, rank docs by quality (tie →
    doc_id) and keep the best until the cumulative token count crosses the
    budget — the standard 'fill the data mix' selection step after curation.
    One window cumsum per language partition; deterministic and
    hash-checked. At 100 TB the partition key is (lang) — scale by salting
    the window into per-lang shards and merging shard prefix sums if one
    language dominates the corpus."""
    from orc_spark.plans.text_q import tx_quality

    docs = load_table(spark, sf, "documents").select("doc_id", "text", "lang")
    quality = tx_quality(spark, sf).select("doc_id", "quality_score")
    base = docs.join(quality, "doc_id").select(
        "doc_id",
        "lang",
        "quality_score",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias(
            "n_tokens"
        ),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("quality_score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    kept = cum.where(F.col("cum_tokens") <= CU_TOKEN_BUDGET)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("cum_tokens").alias("tokens_kept"),
        F.round(F.min("quality_score"), 6).alias("min_quality_kept"),
    )


def _cu_budget_sql() -> str:
    from orc_spark.plans.text_q import TX_QUALITY_SQL

    return f"""
WITH quality AS ({TX_QUALITY_SQL}),
base AS (
  SELECT d.doc_id, d.lang, q.quality_score,
         CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents d JOIN quality q ON q.doc_id = d.doc_id
),
cum AS (
  SELECT lang, quality_score, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang
                             ORDER BY quality_score DESC, doc_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM base
)
SELECT lang,
       count(*)                            AS n_kept,
       CAST(max(cum_tokens) AS BIGINT)     AS tokens_kept,
       round(min(quality_score), 6)        AS min_quality_kept
FROM cum WHERE cum_tokens <= {CU_TOKEN_BUDGET}
GROUP BY lang
"""


# --- sequence packing (concat-and-chunk into context-length bins) -----------

CU_SEQ_LEN = 2048  # target context length in tokens


def cu_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing: concatenate the corpus per language in a
    deterministic order (md5-hash rank, the same shuffle-proof order the
    samplers use) and chunk the token stream into CU_SEQ_LEN bins — the
    concat-and-chunk packing step that turns a curated corpus into training
    sequences. A doc belongs to the bin containing its START offset; the
    output is the per-(lang, bin) audit: docs packed, tokens, fill fraction
    (only the last bin of a language may be short).

    Scale: one window cumsum per language partition — identical contract to
    cu_budget (salt into per-lang shards and merge shard prefix sums if one
    language dominates); output is bounded by total_tokens / CU_SEQ_LEN."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text", "lang")
    base = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias(
            "n_tokens"
        ),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = base.select(
        "lang",
        "n_tokens",
        (
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / CU_SEQ_LEN
        ).cast("bigint").alias("bin_id"),
    )
    return (
        placed.groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .select(
            "lang",
            "bin_id",
            "n_docs",
            "tokens",
            F.round(
                F.least(F.col("tokens").cast("double") / CU_SEQ_LEN, F.lit(1.0)),
                6,
            ).alias("fill_frac"),
        )
    )


CU_PACK_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
placed AS (
  SELECT lang, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / CAST({CU_SEQ_LEN} AS DOUBLE)) AS BIGINT)
           AS bin_id
  FROM base
)
SELECT lang, bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       round(least(CAST(sum(n_tokens) AS DOUBLE) / {CU_SEQ_LEN}, 1.0), 6)
         AS fill_frac
FROM placed
GROUP BY lang, bin_id
"""


# --- benchmark decontamination ----------------------------------------------

# 20-gram winnowing (window 8): the n-gram length real pretraining pipelines
# use for eval-set overlap removal (13-20 chars/tokens) — long enough that
# shared fingerprints mean real reuse, not common short substrings
DECON_K = 20
DECON_W = 8
DECON_EVAL_MOD = 13  # doc_id % 13 == 0 plays the held-out benchmark set


def cu_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing winnowing
    fingerprints with a held-out eval set (the test-set-overlap removal
    step of a pretraining pipeline; any shared substring of length
    >= W + K - 1 = 27 chars guarantees a shared fingerprint — MOSS bound).
    Output: one audit row per contaminated doc with the shared-fingerprint
    count and contamination fraction.

    Scale: the corpus splits into train/eval BEFORE fingerprinting (in
    production the eval suite is a separate small input), so each doc is
    fingerprinted exactly once — one explode + one constant-width window
    min + one dedup per side, linear; the eval side is small by
    construction, so the overlap test is a BROADCAST join on fp; output
    is bounded by the contaminated-doc count."""
    from orc_spark.functions.hashing import h60

    def winnow_fps(docs: DataFrame) -> DataFrame:
        # cores-not-bytes (SCALING.md): repartition BEFORE the explode so the
        # downstream window+dedup stage keeps real parallelism — without it
        # AQE coalesces the few-MB shuffle and one task sorts/dedups every
        # fingerprint (measured 5.3 s → 0.74 s at sf0.1). KEYED by doc_id
        # (r15): hashpartitioning(doc_id) satisfies every downstream
        # requirement — the window min, the (doc_id, fp) dedup, the n_fp
        # window and the final groupBy(doc_id) — so the exploded gram
        # stream (the fat one: ~28 B/position) never shuffles; round-robin
        # forced a second full-stream exchange right after the explode.
        docs = docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
        )
        # BYTE-domain k-grams (operators/gramscan.py, r15): positional
        # STRING substring is O(doc_len) per call — a giant doc made this
        # scan an O(doc_len²) single-task straggler
        from orc_spark.operators.gramscan import byte_pos_stream, gram

        grams = byte_pos_stream(docs, DECON_K).select(
            "doc_id",
            "n_pos",
            "pos",
            h60(gram(DECON_K)).alias("h"),
        )
        w = (
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.currentRow, DECON_W - 1)
        )
        return (
            grams.select(
                "doc_id", "pos", "n_pos", F.min("h").over(w).alias("fp")
            )
            .where(F.col("pos") <= F.col("n_pos") - (DECON_W - 1))
            .select("doc_id", "fp")
            .distinct()
        )

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    ev_fps = (
        winnow_fps(docs.where(F.col("doc_id") % DECON_EVAL_MOD == 0))
        .select("fp")
        .distinct()
    )
    train = winnow_fps(
        docs.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
    ).withColumn("n_fp", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    return (
        train.join(F.broadcast(ev_fps), "fp")
        .groupBy("doc_id")
        .agg(
            F.first("n_fp").alias("n_fp"),
            F.count(F.lit(1)).alias("n_shared_fp"),
        )
        .select(
            "doc_id",
            "n_fp",
            "n_shared_fp",
            F.round(
                F.col("n_shared_fp").cast("double") / F.col("n_fp"), 6
            ).alias("contam_frac"),
        )
    )


def _cu_decon_sql() -> str:
    from orc_spark.functions.hashing import h60_sql

    k, w, m = DECON_K, DECON_W, DECON_EVAL_MOD
    return f"""
WITH grams AS (
  SELECT doc_id, pos,
         greatest(length(text) - {k - 1}, 1) AS n_pos,
         {h60_sql(f'lower(substr(text, pos, {k}))')} AS h
  FROM (SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - {k - 1}, 1) + 1)) AS pos
        FROM documents)
),
wins AS (
  SELECT doc_id, pos, n_pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
  FROM grams
),
fps AS (SELECT DISTINCT doc_id, fp FROM wins WHERE pos <= n_pos - {w - 1}),
ev AS (SELECT DISTINCT fp FROM fps WHERE doc_id % {m} = 0),
train AS (
  SELECT doc_id, fp,
         count(*) OVER (PARTITION BY doc_id) AS n_fp
  FROM fps WHERE doc_id % {m} <> 0
)
SELECT t.doc_id,
       CAST(min(t.n_fp) AS BIGINT) AS n_fp,
       CAST(count(*) AS BIGINT) AS n_shared_fp,
       round(CAST(count(*) AS DOUBLE) / min(t.n_fp), 6) AS contam_frac
FROM train t JOIN ev ON t.fp = ev.fp
GROUP BY t.doc_id
"""


# --- domain-mixture sampling -------------------------------------------------

# target language mix for the training corpus (the "data mixing" step of a
# pretraining pipeline: downsample over-represented strata so the kept corpus
# matches the target distribution)
CU_MIX = {"en": 0.4, "zh": 0.2, "de": 0.15, "es": 0.15, "fr": 0.1}


def cu_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Mixture sampling: find the largest corpus size k such that every
    language can supply its target share (k = min over langs of n_l/p_l),
    keep floor(k·p_l) docs per language, selected deterministically by
    md5-hash rank (same docs on every engine/run/partitioning — the same
    contract as dp_sample). Output: per-language audit of the achieved mix.

    Scale: ONE scan of documents — the per-language count rides the same
    lang-partitioned exchange as the hash rank (two window functions, one
    shuffle), the 5-row weight table broadcasts, and the global k is a
    single-partition window over the already-filter-reduced rows (salt
    per-lang shards if one language dominates). No driver-side scalars."""
    weights = spark.createDataFrame(
        list(CU_MIX.items()), "lang string, w double"
    )
    docs = load_table(spark, sf, "documents").select("doc_id", "lang")
    w_lang = Window.partitionBy("lang")
    w_rank = w_lang.orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = (
        docs.join(F.broadcast(weights), "lang")
        .select(
            "lang",
            "w",
            F.row_number().over(w_rank).alias("rnk"),
            F.count(F.lit(1)).over(w_lang).alias("n"),
        )
    )
    total = Window.partitionBy()
    kept = (
        ranked.withColumn(
            "k", F.min(F.col("n").cast("double") / F.col("w")).over(total)
        )
        .where(F.col("rnk") <= F.floor(F.col("k") * F.col("w")).cast("bigint"))
    )
    per_lang = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.first("n").alias("n"),
        F.first("w").alias("w"),
    )
    return per_lang.select(
        "lang",
        F.col("n").alias("n_total"),
        "n_kept",
        F.round(F.col("w"), 6).alias("target_share"),
        F.round(
            F.col("n_kept").cast("double")
            / F.sum("n_kept").over(total).cast("double"),
            6,
        ).alias("achieved_share"),
    )


def _cu_mixture_sql() -> str:
    vals = ", ".join(f"('{k}', {v})" for k, v in CU_MIX.items())
    return f"""
WITH weights(lang, w) AS (VALUES {vals}),
counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
scale AS (
  SELECT min(CAST(n AS DOUBLE) / w) AS k
  FROM counts JOIN weights USING (lang)
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rnk
  FROM documents
),
kept AS (
  SELECT r.lang, count(*) AS n_kept
  FROM ranked r JOIN weights USING (lang) CROSS JOIN scale
  WHERE r.rnk <= CAST(floor(scale.k * weights.w) AS BIGINT)
  GROUP BY r.lang
)
SELECT lang,
       counts.n                         AS n_total,
       kept.n_kept                      AS n_kept,
       round(weights.w, 6)              AS target_share,
       round(CAST(kept.n_kept AS DOUBLE)
             / sum(kept.n_kept) OVER (), 6) AS achieved_share
FROM kept JOIN counts USING (lang) JOIN weights USING (lang)
"""



# --- deterministic train/val/test split --------------------------------------

SPLIT_VAL_PCT = 5
SPLIT_TEST_PCT = 5


def cu_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test assignment: each document lands in a
    split by its content-independent hash bucket (doc_id md5 → 0..99;
    90/5/5) — reproducible across runs, engines, and cluster sizes, the
    property a training pipeline needs so no example ever migrates between
    splits. Output is the per (lang, split) audit: counts, token mass, and
    membership digest. One narrow map + one combinable groupBy."""
    docs = load_table(spark, sf, "documents")
    from orc_spark.functions.hashing import h60, xor_digest

    bucket = F.pmod(h60(F.col("doc_id").cast("string")), F.lit(100))
    split = (
        F.when(bucket < SPLIT_TEST_PCT, "test")
        .when(bucket < SPLIT_TEST_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("train")
    )
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.select(
            "lang",
            split.alias("split"),
            "doc_id",
            toks.alias("n_tok"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            xor_digest("doc_id").alias("members_digest"),
        )
    )


CU_SPLIT_SQL = f"""
WITH tagged AS (
  SELECT lang, doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tok,
         ({h60_sql("CAST(doc_id AS VARCHAR)")}) % 100 AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < {SPLIT_TEST_PCT} THEN 'test'
            WHEN bucket < {SPLIT_TEST_PCT + SPLIT_VAL_PCT} THEN 'val'
            ELSE 'train' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc,
       CAST(bit_xor({h60_sql("CAST(doc_id AS VARCHAR)")}) AS BIGINT)
         AS members_digest
FROM tagged
GROUP BY 1, 2
"""

# --- epoch upsampling (repetition factors for data mixing) -------------------

# per-language repetition factors in 1/1000ths: rare/high-value languages
# repeat ~2.2-2.5x per epoch, the dominant language stays at 1x — the
# upsampling half of mixture control (cu_mixture is the downsampling half)
CU_REP_FACTORS = {"de": 2500, "fr": 2200, "es": 1800, "zh": 1500}
CU_REP_DEFAULT = 1000


def cu_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic epoch upsampling: each document is repeated
    floor(f/1000) times, plus one extra copy iff h60(doc) mod 1000 falls
    under the fractional part — so realized per-language repetition
    converges to f/1000 with zero randomness. Emits the per-language
    audit: docs in/out, realized factor, and an order-independent xor
    digest over every (doc, copy_idx) emitted — the driver hash therefore
    checks the exact multiset of copies, not just counts.

    100 TB shape: one scan, a per-row sequence-explode bounded by
    max(f)/1000 copies, one combinable groupBy(lang). The factor map is a
    broadcast literal CASE."""
    from orc_spark.functions.hashing import h60

    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    factor = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(f))
            for lang, f in sorted(CU_REP_FACTORS.items())
        ],
        F.lit(CU_REP_DEFAULT),
    )
    h = h60(F.concat(F.lit("rep:"), F.col("doc_id").cast("string")))
    n_copies = (factor / 1000).cast("bigint") + F.when(
        (h % 1000) < (factor % 1000), 1
    ).otherwise(0)
    copies = docs.select(
        "doc_id", "lang", "n_chars", n_copies.alias("n_copies")
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        F.explode(F.expr("sequence(1, n_copies)")).alias("copy_idx"),
    )
    return (
        copies.groupBy("lang")
        .agg(
            F.count_distinct("doc_id").alias("docs_in"),
            F.count(F.lit(1)).alias("docs_out"),
            F.sum("n_chars").alias("chars_out"),
            F.bit_xor(
                h60(
                    F.concat_ws(
                        ":", F.col("doc_id").cast("string"), F.col("copy_idx").cast("string")
                    )
                )
            ).alias("copies_digest"),
        )
        .select(
            "lang",
            "docs_in",
            "docs_out",
            "chars_out",
            F.round(
                F.col("docs_out").cast("double") / F.col("docs_in").cast("double"),
                6,
            ).alias("realized_factor"),
            "copies_digest",
        )
        .coalesce(1)
        .sortWithinPartitions("lang")
    )


def _cu_repetition_sql() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {f}" for lang, f in sorted(CU_REP_FACTORS.items())
    )
    h = h60_sql("'rep:' || doc_id")
    hx = h60_sql("doc_id || ':' || copy_idx")
    return f"""
WITH base AS (
  SELECT doc_id, lang, n_chars,
         CASE lang {cases} ELSE {CU_REP_DEFAULT} END AS f,
         {h} AS h
  FROM documents
),
copies AS (
  SELECT doc_id, lang, n_chars,
         unnest(generate_series(1,
            f // 1000 + CASE WHEN h % 1000 < f % 1000 THEN 1 ELSE 0 END))
           AS copy_idx
  FROM base
)
SELECT lang,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_in,
       CAST(count(*) AS BIGINT) AS docs_out,
       CAST(sum(n_chars) AS BIGINT) AS chars_out,
       round(CAST(count(*) AS DOUBLE) / CAST(count(DISTINCT doc_id) AS DOUBLE),
             6) AS realized_factor,
       CAST(bit_xor({hx}) AS BIGINT) AS copies_digest
FROM copies
GROUP BY lang
ORDER BY lang
"""


# --- annealed mixture weights -------------------------------------------------

ANNEAL_SCALE = 1_000_000


def cu_anneal_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-annealed sampling weights: the multilingual-corpus recipe
    (XLM/mBERT, public) that re-weights languages by n^alpha to keep
    low-resource languages visible; alpha = 0.5 so the power is sqrt —
    IEEE-exact correctly-rounded on BOTH engines, unlike pow(). Per
    language: empirical share, sqrt-annealed share, and the implied
    up/down-sampling factor.

    Determinism: sqrt(n) per language is a single exact-rounded double →
    quantized to fixed-point BIGINT before the cross-language SUM (5-double
    accumulation order would already be engine-dependent — CLAUDE.md);
    every share is one division of exact integers.

    Scale: one count per language (map-side combinable) — the annealing
    algebra runs on |langs| rows."""
    docs = load_table(spark, sf, "documents").select("lang")
    per = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    s = float(ANNEAL_SCALE)
    per = per.withColumn(
        "sq_fp",
        F.floor(F.sqrt(F.col("n").cast("double")) * s + F.lit(0.5)).cast("bigint"),
    )
    tot = Window.partitionBy()
    return (
        per.withColumn("n_tot", F.sum("n").over(tot))
        .withColumn("sq_tot", F.sum("sq_fp").over(tot))
        .select(
            "lang",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("n_tot").cast("double"), 6
            ).alias("natural_share"),
            F.round(
                F.col("sq_fp").cast("double") / F.col("sq_tot").cast("double"), 6
            ).alias("annealed_share"),
            F.round(
                (F.col("sq_fp").cast("double") / F.col("sq_tot").cast("double"))
                / (F.col("n").cast("double") / F.col("n_tot").cast("double")),
                6,
            ).alias("upsample_factor"),
        )
        .coalesce(1)
        .sortWithinPartitions("lang")
    )


# --- document chunking ----------------------------------------------------------

CHUNK_LEN = 200  # characters per chunk
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


def cu_chunk(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window document chunking — the embedding/pretraining prep
    step (RAG context windows, packed-sequence inputs): fixed {CHUNK_LEN}-
    char chunks every {CHUNK_STRIDE} chars (overlap keeps boundary context),
    one row per chunk with its span, whitespace-token estimate and content
    digest (the digest feeds chunk-level dedup downstream).

    Pure narrow map (sequence → explode → substring), whole-stage codegen,
    no shuffle — the canonical linear pass at any corpus size. NULL texts
    are filtered explicitly on BOTH engines (the previous claim that they
    fall out of explode/unnest was wrong — greatest(length(NULL), 1) = 1
    on both engines, so a NULL doc emitted one phantom chunk row; review
    finding)."""
    from orc_spark.functions.hashing import h60
    from orc_spark.operators.gramscan import once_per_row

    docs = (
        load_table(spark, sf, "documents")
        .select("doc_id", "text")
        .where(F.col("text").isNotNull())
    )
    # BYTE-domain chunk extraction (gramscan.py contract, r15): positional
    # STRING substring walks codepoints from byte 0 — O(doc_len) per chunk
    # made one giant doc quadratic; binary slices are O(chunk). The barrier
    # keeps the cast from collapsing into the per-chunk loop.
    prep = docs.select(
        "doc_id", once_per_row(F.col("text").cast("binary")).alias("tb")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("tb"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    chunks = prep.select(
        "doc_id", "tb", F.posexplode(starts).alias("chunk_idx", "start")
    )
    chunk = F.expr(f"cast(substring(tb, start, {CHUNK_LEN}) as string)")
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "start",
        F.length(chunk).alias("chunk_chars"),
        F.size(F.split(F.trim(chunk), r"\s+")).cast("bigint").alias("est_tokens"),
        h60(chunk).alias("chunk_digest"),
    ).orderBy("doc_id", "chunk_idx")


CU_CHUNK_SQL = rf"""
WITH starts AS (
  SELECT doc_id, text,
         unnest(range(1, greatest(length(text), 1) + 1, {CHUNK_STRIDE})) AS start,
         unnest(generate_series(0,
           (greatest(length(text), 1) - 1) // {CHUNK_STRIDE})) AS chunk_idx
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(start AS INTEGER) AS start,
       CAST(length(substr(text, start, {CHUNK_LEN})) AS INTEGER) AS chunk_chars,
       CAST(len(string_split_regex(trim(substr(text, start, {CHUNK_LEN})), '\s+'))
            AS BIGINT) AS est_tokens,
       {h60_sql(f'substr(text, start, {CHUNK_LEN})')} AS chunk_digest
FROM starts
ORDER BY doc_id, chunk_idx
"""


# --- corpus curation report ---------------------------------------------------

REPORT_NEAR_DUP_EST = 0.5  # MinHash-estimate threshold counted as near-dup


def cu_corpus_report(spark: SparkSession, sf: str) -> DataFrame:
    """The ONE-ROW corpus health report a curation pipeline publishes per
    intake snapshot: document count, null-text count, exact-duplicate rows
    (beyond the first copy of each digest), MinHash near-dup pairs above
    the action threshold, Gopher-rule rejects, and total whitespace
    tokens. Composes the engine's own dedup/quality queries — the numbers
    are the SAME ones those queries hash-check in detail.

    Scale: every component is a bounded aggregate (digest groupBy, banded
    LSH pairs, narrow column expressions); the report is a cross-join of
    1-row frames. The Gopher verdict is a pure column expression
    (text_q.gopher_signals), so its fail count rides the SAME documents
    scan as the base stats — the report runs exactly two pipelines: one
    documents scan-aggregate and the LSH pairs aggregate."""
    from orc_spark.plans.dedup_q import dd_minhash_pairs
    from orc_spark.plans.text_q import gopher_signals

    docs = load_table(spark, sf, "documents")
    # (keep = FALSE) null-propagates for NULL text, and sum() skips nulls —
    # identical to tx_gopher_quality's where(keep == False) row count
    gopher_fail = (gopher_signals()["keep"] == F.lit(False)).cast("int")
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("text").isNull().cast("int")).cast("bigint").alias("n_null_text"),
        F.count_distinct(F.md5("text")).alias("n_digests"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("bigint")
        .alias("total_tokens"),
        F.sum(gopher_fail).cast("bigint").alias("n_gopher_fail"),
    )
    near = (
        dd_minhash_pairs(spark, sf)
        .where(F.col("est_jaccard") >= REPORT_NEAR_DUP_EST)
        .agg(F.count(F.lit(1)).alias("n_near_dup_pairs"))
    )
    return base.crossJoin(near).select(
        "n_docs",
        "n_null_text",
        (F.col("n_docs") - F.col("n_null_text") - F.col("n_digests"))
        .cast("bigint")
        .alias("n_exact_dup_docs"),
        "n_near_dup_pairs",
        "n_gopher_fail",
        "total_tokens",
    )


def _corpus_report_sql() -> str:
    from orc_spark.plans.dedup_q import _minhash_pairs_sql
    from orc_spark.plans.text_q import TX_GOPHER_QUALITY_SQL

    return rf"""
WITH pairs AS ({_minhash_pairs_sql()}),
gq AS ({TX_GOPHER_QUALITY_SQL}),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(text IS NULL AS INTEGER)) AS BIGINT) AS n_null_text,
         CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_digests,
         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
           AS total_tokens
  FROM documents
),
near AS (
  SELECT CAST(count(*) AS BIGINT) AS n_near_dup_pairs
  FROM pairs WHERE est_jaccard >= {REPORT_NEAR_DUP_EST}
),
gfail AS (
  SELECT CAST(count(*) AS BIGINT) AS n_gopher_fail
  FROM gq WHERE keep = FALSE
)
SELECT n_docs, n_null_text,
       CAST(n_docs - n_null_text - n_digests AS BIGINT) AS n_exact_dup_docs,
       n_near_dup_pairs, n_gopher_fail, total_tokens
FROM base, near, gfail
"""


CU_ANNEAL_SQL = f"""
WITH per AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * {float(ANNEAL_SCALE)!r} + 0.5)
              AS BIGINT) AS sq_fp
  FROM documents GROUP BY lang
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_tot, CAST(sum(sq_fp) AS BIGINT) AS sq_tot
  FROM per
)
SELECT lang, n,
       round(CAST(n AS DOUBLE) / CAST(n_tot AS DOUBLE), 6) AS natural_share,
       round(CAST(sq_fp AS DOUBLE) / CAST(sq_tot AS DOUBLE), 6) AS annealed_share,
       round((CAST(sq_fp AS DOUBLE) / CAST(sq_tot AS DOUBLE))
             / (CAST(n AS DOUBLE) / CAST(n_tot AS DOUBLE)), 6) AS upsample_factor
FROM per, tot
ORDER BY lang
"""


QUERIES = [
    Query("tx_redact", tx_redact, TX_REDACT_SQL, "PII-style redaction battery (emails/URLs/long numbers)"),
    Query("dd_keepbest", dd_keepbest, DD_KEEPBEST_SQL, "exact-dup keep-best resolution (longest, tie→min id)"),
    Query("sk_salted_agg", sk_salted_agg, SK_SALTED_SQL, "two-phase salted aggregate over a 3-value hot key"),
    Query("cu_pipeline", cu_pipeline, _cu_pipeline_sql(), "e2e curation: quality gate → exact keep-best → LSH near-dup drop → audit"),
    Query("cu_budget", cu_budget, _cu_budget_sql(), "per-language token-budget sampling (quality-ranked greedy fill)"),
    Query("cu_mixture", cu_mixture, _cu_mixture_sql(), "domain-mixture sampling to a target language distribution"),
    Query("cu_anneal_mixture", cu_anneal_mixture, CU_ANNEAL_SQL, "sqrt-annealed (alpha=0.5) language sampling weights, fixed-point shares"),
    Query("cu_corpus_report", cu_corpus_report, _corpus_report_sql(), "one-row corpus health report: dups, near-dups, quality rejects, tokens"),
    Query("cu_chunk", cu_chunk, CU_CHUNK_SQL, "sliding-window document chunking with overlap, token estimates + chunk digests"),
    Query("cu_decontaminate", cu_decontaminate, _cu_decon_sql(), "benchmark decontamination: 20-gram winnowing overlap vs a held-out eval split"),
    Query("cu_pack", cu_pack, CU_PACK_SQL, "sequence packing: concat-and-chunk the corpus into context-length bins"),
    Query("cu_split", cu_split, CU_SPLIT_SQL, "deterministic hash-bucket train/val/test split audit"),
    Query("cu_repetition", cu_repetition, _cu_repetition_sql(), "deterministic epoch upsampling with fractional repetition factors"),
]
