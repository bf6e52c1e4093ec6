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
        F.size(F.expr(f"regexp_extract_all(text, '{EMAIL}', 0)")).alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(text, '{URL}', 0)")).alias("n_urls"),
        F.size(F.expr(f"regexp_extract_all(text, '{LONGNUM}', 0)")).alias("n_longnums"),
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


QUERIES = [
    Query("tx_redact", tx_redact, TX_REDACT_SQL, "PII-style redaction battery (emails/URLs/long numbers)"),
    Query("dd_keepbest", dd_keepbest, DD_KEEPBEST_SQL, "exact-dup keep-best resolution (longest, tie→min id)"),
    Query("sk_salted_agg", sk_salted_agg, SK_SALTED_SQL, "two-phase salted aggregate over a 3-value hot key"),
]
