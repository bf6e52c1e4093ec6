"""Data-quality expectation checks — the constraint-audit pass a pipeline
runs before trusting an intake batch (uniqueness, referential integrity,
ranges, derived-column consistency). One row per check: (check_name,
n_checked, n_failed, passed).

Scale notes: each TABLE is scanned exactly once — multiple checks on the
same table ride one multi-aggregate row exploded into audit rows
(uniqueness via count vs count distinct, range/null checks as map-side
conditional sums), and FK integrity folds the orphan count and the total
into a single broadcast outer-join aggregate. The output is one row per
CHECK, so the audit table is O(checks) at any data volume. At 100 TB run
checks per partition-batch and union the audit rows — same shapes,
incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orc_spark.plans import Query
from orc_spark.sources.tables import load_table


def _check(name: str, n_checked, n_failed) -> list:
    return [
        F.lit(name).alias("check_name"),
        n_checked.cast("bigint").alias("n_checked"),
        n_failed.cast("bigint").alias("n_failed"),
        (n_failed.cast("bigint") == 0).alias("passed"),
    ]


def dq_expectations(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    docs = load_table(spark, sf, "documents")

    # uniqueness: count vs distinct count on the key
    c_unique = cust.agg(
        *_check(
            "customer.c_custkey unique",
            F.count(F.lit(1)),
            F.count(F.lit(1)) - F.count_distinct(F.col("c_custkey")),
        )
    )
    # ONE lineitem scan feeds BOTH lineitem checks (uniqueness + range):
    # a single multi-aggregate row exploded into two audit rows — at 100 TB
    # this halves the biggest table's scan cost for the audit pass
    li_row = li.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.count(F.lit(1))
            - F.count_distinct(F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("dupe_fail"),
        F.sum(
            F.when(
                (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 100), 1
            ).otherwise(0)
        ).alias("range_fail"),
    )
    li_checks = (
        li_row.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lineitem (l_orderkey, l_linenumber) unique").alias("check_name"),
                        F.col("n").cast("bigint").alias("n_checked"),
                        F.col("dupe_fail").cast("bigint").alias("n_failed"),
                    ),
                    F.struct(
                        F.lit("lineitem.l_quantity in (0, 100]").alias("check_name"),
                        F.col("n").cast("bigint").alias("n_checked"),
                        F.col("range_fail").cast("bigint").alias("n_failed"),
                    ),
                )
            ).alias("c")
        )
        .select(
            F.col("c.check_name").alias("check_name"),
            F.col("c.n_checked").alias("n_checked"),
            F.col("c.n_failed").alias("n_failed"),
            (F.col("c.n_failed") == 0).alias("passed"),
        )
    )
    # referential integrity: orphan count and total ride ONE outer-join agg
    # (customer is a declared broadcast dimension), not an anti-join plus a
    # second orders scan
    fk = (
        orders.select("o_custkey")
        .join(
            cust.select(
                F.col("c_custkey").alias("o_custkey"),
                F.lit(1).alias("_present"),
            ),
            "o_custkey",
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(
                F.when(F.col("_present").isNull(), 1).otherwise(0)
            ).alias("orphans"),
        )
        .select(
            *_check(
                "orders.o_custkey references customer",
                F.col("total"),
                F.col("orphans"),
            )
        )
    )
    # not-null check
    val_nn = load_table(spark, sf, "events").agg(
        *_check(
            "events.value not null",
            F.count(F.lit(1)),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)),
        )
    )
    # derived-column consistency
    nchars = docs.agg(
        *_check(
            "documents.n_chars == length(text)",
            F.count(F.lit(1)),
            F.sum(
                F.when(F.col("n_chars") != F.length(F.col("text")), 1).otherwise(0)
            ),
        )
    )
    out = c_unique
    for df in (li_checks, fk, val_nn, nchars):
        out = out.unionByName(df)
    return out


# every n_failed CAST to BIGINT: DuckDB sum(int) is HUGEINT, which decays to
# float64 in the gate's canonicalization (the dd_simhash r01 failure mode)
DQ_SQL = """
SELECT 'customer.c_custkey unique' AS check_name,
       count(*) AS n_checked,
       CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS n_failed,
       count(*) - count(DISTINCT c_custkey) = 0 AS passed
FROM customer
UNION ALL
SELECT 'lineitem (l_orderkey, l_linenumber) unique',
       count(*),
       CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
       count(*) - count(DISTINCT (l_orderkey, l_linenumber)) = 0
FROM lineitem
UNION ALL
SELECT 'orders.o_custkey references customer',
       (SELECT count(*) FROM orders),
       count(*),
       count(*) = 0
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem.l_quantity in (0, 100]',
       count(*),
       CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity > 100 THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN l_quantity <= 0 OR l_quantity > 100 THEN 1 ELSE 0 END) = 0
FROM lineitem
UNION ALL
SELECT 'events.value not null',
       count(*),
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) = 0
FROM events
UNION ALL
SELECT 'documents.n_chars == length(text)',
       count(*),
       CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) = 0
FROM documents
"""


QUERIES = [
    Query("dq_expectations", dq_expectations, DQ_SQL, "data-quality audit: uniqueness, FK integrity, ranges, null/derived-column checks"),
]
