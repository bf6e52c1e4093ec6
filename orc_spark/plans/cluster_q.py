"""Near-duplicate cluster resolution: MinHash-LSH pairs → connected
components → canonical doc per cluster.

This is the piece that turns pairwise dedup signals into actionable
keep/drop sets: each document gets a `cluster_id` (the smallest doc_id in
its similarity component, the canonical survivor) and the cluster size.
Reference analog: the dedup extensions mandated by the build plan (SURVEY
§7.1 M6); pairs come from dd_minhash_pairs (dedup_q.py).

The Spark plan is iterative (operators/graph.py); the oracle is a recursive
CTE computing the transitive closure — exact same result, wildly different
physical strategy, which is precisely what the parity gate is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orc_spark.operators.graph import connected_components
from orc_spark.plans import Query
from orc_spark.plans.dedup_q import _minhash_pairs_sql, dd_minhash_pairs
from orc_spark.sources.tables import load_table

JACCARD_MIN = 0.5


def dd_cluster(spark: SparkSession, sf: str) -> DataFrame:
    pairs = (
        dd_minhash_pairs(spark, sf)
        .where(F.col("est_jaccard") >= JACCARD_MIN)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    nodes = load_table(spark, sf, "documents").select(
        F.col("doc_id").alias("node")
    )
    comp = connected_components(nodes, pairs)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        F.count(F.lit(1))
        .over(Window.partitionBy("comp"))
        .alias("cluster_size"),
    )


def _cluster_sql() -> str:
    return f"""
WITH RECURSIVE
good AS (
  SELECT doc_a, doc_b FROM ({_minhash_pairs_sql()})
  WHERE est_jaccard >= {JACCARD_MIN}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM good
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM good
  UNION
  SELECT doc_id AS src, doc_id AS dst FROM documents
),
reach (src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
"""


QUERIES = [
    Query("dd_cluster", dd_cluster, _cluster_sql(), "LSH near-dup connected components → canonical doc per cluster"),
]
