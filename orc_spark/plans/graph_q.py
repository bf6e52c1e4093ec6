"""Graph analytics: deterministic fixed-point PageRank over the
customer–supplier interaction graph (who-buys-from-whom, derived from
orders ⋈ lineitem).

Complements the connected-components operator (operators/graph.py): CC
resolves near-dup clusters; PageRank ranks nodes by link structure — the
standard importance prior for crawl/corpus curation pipelines.

Determinism contract: ranks are BIGINT fixed-point (scale 1e9) and every
update is integer arithmetic — contribution = rank div outdeg, damping as
(85 · Σcontrib) div 100 — so partial-aggregation order cannot change a
single bit and the result hash-checks cross-engine. The oracle unrolls the
same four iterations as chained CTEs.

100 TB shape: per iteration one equi-join of the rank table with the
(src-partitioned) edge list plus one groupBy(dst) with map-side combine —
the textbook distributed PageRank step. Iteration count is fixed (4), so
lineage stays shallow; a production run would localCheckpoint every few
rounds exactly like operators/graph.py does for CC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orc_spark.plans import Query
from orc_spark.sources.tables import load_table

PR_SCALE = 1_000_000_000  # fixed-point rank scale
PR_ITERS = 4
PR_BASE = 15 * PR_SCALE // 100  # (1 - d) · SCALE with d = 0.85


def _edges(spark: SparkSession, sf: str) -> DataFrame:
    """Undirected bipartite edge list: customer 2k ↔ supplier 2k+1."""
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    cs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    fwd = cs.select(F.col("cust_node").alias("src"), F.col("supp_node").alias("dst"))
    rev = cs.select(F.col("supp_node").alias("src"), F.col("cust_node").alias("dst"))
    return fwd.unionByName(rev)


def gr_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    edges = _edges(spark, sf)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # every node has degree >= 1 by construction (nodes := edge endpoints)
    nodes = deg.select(F.col("src").alias("node"))
    ranks = nodes.select("node", F.lit(PR_SCALE).cast("bigint").alias("r"))
    edged = edges.join(deg, "src")  # (src, dst, outdeg), co-partitioned by src
    for _ in range(PR_ITERS):
        contrib = (
            ranks.join(edged, ranks.node == edged.src)
            .select("dst", F.expr("r div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(PR_BASE)
                    + F.expr("85 * coalesce(s, 0L) div 100")
                ).cast("bigint").alias("r"),
            )
        )
    return ranks.select(
        "node",
        F.when(F.col("node") % 2 == 0, "cust").otherwise("supp").alias("entity"),
        F.expr("node div 2").alias("entity_key"),
        F.col("r").alias("rank_fp"),
    )


def _pagerank_sql() -> str:
    iters = []
    prev = "pr0"
    for i in range(1, PR_ITERS + 1):
        iters.append(f"""
pr{i} AS (
  SELECT n.node,
         CAST({PR_BASE} + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(p.r // d.outdeg) AS BIGINT) AS s
    FROM {prev} p
    JOIN edges e ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON n.node = c.node
)""")
        prev = f"pr{i}"
    chain = ",".join(iters)
    return f"""
WITH cs AS (
  SELECT DISTINCT o_custkey * 2 AS cust_node, l_suppkey * 2 + 1 AS supp_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT cust_node AS src, supp_node AS dst FROM cs
  UNION ALL
  SELECT supp_node AS src, cust_node AS dst FROM cs
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM deg),
pr0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
{chain}
SELECT node,
       CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS entity,
       node // 2 AS entity_key,
       r AS rank_fp
FROM {prev}
"""


QUERIES = [
    Query("gr_pagerank", gr_pagerank, _pagerank_sql(), "fixed-point integer PageRank, 4 iterations, bit-exact cross-engine"),
]
