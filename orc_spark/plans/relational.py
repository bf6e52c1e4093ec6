"""Relational surface R1-R8 (SURVEY §2.B): scans, joins, aggregations,
grouping sets, windows, sorts/limits, set ops, scalar battery, event windows.

All implementations are declarative DataFrame plans — Catalyst applies
predicate pushdown, column pruning, join selection (dimension tables under
the broadcast threshold become BroadcastHashJoins) and AQE handles skew at
scale. No collect(), no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orc_spark.plans import Query
from orc_spark.sources.tables import load_table


# --- R1: filtered scan + projection + aggregation (TPC-H Q1 shape) ---------

def r1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


R1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                          AS sum_qty,
       sum(l_extendedprice)                                     AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount))                  AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))    AS sum_charge,
       avg(l_quantity)                                          AS avg_qty,
       avg(l_extendedprice)                                     AS avg_price,
       avg(l_discount)                                          AS avg_disc,
       count(*)                                                 AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- R2: equi hash join + aggregation (orders ⋈ customer) -------------------

def r2_join_agg(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    # customer is a dimension: broadcast it so the fact side never shuffles
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_revenue"),
            F.avg("o_totalprice").alias("avg_order_price"),
        )
    )


R2_SQL = """
SELECT c_mktsegment,
       count(*)          AS n_orders,
       sum(o_totalprice) AS total_revenue,
       avg(o_totalprice) AS avg_order_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --- R2b: semi / anti join --------------------------------------------------

def r2b_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").select("o_custkey")
    cust = load_table(spark, sf, "customer")
    with_orders = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    without = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return with_orders.agg(F.count(F.lit(1)).alias("n_with_orders")).crossJoin(
        without.agg(F.count(F.lit(1)).alias("n_without_orders"))
    )


R2B_SQL = """
SELECT
  (SELECT count(*) FROM customer WHERE EXISTS
     (SELECT 1 FROM orders WHERE o_custkey = c_custkey))     AS n_with_orders,
  (SELECT count(*) FROM customer WHERE NOT EXISTS
     (SELECT 1 FROM orders WHERE o_custkey = c_custkey))     AS n_without_orders
"""


# --- R3: multi-way join + group + top-k (TPC-H Q3 shape) --------------------

def r3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    joined = (
        li.where(F.col("l_shipdate") > cutoff)
        .join(orders.where(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select(
            "l_orderkey",
            # o_orderdate reads as TIMESTAMP_NTZ; session TZ is UTC so the
            # cast is a pure reinterpretation
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "orderdate_ms", "l_orderkey")
        .limit(10)
    )


R3_SQL = """
SELECT l_orderkey,
       epoch_ms(o_orderdate)    AS orderdate_ms,
       o_orderpriority,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, orderdate_ms, l_orderkey
LIMIT 10
"""


# --- R4: rollup over (nation, year) -----------------------------------------

def r4_rollup(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name", F.year("o_orderdate").alias("order_year"), "o_totalprice"
        )
    )
    return base.rollup("n_name", "order_year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("revenue"),
        F.grouping_id().alias("gid"),
    )


R4_SQL = """
SELECT n_name,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       count(*)          AS n_orders,
       sum(o_totalprice) AS revenue,
       GROUPING(n_name) * 2 + GROUPING(CAST(year(o_orderdate) AS INTEGER)) AS gid
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, CAST(year(o_orderdate) AS INTEGER))
"""


# --- R5: window ranking: top-2 orders per customer --------------------------

def r5_window_topk(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.sum("o_totalprice")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("running_spend"),
        )
        .where(F.col("rn") <= 2)
    )


R5_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn, running_spend FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER w AS rn,
         sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS running_spend
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
) WHERE rn <= 2
"""


# --- R6: set ops + distinct -------------------------------------------------

def r6_setops(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION cardinalities in ONE pass (r15): the
    literal three set-op pipelines re-scanned and re-distincted both
    filtered streams per op (3 shuffles of each side, 9 job rounds).
    Tagging each side and folding everything into one groupBy(pk) gives
    identical SET semantics directly: the groupBy deduplicates keys, and
    max(h)/max(b) per key record side membership, so h·b counts keys in
    both sides (INTERSECT), h·(1−b) keys only in heavy (EXCEPT), and the
    group count is |heavy ∪ big| (UNION) — one exchange total:
    n_intersect = Σ h·b, n_except = Σ h·(1−b), n_union = |keys|."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    heavy = li.where(F.col("l_quantity") >= 45).select(
        F.col("l_partkey").alias("pk"),
        F.lit(1).alias("h"),
        F.lit(0).alias("b"),
    )
    big = part.where(F.col("p_size") >= 40).select(
        F.col("p_partkey").alias("pk"),
        F.lit(0).alias("h"),
        F.lit(1).alias("b"),
    )
    tagged = (
        heavy.unionByName(big)
        .groupBy("pk")
        .agg(F.max("h").alias("h"), F.max("b").alias("b"))
    )
    # coalesce: sum over an EMPTY key set is NULL where the old per-op
    # count was 0 (hypothesis-found edge)
    return tagged.agg(
        F.coalesce(F.sum(F.col("h") * F.col("b")), F.lit(0))
        .cast("bigint")
        .alias("n_intersect"),
        F.coalesce(F.sum(F.col("h") * (1 - F.col("b"))), F.lit(0))
        .cast("bigint")
        .alias("n_except"),
        F.count(F.lit(1)).alias("n_union"),
    )


R6_SQL = """
WITH heavy AS (SELECT DISTINCT l_partkey AS pk FROM lineitem WHERE l_quantity >= 45),
     big   AS (SELECT DISTINCT p_partkey AS pk FROM part     WHERE p_size >= 40)
SELECT
  (SELECT count(*) FROM (SELECT pk FROM heavy INTERSECT SELECT pk FROM big)) AS n_intersect,
  (SELECT count(*) FROM (SELECT pk FROM heavy EXCEPT    SELECT pk FROM big)) AS n_except,
  (SELECT count(*) FROM (SELECT pk FROM heavy UNION     SELECT pk FROM big)) AS n_union
"""


# --- R7: scalar function battery -------------------------------------------

def r7_scalar_battery(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    words = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.upper(F.substring(F.col("p_name"), 1, 5)).alias("name_prefix"),
        F.length(F.col("p_name")).alias("name_len"),
        F.regexp_extract(F.col("p_type"), r"^(\w+)", 1).alias("type_head"),
        F.size(words).alias("n_words"),
        F.element_at(F.sort_array(words), 1).alias("first_word_sorted"),
        F.sqrt(F.col("p_retailprice")).alias("price_sqrt"),
        F.pow(F.col("p_size").cast("double"), F.lit(2.0)).alias("size_sq"),
        F.degrees(F.atan2(F.col("p_size").cast("double"), F.lit(100.0))).alias(
            "size_angle_deg"
        ),
        F.asin(F.least(F.col("p_size").cast("double") / 50.0, F.lit(1.0))).alias(
            "size_asin"
        ),
        F.log(F.col("p_retailprice") + 1.0).alias("price_ln"),
        (F.col("p_retailprice") % 7.0).alias("price_mod7"),
    )


R7_SQL = """
SELECT p_partkey,
       upper(substr(p_name, 1, 5))                   AS name_prefix,
       CAST(length(p_name) AS INTEGER)               AS name_len,
       regexp_extract(p_type, '^(\\w+)', 1)          AS type_head,
       CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
       list_sort(string_split(p_name, ' '))[1]       AS first_word_sorted,
       sqrt(p_retailprice)                           AS price_sqrt,
       pow(CAST(p_size AS DOUBLE), 2.0)              AS size_sq,
       degrees(atan2(CAST(p_size AS DOUBLE), 100.0)) AS size_angle_deg,
       asin(least(CAST(p_size AS DOUBLE) / 50.0, 1.0)) AS size_asin,
       ln(p_retailprice + 1.0)                       AS price_ln,
       fmod(p_retailprice, 7.0)                      AS price_mod7
FROM part
"""


# --- R8: event-time windows (batch replay of the streaming surface) ---------

def _ev_ts(spark: SparkSession, sf: str) -> DataFrame:
    """events with ts as a real timestamp (read as bigint epoch MICROS, see
    sources.tables) for the native window fns."""
    ev = load_table(spark, sf, "events")
    return ev.withColumn("ts", F.timestamp_micros(F.col("ts")))


def r8_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    ev = _ev_ts(spark, sf)
    win = F.window(F.col("ts"), "1 hour")
    return (
        ev.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            (F.unix_millis(F.col("window.start")) / F.lit(1000))
            .cast("bigint")
            .alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


R8_SQL = """
SELECT (epoch_ns(ts) // 1000000000 // 3600) * 3600 AS window_start_s,
       event_type,
       count(*)   AS n_events,
       sum(value) AS sum_value
FROM events
GROUP BY 1, 2
"""


def r8b_sliding(spark: SparkSession, sf: str) -> DataFrame:
    ev = _ev_ts(spark, sf)
    win = F.window(F.col("ts"), "1 hour", "15 minutes")
    return (
        ev.groupBy(win)
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
        .select(
            (F.unix_millis(F.col("window.start")) / F.lit(1000))
            .cast("bigint")
            .alias("window_start_s"),
            "n_events",
            "avg_value",
        )
    )


# every event (ts ≥ epoch) falls in exactly 4 sliding windows: starts
# (floor(e/900)-k)*900 for k=0..3
R8B_SQL = """
SELECT ((epoch_ns(ts) // 1000000000 // 900) - k) * 900 AS window_start_s,
       count(*)   AS n_events,
       avg(value) AS avg_value
FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
GROUP BY 1
"""


def r8c_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user, via gaps-and-islands
    window expressions. The native ``session_window`` streaming variant is in
    orc_spark.streaming; this batch form is hash-checkable against SQL."""
    ev = load_table(spark, sf, "events")  # ts = bigint epoch micros
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = 30 * 60 * 1_000_000
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when((F.col("ts") - F.lag("ts", 1).over(w)) >= gap_us, 1)
        .otherwise(0)
        .alias("new_session"),
    ).select(
        "user_id",
        "ts",
        "value",
        F.sum("new_session").over(wcum).alias("session_id"),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.expr("min(ts) div 1000000").alias("session_start_s"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


R8C_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       epoch_us(min(ts)) // 1000000 AS session_start_s,
       count(*)   AS n_events,
       sum(value) AS sum_value
FROM sessions
GROUP BY user_id, session_id
"""


QUERIES = [
    Query("r1_pricing_summary", r1_pricing_summary, R1_SQL, "TPC-H Q1 shape: filtered scan + multi-aggregate"),
    Query("r2_join_agg", r2_join_agg, R2_SQL, "broadcast hash join + aggregation"),
    Query("r2b_semi_anti", r2b_semi_anti, R2B_SQL, "left semi + left anti joins"),
    Query("r3_shipping_priority", r3_shipping_priority, R3_SQL, "3-way join + group + global top-k"),
    Query("r4_rollup", r4_rollup, R4_SQL, "rollup grouping sets with grouping_id"),
    Query("r5_window_topk", r5_window_topk, R5_SQL, "ranking + frame aggregate window"),
    Query("r6_setops", r6_setops, R6_SQL, "distinct + intersect/except/union"),
    Query("r7_scalar_battery", r7_scalar_battery, R7_SQL, "string/math/array scalar functions"),
    Query("r8_tumbling", r8_tumbling, R8_SQL, "tumbling event-time windows (batch replay)"),
    Query("r8b_sliding", r8b_sliding, R8B_SQL, "sliding event-time windows (batch replay)"),
    Query("r8c_sessions", r8c_sessions, R8C_SQL, "session windows via gaps-and-islands"),
]
