"""Relational surface, part 2: cube, pivot, range join, as-of join, date
battery, approximate sketches.

The as-of join deliberately avoids a join: union both sides and LOCF the
right side's attributes over event time within the key — linear in input,
one shuffle on (key), no pair explosion. This is THE scalable as-of pattern
at 100 TB (a band range-join would shuffle candidates quadratically in the
band width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orc_spark.plans import Query
from orc_spark.sources.tables import load_table

# The ONE fixed-point revenue definition every revenue-summing query in this
# module shares (review fix: five Spark + ~9 SQL copies had drifted in):
# hundredths-of-cents so sums are order-independent-exact cross-engine.
def _rev_fp():
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("bigint")


REV_FP_SQL = (
    "CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)"
)



# --- cube -------------------------------------------------------------------

def r4b_cube(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
            F.grouping_id().alias("gid"),
        )
    )


R4B_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*)          AS n_orders,
       sum(o_totalprice) AS revenue,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- pivot (conditional aggregation, engine-portable) -----------------------

def r_pivot(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_open"),
            F.col("F").alias("qty_filled"),
        )
    )


R_PIVOT_SQL = """
SELECT l_returnflag,
       sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_open,
       sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_filled
FROM lineitem GROUP BY l_returnflag
"""


# --- range join -------------------------------------------------------------

def rj_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Equi+range join: per order, lineitems shipped within 30 days of the
    order date. The equi key (orderkey) carries the shuffle; the range
    predicate filters inside the join — no cross product."""
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    cond = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (
            F.col("l_shipdate")
            < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
    )
    return (
        li.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_fast_items"),
            F.sum("l_extendedprice").alias("fast_revenue"),
        )
    )


RJ_SQL = """
SELECT o_orderpriority,
       count(*)             AS n_fast_items,
       sum(l_extendedprice) AS fast_revenue
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
"""


# --- as-of join -------------------------------------------------------------

def aj_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for every 'click' event, the latest prior-or-same-time
    'view' event of the same user. Union + ordered LOCF — linear, no pair
    explosion (ties broken by event_id order: a view at the identical ts
    with smaller event_id is visible to the click)."""
    ev = load_table(spark, sf, "events")  # ts = bigint epoch micros
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    both = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("v_id"),
        F.when(F.col("event_type") == "view", F.col("value")).alias("v_value"),
        F.when(F.col("event_type") == "view", F.col("ts")).alias("v_ts"),
    )
    carried = both.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.last("v_id", ignorenulls=True).over(w).alias("last_view_id"),
        F.last("v_value", ignorenulls=True).over(w).alias("last_view_value"),
        F.last("v_ts", ignorenulls=True).over(w).alias("last_view_ts"),
    )
    return carried.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        "last_view_id",
        "last_view_value",
        F.expr("(ts - last_view_ts) div 1000").alias("gap_ms"),
    )


AJ_SQL = """
WITH evts AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN event_type = 'view' THEN event_id END AS v_id,
         CASE WHEN event_type = 'view' THEN value    END AS v_value,
         CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS v_ts_us
  FROM events WHERE event_type IN ('click', 'view')
), carried AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
         last_value(v_id    IGNORE NULLS) OVER w AS last_view_id,
         last_value(v_value IGNORE NULLS) OVER w AS last_view_value,
         last_value(v_ts_us IGNORE NULLS) OVER w AS last_view_ts_us
  FROM evts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id AS click_id, last_view_id, last_view_value,
       (ts_us - last_view_ts_us) // 1000 AS gap_ms
FROM carried WHERE event_type = 'click'
"""


# --- date/time battery ------------------------------------------------------

def r7b_dates(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    d = F.col("o_orderdate")  # TIMESTAMP_NTZ
    anchor = F.lit("1995-06-15").cast("timestamp_ntz")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("q"),
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.unix_millis(F.date_trunc("month", d).cast("timestamp")).alias("month_start_ms"),
        F.datediff(d.cast("date"), anchor.cast("date")).alias("days_from_anchor"),
        F.when(F.dayofweek(d).isin(1, 7), True).otherwise(False).alias("is_weekend"),
    )


R7B_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER)     AS y,
       CAST(month(o_orderdate) AS INTEGER)    AS m,
       CAST(day(o_orderdate) AS INTEGER)      AS dom,
       CAST(quarter(o_orderdate) AS INTEGER)  AS q,
       strftime(o_orderdate, '%Y-%m')         AS ym,
       epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
       CAST(date_diff('day', DATE '1995-06-15', CAST(o_orderdate AS DATE)) AS INTEGER)
                                              AS days_from_anchor,
       dayofweek(o_orderdate) IN (0, 6)       AS is_weekend
FROM orders
"""


# --- window frames + ranking battery ----------------------------------------

def r5b_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame (value-based window): per customer, the sum of their
    orders within ±1000 of each order's totalprice — exercises range frames
    vs the row frames used elsewhere."""
    orders = load_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, 1000)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.sum("o_totalprice").over(w).alias("sum_near"),
    )


R5B_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice,
       count(*)          OVER w AS n_near,
       sum(o_totalprice) OVER w AS sum_near
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
"""


def r5c_rank_battery(spark: SparkSession, sf: str) -> DataFrame:
    """Full ranking-function battery over one deterministic ordering."""
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("prnk"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_orderkey", 1).over(w).alias("prev_key"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
        F.first("o_orderkey").over(w).alias("top_key"),
    ).where(F.col("rn") <= 50)


R5C_SQL = """
SELECT o_orderkey, o_orderpriority, rn, rnk, drnk, prnk, cdist, quartile,
       prev_key, next_key, top_key
FROM (
  SELECT o_orderkey, o_orderpriority,
         row_number()   OVER w AS rn,
         rank()         OVER w AS rnk,
         dense_rank()   OVER w AS drnk,
         round(percent_rank() OVER w, 9) AS prnk,
         round(cume_dist()    OVER w, 9) AS cdist,
         ntile(4)       OVER w AS quartile,
         lag(o_orderkey)  OVER w AS prev_key,
         lead(o_orderkey) OVER w AS next_key,
         first_value(o_orderkey) OVER w AS top_key
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC)
)
WHERE rn <= 50
"""


# --- JSON + map scalar battery ----------------------------------------------

def r7c_json_map(spark: SparkSession, sf: str) -> DataFrame:
    """JSON extraction over events.props plus map construction/lookup —
    the map/json leg of the scalar battery (SURVEY §2.C)."""
    ev = load_table(spark, sf, "events")
    k_val = F.get_json_object(F.col("props"), "$.k").cast("int")
    m = F.create_map(F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string"))
    return ev.select(
        "event_id",
        k_val.alias("k_val"),
        (k_val % 10).alias("k_mod"),
        F.element_at(m, "type").alias("m_type"),
        F.size(F.map_keys(m)).alias("m_nkeys"),
        F.to_json(F.struct(F.col("event_id").alias("id"), k_val.alias("k"))).alias("j_out"),
    )


R7C_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
       (MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)])['type'])[1] AS m_type,
       CAST(cardinality(MAP(['type', 'uid'],
            [event_type, CAST(user_id AS VARCHAR)])) AS INTEGER) AS m_nkeys,
       '{"id":' || event_id || ',"k":' ||
            CAST(json_extract_string(props, '$.k') AS INTEGER) || '}' AS j_out
FROM events
"""


# --- approximate sketches ---------------------------------------------------

SKETCH_REL_ERR = 0.05


def approx_sketches(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (HLL++) and percentile_approx per returnflag.
    Sketch bits differ between engines, so the DRIVER-checked columns are the
    exact sides plus in-query error-bound booleans: the oracle emits literal
    TRUE, so the hash only matches when the sketch landed within the bound —
    a hard driver signal for an approximate operator (VERDICT r01 item 6).
    tests/test_relational2.py additionally bounds the error locally."""
    li = load_table(spark, sf, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.expr("median(l_extendedprice)").alias("exact_median_price"),
    )
    rel = lambda a, e: F.abs(a.cast("double") - e) / F.abs(e)  # noqa: E731
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_median_price",
        (rel(F.col("approx_parts"), F.col("exact_parts")) <= SKETCH_REL_ERR).alias(
            "approx_parts_ok"
        ),
        (
            rel(F.col("approx_median_price"), F.col("exact_median_price"))
            <= SKETCH_REL_ERR
        ).alias("approx_median_ok"),
    )


APPROX_SKETCHES_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey)    AS exact_parts,
       median(l_extendedprice)      AS exact_median_price,
       TRUE                         AS approx_parts_ok,
       TRUE                         AS approx_median_ok
FROM lineitem
GROUP BY l_returnflag
"""



# --- r13: revenue view + scalar-max subquery (TPC-H Q15 shape) ---------------

def r13_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q15 shape: a per-supplier revenue view over a 90-day window, then the
    supplier(s) whose revenue equals the view's max — a scalar aggregate
    subquery over an aggregated view. Spark: the max is a 1-row broadcast
    joined back (no second scan of lineitem — the view reuses). Revenue is
    summed in integer hundredths-of-cents so the max-equality predicate is
    exact in both engines."""
    li = load_table(spark, sf, "lineitem")
    sup = load_table(spark, sf, "supplier")
    lo = F.to_timestamp(F.lit("1996-01-01"))
    hi = F.to_timestamp(F.lit("1996-03-31"))
    rev = (
        li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") <= hi))
        .select(
            "l_suppkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
            ).cast("bigint").alias("rev_fp"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("rev_fp").alias("total_rev_fp"))
    )
    mx = rev.agg(F.max("total_rev_fp").alias("max_rev_fp"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev_fp") == F.col("max_rev_fp"))
        .join(sup, rev.l_suppkey == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev_fp").cast("double") / 10000.0, 6).alias(
                "total_revenue"
            ),
        )
    )


R13_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum({REV_FP_SQL}) AS BIGINT) AS total_rev_fp
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <= TIMESTAMP '1996-03-31 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       round(CAST(total_rev_fp AS DOUBLE) / 10000.0, 6) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_fp = (SELECT max(total_rev_fp) FROM rev)
"""


# --- r14: EXISTS / NOT-EXISTS chain (TPC-H Q21 shape) ------------------------

def r14_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier finished order (late := shipped > 60 days after order
    date). The correlated EXISTS / NOT EXISTS pair decorrelates into
    per-order supplier/late-supplier distinct counts — two combinable
    aggregations instead of two correlated re-scans; top 10 by wait count.
    At scale: one join lineitem⋈orders (orderdate attach), one
    groupBy(orderkey), one broadcast-back join — no correlated execution."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    sup = load_table(spark, sf, "supplier")
    lo = (
        li.join(
            orders.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    # When n_late_supp == 1 the lone late supplier IS max(late suppkey), so
    # the waiting supplier comes out of the SAME aggregate — one pass over
    # lo (which reuses the join's l_orderkey partitioning), instead of a
    # second consumption of the stream-sized lo + distinct + join-back.
    # Two stacked groupBys instead of twin countDistinct: the distinct pair
    # would plan an Expand (3× rows) + extra distinct shuffles, while BOTH
    # these aggregations satisfy their clustering from the join's
    # l_orderkey partitioning — zero additional exchanges.
    per_os = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("any_late")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("any_late").alias("n_late_supp"),
        F.max(F.when(F.col("any_late") == 1, F.col("l_suppkey"))).alias(
            "l_suppkey"
        ),
    )
    waiting = per_order.where(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    # Group the final count by s_name — Q21's official output contract —
    # not by l_suppkey. The two are equivalent only while names are unique
    # per key; the ~sf1 replica (duplicate names across offset key spaces,
    # exactly the dirty data a real corpus has) exposed the key-grouped
    # variant diverging from the name-grouped oracle. The supplier dim
    # broadcasts, so this costs the same single exchange (on s_name
    # instead of l_suppkey).
    return (
        waiting.join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


R14_SQL = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
         CAST(count(DISTINCT CASE WHEN late THEN l_suppkey END) AS BIGINT)
           AS n_late_supp
  FROM lo GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late) w
JOIN per_order USING (l_orderkey)
JOIN supplier ON w.l_suppkey = s_suppkey
WHERE n_supp >= 2 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


# --- r15: anti-join + scalar avg subquery (TPC-H Q22 shape) ------------------

def r15_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Q22 shape: customers with above-average account balance who have
    never placed an order, grouped by market segment. Two decorrelations
    in one query: the scalar AVG subquery becomes a 1-row broadcast, and
    NOT EXISTS becomes a left-anti join. Balances aggregate in integer
    cents so the output sums are exact."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    # "idle" = no order in the final 2 years of the dataset (every customer
    # has SOME order in this testdata, so plain NOT EXISTS is vacuous);
    # the cutoff is a 1-row broadcast, integer epoch-millis comparison
    cutoff = orders.agg(
        (F.max(F.unix_millis(F.col("o_orderdate").cast("timestamp")))
         - F.lit(2 * 365 * 86400000)).alias("cut_ms")
    )
    recent = (
        orders.crossJoin(F.broadcast(cutoff))
        .where(
            F.unix_millis(F.col("o_orderdate").cast("timestamp"))
            >= F.col("cut_ms")
        )
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(cents).alias("total_bal_cents"),
        )
    )


R15_SQL = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_bal_cents
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND epoch_ms(o.o_orderdate) >=
          (SELECT max(epoch_ms(o_orderdate)) - CAST(63072000000 AS BIGINT) FROM orders)
  )
GROUP BY c_mktsegment
"""

# --- r16: large-volume orders (TPC-H Q18 shape) ------------------------------

def r16_big_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds 300, with the owning
    customer — a GROUP BY + HAVING over the fact table joined back to two
    dimensions. Spark: one lineitem aggregation, then the (small) qualifying
    set joins orders and customer; both dimension joins broadcast at the
    qualifying cardinality. l_quantity is integer-valued, so the double sum
    is order-independent-exact and casts cleanly to BIGINT on both engines."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty_d"))
        .where(F.col("total_qty_d") > 300)
        .select(
            "l_orderkey", F.col("total_qty_d").cast("bigint").alias("total_qty")
        )
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "order_ms"
            ),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("orderkey").asc())
        .limit(50)
    )


R16_SQL = """
SELECT c_custkey, c_name, o_orderkey AS orderkey,
       epoch_ms(o_orderdate) AS order_ms,
       CAST(sum(l_quantity) AS BIGINT) AS total_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
HAVING sum(l_quantity) > 300
ORDER BY total_qty DESC, orderkey ASC
LIMIT 50
"""


# --- r17: volume shipping between nation pairs (TPC-H Q7 shape) --------------

def r17_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """Q7 shape: revenue flow between supplier-nation and customer-nation
    pairs by ship year — the classic star-join snowflake (fact ⋈ 2 key
    bridges ⋈ 2 copies of a tiny dimension). Spark: supplier/customer key
    maps and the nation dimension all broadcast; only the lineitem⋈orders
    equi-join shuffles, and AQE keeps it partial-agg-first. Revenue sums
    in integer hundredths-of-cents for cross-engine exactness."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    sup = load_table(spark, sf, "supplier")
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    sn = sup.join(
        nation, sup.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cn = cust.join(
        nation, cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    rev_fp = _rev_fp()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(F.broadcast(cn), orders.o_custkey == cn.c_custkey)
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.sum(rev_fp).alias("revenue_fp"))
        .orderBy(F.col("revenue_fp").desc(), "supp_nation", "cust_nation", "ship_year")
        .limit(25)
    )


R17_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(sum({REV_FP_SQL}) AS BIGINT) AS revenue_fp
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name < cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
ORDER BY revenue_fp DESC, supp_nation, cust_nation, ship_year
LIMIT 25
"""


# --- r18: returned-item revenue ranking (TPC-H Q10 shape) --------------------

def r18_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """Q10 shape: top customers by revenue lost to returned items in one
    quarter — selective fact filter, order-window filter, customer + nation
    dimension joins, top-k. Spark: both date filters reach the parquet
    scans; nation broadcasts; revenue in integer hundredths-of-cents."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    lo = F.to_timestamp(F.lit("1996-01-01"))
    hi = F.to_timestamp(F.lit("1996-04-01"))
    rev_fp = _rev_fp()
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev_fp).alias("revenue_fp"))
        .orderBy(F.col("revenue_fp").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


R18_SQL = f"""
SELECT c_custkey, c_name, n_name AS nation,
       CAST(sum({REV_FP_SQL}) AS BIGINT) AS revenue_fp
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_fp DESC, c_custkey ASC
LIMIT 20
"""


# --- r19: promo revenue share by month (TPC-H Q14 shape) ---------------------

def r19_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    """Q14 shape: the monthly share of revenue from PROMO-type parts — a
    conditional-aggregate ratio over a fact ⋈ dimension join. Spark: part
    broadcasts (it's the small side), both sums accumulate in integer
    hundredths-of-cents, and the share is one float division per month —
    no accumulated-double divergence possible."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    rev_fp = _rev_fp()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("int").alias("ship_year"),
            F.month("l_shipdate").cast("int").alias("ship_month"),
        )
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev_fp).otherwise(F.lit(0))
            ).alias("promo_fp"),
            F.sum(rev_fp).alias("total_fp"),
        )
        .select(
            "ship_year",
            "ship_month",
            "promo_fp",
            "total_fp",
            F.round(
                F.lit(100.0)
                * F.col("promo_fp").cast("double")
                / F.col("total_fp").cast("double"),
                6,
            ).alias("promo_pct"),
        )
        .coalesce(1)
        .sortWithinPartitions("ship_year", "ship_month")
    )


R19_SQL = f"""
SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(month(l_shipdate) AS INTEGER) AS ship_month,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN {REV_FP_SQL}
                     ELSE 0 END) AS BIGINT) AS promo_fp,
       CAST(sum({REV_FP_SQL}) AS BIGINT) AS total_fp,
       round(CAST(100.0 AS DOUBLE)
             * CAST(sum(CASE WHEN p_type = 'PROMO'
                             THEN {REV_FP_SQL}
                             ELSE 0 END) AS DOUBLE)
             / CAST(sum({REV_FP_SQL}) AS DOUBLE),
             6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY year(l_shipdate), month(l_shipdate)
ORDER BY ship_year, ship_month
"""


# --- r20: disjunctive bracket predicate (TPC-H Q19 shape) --------------------

def r20_bracket_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 shape: revenue from three disjunctive (brand, size-bracket,
    quantity-bracket) arms OR-ed together — the predicate-pushdown stress
    test: the filter is a pure row predicate over the joined pair, so it
    evaluates inside the scan/join stage with no extra shuffle; one
    aggregate row out, summed in integer hundredths-of-cents."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 15)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 25)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    rev_fp = _rev_fp()
    return j.where(arm1 | arm2 | arm3).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(rev_fp).alias("revenue_fp"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
    )


R20_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum({REV_FP_SQL}) AS BIGINT) AS revenue_fp,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
"""


# --- r21: NULL-semantics battery ---------------------------------------------

def r21_null_semantics(spark: SparkSession, sf: str) -> DataFrame:
    """NULL-semantics battery over a real outer join (customers without
    recent 'P'-status orders get NULL aggregates): null-safe equality
    (Spark `<=>` == DuckDB IS NOT DISTINCT FROM), NULLIF, COALESCE,
    count(*) vs count(col), aggregate NULL-skipping, and NULLS FIRST
    ordering of a nullable key — the exact places engines silently
    disagree, pinned per market segment."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    recent = (
        orders.where(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max(
                F.unix_millis(F.col("o_orderdate").cast("timestamp"))
            ).alias("last_ms"),
        )
    )
    j = cust.join(recent, cust.c_custkey == recent.o_custkey, "left")
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.count("n_orders").alias("n_matched"),
            F.sum(
                F.when(F.col("n_orders").eqNullSafe(F.lit(None)), 1).otherwise(0)
            ).alias("n_null_nullsafe"),
            # TRUE iff n_orders is NULL (both sides null → <=> true) or
            # n_orders ∉ {1,2} (both sides the same non-null value)
            F.sum(
                F.when(
                    F.nullif(F.col("n_orders"), F.lit(1)).eqNullSafe(
                        F.nullif(F.col("n_orders"), F.lit(2))
                    ),
                    1,
                ).otherwise(0)
            ).alias("n_nullif_nullsafe_eq"),
            F.sum(F.coalesce(F.col("n_orders"), F.lit(0))).alias(
                "total_orders_coalesced"
            ),
            F.round(F.avg("n_orders"), 6).alias("avg_orders_skipnull"),
            F.min(F.expr("last_ms")).alias("min_last_ms_skipnull"),
        )
        .coalesce(1)
        .sortWithinPartitions(
            F.col("n_matched").asc_nulls_first(), F.col("c_mktsegment")
        )
    )


R21_SQL = """
WITH recent AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         max(epoch_ms(o_orderdate)) AS last_ms
  FROM orders WHERE o_orderstatus = 'P'
  GROUP BY o_custkey
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(count(n_orders) AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN n_orders IS NOT DISTINCT FROM NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_null_nullsafe,
       CAST(sum(CASE WHEN nullif(n_orders, 1)
                          IS NOT DISTINCT FROM nullif(n_orders, 2)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_nullif_nullsafe_eq,
       CAST(sum(coalesce(n_orders, 0)) AS BIGINT) AS total_orders_coalesced,
       round(avg(n_orders), 6) AS avg_orders_skipnull,
       min(last_ms) AS min_last_ms_skipnull
FROM customer LEFT JOIN recent ON c_custkey = o_custkey
GROUP BY c_mktsegment
ORDER BY n_matched ASC NULLS FIRST, c_mktsegment
"""


QUERIES = [
    Query("r4b_cube", r4b_cube, R4B_SQL, "cube grouping sets"),
    Query("r_pivot", r_pivot, R_PIVOT_SQL, "pivot via conditional aggregation"),
    Query("rj_range_join", rj_range_join, RJ_SQL, "equi+range join (ship within 30 days)"),
    Query("aj_asof_join", aj_asof_join, AJ_SQL, "as-of join via union + ordered LOCF"),
    Query("r7b_dates", r7b_dates, R7B_SQL, "date/time scalar battery"),
    Query("r7c_json_map", r7c_json_map, R7C_SQL, "JSON extraction + map construction battery"),
    Query("r5b_range_frame", r5b_range_frame, R5B_SQL, "value-based RANGE window frame"),
    Query("r5c_rank_battery", r5c_rank_battery, R5C_SQL, "ranking function battery"),
    Query("approx_sketches", approx_sketches, APPROX_SKETCHES_SQL, "HLL++ + approx percentile, exact sides + error-bound booleans hash-checked"),
    Query("r13_top_supplier", r13_top_supplier, R13_SQL, "revenue view + scalar-max subquery (Q15 shape)"),
    Query("r14_waiting_supplier", r14_waiting_supplier, R14_SQL, "EXISTS/NOT-EXISTS chain decorrelated (Q21 shape)"),
    Query("r15_idle_customers", r15_idle_customers, R15_SQL, "anti-join + scalar avg subquery (Q22 shape)"),
    Query("r16_big_orders", r16_big_orders, R16_SQL, "GROUP BY + HAVING top-volume orders (Q18 shape)"),
    Query("r17_nation_volume", r17_nation_volume, R17_SQL, "nation-pair revenue flow by year (Q7 shape)"),
    Query("r18_returned_items", r18_returned_items, R18_SQL, "returned-item revenue top-k (Q10 shape)"),
    Query("r19_promo_share", r19_promo_share, R19_SQL, "promo revenue share by month (Q14 shape)"),
    Query("r20_bracket_revenue", r20_bracket_revenue, R20_SQL, "disjunctive bracket predicate revenue (Q19 shape)"),
    Query("r21_null_semantics", r21_null_semantics, R21_SQL, "NULL-semantics battery: null-safe eq, NULLIF/COALESCE, NULL-skipping aggs"),
]
