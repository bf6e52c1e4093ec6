"""Relational surface, part 3: subquery decorrelation, outer-join histogram,
statistical aggregate battery, unpivot, deterministic sampling.

Scale notes (100 TB):
- r9 filters the fact table with the broadcast dimension BEFORE the per-key
  aggregate, so the shuffle agg runs over the brand's rows only — the same
  plan Catalyst produces when decorrelating the scalar subquery.
- r10's outer join shuffles on custkey once; both groupBys after it are
  cheap (second one is over ≤ a few hundred distinct counts).
- dp_sample is a deterministic hash-bucket sample: reproducible across
  engines/runs (no RNG state), trivially pushdown-friendly, and the sample
  fraction is a literal — the standard way to carve a stable dev slice out
  of a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orc_spark.functions.hashing import h60_sql, xor_digest
from orc_spark.plans import Query
from orc_spark.sources.tables import load_table


# --- R9: scalar-subquery shape (TPC-H Q17) ----------------------------------

def r9_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Lineitems of one brand whose quantity is below half that part's mean
    quantity (TPC-H Q17 shape, `main.py`-era threshold relaxed to 0.5 so the
    small SFs keep matches). The correlated scalar subquery is expressed as
    its decorrelated form: per-part aggregate joined back on partkey."""
    li = load_table(spark, sf, "lineitem")
    brand_parts = (
        load_table(spark, sf, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li_b = li.join(
        F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    per_part = li_b.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li_b.join(per_part, "l_partkey")
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


R9_SQL = """
SELECT sum(l_extendedprice) / 7.0 AS avg_yearly,
       count(*)                   AS n_small
FROM lineitem li JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                    FROM lineitem li2 WHERE li2.l_partkey = li.l_partkey)
"""


# --- R10: outer join + distribution histogram (TPC-H Q13) -------------------

def r10_outer_hist(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


R10_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --- R11: statistical aggregate battery -------------------------------------

def r11_stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Variance/stddev, exact interpolated percentiles, correlation,
    covariance and simple linear regression per market segment — the moment
    sketches a profiling pass needs, all single-shuffle partial+final aggs."""
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("c_mktsegment", "o_totalprice", "c_acctbal")
    p = F.col("o_totalprice")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.stddev_samp(p).alias("sd_price"),
        F.var_samp(p).alias("var_price"),
        F.expr("percentile(o_totalprice, 0.25)").alias("p25_price"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_price"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95_price"),
        # corr composed from covar/stddev instead of F.corr: Spark's corr
        # aggregate divides by zero INTERNALLY on a zero-variance side and
        # throws under ANSI with no way to guard it from outside (r11
        # degenerate sweep). The identical composition runs in the oracle,
        # so cross-engine float agreement rides the same covar/stddev
        # primitives the sd/var columns already rely on.
        (
            F.covar_samp(p, F.col("c_acctbal"))
            / F.nullif(
                F.stddev_samp(p) * F.stddev_samp(F.col("c_acctbal")),
                F.lit(0.0),
            )
        ).alias("corr_price_bal"),
        F.covar_samp(p, F.col("c_acctbal")).alias("covar_price_bal"),
        F.expr("regr_slope(o_totalprice, c_acctbal)").alias("slope"),
        F.expr("regr_intercept(o_totalprice, c_acctbal)").alias("intercept"),
    )


R11_SQL = """
SELECT c_mktsegment,
       count(*)                             AS n,
       stddev_samp(o_totalprice)            AS sd_price,
       var_samp(o_totalprice)               AS var_price,
       quantile_cont(o_totalprice, 0.25)    AS p25_price,
       quantile_cont(o_totalprice, 0.5)     AS p50_price,
       quantile_cont(o_totalprice, 0.95)    AS p95_price,
       covar_samp(o_totalprice, c_acctbal)
         / NULLIF(stddev_samp(o_totalprice) * stddev_samp(c_acctbal), 0)
                                            AS corr_price_bal,
       covar_samp(o_totalprice, c_acctbal)  AS covar_price_bal,
       regr_slope(o_totalprice, c_acctbal)  AS slope,
       regr_intercept(o_totalprice, c_acctbal) AS intercept
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --- R12: unpivot / melt ----------------------------------------------------

def r12_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    wide = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("double").alias("cnt_orders"),
            F.sum("o_totalprice").alias("sum_price"),
            F.avg("o_totalprice").alias("avg_price"),
        )
    )
    return wide.unpivot(
        "c_mktsegment",
        ["cnt_orders", "sum_price", "avg_price"],
        "metric",
        "value",
    )


R12_SQL = """
WITH wide AS (
  SELECT c_mktsegment,
         CAST(count(*) AS DOUBLE) AS cnt_orders,
         sum(o_totalprice)        AS sum_price,
         avg(o_totalprice)        AS avg_price
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment, metric, value
FROM wide UNPIVOT (value FOR metric IN (cnt_orders, sum_price, avg_price))
"""


# --- dp_sample: deterministic hash-bucket sampling --------------------------

SAMPLE_BUCKETS = 100  # keep bucket 0 → 1% sample

def dp_sample(spark: SparkSession, sf: str) -> DataFrame:
    """1% reproducible sample of lineitem via a cross-engine 60-bit md5
    bucket on the row key, then summary stats over the sample. No RNG: the
    same rows are selected on any engine, any run, any partitioning."""
    li = load_table(spark, sf, "lineitem")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws("-", "l_orderkey", "l_linenumber")), 1, 15),
            16,
            10,
        ).cast("bigint")
        % SAMPLE_BUCKETS
    )
    return (
        li.where(bucket == 0)
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.avg("l_quantity").alias("avg_qty"),
        )
    )


DP_SAMPLE_SQL = f"""
SELECT count(*)             AS n_sampled,
       sum(l_extendedprice) AS sum_price,
       avg(l_quantity)      AS avg_qty
FROM lineitem
WHERE ('0x' || substr(md5(l_orderkey || '-' || l_linenumber), 1, 15))::BIGINT
      % {SAMPLE_BUCKETS} = 0
"""


# --- dp_stratified: per-stratum deterministic sampling ----------------------

# per-language keep fraction (percent): downsample the dominant language,
# keep the tails — the canonical corpus-balancing move
STRATA_PCT = {"en": 10, "zh": 50, "es": 50, "de": 50, "fr": 50}
DEFAULT_PCT = 25


def dp_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling: each language keeps a different
    hash-bucket fraction. Single pass, no RNG, no join — the keep decision
    is a pure column predicate, so it composes with pushdown and runs
    map-side at any scale."""
    docs = load_table(spark, sf, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % SAMPLE_BUCKETS
    )
    pct = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in STRATA_PCT.items()],
        F.lit(DEFAULT_PCT),
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(bucket < pct, 1).otherwise(0)).alias("n_sampled"),
        F.sum(F.when(bucket < pct, F.col("n_chars")).otherwise(0)).alias(
            "sampled_chars"
        ),
    )


_PCT_CASE = " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in STRATA_PCT.items())

DP_STRATIFIED_SQL = f"""
SELECT lang,
       count(*) AS n_total,
       CAST(sum(CASE WHEN bucket < pct THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sampled,
       CAST(sum(CASE WHEN bucket < pct THEN n_chars ELSE 0 END) AS BIGINT)
           AS sampled_chars
FROM (
  SELECT lang, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            % {SAMPLE_BUCKETS} AS bucket,
         CASE {_PCT_CASE} ELSE {DEFAULT_PCT} END AS pct
  FROM documents
)
GROUP BY lang
"""


# --- sk_hll_merge: mergeable distinct-count sketches ------------------------

def sk_hll_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Two-level HLL: per-nation customer sketches, union-merged up to the
    region level (Apache DataSketches via hll_sketch_agg/hll_union_agg).
    Mergeability is the point — at 100 TB the per-partition sketches combine
    without re-reading data, the same contract partial aggregation relies
    on. Sketch bits differ across engines → rows-only; the relative error
    vs the exact count is bounded in tests."""
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    j = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == F.col("r_regionkey"))
        .select("r_name", "n_name", "c_custkey")
    )
    per_nation = j.groupBy("r_name", "n_name").agg(
        F.expr("hll_sketch_agg(c_custkey)").alias("sketch"),
        F.count_distinct("c_custkey").alias("exact_n"),
    )
    merged = per_nation.groupBy("r_name").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias(
            "approx_customers"
        ),
        F.sum("exact_n").alias("exact_customers"),
    )
    # driver-checkable form: exact side + in-query error bound (oracle emits
    # literal TRUE — hash matches only when the merged sketch lands within
    # SKETCH_REL_ERR of the exact count)
    rel = (
        F.abs(F.col("approx_customers").cast("double") - F.col("exact_customers"))
        / F.col("exact_customers")
    )
    return merged.select(
        "r_name",
        "exact_customers",
        (rel <= 0.05).alias("approx_ok"),
    )


SK_HLL_SQL = """
SELECT r_name,
       count(DISTINCT c_custkey) AS exact_customers,
       TRUE                      AS approx_ok
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- sequential-pattern funnel (view → click → purchase) ---------------------

def ev_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered-funnel analysis over the event stream: per user, the first
    'view', the first 'click' strictly after it, and the first 'purchase'
    strictly after that; aggregated to stage conversion counts plus mean
    view→purchase latency. The match-recognize-style sequential pattern as
    three conditional min-aggregations — each stage is one equi-join on
    user_id + one groupBy (no window over the full stream, no per-user
    explode), so the plan is three bounded shuffles at any event volume."""
    ev = load_table(spark, sf, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.where(F.col("event_type") == "click")
        .join(t1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.first("t1").alias("t1"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.first("t1").alias("t1"))
    )
    return (
        t1.join(t2.select("user_id", F.col("t2").alias("_t2")), "user_id", "left")
        .join(t3.select("user_id", F.col("t3").alias("_t3"), F.col("t1").alias("_t1")), "user_id", "left")
        .agg(
            F.count("t1").alias("n_viewed"),
            F.count("_t2").alias("n_clicked_after"),
            F.count("_t3").alias("n_purchased_after"),
            # Cross-engine-exact mean latency (r14, found by hypothesis): a
            # float avg + round(.,6) lands on an exact half-microsecond
            # whenever sum_us/count hits x.5 (e.g. 28745/2), and there
            # Spark's HALF_UP(shortest-repr) disagrees with binary rounding.
            # Instead: integer µs sum → one exactly-rounded double division
            # → +0.5, floor (all IEEE-identical on both engines) → /1e6.
            (
                F.floor(
                    F.sum(F.col("_t3") - F.col("_t1")).cast("double")
                    / F.nullif(F.count("_t3").cast("double"), F.lit(0.0))
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("avg_view_to_purchase_s"),
        )
    )


EV_FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(t1.t1) AS t1
  FROM events e JOIN t1 ON t1.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3, min(t2.t1) AS t1
  FROM events e JOIN t2 ON t2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
  GROUP BY e.user_id
)
SELECT count(t1.t1)                            AS n_viewed,
       count(t2.t2)                            AS n_clicked_after,
       count(t3.t3)                            AS n_purchased_after,
       CAST(floor(CAST(sum(t3.t3 - t3.t1) AS DOUBLE)
                  / NULLIF(CAST(count(t3.t3) AS DOUBLE), 0) + 0.5) AS BIGINT)
         / CAST(1000000 AS DOUBLE)             AS avg_view_to_purchase_s
FROM t1
LEFT JOIN t2 ON t2.user_id = t1.user_id
LEFT JOIN t3 ON t3.user_id = t1.user_id
"""


# --- time-windowed funnel -----------------------------------------------------

FUNNEL_WINDOW_US = 3 * 86_400_000_000  # each stage must fire within 3 days


def ev_funnel_windowed(spark: SparkSession, sf: str) -> DataFrame:
    """Conversion funnel with a TIME CONSTRAINT: the first click within 3
    days after the first view, then the first purchase within 3 days after
    that click — the product-analytics funnel as actually asked ("converted
    within N days"), vs ev_funnel's unconstrained ordering. Same 100 TB
    shape as ev_funnel: each stage is one equi-join on user_id + one
    groupBy, no full-stream window, no per-user explode.

    Cross-engine determinism: stage timestamps are exact bigint micros; the
    mean latency is an exact integer sum divided once (never avg() over
    accumulated doubles — CLAUDE.md)."""
    ev = load_table(spark, sf, "events").select("user_id", "event_type", "ts")
    W = FUNNEL_WINDOW_US
    t1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.where(F.col("event_type") == "click")
        .join(t1, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + W))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .where((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + W))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t1").alias("t1"))
    )
    joined = t1.join(
        t2.select("user_id", F.col("t2").alias("_t2")), "user_id", "left"
    ).join(
        t3.select("user_id", F.col("t3").alias("_t3"), F.col("t1").alias("_t1")),
        "user_id",
        "left",
    )
    return joined.agg(
        F.count("t1").alias("n_viewed"),
        F.count("_t2").alias("n_clicked_3d"),
        F.count("_t3").alias("n_purchased_3d"),
        # NULLIF guards (r11 degenerate sweep): an empty / viewless events
        # table makes both counts 0 — rates and mean latency are undefined
        # (NULL), never an ANSI DIVIDE_BY_ZERO.
        # Cross-engine-exact rounding to 6 decimals (r14, hypothesis found
        # the boundary in the sibling ev_funnel): round(x, 6) is engine-
        # dependent when x lands on an exact half at the 7th digit (a/b
        # with b | 2e6, or sum_us/count on x.5); instead scale the exact
        # integers, do ONE exactly-rounded double division, +0.5, floor —
        # identical IEEE ops on both engines.
        (
            F.floor(
                F.count("_t2").cast("double") * 1000000.0
                / F.nullif(F.count("t1").cast("double"), F.lit(0.0))
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("click_rate"),
        (
            F.floor(
                F.count("_t3").cast("double") * 1000000.0
                / F.nullif(F.count("t1").cast("double"), F.lit(0.0))
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("purchase_rate"),
        (
            F.floor(
                F.sum(F.col("_t3") - F.col("_t1")).cast("double")
                / F.nullif(F.count("_t3").cast("double"), F.lit(0.0))
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("avg_view_to_purchase_s"),
    )


EV_FUNNEL_WINDOWED_SQL = f"""
WITH t1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(t1.t1) AS t1
  FROM events e JOIN t1 ON t1.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
    AND epoch_us(e.ts) <= t1.t1 + {FUNNEL_WINDOW_US}
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3, min(t2.t1) AS t1
  FROM events e JOIN t2 ON t2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
    AND epoch_us(e.ts) <= t2.t2 + {FUNNEL_WINDOW_US}
  GROUP BY e.user_id
)
SELECT count(t1.t1)                          AS n_viewed,
       count(t2.t2)                          AS n_clicked_3d,
       count(t3.t3)                          AS n_purchased_3d,
       CAST(floor(CAST(count(t2.t2) AS DOUBLE) * CAST(1000000 AS DOUBLE)
                  / NULLIF(CAST(count(t1.t1) AS DOUBLE), 0) + 0.5) AS BIGINT)
         / CAST(1000000 AS DOUBLE)           AS click_rate,
       CAST(floor(CAST(count(t3.t3) AS DOUBLE) * CAST(1000000 AS DOUBLE)
                  / NULLIF(CAST(count(t1.t1) AS DOUBLE), 0) + 0.5) AS BIGINT)
         / CAST(1000000 AS DOUBLE)           AS purchase_rate,
       CAST(floor(CAST(sum(t3.t3 - t3.t1) AS DOUBLE)
                  / NULLIF(CAST(count(t3.t3) AS DOUBLE), 0) + 0.5) AS BIGINT)
         / CAST(1000000 AS DOUBLE)           AS avg_view_to_purchase_s
FROM t1
LEFT JOIN t2 ON t2.user_id = t1.user_id
LEFT JOIN t3 ON t3.user_id = t1.user_id
"""


# --- count-min sketch (mergeable frequency estimation) -----------------------

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_QUERY_USERS = [0, 1, 2, 3, 4]


def cms_positions(ev: DataFrame) -> DataFrame:
    """(j, col) cell-coordinate stream for the count-min sketch — one row
    per event per depth row. Works on batch AND streaming DataFrames: the
    sketch build is `cms_positions(...).groupBy("j","col").count()`, a pure
    incremental streaming aggregation (tests/test_streaming.py proves
    batch == stream across micro-batches)."""
    from orc_spark.functions.hashing import h60

    rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("j")
    return ev.select("user_id", rows).select(
        "j",
        (
            h60(F.concat(F.lit("cms"), F.col("j").cast("string"),
                         F.lit(":"), F.col("user_id").cast("string")))
            % CMS_WIDTH
        ).alias("col"),
    )


def sk_countmin(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min sketch over events.user_id, built as a plain aggregation:
    every event lands in CMS_DEPTH (row, h_row(user) % width) cells; the
    cell table IS the sketch (depth×width counters — mergeable by cell-wise
    sum, the same partial-aggregation contract HLL rides). Point estimates
    for a fixed user set = min over rows of the user's cells; CMS never
    underestimates, so the in-query `never_under` flag is a hard correctness
    signal and the exact count rides along for the error check. The h60 hash
    keeps cells bit-identical across engines, so unlike HLL the WHOLE sketch
    path hash-checks."""
    from orc_spark.functions.hashing import h60

    ev = load_table(spark, sf, "events").select("user_id")
    cells = cms_positions(ev).groupBy("j", "col").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # range+explode, NOT createDataFrame: parallelize spreads the 5-row
    # probe set over the default parallelism (32 partitions → 32 near-empty
    # tasks in every downstream probe stage), and coalesce(1) on it
    # measured WORSE (2.8 s → 6.5 s — the coalesced parallelize stage
    # serializes oddly); a single-partition range stays codegen and keeps
    # every probe stage at 1 task (r11 statusTracker decomposition,
    # 6 jobs → 5, best time 2.8 s → 1.3 s)
    q_users = (
        spark.range(0, 1, 1, 1)
        .select(
            F.explode(
                F.array(*[F.lit(u) for u in CMS_QUERY_USERS])
            ).alias("u")
        )
        .select(F.col("u").cast("bigint").alias("user_id"))
    )
    probes = q_users.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("j")
    ).select(
        "user_id",
        "j",
        (
            h60(F.concat(F.lit("cms"), F.col("j").cast("string"),
                         F.lit(":"), F.col("user_id").cast("string")))
            % CMS_WIDTH
        ).alias("col"),
    )
    est = (
        probes.join(cells, ["j", "col"], "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
    # exact counts only for the PROBED users: the isin filter pushes down
    # to the parquet scan, so the shuffle carries ~|probe set| rows instead
    # of |all users| (r11 statusTracker decomposition: the unfiltered
    # groupBy was the query's only 32-task shuffle pair — at 100 TB it
    # would shuffle every user's count to answer 5 lookups)
    true_n = (
        ev.where(F.col("user_id").isin(CMS_QUERY_USERS))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    return (
        est.join(true_n, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("true_n", F.lit(0)).alias("true_n"),
            "cms_est",
            (F.col("cms_est") >= F.coalesce("true_n", F.lit(0))).alias(
                "never_under"
            ),
        )
    )


def _cms_sql() -> str:
    from orc_spark.functions.hashing import h60_sql, xor_digest

    h = h60_sql("'cms' || j || ':' || user_id")
    users = ", ".join(f"({u})" for u in CMS_QUERY_USERS)
    return f"""
WITH cells AS (
  SELECT j, {h} % {CMS_WIDTH} AS col, count(*) AS cnt
  FROM events, (SELECT unnest(range(0, {CMS_DEPTH})) AS j)
  GROUP BY 1, 2
),
qu(user_id) AS (VALUES {users}),
probes AS (
  SELECT user_id, j, {h} % {CMS_WIDTH} AS col
  FROM qu, (SELECT unnest(range(0, {CMS_DEPTH})) AS j)
),
est AS (
  SELECT p.user_id,
         CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
  FROM probes p LEFT JOIN cells c ON c.j = p.j AND c.col = p.col
  GROUP BY p.user_id
),
tn AS (SELECT user_id, count(*) AS true_n FROM events GROUP BY user_id)
SELECT e.user_id,
       CAST(coalesce(tn.true_n, 0) AS BIGINT) AS true_n,
       e.cms_est,
       e.cms_est >= coalesce(tn.true_n, 0) AS never_under
FROM est e LEFT JOIN tn ON tn.user_id = e.user_id
"""


# --- Bloom filter (mergeable set-membership sketch) --------------------------

BLOOM_BITS = 512
BLOOM_K = 4
# negative ids never occur in events → guaranteed-absent probes exercise the
# false-positive side; 0..4 are guaranteed-present at every sf
BLOOM_PROBES = [0, 1, 2, 3, 4, -1, -2, -3, -4, -5]


def bloom_positions(df: DataFrame, id_col: str = "user_id") -> DataFrame:
    """(id, j, pos) set-bit stream for the Bloom filter — one row per input
    row per hash function. Batch AND streaming: the filter build is
    `bloom_positions(...).groupBy("j","pos").count()` (membership = the
    key exists), an incremental streaming aggregation."""
    from orc_spark.functions.hashing import h60

    js = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("j")
    return df.select(id_col, js).select(
        id_col,
        "j",
        (
            h60(F.concat(F.lit("bloom"), F.col("j").cast("string"),
                         F.lit(":"), F.col(id_col).cast("string")))
            % BLOOM_BITS
        ).alias("pos"),
    )


def sk_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter membership sketch over events.user_id, built as a plain
    aggregation: each id sets BLOOM_K of BLOOM_BITS positions (the distinct
    (j, pos) table IS the sketch — mergeable by union, the same partial-agg
    contract HLL and CMS ride; at 100 TB each partition contributes its set
    bits and the union is the merged filter). Probes: a fixed id set, half
    guaranteed present, half guaranteed absent; membership = all K positions
    set. Bloom filters have NO false negatives, so `no_false_negative` is a
    hard correctness signal per row, and the h60 positions make the whole
    sketch bit-identical cross-engine — like sk_countmin, the entire build
    path hash-checks, including any false positives (deterministic given
    the hash family)."""
    ev = load_table(spark, sf, "events").select("user_id")
    bits = (
        bloom_positions(ev).select("j", "pos").distinct()
        .withColumn("hit", F.lit(1))
    )
    probes = bloom_positions(
        spark.createDataFrame([(u,) for u in BLOOM_PROBES], "probe_id bigint"),
        id_col="probe_id",
    )
    member = (
        probes.join(F.broadcast(bits), ["j", "pos"], "left")
        .groupBy("probe_id")
        .agg((F.count("hit") == BLOOM_K).alias("bloom_member"))
    )
    present = (
        ev.where(F.col("user_id").isin(BLOOM_PROBES))
        .select(F.col("user_id").alias("probe_id"))
        .distinct()
        .withColumn("in_set", F.lit(True))
    )
    return (
        member.join(present, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("in_set", F.lit(False)).alias("in_set"),
            "bloom_member",
            (F.col("bloom_member") | ~F.coalesce("in_set", F.lit(False))).alias(
                "no_false_negative"
            ),
        )
    )


def _bloom_sql() -> str:
    from orc_spark.functions.hashing import h60_sql, xor_digest

    probes = ", ".join(f"({u})" for u in BLOOM_PROBES)
    h_build = h60_sql("'bloom' || j || ':' || user_id")
    h_probe = h60_sql("'bloom' || j || ':' || probe_id")
    return f"""
WITH bits AS (
  SELECT DISTINCT j, {h_build} % {BLOOM_BITS} AS pos
  FROM events, (SELECT unnest(range(0, {BLOOM_K})) AS j)
),
pr(probe_id) AS (VALUES {probes}),
probe_pos AS (
  SELECT probe_id, j, {h_probe} % {BLOOM_BITS} AS pos
  FROM pr, (SELECT unnest(range(0, {BLOOM_K})) AS j)
),
member AS (
  SELECT p.probe_id,
         count(b.pos) = {BLOOM_K} AS bloom_member
  FROM probe_pos p LEFT JOIN bits b ON b.j = p.j AND b.pos = p.pos
  GROUP BY p.probe_id
),
present AS (
  SELECT DISTINCT user_id AS probe_id, TRUE AS in_set
  FROM events WHERE user_id IN (SELECT probe_id FROM pr)
)
SELECT m.probe_id,
       coalesce(p.in_set, FALSE) AS in_set,
       m.bloom_member,
       m.bloom_member OR NOT coalesce(p.in_set, FALSE) AS no_false_negative
FROM member m LEFT JOIN present p ON p.probe_id = m.probe_id
"""


# --- cohort retention matrix -------------------------------------------------

_WEEK_US = 7 * 86400 * 1000000


def ev_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week; for each (cohort
    week, weeks-since-first-seen) cell, how many of the cohort's users were
    active. Exactly TWO shuffles at any event volume: ``min(ts) over
    (partition by user_id)`` computes the cohort anchor in the same exchange
    that co-locates each user's events (no agg+join-back), and the per-user
    dedup reuses that partitioning (HashPartitioning(user_id) satisfies
    clustering on (user_id, cohort, age)), so only the final tiny
    cohort×age roll-up shuffles again. Output is bounded by |weeks|²."""
    ev = load_table(spark, sf, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    return (
        ev.withColumn("t0", F.min("ts").over(w))
        .select(
            "user_id",
            (F.col("t0") / _WEEK_US).cast("bigint").alias("cohort_week"),
            ((F.col("ts") - F.col("t0")) / _WEEK_US).cast("bigint").alias(
                "age_week"
            ),
        )
        .dropDuplicates(["user_id", "cohort_week", "age_week"])
        .groupBy("cohort_week", "age_week")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


EV_RETENTION_SQL = f"""
WITH first AS (
  SELECT user_id, min(epoch_us(ts)) AS t0 FROM events GROUP BY user_id
),
cells AS (
  SELECT DISTINCT e.user_id,
         CAST(floor(f.t0 / {_WEEK_US}.0) AS BIGINT) AS cohort_week,
         CAST(floor((epoch_us(e.ts) - f.t0) / {_WEEK_US}.0) AS BIGINT)
           AS age_week
  FROM events e JOIN first f ON f.user_id = e.user_id
)
SELECT cohort_week, age_week, count(*) AS n_active_users
FROM cells GROUP BY cohort_week, age_week
"""



# --- histogram quantile sketch (mergeable approximate percentiles) ----------

HISTQ_BINS = 128


def sk_histq(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable histogram quantile sketch over l_extendedprice: one pass
    for (min, max, count), one combinable groupBy over the 128 fixed-width
    bin counts, then p50/p95/p99 by linear interpolation inside the target
    bin. Bin counts are integers (exact, order-independent, sum-mergeable —
    the distributed-sketch property: shards build partial histograms and a
    reduce adds them); every float step is the identical expression on both
    engines, so the estimates and the full bin-table xor digest hash-check.
    At 100 TB: two scans (or one with a pre-known domain), no wide rows,
    no driver collection.

    Measured job floor at sf0.1 (r11 statusTracker decomposition): 5 job
    rounds = stats scan + stats finalize + binned scan/partial + binned
    finalize + (window cum ∪ final agg, AQE-fused). The two scans are
    inherent to fixed-width binning (the bin function needs the global
    range first); the rest are one exchange each — ~5 × the ~0.15 s
    local[32] AQE job floor of residual tiny-data latency, amortizing at
    scale."""
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    stats = li.agg(
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.count(F.lit(1)).alias("total"),
    )
    binned = (
        li.crossJoin(F.broadcast(stats))
        .select(
            # mx == mn guard (r11 degenerate sweep): a constant column has
            # zero range — every row lands in bin 0 (NULLIF -> NULL ->
            # coalesce), instead of an ANSI DIVIDE_BY_ZERO. width is then 0
            # so all three quantile estimates collapse to mn, correctly.
            F.coalesce(
                F.least(
                    F.floor(
                        (F.col("x") - F.col("mn"))
                        / F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))
                        * HISTQ_BINS
                    ),
                    F.lit(HISTQ_BINS - 1),
                ),
                F.lit(0),
            ).cast("int").alias("bin"),
            "mn", "mx", "total",
        )
        .groupBy("bin", "mn", "mx", "total")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.select(
        "bin", "mn", "mx", "total", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    width = (F.col("mx") - F.col("mn")) / HISTQ_BINS

    def est(q: float):
        rank = F.lit(q) * F.col("total").cast("double")
        in_bin = ((F.col("cum") - F.col("cnt")).cast("double") < rank) & (
            rank <= F.col("cum").cast("double")
        )
        interp = F.col("mn") + width * (
            F.col("bin").cast("double")
            + (rank - (F.col("cum") - F.col("cnt")).cast("double"))
            / F.col("cnt").cast("double")
        )
        return F.sum(F.when(in_bin, interp))

    return cum.groupBy("total", "mn", "mx").agg(
        F.count(F.lit(1)).cast("int").alias("n_bins_used"),
        xor_digest("bin", "cnt").alias("bins_digest"),
        F.round(est(0.5), 6).alias("p50_est"),
        F.round(est(0.95), 6).alias("p95_est"),
        F.round(est(0.99), 6).alias("p99_est"),
    ).select(
        "total", F.round("mn", 6).alias("x_min"), F.round("mx", 6).alias("x_max"),
        "n_bins_used", "bins_digest", "p50_est", "p95_est", "p99_est",
    )


SK_HISTQ_SQL = f"""
WITH li AS (SELECT l_extendedprice AS x FROM lineitem),
stats AS (SELECT min(x) AS mn, max(x) AS mx, CAST(count(*) AS BIGINT) AS total FROM li),
binned AS (
  SELECT CAST(coalesce(least(floor((x - mn) / NULLIF(mx - mn, 0) * {HISTQ_BINS}),
                    {HISTQ_BINS - 1}), 0) AS INTEGER) AS bin,
         mn, mx, total, CAST(count(*) AS BIGINT) AS cnt
  FROM li, stats
  GROUP BY 1, 2, 3, 4
),
cum AS (
  SELECT bin, mn, mx, total, cnt,
         CAST(sum(cnt) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM binned
)
SELECT total,
       round(mn, 6) AS x_min,
       round(mx, 6) AS x_max,
       CAST(count(*) AS INTEGER) AS n_bins_used,
       CAST(bit_xor({h60_sql("concat_ws(':', bin, cnt)")}) AS BIGINT) AS bins_digest,
       round(sum(CASE WHEN CAST(cum - cnt AS DOUBLE) < 0.5 * CAST(total AS DOUBLE)
                       AND 0.5 * CAST(total AS DOUBLE) <= CAST(cum AS DOUBLE)
                      THEN mn + (mx - mn) / {HISTQ_BINS} * (CAST(bin AS DOUBLE)
                           + (0.5 * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
                             / CAST(cnt AS DOUBLE)) END), 6) AS p50_est,
       round(sum(CASE WHEN CAST(cum - cnt AS DOUBLE) < 0.95 * CAST(total AS DOUBLE)
                       AND 0.95 * CAST(total AS DOUBLE) <= CAST(cum AS DOUBLE)
                      THEN mn + (mx - mn) / {HISTQ_BINS} * (CAST(bin AS DOUBLE)
                           + (0.95 * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
                             / CAST(cnt AS DOUBLE)) END), 6) AS p95_est,
       round(sum(CASE WHEN CAST(cum - cnt AS DOUBLE) < 0.99 * CAST(total AS DOUBLE)
                       AND 0.99 * CAST(total AS DOUBLE) <= CAST(cum AS DOUBLE)
                      THEN mn + (mx - mn) / {HISTQ_BINS} * (CAST(bin AS DOUBLE)
                           + (0.99 * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
                             / CAST(cnt AS DOUBLE)) END), 6) AS p99_est
FROM cum GROUP BY total, mn, mx
"""


# --- KMV (k-minimum-values) distinct-count sketch ----------------------------

KMV_K = 32


def sk_kmv(spark: SparkSession, sf: str) -> DataFrame:
    """KMV distinct-count sketch: per event_type, the K smallest 60-bit
    hashes of user_id; estimate = (K−1)·2^60 / h_(K). The third mergeable
    cardinality sketch next to HLL (engine-native, rows-only bits) and
    Bloom (membership): KMV's state is plain integers, so unlike HLL the
    ENTIRE sketch hash-checks cross-engine — k-th min, an xor digest of
    every retained hash, and the estimate.

    The ALL row is built by MERGING the per-type sketches (k smallest
    distinct values of the union of retained sets) and the merge_ok flag
    compares that against the sketch built directly from the full stream —
    exactness of KMV union-merge, asserted in-query on both engines.

    100 TB shape: one distinct + one bounded top-K window per group; merge
    touches only |groups|·K retained values, never the raw stream — the
    partial-aggregation contract sketches exist for."""
    from orc_spark.functions.hashing import h60

    ev = load_table(spark, sf, "events")
    # one distinct pass over the stream feeds the sketch build, the
    # per-type exact counts AND the direct verification sketch —
    # materialized so events is scanned exactly once
    pairs = (
        ev.select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # distinct AFTER hashing too: the oracle's du is DISTINCT (type, h), so
    # a 60-bit collision between two user_ids of one type must collapse on
    # the Spark side as well (review finding — latent cross-engine skew)
    du = (
        pairs.select(
            "event_type",
            h60(
                F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
            ).alias("h"),
        )
        .distinct()
    )
    win = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    kept = (
        du.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= KMV_K)
        .select("event_type", "h")
        .localCheckpoint(eager=False)
    )
    exact = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    est = F.when(
        F.col("n_kept") < KMV_K, F.col("exact_distinct").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(KMV_K - 1))
            * (F.lit(float(1 << 60)) / F.col("kth_min").cast("double")),
            0,
        )
    )
    per_type = (
        kept.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth_min"),
            F.bit_xor("h").alias("kmv_digest"),
        )
        .join(exact, "event_type")
        .select(
            "event_type",
            "kth_min",
            "kmv_digest",
            est.cast("bigint").alias("est_distinct"),
            "exact_distinct",
            F.lit(True).alias("merge_ok"),
        )
    )
    # merged ALL sketch: k smallest distinct values across the retained
    # sets. orderBy().limit(K) plans as TakeOrderedAndProject — no
    # single-partition exchange + sort the old global row_number window
    # paid (h is distinct here, so "rows with rn <= K" == "the K smallest
    # values" exactly)
    merged = (
        kept.select("h")
        .distinct()
        .orderBy(F.col("h").asc())
        .limit(KMV_K)
        .agg(F.max("h").alias("m_kth"), F.bit_xor("h").alias("m_digest"))
    )
    # the direct-from-stream sketch exists to PROVE merge exactness; its
    # global ranking is bounded by a 1-row broadcast (every global top-K
    # value is ≤ its own type's k-th min ≤ this max), so no full sort of
    # the distinct-user set ever happens
    bound = kept.agg(F.max("h").alias("hmax"))
    direct = (
        du.select("h")
        .distinct()
        .crossJoin(F.broadcast(bound))
        .where(F.col("h") <= F.col("hmax"))
        .orderBy(F.col("h").asc())
        .limit(KMV_K)
        .agg(F.max("h").alias("d_kth"), F.bit_xor("h").alias("d_digest"))
    )
    all_exact = pairs.agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    all_est = F.round(
        F.lit(float(KMV_K - 1)) * (F.lit(float(1 << 60)) / F.col("d_kth").cast("double")),
        0,
    )
    all_row = (
        merged.crossJoin(direct)
        .crossJoin(all_exact)
        .select(
            F.lit("ALL").alias("event_type"),
            F.col("d_kth").alias("kth_min"),
            F.col("d_digest").alias("kmv_digest"),
            all_est.cast("bigint").alias("est_distinct"),
            "exact_distinct",
            (
                (F.col("m_kth") == F.col("d_kth"))
                & (F.col("m_digest") == F.col("d_digest"))
            ).alias("merge_ok"),
        )
    )
    # tiny presentation sort (≤ |event_types|+1 rows): fuse into the final
    # coalesced partition instead of paying a range-partitioning job round
    # (CLAUDE.md dq_referential pattern)
    return (
        per_type.unionByName(all_row)
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


def _kmv_sql() -> str:
    h = h60_sql("'kmv:' || user_id")
    two60 = float(1 << 60)
    k1 = float(KMV_K - 1)
    return f"""
WITH du AS (
  SELECT DISTINCT event_type, {h} AS h
  FROM (SELECT DISTINCT event_type, user_id FROM events)
),
kept AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
    FROM du
  ) WHERE rn <= {KMV_K}
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
),
per_type AS (
  SELECT k.event_type,
         max(h) AS kth_min,
         CAST(bit_xor(h) AS BIGINT) AS kmv_digest,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept k GROUP BY k.event_type
),
merged AS (
  SELECT max(h) AS m_kth, CAST(bit_xor(h) AS BIGINT) AS m_digest FROM (
    SELECT h, row_number() OVER (ORDER BY h ASC) AS rn
    FROM (SELECT DISTINCT h FROM kept)
  ) WHERE rn <= {KMV_K}
),
direct AS (
  SELECT max(h) AS d_kth, CAST(bit_xor(h) AS BIGINT) AS d_digest FROM (
    SELECT h, row_number() OVER (ORDER BY h ASC) AS rn
    FROM (SELECT DISTINCT h FROM du
          WHERE h <= (SELECT max(h) FROM kept))
  ) WHERE rn <= {KMV_K}
)
SELECT p.event_type, p.kth_min, p.kmv_digest,
       CAST(CASE WHEN p.n_kept < {KMV_K} THEN CAST(e.exact_distinct AS DOUBLE)
                 ELSE round(CAST({k1!r} AS DOUBLE)
                            * (CAST({two60!r} AS DOUBLE)
                               / CAST(p.kth_min AS DOUBLE)), 0)
            END AS BIGINT) AS est_distinct,
       e.exact_distinct, TRUE AS merge_ok
FROM per_type p JOIN exact e ON p.event_type = e.event_type
UNION ALL
SELECT 'ALL', d.d_kth, d.d_digest,
       CAST(round(CAST({k1!r} AS DOUBLE)
                  * (CAST({two60!r} AS DOUBLE) / CAST(d.d_kth AS DOUBLE)), 0)
            AS BIGINT),
       (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events),
       (m.m_kth = d.d_kth AND m.m_digest = d.d_digest)
FROM direct d, merged m
ORDER BY event_type
"""


# --- theta-sketch set operations ----------------------------------------------

THETA_K = 64


def sk_theta_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Theta-sketch SET OPERATIONS between every pair of event-type
    audiences: estimated |A∪B|, |A∩B| and |A\\B| from K-smallest-hash
    sketches, with the exact counts alongside. This is the capability KMV
    cardinality alone lacks (audience overlap without re-scanning raw
    streams) — the DataSketches theta algebra: theta_p = min(theta_a,
    theta_b); retained hashes below theta_p from either sketch estimate
    each op as count · 2^60 / theta_p (simplified fixed-theta union — no
    re-capping at K — declared as this engine's semantics and mirrored
    exactly in the oracle). Unsaturated sketches (|set| < K) have theta =
    2^60, so their estimates are exact by construction.

    100 TB shape: sketches are per-type top-K windows over a single
    distinct pass (mergeable partial aggregates); all pairwise algebra
    runs on |types|·K retained rows — broadcast-sized by construction —
    and never touches the raw stream again. The exact columns are one
    distinct self-join, only present to make the estimator hash-checkable
    and error-visible."""
    from orc_spark.functions.hashing import h60

    TWO60 = float(1 << 60)
    ev = load_table(spark, sf, "events")
    pairs_du = (
        ev.select("event_type", "user_id").distinct().localCheckpoint(eager=False)
    )
    du = pairs_du.select(
        "event_type",
        h60(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))).alias("h"),
    ).distinct()
    win = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    kept = (
        du.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= THETA_K)
        .select("event_type", "h")
        .localCheckpoint(eager=False)
    )
    sk = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth")
    )
    sk = sk.select(
        "event_type",
        F.when(F.col("n_kept") < THETA_K, F.lit(int(1 << 60)))
        .otherwise(F.col("kth"))
        .alias("theta"),
    )
    pr = (
        sk.select(F.col("event_type").alias("ta"), F.col("theta").alias("theta_a"))
        .join(
            sk.select(
                F.col("event_type").alias("tb"), F.col("theta").alias("theta_b")
            ),
            F.col("ta") < F.col("tb"),
        )
        .select("ta", "tb", F.least("theta_a", "theta_b").alias("theta_p"))
        .localCheckpoint(eager=False)
    )
    ka = kept.select(F.col("event_type").alias("ta"), "h")
    kb = kept.select(F.col("event_type").alias("tb"), F.col("h").alias("hb"))
    ca = (
        ka.join(pr, "ta")
        .where(F.col("h") < F.col("theta_p"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    cb = (
        kb.join(pr, "tb")
        .where(F.col("hb") < F.col("theta_p"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    ci = (
        ka.join(kb, ka.h == kb.hb)
        .join(pr, ["ta", "tb"])
        .where(F.col("h") < F.col("theta_p"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("ci"))
    )
    da = pairs_du.select(F.col("event_type").alias("ta"), "user_id")
    db = pairs_du.select(F.col("event_type").alias("tb"), "user_id")
    ex_i = (
        da.join(db, "user_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    nd = pairs_du.groupBy("event_type").agg(F.count(F.lit(1)).alias("nd"))
    est = lambda c: F.round(  # noqa: E731
        c.cast("double") * (F.lit(TWO60) / F.col("theta_p").cast("double")), 3
    )
    # ca/cb left-joined like ci/exact_inter: a sketch can retain ZERO hashes
    # below theta_p under skewed hash distributions, and the audit row must
    # then show a zero estimate rather than silently vanish from the output
    out = (
        pr.join(ca, ["ta", "tb"], "left")
        .join(cb, ["ta", "tb"], "left")
        .join(ci, ["ta", "tb"], "left")
        .join(ex_i, ["ta", "tb"], "left")
        .join(nd.select(F.col("event_type").alias("ta"), F.col("nd").alias("na")), "ta")
        .join(nd.select(F.col("event_type").alias("tb"), F.col("nd").alias("nb")), "tb")
        .na.fill({"ca": 0, "cb": 0, "ci": 0, "exact_inter": 0})
    )
    return out.select(
        "ta",
        "tb",
        "theta_p",
        est(F.col("ca") + F.col("cb") - F.col("ci")).alias("est_union"),
        est(F.col("ci")).alias("est_inter"),
        est(F.col("ca") - F.col("ci")).alias("est_diff_ab"),
        (F.col("na") + F.col("nb") - F.col("exact_inter")).alias("exact_union"),
        F.col("exact_inter"),
        (F.col("na") - F.col("exact_inter")).alias("exact_diff_ab"),
    ).coalesce(1).sortWithinPartitions("ta", "tb")


def _theta_sql() -> str:
    h = h60_sql("'kmv:' || user_id")
    two60 = float(1 << 60)
    return f"""
WITH pdu AS (
  SELECT DISTINCT event_type, user_id FROM events
),
du AS (
  SELECT DISTINCT event_type, {h} AS h FROM pdu
),
kept AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
    FROM du
  ) WHERE rn <= {THETA_K}
),
sk AS (
  SELECT event_type,
         CASE WHEN count(*) < {THETA_K} THEN CAST({1 << 60} AS BIGINT)
              ELSE max(h) END AS theta
  FROM kept GROUP BY event_type
),
pr AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         least(a.theta, b.theta) AS theta_p
  FROM sk a JOIN sk b ON a.event_type < b.event_type
),
ca AS (
  SELECT p.ta, p.tb, CAST(count(*) AS BIGINT) AS ca
  FROM pr p JOIN kept k ON k.event_type = p.ta AND k.h < p.theta_p
  GROUP BY p.ta, p.tb
),
cb AS (
  SELECT p.ta, p.tb, CAST(count(*) AS BIGINT) AS cb
  FROM pr p JOIN kept k ON k.event_type = p.tb AND k.h < p.theta_p
  GROUP BY p.ta, p.tb
),
ci AS (
  SELECT p.ta, p.tb, CAST(count(*) AS BIGINT) AS ci
  FROM pr p
  JOIN kept x ON x.event_type = p.ta
  JOIN kept y ON y.event_type = p.tb AND y.h = x.h
  WHERE x.h < p.theta_p
  GROUP BY p.ta, p.tb
),
ex_i AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(count(*) AS BIGINT) AS exact_inter
  FROM pdu a JOIN pdu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
),
nd AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nd FROM pdu GROUP BY event_type
)
SELECT p.ta AS ta, p.tb AS tb, p.theta_p AS theta_p,
       round(CAST(COALESCE(a.ca, 0) + COALESCE(b.cb, 0) - COALESCE(i.ci, 0) AS DOUBLE)
             * (CAST({two60!r} AS DOUBLE) / CAST(p.theta_p AS DOUBLE)), 3)
         AS est_union,
       round(CAST(COALESCE(i.ci, 0) AS DOUBLE)
             * (CAST({two60!r} AS DOUBLE) / CAST(p.theta_p AS DOUBLE)), 3)
         AS est_inter,
       round(CAST(COALESCE(a.ca, 0) - COALESCE(i.ci, 0) AS DOUBLE)
             * (CAST({two60!r} AS DOUBLE) / CAST(p.theta_p AS DOUBLE)), 3)
         AS est_diff_ab,
       na.nd + nb.nd - COALESCE(e.exact_inter, 0) AS exact_union,
       COALESCE(e.exact_inter, 0) AS exact_inter,
       na.nd - COALESCE(e.exact_inter, 0) AS exact_diff_ab
FROM pr p
LEFT JOIN ca a ON a.ta = p.ta AND a.tb = p.tb
LEFT JOIN cb b ON b.ta = p.ta AND b.tb = p.tb
LEFT JOIN ci i ON i.ta = p.ta AND i.tb = p.tb
LEFT JOIN ex_i e ON e.ta = p.ta AND e.tb = p.tb
JOIN nd na ON na.event_type = p.ta
JOIN nd nb ON nb.event_type = p.tb
ORDER BY p.ta, p.tb
"""


QUERIES = [
    Query("r9_scalar_subquery", r9_scalar_subquery, R9_SQL, "correlated scalar subquery, decorrelated (TPC-H Q17 shape)"),
    Query("ev_funnel", ev_funnel, EV_FUNNEL_SQL, "sequential-pattern funnel (view → click → purchase) with stage latencies"),
    Query("ev_funnel_windowed", ev_funnel_windowed, EV_FUNNEL_WINDOWED_SQL, "time-constrained funnel: each stage within 3 days, integer-exact latencies"),
    Query("ev_retention", ev_retention, EV_RETENTION_SQL, "cohort retention matrix (first-seen week × weeks active)"),
    Query("r10_outer_hist", r10_outer_hist, R10_SQL, "left outer join + count histogram (TPC-H Q13 shape)"),
    Query("r11_stats_agg", r11_stats_agg, R11_SQL, "stddev/percentile/corr/covar/regression battery"),
    Query("r12_unpivot", r12_unpivot, R12_SQL, "unpivot wide aggregates to long form"),
    Query("dp_sample", dp_sample, DP_SAMPLE_SQL, "deterministic hash-bucket 1% sample + stats"),
    Query("dp_stratified", dp_stratified, DP_STRATIFIED_SQL, "per-language deterministic stratified sampling"),
    Query("sk_hll_merge", sk_hll_merge, SK_HLL_SQL, "mergeable HLL sketches, exact side + error-bound boolean hash-checked"),
    Query("sk_countmin", sk_countmin, _cms_sql(), "count-min sketch build + point estimates, fully hash-checked"),
    Query("sk_bloom", sk_bloom, _bloom_sql(), "Bloom membership sketch + probe battery, fully hash-checked (no-false-negative guarantee asserted per row)"),
    Query("sk_histq", sk_histq, SK_HISTQ_SQL, "mergeable 128-bin histogram quantile sketch, fully hash-checked"),
    Query("sk_kmv", sk_kmv, _kmv_sql(), "KMV distinct sketch + exact union-merge proof, fully hash-checked"),
    Query("sk_theta_ops", sk_theta_ops, _theta_sql(), "theta-sketch union/intersection/difference estimates between audience pairs, exact side attached"),
]
