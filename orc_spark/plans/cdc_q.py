"""Changelog / event-stream operator pack: SCD2 change-data-capture merge,
marketing-style last-touch attribution, and rolling anomaly detection.

Reference analog: the engine's state-over-a-stream operators (SURVEY §2.A
O9/O12 lineage — per-key ordered state) re-expressed as declarative window
plans over the relational tables.

100 TB shape: every query here is exactly one shuffle — a window (or
groupBy) partitioned by the natural key (o_custkey / user_id) — with all
per-row math in whole-stage codegen. No iterative driver loops, no Python.

Cross-engine determinism: all accumulations that feed comparisons are done
in fixed-point BIGINT (cents, 1e-4 value units), so sums are
order-independent and bit-exact in both engines; the only float ops are
final single-expression projections computed identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orc_spark.plans import Query
from orc_spark.sources.tables import load_table, table_rowcount

# --- SCD2 / CDC merge over the orders changelog ------------------------------

def cdc_scd2(spark: SparkSession, sf: str) -> DataFrame:
    """Treat each customer's orders as a change-data-capture stream and
    build the slowly-changing-dimension (type 2) history: one row per
    version with [valid_from, valid_to) interval, current-row flag, and the
    running account state (cumulative spend in integer cents — exact).
    This is the MERGE INTO / CDC-upsert shape: at 100 TB it is one window
    shuffle by o_custkey; Spark's AQE handles skewed customers."""
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vf = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("int").alias("version"),
        vf.alias("valid_from_ms"),
        F.lead(vf).over(w).alias("valid_to_ms"),
        F.when(F.lead(vf).over(w).isNull(), 1).otherwise(0).alias("is_current"),
        cents.alias("order_cents"),
        F.sum(cents).over(cum).alias("cum_spend_cents"),
    )


CDC_SCD2_SQL = """
SELECT o_custkey,
       o_orderkey,
       CAST(row_number() OVER w AS INTEGER) AS version,
       epoch_ms(o_orderdate)                AS valid_from_ms,
       lead(epoch_ms(o_orderdate)) OVER w   AS valid_to_ms,
       CASE WHEN lead(epoch_ms(o_orderdate)) OVER w IS NULL
            THEN 1 ELSE 0 END               AS is_current,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS order_cents,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT)                      AS cum_spend_cents
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --- point-in-time (AS OF) lookup against the SCD2 history -------------------

def cdc_pit_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal AS-OF lookup: for a deterministic probe set of shipments
    (1/97th of lineitem, filter pushed to the scan), attach the customer's
    SCD2 version (cdc_scd2's [valid_from, valid_to) intervals) that was
    valid AT ship time — the point-in-time dimension join every versioned
    warehouse needs for "state as of the transaction". The join is
    equi-keyed on custkey with the interval test as a join filter, so no
    cartesian/nested-loop appears; intervals partition the timeline, so
    exactly one version matches each probe.

    aj_asof_join is the event-stream cousin (nearest earlier tick); this
    is the versioned-dimension form with explicit validity intervals."""
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vf = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    hist = orders.select(
        F.col("o_custkey").alias("h_custkey"),
        F.row_number().over(w).cast("int").alias("version"),
        vf.alias("valid_from_ms"),
        F.lead(vf).over(w).alias("valid_to_ms"),
        F.sum(cents).over(cum).alias("cum_spend_cents"),
    )
    probes = (
        li.where(F.col("l_orderkey") % 97 == 0)
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_custkey",
            F.unix_millis(F.col("l_shipdate").cast("timestamp")).alias(
                "ship_ms"
            ),
        )
    )
    return (
        probes.join(
            hist,
            (probes.o_custkey == hist.h_custkey)
            & (F.col("valid_from_ms") <= F.col("ship_ms"))
            & (
                F.col("valid_to_ms").isNull()
                | (F.col("ship_ms") < F.col("valid_to_ms"))
            ),
        )
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("int").alias("l_linenumber"),
            F.col("o_custkey").alias("custkey"),
            "ship_ms",
            "version",
            "cum_spend_cents",
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


CDC_PIT_SQL = """
WITH hist AS (
  SELECT o_custkey AS h_custkey,
         CAST(row_number() OVER w AS INTEGER) AS version,
         epoch_ms(o_orderdate) AS valid_from_ms,
         lead(epoch_ms(o_orderdate)) OVER w AS valid_to_ms,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_spend_cents
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
probes AS (
  SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
         o_custkey, epoch_ms(l_shipdate) AS ship_ms
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_orderkey % 97 = 0
)
SELECT l_orderkey, l_linenumber, o_custkey AS custkey, ship_ms,
       version, cum_spend_cents
FROM probes JOIN hist
  ON o_custkey = h_custkey
 AND valid_from_ms <= ship_ms
 AND (valid_to_ms IS NULL OR ship_ms < valid_to_ms)
ORDER BY l_orderkey, l_linenumber
"""


# --- last-touch attribution --------------------------------------------------

ATTR_WINDOW_US = 7 * 86400 * 1000000  # 7 days in epoch micros


def ev_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most recent
    view/click by the same user, if that touch happened within a 7-day
    window (the staleness test is pure integer micros — exact). One window
    by user_id over the filtered event stream; the running "last touch" is
    last_value(IGNORE NULLS), which streams in a single pass."""
    ev = (
        load_table(spark, sf, "events")
        .where(F.col("event_type").isin("view", "click", "purchase"))
        .select("event_id", "user_id", "event_type", "ts", "value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col("event_type") != "purchase"
    touch_id = F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True).over(w)
    touch_ts = F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w)
    touch_type = F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w)
    fresh = (F.col("ts") - F.col("_tts")) <= F.lit(ATTR_WINDOW_US)
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            "value",
            touch_id.alias("_tid"),
            touch_ts.alias("_tts"),
            touch_type.alias("_tty"),
        )
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("purchase_value"),
            F.when(fresh, F.col("_tid")).alias("touch_event_id"),
            F.when(fresh, F.col("_tty")).alias("touch_type"),
            F.when(fresh, (F.col("ts") - F.col("_tts")) / F.lit(1000000.0))
            .alias("latency_s_raw"),
        )
        .select(
            "event_id",
            "user_id",
            "purchase_value",
            "touch_event_id",
            "touch_type",
            F.round("latency_s_raw", 6).alias("touch_latency_s"),
        )
    )


EV_ATTRIBUTION_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts, value
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
tagged AS (
  SELECT event_id, user_id, event_type, ts, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_id END
                    IGNORE NULLS) OVER w AS tid,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                    IGNORE NULLS) OVER w AS tts,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS tty
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       round(value, 6) AS purchase_value,
       CASE WHEN ts - tts <= {ATTR_WINDOW_US} THEN tid END AS touch_event_id,
       CASE WHEN ts - tts <= {ATTR_WINDOW_US} THEN tty END AS touch_type,
       round(CASE WHEN ts - tts <= {ATTR_WINDOW_US}
                  THEN (ts - tts) / CAST(1000000 AS DOUBLE) END, 6)
         AS touch_latency_s
FROM tagged WHERE event_type = 'purchase'
"""


# --- rolling z-score anomaly detection ---------------------------------------

ANOM_LOOKBACK = 20   # trailing window size (rows), excluding the current row
ANOM_MIN_N = 10      # minimum trailing samples before scoring
ANOM_SCALE = 10000   # fixed-point scale for exact integer moments
ANOM_Z = 3.0


def ev_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling z-score anomaly detection over each user's event values:
    score each event against the mean/stddev of its trailing 20 events.
    The moments are accumulated in fixed-point BIGINT (value × 1e4), so the
    windowed sums are bit-exact in both engines regardless of accumulation
    order (double windowed stddev differs between Spark's buffer rebuild
    and DuckDB's segment tree); the z-score itself is one identical float
    expression over those exact integers:
        z = (n·v − s) · sqrt((n−1) / (n · (n·ss − s²)))
    One window shuffle by user_id; per-row codegen math."""
    ev = load_table(spark, sf, "events").select("event_id", "user_id", "ts", "value")
    v = F.floor(F.col("value") * ANOM_SCALE).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOM_LOOKBACK, -1)
    )
    base = ev.select(
        "event_id",
        "user_id",
        v.alias("v"),
        F.count(v).over(w).alias("n"),
        F.sum(v).over(w).alias("s"),
        F.sum(v * v).over(w).alias("ss"),
    ).where(F.col("n") >= ANOM_MIN_N)
    var_num = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    z = (
        (F.col("n") * F.col("v") - F.col("s")).cast("double")
        * F.sqrt(
            (F.col("n") - 1).cast("double")
            / (F.col("n") * var_num).cast("double")
        )
    )
    return base.select(
        "event_id",
        "user_id",
        F.col("n").cast("int").alias("win_n"),
        F.when(var_num > 0, F.round(z, 6)).alias("z_score"),
        F.when(var_num > 0, (F.abs(z) > ANOM_Z).cast("int"))
        .otherwise(0)
        .alias("is_anomaly"),
    )


EV_ANOMALY_SQL = f"""
WITH base AS (
  SELECT event_id, user_id,
         CAST(floor(value * {ANOM_SCALE}) AS BIGINT) AS v,
         CAST(count(CAST(floor(value * {ANOM_SCALE}) AS BIGINT)) OVER w AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * {ANOM_SCALE}) AS BIGINT)) OVER w AS BIGINT)   AS s,
         CAST(sum(CAST(floor(value * {ANOM_SCALE}) AS BIGINT)
                  * CAST(floor(value * {ANOM_SCALE}) AS BIGINT)) OVER w AS BIGINT) AS ss
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN {ANOM_LOOKBACK} PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT event_id, user_id, n,
         n * ss - s * s AS var_num,
         CAST(n * v - s AS DOUBLE)
           * sqrt(CAST(n - 1 AS DOUBLE) / CAST(n * (n * ss - s * s) AS DOUBLE))
           AS z
  FROM base WHERE n >= {ANOM_MIN_N}
)
SELECT event_id, user_id,
       CAST(n AS INTEGER) AS win_n,
       CASE WHEN var_num > 0 THEN round(z, 6) END AS z_score,
       CASE WHEN var_num > 0 THEN CAST(abs(z) > {ANOM_Z} AS INTEGER)
            ELSE 0 END AS is_anomaly
FROM scored
"""



# --- MERGE INTO snapshot (batch face of the streaming upsert) ----------------

def cdc_merge(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE INTO semantics through streaming/upsert.py merge_upsert: the
    customer table is the base snapshot; a change set derived from orders
    (latest per key, delete when n_orders % 7 == 0) upserts/deletes into
    it. Balances are integer cents so the merged snapshot hash-checks.
    Scale: latest-per-key is one window, the merge is two keyed anti-joins
    + a union — all co-partitionable by the merge key."""
    from orc_spark.streaming.upsert import merge_upsert

    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    base = cust.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("acctbal_cents"),
        F.lit(0).alias("ver"),
        F.lit("base").alias("src"),
    )
    chg = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("acctbal_cents"),
            F.count(F.lit(1)).cast("int").alias("ver"),
        )
        .select(
            "c_custkey",
            "acctbal_cents",
            "ver",
            F.lit("chg").alias("src"),
            F.when(F.col("ver") % 7 == 0, "d").otherwise("u").alias("op"),
        )
    )
    return merge_upsert(base, chg, ["c_custkey"], "ver")


CDC_MERGE_SQL = """
WITH base AS (
  SELECT c_custkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents,
         0 AS ver, 'base' AS src
  FROM customer
),
chg AS (
  SELECT o_custkey AS c_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS acctbal_cents,
         CAST(count(*) AS INTEGER) AS ver,
         'chg' AS src,
         CASE WHEN count(*) % 7 = 0 THEN 'd' ELSE 'u' END AS op
  FROM orders GROUP BY o_custkey
)
SELECT b.c_custkey, b.acctbal_cents, b.ver, b.src
FROM base b LEFT JOIN chg c ON b.c_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT c_custkey, acctbal_cents, ver, src FROM chg WHERE op = 'u'
"""


# --- event-type transition matrix (first-order Markov) -----------------------

def ev_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event-type
    sequence: count(from → to) and the row-normalized transition
    probability. One window-lead by user + one combinable groupBy; the
    probability is one integer-ratio division (identical doubles).
    This is the sequence model behind session analysis — ev_funnel checks
    one path, this materializes all of them."""
    ev = load_table(spark, sf, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .where(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(tot).cast("double"),
            6,
        ).alias("prob"),
    )


EV_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS to_type
  FROM events
),
cnt AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS prob
FROM cnt
"""


# --- gap-based sessionization ------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1000000  # 30-minute inactivity gap


def _session_indexed(ev: DataFrame) -> DataFrame:
    """Append `session_idx` to an events frame (user_id, event_id, ts, …):
    a new session starts after SESSION_GAP_US of user inactivity; the
    running cumsum of gap flags is the classic sessionize idiom. The ONE
    definition ev_sessionize / ev_paths / ev_concurrency all share — a
    change here (tie-breaks, gap rule) changes all three together."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.col("ts") - F.lag("ts").over(w)) > SESSION_GAP_US),
        1,
    ).otherwise(0)
    return ev.withColumn("session_idx", F.sum(gap).over(run))


def _session_cte(extra_cols: str = "") -> str:
    """The matching DuckDB CTE chain (ev → flagged → sess); `extra_cols`
    rides alongside (user_id, event_id, ts, session_idx)."""
    c = f", {extra_cols}" if extra_cols else ""
    return f"""ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts{c} FROM events
),
flagged AS (
  SELECT user_id, event_id, ts{c},
         CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS gap
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts{c},
         sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
)"""


def ev_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after 30 minutes of
    user inactivity; sessions get a per-user running index (cumsum of gap
    flags — the classic sessionize idiom), then per-session stats. The
    batch twin of r8c's session windows: this shape also materializes the
    session IDs, which the windowed aggregate alone does not. One window
    by user + one combinable groupBy; gap tests are integer micros."""
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return (
        _session_indexed(ev)
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_us"),
            F.max("ts").alias("end_us"),
            ((F.max("ts") - F.min("ts")) / F.lit(1000000.0)).alias("dur_raw"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
            F.sum(
                F.floor(F.col("value") * 100).cast("bigint")
            ).alias("value_cents"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("int").alias("session_idx"),
            "n_events",
            "start_us",
            "end_us",
            F.round("dur_raw", 6).alias("duration_s"),
            F.col("n_purchases").cast("bigint").alias("n_purchases"),
            "value_cents",
        )
    )


EV_SESSIONIZE_SQL = f"""
WITH {_session_cte("event_type, value")}
SELECT user_id,
       CAST(session_idx AS INTEGER) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS start_us,
       max(ts) AS end_us,
       round((max(ts) - min(ts)) / CAST(1000000 AS DOUBLE), 6) AS duration_s,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchases,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM sess GROUP BY user_id, session_idx
"""


# --- rolling distinct actives (DAU / rolling 7-day uniques) ------------------

ROLL_DAYS = 7


def ev_rolling_uniques(spark: SparkSession, sf: str) -> DataFrame:
    """Product-analytics actives: per day, the exact count of distinct
    users active that day (DAU) and in the trailing 7 days (WAU-style
    rolling uniques). Distinct-over-sliding-window can't be a window
    function; the exact shape is (user, day) dedup → explode each activity
    onto the ≤7 window-ends it can serve → per-window distinct count.
    Expansion factor is the window length (bounded, declared); both
    aggregations are combinable. DAU attaches by join on the day."""
    ev = load_table(spark, sf, "events").select("user_id", "ts")
    day = F.expr("ts div 86400000000").alias("day")
    ud = ev.select("user_id", day).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    ends = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (ROLL_DAYS - 1))
        ).alias("wend"),
    )
    rolling = (
        ends.select("user_id", "wend").distinct()
        .groupBy("wend")
        .agg(F.count(F.lit(1)).alias("rolling_users"))
    )
    return (
        dau.join(rolling, dau.day == rolling.wend)
        .select(
            F.col("day").cast("bigint").alias("day"),
            "dau",
            "rolling_users",
        )
    )


EV_ROLLING_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
ends AS (
  SELECT DISTINCT user_id, day + off AS wend
  FROM ud, unnest(range(0, {ROLL_DAYS})) AS t(off)
),
rolling AS (
  SELECT wend, CAST(count(*) AS BIGINT) AS rolling_users
  FROM ends GROUP BY wend
)
SELECT CAST(d.day AS BIGINT) AS day, d.dau, r.rolling_users
FROM dau d JOIN rolling r ON d.day = r.wend
"""


# --- A/B test: two-proportion z ----------------------------------------------

def ev_ab_test(spark: SparkSession, sf: str) -> DataFrame:
    """Experimentation readout: assign users to arms by id parity (the
    deterministic stand-in for an assignment table), measure view→purchase
    conversion per arm, and compute the pooled two-proportion z statistic
    with a |z| > 1.96 significance flag. All counts are integers; the z
    expression is identical on both engines. One groupBy over (user, arm)
    then a 1-row aggregate — combinable at any event volume."""
    ev = load_table(spark, sf, "events").select("user_id", "event_type", "value")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("viewed"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 300.0),
                    1,
                ).otherwise(0)
            ).alias("purchased"),
        )
        .where(F.col("viewed") == 1)
        .select(
            F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("arm"),
            "purchased",
        )
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("purchased").cast("bigint").alias("conv"),
    )
    a = arms.where(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("c_a")
    )
    b = arms.where(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("c_b")
    )
    j = a.crossJoin(F.broadcast(b))
    pa = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pp * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    z = F.when(se > 0, (pa - pb) / se)
    return j.select(
        "n_a", "c_a", "n_b", "c_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce((F.abs(z) > 1.96).cast("int"), F.lit(0)).alias("significant"),
    )


EV_AB_SQL = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS viewed,
         max(CASE WHEN event_type = 'purchase' AND value > 300.0 THEN 1 ELSE 0 END) AS purchased
  FROM events GROUP BY user_id
),
arms AS (
  SELECT CAST(user_id % 2 AS INTEGER) AS arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(purchased) AS BIGINT) AS conv
  FROM per_user WHERE viewed = 1
  GROUP BY 1
),
j AS (
  SELECT a.n AS n_a, a.conv AS c_a, b.n AS n_b, b.conv AS c_b
  FROM arms a, arms b WHERE a.arm = 0 AND b.arm = 1
),
calc AS (
  SELECT n_a, c_a, n_b, c_b,
         CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
         CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
         sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS se
  FROM j
)
SELECT n_a, c_a, n_b, c_b,
       round(p_a, 6) AS rate_a,
       round(p_b, 6) AS rate_b,
       round(CASE WHEN se > 0 THEN (p_a - p_b) / se END, 6) AS z_stat,
       COALESCE(CAST(abs(CASE WHEN se > 0 THEN (p_a - p_b) / se END) > 1.96
                     AS INTEGER), 0) AS significant
FROM calc
"""

# --- session path mining -----------------------------------------------------

def ev_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 session journeys: event-type sequences per gap-based session
    (same 30-min sessionization as ev_sessionize), ranked by frequency —
    the path-mining readout behind "what do users actually do" funnels.
    The path string is built from a SORTED struct array (ts, event_id
    order), so collect_list's nondeterministic arrival order cannot leak
    into the result; conversion share is one float division of integers.

    100 TB shape: one window shuffle by user builds session ids, one
    groupBy(user, session) builds paths (arrays bounded by session
    length), one groupBy(path) counts — all combinable; the transform()
    HOF runs once per SESSION over a handful of elements, not per event,
    so the CodegenFallback hazard documented in CLAUDE.md doesn't bite."""
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    paths = (
        _session_indexed(ev)
        .groupBy("user_id", "session_idx")
        .agg(
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(ts, event_id, event_type))),"
                " x -> x.event_type), '>')"
            ).alias("path"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    by_path = (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("converted").alias("n_converted"),
        )
        # consumed by the total AND the final ranking — materialize the
        # distinct-path-sized aggregate so sessionization runs exactly once
        .localCheckpoint(eager=False)
    )
    # session total = Σn over the (distinct-path-sized) aggregate — derived
    # downstream of the rollup, so the sessionize pass runs exactly once
    total = by_path.agg(F.sum("n").alias("n_sessions"))
    return (
        by_path.crossJoin(F.broadcast(total))
        .select(
            "path",
            "n",
            F.col("n_converted").cast("bigint").alias("n_converted"),
            F.round(
                F.col("n").cast("double") / F.col("n_sessions").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(20)
    )


EV_PATHS_SQL = f"""
WITH {_session_cte("event_type")},
paths AS (
  SELECT user_id, session_idx,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM sess GROUP BY user_id, session_idx
),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM paths)
SELECT path, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       round(CAST(count(*) AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)
         AS share
FROM paths, total
GROUP BY path, n_sessions
ORDER BY n DESC, path ASC
LIMIT 20
"""


# --- Kaplan-Meier survival curve ---------------------------------------------

_KM_DAY_US = 86400 * 1000000
_KM_SCALE = 1_000_000_000  # fixed-point survival scale


def ev_survival(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier survival curve for time from first-seen to first
    purchase (users with no purchase are right-censored at stream end) —
    the time-to-event readout behind activation/churn questions. The
    estimator's running product S ← S·(n−d)/n runs in TRUNCATING
    fixed-point integers (scale 1e9), so the curve is bit-exact
    cross-engine: the step table is tiny (distinct duration days), Spark
    steps it through the recurrence harness and the oracle replays the
    identical integer division per recursive-CTE iteration.

    100 TB shape: per-user origin/event times are one map-combinable
    groupBy; the at-risk ladder is a window over the |distinct
    durations|-sized step table; only that tiny table enters Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    ev = load_table(spark, sf, "events").select("user_id", "event_type", "ts")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("o"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("p"),
            F.max("ts").alias("m"),
        )
        .localCheckpoint(eager=False)  # consumed by anchor and durations
    )
    # stream end derives from the per-user aggregate — one events scan total
    anchor = per_user.agg(F.max("m").alias("end_ts"))
    durs = per_user.crossJoin(F.broadcast(anchor)).select(
        F.when(
            F.col("p").isNotNull(),
            F.expr(f"(p - o) div {_KM_DAY_US}"),
        )
        .otherwise(F.expr(f"(end_ts - o) div {_KM_DAY_US}"))
        .alias("t"),
        F.when(F.col("p").isNotNull(), 1).otherwise(0).alias("event"),
    )
    total = durs.agg(F.count(F.lit(1)).alias("n_total"))
    steps = (
        durs.groupBy("t")
        .agg(
            F.sum("event").alias("d"),
            F.sum(1 - F.col("event")).alias("c"),
        )
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ladder = steps.select(
        "t",
        F.col("d").cast("long").alias("d"),
        F.col("c").cast("long").alias("c"),
        (
            F.col("n_total")
            - (F.sum(F.col("d") + F.col("c")).over(w) - F.col("d") - F.col("c"))
        )
        .cast("long")
        .alias("n_at_risk"),
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("t", kind="mergesort")
        d = g["d"].to_numpy(np.int64)
        n = g["n_at_risk"].to_numpy(np.int64)
        s = _KM_SCALE
        out = np.empty(len(d), dtype=np.int64)
        for i in range(len(d)):
            # Python ints, not np.int64: s·(n−d) wraps silently past 2^63
            # in numpy (n_at_risk ≳ 9.2e9 users) while DuckDB's BIGINT
            # multiply raises — keep the scalar state arbitrary-precision
            # so both engines stay exact (the result ≤ _KM_SCALE always
            # fits the int64 output)
            ni, di = int(n[i]), int(d[i])
            s = s * (ni - di) // ni
            out[i] = s
        g = g.copy()
        g["surv_fp"] = out
        return g[["t", "d", "c", "n_at_risk", "surv_fp"]]

    schema = T.StructType(
        [
            T.StructField("t", T.LongType()),
            T.StructField("d", T.LongType()),
            T.StructField("c", T.LongType()),
            T.StructField("n_at_risk", T.LongType()),
            T.StructField("surv_fp", T.LongType()),
        ]
    )
    # ONE logical group: the generic partitioned_group_scan would hash-spread
    # this tiny step table over defaultParallelism partitions (31 empty
    # tasks + an exchange) to run a single kernel call. The ladder window is
    # already single-partition; buffer its batches and run the kernel once.
    def run_single(it):
        pdfs = [p for p in it if not p.empty]
        if pdfs:
            yield kernel(pd.concat(pdfs, ignore_index=True))

    curve = ladder.coalesce(1).mapInPandas(run_single, schema)
    # tiny presentation sort: fuse into the single output partition instead
    # of paying a range-partitioning job round
    return curve.select(
        "t",
        "d",
        "c",
        "n_at_risk",
        "surv_fp",
        F.round(F.col("surv_fp").cast("double") / 1000000000.0, 6).alias(
            "survival"
        ),
    ).coalesce(1).sortWithinPartitions("t")


EV_SURVIVAL_SQL = f"""
WITH RECURSIVE per_user AS (
  SELECT user_id, min(epoch_us(ts)) AS o,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
  FROM events GROUP BY user_id
),
anchor AS (SELECT max(epoch_us(ts)) AS end_ts FROM events),
durs AS (
  SELECT CASE WHEN p IS NOT NULL THEN (p - o) // {_KM_DAY_US}
              ELSE (end_ts - o) // {_KM_DAY_US} END AS t,
         CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user, anchor
),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM durs),
steps AS (
  SELECT t, CAST(sum(event) AS BIGINT) AS d,
         CAST(sum(1 - event) AS BIGINT) AS c
  FROM durs GROUP BY t
),
ladder AS (
  SELECT t, d, c,
         CAST(n_total - (sum(d + c) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - d - c)
              AS BIGINT) AS n_at_risk,
         row_number() OVER (ORDER BY t) AS rn
  FROM steps, total
),
rec (t, d, c, n_at_risk, rn, surv_fp) AS (
  SELECT t, d, c, n_at_risk, rn,
         CAST({_KM_SCALE} AS BIGINT) * (n_at_risk - d) // n_at_risk
  FROM ladder WHERE rn = 1
  UNION ALL
  SELECT l.t, l.d, l.c, l.n_at_risk, l.rn,
         r.surv_fp * (l.n_at_risk - l.d) // l.n_at_risk
  FROM rec r JOIN ladder l ON l.rn = r.rn + 1
)
SELECT t, d, c, n_at_risk, surv_fp,
       round(CAST(surv_fp AS DOUBLE) / 1000000000.0, 6) AS survival
FROM rec
ORDER BY t
"""


# --- concurrency sweep over session intervals --------------------------------

_CONC_DAY_US = 86400 * 1000000


def ev_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """Peak concurrent sessions per day — the interval-overlap sweep
    (sessions → ±1 boundary events → running sum) that powers capacity
    and licensing questions. The prefix sum is distributed two-phase:
    within-day running sums shuffle by day, and the cross-day carry is a
    cumulative offset over the tiny per-day aggregate — the textbook
    scan-combine, no global single-partition pass over the boundary
    stream. Per-day peak/end-of-day values are invariant to tie order
    within equal (t, delta) groups, so everything is integer-exact.

    Session intervals are closed ([start, end]); the −1 boundary lands at
    end+1µs so a session whose start equals another's end still overlaps."""
    ev = load_table(spark, sf, "events").select("user_id", "event_id", "ts")
    sessions = (
        _session_indexed(ev)
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("start_us"), F.max("ts").alias("end_us"))
        # both union halves read the interval table — materialize so the
        # sessionize window runs exactly once
        .localCheckpoint(eager=False)
    )
    deltas = sessions.select(
        F.col("start_us").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        sessions.select(
            (F.col("end_us") + 1).alias("t"), F.lit(-1).alias("delta")
        )
    ).withColumn("day", F.expr(f"t div {_CONC_DAY_US}"))
    dw = (
        Window.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_day = (
        deltas.withColumn("running", F.sum("delta").over(dw))
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
                "n_starts"
            ),
            F.sum(F.when(F.col("delta") == -1, 1).otherwise(0)).alias(
                "n_ends"
            ),
            F.max("running").alias("max_run"),
            F.min("t").alias("first_t"),
            F.sum("delta").alias("net"),
        )
        # the day's peak may be its START state (carry_in + 0) — but only
        # when that state is observable, i.e. the first boundary falls
        # strictly after the day-start instant (property-tested: a -1
        # landing exactly at day start means the carry never existed
        # within this day)
        .select(
            "day",
            "n_starts",
            "n_ends",
            F.when(
                F.col("first_t") > F.col("day") * _CONC_DAY_US,
                F.greatest(F.lit(0).cast("long"), F.col("max_run")),
            )
            .otherwise(F.col("max_run"))
            .alias("peak_local"),
            "net",
        )
        # consumed by the spine bounds AND the left join — tiny table
        .localCheckpoint(eager=False)
    )
    # day spine: a day with ongoing sessions but NO boundary events (quiet
    # middle of a long session) still carries nonzero concurrency — without
    # it the busiest-but-quietest days silently vanish from the report
    # (found by code review; the per-day left join fills zeros and the
    # carry window restores the level)
    spine = (
        per_day.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(F.explode(F.expr("sequence(d0, d1)")).alias("day"))
    )
    full = spine.join(per_day, "day", "left").select(
        "day",
        F.coalesce(F.col("n_starts"), F.lit(0)).alias("n_starts"),
        F.coalesce(F.col("n_ends"), F.lit(0)).alias("n_ends"),
        F.coalesce(F.col("peak_local"), F.lit(0)).alias("peak_local"),
        F.coalesce(F.col("net"), F.lit(0)).alias("net"),
    )
    ow = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        full.withColumn("carry_in", F.sum("net").over(ow) - F.col("net"))
        .select(
            "day",
            F.col("n_starts").cast("bigint").alias("n_starts"),
            F.col("n_ends").cast("bigint").alias("n_ends"),
            (F.col("carry_in") + F.col("peak_local"))
            .cast("bigint")
            .alias("peak_concurrency"),
            (F.col("carry_in") + F.col("net")).cast("bigint").alias(
                "eod_concurrency"
            ),
        )
        .coalesce(1)
        .sortWithinPartitions("day")
    )


EV_CONCURRENCY_SQL = f"""
WITH {_session_cte()},
sessions AS (
  SELECT user_id, session_idx,
         min(ts) AS start_us, max(ts) AS end_us
  FROM sess GROUP BY user_id, session_idx
),
deltas AS (
  SELECT start_us AS t, 1 AS delta, start_us // {_CONC_DAY_US} AS day
  FROM sessions
  UNION ALL
  SELECT end_us + 1 AS t, -1 AS delta, (end_us + 1) // {_CONC_DAY_US} AS day
  FROM sessions
),
per_day AS (
  SELECT day,
         CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_starts,
         CAST(sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ends,
         CASE WHEN min(t) > day * {_CONC_DAY_US}
              THEN greatest(0, max(running))
              ELSE max(running) END AS peak_local,
         sum(delta) AS net
  FROM (
    SELECT day, delta, t,
           sum(delta) OVER (PARTITION BY day ORDER BY t, delta
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running
  FROM deltas
  ) GROUP BY day
),
spine AS (
  SELECT unnest(generate_series((SELECT min(day) FROM per_day),
                                (SELECT max(day) FROM per_day))) AS day
),
filled AS (
  SELECT s.day,
         COALESCE(p.n_starts, 0) AS n_starts,
         COALESCE(p.n_ends, 0) AS n_ends,
         COALESCE(p.peak_local, 0) AS peak_local,
         COALESCE(p.net, 0) AS net
  FROM spine s LEFT JOIN per_day p ON s.day = p.day
)
SELECT day,
       CAST(n_starts AS BIGINT) AS n_starts,
       CAST(n_ends AS BIGINT) AS n_ends,
       CAST(sum(net) OVER (ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - net + peak_local AS BIGINT) AS peak_concurrency,
       CAST(sum(net) OVER (ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS eod_concurrency
FROM filled
ORDER BY day
"""


# --- cohort lifetime-value curves --------------------------------------------

_LTV_WEEK_US = 7 * 86400 * 1000000


def ev_ltv(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort LTV curves: users cohorted by first-seen week, purchase
    revenue accumulated per cohort over weeks-since-signup — the
    product-analytics companion to ev_retention (activity) with money
    attached. Revenue lives in integer cents end-to-end (the cumulative
    window sums BIGINT), so every cell is bit-exact cross-engine;
    per-user LTV uses integer division.

    100 TB shape: the cohort anchor is a map-side-combinable
    groupBy(user_id).min — its shuffle carries |users| rows, not the
    stream (cheaper than a window over all events, and the pruned anchor
    scan reads two columns). Purchases then join the anchor co-partitioned
    on user_id (only the purchase subset shuffles), one (cohort, age)
    groupBy combines, and the cumulative window runs over the tiny
    aggregate."""
    ev = load_table(spark, sf, "events")
    wk = F.expr(f"ts div {_LTV_WEEK_US}")
    per_user = (
        ev.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_week"))
        # consumed by cohort sizing AND the purchase join — materialize the
        # |users|-row anchor so its map-combined scan runs exactly once
        .localCheckpoint(eager=False)
    )
    cohort_sizes = per_user.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    weekly = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            wk.alias("wk"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        )
        .join(per_user, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("age_week"),
        )
        .agg(F.sum("cents").alias("week_rev_cents"))
    )
    cw = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        weekly.withColumn("cum_rev_cents", F.sum("week_rev_cents").over(cw))
        .join(F.broadcast(cohort_sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            "cohort_users",
            "week_rev_cents",
            "cum_rev_cents",
            F.expr("cum_rev_cents div cohort_users").alias("ltv_per_user_cents"),
        )
        .coalesce(1)
        .sortWithinPartitions("cohort_week", "age_week")
    )


EV_LTV_SQL = f"""
WITH base AS (
  SELECT user_id, event_type,
         epoch_us(ts) // {_LTV_WEEK_US} AS wk,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         min(epoch_us(ts) // {_LTV_WEEK_US})
           OVER (PARTITION BY user_id) AS cohort_week
  FROM events
),
cohort_sizes AS (
  SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_users
  FROM base GROUP BY cohort_week
),
weekly AS (
  SELECT cohort_week, wk - cohort_week AS age_week,
         CAST(sum(cents) AS BIGINT) AS week_rev_cents
  FROM base WHERE event_type = 'purchase'
  GROUP BY cohort_week, wk - cohort_week
)
SELECT w.cohort_week, w.age_week, s.cohort_users, w.week_rev_cents,
       CAST(sum(w.week_rev_cents)
              OVER (PARTITION BY w.cohort_week ORDER BY w.age_week
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_rev_cents,
       CAST(sum(w.week_rev_cents)
              OVER (PARTITION BY w.cohort_week ORDER BY w.age_week
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) // s.cohort_users AS ltv_per_user_cents
FROM weekly w JOIN cohort_sizes s ON w.cohort_week = s.cohort_week
ORDER BY w.cohort_week, w.age_week
"""


# --- RFM segmentation --------------------------------------------------------

_RFM_DAY_US = 86400 * 1000000


def ev_rfm(spark: SparkSession, sf: str) -> DataFrame:
    """RFM customer segmentation: per user, purchase Recency (days since
    last purchase vs the stream's end), Frequency (purchase count) and
    Monetary (cents), each quintile-scored with ntile(5) SEMANTICS; output
    is the 125-cell segment matrix with user counts and revenue.
    Deterministic: every quintile ordering carries a user_id tiebreak,
    metrics are integers.

    100 TB shape (VERDICT r14 directive 2 — no global ntile windows): one
    groupBy(user_id) with map-side combine builds the per-user triple;
    quintile scores then come from operators/ranking.py — ntile is
    positional, so the 4 exact boundary KEYS per metric (k-th order
    statistics: one bounded Arrow handoff under the cap, iterative
    bucketed narrowing above it) turn each global sort into a narrow
    per-row comparison against literals. The users frame crosses NO
    exchange between the groupBy and the tiny 125-cell rollup — the plan
    has zero Window nodes and zero single-partition exchanges (pinned by a
    plan test), where the previous shape ran three unpartitioned
    ntile(5) sorts. Scores are bit-identical to ntile's by construction
    (equality-tested against F.ntile in tests/test_ranking.py, and the
    DuckDB oracle below still scores with ntile).

    Eager-job budget: the local/distributed decision reads the events
    parquet FOOTER rowcount (|users| ≤ |events|; no Spark job — the
    table_rowcount pattern), the stream-end anchor folds into the same
    bounded Arrow handoff as the boundary keys, and end_ts re-enters the
    scored plan as a literal — so the whole build costs ONE job under the
    cap. Above the cap: one count, one 1-row anchor agg, then per-metric
    bucketed selection (equality-tested vs the local path in
    tests/test_ranking.py)."""
    from orc_spark.operators import ranking
    from orc_spark.operators.ranking import (
        multi_metric_boundary_keys,
        multi_metric_boundary_keys_pdf,
        ntile_boundary_ranks,
        tile_from_boundaries,
    )

    ev = load_table(spark, sf, "events")
    pur = ev.where(F.col("event_type") == "purchase")
    stats = (
        pur.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "cents"
            ),
        )
        # consumed by the eager boundary-key pass AND the scored plan —
        # materialize the |users|-row aggregate so the event stream is
        # scanned exactly once
        .localCheckpoint(eager=False)
    )
    metrics = [("recency_days", 1), ("freq", -1), ("cents", -1)]
    cap = max(1, ranking.ORDER_STAT_LOCAL_CAP)
    if table_rowcount(sf, "events") <= cap:
        # local finish: ONE bounded Arrow job fetches the per-user triples;
        # the anchor (max of per-user maxes) and the boundary keys both
        # come from the same pandas frame
        pdf = stats.toPandas()
        n = len(pdf)
        end_ts = int(pdf["last_ts"].max()) if n else 0
        # trunc-div == floor-div here: end_ts >= last_ts, both operands
        # non-negative (matches Spark's `div` and DuckDB's `//`)
        pdf["recency_days"] = (end_ts - pdf["last_ts"]) // _RFM_DAY_US
        keys = multi_metric_boundary_keys_pdf(
            pdf, "user_id", metrics, ntile_boundary_ranks(n, 5)
        )
    else:
        row = stats.agg(
            F.count(F.lit(1)).alias("n"), F.max("last_ts").alias("end_ts")
        ).collect()[0]
        n, end_ts = row["n"], int(row["end_ts"] or 0)
        per_user = stats.select(
            "user_id",
            F.expr(
                f"(CAST({end_ts} AS BIGINT) - last_ts) div {_RFM_DAY_US}"
            ).alias("recency_days"),
            "freq",
            "cents",
        )
        keys = multi_metric_boundary_keys(
            per_user, "user_id", metrics, ntile_boundary_ranks(n, 5), n=n
        )
    recency = F.expr(
        f"(CAST({end_ts} AS BIGINT) - last_ts) div {_RFM_DAY_US}"
    ).alias("recency_days")
    scored = stats.select("user_id", recency, "freq", "cents").select(
        "user_id",
        "recency_days",
        "freq",
        "cents",
        *[
            tile_from_boundaries(
                ranking.signed_metric(F.col(m), sign),
                F.col("user_id"),
                keys[m],
            ).alias(alias)
            for (m, sign), alias in zip(
                metrics, ["r_score", "f_score", "m_score"]
            )
        ],
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("cents").alias("total_cents"),
            F.min("user_id").alias("sample_user"),
        )
        # tiny presentation sort (≤125 rows): fuse into the final
        # AQE-coalesced partition instead of paying orderBy's extra
        # range-partition job round (the dq_referential pattern)
        .coalesce(1)
        .sortWithinPartitions("r_score", "f_score", "m_score")
    )


EV_RFM_SQL = f"""
WITH pur AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
per_user AS (
  SELECT user_id,
         ((SELECT max(ts_us) FROM pur) - max(ts_us)) // {_RFM_DAY_US}
           AS recency_days,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM pur GROUP BY user_id
),
scored AS (
  SELECT user_id, recency_days, freq, cents,
         ntile(5) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
         ntile(5) OVER (ORDER BY freq DESC, user_id)        AS f_score,
         ntile(5) OVER (ORDER BY cents DESC, user_id)       AS m_score
  FROM per_user
)
SELECT CAST(r_score AS INTEGER) AS r_score,
       CAST(f_score AS INTEGER) AS f_score,
       CAST(m_score AS INTEGER) AS m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(min(user_id) AS BIGINT) AS sample_user
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


# --- bot / abuse detection ----------------------------------------------------

BOT_MAX_EPM = 2  # max events in any 1-minute bucket (corpus-scaled)
BOT_DUP_RATIO = 0.5  # consecutive duplicate-event ratio


def ev_bot_detect(spark: SparkSession, sf: str) -> DataFrame:
    """Bot/abuse screening per user — the data-cleaning gate a telemetry
    corpus runs before analytics or training: (a) burst rate = max events
    in any 1-minute bucket, (b) consecutive-duplicate ratio (same
    event_type AND value as the immediately-preceding event, null-safe).
    Flags users breaching either threshold. Everything is integer until
    the final ratio (one division); equality on raw doubles is exact.

    Plan: ONE user-hash exchange — the per-minute burst count is a window
    over (user, minute) and the lag a window over (user), both satisfied
    by the same user partitioning, then the per-user groupBy reuses it
    too (no second shuffle)."""
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    minute = F.expr("ts div 60000000")
    wm = Window.partitionBy("user_id", minute)
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = (
        ev.withColumn("epm", F.count(F.lit(1)).over(wm))
        .withColumn("prev_type", F.lag("event_type").over(wl))
        .withColumn("prev_value", F.lag("value").over(wl))
        .withColumn(
            "is_dup",
            F.expr(
                "CAST((prev_type <=> event_type) AND (prev_value <=> value) AS INT)"
            ),
        )
    )
    per_user = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("epm").alias("max_epm"),
        F.sum("is_dup").alias("n_dup_consec"),
    )
    dup_ratio = F.when(
        F.col("n_events") > 1,
        F.round(
            F.col("n_dup_consec").cast("double")
            / (F.col("n_events") - 1).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return per_user.select(
        "user_id",
        "n_events",
        "max_epm",
        F.col("n_dup_consec").cast("bigint").alias("n_dup_consec"),
        dup_ratio.alias("dup_ratio"),
        (
            (F.col("max_epm") > BOT_MAX_EPM)
            | (dup_ratio >= BOT_DUP_RATIO)
        ).alias("is_bot"),
    ).orderBy("user_id")


EV_BOT_SQL = f"""
WITH base AS (
  SELECT user_id,
         count(*) OVER (PARTITION BY user_id, epoch_us(ts) // 60000000)
           AS epm,
         CAST((lag(event_type) OVER w IS NOT DISTINCT FROM event_type)
              AND (lag(value) OVER w IS NOT DISTINCT FROM value) AS INTEGER)
           AS is_dup
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
per_user AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(epm) AS BIGINT) AS max_epm,
         CAST(sum(is_dup) AS BIGINT) AS n_dup_consec
  FROM base GROUP BY user_id
)
SELECT user_id, n_events, max_epm, n_dup_consec,
       CASE WHEN n_events > 1
            THEN round(CAST(n_dup_consec AS DOUBLE)
                       / CAST(n_events - 1 AS DOUBLE), 6)
            ELSE 0.0 END AS dup_ratio,
       (max_epm > {BOT_MAX_EPM}
        OR CASE WHEN n_events > 1
                THEN round(CAST(n_dup_consec AS DOUBLE)
                           / CAST(n_events - 1 AS DOUBLE), 6)
                ELSE 0.0 END >= {BOT_DUP_RATIO}) AS is_bot
FROM per_user
ORDER BY user_id
"""


# --- point-in-time feature snapshots ------------------------------------------

FEAT_WIN_US = 7 * 86400 * 1000000  # trailing feature window


def ev_feature_snapshot(spark: SparkSession, sf: str) -> DataFrame:
    """LEAKAGE-FREE training-feature extraction: for every label event
    (purchase), the user's trailing-7-day activity features computed
    STRICTLY BEFORE the label instant — the point-in-time-correct feature
    join every ML training pipeline needs (naive joins leak the label
    window; as-of semantics here are a value-based RANGE frame ending 1 µs
    before the row, so same-instant events never leak either).

    Determinism: every feature is an integer window sum (counts,
    round-to-cents spend) over a value-based frame — frame membership
    depends only on the ts VALUE, so ties resolve identically on both
    engines and no float ever accumulates.

    100 TB shape: ONE user-hash exchange + per-user sort serves all
    features (shared frame); the label filter happens after the window, so
    no second pass over events — the standard windowed feature-backfill
    plan, linear in events."""
    ev = load_table(spark, sf, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    ).select(
        "*",
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("iv"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("ic"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(-FEAT_WIN_US, -1)
    )
    feats = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "cents",
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0))
        .cast("bigint")
        .alias("n_prior_7d"),
        F.coalesce(F.sum("iv").over(w), F.lit(0))
        .cast("bigint")
        .alias("n_views_7d"),
        F.coalesce(F.sum("ic").over(w), F.lit(0))
        .cast("bigint")
        .alias("n_clicks_7d"),
        F.coalesce(F.sum("cents").over(w), F.lit(0))
        .cast("bigint")
        .alias("spend_cents_7d"),
    )
    return (
        feats.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.expr("ts div 86400000000").cast("bigint").alias("label_day"),
            "n_prior_7d",
            "n_views_7d",
            "n_clicks_7d",
            "spend_cents_7d",
            F.col("cents").alias("label_cents"),
        )
        .orderBy("event_id")
    )


EV_FEATURE_SNAPSHOT_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts, event_type,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS iv,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ic,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
feats AS (
  SELECT event_id, user_id, ts, event_type, cents,
         CAST(coalesce(count(*) OVER w, 0) AS BIGINT) AS n_prior_7d,
         CAST(coalesce(sum(iv) OVER w, 0) AS BIGINT) AS n_views_7d,
         CAST(coalesce(sum(ic) OVER w, 0) AS BIGINT) AS n_clicks_7d,
         CAST(coalesce(sum(cents) OVER w, 0) AS BIGINT) AS spend_cents_7d
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN {FEAT_WIN_US} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id,
       CAST(ts // 86400000000 AS BIGINT) AS label_day,
       n_prior_7d, n_views_7d, n_clicks_7d, spend_cents_7d,
       cents AS label_cents
FROM feats
WHERE event_type = 'purchase'
ORDER BY event_id
"""


QUERIES = [
    Query("cdc_scd2", cdc_scd2, CDC_SCD2_SQL, "CDC → SCD2 history (valid intervals, current flag, exact running state)"),
    Query("ev_attribution", ev_attribution, EV_ATTRIBUTION_SQL, "last-touch attribution within a 7-day window"),
    Query("ev_anomaly", ev_anomaly, EV_ANOMALY_SQL, "rolling fixed-point z-score anomaly detection"),
    Query("cdc_merge", cdc_merge, CDC_MERGE_SQL, "MERGE INTO snapshot via the streaming upsert operator (latest-per-key, delete tombstones)"),
    Query("ev_transitions", ev_transitions, EV_TRANSITIONS_SQL, "first-order Markov event-type transition matrix"),
    Query("ev_sessionize", ev_sessionize, EV_SESSIONIZE_SQL, "gap-based sessionization: materialized session ids + per-session stats"),
    Query("ev_rolling_uniques", ev_rolling_uniques, EV_ROLLING_SQL, "DAU + exact trailing-7-day rolling distinct users"),
    Query("ev_ab_test", ev_ab_test, EV_AB_SQL, "two-proportion z-test between id-parity arms"),
    Query("ev_ltv", ev_ltv, EV_LTV_SQL, "cohort lifetime-value curves, integer cents end-to-end"),
    Query("ev_rfm", ev_rfm, EV_RFM_SQL, "RFM quintile segmentation matrix, deterministic ntile scoring"),
    Query("ev_paths", ev_paths, EV_PATHS_SQL, "top-20 session journey paths with conversion share"),
    Query("ev_concurrency", ev_concurrency, EV_CONCURRENCY_SQL, "peak concurrent sessions per day via two-phase interval sweep"),
    Query("ev_survival", ev_survival, EV_SURVIVAL_SQL, "Kaplan-Meier time-to-purchase curve, truncating fixed-point product"),
    Query("cdc_pit_lookup", cdc_pit_lookup, CDC_PIT_SQL, "point-in-time AS-OF lookup against the SCD2 history"),
    Query("ev_bot_detect", ev_bot_detect, EV_BOT_SQL, "bot screening: burst rate + consecutive-duplicate ratio per user, one exchange"),
    Query("ev_feature_snapshot", ev_feature_snapshot, EV_FEATURE_SNAPSHOT_SQL, "leakage-free point-in-time feature extraction: trailing-window integer features strictly before each label"),
]
