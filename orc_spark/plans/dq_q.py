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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orc_spark.functions.hashing import xor_digest
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
    # second orders scan. The key set is DEDUPLICATED first: a duplicated
    # parent key would multiply the joined order rows and inflate n_checked
    # past count(orders), diverging from the oracle's plain counts (found
    # by the r11 planted-violation replay — an audit query must stay
    # correct precisely when the data is broken, that's its job).
    fk = (
        orders.select("o_custkey")
        .join(
            cust.select(
                F.col("c_custkey").alias("o_custkey")
            ).distinct().withColumn("_present", F.lit(1)),
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



# --- distribution drift (population stability index) -------------------------

PSI_BINS = 10


def dq_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution drift between the first and second half of the event
    stream, per event_type: 10-bin PSI over `value` plus the per-bin count
    table digest. PSI = Σ (p−q)·ln(p/q) with Laplace-smoothed bin shares —
    the standard production drift monitor for ML feature pipelines.

    Determinism: bins come from the GLOBAL min/max (two-pass, 1-row
    broadcast) and every count is integer; p, q, and the PSI sum are the
    identical float expression on both engines, and the Σ is over exactly
    PSI_BINS terms collected with sum() over integer-keyed bins — the
    accumulation order ambiguity is gone because each (type, bin) appears
    once. Scale: two combinable aggregations over events, output
    |event_type| rows."""
    # NULL measurements are excluded up front: without the filter a NULL
    # value lands in the coalesce(..., 0) below and silently inflates bin 0
    # (r11 advice). The oracle filters identically.
    ev = (
        load_table(spark, sf, "events")
        .select("event_type", "ts", "value")
        .where(F.col("value").isNotNull())
    )
    # the reference/current split point just has to be THE SAME on both
    # engines — midpoint of min/max ts (pure integer arithmetic)
    stats = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        # integer div: Spark / would be double division (trunc on cast)
        # while DuckDB CAST rounds — div/// sidesteps the invariant trap
        F.expr("(min(ts) + max(ts)) div 2").alias("ts_mid"),
    )
    binned = (
        ev.crossJoin(F.broadcast(stats))
        .select(
            "event_type",
            # mx == mn guard (r11 degenerate sweep): zero value range ->
            # every row in bin 0, not an ANSI DIVIDE_BY_ZERO; PSI is then
            # computed over one populated bin + 9 smoothed ones, fine.
            F.coalesce(
                F.least(
                    F.floor(
                        (F.col("value") - F.col("mn"))
                        / F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))
                        * PSI_BINS
                    ),
                    F.lit(PSI_BINS - 1),
                ),
                F.lit(0),
            ).cast("int").alias("bin"),
            (F.col("ts") <= F.col("ts_mid")).alias("is_ref"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("c_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("c_cur"),
        )
    )
    tot = Window.partitionBy("event_type")
    p = (F.col("c_ref") + 1).cast("double") / (
        F.sum(F.col("c_ref") + 1).over(tot)
    ).cast("double")
    q = (F.col("c_cur") + 1).cast("double") / (
        F.sum(F.col("c_cur") + 1).over(tot)
    ).cast("double")
    term = (p - q) * F.log(p / q)
    return (
        binned.select(
            "event_type",
            "bin",
            "c_ref",
            "c_cur",
            term.alias("term"),
        )
        .groupBy("event_type")
        .agg(
            F.round(F.sum("term"), 6).alias("psi"),
            F.sum("c_ref").alias("n_ref"),
            F.sum("c_cur").alias("n_cur"),
            xor_digest("bin", "c_ref", "c_cur").alias("bins_digest"),
        )
    )


DQ_DRIFT_SQL = f"""
WITH ev AS (SELECT event_type, epoch_us(ts) AS ts, value FROM events
            WHERE value IS NOT NULL),
stats AS (
  SELECT min(value) AS mn, max(value) AS mx,
         (min(ts) + max(ts)) // 2 AS ts_mid
  FROM ev
),
binned AS (
  SELECT event_type,
         CAST(coalesce(least(floor((value - mn) / NULLIF(mx - mn, 0) * {PSI_BINS}),
                    {PSI_BINS - 1}), 0) AS INTEGER) AS bin,
         ts <= ts_mid AS is_ref
  FROM ev, stats
),
cnt AS (
  SELECT event_type, bin,
         CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
         CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
  FROM binned GROUP BY 1, 2
),
shares AS (
  SELECT event_type, bin, c_ref, c_cur,
         CAST(c_ref + 1 AS DOUBLE)
           / CAST(sum(c_ref + 1) OVER (PARTITION BY event_type) AS DOUBLE) AS p,
         CAST(c_cur + 1 AS DOUBLE)
           / CAST(sum(c_cur + 1) OVER (PARTITION BY event_type) AS DOUBLE) AS q
  FROM cnt
)
SELECT event_type,
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       CAST(sum(c_ref) AS BIGINT) AS n_ref,
       CAST(sum(c_cur) AS BIGINT) AS n_cur,
       CAST(bit_xor(('0x' || substr(md5(concat_ws(':', bin, c_ref, c_cur)), 1, 15))::BIGINT)
            AS BIGINT) AS bins_digest
FROM shares GROUP BY event_type
"""


# --- Benford first-digit audit -----------------------------------------------

def dq_benford(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law audit of l_extendedprice: first-significant-digit
    distribution vs the log10(1+1/d) expectation, with the chi-square
    statistic — the classic fabricated-data screen for financial columns.
    Digit counts are integers (exact); expected shares and the chi-square
    terms are identical float expressions; the 9-term sum is ordered by
    digit on both engines. One combinable groupBy over the scan."""
    li = load_table(spark, sf, "lineitem")
    # prices are all >= 1, so the first significant digit is the first char
    # of the floored integer part — no regex in the scan (the
    # format+regexp_replace variant cost 2.6s at sf0.1; this is ~0.4s).
    # floor (not a bare cast): Spark casts double->bigint by truncation,
    # DuckDB CAST rounds — floor makes both engines agree.
    digit = F.substring(
        F.floor(F.col("l_extendedprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = (
        li.select(digit.alias("d"))
        .where(F.col("d").between(1, 9))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    tot = counts.agg(F.sum("obs").alias("n"))
    exp = (
        F.log10((F.col("d") + 1).cast("double") / F.col("d").cast("double"))
        * F.col("n").cast("double")
    )
    chi_term = (F.col("obs").cast("double") - exp) * (
        F.col("obs").cast("double") - exp
    ) / exp
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "obs",
            F.round(exp, 6).alias("expected"),
            F.round(chi_term, 6).alias("chi_term"),
        )
        .coalesce(1)
        .sortWithinPartitions("d")
    )


DQ_BENFORD_SQL = """
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS d,
         CAST(count(*) AS BIGINT) AS obs
  FROM lineitem
  WHERE CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) BETWEEN 1 AND 9
  GROUP BY 1
),
tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM counts)
SELECT d, obs,
       round(log10(CAST(d + 1 AS DOUBLE) / CAST(d AS DOUBLE)) * CAST(n AS DOUBLE), 6) AS expected,
       round((CAST(obs AS DOUBLE) - log10(CAST(d + 1 AS DOUBLE) / CAST(d AS DOUBLE)) * CAST(n AS DOUBLE))
             * (CAST(obs AS DOUBLE) - log10(CAST(d + 1 AS DOUBLE) / CAST(d AS DOUBLE)) * CAST(n AS DOUBLE))
             / (log10(CAST(d + 1 AS DOUBLE) / CAST(d AS DOUBLE)) * CAST(n AS DOUBLE)), 6) AS chi_term
FROM counts, tot
ORDER BY d
"""

# --- freshness / arrival-rate monitoring -------------------------------------

_DAY_US = 86400 * 1000000


def dq_freshness(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source freshness monitor: for every event_type, the age of the
    newest event relative to the stream's end, the trailing-7-day arrival
    count, and that window's daily rate as a percentage of the source's
    lifetime daily rate — the is-the-feed-alive / is-it-degrading check
    that pages an on-call before a silent upstream failure poisons a day
    of downstream aggregates. Completes the DQ suite next to
    dq_expectations (content), dq_drift (distribution), dq_benford
    (fabrication). All arithmetic is integer micros / integer percent, so
    every cell hash-checks; the anchors are a 1-row broadcast and the scan
    aggregates in a single combinable groupBy."""
    ev = load_table(spark, sf, "events")
    anchor = ev.agg(
        F.max("ts").alias("end_ts"), F.min("ts").alias("start_ts")
    )
    per_type = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.expr(f"(max(end_ts) - max(ts)) div 1000000").alias("last_age_s"),
            F.sum(
                F.when(
                    F.col("ts") >= F.col("end_ts") - F.lit(7 * _DAY_US), 1
                ).otherwise(0)
            ).alias("recent_7d"),
            F.expr(
                f"(max(end_ts) - max(start_ts)) div {_DAY_US} + 1"
            ).alias("span_days"),
        )
    )
    # rate ratio in integer percent: (recent/7) / (total/span) * 100
    ratio = F.expr("(recent_7d * span_days * 100) div (7 * n_total)")
    return per_type.select(
        "event_type",
        "n_total",
        "last_age_s",
        F.col("recent_7d").cast("bigint").alias("recent_7d"),
        "span_days",
        ratio.cast("bigint").alias("rate_ratio_pct"),
        (F.col("last_age_s") > 86400).alias("is_stale"),
        (ratio < 50).alias("is_quiet"),
    ).coalesce(1).sortWithinPartitions("event_type")


DQ_FRESHNESS_SQL = f"""
WITH anchor AS (
  SELECT max(epoch_us(ts)) AS end_ts, min(epoch_us(ts)) AS start_ts FROM events
),
per_type AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_total,
         (max(a.end_ts) - max(epoch_us(ts))) // 1000000 AS last_age_s,
         CAST(sum(CASE WHEN epoch_us(ts) >= a.end_ts - {7 * _DAY_US}
                       THEN 1 ELSE 0 END) AS BIGINT) AS recent_7d,
         (max(a.end_ts) - max(a.start_ts)) // {_DAY_US} + 1 AS span_days
  FROM events, anchor a
  GROUP BY event_type
)
SELECT event_type, n_total, last_age_s, recent_7d, span_days,
       (recent_7d * span_days * 100) // (7 * n_total) AS rate_ratio_pct,
       last_age_s > 86400 AS is_stale,
       (recent_7d * span_days * 100) // (7 * n_total) < 50 AS is_quiet
FROM per_type
ORDER BY event_type
"""


# --- k-anonymity audit -------------------------------------------------------

KANON_K = 5


def dq_kanon(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit over the customer table: treat (nation, market
    segment, account-balance rounded to $1000) as the quasi-identifier and
    surface the equivalence classes smaller than k=5 — the re-identification
    screen a training-data governance pass runs before releasing joined
    user-level data. Returns the 50 smallest classes (violations first);
    bucketing is integer floor division, so every cell is exact.

    100 TB shape: one combinable groupBy over the scan; the audit output
    is bounded by the QI-combination count, not the row count."""
    cust = load_table(spark, sf, "customer")
    bucket = F.expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)")
    return (
        cust.groupBy(
            F.col("c_nationkey").cast("int").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            bucket.alias("bal_bucket_k"),
        )
        .agg(F.count(F.lit(1)).alias("class_n"))
        .select(
            "nationkey",
            "mktsegment",
            "bal_bucket_k",
            "class_n",
            (F.col("class_n") < KANON_K).alias("violates_k"),
        )
        .orderBy(
            F.col("class_n").asc(),
            F.col("nationkey").asc(),
            F.col("mktsegment").asc(),
            F.col("bal_bucket_k").asc(),
        )
        .limit(50)
    )


DQ_KANON_SQL = f"""
SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
       c_mktsegment AS mktsegment,
       CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket_k,
       CAST(count(*) AS BIGINT) AS class_n,
       count(*) < {KANON_K} AS violates_k
FROM customer
GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000.0) AS BIGINT)
ORDER BY class_n ASC, nationkey ASC, mktsegment ASC, bal_bucket_k ASC
LIMIT 50
"""


# --- full referential-integrity audit ----------------------------------------

# every FK edge of the schema: (edge name, child table, child key,
# parent table, parent key)
_FK_EDGES = [
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def dq_referential(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit of the ENTIRE foreign-key graph: one row
    per FK edge with child row count, orphan count (child keys with no
    parent) and distinct orphan keys. The whole-schema complement to
    dq_expectations' spot checks — the audit a warehouse runs after every
    intake batch.

    Scale: ONE scan per child table, probing every parent key set of that
    table's FK edges with left joins inside the same map stage, then a
    row-level ``stack`` to (edge, key, miss) feeding ONE grouped audit
    aggregate for the whole graph — child data is never shuffled (the
    only exchanges are the tiny post-probe aggregate pair and the 7-row
    sort). Join strategy is left to Catalyst stats: dimension-sized
    parent key sets broadcast; a fact-sized parent (orders under lineitem
    at 100 TB) exceeds the broadcast threshold and falls back to a
    shuffle join on exactly that edge, which is the correct plan there.
    Parent keys are primary keys (uniqueness is audited separately by
    dq_expectations), so the left joins cannot duplicate child rows and
    null-hit == NOT EXISTS. n_orphan_keys stays a scale-safe exact
    count_distinct (spills instead of collecting orphan sets). Output is
    O(edges).

    Measured wave floor at sf0.1 (r08, statusTracker job decomposition):
    8 job rounds = 6 broadcast key-set builds (7 edges; AQE already reuses
    the nation build across its two children — alias names are ignored by
    plan canonicalization) + 1 union probe/partial-agg wave + 1 final
    agg+sort (the presentation sort is fused below; orderBy cost a 9th
    round). The builds are irreducible without forcing worse plans: fusing
    parent key sets into one broadcast union would push the fact-sized
    orders edge over the threshold and demote ALL lineitem probes to
    shuffle joins at scale. ~8 x the ~0.15 s local[32] AQE job floor is
    the residual latency — amortizes at 100x data."""
    by_child: dict[str, list[tuple[int, str, str, str, str]]] = {}
    for eid, (name, child, ckey, parent, pkey) in enumerate(_FK_EDGES):
        by_child.setdefault(child, []).append((eid, name, ckey, parent, pkey))

    tall = None
    for child, edges in by_child.items():
        df = load_table(spark, sf, child).select(
            *sorted({e[2] for e in edges})
        )
        parts = []
        for eid, name, ckey, parent, pkey in edges:
            pk = load_table(spark, sf, parent).select(
                F.col(pkey).alias(f"_pk{eid}"), F.lit(1).alias(f"_hit{eid}")
            )
            df = df.join(pk, F.col(ckey) == F.col(f"_pk{eid}"), "left").drop(
                f"_pk{eid}"
            )
            parts.append(
                f"{eid}, CAST({ckey} AS BIGINT), "
                f"CAST((_hit{eid} IS NULL) AS INT)"
            )
        t = df.select(
            F.expr(
                f"stack({len(edges)}, {', '.join(parts)}) AS (eid, k, miss)"
            )
        )
        tall = t if tall is None else tall.unionByName(t)
    # completeness sentinels: one (eid, NULL, 0) row per edge unioned into
    # the tall frame guarantees every edge groups to a row even when its
    # child table is empty (the oracle's ungrouped aggregates always yield
    # one row per edge); n_child subtracts the sentinel back out. This is a
    # 7-row local scan in the same union wave — unlike a completeness join,
    # it costs no extra AQE round.
    sentinels = spark.range(len(_FK_EDGES)).select(
        F.col("id").cast("int").alias("eid"),
        F.lit(None).cast("bigint").alias("k"),
        F.lit(0).alias("miss"),
    )
    agg = (
        tall.unionByName(sentinels)
        .groupBy("eid")
        .agg(
            (F.count(F.lit(1)) - F.lit(1)).alias("n_child"),
            F.sum("miss").alias("n_orphans"),
            F.count_distinct(F.when(F.col("miss") == 1, F.col("k"))).alias(
                "n_orphan_keys"
            ),
        )
    )
    name_map = F.create_map(
        *[
            x
            for eid, (name, *_) in enumerate(_FK_EDGES)
            for x in (F.lit(eid), F.lit(name))
        ]
    )
    # presentation sort WITHOUT a range exchange: the audit is <= |edges|
    # rows, so coalesce(1) + sortWithinPartitions fuses the sort into the
    # final aggregate's single AQE-coalesced partition — measured one whole
    # job round saved vs orderBy (9 -> 8; orderBy adds a range-partition
    # sampling round even for 7 rows). Same total order: one partition,
    # globally sorted.
    return (
        agg.select(
            name_map[F.col("eid")].alias("fk_edge"),
            "n_child",
            "n_orphans",
            "n_orphan_keys",
            (F.col("n_orphans") == 0).alias("intact"),
        )
        .coalesce(1)
        .sortWithinPartitions("fk_edge")
    )


def _referential_sql() -> str:
    parts = []
    for name, child, ckey, parent, pkey in _FK_EDGES:
        parts.append(f"""
SELECT '{name}' AS fk_edge,
       (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS n_child,
       CAST(count(*) AS BIGINT) AS n_orphans,
       CAST(count(DISTINCT k) AS BIGINT) AS n_orphan_keys,
       count(*) = 0 AS intact
FROM (SELECT {ckey} AS k FROM {child} c
      WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                        WHERE p.{pkey} = c.{ckey}))""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY fk_edge"


QUERIES = [
    Query("dq_expectations", dq_expectations, DQ_SQL, "data-quality audit: uniqueness, FK integrity, ranges, null/derived-column checks"),
    Query("dq_referential", dq_referential, _referential_sql(), "whole-schema FK orphan audit, one row per edge"),
    Query("dq_drift", dq_drift, DQ_DRIFT_SQL, "10-bin PSI drift between event-stream halves, per event_type"),
    Query("dq_benford", dq_benford, DQ_BENFORD_SQL, "Benford first-digit audit of prices, chi-square terms"),
    Query("dq_freshness", dq_freshness, DQ_FRESHNESS_SQL, "per-source freshness + arrival-rate monitor, integer-exact"),
    Query("dq_kanon", dq_kanon, DQ_KANON_SQL, "k-anonymity audit of quasi-identifier classes"),
]
