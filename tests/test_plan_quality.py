"""Plan-shape assertions: the 100 TB design requires pushdown at the scan,
broadcast joins for dimension tables, and codegen over narrow pipelines.
These tests fail if a code change regresses the physical plan, not just the
results."""

from pyspark.sql import functions as F

from orc_spark.plans.explain import (
    count_broadcast_joins,
    count_codegen_stages,
    has_pushed_filters,
    pruned_columns,
)
from orc_spark.plans.relational import r1_pricing_summary, r3_shipping_priority
from orc_spark.plans.text_q import tx_tokens
from orc_spark.sources.tables import load_table


def test_r1_filter_pushdown_and_pruning(spark, sf_small):
    df = r1_pricing_summary(spark, sf_small)
    assert has_pushed_filters(df), "l_shipdate predicate must reach the parquet scan"
    cols = set(pruned_columns(df))
    # the scan must NOT read join keys/columns the query never touches
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert {"l_quantity", "l_extendedprice", "l_discount", "l_tax"} <= cols


def test_r3_broadcasts_dimensions(spark, sf_small):
    df = r3_shipping_priority(spark, sf_small)
    # customer is explicitly broadcast; orders side is under the threshold at
    # test scale so Catalyst may broadcast it too — at least one BHJ required
    assert count_broadcast_joins(df) >= 1


def test_narrow_map_is_codegen(spark, sf_small):
    df = tx_tokens(spark, sf_small)
    assert count_codegen_stages(df) >= 1
    cols = set(pruned_columns(df))
    assert "lang" not in cols and "source" not in cols, "unused columns must be pruned"


def test_projection_prunes_scan(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey").distinct()
    cols = pruned_columns(li)
    assert cols == ["l_orderkey"], f"2-column projection read {cols}"


def test_r9_brand_filter_pushed_both_scans(spark, sf_small):
    from orc_spark.plans.relational3 import r9_scalar_subquery

    from orc_spark.plans.explain import formatted_plan

    df = r9_scalar_subquery(spark, sf_small)
    plan = formatted_plan(df)
    # both part scans carry the brand predicate; both joins broadcast
    assert plan.count("EqualTo(p_brand,Brand#1)") >= 2
    assert count_broadcast_joins(df) >= 2


def test_tr_hier_rollup_single_exchange(spark, sf_small):
    from orc_spark.plans.rollup_q import tr_hier_rollup

    from orc_spark.plans.explain import formatted_plan

    df = tr_hier_rollup(spark, sf_small)
    plan = formatted_plan(df)
    # grouping sets = Expand + ONE partial/final hash agg pair → 1 shuffle
    assert plan.count("Expand") >= 1
    assert plan.count("+- Exchange") == 1, plan


def test_dp_sample_no_shuffle_before_agg(spark, sf_small):
    from orc_spark.plans.relational3 import dp_sample

    from orc_spark.plans.explain import formatted_plan

    df = dp_sample(spark, sf_small)
    plan = formatted_plan(df)
    # map-side filter + partial agg; the only exchange is the 1-row final agg
    assert plan.count("+- Exchange") == 1, plan
    cols = set(pruned_columns(df))
    assert "l_shipdate" not in cols and "l_partkey" not in cols


def test_ts_resample_two_windows_one_shuffle_family(spark, sf_small):
    from orc_spark.plans.rollup_q import ts_resample

    from orc_spark.plans.explain import formatted_plan

    df = ts_resample(spark, sf_small)
    plan = formatted_plan(df)
    # all window work partitions by user_id; no join in the interpolation path
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ann_query_filter_pushed_to_scan(spark, sf_small):
    """The ANN query-set collect must be a bounded, pushed-down scan — the
    corpus itself never reaches the driver (VERDICT r01 item 3)."""
    from orc_spark.plans.dedup_q import ANN_N_QUERIES
    from orc_spark.plans.explain import formatted_plan
    from orc_spark.sources.tables import load_table

    # the assertion is about the COLD scan plan; another test may have
    # cached the table, which would hide the parquet PushedFilters node
    spark.catalog.clearCache()
    q = (
        load_table(spark, sf_small, "embeddings")
        .where(F.col("vec_id") < ANN_N_QUERIES)
        .select("vec_id", "embedding")
    )
    plan = formatted_plan(q)
    assert "PushedFilters" in plan and "LessThan(vec_id" in plan, plan


def test_dd_embcos_block_grid_is_distributed(spark, sf_small):
    """dd_embcos: the block grid is derived ARITHMETICALLY in one Generate
    (r16 — explode j in [0, nb), cell = (min(blk,j), max(blk,j))): one
    embeddings scan, ZERO joins, and exactly one wide shuffle (the (ba,bb)
    groupBy feeding the matmul cells); no driver-side corpus collect."""
    import re

    from orc_spark.plans.dedup_q import dd_embcos
    from orc_spark.plans.explain import formatted_plan

    df = dd_embcos(spark, sf_small)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1, plan
    assert plan.count("+- Exchange") == 1, plan
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsInArrow" in plan


def test_dd_ngram_bucket_is_subdivided(spark, sf_small):
    """dd_ngram_jaccard groups by (bucket, block_a, block_b) — per-cell
    population is bounded by bucket/NB on each side even when a length
    bucket's population grows with the corpus (VERDICT r01 item 4)."""
    from orc_spark.plans.dedup_q import dd_ngram_jaccard
    from orc_spark.plans.explain import formatted_plan

    df = dd_ngram_jaccard(spark, sf_small)
    plan = formatted_plan(df)
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsInArrow" in plan
    # the grouped-map shuffle key must carry the grid blocks, not the
    # bucket alone
    import re
    m = re.search(r"hashpartitioning\(bucket#\d+L?, (ba#\d+), (bb#\d+)", plan)
    assert m, plan


def test_ann_srp_sketch_narrow_and_codegen(spark, sf_small):
    """ann_srp_pairs: the sketch must be ONE narrow Arrow pass (no join or
    shuffle may widen with corpus·dims·planes — the broadcast-join
    formulation materialized 20M rows at sf0.1), and no CodegenFallback
    HOF fold may appear anywhere in the plan."""
    from orc_spark.plans.dedup_q import ann_srp_pairs
    from orc_spark.plans.explain import formatted_plan

    df = ann_srp_pairs(spark, sf_small)
    plan = formatted_plan(df)
    assert "ArrayAggregate" not in plan, "HOF fold must not appear in the plan"
    assert "MapInPandas" in plan, plan
    # the sketch materializes ONCE into the cached band table; both sides
    # of the candidate self-join read the cache
    assert "InMemoryRelation" in plan, plan


def test_cu_pipeline_single_docs_scan_family(spark, sf_small):
    """cu_pipeline composes quality gate + keep-best window + LSH drop; the
    near-dup drop joins must be semi/hash joins, never a cartesian."""
    from orc_spark.plans.curation_q import cu_pipeline
    from orc_spark.plans.explain import formatted_plan

    df = cu_pipeline(spark, sf_small)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ev_retention_two_exchanges(spark, sf_small):
    """ev_retention: the cohort anchor is a window min over user_id, and the
    per-user dedup must REUSE that partitioning (HashPartitioning(user_id)
    satisfies clustering on (user_id, cohort, age)) — so the whole query is
    exactly two exchanges: events→user_id, then the tiny cohort×age rollup.
    Three exchanges means the agg+join-back shape regressed (VERDICT r03)."""
    from orc_spark.plans.explain import formatted_plan
    from orc_spark.plans.relational3 import ev_retention

    df = ev_retention(spark, sf_small)
    plan = formatted_plan(df)
    assert plan.count("+- Exchange") == 2, plan
    assert "Join" not in plan, "window-min shape must not join back"


def test_cu_mixture_single_scan(spark, sf_small):
    """cu_mixture: one documents scan feeds rank AND per-language count
    (both windows share the lang exchange); regression = a second FileScan
    (the old agg+join-back shape) or >3 exchanges."""
    from orc_spark.plans.curation_q import cu_mixture
    from orc_spark.plans.explain import formatted_plan

    import re

    df = cu_mixture(spark, sf_small)
    plan = formatted_plan(df)
    # formatted plans list each node in the tree AND the detail section —
    # count the numbered detail entries
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan


def test_dq_expectations_one_scan_per_table(spark, sf_small):
    """dq_expectations: 5 tables, 6 checks, exactly 6 scans (5 audit scans
    + the customer broadcast build) — both lineitem checks must ride one
    scan and the FK check must not re-scan orders."""
    from orc_spark.plans.dq_q import dq_expectations
    from orc_spark.plans.explain import formatted_plan

    import re

    df = dq_expectations(spark, sf_small)
    plan = formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 6, plan


def test_recurrence_harness_partitions_by_cores(spark, sf_small):
    """partitioned_group_scan: the recurrence stage must hash-partition on the
    run key into defaultParallelism partitions (cores-not-bytes) and execute
    as ONE mapInPandas per partition, not one grouped-map call per run."""
    from orc_spark.plans.explain import formatted_plan
    from orc_spark.plans.stateful_q import st_pid_replay

    df = st_pid_replay(spark, sf_small)
    plan = formatted_plan(df)
    assert "MapInPandas" in plan, plan
    assert "FlatMapGroupsInPandas" not in plan
    n = spark.sparkContext.defaultParallelism
    assert f"hashpartitioning(user_id#" in plan and f", {n})" in plan, plan


def test_cdc_scd2_single_exchange(spark, sf_small):
    from orc_spark.plans.cdc_q import cdc_scd2

    from orc_spark.plans.explain import formatted_plan

    df = cdc_scd2(spark, sf_small)
    plan = formatted_plan(df)
    # one window family partitioned by o_custkey: exactly one shuffle
    assert plan.count("+- Exchange") == 1, plan


def test_ev_anomaly_single_exchange_and_pruning(spark, sf_small):
    from orc_spark.plans.cdc_q import ev_anomaly

    from orc_spark.plans.explain import formatted_plan

    df = ev_anomaly(spark, sf_small)
    plan = formatted_plan(df)
    assert plan.count("+- Exchange") == 1, plan
    cols = set(pruned_columns(df))
    assert "props" not in cols and "event_type" not in cols


def test_tfidf_scan_pruned_and_single_docs_scan(spark, sf_small):
    from orc_spark.plans.ir_q import tx_tfidf

    from orc_spark.plans.explain import formatted_plan

    df = tx_tfidf(spark, sf_small)
    plan = formatted_plan(df)
    cols = set(pruned_columns(df))
    assert "lang" not in cols and "source" not in cols
    # N attaches as a broadcast (1-row aggregate), never a shuffle join,
    # and the top-k filter runs as a pushed WindowGroupLimit
    assert "BroadcastNestedLoopJoin" in plan and "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_lttb_no_join_one_repartition(spark, sf_small):
    from orc_spark.plans.timeseries_q import ts_lttb

    from orc_spark.plans.explain import formatted_plan

    df = ts_lttb(spark, sf_small)
    plan = formatted_plan(df)
    # recurrence harness: one hash repartition, sort within partitions, no joins
    assert "Join" not in plan, plan
    assert plan.count("+- Exchange") == 1, plan


def test_autocorr_single_pass(spark, sf_small):
    import re

    from orc_spark.plans.timeseries_q import ts_autocorr

    from orc_spark.plans.explain import formatted_plan

    df = ts_autocorr(spark, sf_small)
    plan = formatted_plan(df)
    # lag windows all partition by user_id; no join anywhere in the plan
    assert "Join" not in plan, plan
    # single-pass shape (r08 verdict item 2): ONE scan and ONE window sort
    # computing all three lag columns, stack-unpivoted into one
    # groupBy(user_id, lag) — a per-lag union would re-execute the scan +
    # window sort once per lag
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Sort", plan)) == 1, plan


def test_r15_broadcasts_both_subqueries(spark, sf_small):
    from orc_spark.plans.relational2 import r15_idle_customers

    from orc_spark.plans.explain import formatted_plan

    df = r15_idle_customers(spark, sf_small)
    plan = formatted_plan(df)
    # scalar avg + cutoff attach as broadcasts; anti join must not SMJ the
    # big side at this scale
    assert plan.count("BroadcastNestedLoopJoin") >= 2


def _plan_stats(df):
    import re

    from orc_spark.plans.explain import formatted_plan

    p = formatted_plan(df)
    return (
        len(re.findall(r"\(\d+\) Scan parquet", p)),
        len(re.findall(r"\(\d+\) Exchange", p)),
        p,
    )


def test_ev_ltv_single_scan_light_anchor(spark, sf_small):
    """ev_ltv: the cohort anchor is a checkpointed map-combined groupBy, so
    the only live scan is the purchase subset; regression = re-reading
    events for cohort sizes (the 3-scan shape) or >5 exchanges."""
    from orc_spark.plans.cdc_q import ev_ltv

    scans, ex, plan = _plan_stats(ev_ltv(spark, sf_small))
    assert scans == 1, plan
    assert ex <= 5, plan


def test_ev_paths_single_session_pass(spark, sf_small):
    """ev_paths: the session total derives from the per-path aggregate —
    sessionization must run exactly once (checkpointed rollup upstream)."""
    from orc_spark.plans.cdc_q import ev_paths

    scans, ex, plan = _plan_stats(ev_paths(spark, sf_small))
    assert ex <= 2, plan
    assert "CartesianProduct" not in plan


def test_ev_rfm_single_stream_pass(spark, sf_small):
    """ev_rfm: the scored plan reads the checkpointed per-user aggregate
    (zero parquet scans — the event stream was scanned once at checkpoint
    time) and adds only the segment-rollup exchange + the coalesced
    presentation sort; quintile scoring is literal comparisons (r15)."""
    from orc_spark.plans.cdc_q import ev_rfm

    scans, ex, plan = _plan_stats(ev_rfm(spark, sf_small))
    assert scans == 0, plan
    assert ex <= 2, plan


def test_gr_triangles_edges_materialized_once(spark, sf_small):
    """gr_triangles: the sparsified edge list is checkpointed before the
    3-way join — without it Catalyst inlines the pair pipeline per consumer
    (45 exchanges observed); the final plan stays under 8."""
    from orc_spark.plans.graph_q import gr_triangles

    scans, ex, plan = _plan_stats(gr_triangles(spark, sf_small))
    assert ex <= 8, plan
    assert "CartesianProduct" not in plan


def test_sk_kmv_one_distinct_pass(spark, sf_small):
    """sk_kmv: sketch build, exact counts and the direct verification
    sketch all read the one checkpointed distinct pass."""
    from orc_spark.plans.relational3 import sk_kmv

    scans, ex, plan = _plan_stats(sk_kmv(spark, sf_small))
    assert ex <= 10, plan


def test_tx_ngram_lm_doc_bigrams_materialized_once(spark, sf_small):
    """tx_ngram_lm: the doc-bigram table is checkpointed, so the token
    explode + lead window runs once (not once per consumer)."""
    from orc_spark.plans.ir_q import tx_ngram_lm

    scans, ex, plan = _plan_stats(tx_ngram_lm(spark, sf_small))
    assert ex <= 4, plan


def test_r17_broadcast_snowflake(spark, sf_small):
    """r17: supplier/customer nation maps and both nation copies broadcast;
    only the lineitem⋈orders equi-join may shuffle."""
    from orc_spark.plans.explain import count_broadcast_joins
    from orc_spark.plans.relational2 import r17_nation_volume

    df = r17_nation_volume(spark, sf_small)
    scans, ex, plan = _plan_stats(df)
    assert count_broadcast_joins(df) >= 4, plan
    assert ex <= 2, plan


def test_r20_predicate_in_join_stage(spark, sf_small):
    """r20: the disjunctive bracket predicate is a row filter over the
    broadcast join output — no extra exchange beyond the final 1-row agg."""
    from orc_spark.plans.explain import count_broadcast_joins
    from orc_spark.plans.relational2 import r20_bracket_revenue

    df = r20_bracket_revenue(spark, sf_small)
    scans, ex, plan = _plan_stats(df)
    assert count_broadcast_joins(df) >= 1, plan
    assert ex <= 1, plan


def test_ts_mannkendall_equijoin_not_cartesian(spark, sf_small):
    """ts_mannkendall: the pair join is an equi-join on user_id (the range
    condition rides as a join filter) — a cartesian/nested-loop product
    would be quadratic in the STREAM, not per-series."""
    from orc_spark.plans.timeseries_q import ts_mannkendall

    scans, ex, plan = _plan_stats(ts_mannkendall(spark, sf_small))
    assert "CartesianProduct" not in plan, plan


def test_io_partition_prune_static_filters(spark, sf_small):
    """io_partition_prune: both probe predicates must be STATIC partition
    filters (directory skipping before any file IO) — a broadcast bound
    would demote them to runtime filters."""
    from orc_spark.plans.e2e_q import io_partition_prune
    from orc_spark.plans.explain import formatted_plan

    plan = formatted_plan(io_partition_prune(spark, sf_small))
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf, plan
    line = pf[0]
    assert "event_type" in line and "day" in line and "purchase" in line, line


def test_mb_rules_no_basket_self_join(spark, sf_small):
    """mb_rules: pair generation is an in-row double explode over the
    checkpointed basket table — the basket stream is never self-joined, so
    the plan has no SortMergeJoin and at most 4 exchanges (basket groupBy,
    item counts, pair counts, final sort)."""
    from orc_spark.plans.graph_q import mb_rules

    scans, ex, plan = _plan_stats(mb_rules(spark, sf_small))
    assert ex <= 4, plan
    assert "SortMergeJoin" not in plan, plan


def test_tx_bm25_tf_computed_twice_not_four_times(spark, sf_small):
    """tx_bm25: doc length is a window over the tf chain (sharing the top-k
    window's doc_id partitioning) and the corpus totals are one global agg,
    so the token-explode tf aggregate appears twice, not four times."""
    from orc_spark.plans.ir_q import tx_bm25

    scans, ex, plan = _plan_stats(tx_bm25(spark, sf_small))
    assert scans <= 2, plan
    assert ex <= 6, plan


def test_r14_single_pass_over_lineitem_orders(spark, sf_small):
    """r14: the lone late supplier comes out of the per-order aggregate, so
    the lineitem-orders join is consumed exactly once (no distinct +
    join-back of a second lo pass)."""
    from orc_spark.plans.relational2 import r14_waiting_supplier

    scans, ex, plan = _plan_stats(r14_waiting_supplier(spark, sf_small))
    assert scans <= 3, plan
    assert ex <= 4, plan


def test_dd_minhash_estimate_is_codegen(spark, sf_small):
    """dd_minhash_pairs: the jaccard estimate is 16 static element
    compares — no HOF CodegenFallback anywhere in the plan."""
    from orc_spark.plans.dedup_q import dd_minhash_pairs

    scans, ex, plan = _plan_stats(dd_minhash_pairs(spark, sf_small))
    assert "zip_with" not in plan and "CodegenFallback" not in plan, plan
    assert ex <= 4, plan


def test_dd_containment_gram_build_is_narrow(spark, sf_small):
    """dd_containment: per-doc trigram sets are built in one mapInPandas
    pass (no explode->regroup shuffle, no collect_set); the only extra
    exchange is the deliberate round-robin repartition that spreads the
    single-split documents scan across cores before the Python pass."""
    from orc_spark.plans.dedup_q import dd_containment

    scans, ex, plan = _plan_stats(dd_containment(spark, sf_small))
    assert ex <= 5, plan
    assert "RoundRobinPartitioning" in plan, plan
    assert "collect_set" not in plan, plan


def test_ts_m4_single_scan_single_exchange(spark, sf_small):
    """ts_m4: one events scan, one user-hash exchange — the (user, bucket)
    groupBy must reuse the window's user partitioning, not add a shuffle."""
    from orc_spark.plans.timeseries_q import ts_m4

    scans, ex, plan = _plan_stats(ts_m4(spark, sf_small))
    assert scans == 1, plan
    assert ex <= 1, plan


def test_ev_bot_detect_single_exchange(spark, sf_small):
    """ev_bot_detect: burst window, lag window and per-user groupBy all
    reuse one user-hash exchange (plus the count agg's own; the query's
    orderBy is presentation-only, so assert on the pre-sort shape)."""
    from pyspark.sql import functions as F2

    from orc_spark.plans.cdc_q import ev_bot_detect

    df = ev_bot_detect(spark, sf_small)
    scans, ex, plan = _plan_stats(df.select(F2.count(F2.lit(1))))
    assert scans == 1, plan
    assert ex <= 2, plan


def test_gr_bfs_rounds_checkpointed(spark, sf_small, monkeypatch):
    """gr_bfs DISTRIBUTED path (cap forced off): each round's dist frame is
    checkpointed (two consumers per round — unchecked the lineage doubles
    every round: 48 exchanges observed; checkpointed, the final visible
    plan is the last merge + group only)."""
    import orc_spark.plans.graph_q as gq

    monkeypatch.setattr(gq, "GRAPH_LOCAL_FINISH_EDGES", -1)
    scans, ex, plan = _plan_stats(gq.gr_bfs(spark, sf_small))
    assert ex <= 3, plan
    assert "CartesianProduct" not in plan


def test_gr_linkpred_bounded_wedge_join(spark, sf_small, monkeypatch):
    """gr_linkpred DISTRIBUTED path (cap forced off): wedge enumeration is
    an equi-join on the center (never cartesian); the plan stays bounded."""
    import orc_spark.plans.graph_q as gq

    monkeypatch.setattr(gq, "GRAPH_LOCAL_FINISH_EDGES", -1)
    scans, ex, plan = _plan_stats(gq.gr_linkpred(spark, sf_small))
    assert ex <= 12, plan
    assert "CartesianProduct" not in plan


def test_ts_theilsen_equijoin_not_cartesian(spark, sf_small):
    """ts_theilsen: the pair generation must be a user_id equi-join with
    the ts inequality as a post-join filter — never a cartesian."""
    from orc_spark.plans.timeseries_q import ts_theilsen

    scans, ex, plan = _plan_stats(ts_theilsen(spark, sf_small))
    assert "CartesianProduct" not in plan
    assert ex <= 8, plan


def test_dd_semdedup_no_cartesian(spark, sf_small):
    """dd_semdedup: block tagging is two broadcast joins; the only wide op
    is the (label, block, block) cell shuffle feeding the Arrow kernel."""
    from orc_spark.plans.dedup_q import dd_semdedup

    scans, ex, plan = _plan_stats(dd_semdedup(spark, sf_small))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_io_compaction_bounded_shuffles(spark, sf_small):
    """io_compaction: per-file rows groupBy, manifest join, the
    per-partition pack window and the final bin groupBy — 4 exchanges, no
    global sort (the window partitions by layout partition)."""
    from orc_spark.plans.e2e_q import io_compaction

    scans, ex, plan = _plan_stats(io_compaction(spark, sf_small))
    assert scans == 2, plan
    assert ex <= 4, plan
    assert "CartesianProduct" not in plan


def test_tx_zipf_single_docs_scan(spark, sf_small):
    """tx_zipf: one documents scan; tf groupBy, cf groupBy and the
    vocabulary rank sort are the only exchanges (rank is a sort of the
    VOCAB, not the corpus)."""
    from orc_spark.plans.ir_q import tx_zipf

    scans, ex, plan = _plan_stats(tx_zipf(spark, sf_small))
    assert scans == 1, plan
    assert ex <= 3, plan


def test_gr_label_prop_rounds_checkpointed(spark, sf_small, monkeypatch):
    """gr_label_prop DISTRIBUTED path: per-round label frames are
    checkpointed, so the visible plan is the last round + final agg."""
    import orc_spark.plans.graph_q as gq

    monkeypatch.setattr(gq, "GRAPH_LOCAL_FINISH_EDGES", -1)
    scans, ex, plan = _plan_stats(gq.gr_label_prop(spark, sf_small))
    assert ex <= 3, plan
    assert "CartesianProduct" not in plan


def test_tx_hashclf_broadcast_model(spark, sf_small):
    """tx_hashclf: ONE documents scan; the weight gather must be a
    broadcast join (the model table never shuffles the token stream)."""
    from orc_spark.plans.ir_q import tx_hashclf

    scans, ex, plan = _plan_stats(tx_hashclf(spark, sf_small))
    assert scans == 1, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert ex <= 3, plan


def test_ts_outlier_mad_single_scan(spark, sf_small):
    """ts_outlier_mad: median, MAD and flag counts chain over ONE events
    scan and one user-hash exchange (the groupBy-join shape scanned and
    re-aggregated per consumer)."""
    from pyspark.sql import functions as F2

    from orc_spark.plans.timeseries_q import ts_outlier_mad

    df = ts_outlier_mad(spark, sf_small)
    scans, ex, plan = _plan_stats(df.select(F2.count(F2.lit(1))))
    assert scans == 1, plan
    assert ex <= 2, plan


def test_ev_feature_snapshot_single_exchange(spark, sf_small):
    """ev_feature_snapshot: all trailing-window features share ONE
    user-hash exchange + sort; the label filter adds no second pass
    (orderBy is presentation-only — assert on the pre-sort shape)."""
    from pyspark.sql import functions as F2

    from orc_spark.plans.cdc_q import ev_feature_snapshot

    df = ev_feature_snapshot(spark, sf_small)
    scans, ex, plan = _plan_stats(df.select(F2.count(F2.lit(1))))
    assert scans == 1, plan
    assert ex <= 1, plan


def test_cu_chunk_no_shuffle(spark, sf_small):
    """cu_chunk: pure narrow map — no Exchange anywhere (the orderBy in the
    query is presentation-only; assert on the pre-sort plan shape)."""
    from pyspark.sql import functions as F2

    from orc_spark.plans.curation_q import cu_chunk

    df = cu_chunk(spark, sf_small)
    # strip the final presentation sort: count exchanges feeding it
    scans, ex, plan = _plan_stats(df.select(F2.count(F2.lit(1))))
    # one partial+final count agg exchange is expected; the chunking itself
    # must add none
    assert scans == 1, plan
    assert ex <= 1, plan


def test_dq_referential_no_child_shuffle(spark, sf_small):
    """dq_referential: every FK probe is a broadcast hash join inside the
    child's scan stage and child data never shuffles — the only exchanges
    are the tiny post-probe aggregate pair (distinct-agg). The 7-row
    presentation sort must be FUSED (coalesce + sortWithinPartitions, no
    range exchange — an orderBy costs a whole extra AQE job round).
    Regression = a SortMergeJoin/ShuffledHashJoin on a child table, a
    range-partition exchange, or >3 exchanges (the old shape was 2
    aggregates + a crossJoin per edge: ~21 AQE job rounds)."""
    from orc_spark.plans.dq_q import dq_referential
    from orc_spark.plans.explain import formatted_plan

    df = dq_referential(spark, sf_small)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    scans, ex, _ = _plan_stats(df)
    # 5 child scans + 7 parent broadcast-build scans
    assert scans == 12, plan
    assert ex <= 3, plan


def test_cu_corpus_report_two_pipelines(spark, sf_small):
    """cu_corpus_report: the Gopher fail count is a column expression
    folded into the base documents aggregate, so the whole report is two
    pipelines — one documents scan-aggregate + the (cached) LSH signature
    scan. Regression = a third documents scan (the old shape ran
    tx_gopher_quality as its own scan: 2.3 s vs 1.1 s oracle)."""
    import re

    from orc_spark.plans.curation_q import cu_corpus_report
    from orc_spark.plans.explain import formatted_plan

    df = cu_corpus_report(spark, sf_small)
    plan = formatted_plan(df)
    # unique parquet scan NODES (the cached signature build's scan renders
    # under each InMemoryTableScan consumer but is one node / one execution)
    scan_ids = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scan_ids) <= 2, plan


def test_sk_countmin_probe_shape(spark, sf_small):
    """r11 statusTracker decomposition: the probe set must be a
    single-partition Range-derived frame (parallelize spread 5 rows over 32
    partitions -> 32 near-empty tasks in every probe stage; coalesce(1) on
    the parallelize measured 2.3x WORSE than Range), and the exact-count
    side must filter to the probed users BEFORE its groupBy so the
    predicate reaches the parquet scan instead of shuffling every user's
    count."""
    from orc_spark.plans.explain import formatted_plan
    from orc_spark.plans.relational3 import sk_countmin

    plan = formatted_plan(sk_countmin(spark, sf_small))
    assert "Range (0, 1" in plan, plan
    # the true_n scan carries the IN-list predicate down to parquet
    assert "user_id IN" in plan or "In(user_id" in plan, plan


def _cdc_text_exchanges(spark, sf_small):
    """Exchange blocks of dd_cdc_chunks' plan, split into (spread, analytic
    carrying text, analytic ints only). The cores-not-bytes spread is the
    caller's own REPARTITION_BY_NUM (doc_id-keyed since r15 so downstream
    doc_id-clustered operators reuse it); every planner-inserted
    ENSURE_REQUIREMENTS hashpartitioning exchange is analytic."""
    import re

    from orc_spark.plans.dedup_q import dd_cdc_chunks
    from orc_spark.plans.explain import formatted_plan

    plan = formatted_plan(dd_cdc_chunks(spark, sf_small))
    exchanges = [
        b
        for b in re.split(r"\n\n", plan)
        if re.match(r"\(\d+\) Exchange", b) and "hashpartitioning" in b
    ]
    spread = [b for b in exchanges if "REPARTITION_BY_NUM" in b]
    analytic = [b for b in exchanges if "ENSURE_REQUIREMENTS" in b]
    texty = [b for b in analytic if re.search(r"\b(text|tb|t)#\d+", b)]
    return spread, texty, [b for b in analytic if b not in texty]


def test_ev_rfm_has_no_global_sort(spark, sf_small):
    """ev_rfm scale contract (VERDICT r14 directive 2): quintile scoring
    must not run ntile over an unpartitioned window — the users frame may
    cross NO single-partition exchange and no Window at all; the only
    analytic exchange is the per-user groupBy, and the 125-row
    presentation sort must fuse into the coalesced final partition (no
    rangepartitioning)."""
    from orc_spark.plans.cdc_q import ev_rfm
    from orc_spark.plans.explain import formatted_plan

    plan = formatted_plan(ev_rfm(spark, sf_small))
    assert "Window" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_dd_cdc_chunks_text_stays_out_of_analytic_shuffles(spark, sf_small):
    """dd_cdc_chunks' scale contract, BROADCAST regime (cuts fits the
    threshold — the tiny-sf / early-production shape): every
    planner-inserted hashpartitioning exchange (the digest windows, the
    per-doc rollup) carries ints only — a first cut shipped the full text
    column through the lead window's exchange and measured 8x slower at
    sf0.1. Text may ride only the doc_id-keyed cores-not-bytes spread
    (the shared gram-family pattern); since that spread satisfies the
    cut-list fold's distribution, the fold needs no exchange at all."""
    spread, texty, ints_only = _cdc_text_exchanges(spark, sf_small)
    assert len(ints_only) >= 2  # ≥1 digest window + doc rollup
    assert not texty, texty[0] if texty else None
    assert spread and all("doc_id" in b for b in spread), spread


def test_dd_cdc_chunks_shuffle_regime_at_volume(spark, sf_small):
    """dd_cdc_chunks' scale contract, SHUFFLE regime (ADVICE r14): when the
    folded cut lists outgrow the broadcast threshold (production volume —
    forced here via autoBroadcastJoinThreshold=-1), the cuts join-back
    falls to a shuffle join — and since r15's doc_id-keyed spread both
    sides arrive co-partitioned, so the join inserts NO text exchange:
    text rides only the spread itself in this regime too. Every
    planner-inserted analytic exchange must still be ints-only."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spread, texty, ints_only = _cdc_text_exchanges(spark, sf_small)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert not texty, texty[0] if texty else None
    assert len(ints_only) >= 2
    assert spread and all("doc_id" in b for b in spread), spread


def test_spread_small_scan_is_scale_aware(spark, sf_small, tmp_path):
    """spread_small_scan (r14): the gram family's cores-not-bytes
    pre-explode repartition must fire for a single-split tiny corpus but
    become an IDENTITY at production volume (a corpus that already scans
    as >= parallelism splits) — an unconditional RoundRobin there would
    shuffle the entire corpus for nothing."""
    import os

    from orc_spark.plans.dedup_q import dd_minhash_sig
    from orc_spark.plans.explain import formatted_plan
    from orc_spark.sources.tables import load_table, spread_small_scan

    # tiny: one scan split -> the repartition appears in the plan
    # (doc_id-keyed since r15, so the signature groupBy reuses it)
    assert "hashpartitioning(doc_id" in formatted_plan(
        dd_minhash_sig(spark, sf_small)
    )
    # many-split corpus: identity (no shuffle added)
    d = str(tmp_path)
    load_table(spark, sf_small, "documents").repartition(64).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    df = spark.read.parquet(os.path.join(d, "documents.parquet"))
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:  # file split count is size-dependent
        assert spread_small_scan(df) is df
