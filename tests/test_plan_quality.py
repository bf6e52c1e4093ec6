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
