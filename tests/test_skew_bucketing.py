"""Skew-mitigation correctness + bucketed co-located join plan tests."""

import pytest
from pyspark.sql import functions as F

from orc_spark.operators.skew import salted_count_agg, salted_join
from orc_spark.plans.explain import formatted_plan
from orc_spark.sources.tables import load_table


def test_salted_agg_matches_plain(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    got = (
        salted_count_agg(
            li,
            ["l_returnflag"],
            {"n": "count(*)", "qty": "sum(l_quantity)", "mx": "max(l_extendedprice)"},
        )
        .orderBy("l_returnflag")
        .collect()
    )
    exp = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [r["n"] for r in got] == [r["n"] for r in exp]
    assert [r["mx"] for r in got] == [r["mx"] for r in exp]
    for g, e in zip(got, exp):
        assert g["qty"] == pytest.approx(e["qty"], rel=1e-12)


def test_salted_join_matches_plain(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_small, "part").select("p_partkey", "p_brand")
    got = salted_join(
        li.withColumnRenamed("l_partkey", "p_partkey"), part, "p_partkey", n_salts=8
    )
    exp = li.join(part, li.l_partkey == part.p_partkey)
    assert got.count() == exp.count()
    g = got.groupBy("p_brand").count().orderBy("p_brand").collect()
    e = exp.groupBy("p_brand").count().orderBy("p_brand").collect()
    assert g == e


def test_bucketed_join_avoids_shuffle(spark, sf_small, tmp_path):
    """Bucketed tables on the join key co-locate rows: the join plan has no
    Exchange on either side (the 100 TB repeated-join pattern)."""
    orders = load_table(spark, sf_small, "orders")
    cust = load_table(spark, sf_small, "customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode("overwrite").saveAsTable("b_orders")
    cust.withColumnRenamed("c_custkey", "o_custkey").write.bucketBy(8, "o_custkey").mode(
        "overwrite"
    ).saveAsTable("b_cust")
    j = (
        spark.table("b_orders")
        .join(spark.table("b_cust"), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    # disable auto-broadcast so the bucketed SMJ path is actually chosen
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(j)
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, "bucketed join must not shuffle"
        # result sanity vs plain join
        exp = (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice").alias("rev"))
            .orderBy("c_mktsegment")
            .collect()
        )
        got = j.orderBy("c_mktsegment").collect()
        assert [r["c_mktsegment"] for r in got] == [r["c_mktsegment"] for r in exp]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_salted_count_col_excludes_nulls(spark):
    """count(col) through the salted two-phase aggregate must keep standard
    SQL null-exclusion semantics (ADVICE r01): previously it silently widened
    to count(*)."""
    from orc_spark.operators.skew import salted_count_agg

    pdf = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None), ("b", None)],
        "k string, v double",
    )
    got = {
        r["k"]: (r["n_rows"], r["n_vals"])
        for r in salted_count_agg(
            pdf, ["k"], {"n_rows": "count(*)", "n_vals": "count(v)"}
        ).collect()
    }
    assert got == {"a": (3, 2), "b": (2, 0)}
