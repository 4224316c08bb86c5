"""Bucketed co-located joins: correctness + the no-shuffle plan claim."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.catalog import load_table
from kafka_connect_msk_demo_spark.operators.bucketing import (bucketed_join,
                                                              write_bucketed)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem") \
        .withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_matches_plain_join(spark, sf_small, bucketed_tables):
    lt, rt = bucketed_tables
    got = (bucketed_join(spark, lt, rt, ["o_orderkey"])
           .groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n")))
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    want = (orders.join(lineitem,
                        orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n")))
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """The co-location claim: with matching bucket specs the join plans
    with NO Exchange on either side. Auto-broadcast is disabled for the
    probe — at the scale bucketing targets, neither fact side is
    broadcastable anyway (a broadcast plan also bypasses bucketed
    scans, hiding the property under test)."""
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = bucketed_join(spark, lt, rt, ["o_orderkey"]) \
            ._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_mismatched_buckets_still_correct(spark, sf_small, bucketed_tables):
    """A table bucketed with a different count degrades to a normal
    join — correct, just shuffled."""
    lt, _ = bucketed_tables
    other = load_table(spark, sf_small, "lineitem") \
        .withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(other, "b_lineitem_16", "o_orderkey", 16)
    try:
        n = bucketed_join(spark, lt, "b_lineitem_16",
                          ["o_orderkey"]).count()
        assert n == load_table(spark, sf_small, "lineitem").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem_16")


def test_registered_bucketed_query_fact_join_has_no_shuffle(spark, sf_small):
    """The registered revenue_by_region_bucketed query's fact⋈fact leg
    (per-order groupBy + orders join over the staged bucket tables)
    plans with ZERO Exchange: the aggregation runs on the bucket key
    and the sort-merge join consumes both bucket specs."""
    from kafka_connect_msk_demo_spark.queries import _bucketed_order_revenue

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _bucketed_order_revenue(spark, sf_small)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_ensure_bucketed_detects_content_and_spec_drift(spark):
    """Review regression: equal row counts must NOT qualify a stale
    table for reuse — content changes and bucket-spec changes both
    force a rewrite; a true match is reused without rewriting."""
    import time as _t

    from kafka_connect_msk_demo_spark.operators.bucketing import (
        ensure_bucketed)

    tbl = f"drift_check_{int(_t.time())}"
    df1 = spark.createDataFrame([(i, i * 2) for i in range(50)],
                                "k long, v long")
    df2 = spark.createDataFrame([(i, i * 3) for i in range(50)],
                                "k long, v long")  # same count, new data
    try:
        ensure_bucketed(spark, df1, tbl, "k", num_buckets=4)
        # same content + spec -> reused
        ensure_bucketed(spark, df1, tbl, "k", num_buckets=4)
        assert sorted(r.v for r in spark.table(tbl).collect())[:3] \
            == [0, 2, 4]
        # content drift at equal row count -> rewritten
        ensure_bucketed(spark, df2, tbl, "k", num_buckets=4)
        assert sorted(r.v for r in spark.table(tbl).collect())[:3] \
            == [0, 3, 6]
        # bucket-spec drift (different column) -> rewritten, not reused
        ensure_bucketed(spark, df2, tbl, "v", num_buckets=4)
        from kafka_connect_msk_demo_spark.operators.bucketing import (
            _bucket_spec_matches)
        assert _bucket_spec_matches(spark, tbl, "v", 4)
        assert not _bucket_spec_matches(spark, tbl, "k", 4)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
