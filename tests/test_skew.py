"""Salting operators must be semantics-preserving (operators/skew.py)."""

from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.catalog import load_table
from kafka_connect_msk_demo_spark.operators.skew import (salted_agg,
                                                         salted_join,
                                                         with_salt)


def test_salt_is_deterministic_and_bounded(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    a = with_salt(orders, "o_orderkey", 16).select("o_orderkey", "__salt")
    b = with_salt(orders, "o_orderkey", 16).select("o_orderkey", "__salt")
    assert a.exceptAll(b).count() == 0
    mm = a.agg(F.min("__salt"), F.max("__salt")).first()
    assert mm[0] >= 0 and mm[1] < 16


def test_salted_agg_equals_direct(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    direct = (orders.groupBy("o_orderstatus")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("o_totalprice").cast("decimal(25,8)"))
                   .alias("s")))
    salted = salted_agg(
        orders, ["o_orderstatus"], salt_on="o_orderkey",
        aggs={"n": F.count(F.lit(1)),
              "s": F.sum(F.col("o_totalprice").cast("decimal(25,8)"))},
        merges={"n": F.sum("n"), "s": F.sum("s")})
    assert sorted(map(tuple, direct.collect())) \
        == sorted(map(tuple, salted.select("o_orderstatus", "n", "s")
                      .collect()))


def test_salted_join_equals_direct(spark, sf_small):
    orders = load_table(spark, sf_small, "orders") \
        .withColumnRenamed("o_custkey", "c_custkey")
    customer = load_table(spark, sf_small, "customer") \
        .select("c_custkey", "c_mktsegment")
    direct = orders.join(customer, "c_custkey") \
        .select("o_orderkey", "c_mktsegment")
    salted = salted_join(orders, customer, on="c_custkey",
                         salt_on="o_orderkey") \
        .select("o_orderkey", "c_mktsegment")
    assert sorted(map(tuple, direct.collect())) \
        == sorted(map(tuple, salted.collect()))
