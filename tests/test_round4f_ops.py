"""Semantic unit tests for the round-4f operators — hand-computed
expectations independent of the DuckDB oracles (which the parity suite
already runs): the Q21 EXISTS/NOT-EXISTS -> aggregation-cascade
rewrite, and the scale-free thresholds of the Q11/Q20 adaptations.
"""

from pyspark.sql import functions as F


def test_q21_aggregation_rewrite_matches_exists_semantics(spark):
    """Hand-built orders: the culprit supplier is counted iff the
    order is multi-supplier AND exactly one supplier is late —
    identical to the EXISTS (other supplier) / NOT EXISTS (other
    late supplier) pair of the original Q21."""
    # (orderkey, suppkey, late)
    rows = [
        (1, 10, 1), (1, 20, 0),            # culprit: 10
        (2, 10, 1), (2, 20, 1),            # two late -> nobody
        (3, 10, 1),                        # single-supplier -> nobody
        (4, 20, 0), (4, 30, 1), (4, 30, 0),  # culprit: 30 (max per supp)
        (5, 20, 0), (5, 30, 0),            # nobody late
    ]
    lo = spark.createDataFrame(rows, "okey long, skey long, late int")
    per_os = lo.groupBy("okey", "skey").agg(F.max("late").alias("sl"))
    per_o = (per_os.groupBy("okey")
             .agg(F.count(F.lit(1)).alias("n_supp"),
                  F.sum("sl").alias("n_late")))
    culprit = (per_os.filter(F.col("sl") == 1)
               .join(per_o.filter((F.col("n_supp") > 1)
                                  & (F.col("n_late") == 1)), "okey")
               .groupBy("skey")
               .agg(F.count(F.lit(1)).alias("numwait")))
    got = {r.skey: r.numwait for r in culprit.collect()}
    assert got == {10: 1, 30: 1}


def test_q11_threshold_is_scale_free(spark, sf_small):
    """Every kept part's value strictly exceeds 2x the mean per-part
    value, and at least one part is always above the mean (the
    maximum), so the query can only return an empty frame when the
    value distribution is perfectly flat."""
    from kafka_connect_msk_demo_spark.queries import q_tpch_q11
    out = q_tpch_q11(spark, sf_small).collect()
    # recompute the threshold from the query's own definition
    from kafka_connect_msk_demo_spark.catalog import load_tables
    from kafka_connect_msk_demo_spark.queries import (
        _top_supplier_nation)
    t = load_tables(spark, sf_small,
                    ("lineitem", "supplier", "nation", "part"))
    supp = (t["supplier"]
            .join(_top_supplier_nation(t),
                  F.col("s_nationkey") == F.col("top_nationkey"))
            .select("s_suppkey"))
    val = (t["lineitem"]
           .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
           .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
           .groupBy("p_partkey")
           .agg(F.sum(F.round("l_quantity").cast("long")
                      * F.round(F.col("p_retailprice") * 100)
                      .cast("long")).alias("v")))
    rows = val.collect()
    mean = sum(r.v for r in rows) / len(rows)
    expect = {r.p_partkey for r in rows if r.v > 2 * mean}
    assert {r.p_partkey for r in out} == expect


def test_q20_keeps_only_oversupplying_suppliers(spark, sf_small):
    """Each returned supplier's first-365-day quantity of 'large'
    parts exceeds half the mean per-supplier quantity."""
    from kafka_connect_msk_demo_spark.queries import q_tpch_q20
    out = q_tpch_q20(spark, sf_small)
    rows = out.collect()
    assert out.columns == ["s_name", "qty"]
    if rows:  # threshold = tot / (2 * n_supp) over ALL suppliers
        assert min(r.qty for r in rows) > 0
