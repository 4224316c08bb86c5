"""Round-4h additions: scale-engineering audits (skew census, join
cardinality prediction, dataset content fingerprints)."""

import pyspark.sql.functions as F

from kafka_connect_msk_demo_spark.operators import audit


def test_key_skew_census_hand(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e")], "k long, v string")
    got = audit.key_skew_census([("t", df, "k")]).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.relation, r.key_col, r.n_rows, r.n_distinct) == ("t", "k", 5, 3)
    assert (r.top_key, r.top_cnt) == ("1", 3)
    assert r.top_share == 3 / 5


def test_key_skew_census_tie_breaks_to_smallest_key(spark):
    df = spark.createDataFrame([(2,), (2,), (10,), (10,)], "k long")
    r = audit.key_skew_census([("t", df, "k")]).collect()[0]
    # '10' < '2' as strings — ties break on the string cast
    assert (r.top_key, r.top_cnt) == ("10", 2)


def test_join_cardinality_predicts_exact_join_size(spark):
    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], "lk long")
    right = spark.createDataFrame([(1,), (1,), (1,), (3,), (9,)], "rk long")
    r = audit.join_cardinality([("j", left, "lk", right, "rk")]).collect()[0]
    true_n = left.join(right, left.lk == right.rk).count()
    assert r.out_rows == true_n == 7  # 2*3 (k=1) + 1*1 (k=3)
    assert (r.distinct_left, r.distinct_right, r.matched_keys) == (3, 3, 2)


def test_dataset_fingerprint_order_and_partition_independent(spark):
    rows = [(1, "x"), (2, "y"), (3, "z")]
    a = spark.createDataFrame(rows, "id long, s string")
    b = spark.createDataFrame(list(reversed(rows)),
                              "id long, s string").repartition(7)
    fa = audit.dataset_fingerprint([("t", a, ["id", "s"])]).collect()[0]
    fb = audit.dataset_fingerprint([("t", b, ["id", "s"])]).collect()[0]
    assert fa.content_hash == fb.content_hash
    assert fa.n_rows == fb.n_rows == 3


def test_dataset_fingerprint_detects_single_row_change(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    b = spark.createDataFrame([(1, "x"), (2, "Y")], "id long, s string")
    fa = audit.dataset_fingerprint([("t", a, ["id", "s"])]).collect()[0]
    fb = audit.dataset_fingerprint([("t", b, ["id", "s"])]).collect()[0]
    assert fa.content_hash != fb.content_hash


def test_dataset_fingerprint_duplicate_rows_not_cancelled(spark):
    """Sum (not XOR) combine: a row appearing twice must CHANGE the
    hash vs appearing once."""
    a = spark.createDataFrame([(1, "x")], "id long, s string")
    b = spark.createDataFrame([(1, "x"), (1, "x")], "id long, s string")
    fa = audit.dataset_fingerprint([("t", a, ["id", "s"])]).collect()[0]
    fb = audit.dataset_fingerprint([("t", b, ["id", "s"])]).collect()[0]
    assert fa.content_hash != fb.content_hash
