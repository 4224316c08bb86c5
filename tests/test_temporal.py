"""Unit tests for the temporal operators (as-of join, bucketed range
join) — semantics the oracle-parity harness states but doesn't dissect:
inclusive equality, no-match nulls, bucket-boundary exactness."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.operators.temporal import (
    asof_join, bucketed_range_join)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "u", 300), (4, "v", 50)],
        "lid long, k string, lts long")
    right = spark.createDataFrame(
        [(10, "u", 100), (11, "u", 200), (12, "u", 301), (13, "w", 1)],
        "rid long, k string, rts long")
    return left, right


def test_asof_inclusive_backward(sides):
    left, right = sides
    out = {r.lid: r for r in asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts").collect()}
    assert len(out) == 4                       # |output| == |left|
    assert out[1].r_rid == 10                  # equality is inclusive
    assert out[2].r_rid == 11                  # latest at-or-before 205
    assert out[3].r_rid == 11                  # 301 is in the future
    assert out[4].r_rid is None                # no right rows for v


def test_asof_single_shuffle_no_join_node(sides):
    """The union+window formulation must plan ZERO join operators and
    exactly one exchange on the key — that's the whole point."""
    left, right = sides
    plan = asof_join(left, right, on="k", left_ts="lts",
                     right_ts="rts")._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_bucketed_range_join_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, 9), (2, 10), (3, 25), (4, 40), (5, 41)],
        "pid long, v long")
    ivs = spark.createDataFrame(
        [(100, 10, 40), (101, 30, 50)], "iid long, lo long, hi long")
    got = {(r.pid, r.iid) for r in bucketed_range_join(
        pts, ivs, "v", "lo", "hi", bucket_width=7).collect()}
    assert got == {(2, 100), (3, 100), (4, 100), (4, 101), (5, 101)}


def test_bucketed_range_join_matches_bnlj(spark):
    """Property check vs the naive theta-join on random data — every
    bucket width must produce the identical pair set."""
    import random

    rnd = random.Random(7)
    pts = spark.createDataFrame(
        [(i, rnd.randrange(0, 1000)) for i in range(300)],
        "pid long, v long")
    iv_rows = []
    for i in range(40):
        lo = rnd.randrange(0, 950)
        iv_rows.append((i, lo, lo + rnd.randrange(0, 120)))
    ivs = spark.createDataFrame(iv_rows, "iid long, lo long, hi long")
    naive = {(r.pid, r.iid)
             for r in pts.join(ivs, (F.col("v") >= F.col("lo"))
                               & (F.col("v") <= F.col("hi"))).collect()}
    for w in (1, 13, 64, 1000):
        got = {(r.pid, r.iid) for r in bucketed_range_join(
            pts, ivs, "v", "lo", "hi", bucket_width=w).collect()}
        assert got == naive, f"width={w}"


def test_bucketed_range_join_column_expression_point(spark):
    """A Column expression (not a named column) as the range point is
    materialized internally and dropped from the output."""
    pts = spark.createDataFrame([(1, 5), (2, 20)], "pid long, half long")
    ivs = spark.createDataFrame([(100, 9, 11)], "iid long, lo long, hi long")
    out = bucketed_range_join(pts, ivs, F.col("half") * 2, "lo", "hi",
                              bucket_width=5)
    rows = [(r.pid, r.iid) for r in out.collect()]
    assert rows == [(1, 100)]            # 5*2=10 in [9,11]; 40 is not
    assert "_point" not in out.columns and "_b" not in out.columns


def test_connected_components_empty_edges(spark):
    """No edges -> every doc is its own singleton cluster (and the
    propagation loop exits cleanly on an empty frame)."""
    from kafka_connect_msk_demo_spark.pipeline import dedup

    pairs = spark.createDataFrame([], "d1 long, d2 long")
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    out = {r.doc_id: r for r in dedup.dedup_clusters(docs, pairs).collect()}
    assert all(out[d].cluster_id == d and out[d].cluster_size == 1
               and out[d].keep for d in (1, 2))


def test_asof_null_keys_never_match(spark):
    """Review regression: SQL join semantics — a NULL-key left row gets
    NULLs (kept, unmatched) and NULL-key right rows match nothing,
    unlike Window.partitionBy's native NULL-groups-together behavior."""
    left = spark.createDataFrame(
        [(1, None, 100), (2, "u", 100)], "lid long, k string, lts long")
    right = spark.createDataFrame(
        [(10, None, 50), (11, "u", 50)], "rid long, k string, rts long")
    out = {r.lid: r for r in asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts").collect()}
    assert len(out) == 2
    assert out[1].r_rid is None          # NULL != NULL
    assert out[2].r_rid == 11


def test_gap_fill_days_locf_and_zero_fill(spark):
    """Planted gaps: each group's spine runs min..max day inclusive;
    missing days get value 0 + filled=True, and the LOCF column carries
    the last observed value (never NULL — spines start on an observed
    day). Group boundaries must not leak LOCF state."""
    from kafka_connect_msk_demo_spark.operators.temporal import (
        gap_fill_days)

    per_day = spark.createDataFrame(
        [("a", 10, 5.0), ("a", 13, 7.0), ("b", 20, 1.0)],
        "g string, day long, v double")
    out = {(r.g, r.day): r for r in
           gap_fill_days(per_day, ["g"], "day", "v").collect()}
    assert set(out) == {("a", 10), ("a", 11), ("a", 12), ("a", 13),
                        ("b", 20)}
    assert (out[("a", 10)].v, out[("a", 10)].filled,
            out[("a", 10)].locf_v) == (5.0, False, 5.0)
    assert (out[("a", 11)].v, out[("a", 11)].filled,
            out[("a", 11)].locf_v) == (0.0, True, 5.0)
    assert out[("a", 12)].locf_v == 5.0
    assert (out[("a", 13)].v, out[("a", 13)].locf_v) == (7.0, 7.0)
    assert (out[("b", 20)].v, out[("b", 20)].filled,
            out[("b", 20)].locf_v) == (1.0, False, 1.0)
