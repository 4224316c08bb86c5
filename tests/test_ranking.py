"""operators/ranking.py — distributed exact rank / ntile / prefix sum
vs the single-partition window reference, including the boundary-
sampling consistency trap (offsets and ranks MUST come from the same
materialized range partitioning; see the module docstring)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.operators.ranking import (
    exact_global_ntile, exact_global_rank, partitioned_prefix_sum)


@pytest.fixture(scope="module")
def frame(spark):
    # adversarial: heavy duplicate keys (forces ties broken by id),
    # skewed values, n not divisible by common tile counts
    rows = [(i, (i * 7919) % 97, (i * 31) % 11) for i in range(1, 10_004)]
    return spark.createDataFrame(rows, "id long, v long, w long")


def test_default_fanout_follows_session_parallelism(spark, frame):
    """r12: num_parts=None derives the range fan-out from the session's
    defaultParallelism (scale-adaptive) instead of a hard-coded local
    constant; an explicit num_parts is honored verbatim — and the ranks
    are identical either way (rank exactness is partition-count-
    invariant)."""
    from kafka_connect_msk_demo_spark.operators.ranking import (
        _resolve_parts)
    assert _resolve_parts(frame, None) == \
        spark.sparkContext.defaultParallelism
    assert _resolve_parts(frame, 7) == 7
    small = frame.limit(500)
    auto = {r.id: r.rank for r in exact_global_rank(
        small, [F.col("v"), F.col("id")], "rank")
        .select("id", "rank").collect()}
    pinned = {r.id: r.rank for r in exact_global_rank(
        small, [F.col("v"), F.col("id")], "rank", num_parts=5)
        .select("id", "rank").collect()}
    assert auto == pinned


def test_exact_rank_matches_single_window(spark, frame):
    got = {r.id: r.rank for r in exact_global_rank(
        frame, [F.col("v"), F.col("id")], "rank", num_parts=16)
        .select("id", "rank").collect()}
    ref = {r.id: r.rank for r in frame.withColumn(
        "rank", F.row_number().over(Window.orderBy("v", "id")))
        .select("id", "rank").collect()}
    assert got == ref


def test_exact_rank_desc_order(spark, frame):
    got = {r.id: r.rank for r in exact_global_rank(
        frame, [F.col("v").desc(), F.col("id")], "rank", num_parts=8)
        .select("id", "rank").collect()}
    ref = {r.id: r.rank for r in frame.withColumn(
        "rank", F.row_number().over(
            Window.orderBy(F.col("v").desc(), "id")))
        .select("id", "rank").collect()}
    assert got == ref


@pytest.mark.parametrize("k", [4, 10, 7])
def test_exact_ntile_matches_window_ntile(spark, frame, k):
    got = {r.id: r.q for r in exact_global_ntile(
        frame, k, [F.col("v"), F.col("id")], "q", num_parts=16)
        .select("id", "q").collect()}
    ref = {r.id: r.q for r in frame.withColumn(
        "q", F.ntile(k).over(Window.orderBy("v", "id")))
        .select("id", "q").collect()}
    assert got == ref


def test_ntile_stable_across_reruns(spark, frame):
    """Range boundaries are sampled per execution; the persist inside
    the helper must pin ONE partitioning per run, making results
    identical run to run."""
    def run():
        out = exact_global_ntile(frame, 4, [F.col("v"), F.col("id")],
                                 "q", num_parts=16)
        res = {r.id: r.q for r in out.select("id", "q").collect()}
        spark.catalog.clearCache()
        return res
    assert run() == run()


def test_prefix_sum_exclusive_and_grand_total(spark, frame):
    got = partitioned_prefix_sum(
        frame, [F.desc("v"), F.col("id")], "w", "before",
        exclusive=True, num_parts=8)
    ref = frame.withColumn(
        "before",
        F.coalesce(F.sum("w").over(
            Window.orderBy(F.desc("v"), "id")
            .rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))
    g = {r.id: r.before for r in got.select("id", "before").collect()}
    r = {r.id: r.before for r in ref.select("id", "before").collect()}
    assert g == r
    total = frame.agg(F.sum("w")).collect()[0][0]
    assert got.select("_grand_total").distinct().collect()[0][0] == total


def test_rank_plan_has_no_single_partition_exchange(spark, frame):
    plan = exact_global_rank(frame, [F.col("v"), F.col("id")], "rank",
                             num_parts=16)._jdf.queryExecution() \
        .executedPlan().toString()
    # the row path must never collapse to one task; the only windows
    # are partitioned by _pid or run over the P-row offsets frame
    row_side = plan.split("BroadcastExchange")[0]
    assert "Exchange SinglePartition" not in row_side, row_side


def test_exact_rank_under_extreme_key_skew(spark):
    """All rows share one sort-key value (ties broken only by id):
    range partitioning must still spread rows and the rank must match
    the single-window reference — the skew shape that breaks naive
    per-value bucketing."""
    df = spark.createDataFrame([(i, 7) for i in range(1, 5001)],
                               "id long, v long")
    got = {r.id: r.rank for r in exact_global_rank(
        df, [F.col("v"), F.col("id")], "rank", num_parts=16)
        .select("id", "rank").collect()}
    ref = {r.id: r.rank for r in df.withColumn(
        "rank", F.row_number().over(Window.orderBy("v", "id")))
        .select("id", "rank").collect()}
    assert got == ref
    spark.catalog.clearCache()


def test_ntile_fewer_rows_than_tiles(spark):
    """n < k: ntile assigns tiles 1..n — the big-tile arithmetic must
    not divide by the empty small-tile size."""
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    got = {r.id: r.q for r in exact_global_ntile(
        df, 4, [F.col("v"), F.col("id")], "q", num_parts=8)
        .select("id", "q").collect()}
    ref = {r.id: r.q for r in df.withColumn(
        "q", F.ntile(4).over(Window.orderBy("v", "id")))
        .select("id", "q").collect()}
    assert got == ref == {1: 1, 2: 2}
    spark.catalog.clearCache()


def test_ntile_arithmetic_exact_beyond_double_precision(spark):
    """ADVICE r6: the tile formula must be exact past 2^53 — float
    division + cast('long') misbuckets boundary ranks there. Evaluate
    the integral-arithmetic tile expression at n = 2^60 + 3 on every
    tile boundary and compare against exact Python-int ntile."""
    from kafka_connect_msk_demo_spark.operators.ranking import (
        ntile_tile_expr)

    n = 2**60 + 3
    k = 7

    def py_ntile(r):
        m, big, small = n % k, n // k + 1, n // k
        cut = m * big
        if r <= cut:
            return (r - 1) // big + 1
        return m + (r - cut - 1) // small + 1

    big = n // k + 1
    cut = (n % k) * big
    # every boundary rank: tile edges around each big tile, the
    # big/small switchover, and the extremes
    ranks = sorted({1, big, big + 1, cut - 1, cut, cut + 1,
                    n - 1, n,
                    *(i * big for i in range(1, n % k + 1)),
                    *(i * big + 1 for i in range(1, n % k + 1))})
    rows = [(r, n) for r in ranks]
    df = spark.createDataFrame(rows, "_r long, _n_total long")
    got = {r._r: r.tile for r in
           df.withColumn("tile", ntile_tile_expr(k)).collect()}
    want = {r: py_ntile(r) for r in ranks}
    assert got == want
    # float arithmetic is PROVABLY wrong at this magnitude for at
    # least one of these ranks — the test is not vacuous
    def float_ntile(r):
        m, big, small = n % k, int(n / k) + 1, int(n / k)
        cut = m * big
        if r <= cut:
            return int((r - 1) / big) + 1
        return m + int((r - cut - 1) / small) + 1
    assert any(float_ntile(r) != want[r] for r in ranks)
