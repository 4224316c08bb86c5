"""Semantic tests for the round-4d additions: market-basket
co-purchase mining and PMI/lift collocations. (Oracle parity for the
registered queries runs via tests/test_oracle_parity.py.)"""

from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.operators.basket import copurchase_pairs
from kafka_connect_msk_demo_spark.pipeline.text_analysis import (
    pmi_collocations,
)


def _lineitem(spark, rows):
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


# ---------------------------------------------------------------------------
# copurchase_pairs
# ---------------------------------------------------------------------------


def test_copurchase_counts_and_lift(spark):
    """Hand-computed: parts 1,2 co-occur in 2 of 4 orders; each occurs
    in 3 orders -> support 2, lift = 2*4/(3*3)."""
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3),
            (4, 2), (4, 3)]
    out = copurchase_pairs(_lineitem(spark, rows), k=10,
                           min_support=2).collect()
    got = {(r.p1, r.p2): (r.support, r.lift) for r in out}
    assert got[(1, 2)] == (2, 2 * 4 / (3 * 3))
    assert (2, 1) not in got  # canonical p1 < p2 only


def test_copurchase_min_support_prunes(spark):
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 3), (3, 4)]
    out = copurchase_pairs(_lineitem(spark, rows), k=10,
                           min_support=2).collect()
    pairs = {(r.p1, r.p2) for r in out}
    assert pairs == {(1, 2)}  # (3,4) support 1 < 2 pruned


def test_copurchase_duplicate_lineitems_count_once(spark):
    """The same part twice in one order (two lineitems) is ONE basket
    membership — distinct() before pairing."""
    rows = [(1, 1), (1, 1), (1, 2), (2, 1), (2, 2)]
    out = copurchase_pairs(_lineitem(spark, rows), k=10,
                           min_support=2).collect()
    got = {(r.p1, r.p2): r.support for r in out}
    assert got == {(1, 2): 2}


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


def test_pmi_exact_lift(spark):
    """Corpus 'a b'x3 + 'a c': unigrams a:4 b:3 c:1 (N1=8), bigrams
    'a b':3 'a c':1 (N2=4). lift(a,b) = (3*8/(4*3))*(8/4) = 4."""
    out = pmi_collocations(_docs(spark, ["a b", "a b", "a b", "a c"]),
                           k=10, min_count=1).collect()
    got = {(r.w1, r.w2): (r.pair_count, r.lift) for r in out}
    assert got[("a", "b")] == (3, 4.0)
    assert got[("a", "c")] == (1, (1 * 8 / (1 * 4)) * (8 / 4))


def test_pmi_collocation_outranks_frequent_pair(spark):
    """'rio grande' appears only together (high lift) and must outrank
    the frequent-but-independent 'the cat'/'the dog' pairs."""
    texts = ["the cat sat", "the dog sat", "rio grande",
             "the cat ran", "the dog ran", "rio grande"]
    out = pmi_collocations(_docs(spark, texts), k=3,
                           min_count=2).collect()
    assert (out[0].w1, out[0].w2) == ("rio", "grande")


def test_pmi_min_count_prunes(spark):
    out = pmi_collocations(_docs(spark, ["a b", "c d", "c d"]),
                           k=10, min_count=2).collect()
    assert {(r.w1, r.w2) for r in out} == {("c", "d")}


def test_pmi_short_docs_contribute_no_bigrams(spark):
    """Single-token docs add unigram mass but no bigrams — and must
    not crash the sliding-window expression."""
    out = pmi_collocations(_docs(spark, ["a", "b", "a b"]),
                           k=10, min_count=1).collect()
    assert {(r.w1, r.w2) for r in out} == {("a", "b")}


# ---------------------------------------------------------------------------
# ewma_halving
# ---------------------------------------------------------------------------

import datetime as dt

from kafka_connect_msk_demo_spark.operators.temporal import ewma_halving


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")


def _t(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


def test_ewma_hand_computed(spark):
    """values 100, 200: first row = itself; second row has normalized
    weights (2/3 newest, 1/3 older) -> 500/3."""
    out = ewma_halving(
        _ev(spark, [(1, 1, _t(0), 100.0), (1, 2, _t(1), 200.0)]),
        "user_id", ["ts", "event_id"], "value").collect()
    assert out[0].ewma == 100.0 and out[0].n_window == 1
    assert abs(out[1].ewma - 500.0 / 3.0) < 1e-12
    assert out[1].n_window == 2


def test_ewma_constant_series_is_exact(spark):
    """Any normalized weighting of a constant is the constant — and the
    dyadic arithmetic must deliver it EXACTLY, beyond the frame too."""
    rows = [(1, i, _t(i), 10.0) for i in range(40)]
    out = ewma_halving(_ev(spark, rows), "user_id",
                       ["ts", "event_id"], "value").collect()
    assert all(r.ewma == 10.0 for r in out)
    assert out[-1].n_window == 32  # frame-truncated


def test_ewma_frame_drops_old_history(spark):
    """A huge value 32+ rows back must have exactly zero influence."""
    rows = [(1, 0, _t(0), 99999.0)] + [
        (1, i, _t(i), 7.0) for i in range(1, 34)]
    out = ewma_halving(_ev(spark, rows), "user_id",
                       ["ts", "event_id"], "value").collect()
    assert out[-1].ewma == 7.0


def test_ewma_keys_independent(spark):
    rows = [(1, 1, _t(0), 4.0), (2, 1, _t(0), 8.0)]
    out = {r.user_id: r.ewma
           for r in ewma_halving(_ev(spark, rows), "user_id",
                                 ["ts", "event_id"], "value").collect()}
    assert out == {1: 4.0, 2: 8.0}


# ---------------------------------------------------------------------------
# winsorized_stats
# ---------------------------------------------------------------------------

from kafka_connect_msk_demo_spark.operators.aggregates import (
    winsorized_stats,
)


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, amount double, oid long")


def test_winsorized_clamps_outlier(spark):
    """1..9 plus a 100 outlier, pct=10 -> k=1: both tails clamp to the
    rank-2/rank-9 values (2 and 9), mean = 55/10, vs raw mean 14.5."""
    rows = [("a", float(v), i) for i, v in
            enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
    out = winsorized_stats(_vals(spark, rows), ["g"], "amount", "oid",
                           pct=10).collect()
    r = out[0]
    assert (r.n_total, r.k_clamped, r.lo, r.hi) == (10, 1, 2.0, 9.0)
    assert r.win_mean == 5.5


def test_winsorized_small_group_noop(spark):
    """n=5 at pct=10 -> k=0: nothing clamps, mean is the plain mean,
    lo/hi degrade to min/max."""
    rows = [("a", float(v), v) for v in (10, 20, 30, 40, 500)]
    r = winsorized_stats(_vals(spark, rows), ["g"], "amount", "oid",
                         pct=10).collect()[0]
    assert (r.k_clamped, r.lo, r.hi) == (0, 10.0, 500.0)
    assert r.win_mean == 120.0


def test_winsorized_groups_independent(spark):
    rows = ([("a", float(v), v) for v in range(1, 11)]
            + [("b", 7.0, 1)])
    out = {r.g: r for r in winsorized_stats(
        _vals(spark, rows), ["g"], "amount", "oid", pct=10).collect()}
    assert out["b"].win_mean == 7.0 and out["b"].n_total == 1
    assert out["a"].n_total == 10


# ---------------------------------------------------------------------------
# label_centroid_similarity
# ---------------------------------------------------------------------------

from kafka_connect_msk_demo_spark.pipeline.similarity import (
    label_centroid_similarity,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def test_centroid_orthogonal_and_parallel(spark):
    """(1,0)-centroid vs (0,1)-centroid -> 0; scale-invariance makes
    (2,0) vs (1,0) -> 1."""
    rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
            (3, [0.0, 1.0], 1), (4, [2.0, 0.0], 2)]
    out = {(r.label_a, r.label_b): r.cosine
           for r in label_centroid_similarity(_emb(spark, rows)).collect()}
    assert out[(0, 1)] == 0.0
    assert out[(0, 2)] == 1.0
    assert out[(1, 2)] == 0.0


def test_centroid_is_the_mean_vector(spark):
    """label 1 = {(1,1), (-1,1)} has centroid (0,1): cosine 1 against a
    (0,2) singleton and 0 against a (1,0) singleton."""
    rows = [(1, [1.0, 1.0], 1), (2, [-1.0, 1.0], 1),
            (3, [0.0, 2.0], 2), (4, [1.0, 0.0], 3)]
    out = {(r.label_a, r.label_b): r.cosine
           for r in label_centroid_similarity(_emb(spark, rows)).collect()}
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] == 0.0


def test_centroid_pairs_canonical_and_complete(spark):
    rows = [(i, [float(i), 1.0], i % 3) for i in range(9)]
    out = label_centroid_similarity(_emb(spark, rows)).collect()
    pairs = [(r.label_a, r.label_b) for r in out]
    assert pairs == [(0, 1), (0, 2), (1, 2)]  # a<b only, sorted


# ---------------------------------------------------------------------------
# ks_drift
# ---------------------------------------------------------------------------

from kafka_connect_msk_demo_spark.operators.aggregates import ks_drift


def test_ks_identical_halves_zero(spark):
    """Same value multiset in early and late half -> D = 0."""
    rows = ([(1, i, _t(i), float(v)) for i, v in enumerate([1, 2, 3])]
            + [(1, 10 + i, _t(100 + i), float(v))
               for i, v in enumerate([1, 2, 3])])
    out = ks_drift(_ev(spark, rows), "user_id", "ts", "value").collect()
    assert len(out) == 1 and out[0].d_stat == 0.0


def test_ks_disjoint_halves_one(spark):
    """Early all-1s, late all-9s -> CDFs never overlap -> D = 1."""
    rows = ([(1, i, _t(i), 1.0) for i in range(3)]
            + [(1, 10 + i, _t(100 + i), 9.0) for i in range(3)])
    out = ks_drift(_ev(spark, rows), "user_id", "ts", "value").collect()
    assert out[0].d_stat == 1.0
    assert (out[0].n_early, out[0].n_late) == (3, 3)


def test_ks_hand_computed_quarter(spark):
    """early {1,1,2,2}, late {1,2,2,3}: max CDF gap at x=1 is
    0.5 - 0.25 = 0.25."""
    rows = ([(1, i, _t(i), float(v))
             for i, v in enumerate([1, 1, 2, 2])]
            + [(1, 10 + i, _t(100 + i), float(v))
               for i, v in enumerate([1, 2, 2, 3])])
    out = ks_drift(_ev(spark, rows), "user_id", "ts", "value").collect()
    assert out[0].d_stat == 0.25


def test_ks_group_with_empty_half_excluded(spark):
    """A group entirely in the early half has no defined D."""
    rows = ([(1, i, _t(i), 1.0) for i in range(2)]
            + [(1, 10, _t(100), 2.0)]
            + [(2, 20, _t(0), 5.0)])  # user 2: early only
    out = ks_drift(_ev(spark, rows), "user_id", "ts", "value").collect()
    assert [r.user_id for r in out] == [1]


# ---------------------------------------------------------------------------
# day_island_intervals + interval_overlap_join
# ---------------------------------------------------------------------------

from kafka_connect_msk_demo_spark.operators.temporal import (
    day_island_intervals,
    interval_overlap_join,
)


def _day(d):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=d)


def test_day_islands_split_on_gap(spark):
    rows = [(1, i, _day(d), 0.0)
            for i, d in enumerate([0, 1, 2, 6, 10, 11])]
    out = sorted((r.start_day, r.end_day) for r in
                 day_island_intervals(_ev(spark, rows),
                                      "user_id", "ts").collect())
    base = out[0][0]
    assert [(s - base, e - base) for s, e in out] == \
        [(0, 2), (6, 6), (10, 11)]


def test_overlap_join_inclusive_bounds(spark):
    left = spark.createDataFrame(
        [(1, 1, 3), (1, 10, 12)], "user_id long, start_day long, end_day long")
    right = spark.createDataFrame(
        [(1, 3, 5), (1, 6, 9), (2, 1, 3)],
        "user_id long, start_day long, end_day long")
    out = interval_overlap_join(left, right, "user_id").collect()
    got = {(r.a_start_day, r.b_start_day): r.overlap_len for r in out}
    # [1,3]x[3,5] touch at day 3 (inclusive) -> overlap 1; nothing else
    # overlaps, and user 2's intervals never pair with user 1's.
    assert got == {(1, 3): 1}


def test_overlap_join_length(spark):
    left = spark.createDataFrame(
        [(1, 5, 10)], "user_id long, start_day long, end_day long")
    right = spark.createDataFrame(
        [(1, 8, 20)], "user_id long, start_day long, end_day long")
    out = interval_overlap_join(left, right, "user_id").collect()
    assert out[0].overlap_len == 3  # days 8,9,10


# ---------------------------------------------------------------------------
# kmv_set_ops
# ---------------------------------------------------------------------------

from kafka_connect_msk_demo_spark.pipeline.sketches import kmv_set_ops


def _typed(spark, rows):
    return spark.createDataFrame(rows, "event_type string, user_id long")


def test_kmv_setops_degenerate_is_exact(spark):
    """Union under k distinct hashes -> the sketch IS the set: both
    estimates collapse to the exact counts."""
    rows = ([("a", u) for u in range(1, 11)]
            + [("b", u) for u in range(5, 15)])
    r = kmv_set_ops(_typed(spark, rows), "user_id", "event_type",
                    k=64).collect()[0]
    assert (r.n_true_union, r.n_true_inter) == (14, 6)
    assert r.est_union == 14.0 and r.est_inter == 6.0


def test_kmv_setops_estimates_track_truth(spark):
    """200-user union with 50-user overlap at k=64: estimates land
    within the sketch's error envelope (~3/sqrt(k) ≈ 38%)."""
    rows = ([("a", u) for u in range(125)]
            + [("b", u) for u in range(75, 200)])
    r = kmv_set_ops(_typed(spark, rows), "user_id", "event_type",
                    k=64).collect()[0]
    assert (r.n_true_union, r.n_true_inter) == (200, 50)
    assert abs(r.est_union - 200) <= 0.38 * 200
    assert abs(r.est_inter - 50) <= 0.5 * 50 + 10


def test_kmv_setops_disjoint_sets(spark):
    rows = ([("a", u) for u in range(10)]
            + [("b", u) for u in range(100, 110)])
    r = kmv_set_ops(_typed(spark, rows), "user_id", "event_type",
                    k=64).collect()[0]
    assert r.n_true_inter == 0 and r.est_inter == 0.0
    assert r.est_union == 20.0


def test_kmv_setops_all_pairs_emitted(spark):
    rows = [(t, u) for t in "abc" for u in range(5)]
    out = kmv_set_ops(_typed(spark, rows), "user_id", "event_type",
                      k=8).collect()
    assert [(r.type_a, r.type_b) for r in out] == \
        [("a", "b"), ("a", "c"), ("b", "c")]


# ---------------------------------------------------------------------------
# pca_power_topk
# ---------------------------------------------------------------------------

from kafka_connect_msk_demo_spark.pipeline.similarity import pca_power_topk


def _vecs16(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def test_pca_finds_planted_axis(spark):
    """Variance planted on dim 3 only: top-|projection| ids are the
    extreme dim-3 vectors, in |value| order."""
    def vec(t):
        v = [0.0] * 16
        v[3] = t
        return v
    rows = [(i, vec((i - 10) / 10.0), 0) for i in range(21)]
    out = pca_power_topk(_vecs16(spark, rows), k=4).collect()
    assert {r.vec_id for r in out} == {0, 20, 1, 19}
    assert abs(out[0].proj) >= abs(out[-1].proj)


def test_pca_centering_ignores_common_offset(spark):
    """A constant offset on an otherwise variance-free dim must not
    steal the component: variance lives on dim 5."""
    def vec(t):
        v = [0.5] * 16         # big common offset everywhere
        v[5] = 0.5 + t
        return v
    rows = [(i, vec((i - 5) / 20.0), 0) for i in range(11)]
    out = pca_power_topk(_vecs16(spark, rows), k=2).collect()
    # extremes of the dim-5 spread win, not arbitrary offset vectors
    assert {r.vec_id for r in out} <= {0, 1, 9, 10}


def test_pca_zero_matrix_guard(spark):
    """All-identical vectors -> zero scatter -> m=0 branch: no crash,
    every projection equal (ties broken by id)."""
    rows = [(i, [1.0] * 16, 0) for i in range(5)]
    out = pca_power_topk(_vecs16(spark, rows), k=3).collect()
    assert [r.vec_id for r in out] == [0, 1, 2]
    assert len({r.proj_q for r in out}) == 1


# ---------------------------------------------------------------------------
# rrf_retrieval_fusion
# ---------------------------------------------------------------------------

from kafka_connect_msk_demo_spark.pipeline.text_analysis import (
    rrf_retrieval_fusion,
)

_QUERY = ["join", "merge", "spark", "window"]


def _corpus(spark):
    texts = (["the spark join is a merge of the window and the data"]
             + [f"spark join merge window doc {i}" for i in range(3)]
             + ["zzz " * 30, "!!! ??? ###", "the a of and to in is it"])
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_rrf_score_is_exact_function_of_ranks(spark):
    out = rrf_retrieval_fusion(_corpus(spark), _QUERY, k=10,
                               pool=5).collect()
    assert out, "fusion returned nothing"
    for r in out:
        expect = ((1.0 / (60 + r.r_bm25) if r.r_bm25 is not None else 0.0)
                  + (1.0 / (60 + r.r_qual) if r.r_qual is not None
                     else 0.0))
        assert r.rrf == expect
    scores = [r.rrf for r in out]
    assert scores == sorted(scores, reverse=True)


def test_rrf_both_lists_beat_single_list(spark):
    """A doc holding rank 1 in BOTH lists must outrank any doc present
    in only one list (max single-list score is 1/61 < 2/61)."""
    out = rrf_retrieval_fusion(_corpus(spark), _QUERY, k=10,
                               pool=5).collect()
    best = out[0]
    if best.r_bm25 == 1 and best.r_qual == 1:
        assert best.rrf == 2.0 / 61.0
    singles = [r for r in out if r.r_bm25 is None or r.r_qual is None]
    doubles = [r for r in out if r.r_bm25 is not None
               and r.r_qual is not None
               and r.r_bm25 == 1 and r.r_qual == 1]
    for d in doubles:
        for s in singles:
            assert d.rrf > s.rrf


def test_rrf_deterministic(spark):
    a = rrf_retrieval_fusion(_corpus(spark), _QUERY, k=10,
                             pool=5).collect()
    b = rrf_retrieval_fusion(_corpus(spark), _QUERY, k=10,
                             pool=5).collect()
    assert a == b


# ---------------------------------------------------------------------------
# stream_ewma — the streaming twin equals the batch operator exactly
# ---------------------------------------------------------------------------


def test_stream_ewma_equals_batch(spark, sf_small):
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.queries import queries

    stream_rows = queries()["stream_ewma"](spark, sf_small).collect()
    batch_rows = (queries()["ewma_smooth"](spark, sf_small)
                  .orderBy("user_id", "ts_us", "event_id").collect())
    assert len(stream_rows) == len(batch_rows) > 0
    for s, b in zip(stream_rows, batch_rows):
        assert (s.user_id, s.ts_us, s.event_id) == \
            (b.user_id, b.ts_us, b.event_id)
        assert s.ewma == b.ewma and s.n_window == b.n_window


# ---------------------------------------------------------------------------
# xcorr_lags
# ---------------------------------------------------------------------------

from kafka_connect_msk_demo_spark.operators.aggregates import xcorr_lags


def _series_events(spark, xs, shift):
    """click series xs at hours 0..n-1; purchase = same values shifted
    `shift` hours later."""
    rows = []
    for t, v in enumerate(xs):
        rows.append((1, t, _t(t * 60), float(v), "click"))
        rows.append((2, 1000 + t, _t((t + shift) * 60), float(v),
                     "purchase"))
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double,"
        " event_type string")


def test_xcorr_detects_planted_lag(spark):
    xs = [(t * 37) % 101 + 1 for t in range(48)]
    out = {r.lag: r.xcorr for r in xcorr_lags(
        _series_events(spark, xs, 2), "ts", "event_type", "value",
        "click", "purchase", max_lag=4).collect()}
    assert out[2] > 0.999999
    assert all(abs(out[lag]) < 0.5 for lag in (0, 1, 3, 4))


def test_xcorr_zero_variance_is_null(spark):
    xs = [5] * 20
    out = xcorr_lags(_series_events(spark, xs, 0), "ts", "event_type",
                     "value", "click", "purchase", max_lag=2).collect()
    assert all(r.xcorr is None for r in out)  # constant series: no r


# ---------------------------------------------------------------------------
# rfm_segments — structural checks (oracle parity covers the values)
# ---------------------------------------------------------------------------


def test_rfm_census_partitions_all_customers(spark, sf_small):
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.queries import queries

    out = queries()["rfm_segments"](spark, sf_small).collect()
    n_cust = (load_table(spark, sf_small, "orders")
              .select("o_custkey").distinct().count())
    assert sum(r.n_customers for r in out) == n_cust
    for r in out:
        assert 1 <= r.r_q <= 4 and 1 <= r.f_q <= 4 and 1 <= r.m_q <= 4
        assert r.avg_spend > 0


# ---------------------------------------------------------------------------
# seasonality / markov / gini
# ---------------------------------------------------------------------------


def test_seasonality_calendar_coordinates(spark, monkeypatch):
    """2024-01-01 is a Monday: the UTC-fixed integer arithmetic must
    map a 13:00 UTC event to (dow=1, hod=13) — Sunday-anchored via the
    1970-01-01-Thursday offset."""
    import kafka_connect_msk_demo_spark.queries as Q
    ev = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1, 13, 0), 10.0, "click")],
        "user_id long, event_id long, ts timestamp, value double,"
        " event_type string")
    monkeypatch.setattr(Q, "load_table", lambda s, d, n: ev)
    out = Q.q_seasonality_profile(spark, "unused").collect()
    assert [(r.dow, r.hod, r.n_events, r.avg_value)
            for r in out] == [(1, 13, 1, 10.0)]


def test_markov_hand_computed(spark, monkeypatch):
    import kafka_connect_msk_demo_spark.queries as Q
    rows = [(1, i, _t(i), 0.0, t)
            for i, t in enumerate(["a", "b", "a", "c"])]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double,"
        " event_type string")
    monkeypatch.setattr(Q, "load_table", lambda s, d, n: ev)
    got = {(r.from_type, r.to_type): (r.n, r.prob)
           for r in Q.q_markov_transitions(spark, "unused").collect()}
    assert got == {("a", "b"): (1, 0.5), ("a", "c"): (1, 0.5),
                   ("b", "a"): (1, 1.0)}


def test_gini_formula_properties(spark, monkeypatch):
    """Equal spends -> G = 0; a two-customer [0, x] split -> G = 0.5."""
    import kafka_connect_msk_demo_spark.queries as Q

    def mk(spends_by_region):
        orders, custs, nats, regs = [], [], [], []
        ck = 0
        for ri, (rname, spends) in enumerate(spends_by_region.items()):
            regs.append((ri, rname))
            nats.append((ri, f"n{ri}", ri))
            for s in spends:
                ck += 1
                custs.append((ck, ri))
                orders.append((ck * 10, ck, s))
        return {
            "orders": spark.createDataFrame(
                orders, "o_orderkey long, o_custkey long,"
                " o_totalprice double"),
            "customer": spark.createDataFrame(
                custs, "c_custkey long, c_nationkey long"),
            "nation": spark.createDataFrame(
                nats, "n_nationkey long, n_name string, n_regionkey long"),
            "region": spark.createDataFrame(
                regs, "r_regionkey long, r_name string"),
        }

    tabs = mk({"EQ": [10.0, 10.0, 10.0, 10.0], "SKEW": [0.0, 10.0]})
    monkeypatch.setattr(Q, "load_tables",
                        lambda s, d, names: {n: tabs[n] for n in names})
    got = {r.region: r.gini
           for r in Q.q_gini_concentration(spark, "unused").collect()}
    assert got["EQ"] == 0.0
    assert got["SKEW"] == 0.5


def test_stream_ewma_survives_tiny_arrow_chunks(spark, sf_small):
    """Groups larger than the Arrow batch size arrive as SEVERAL pdfs
    per micro-batch; the kernel must concatenate before sorting or the
    order-dependent fold diverges (regression for the per-chunk-sort
    bug). Forcing 2-row Arrow batches makes every group multi-chunk."""
    from kafka_connect_msk_demo_spark.queries import queries

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, "10000")
    spark.conf.set(key, "2")
    try:
        stream_rows = queries()["stream_ewma"](spark, sf_small).collect()
    finally:
        spark.conf.set(key, old)
    batch_rows = (queries()["ewma_smooth"](spark, sf_small)
                  .orderBy("user_id", "ts_us", "event_id").collect())
    assert len(stream_rows) == len(batch_rows) > 0
    for s, b in zip(stream_rows, batch_rows):
        assert (s.user_id, s.ts_us, s.event_id, s.ewma) == \
            (b.user_id, b.ts_us, b.event_id, b.ewma)


# ---------------------------------------------------------------------------
# hdr_quantiles
# ---------------------------------------------------------------------------

from kafka_connect_msk_demo_spark.operators.aggregates import hdr_quantiles


def test_hdr_bucket_bounds_hand_computed(spark):
    """Values 1.00..10.23 (cents 100..1023): cents 100-127 -> bucket 6,
    128-255 -> 7, 256-511 -> 8, 512-1023 -> 9. With a uniform spread
    p50 lands in bucket 9's predecessor region: rank 512 of 924 is
    cents 611 -> bucket 9 -> lower bound 5.12."""
    rows = [("a", (c + 100) / 100.0) for c in range(924)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = hdr_quantiles(df, "g", "v").collect()[0]
    assert r.n == 924
    assert r.p50_lb == 5.12      # 2^9 cents
    assert r.p99_lb == 5.12      # rank 915, cents 1014, same bucket
    assert r.p95_lb == 5.12


def test_hdr_separates_magnitudes(spark):
    """A bimodal 1-cent / ~$80 mix: p50 in the low mode, p95/p99 in
    the high mode."""
    rows = ([("a", 0.01)] * 90 + [("a", 80.0)] * 10)
    df = spark.createDataFrame(rows, "g string, v double")
    r = hdr_quantiles(df, "g", "v").collect()[0]
    assert r.p50_lb == 0.01      # bucket 0
    assert r.p95_lb == 40.96     # 2^12 cents
    assert r.p99_lb == 40.96


def test_hdr_subcent_values_excluded(spark):
    rows = [("a", 0.001)] * 5 + [("a", 1.0)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    r = hdr_quantiles(df, "g", "v").collect()[0]
    assert r.n == 5              # sub-cent rows have no log bucket
