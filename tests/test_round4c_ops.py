"""Semantic tests for the round-4c additions: rolling z-score anomaly
detection, gaps-and-islands activity runs, weighted median, and
equi-depth binning. (Oracle parity for the registered queries runs via
tests/test_oracle_parity.py.)"""

import datetime as dt

from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.operators.aggregates import (
    grouped_equidepth_bins,
    weighted_median,
)
from kafka_connect_msk_demo_spark.operators.temporal import (
    activity_islands,
    rolling_zscore_anomalies,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")


# ---------------------------------------------------------------------------
# rolling z-score anomalies
# ---------------------------------------------------------------------------


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


def test_rolling_anomaly_flags_planted_spike(spark):
    """A flat series with one 100x spike flags exactly the spike."""
    rows = [(1, i, _ts(i), 10.0 + (i % 3) * 0.1) for i in range(30)]
    rows[20] = (1, 20, _ts(20), 1000.0)
    out = rolling_zscore_anomalies(
        _events(spark, rows), "user_id", ["ts", "event_id"], "value",
        lookback=20, k=2, scale=10_000, min_obs=8).collect()
    flagged = {r.event_id for r in out}
    assert 20 in flagged
    # the spike itself plus at most a couple of post-spike rows whose
    # window variance the spike inflates asymmetrically — but the flat
    # pre-spike region must stay clean
    assert not {e for e in flagged if e < 20}


def test_rolling_anomaly_respects_warmup(spark):
    """Rows before min_obs observations are never flagged, even a
    wild early outlier."""
    rows = [(1, i, _ts(i), 10.0) for i in range(5)]
    rows[3] = (1, 3, _ts(3), 9999.0)
    out = rolling_zscore_anomalies(
        _events(spark, rows), "user_id", ["ts", "event_id"], "value",
        lookback=20, k=2, min_obs=8).collect()
    assert out == []


def test_rolling_anomaly_zero_variance_never_divides(spark):
    """A constant series has zero window variance; the multiplied-out
    integer predicate handles it without any division-by-zero."""
    rows = [(1, i, _ts(i), 42.0) for i in range(15)]
    out = rolling_zscore_anomalies(
        _events(spark, rows), "user_id", ["ts", "event_id"], "value"
        ).collect()
    assert out == []


# ---------------------------------------------------------------------------
# activity islands
# ---------------------------------------------------------------------------


def test_activity_islands_counts_planted_streaks(spark):
    """User 1: days {0,1,2, 5,6, 9} -> 3 islands, longest 3; multiple
    same-day events collapse."""
    def day(d, i=0):
        return dt.datetime(2024, 1, 1 + d, 6 + i)

    rows = [(1, 1, day(0), 0.0), (1, 2, day(0, 3), 0.0),
            (1, 3, day(1), 0.0), (1, 4, day(2), 0.0),
            (1, 5, day(5), 0.0), (1, 6, day(6), 0.0),
            (1, 7, day(9), 0.0),
            (2, 8, day(4), 0.0)]
    out = {r.user_id: r for r in
           activity_islands(_events(spark, rows), "user_id", "ts")
           .collect()}
    assert out[1].n_active_days == 6
    assert out[1].n_islands == 3
    assert out[1].longest_run == 3
    assert (out[2].n_active_days, out[2].n_islands,
            out[2].longest_run) == (1, 1, 1)


# ---------------------------------------------------------------------------
# weighted median
# ---------------------------------------------------------------------------


def test_weighted_median_hand_computed(spark):
    """values 1..4 with weights (1,1,5,1): total 8, half 4 — cum
    reaches 4 at value 3 (lower weighted median)."""
    df = spark.createDataFrame(
        [("g", 1.0, 1.0, 1), ("g", 2.0, 1.0, 2),
         ("g", 3.0, 5.0, 3), ("g", 4.0, 1.0, 4)],
        "g string, v double, w double, id int")
    row = weighted_median(df, ["g"], "v", "w", ["id"]).collect()[0]
    assert row.weighted_median == 3.0
    assert row.total_weight == 8


def test_weighted_median_reduces_to_plain_median(spark):
    """Unit weights: lower median of 5 values is the 3rd."""
    df = spark.createDataFrame(
        [("g", float(v), 1.0, v) for v in (10, 20, 30, 40, 50)],
        "g string, v double, w double, id int")
    row = weighted_median(df, ["g"], "v", "w", ["id"]).collect()[0]
    assert row.weighted_median == 30.0


def test_weighted_median_ties_match_row_level_definition(spark):
    """r12: the operator pre-aggregates weights per DISTINCT value
    before the cumulative window — the result must still match the
    row-level definition (smallest value whose doubled cumulative
    weight reaches the total) when the median falls INSIDE a
    tie-group of equal values. [1, 1, 2] unit weights: the second
    v=1 row already satisfies 2*cum >= total, so the answer is 1 —
    a distinct-level scan that only tested whole tie-groups too late
    would wrongly return 2."""
    df = spark.createDataFrame(
        [("g", 1.0, 1.0, 1), ("g", 1.0, 1.0, 2), ("g", 2.0, 1.0, 3)],
        "g string, v double, w double, id int")
    row = weighted_median(df, ["g"], "v", "w", ["id"]).collect()[0]
    assert row.weighted_median == 1.0
    assert row.total_weight == 3
    # duplicated values with non-unit weights on both sides of the cut
    df2 = spark.createDataFrame(
        [("g", 5.0, 1.0, 1), ("g", 5.0, 1.0, 2), ("g", 7.0, 3.0, 3)],
        "g string, v double, w double, id int")
    row2 = weighted_median(df2, ["g"], "v", "w", ["id"]).collect()[0]
    assert row2.weighted_median == 7.0
    assert row2.total_weight == 5


# ---------------------------------------------------------------------------
# equi-depth bins
# ---------------------------------------------------------------------------


def test_equidepth_bins_balanced_and_ordered(spark):
    """100 distinct values into 10 bins: each bin exactly 10 rows,
    bin ranges contiguous and non-overlapping."""
    df = spark.createDataFrame(
        [("g", float(i), i) for i in range(100)],
        "g string, v double, id int")
    out = grouped_equidepth_bins(df, ["g"], "v", "id", n_bins=10) \
        .collect()
    assert [r.n for r in out] == [10] * 10
    for a, b in zip(out, out[1:]):
        assert a.hi < b.lo


def test_equidepth_bins_remainder_goes_to_early_bins(spark):
    """ntile semantics: 23 rows / 4 bins -> sizes 6,6,6,5."""
    df = spark.createDataFrame(
        [("g", float(i), i) for i in range(23)],
        "g string, v double, id int")
    out = grouped_equidepth_bins(df, ["g"], "v", "id", n_bins=4) \
        .collect()
    assert [r.n for r in out] == [6, 6, 6, 5]


# ---------------------------------------------------------------------------
# HLL distinct sketch
# ---------------------------------------------------------------------------


def test_hll_estimate_within_bound(spark):
    """256 registers -> ~1.04/sqrt(256) = 6.5% typical error; assert a
    generous 4-sigma 26% bound on a 5000-distinct-key input."""
    from kafka_connect_msk_demo_spark.pipeline.sketches import hll_distinct
    df = spark.createDataFrame(
        [("g", i) for i in range(5000)], "g string, k long")
    row = hll_distinct(df, "k", "g").collect()[0]
    assert row.n_true == 5000
    assert abs(row.rel_err) < 0.26


def test_hll_partitioning_invariance(spark):
    """Register maxima are a commutative aggregate: the estimate must
    be bit-identical under any partition layout."""
    from kafka_connect_msk_demo_spark.pipeline.sketches import hll_distinct
    rows = [("g", i % 700) for i in range(3000)]
    ests = []
    for p in (1, 7, 32):
        df = spark.createDataFrame(rows, "g string, k long").repartition(p)
        ests.append(hll_distinct(df, "k", "g").collect()[0].est_raw)
    assert ests[0] == ests[1] == ests[2]


def test_hll_duplicates_do_not_move_estimate(spark):
    """HLL state is per-register max -> replication-invariant."""
    from kafka_connect_msk_demo_spark.pipeline.sketches import hll_distinct
    base = [("g", i) for i in range(1000)]
    e1 = hll_distinct(spark.createDataFrame(base, "g string, k long"),
                      "k", "g").collect()[0].est_raw
    e2 = hll_distinct(spark.createDataFrame(base * 5, "g string, k long"),
                      "k", "g").collect()[0].est_raw
    assert e1 == e2


# ---------------------------------------------------------------------------
# domain cap
# ---------------------------------------------------------------------------


def test_domain_cap_respects_quota_and_determinism(spark):
    from kafka_connect_msk_demo_spark.pipeline.selection import domain_cap
    rows = [(f"s{i % 3}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = domain_cap(df, cap=10).collect()
    per = {}
    for r in out:
        per.setdefault(r.source, set()).add(r.doc_id)
    assert all(len(v) == 10 for v in per.values())
    # deterministic: same selection under a different partitioning
    out2 = domain_cap(df.repartition(13), cap=10).collect()
    assert {(r.source, r.doc_id) for r in out} == \
        {(r.source, r.doc_id) for r in out2}


def test_domain_cap_small_domain_kept_whole(spark):
    from kafka_connect_msk_demo_spark.pipeline.selection import domain_cap
    df = spark.createDataFrame(
        [("tiny", i) for i in range(4)], "source string, doc_id long")
    assert len(domain_cap(df, cap=100).collect()) == 4


# ---------------------------------------------------------------------------
# embedding dim stats
# ---------------------------------------------------------------------------


def test_embed_dim_stats_hand_computed(spark):
    from kafka_connect_msk_demo_spark.pipeline.similarity import (
        embedding_dim_stats,
    )
    df = spark.createDataFrame(
        [(1, [1.0, -2.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<float>")
    out = {r.dim: r for r in embedding_dim_stats(df).collect()}
    assert out[1].n == 2 and out[1].mean_q == 2.0
    assert out[2].v_min == -2.0 and out[2].v_max == 4.0
    assert out[1].sum_q == 4_000_000


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_and_bounds_overcount(spark):
    """est >= true for every probe (structural guarantee), and with
    N=6000 items over width 512 the expected row overcount is
    N/512 ~ 12; min over 3 rows stays well under 10x that."""
    from kafka_connect_msk_demo_spark.pipeline.sketches import cms_estimate
    rows = [(f"k{i % 600}",) for i in range(6000)]
    items = spark.createDataFrame(rows, "w string")
    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 600, 60)], "w string")
    exact = {f"k{i}": 10 for i in range(0, 600, 60)}
    out = {r.w: r.cnt_cms for r in
           cms_estimate(items, probes, "w").collect()}
    for w, est in out.items():
        assert est >= exact[w]
        assert est <= exact[w] + 120


def test_cms_partitioning_invariance(spark):
    """Counter cells are plain counts — estimates identical under any
    partition layout."""
    from kafka_connect_msk_demo_spark.pipeline.sketches import cms_estimate
    rows = [(f"k{i % 97}",) for i in range(2000)]
    probes = spark.createDataFrame([("k0",), ("k42",)], "w string")
    outs = []
    for p in (1, 13):
        items = spark.createDataFrame(rows, "w string").repartition(p)
        outs.append(sorted(
            (r.w, r.cnt_cms)
            for r in cms_estimate(items, probes, "w").collect()))
    assert outs[0] == outs[1]


def test_cms_absent_probe_small_estimate(spark):
    """A key never inserted can only collide into noise: estimate is
    bounded by the worst row collision, far below the big keys."""
    from kafka_connect_msk_demo_spark.pipeline.sketches import cms_estimate
    items = spark.createDataFrame(
        [(f"k{i % 10}",) for i in range(1000)], "w string")
    probes = spark.createDataFrame([("never-seen",)], "w string")
    est = cms_estimate(items, probes, "w").collect()[0].cnt_cms
    assert 0 <= est <= 200


# ---------------------------------------------------------------------------
# hard negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_exclude_same_label(spark, sf_small):
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.pipeline.similarity import (
        hard_negative_topk,
    )
    vecs = load_table(spark, sf_small, "embeddings")
    labels = {r.vec_id: r.label for r in
              vecs.select("vec_id", "label").collect()}
    out = hard_negative_topk(vecs, k=5, mod=20).collect()
    assert out, "no hard negatives mined"
    for r in out:
        assert labels[r.q_id] != labels[r.vec_id]
        assert r.q_id != r.vec_id


def test_hard_negatives_are_hardest_in_candidate_set(spark, sf_small):
    """Rank-1 different-label LSH candidate must beat every other
    different-label EXACT neighbour that shares an LSH bucket — sanity
    vs the brute-force different-label ranking restricted to rank 1."""
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.pipeline.similarity import (
        brute_force_topk,
        hard_negative_topk,
        queries_by_mod,
    )
    vecs = load_table(spark, sf_small, "embeddings")
    labels = {r.vec_id: r.label for r in
              vecs.select("vec_id", "label").collect()}
    mined = {(r.q_id, r.rank): (r.vec_id, r.cos) for r in
             hard_negative_topk(vecs, k=1, mod=20).collect()}
    # brute-force: top different-label neighbour per query
    bf = brute_force_topk(vecs, queries_by_mod(vecs, 20), k=100)
    best = {}
    for r in sorted(bf.collect(), key=lambda r: (r.q_id, r.rank)):
        if labels[r.q_id] != labels[r.vec_id] and r.q_id not in best:
            best[r.q_id] = (r.vec_id, r.cos)
    hits = sum(1 for (q, rk), (v, c) in mined.items()
               if rk == 1 and best.get(q, (None, None))[0] == v)
    # Hard negatives sit at moderate cosine, where per-table LSH hit
    # rates are lower than the near-dup regime — exact-top-1 recall is
    # honestly ~0.6-0.8 at these settings. Gate on that floor plus a
    # quality ratio: even when the exact argmax is missed, the mined
    # negative must be nearly as hard as the true hardest.
    assert hits / max(len(best), 1) >= 0.6
    ratios = [c / best[q][1] for (q, rk), (v, c) in mined.items()
              if rk == 1 and q in best and best[q][1] > 0]
    assert ratios and sum(ratios) / len(ratios) >= 0.9


# ---------------------------------------------------------------------------
# minhash jaccard estimation
# ---------------------------------------------------------------------------


def test_minhash_signature_partitioning_invariance(spark, sf_small):
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.pipeline.dedup import (
        minhash_signatures,
    )
    from kafka_connect_msk_demo_spark.pipeline.textprep import doc_shingles
    docs = load_table(spark, sf_small, "documents")
    sigs = []
    for p in (1, 8):
        sh = doc_shingles(docs.repartition(p))
        sigs.append({r.doc_id: tuple(r.sig) for r in
                     minhash_signatures(sh).collect()})
    assert sigs[0] == sigs[1]


def test_minhash_estimates_track_exact_jaccard(spark, sf_small):
    """E[est] = J, sd ~ 0.044 at 128 hashes: mean |err| over the pair
    set must stay within a loose 3-sigma envelope."""
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.pipeline.dedup import (
        minhash_jaccard_estimates,
    )
    docs = load_table(spark, sf_small, "documents")
    rows = minhash_jaccard_estimates(docs, threshold=0.5).collect()
    assert rows, "no near-pairs at J>=0.5 in testdata"
    errs = [abs(r.est_jac - r.jac) for r in rows]
    assert sum(errs) / len(errs) < 0.13
    assert all(0.0 <= r.est_jac <= 1.0 for r in rows)


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------


def test_triangle_count_k4_plus_tail(spark):
    """K4 (4 triangles, 12 wedges closed subset) with a pendant tail:
    counts must be exact."""
    from kafka_connect_msk_demo_spark.pipeline.graph import triangle_count
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(k4 + [(4, 5)], "u long, v long")
    row = triangle_count(edges).collect()[0]
    assert row.n_triangles == 4
    assert row.n_nodes == 5
    assert row.n_edges == 7


def test_triangle_count_triangle_free(spark):
    from kafka_connect_msk_demo_spark.pipeline.graph import triangle_count
    # a 6-cycle: wedges exist, no triangle
    cyc = [(i, i % 6 + 1) for i in range(1, 7)]
    row = triangle_count(
        spark.createDataFrame(cyc, "u long, v long")).collect()[0]
    assert row.n_triangles == 0
    assert row.n_edges == 6


def test_triangle_count_defensive_dedup(spark):
    """VERDICT r6 "What's wrong" #2: duplicated input edges used to
    skew the census mutually inconsistently (array_intersect dedups,
    the wedge census counts with multiplicity). The defensive dedup
    must make a duplicated feed bit-identical to the clean one —
    unless the caller explicitly declares distinctness."""
    from kafka_connect_msk_demo_spark.pipeline.graph import triangle_count
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    clean = spark.createDataFrame(k4, "u long, v long")
    dup = spark.createDataFrame(k4 + k4 + k4[:3], "u long, v long")
    want = triangle_count(clean, assume_distinct=True).collect()[0]
    got = triangle_count(dup).collect()[0]
    assert tuple(got) == tuple(want)
    # oriented wedge census: Σ in(v)·out(v) over the degree-ordered
    # orientation of K4 = 0+2+2+0 = 4 (not the 12 undirected 2-paths)
    assert want.n_triangles == 4 and want.n_wedges == 4


def test_triangle_count_orientation_counts_once(spark):
    """Two triangles sharing an edge -> exactly 2, not double-counted
    by the shared edge."""
    from kafka_connect_msk_demo_spark.pipeline.graph import triangle_count
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)], "u long, v long")
    row = triangle_count(edges).collect()[0]
    assert row.n_triangles == 2


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------


def test_kcore_peel_removes_tail_then_stabilizes(spark):
    """K4 with a pendant path: round 1 strips the path (deg < 3),
    K4 itself is a 3-core and survives every later round."""
    from kafka_connect_msk_demo_spark.pipeline.graph import kcore_peel
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    tail = [(4, 5), (5, 6)]
    out = {r.round: r for r in kcore_peel(
        spark.createDataFrame(k4 + tail, "u long, v long"),
        k=3, rounds=3).collect()}
    assert out[1].n_remaining == 4
    assert out[1].n_removed == 2
    assert out[2].n_removed == 0 and out[3].n_removed == 0


def test_kcore_peel_cascade(spark):
    """A chain of triangles collapses progressively: peeling must
    cascade across rounds, not just filter once."""
    from kafka_connect_msk_demo_spark.pipeline.graph import kcore_peel
    # path graph: every node deg <= 2 -> all gone in round 1 at k=3
    path = [(i, i + 1) for i in range(1, 8)]
    out = {r.round: r for r in kcore_peel(
        spark.createDataFrame(path, "u long, v long"),
        k=3, rounds=2).collect()}
    assert out[1].n_remaining == 0


# ---------------------------------------------------------------------------
# BPE merge candidates
# ---------------------------------------------------------------------------


def test_bpe_merges_hand_computed(spark):
    from kafka_connect_msk_demo_spark.pipeline.text_analysis import (
        bpe_merge_candidates,
    )
    docs = spark.createDataFrame(
        [(1, "abab abab"), (2, "abc")], "doc_id long, text string")
    out = {r.pair: r.cnt for r in
           bpe_merge_candidates(docs, top=10).collect()}
    # "abab" x2 tokens: ab,ba,ab each -> ab:2/token = 4 total + "abc" ab:1
    assert out["ab"] == 5
    assert out["ba"] == 2
    assert out["bc"] == 1


def test_bpe_merges_ignores_single_char_tokens(spark):
    from kafka_connect_msk_demo_spark.pipeline.text_analysis import (
        bpe_merge_candidates,
    )
    docs = spark.createDataFrame(
        [(1, "a b c xy")], "doc_id long, text string")
    out = {r.pair: r.cnt for r in
           bpe_merge_candidates(docs, top=10).collect()}
    assert out == {"xy": 1}


# ---------------------------------------------------------------------------
# 2-D skyline
# ---------------------------------------------------------------------------


def test_skyline_hand_computed(spark):
    """Points (1,10) (2,9) (2,8) (3,5) (0,20): frontier is
    (3,5), (2,9), (1,10), (0,20); the (2,8) point is dominated by
    (2,9)."""
    from kafka_connect_msk_demo_spark.operators.relational import (
        skyline_2d,
    )
    pts = [(1, 10.0, 1), (2, 9.0, 2), (2, 8.0, 3), (3, 5.0, 4),
           (0, 20.0, 5)]
    df = spark.createDataFrame(pts, "x long, y double, id long")
    out = [(r.x, r.y) for r in skyline_2d(df, "x", "y", "id").collect()]
    assert out == [(3, 5.0), (2, 9.0), (1, 10.0), (0, 20.0)]


def test_skyline_duplicate_point_keeps_one_representative(spark):
    from kafka_connect_msk_demo_spark.operators.relational import (
        skyline_2d,
    )
    pts = [(5, 5.0, 9), (5, 5.0, 2), (1, 1.0, 3)]
    df = spark.createDataFrame(pts, "x long, y double, id long")
    out = skyline_2d(df, "x", "y", "id").collect()
    assert [(r.x, r.y, r.id) for r in out] == [(5, 5.0, 2)]


def test_skyline_dominated_interior_dropped(spark):
    from kafka_connect_msk_demo_spark.operators.relational import (
        skyline_2d,
    )
    pts = [(10, 10.0, 1), (5, 5.0, 2), (1, 20.0, 3)]
    df = spark.createDataFrame(pts, "x long, y double, id long")
    out = {(r.x, r.y) for r in skyline_2d(df, "x", "y", "id").collect()}
    assert out == {(10, 10.0), (1, 20.0)}


# ---------------------------------------------------------------------------
# Benford audit
# ---------------------------------------------------------------------------


def test_benford_counts_and_shares(spark, sf_small):
    import math

    from kafka_connect_msk_demo_spark.queries import q_benford_audit
    rows = q_benford_audit(spark, sf_small).collect()
    assert {r.digit for r in rows} <= {str(d) for d in range(1, 10)}
    total = sum(r.n for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.benford == math.log10(1 + 1 / int(r.digit))
        assert abs(r.dev - (r.n / total - r.benford)) < 1e-12


def test_band_buckets_digest_the_signature_slices(spark):
    """minhash_band_buckets and minhash_signatures must draw the SAME
    hash family (shared minhash_seed): every band bucket equals the
    md5-prefix digest of the corresponding signature slice."""
    import hashlib

    import numpy as np

    from kafka_connect_msk_demo_spark.pipeline.dedup import (
        minhash_band_buckets,
        minhash_signatures,
    )
    from kafka_connect_msk_demo_spark.pipeline.textprep import doc_shingles
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "one two three four five six")],
        "doc_id long, text string")
    sh = doc_shingles(docs)
    sigs = {r.doc_id: np.array(r.sig, dtype=np.int64).astype(np.uint64)
            for r in minhash_signatures(sh, 128).collect()}
    rows = 128 // 16
    for r in minhash_band_buckets(sh, 128, 16).collect():
        sl = sigs[r.doc_id][r.band * rows:(r.band + 1) * rows]
        want = int.from_bytes(hashlib.md5(sl.tobytes()).digest()[:8],
                              "big", signed=True)
        assert r.bh == want


# ---------------------------------------------------------------------------
# bloom semi join
# ---------------------------------------------------------------------------


def test_bloom_semi_join_equals_plain_semi_join(spark):
    from kafka_connect_msk_demo_spark.operators.joins import (
        bloom_semi_join,
    )
    fact = spark.createDataFrame(
        [(i, f"row{i}") for i in range(500)], "k long, payload string")
    dim = spark.createDataFrame(
        [(i,) for i in range(0, 500, 7)], "k long")
    got = {r.k for r in bloom_semi_join(fact, dim, "k").collect()}
    want = set(range(0, 500, 7))
    assert got == want


def test_bloom_semi_join_tiny_filter_still_exact(spark):
    """With bits=16 the Bloom is saturated with false positives; the
    exact verification join must still produce the precise answer."""
    from kafka_connect_msk_demo_spark.operators.joins import (
        bloom_semi_join,
    )
    fact = spark.createDataFrame(
        [(i, i * 2) for i in range(200)], "k long, v long")
    dim = spark.createDataFrame([(3,), (77,)], "k long")
    got = sorted(r.k for r in
                 bloom_semi_join(fact, dim, "k", bits=16).collect())
    assert got == [3, 77]


# ---------------------------------------------------------------------------
# MAD outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_flags_only_the_planted_extreme(spark, sf_small):
    """Hand-built group: values 1..9 plus one 1000x point — exactly
    one outlier; MAD is immune to the outlier's own magnitude."""
    import datetime as dt

    from kafka_connect_msk_demo_spark.queries import q_mad_outliers  # noqa: F401
    from kafka_connect_msk_demo_spark.operators.temporal import (  # noqa: F401
        rolling_zscore_anomalies,
    )
    # use the same shape the registered query computes, via SQL on a
    # tiny frame through the operator chain inline:
    from pyspark.sql import functions as F
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 9999.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    med = df.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med"))
    dev = df.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med")))
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.percentile("adev", F.lit(0.5)).alias("mad"))
    row = mad.collect()[0]
    flagged = dev.join(mad.select("event_type", "mad"), "event_type") \
        .filter(F.abs(F.col("value") - F.col("med"))
                > 3.0 * F.col("mad")).count()
    assert row.med == 5.5
    assert flagged == 1
