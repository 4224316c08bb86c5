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


def test_asof_forward_hand_case(spark):
    """Forward as-of (the registered plan via asof_forward_frame)
    picks the FIRST event at-or-after each order, ties on instant
    resolved to the smallest event_id, and orders with no future
    event drop."""
    from kafka_connect_msk_demo_spark.queries import asof_forward_frame

    ev = spark.createDataFrame(
        [(1, 100, 5), (1, 100, 3), (1, 200, 7), (2, 50, 9)],
        "user_id long, us long, event_id long")
    orders = spark.createDataFrame(
        [(1, 100, 11), (1, 150, 12), (1, 250, 13), (3, 10, 14)],
        "user_id long, us long, o_orderkey long")
    got = {r.o_orderkey: (r.next_us, r.next_event_id)
           for r in asof_forward_frame(ev, orders).collect()}
    # order@100 matches same-instant event (>=), tie -> event_id 3;
    # order@150 matches the 200 event; order@250 has no future event;
    # user 3 has no events at all.
    assert got == {11: (100, 3), 12: (200, 7)}


def test_golden_profile_survivorship_rules(spark, sf_small):
    """last_value ignores error events; modal_type is the max-count
    type with alphabetical tie-break; first/last bound every event."""
    from kafka_connect_msk_demo_spark.queries import q_golden_profile
    from kafka_connect_msk_demo_spark.catalog import load_table
    out = q_golden_profile(spark, sf_small)
    rows = out.limit(50).collect()
    ev = (load_table(spark, sf_small, "events")
          .select("user_id", "event_id", "event_type", "value",
                  F.unix_micros("ts").alias("us")).collect())
    by_user = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    for r in rows:
        es = by_user[r.user_id]
        assert r.n_events == len(es)
        assert r.first_us == min(e.us for e in es)
        assert r.last_us == max(e.us for e in es)
        ok = [e for e in es if e.event_type != "error"]
        if ok:
            best = max(ok, key=lambda e: (e.us, e.event_id))
            assert r.last_value == best.value
        else:
            assert r.last_value is None
        from collections import Counter
        cnt = Counter(e.event_type for e in es)
        top = max(cnt.values())
        assert r.modal_type == min(t for t, c in cnt.items()
                                   if c == top)


def test_chi2_marginals_conserved(spark, sf_small):
    """Expected counts under independence preserve the row and column
    marginals of the observed contingency table (to float rounding)."""
    from kafka_connect_msk_demo_spark.queries import q_chi2_independence
    rows = q_chi2_independence(spark, sf_small).collect()
    from collections import defaultdict
    obs_r, exp_r = defaultdict(int), defaultdict(float)
    for r in rows:
        obs_r[r.event_type] += r.observed
        exp_r[r.event_type] += r.expected
    for k in obs_r:
        assert abs(obs_r[k] - exp_r[k]) < 1e-6 * max(1, obs_r[k])
    assert all(r.contrib >= 0 for r in rows)


def test_corr_matrix_coefficients_bounded(spark, sf_small):
    from kafka_connect_msk_demo_spark.queries import q_corr_matrix
    rows = q_corr_matrix(spark, sf_small).collect()
    assert rows, "lineitem has 3 returnflags"
    for r in rows:
        for c in r.asDict():
            if c.startswith("r_"):
                v = r[c]
                assert v is None or -1.0 - 1e-12 <= v <= 1.0 + 1e-12


def test_dup_spectrum_accounts_for_every_document(spark, sf_small):
    """sum(cluster_size * n_clusters) == sum(n_docs) == corpus size."""
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        q_dup_spectrum)
    from kafka_connect_msk_demo_spark.catalog import load_table
    rows = q_dup_spectrum(spark, sf_small).collect()
    n = load_table(spark, sf_small, "documents").count()
    assert sum(r.cluster_size * r.n_clusters for r in rows) == n
    assert sum(r.n_docs for r in rows) == n


def test_decile_lift_partitions_all_customers(spark, sf_small):
    """Deciles cover every customer, sizes differ by <= 1, cum_share
    is monotone and ends at exactly 1.0."""
    from kafka_connect_msk_demo_spark.queries import q_decile_lift
    from kafka_connect_msk_demo_spark.catalog import load_table
    rows = q_decile_lift(spark, sf_small).collect()
    n = load_table(spark, sf_small, "customer").count()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_cust for r in rows) == n
    assert max(r.n_cust for r in rows) - min(r.n_cust for r in rows) <= 1
    shares = [r.cum_share for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-12


def test_rolling_corr_window_semantics(spark, sf_small):
    """r is only emitted with a full 7-row frame and every value is a
    valid correlation (or NULL when one series is constant)."""
    from kafka_connect_msk_demo_spark.queries import q_rolling_corr
    rows = q_rolling_corr(spark, sf_small).collect()
    assert rows, "sf0.001 spans well over 7 days"
    for r in rows:
        assert r.r is None or -1.0 - 1e-12 <= r.r <= 1.0 + 1e-12


def test_ab_test_accounts_for_every_user(spark, sf_small):
    from kafka_connect_msk_demo_spark.queries import q_ab_test
    from kafka_connect_msk_demo_spark.catalog import load_table
    row = q_ab_test(spark, sf_small).collect()[0]
    n_users = (load_table(spark, sf_small, "events")
               .select("user_id").distinct().count())
    assert row.n0 + row.n1 == n_users
    assert 0 <= row.x0 <= row.n0 and 0 <= row.x1 <= row.n1
    if row.z is not None:
        import math
        assert math.copysign(1, row.z) == math.copysign(
            1, row.p0 - row.p1) or row.z == 0


def test_bfs_hand_case(spark):
    """Path graph 1-2-3-4-5-6 from source 1 through the registered
    plan (bfs_hops_frame): hops bound at 3, nodes beyond it absent."""
    from kafka_connect_msk_demo_spark.queries import bfs_hops_frame
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 2), (11, 3), (12, 3), (12, 4),
         (13, 4), (13, 5), (14, 5), (14, 6)],
        "l_orderkey long, l_partkey long")
    got = {r.node: r.hops for r in bfs_hops_frame(li).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_seq_pattern_requires_three_consecutive_clicks(spark):
    from kafka_connect_msk_demo_spark.queries import seq_pattern_frame

    rows = [
        # user 1: c c c p -> hit at event 4
        (1, 1, 100, "click"), (1, 2, 200, "click"),
        (1, 3, 300, "click"), (1, 4, 400, "purchase"),
        # user 2: c c v p -> view breaks the run, no hit
        (2, 5, 100, "click"), (2, 6, 200, "click"),
        (2, 7, 300, "view"), (2, 8, 400, "purchase"),
        # user 3: only two clicks before purchase, no hit
        (3, 9, 100, "click"), (3, 10, 200, "click"),
        (3, 11, 300, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string")
    out = seq_pattern_frame(ev).collect()
    assert [(r.user_id, r.event_id) for r in out] == [(1, 4)]


def test_stream_left_join_nulls_watermark_contract(spark, sf_small):
    """The outer join's null rows stop exactly at the MIN-of-inputs
    watermark: every unmatched click satisfies
    click_us + 30 min < least(max click, max purchase) - 1 h, and at
    least one click past that horizon exists but is NOT emitted."""
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.streaming.queries import (
        stream_left_join_nulls)
    out = stream_left_join_nulls(spark, sf_small).collect()
    ev = load_table(spark, sf_small, "events")
    mx = {r.event_type: r.mx for r in
          (ev.filter(F.col("event_type").isin("click", "purchase"))
           .groupBy("event_type")
           .agg(F.max(F.unix_micros("ts")).alias("mx")).collect())}
    wm = min(mx["click"], mx["purchase"]) - 3_600_000_000
    nulls = [r for r in out if r.purchase_id is None]
    assert nulls, "some clicks never convert"
    for r in nulls:
        assert r.click_us + 1_800_000_000 < wm
    # clicks in the un-provable tail are absent entirely if unmatched
    emitted = {(r.click_id) for r in out}
    tail_clicks = (ev.filter((F.col("event_type") == "click")
                             & (F.unix_micros("ts")
                                + 1_800_000_000 >= wm))
                   .select("event_id").collect())
    matched = {r.click_id for r in out if r.purchase_id is not None}
    for t in tail_clicks:
        assert t.event_id not in emitted or t.event_id in matched


def test_asof_nearest_tie_and_side_selection(spark, sf_small):
    """Every picked event is genuinely the minimum |distance| event
    for its order (checked against a brute-force pandas recompute on
    a 50-order sample), and equidistant ties resolve to the earlier
    event."""
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.queries import q_asof_nearest
    out = {r.o_orderkey: r for r in
           q_asof_nearest(spark, sf_small).limit(50).collect()}
    orders = {r.o_orderkey: (r.o_custkey, r.us) for r in
              (load_table(spark, sf_small, "orders")
               .select("o_orderkey", "o_custkey",
                       F.unix_micros("o_orderdate").alias("us"))
               .collect())}
    ev = {}
    for r in (load_table(spark, sf_small, "events")
              .select("user_id", "event_id",
                      F.unix_micros("ts").alias("us")).collect()):
        ev.setdefault(r.user_id, []).append((r.us, r.event_id))
    for okey, row in out.items():
        user, ous = orders[okey]
        cands = ev.get(user, [])
        assert cands
        best = min(cands, key=lambda c: (abs(c[0] - ous), c[0], c[1]))
        assert (row.event_us, row.event_id) == best
        assert row.dist_us == abs(best[0] - ous)


def test_share_of_parent_shares_sum_to_one(spark, sf_small):
    from collections import defaultdict
    from kafka_connect_msk_demo_spark.queries import q_share_of_parent
    rows = q_share_of_parent(spark, sf_small).collect()
    per_region = defaultdict(float)
    for r in rows:
        per_region[r.region] += r.share_of_region
    for region, s in per_region.items():
        assert abs(s - 1.0) < 1e-9, region
    assert abs(sum(r.share_of_total for r in rows) - 1.0) < 1e-9


def test_degree_histogram_counts_every_node(spark, sf_small):
    """sum(n_parts) equals the number of distinct parts appearing in
    at least one co-purchase pair."""
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.queries import q_degree_histogram
    rows = q_degree_histogram(spark, sf_small).collect()
    li = (load_table(spark, sf_small, "lineitem")
          .select(F.col("l_orderkey").alias("okey"),
                  F.col("l_partkey").alias("part")).distinct())
    pairs = (li.alias("a").join(
        li.alias("b"), (F.col("a.okey") == F.col("b.okey"))
        & (F.col("a.part") < F.col("b.part")))
        .select(F.col("a.part").alias("s"), F.col("b.part").alias("d"))
        .distinct())
    n_nodes = (pairs.select(F.col("s").alias("p"))
               .unionByName(pairs.select(F.col("d").alias("p")))
               .distinct().count())
    assert sum(r.n_parts for r in rows) == n_nodes
    assert all(r.degree >= 1 for r in rows)


def test_rare_token_score_hand_case(spark):
    """Token 'zzz' appears once (rare), 'the' appears 4 times (not
    rare with threshold <= 2) — through the registered plan
    (rare_token_frame)."""
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        rare_token_frame)
    docs = spark.createDataFrame(
        [(1, "the cat zzz"), (2, "the dog"), (3, "the the qqq www")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_rare) for r in
           rare_token_frame(docs).collect()}
    # freqs: the=4, cat=1, zzz=1, dog=1, qqq=1, www=1
    assert got == {1: (3, 2), 2: (2, 1), 3: (4, 2)}


def test_dup_source_matrix_pools_unordered_pairs(spark, sf_small):
    """n_pairs across the matrix equals the near-pair count, and each
    row's sources are in canonical (a <= b) order."""
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        q_dup_source_matrix, q_dedup_near_pairs)
    rows = q_dup_source_matrix(spark, sf_small).collect()
    n_pairs = q_dedup_near_pairs(spark, sf_small).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert r.source_a <= r.source_b


def test_cdc_snapshot_diff_classes(spark, sf_small):
    """All three change classes appear, with the expected key-residue
    structure: deleted => key <= 500 and key%10==0; updated => key <=
    500 and key%10 in {1,2} with price_new ~ 1.1*price_old; inserted
    => key > 500 and key%10 != 0."""
    from kafka_connect_msk_demo_spark.queries import q_cdc_snapshot_diff
    rows = q_cdc_snapshot_diff(spark, sf_small).collect()
    classes = {r.change for r in rows}
    assert classes == {"inserted", "updated", "deleted"}
    for r in rows:
        k = r.o_orderkey
        if r.change == "deleted":
            assert k <= 500 and k % 10 == 0
            assert r.price_new is None
        elif r.change == "updated":
            assert k <= 500 and k % 10 in (1, 2)
            assert abs(r.price_new - r.price_old * 1.1) < 1e-6
        else:
            assert k > 500 and k % 10 != 0
            assert r.price_old is None


def test_stream_record_high_emissions_are_strict_highs(spark, sf_small):
    """Every emitted row strictly exceeds all earlier values for the
    user, and the first event per user is always emitted."""
    from kafka_connect_msk_demo_spark.streaming.queries import (
        stream_record_high)
    from kafka_connect_msk_demo_spark.catalog import load_table
    out = stream_record_high(spark, sf_small).collect()
    ev = {}
    for r in (load_table(spark, sf_small, "events")
              .select("user_id", "event_id", "value",
                      F.unix_micros("ts").alias("us")).collect()):
        ev.setdefault(r.user_id, []).append((r.us, r.event_id, r.value))
    emitted = {(r.user_id, r.event_id) for r in out}
    for user, rows in ev.items():
        rows.sort()
        mx = None
        for us, eid, v in rows:
            should = mx is None or v > mx
            assert ((user, eid) in emitted) == should, (user, eid)
            mx = v if mx is None else max(mx, v)


def test_registry_wire_framing(spark):
    """frame/unframe invert each other; a corrupted magic byte yields
    a NULL schema id (dead-letter signal) while the payload column
    still projects."""
    from kafka_connect_msk_demo_spark.serde import (
        frame_registry, unframe_registry)
    df = spark.createDataFrame([(b"payload-1",), (b"",)],
                               "value binary")
    framed = df.select(frame_registry(F.col("value"), 1234)
                       .alias("value"))
    sid, payload = unframe_registry(F.col("value"))
    rows = framed.select(sid.alias("sid"),
                         payload.alias("p")).collect()
    assert [(r.sid, bytes(r.p)) for r in rows] == \
        [(1234, b"payload-1"), (1234, b"")]
    # corrupt the magic byte
    bad = spark.createDataFrame([(b"\x01\x00\x00\x04\xd2xyz",)],
                                "value binary")
    sid2, _ = unframe_registry(F.col("value"))
    assert bad.select(sid2.alias("sid")).collect()[0].sid is None
    import pytest
    with pytest.raises(ValueError):
        frame_registry(F.col("value"), -1)


def test_rollup_cascade_conserves_counts(spark, sf_small):
    """Orders/days/weeks counted at the monthly grain reconcile with
    the fact table exactly (conservation across the cascade)."""
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.queries import q_rollup_cascade
    rows = q_rollup_cascade(spark, sf_small).collect()
    orders = load_table(spark, sf_small, "orders")
    n_orders = orders.count()
    n_days = (orders.select(
        (F.unix_micros("o_orderdate") / 86400000000)
        .cast("long").alias("d")).distinct().count())
    assert sum(r.n_orders for r in rows) == n_orders
    assert sum(r.n_days for r in rows) == n_days
    total = sum(r.revenue for r in rows)
    exact = (orders.select(F.round(F.col("o_totalprice") * 100)
                           .cast("long").alias("c"))
             .agg(F.sum("c")).collect()[0][0])
    assert abs(total - exact / 100.0) < 1e-6 * max(1.0, total)


def test_lag_features_hand_case(spark, sf_small):
    """First event per user has NULL lags/gap; mean5 over the first k
    rows equals the mean of those rows (exact cents division)."""
    from kafka_connect_msk_demo_spark.queries import q_lag_features
    rows = q_lag_features(spark, sf_small).collect()
    from collections import defaultdict
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, rs in by_user.items():
        assert rs[0].lag1 is None and rs[0].gap_us is None
        if len(rs) >= 2:
            assert rs[1].lag1 == rs[0].value
            assert rs[1].gap_us == rs[1].ts_us - rs[0].ts_us
        for i, r in enumerate(rs[:6]):
            frame = rs[max(0, i - 4):i + 1]
            cents = [round(x.value * 100) for x in frame]
            assert abs(r.mean5 - sum(cents) / len(cents) / 100.0) \
                < 1e-9


def test_target_encode_loo_excludes_self(spark):
    """Through the registered plan (target_encode_frame): each row's
    encoding is the mean of the OTHER rows of its category; singleton
    categories yield NULL."""
    from kafka_connect_msk_demo_spark.queries import target_encode_frame
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 5.0)],
        "event_id long, event_type string, value double")
    got = {r.event_id: r.loo_mean
           for r in target_encode_frame(df).collect()}
    assert got[1] == 25.0 and got[2] == 20.0 and got[3] == 15.0
    assert got[4] is None  # singleton category


def test_unframe_rejects_truncated_frames(spark):
    """A frame shorter than the 5-byte header yields a NULL schema id
    even with a valid magic byte (a truncated id would otherwise
    right-align through conv() into a bogus-but-plausible id)."""
    from kafka_connect_msk_demo_spark.serde import unframe_registry
    bad = spark.createDataFrame(
        [(b"\x00\x00\x04\xd2",), (b"\x00",), (b"",)], "value binary")
    sid, _ = unframe_registry(F.col("value"))
    assert [r.sid for r in bad.select(sid.alias("sid")).collect()] \
        == [None, None, None]
