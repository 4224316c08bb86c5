"""Semantic tests for the round-4 operators: sequence packing, the KMV
distinct sketch, BM25 retrieval, mixture sampling, and text
normalization. (Oracle parity for each registered query runs
separately via tests/test_oracle_parity.py.)"""

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.catalog import load_table
from kafka_connect_msk_demo_spark.operators.sampling import (
    mixture_hash_sample,
)
from kafka_connect_msk_demo_spark.pipeline import clean, packing
from kafka_connect_msk_demo_spark.pipeline.sketches import kmv_distinct
from kafka_connect_msk_demo_spark.pipeline.text_analysis import bm25_topk

BUDGET = 2048


def test_pack_bins_matches_prefix_sum_replay(spark, sf_small):
    """Every doc's bin equals floor(exclusive-prefix-sum / budget)
    replayed in plain Python per stream, and no document is lost."""
    docs = load_table(spark, sf_small, "documents")
    got = packing.pack_bins(docs, budget=BUDGET, n_shards=8).collect()
    assert len(got) == docs.count()
    streams: dict = {}
    for r in sorted(got, key=lambda r: (r.lang, r.shard, r.doc_id)):
        cum = streams.get((r.lang, r.shard), 0)
        assert r.shard == r.doc_id % 8
        assert r.bin == cum // BUDGET, (r, cum)
        streams[(r.lang, r.shard)] = cum + r.n_tokens


def test_pack_stats_bins_contiguous(spark, sf_small):
    """Bins within a stream are 0..max with no gaps; token totals
    reconcile with the corpus."""
    docs = load_table(spark, sf_small, "documents")
    rows = packing.pack_stats(docs, budget=BUDGET, n_shards=8).collect()
    per_stream: dict = {}
    for r in rows:
        per_stream.setdefault((r.lang, r.shard), []).append(r.bin)
        assert r.fill == r.bin_tokens / BUDGET
    for bins in per_stream.values():
        assert sorted(bins) == list(range(len(bins)))
    total = sum(r.bin_tokens for r in rows)
    expect = docs.select(
        F.sum(F.size(F.split(F.lower(F.trim("text")), " ")))
    ).collect()[0][0]
    assert total == expect


def test_kmv_hash_matches_spark_conv(spark):
    """The Python kernel's 48-bit md5 prefix equals the SQL-side
    conv(substr(md5..)) parse — the cross-engine hash contract."""
    for key in [0, 1, 99999, 123456789]:
        py = int(hashlib.md5(f"kmv:{key}".encode()).hexdigest()[:12], 16)
        sql = spark.sql(
            f"SELECT CAST(conv(substring(md5('kmv:{key}'), 1, 12), 16, 10)"
            f" AS BIGINT) AS h").collect()[0].h
        assert py == sql


def test_kmv_estimate_accuracy(spark, sf_medium):
    """KMV with k=64: exact below k, and within ~3 standard errors
    (1/sqrt(k-2) relative) above it."""
    events = load_table(spark, sf_medium, "events")
    rows = kmv_distinct(events, "user_id", "event_type", k=64).collect()
    assert rows, "no groups"
    for r in rows:
        if r.n_true < 64:
            assert r.est_distinct == float(r.n_true)
        else:
            assert abs(r.rel_err) < 3.0 / (62 ** 0.5), r


def test_kmv_partition_invariance(spark, sf_small):
    """The sketch is a pure function of the value set: a different
    partition layout yields the identical estimate rows."""
    events = load_table(spark, sf_small, "events")
    a = kmv_distinct(events, "user_id", "event_type", k=16).collect()
    b = kmv_distinct(events.repartition(13, "user_id"),
                     "user_id", "event_type", k=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bm25_semantics(spark, sf_small):
    terms = ["join", "merge", "spark", "window"]
    docs = load_table(spark, sf_small, "documents")
    rows = bm25_topk(docs, terms, k=10).collect()
    assert 0 < len(rows) <= 10
    scores = [r.score_q for r in rows]
    assert scores == sorted(scores, reverse=True)
    got_ids = {r.doc_id for r in rows}
    texts = {r.doc_id: r.text for r in docs.filter(
        F.col("doc_id").isin(*got_ids)).collect()}
    for r in rows:
        toks = set(texts[r.doc_id].strip().lower().split(" "))
        hit = toks & set(terms)
        assert hit, f"doc {r.doc_id} contains no query term"
        assert r.n_terms_hit == len(hit)


def test_mixture_sample_targets(spark, sf_medium):
    """Per-source kept counts track the pinned targets (binomial mean
    target, allow 4 sigma) and membership is deterministic."""
    docs = load_table(spark, sf_medium, "documents")
    targets = {f"src{i}": 15 for i in range(5)}
    out = mixture_hash_sample(docs, "source", "doc_id", targets,
                              default=5, salt="mix-v1")
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    n_per_source = {r.source: r.n for r in
                    docs.groupBy("source").agg(
                        F.count(F.lit(1)).alias("n")).collect()}
    for src, n in n_per_source.items():
        tgt = targets.get(src, 5)
        p = min(1.0, tgt / n)
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(counts.get(src, 0) - tgt) <= 4 * sigma + 1, \
            (src, counts.get(src, 0), tgt)
    again = mixture_hash_sample(docs, "source", "doc_id", targets,
                                default=5, salt="mix-v1")
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == \
        sorted(r.doc_id for r in again.select("doc_id").collect())


def test_normalize_text_messy_inputs(spark):
    """Control chars become spaces, runs collapse, edges trim — and the
    pass is idempotent."""
    rows = [(1, "a\x00b"), (2, "  lead and   trail  "),
            (3, "tab\tand\nnewline"), (4, "already clean"),
            (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in clean.normalize_text(df).collect()}
    import hashlib as h

    def md5(s):
        return h.md5(s.encode()).hexdigest()

    assert got[1].n_chars_norm == len("a b")
    assert got[1].norm_md5 == md5("a b")
    assert got[2].norm_md5 == md5("lead and trail")
    assert got[3].norm_md5 == md5("tab and newline")
    assert got[4].changed is False
    assert got[5].norm_md5 == md5("")
    # idempotence: normalizing the normalized text is a no-op
    norm1 = [(1, "a b"), (2, "lead and trail")]
    df2 = spark.createDataFrame(norm1, "doc_id long, text string")
    for r in clean.normalize_text(df2).collect():
        assert r.changed is False


@pytest.mark.parametrize("frac_docs", [0.0])
def test_pack_empty_input(spark, frac_docs):
    df = spark.createDataFrame(
        [], "doc_id long, text string, lang string")
    assert packing.pack_stats(df).count() == 0


def _toy_edges(spark):
    """Bidirectional star a↔{b,c,d} plus a pendant pair e↔f."""
    fwd = [("a", "b"), ("a", "c"), ("a", "d"), ("e", "f")]
    rows = fwd + [(d, s) for s, d in fwd]
    return spark.createDataFrame(rows, "src string, dst string")


def test_pagerank_hub_ranks_first(spark):
    from kafka_connect_msk_demo_spark.pipeline.graph import (
        SCALE, pagerank_topk,
    )
    rows = pagerank_topk(_toy_edges(spark), iters=3, k=10).collect()
    assert rows[0].node == "a" and rows[0].outdeg == 3
    assert {r.node for r in rows} == set("abcdef")
    # quantized mass conservation: every div only floors, so the total
    # stays within n_nodes*iters of the exact damped mass (== SCALE)
    total = sum(r.rank_q for r in rows)
    assert SCALE - 6 * 3 * 100 <= total <= SCALE
    for r in rows:
        assert r.rank_q > 0


def test_pagerank_partition_invariance(spark):
    from kafka_connect_msk_demo_spark.pipeline.graph import pagerank_topk
    e = _toy_edges(spark)
    a = pagerank_topk(e, iters=3, k=10).collect()
    b = pagerank_topk(e.repartition(7, "dst"), iters=3, k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bipartite_edges_shape(spark, sf_small):
    from kafka_connect_msk_demo_spark.pipeline.graph import bipartite_edges
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    e = bipartite_edges(orders, lineitem)
    rows = e.collect()
    assert len(rows) % 2 == 0 and len(rows) > 0
    pairs = {(r.src, r.dst) for r in rows}
    assert len(pairs) == len(rows), "duplicate edges"
    for s, d in pairs:
        assert (d, s) in pairs, "missing reverse edge"
        assert s[:2] in ("c:", "s:") and d[:2] in ("c:", "s:")


def test_ivm_create_and_retire_groups(spark):
    """Signed-contribution maintenance creates groups absent from the
    base and retires groups whose count reaches zero."""
    from pyspark.sql import Row

    from kafka_connect_msk_demo_spark.operators.ivm import (
        maintain_sum_count, signed_contributions,
    )
    base = spark.createDataFrame(
        [("a", 10.0, 2), ("b", 5.0, 1)],
        "g string, total double, n long")
    img = "g string, v double"

    def rec(g, v):
        return Row(g=g, v=v)

    deltas = spark.createDataFrame(
        [  # delete the only 'b' row -> retire; insert new group 'c'
            Row(op="d", before=rec("b", 5.0), after=None),
            Row(op="c", before=None, after=rec("c", 7.0)),
            # move one 'a' row to 'c' (update changing the group)
            Row(op="u", before=rec("a", 4.0), after=rec("c", 4.0)),
        ],
        f"op string, before struct<{img}>, after struct<{img}>")
    contribs = signed_contributions(deltas, ["g", "v"]) \
        .withColumnRenamed("v", "val")
    out = {r.g: (r.total, r.n) for r in maintain_sum_count(
        base, contribs, ["g"], "val").collect()}
    assert out == {"a": (6.0, 1), "c": (11.0, 2)}


def test_incremental_agg_matches_recompute(spark, sf_small):
    """The maintained aggregate equals a full recompute over the final
    CDC state (same grouping, built from scratch)."""
    from kafka_connect_msk_demo_spark.queries import (
        q_cdc_upsert, q_incremental_agg,
    )
    maintained = q_incremental_agg(spark, sf_small).collect()
    final = q_cdc_upsert(spark, sf_small)
    recomputed = (final.groupBy("o_orderstatus", "order_month")
                  .agg(F.sum(F.col("o_totalprice")
                             .cast("decimal(25,8)"))
                       .cast("decimal(25,4)")
                       # the query emits money as a fixed-scale string
                       # (driver-hash convention); compare like for like
                       .cast("string").alias("total"),
                       F.count(F.lit(1)).alias("n"))
                  .orderBy("o_orderstatus", "order_month").collect())
    assert [tuple(r) for r in maintained] == \
        [tuple(r) for r in recomputed]


def test_dsir_favors_target_domain(spark, sf_small):
    """Importance scores rank target-like docs first: with the target
    defined as docs mentioning 'vector', the top-k's mean per-token
    'vector' share must beat the corpus mean."""
    from kafka_connect_msk_demo_spark.pipeline.selection import dsir_topk
    docs = load_table(spark, sf_small, "documents")
    from kafka_connect_msk_demo_spark.pipeline.textprep import tokens
    top = dsir_topk(docs, F.array_contains(tokens("text"), "vector"),
                    k=10).collect()
    assert len(top) == 10

    def share(df):
        r = df.select(
            F.sum(F.size(F.filter(tokens("text"),
                                  lambda x: x == "vector"))).alias("v"),
            F.sum(F.size(tokens("text"))).alias("t")).collect()[0]
        return r.v / r.t
    top_ids = [r.doc_id for r in top]
    s_top = share(docs.filter(F.col("doc_id").isin(*top_ids)))
    s_all = share(docs)
    assert s_top > s_all, (s_top, s_all)
    scores = [r.score_q for r in top]
    assert scores == sorted(scores, reverse=True)


def test_kfold_partition_properties(spark, sf_small):
    """Folds are a disjoint cover with stable membership and roughly
    uniform sizes; different salts give different assignments."""
    from kafka_connect_msk_demo_spark.operators.sampling import (
        kfold_assign,
    )
    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    a = {r.doc_id: r.fold for r in
         kfold_assign(docs, "doc_id", k=5).select(
             "doc_id", "fold").collect()}
    assert len(a) == n
    assert set(a.values()) <= set(range(5))
    b = {r.doc_id: r.fold for r in
         kfold_assign(docs.repartition(11), "doc_id", k=5).select(
             "doc_id", "fold").collect()}
    assert a == b, "fold membership depends on partitioning"
    other = {r.doc_id: r.fold for r in
             kfold_assign(docs, "doc_id", k=5, salt="other").select(
                 "doc_id", "fold").collect()}
    assert other != a, "salts should decorrelate assignments"


def test_funnel_ordering_semantics(spark):
    """A click BEFORE the first view must not count; strictly-after
    ordering is enforced at every stage."""
    from kafka_connect_msk_demo_spark.operators.funnel import (
        funnel_counts,
    )
    rows = [
        # u1: full ordered funnel
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:10:00"),
        # u2: click precedes view -> stops at view
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 09:30:00"),
        # u3: view+click, purchase before click -> stops at click
        (3, "view", "2024-01-01 08:00:00"),
        (3, "purchase", "2024-01-01 08:10:00"),
        (3, "click", "2024-01-01 08:20:00"),
        # u4: never viewed
        (4, "purchase", "2024-01-01 07:00:00"),
    ]
    df = spark.createDataFrame(
        [(u, t, ts) for u, t, ts in rows],
        "user_id long, event_type string, ts_s string") \
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    got = {r.step: r for r in
           funnel_counts(df, ["view", "click", "purchase"]).collect()}
    assert got["view"].n_users == 3
    assert got["click"].n_users == 2          # u1, u3
    assert got["purchase"].n_users == 1       # u1 only
    assert got["purchase"].conv_from_prev == 0.5
    assert got["purchase"].conv_from_first == 1 / 3


def test_retention_planted_cohorts(spark):
    """Users active in weeks {0,1} and {0,2} from epoch-week cohorts
    produce the right triangle."""
    from kafka_connect_msk_demo_spark.operators.funnel import (
        WEEK_US, retention_cohorts,
    )
    import datetime as dt
    base = dt.datetime(2024, 1, 3, tzinfo=dt.timezone.utc)

    def at(weeks):
        return base + dt.timedelta(days=7 * weeks)
    rows = [(1, at(0)), (1, at(1)),          # cohort c, offsets 0,1
            (2, at(0)), (2, at(2)),          # cohort c, offsets 0,2
            (3, at(1)), (3, at(1))]          # cohort c+1, offset 0
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort, r.offset): r.n_users
           for r in retention_cohorts(df, period_us=WEEK_US).collect()}
    c = min(k[0] for k in got)
    assert got[(c, 0)] == 2
    assert got[(c, 1)] == 1
    assert got[(c, 2)] == 1
    assert got[(c + 1, 0)] == 1
    assert sum(got.values()) == 5
