"""Unit tests for the LLM-pipeline operator family — the properties
the DuckDB-oracle parity harness cannot express:

* MinHash-LSH recall == 1.0 against the exact Jaccard pairs (the
  banded-LSH guarantee at the configured b/r and the corpus' J≈0.98
  planted near-dups);
* prefix-filtered candidate generation is exact (== unfiltered);
* ANN recall floor against the exact brute-force top-k;
* SimHash pairs are a subset-quality signal of the Jaccard truth set;
* exact dedup actually collapses planted duplicates;
* multimodal: metadata batch path round-trips; decode is stubbed.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.catalog import load_table
from kafka_connect_msk_demo_spark.pipeline import (dedup, multimodal,
                                                   similarity)


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").cache()


@pytest.fixture(scope="module")
def vecs(spark, sf_small):
    return load_table(spark, sf_small, "embeddings").cache()


def _pairs(df):
    return {(r.d1, r.d2) for r in df.collect()}


def test_minhash_lsh_full_recall(docs):
    exact = _pairs(dedup.jaccard_pairs(docs, 0.8))
    lsh = _pairs(dedup.minhash_lsh_pairs(docs, 0.8))
    assert exact, "testdata should contain planted near-dup pairs"
    assert lsh == exact


def test_prefix_filter_is_exact(docs):
    assert _pairs(dedup.jaccard_pairs(docs, 0.8, prefix_filter=True)) \
        == _pairs(dedup.jaccard_pairs(docs, 0.8, prefix_filter=False))


def test_prefix_length_exact_at_float_boundary(spark):
    """Regression (sf0.1 sweep, round 5): the prefix length
    ⌊(1-t)·n⌋+1 must be computed as if (1-t) were exact. In binary
    1-0.8 = 0.19999999999999996, so for n=15 the raw product floors
    to 2 instead of 3, shortening the prefix by one.

    Adversarial instance: B ⊂ A with |A|=15, |B|=12 → J = 12/15 = 0.8
    exactly, and A's three unique shingles are globally rarest (df=1),
    so they fill A's entire SHORTENED prefix — the pair's only witness
    is A's 4th prefix slot, which only the correct length reaches."""
    shared = [f"s{i:02d}" for i in range(12)]
    a = sorted(shared + ["u1", "u2", "u3"])
    sh = spark.createDataFrame([("A", a), ("B", sorted(shared))],
                               "doc_id string, s array<string>")
    got = _pairs(dedup.jaccard_pairs(None, 0.8, shingles=sh))
    assert got == {("A", "B")}


def test_simhash_agrees_with_jaccard(docs):
    truth = _pairs(dedup.jaccard_pairs(docs, 0.8))
    sim = _pairs(dedup.simhash_pairs(docs, max_hamming=8))
    # no false positives and decent recall on the planted near-dups
    assert sim <= truth
    assert len(sim) >= 0.7 * len(truth)


def test_ann_recall_floor(vecs):
    q = similarity.queries_by_mod(vecs, 50)
    bf = {(r.q_id, r.vec_id)
          for r in similarity.brute_force_topk(vecs, q, 10).collect()}
    ann = {(r.q_id, r.vec_id)
           for r in similarity.ann_topk(vecs, q, 10).collect()}
    assert len(bf & ann) / len(bf) >= 0.75


def test_ivf_recall_floor(vecs):
    q = similarity.queries_by_mod(vecs, 50)
    bf = {(r.q_id, r.vec_id)
          for r in similarity.brute_force_topk(vecs, q, 10).collect()}
    ivf = {(r.q_id, r.vec_id)
           for r in similarity.ivf_topk(vecs, q, 10).collect()}
    # uniform random vectors are IVF's worst case; see ivf_topk docs
    assert len(bf & ivf) / len(bf) >= 0.55


def test_exact_dedup_collapses_duplicates(spark):
    rows = [(1, "Hello World"), (2, "hello world  "), (3, "unrelated"),
            (4, "HELLO WORLD")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.canonical_id, r.dup_count)
           for r in dedup.exact_dedup(df).collect()}
    # trim+lower normalization: 1, 2, 4 collapse (trailing spaces
    # survive trim only at the ends — "hello world  " trims clean)
    assert got == {(1, 3), (3, 1)}


def test_multimodal_metadata_roundtrip(spark):
    rows = [(7, "some text"), (300, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in multimodal.extract_metadata(
        multimodal.with_binary_payload(df)).collect()}
    assert out[7].magic_ok and out[300].magic_ok
    assert out[7].width == 7 and out[7].height == 49
    assert out[300].width == 300 % 256 and out[300].height == (300 * 7) % 256
    assert out[7].n_bytes == 8 + len("some text")


def test_multimodal_decode_guard_for_absent_codecs(spark):
    """Compressed codecs (image default, audio, video) still raise:
    their libraries are deliberately absent in this container."""
    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(NotImplementedError):
        multimodal.decode_payload(multimodal.with_binary_payload(df))
    with pytest.raises(NotImplementedError):
        multimodal.decode_payload(multimodal.with_binary_payload(df),
                                  codec="audio")


def test_ppm_parser_unit():
    """The live PPM (P6) decode path, value-level: spec-shaped
    headers (comments, multi-whitespace), and loud failure on every
    malformation class — magic, token, maxval, truncation."""
    from kafka_connect_msk_demo_spark.pipeline.multimodal import _parse_ppm
    plane = bytes(range(2 * 2 * 3))
    assert _parse_ppm(b"P6\n2 2\n255\n" + plane) == (2, 2, 255, plane)
    # comments and arbitrary whitespace between header tokens
    assert _parse_ppm(b"P6 # comment\n 2\t\n2 # w h\n255\n" + plane) \
        == (2, 2, 255, plane)
    # maxval != 255 (still < 256) parses
    assert _parse_ppm(b"P6\n2 2\n31\n" + plane)[2] == 31
    # the single whitespace after maxval may be any whitespace byte
    assert _parse_ppm(b"P6\n2 2\n255 " + plane)[3] == plane
    import pytest as _pytest
    for bad in (b"P5\n2 2\n255\n" + plane,        # wrong magic
                b"P6\n2 x\n255\n" + plane,        # non-numeric token
                b"P6\n2 2\n999\n" + plane,        # 2-byte maxval
                b"P6\n2 2\n255\n" + plane[:-1],   # truncated plane
                b"P6\n2 2",                         # truncated header
                b"P6\n2 2\n255",                   # no ws after maxval
                b"P6\n0 2\n255\n",                 # zero width
                b"P6\n2 0\n255\n"):                # zero height
        with _pytest.raises(ValueError):
            _parse_ppm(bad)


def test_ppm_decode_roundtrip(spark):
    """with_ppm_payload (declarative encoder) -> decode_payload (real
    Arrow-batched parser): dims, maxval and every plane byte match the
    closed form, including a doc_id > 2^53 crossing the boundary."""
    big = (1 << 60) + 3
    df = spark.createDataFrame([(0,), (5,), (big,)], "doc_id long")
    out = {r.doc_id: r for r in multimodal.decode_payload(
        multimodal.with_ppm_payload(df.withColumn("text", F.lit("x"))),
        codec="ppm").collect()}
    assert set(out) == {0, 5, big}
    for did, r in out.items():
        w, h = did % 4 + 2, did % 3 + 2
        assert (r.width, r.height, r.maxval) == (w, h, 255)
        assert r.plane == [(did % 256 + i * 7) % 256
                           for i in range(w * h * 3)]


def test_doc_shingles_matches_jvm_expression(docs):
    """The Arrow-batched shingle kernel must produce exactly the
    shingle SETS of the JVM ``with_shingles`` column expression (order
    may differ; every consumer is order-insensitive)."""
    from kafka_connect_msk_demo_spark.pipeline.textprep import (
        doc_shingles, with_shingles)
    fast = {r.doc_id: set(r.s)
            for r in doc_shingles(docs.select("doc_id", "text")).collect()}
    jvm = {r.doc_id: set(r.s)
           for r in with_shingles(docs.select("doc_id", "text"))
           .select("doc_id", "s").collect()}
    assert fast == jvm


def test_kmeans_centroids_reduce_distortion(vecs):
    """Lloyd's iterations must not hurt the quantizer: mean best-cell
    cosine (higher = tighter cells) after training >= the seeded
    centroids', and the trainer keeps exactly K centroids of the data
    dimensionality."""
    from pyspark.sql import functions as F

    def mean_best_cos(cents):
        data = vecs.select(F.col("vec_id"),
                           similarity.as_double("embedding").alias("v"))
        best = (data.crossJoin(F.broadcast(cents.select("c_id", "c_vec")))
                .withColumn("sim", similarity.cosine(F.col("v"),
                                                     F.col("c_vec")))
                .groupBy("vec_id").agg(F.max("sim").alias("best")))
        return best.agg(F.avg("best")).collect()[0][0]

    seeded = similarity.deterministic_centroids(vecs, 16)
    trained = similarity.kmeans_centroids(vecs, k=16, iters=3)
    rows = trained.collect()
    assert len(rows) == 16
    assert all(len(r.c_vec) == 64 for r in rows)
    assert mean_best_cos(trained) >= mean_best_cos(seeded)


def test_ivf_topk_accepts_trained_centroids(vecs):
    q = similarity.queries_by_mod(vecs, 50)
    cents = similarity.kmeans_centroids(vecs, k=16, iters=2)
    out = similarity.ivf_topk(vecs, q, 10, centroids=cents).collect()
    assert out
    per_q = {}
    for r in out:
        per_q.setdefault(r.q_id, []).append(r.rank)
    assert all(ranks == sorted(ranks) and len(ranks) <= 10
               for ranks in per_q.values())


def test_frame_sample_row_expansion(docs):
    """1->N frame sampling: every 4th 64-byte frame of each payload,
    indices multiple of 4, md5s match a local reimplementation."""
    import hashlib
    payloads = multimodal.with_binary_payload(docs.select("doc_id", "text"))
    got = multimodal.frame_sample(payloads, 64, 4).collect()
    assert got
    rows = {(r.doc_id, r.frame_idx): (r.frame_md5, r.frame_bytes)
            for r in got}
    local = {r.doc_id: bytes(r.payload)[8:]
             for r in payloads.select("doc_id", "payload").collect()}
    assert all(idx % 4 == 0 for _, idx in rows)
    for (doc_id, idx), (md5, nb) in rows.items():
        frame = local[doc_id][idx * 64:(idx + 1) * 64]
        assert hashlib.md5(frame).hexdigest() == md5
        assert len(frame) == nb
    # every doc with >4 frames contributes >1 row
    big = [d for d, b in local.items() if len(b) > 64 * 4]
    from collections import Counter
    per_doc = Counter(d for d, _ in rows)
    assert all(per_doc[d] > 1 for d in big)


def test_resize_payload_header_and_size(docs):
    payloads = multimodal.with_binary_payload(docs.select("doc_id", "text"))
    resized = multimodal.resize_payload(payloads, 8, 8)
    meta = multimodal.extract_metadata(resized).collect()
    assert all(r.magic_ok and r.width == 8 and r.height == 8
               and r.n_bytes <= 8 + 64 for r in meta)


def test_embed_payload_feeds_similarity(docs):
    """payload -> embedding -> brute-force top-k composition: the
    pseudo-encoder's output drops into the similarity operators
    unchanged."""
    payloads = multimodal.with_binary_payload(
        docs.select("doc_id", "text").limit(50))
    emb = multimodal.embed_payload(payloads)
    rows = emb.collect()
    assert all(len(r.embedding) == 64 for r in rows)
    assert all(-1.0 <= x <= 1.0 for r in rows for x in r.embedding)
    q = (emb.filter(F.col("doc_id") % 10 == 0)
         .select(F.col("doc_id").alias("q_id"),
                 similarity.as_double("embedding").alias("q_vec")))
    topk = similarity.brute_force_topk(emb, q, k=5, id_col="doc_id",
                                      vec_col="embedding")
    per_q = {}
    for r in topk.collect():
        per_q.setdefault(r.q_id, []).append(r.rank)
    assert per_q and all(ranks == sorted(ranks) for ranks in per_q.values())


def test_lsh_dup_pairs_full_recall_on_planted_dups(spark, vecs):
    """The bucketed near-dup path must find every planted true
    near-duplicate (cos >= 0.9): copies of real vectors with one
    coordinate nudged. Verified against the exact all-pairs scorer."""
    base = vecs.limit(20).collect()
    planted = [(10_000 + r.vec_id,
                [x + (0.01 if j == 0 else 0.0)
                 for j, x in enumerate(r.embedding)], "dup")
               for r in base]
    extra = spark.createDataFrame(
        planted, "vec_id long, embedding array<float>, label string")
    allv = vecs.select("vec_id", "embedding", "label").unionByName(extra)
    exact = {(r.d1, r.d2)
             for r in similarity.cosine_dup_pairs(allv, 0.9).collect()}
    lsh = {(r.d1, r.d2)
           for r in similarity.cosine_dup_pairs_lsh(allv, 0.9).collect()}
    assert exact, "planted duplicates must appear in the truth set"
    # full recall AND no false positives (exact verification inside)
    assert lsh == exact


def test_repetition_stats_handcrafted(spark):
    """'a b a b c' → 2-grams [ab, ba, ab, bc]: 'a b' repeats, so dup
    frac 2/4 and top frac 2/4; 3-grams [aba, bab, abc] are unique → dup
    0, top 1/3; distinct-token ratio 3/5."""
    from kafka_connect_msk_demo_spark.pipeline import text_analysis

    d = spark.createDataFrame([(1, "a b a b c")], "doc_id long, text string")
    r = text_analysis.repetition_stats(d).collect()[0]
    assert r.n_tokens == 5
    assert r.distinct_token_ratio == 3 / 5
    assert r.dup_2gram_frac == 2 / 4
    assert r.top_2gram_frac == 2 / 4
    assert r.dup_3gram_frac == 0.0
    assert r.top_3gram_frac == 1 / 3


def test_repetition_stats_short_doc_null_gram_cols(spark):
    """A 1-token doc has no 2/3-grams: the left join keeps the row with
    NULL fractions (no silent drop), and the distinct ratio is 1."""
    from kafka_connect_msk_demo_spark.pipeline import text_analysis

    d = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    r = text_analysis.repetition_stats(d).collect()[0]
    assert r.n_tokens == 1 and r.distinct_token_ratio == 1.0
    assert r.dup_2gram_frac is None and r.top_3gram_frac is None


def test_chunk_dedup_removes_cross_doc_passages(spark):
    """A 5-token chunk shared by two docs is removed from BOTH; unique
    chunks survive in position order; a doc whose every chunk is shared
    collapses to the empty string (row kept, not dropped)."""
    from kafka_connect_msk_demo_spark.pipeline import clean

    shared = "v w x y z"
    d = spark.createDataFrame(
        [(1, f"{shared} a b c d e"), (2, f"f g h i j {shared}"),
         (3, shared)],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in clean.chunk_dedup(d).collect()}
    assert rows[1].clean_text == "a b c d e"
    assert rows[2].clean_text == "f g h i j"
    assert rows[3].clean_text == "" and rows[3].n_removed == 1
    assert all(rows[i].n_chunks == 2 for i in (1, 2))


def test_pii_scrub_edges(spark):
    """Multiple hits per doc, no-PII passthrough, and order-dependence:
    an email whose local part is digit-heavy must be redacted as an
    email, not half-eaten by the phone rule."""
    from kafka_connect_msk_demo_spark.pipeline import clean

    rows = [(1, "mail a@b.io and c.d@e-f.org ip 1.2.3.4 ip 10.0.0.255"),
            (2, "no pii here at all"),
            (3, "digits 123-456-7890@mail.com and +44-20-7946-0958")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in clean.pii_scrub(df).collect()}
    assert out[1].n_email == 2 and out[1].n_ip == 2
    assert out[1].clean_text == "mail <EMAIL> and <EMAIL> ip <IP> ip <IP>"
    assert out[2].clean_text == "no pii here at all"
    assert (out[2].n_email, out[2].n_phone, out[2].n_ip) == (0, 0, 0)
    assert out[3].n_email == 1
    assert out[3].clean_text == "digits <EMAIL> and <PHONE>"


def test_benchmark_contamination_handcrafted(spark):
    """A verbatim copy of a benchmark doc scores 1.0; a doc sharing one
    5-gram scores 1/n_grams; a disjoint doc scores 0. Benchmark docs
    themselves are not scored."""
    from kafka_connect_msk_demo_spark.pipeline import clean

    bench = spark.createDataFrame(
        [(100, "a b c d e f")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "a b c d e f"),            # exact copy -> 1.0
         (2, "x a b c d e y z w v u"),  # one shared 5-gram of 7
         (3, "p q r s t u v")],         # disjoint -> 0.0
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           clean.benchmark_contamination(corpus, bench, n=5).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].contamination_frac == 1.0
    assert out[2].n_grams == 7 and out[2].n_contaminated == 1
    assert out[3].contamination_frac == 0.0


def test_connected_components_chain_and_singletons(spark):
    """A 4-chain collapses to its minimum via transitive closure (the
    pair set alone never links 1-4); disjoint pairs stay separate;
    docs without edges become their own singleton canonical."""
    from kafka_connect_msk_demo_spark.pipeline import dedup

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11)], "d1 long, d2 long")
    comp = {r.node: r.component
            for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # the distributed min-label loop (forced past the driver
    # union-find gate) must produce the identical labeling
    dist = {r.node: r.component
            for r in dedup.connected_components(
                pairs, driver_max_edges=0).collect()}
    assert dist == comp

    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 99)],
                                 "doc_id long")
    out = {r.doc_id: r for r in dedup.dedup_clusters(docs, pairs).collect()}
    assert out[99].cluster_id == 99 and out[99].cluster_size == 1
    assert out[4].cluster_id == 1 and out[4].cluster_size == 4
    assert [d for d in out if out[d].keep] == [1, 10, 99]


def test_pretraining_filter_rules_all_fire(spark, sf_small):
    """Each substantive gate (repetition, low_diversity, contaminated)
    must have real failures in the corpus — thresholds that never fire
    would make the composite vacuous."""
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        q_pretraining_filter)

    out = q_pretraining_filter(spark, sf_small)
    reasons = {r for row in out.filter("NOT keep")
               .select("failed_rules").collect()
               for r in row.failed_rules.split(",")}
    assert {"repetition", "low_diversity", "contaminated"} <= reasons
    assert out.filter("keep").count() > 0


def test_pii_scrub_dates_and_mixed_case(spark):
    """Review regressions: mixed-case emails must redact (patterns are
    not lowercase-only), and ISO dates / year ranges must NOT be eaten
    by the phone rule."""
    from kafka_connect_msk_demo_spark.pipeline import clean

    rows = [(1, "contact John.Doe@Example.COM today"),
            (2, "released on 2024-01-01 covering 1998-2024"),
            (3, "call +44-20-7946-0958 before 2025-12-31")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in clean.pii_scrub(df).collect()}
    assert out[1].n_email == 1 and "<EMAIL>" in out[1].clean_text
    assert out[2].n_phone == 0
    assert out[2].clean_text == "released on 2024-01-01 covering 1998-2024"
    assert out[3].n_phone == 1
    assert out[3].clean_text == "call <PHONE> before 2025-12-31"


def test_blocked_dup_pairs_matches_broadcast_scorer(spark, vecs):
    """The registered blocked (cogroup-tile) scorer must be
    bit-identical to the driver-broadcast validation helper — same
    pairs, same cosine doubles — across a threshold that includes
    weak-band pairs (the regime LSH cannot serve)."""
    from kafka_connect_msk_demo_spark.pipeline import similarity

    allv = vecs.select("vec_id", "embedding")
    exact = {(r.d1, r.d2): r.cos
             for r in similarity.cosine_dup_pairs(allv, 0.45).collect()}
    blocked = {(r.d1, r.d2): r.cos
               for r in similarity.cosine_dup_pairs_blocked(
                   allv, 0.45).collect()}
    assert exact, "corpus must contain weak-band pairs"
    assert blocked == exact  # keys AND float-exact cosines


def test_blocked_dup_pairs_single_block_degenerate(spark, vecs):
    """nblocks=1 collapses to one diagonal tile — still exact."""
    from kafka_connect_msk_demo_spark.pipeline import similarity

    allv = vecs.select("vec_id", "embedding").limit(60)
    exact = {(r.d1, r.d2)
             for r in similarity.cosine_dup_pairs(allv, 0.3).collect()}
    one = {(r.d1, r.d2)
           for r in similarity.cosine_dup_pairs_blocked(
               allv, 0.3, nblocks=1).collect()}
    assert one == exact


def test_ppm_parser_fuzz_roundtrip():
    """Property: any spec-shaped P6 encoding — arbitrary comment/
    whitespace mix between header tokens — decodes to exactly its
    (w, h, maxval, plane)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_connect_msk_demo_spark.pipeline.multimodal import _parse_ppm

    ws = st.sampled_from([b" ", b"\n", b"\t", b"\r", b" \n", b"# c\n",
                          b" # x y\n\t"])

    @settings(max_examples=200, deadline=None)
    @given(w=st.integers(1, 9), h=st.integers(1, 9),
           maxval=st.integers(1, 255), s1=ws, s2=ws, s3=ws,
           data=st.data())
    def run(w, h, maxval, s1, s2, s3, data):
        plane = bytes(data.draw(st.lists(
            st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)))
        # separators between tokens may be any whitespace/comment mix,
        # but the byte after maxval is exactly ONE whitespace char
        buf = (b"P6" + s1 + str(w).encode() + s2 + str(h).encode()
               + s3 + str(maxval).encode() + b"\n" + plane)
        assert _parse_ppm(buf) == (w, h, maxval, plane)
        # trailing garbage after the plane is ignored (spec: readers
        # take exactly w*h*3 bytes)
        assert _parse_ppm(buf + b"junk")[3] == plane

    run()
