"""Round-4j additions: exact unigram LM scoring with CCNet-style
head/middle/tail bucketing."""

from kafka_connect_msk_demo_spark.pipeline import text_analysis


def _score(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_analysis.unigram_lm_score(df)
    return {r.doc_id: r for r in out.collect()}


def test_hand_computed_ppm(spark):
    # corpus: "a a b" + "c" -> counts a:2 b:1 c:1, N=4
    got = _score(spark, [(1, "a a b"), (2, "c")])
    # doc1: sum_cnt = 2+2+1 = 5, n_tokens=3 -> 5*1e6 // 12 = 416666
    assert (got[1].n_tokens, got[1].sum_cnt, got[1].score_ppm) == \
        (3, 5, 416666)
    # doc2: sum_cnt = 1, n_tokens=1 -> 1e6 // 4 = 250000
    assert (got[2].n_tokens, got[2].sum_cnt, got[2].score_ppm) == \
        (1, 1, 250000)


def test_common_text_lands_in_head_rare_in_tail(spark):
    rows = [(1, "the the the the"),   # all max-frequency tokens
            (2, "the zq wv xk"),      # mixed
            (3, "qqq www eee rrr")]   # all singletons
    got = _score(spark, rows)
    assert got[1].bucket == "head"
    assert got[2].bucket == "middle"
    assert got[3].bucket == "tail"
    assert got[1].score_ppm > got[2].score_ppm > got[3].score_ppm


def test_terciles_partition_the_corpus_evenly(spark):
    # 6 docs -> exactly 2 per bucket under ntile(3)
    rows = [(i, " ".join(["tok%d" % i] * i)) for i in range(1, 7)]
    got = _score(spark, rows)
    from collections import Counter
    assert Counter(r.bucket for r in got.values()) == \
        {"head": 2, "middle": 2, "tail": 2}


def test_score_is_scale_free_for_uniform_corpus(spark):
    # every token unique -> every doc scores floor(1e6 / N) regardless
    # of doc length (mean frequency of singletons)
    rows = [(1, "a b c"), (2, "d e"), (3, "f")]
    got = _score(spark, rows)
    assert {r.score_ppm for r in got.values()} == {1000000 // 6}


def test_temperature_quota_exact_counts(spark):
    from kafka_connect_msk_demo_spark.operators.sampling import (
        temperature_quota_sample)
    # strata sizes 64 and 4: isqrt = 8 and 2, sum 10
    rows = [(i, "big") for i in range(64)] + \
           [(100 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_quota_sample(df, "source", "doc_id", budget=10)
    got = [(r.source,) for r in out.collect()]
    from collections import Counter
    # quotas: 10*8//10 = 8, 10*2//10 = 2 — exact, not expected
    assert Counter(s for s, in got) == {"big": 8, "small": 2}


def test_temperature_quota_membership_is_stable_under_partitioning(spark):
    from kafka_connect_msk_demo_spark.operators.sampling import (
        temperature_quota_sample)
    rows = [(i, "s%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r.doc_id for r in temperature_quota_sample(
        df, "source", "doc_id", budget=30).collect()}
    b = {r.doc_id for r in temperature_quota_sample(
        df.repartition(7), "source", "doc_id", budget=30).collect()}
    assert a == b and len(a) > 0


def test_temperature_flattens_toward_tail(spark):
    from kafka_connect_msk_demo_spark.operators.sampling import (
        temperature_quota_sample)
    # raw proportions 400:16 = 25:1; sqrt proportions 20:4 = 5:1
    rows = [(i, "head") for i in range(400)] + \
           [(1000 + i, "tail") for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_quota_sample(df, "source", "doc_id", budget=24)
    from collections import Counter
    c = Counter(r.source for r in out.collect())
    # quotas: 24*20//24 = 20, 24*4//24 = 4 — 5:1, not 25:1
    assert c == {"head": 20, "tail": 4}


def test_sorted_neighborhood_finds_prefix_sharing_near_dups(spark):
    from kafka_connect_msk_demo_spark.pipeline import dedup
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, base),
            (2, base + " extra"),          # same 40-char prefix
            (3, "zz " + base),             # edit INSIDE the key prefix
            (4, "completely different text about other things entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.sorted_neighborhood_pairs(df, window=2, threshold=0.5,
                                          k=3)
    pairs = {(r.d1, r.d2) for r in out.collect()}
    # docs 1/2 sort adjacent (shared prefix) -> found; doc 3's edit
    # falls inside the blocking key, so with window=2 it may only pair
    # with whoever sorts next to it
    assert (1, 2) in pairs


def test_sorted_neighborhood_wide_window_recovers_neighbors(spark):
    from kafka_connect_msk_demo_spark.pipeline import dedup
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, base), (2, base + " tail one"), (3, base + " tail two"),
            (4, "unrelated words entirely about something else here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.sorted_neighborhood_pairs(df, window=3, threshold=0.5,
                                          k=3)
    pairs = {(r.d1, r.d2) for r in out.collect()}
    # all three prefix-sharers sit within a 3-row window of each other
    assert {(1, 2), (1, 3), (2, 3)} <= pairs
    assert all(4 not in p for p in pairs)


def test_zipf_census_ranks_and_ppm(spark):
    from kafka_connect_msk_demo_spark.pipeline import text_analysis
    rows = [(1, "a a a a b b c"), (2, "a a b c d")]
    # counts: a:6 b:3 c:2 d:1, total 12
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_analysis.zipf_census(df, top=3).collect()
    assert [(r.rank, r.token, r.cnt) for r in out] == \
        [(1, "a", 6), (2, "b", 3), (3, "c", 2)]
    assert out[0].share_ppm == 6 * 1000000 // 12
    assert out[0].rel_ppm == 1000000
    assert out[1].rel_ppm == 3 * 1000000 // 6


def test_zipf_census_tie_breaks_lexicographically(spark):
    from kafka_connect_msk_demo_spark.pipeline import text_analysis
    df = spark.createDataFrame([(1, "z y z y x")],
                               "doc_id long, text string")
    out = text_analysis.zipf_census(df, top=3).collect()
    # y and z tie at 2 -> y first
    assert [r.token for r in out] == ["y", "z", "x"]


def _bootstrap_expected(rows, draws, salt="boot"):
    # pure-Python replay of the md5-mod draw positions
    import hashlib
    rows = [(k, w) for k, w in rows if w > 0]
    rows.sort()
    lo, cdf = 0, []
    for k, w in rows:
        cdf.append((k, w, lo)); lo += w
    W = lo
    from collections import Counter
    got = Counter()
    for j in range(draws):
        h = int(hashlib.md5(f"{salt}:{j}".encode()).hexdigest()[:12], 16)
        u = h % W
        for k, w, l in cdf:
            if l <= u < l + w:
                got[k] += 1
                break
    return got


def test_weighted_bootstrap_matches_python_replay(spark):
    from kafka_connect_msk_demo_spark.operators.sampling import (
        weighted_bootstrap_counts)
    rows = [(1, 100), (2, 300), (3, 50), (4, 0), (5, 1000)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = weighted_bootstrap_counts(df, "n_chars", draws=200,
                                    bucket=128, salt="boot")
    got = {r.doc_id: r.n_draws for r in out.collect()}
    exp = _bootstrap_expected(rows, 200)
    assert got == dict(exp)
    assert sum(got.values()) == 200          # intervals tile [0, W)
    assert 4 not in got                      # zero weight never drawn


def test_weighted_bootstrap_stable_under_partitioning(spark):
    from kafka_connect_msk_demo_spark.operators.sampling import (
        weighted_bootstrap_counts)
    rows = [(i, 10 * (1 + i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    a = {(r.doc_id, r.n_draws) for r in weighted_bootstrap_counts(
        df, "n_chars", draws=100, bucket=64).collect()}
    b = {(r.doc_id, r.n_draws) for r in weighted_bootstrap_counts(
        df.repartition(9), "n_chars", draws=100, bucket=64).collect()}
    assert a == b and sum(n for _, n in a) == 100


def test_profile_counts_nulls_distincts_minmax(spark):
    from kafka_connect_msk_demo_spark.operators.profiling import (
        profile_table)
    rows = [(1, "b", None), (2, "a", 5.0), (3, "a", 7.25), (4, None, 5.0)]
    df = spark.createDataFrame(rows, "k long, s string, d double")
    out = profile_table(df, "t", [("k", "int"), ("s", "str"),
                                  ("d", "dec")])
    got = {r.col_name: r for r in out.collect()}
    assert (got["k"].n_rows, got["k"].n_null, got["k"].n_distinct) == \
        (4, 0, 4)
    assert (got["k"].min_v, got["k"].max_v) == ("1", "4")
    assert (got["s"].n_null, got["s"].n_distinct) == (1, 2)
    assert (got["s"].min_v, got["s"].max_v) == ("a", "b")
    # decimal rendering: 5.0 -> '5.00', 7.25 -> '7.25'
    assert (got["d"].n_null, got["d"].n_distinct) == (1, 2)
    assert (got["d"].min_v, got["d"].max_v) == ("5.00", "7.25")


def test_bigram_lm_hand_computed(spark):
    from kafka_connect_msk_demo_spark.pipeline import text_analysis
    # corpus: "a b a b" and "a c". unigrams: a:3 b:2 c:1
    # bigrams: (a,b):2 (b,a):1 (a,c):1
    rows = [(1, "a b a b"), (2, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           text_analysis.bigram_lm_score(df).collect()}
    # doc1 terms: ab: 2e6//3=666666, ba: 1e6//2=500000, ab: 666666
    assert got[1].n_bigrams == 3
    assert got[1].score_ppm == (666666 + 500000 + 666666) // 3
    # doc2: ac: 1e6//3 = 333333
    assert (got[2].n_bigrams, got[2].score_ppm) == (1, 333333)


def test_bigram_lm_short_doc_scores_zero(spark):
    from kafka_connect_msk_demo_spark.pipeline import text_analysis
    df = spark.createDataFrame([(1, "single"), (2, "two words")],
                               "doc_id long, text string")
    got = {r.doc_id: r for r in
           text_analysis.bigram_lm_score(df).collect()}
    assert (got[1].n_bigrams, got[1].score_ppm) == (0, 0)
    assert got[2].n_bigrams == 1


def test_contamination_spans_measures_contiguous_runs(spark):
    from kafka_connect_msk_demo_spark.pipeline import clean
    quote = "one two three four five six seven"      # 7 tokens
    bench = spark.createDataFrame([(100, quote)],
                                  "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, f"intro words here {quote} outro words there"),
         (2, "one two three nothing four five six scattered"),
         (3, "totally clean document with no overlap at all")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           clean.contamination_spans(corpus, bench, n=3).collect()}
    # doc1 embeds the full 7-token quote: run of 5 matched 3-gram
    # starts -> 5 - 1 + 3 = 7 tokens
    assert got[1].max_run_tokens == 7
    assert got[1].n_runs == 1
    # doc2 has "one two three" and "four five six" separately: two
    # runs of exactly 3 tokens each
    assert (got[2].n_runs, got[2].max_run_tokens) == (2, 3)
    assert (got[3].n_hits, got[3].max_run_tokens) == (0, 0)


def test_winnowing_detects_shared_passage(spark):
    from kafka_connect_msk_demo_spark.pipeline import dedup
    passage = "the rain in spain falls mainly on the plain today"
    rows = [(1, f"intro text {passage} closing words"),
            (2, f"{passage} different ending entirely"),
            (3, "nothing in common with those documents at all")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.d1, r.d2): r.n_shared
           for r in dedup.winnowing_pairs(df, k=3, w=4,
                                          min_shared=1).collect()}
    # shared 10-token passage >= w + k - 1 = 6 tokens guarantees at
    # least one common fingerprint (the winnowing detection floor)
    assert (1, 2) in out
    assert all(3 not in p for p in out)


def test_winnowing_density_bound(spark):
    from kafka_connect_msk_demo_spark.pipeline import dedup
    text = " ".join("w%d" % i for i in range(60))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    fps = dedup.winnowing_fingerprints(df, k=3, w=4).count()
    n_grams = 60 - 3 + 1
    # selected set is a strict sample: windows overlap so adjacent
    # windows usually share their minimum; must be well under n_grams
    # and at least n_windows/w (each window contributes SOME min)
    assert fps <= n_grams
    assert fps >= (n_grams - 4 + 1) // 4


def test_winnowing_short_doc_still_fingerprints(spark):
    from kafka_connect_msk_demo_spark.pipeline import dedup
    df = spark.createDataFrame([(1, "tiny"), (2, "a b c d")],
                               "doc_id long, text string")
    got = {r.doc_id for r in
           dedup.winnowing_fingerprints(df, k=3, w=4).collect()}
    assert got == {1, 2}


def test_dedup_keep_best_keeps_longest(spark):
    from kafka_connect_msk_demo_spark.pipeline import dedup
    docs = spark.createDataFrame(
        [(1, 50), (2, 80), (3, 80), (4, 10)],
        "doc_id long, n_chars long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "d1 long, d2 long")
    out = {r.doc_id: r for r in
           dedup.dedup_keep_policy(docs, pairs,
                                   order_col="n_chars").collect()}
    # cluster {1,2,3}: longest is 2 and 3 tied at 80 -> doc 2 wins
    assert [out[i].keep for i in (1, 2, 3)] == [False, True, False]
    assert len({out[i].cluster_id for i in (1, 2, 3)}) == 1
    # singleton 4 keeps itself
    assert out[4].keep and out[4].cluster_id == 4


def test_boilerplate_audit_flags_template_source(spark, sf_small):
    from kafka_connect_msk_demo_spark import queries  # noqa: F401
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        q_boilerplate_audit)
    # build a corpus parquet-free: call the operator body directly via
    # a temp view shim is overkill — exercise through a small frame by
    # monkeypatching load_table is brittle; instead test the shape on
    # the real sf0.001 table: src columns exist and ppm is bounded
    out = q_boilerplate_audit(spark, sf_small).collect()
    assert len(out) >= 1
    for r in out:
        assert 0 <= r.boiler_ppm <= 1000000
        assert r.n_boiler <= r.n_positions


def test_lang_confusion_counts_total_to_corpus(spark, sf_small):
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        q_lang_confusion)
    out = q_lang_confusion(spark, sf_small).collect()
    total = sum(r.n_docs for r in out)
    n_docs = load_table(spark, sf_small, "documents").count()
    assert total == n_docs
    assert all(r.n_docs > 0 for r in out)


def test_decontaminate_report_partitions_corpus(spark, sf_small):
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        q_decontaminate_report)
    out = q_decontaminate_report(spark, sf_small).collect()
    for r in out:
        assert r.n_kept + r.n_dropped == r.n_docs
