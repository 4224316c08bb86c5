"""Round-4i additions: exact repeated-span masking (token-granular
suffix-array-style dedup, Lee et al. 2022)."""

from kafka_connect_msk_demo_spark.pipeline import clean


def _mask(spark, rows, k=4, min_count=2):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean.repeated_span_mask(df, k=k, min_count=min_count)
    return {r.doc_id: r for r in out.collect()}


def test_shared_phrase_masked_in_every_occurrence(spark):
    phrase = "the quick brown fox"
    rows = [(1, f"alpha {phrase} beta"),
            (2, f"gamma delta {phrase}"),
            (3, "no repeats here at all")]
    got = _mask(spark, rows, k=4)
    assert (got[1].n_spans, got[1].masked_tokens) == (1, 4)
    assert got[1].clean_text == "alpha beta"
    assert (got[2].n_spans, got[2].masked_tokens) == (1, 4)
    assert got[2].clean_text == "gamma delta"
    assert (got[3].n_spans, got[3].masked_tokens) == (0, 0)
    assert got[3].clean_text == "no repeats here at all"


def test_long_repeat_merges_overlapping_grams_into_one_span(spark):
    # a 6-token repeated substring with k=4 is covered by 3 overlapping
    # repeated 4-grams -> must surface as ONE span of 6 tokens
    rep = "a b c d e f"
    rows = [(1, f"x {rep} y"), (2, f"{rep} z")]
    got = _mask(spark, rows, k=4)
    assert (got[1].n_spans, got[1].masked_tokens) == (1, 6)
    assert got[1].clean_text == "x y"
    assert (got[2].n_spans, got[2].masked_tokens) == (1, 6)
    assert got[2].clean_text == "z"


def test_within_doc_repetition_counts_toward_min_count(spark):
    # the 4-gram appears twice inside ONE doc; corpus-wide occurrence
    # count (not distinct-doc count) is what crosses min_count=2
    rows = [(1, "p q r s mid p q r s"),
            (2, "totally different words only")]
    got = _mask(spark, rows, k=4)
    assert got[1].n_spans == 2
    assert got[1].masked_tokens == 8
    assert got[1].clean_text == "mid"
    assert got[2].n_spans == 0


def test_doc_shorter_than_k_is_untouched(spark):
    rows = [(1, "tiny doc"), (2, "tiny doc"), (3, "tiny doc")]
    got = _mask(spark, rows, k=4)
    for r in got.values():
        assert (r.n_spans, r.masked_tokens) == (0, 0)
        assert r.clean_text == "tiny doc"


def test_adjacent_spans_fuse(spark):
    # two distinct repeated 4-grams sit back-to-back in doc 1: marked
    # intervals [2,5] and [6,9] are adjacent -> one fused span of 8
    rows = [(1, "x a b c d e f g h y"),
            (2, "a b c d tail words here"),
            (3, "e f g h other tail words")]
    got = _mask(spark, rows, k=4)
    assert (got[1].n_spans, got[1].masked_tokens) == (1, 8)
    assert got[1].clean_text == "x y"


def test_fully_masked_doc_yields_empty_clean_text(spark):
    rows = [(1, "a b c d"), (2, "a b c d")]
    got = _mask(spark, rows, k=4)
    for r in got.values():
        assert (r.n_spans, r.masked_tokens) == (1, 4)
        assert r.clean_text == ""


def _span_mask_replay(rows, k, min_count):
    """Pure-Python reference for repeated_span_mask."""
    from collections import Counter
    toks = {d: t.strip(" ").lower().split(" ") for d, t in rows}
    grams = Counter()
    for t in toks.values():
        for i in range(len(t) - k + 1):
            grams[" ".join(t[i:i + k])] += 1
    out = {}
    for d, t in toks.items():
        marked = set()
        for i in range(len(t) - k + 1):
            if grams[" ".join(t[i:i + k])] >= min_count:
                marked.update(range(i, i + k))
        spans = []
        for p in sorted(marked):
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p))
            else:
                spans.append((p, p))
        clean = " ".join(t[p] for p in range(len(t)) if p not in marked)
        out[d] = (len(t), len(spans), len(marked), clean)
    return out


def test_span_mask_matches_python_replay_on_random_corpora(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "b", "c", "d"])
    doc = st.lists(word, min_size=1, max_size=12).map(" ".join)

    @settings(max_examples=12, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.lists(doc, min_size=1, max_size=5))
    def run(texts):
        rows = [(i + 1, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: (r.n_tokens, r.n_spans, r.masked_tokens,
                          r.clean_text)
               for r in clean.repeated_span_mask(
                   df, k=3, min_count=2).collect()}
        assert got == _span_mask_replay(rows, 3, 2)

    run()
