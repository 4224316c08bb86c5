"""Round-4g additions: iterative BPE trainer/apply and the incremental
near-dup admission check."""

import pyspark.sql.functions as F
import pytest

from kafka_connect_msk_demo_spark.catalog import load_table
from kafka_connect_msk_demo_spark.pipeline import dedup, text_analysis


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# BPE trainer
# ---------------------------------------------------------------------------


def test_bpe_train_hand_corpus(spark):
    """3 rounds on a corpus small enough to run by hand.

    words: aaab x3, ab x1.
    r1: (a,a)=6 (two per 'aaab'), (a,b)=3+1=4  -> merge (a,a)
        aaab -> [aa,a,b] (leftmost-greedy), ab -> [a,b]
    r2: (aa,a)=3, (a,b)=3+1=4                  -> merge (a,b)
        aaab -> [aa,ab], ab -> [ab]
    r3: (aa,ab)=3                              -> merge (aa,ab)
    """
    docs = _docs(spark, [(1, "aaab aaab ab"), (2, "aaab")])
    got = [tuple(r) for r in
           text_analysis.bpe_train_merges(docs, rounds=3).collect()]
    assert got == [(1, "a", "a", 6), (2, "a", "b", 4), (3, "aa", "ab", 3)]


def test_bpe_vocab_after_merges(spark):
    docs = _docs(spark, [(1, "aaab aaab ab"), (2, "aaab")])
    got = [tuple(r) for r in
           text_analysis.bpe_vocab_census(docs, rounds=3, top=10).collect()]
    # 'aaab' fully merged by round 3; 'ab' merged by round 2
    assert got == [("aaab", 3), ("ab", 1)]


def test_bpe_merge_pair_vanishes_after_its_round(spark):
    """The defining trainer invariant: after round r merges (l, r),
    that pair's adjacent count is zero in round r+1's census (leftmost
    -greedy application consumes every adjacency)."""
    docs = _docs(spark, [(1, "abcabc abcabc xbc")])
    rep, frames, merges = text_analysis.bpe_trained(docs, rounds=2)
    assert len(merges) == 2
    (l1, r1, _), _ = merges
    pairs = (rep.select(F.explode(
        F.expr(text_analysis._bpe_pairs_sql("tk"))).alias("p"))
        .select("p.lft", "p.rgt").collect())
    assert (l1, r1) not in {(p.lft, p.rgt) for p in pairs}


def test_bpe_single_char_and_merged_single_token_words(spark):
    """Words that collapse to ONE token must survive later folds (the
    empty-slice edge), and 1-char words never enter the vocabulary."""
    docs = _docs(spark, [(1, "ab ab ab a b")])
    got = [tuple(r) for r in
           text_analysis.bpe_train_merges(docs, rounds=2).collect()]
    # r1 merges (a,b) cnt=3; r2 has NO pairs left -> 1 row only
    assert got == [(1, "a", "b", 3)]


def test_corpus_has_no_unit_separator(spark, sf_small):
    """The packed-representation separator chr(31) must not occur in
    the corpus text (contract for the string-accumulator fold)."""
    docs = load_table(spark, sf_small, "documents")
    assert docs.filter(F.col("text").contains("\x1f")).count() == 0


# ---------------------------------------------------------------------------
# Incremental near-dup
# ---------------------------------------------------------------------------

_T = "the quick brown fox jumps over the lazy dog again and again today"
_U = "completely unrelated text with no overlap whatsoever in any shingle"


def test_incremental_neardup_planted(spark):
    """Delta doc 10 duplicates history doc 5 -> exactly one pair;
    delta-delta (30, 40) and history-history (6, 7) dups are NOT
    emitted; novel delta doc 20 has no row."""
    rows = [(5, _T), (6, _U), (7, _U),
            (10, _T), (20, "something else entirely spoken here now"),
            (30, "shared delta text one two three four five six"),
            (40, "shared delta text one two three four five six")]
    docs = _docs(spark, rows)
    got = [tuple(r) for r in dedup.incremental_neardup(
        docs, F.col("doc_id") % 10 < 2, threshold=0.8).collect()]
    assert got == [(10, 5, 1.0)]


def test_incremental_neardup_matches_exact_cross_pairs(spark, sf_small):
    """On the real corpus the LSH probe finds the identical pair set to
    the exact cross-split jaccard join (recall 1.0 at J >= 0.8)."""
    docs = load_table(spark, sf_small, "documents")
    delta = F.col("doc_id") % 10 < 2
    got = {(r.doc_id, r.dup_of) for r in
           dedup.incremental_neardup(docs, delta).collect()}
    exact = dedup.jaccard_pairs(docs, threshold=0.8)
    flags = docs.select("doc_id", delta.alias("f"))
    ex = (exact
          .join(flags.select(F.col("doc_id").alias("d1"),
                             F.col("f").alias("f1")), "d1")
          .join(flags.select(F.col("doc_id").alias("d2"),
                             F.col("f").alias("f2")), "d2"))
    want = set()
    for r in ex.collect():
        if r.f1 and not r.f2:
            want.add((r.d1, r.d2))
        elif r.f2 and not r.f1:
            want.add((r.d2, r.d1))
    assert got == want
