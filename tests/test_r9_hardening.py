"""Edge-case hardening pinned in round 9's review pass: empty-text
ratios, degenerate SNM windows, non-string KMV groups, CMS null keys,
and the fixed-parameter BM25 contract."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.pipeline import dedup, sketches
from kafka_connect_msk_demo_spark.pipeline.text_analysis import (
    quality_score, token_stats)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats_empty_text_no_divide_by_zero(spark):
    """length(low)=0 used to raise DIVIDE_BY_ZERO under ANSI mode (the
    Spark 4 default); punct_ratio is now pinned to 0.0, matching the
    oracles' coalesce(x / nullif(len, 0), 0.0) guard."""
    out = {r.doc_id: r for r in token_stats(_docs(spark, [
        (1, ""), (2, "   "), (3, "a b!")])).collect()}
    assert out[1].punct_ratio == 0.0 and out[2].punct_ratio == 0.0
    assert out[1].n_chars == 0 and out[2].n_chars == 0
    assert out[3].punct_ratio == pytest.approx(1.0 / 4.0)
    # the DuckDB side of the shared guard has the same semantics
    assert duckdb.sql(
        "SELECT coalesce(3.0 / nullif(0, 0), 0.0)").fetchone() == (0.0,)


def test_quality_score_empty_text_deterministic(spark):
    rows = {r.doc_id: r for r in quality_score(_docs(spark, [
        (1, ""), (2, "the cat sat")])).collect()}
    assert rows[1].punct_ratio == 0.0
    assert rows[1].quality is not None  # formula, not NULL/crash
    assert 0.0 <= rows[1].quality <= 1.0
    assert rows[2].quality > rows[1].quality


def test_sorted_neighborhood_degenerate_window(spark):
    """window<=1 means 'no neighborhood': Spark's sequence(a, b)
    DESCENDS when a > b, so the unguarded probe join emitted
    self-pairs (d1 == d2, jac 1.0) instead of nothing."""
    df = _docs(spark, [(1, "aaa x"), (2, "aaa y"), (3, "bbb z")])
    for w in (0, 1):
        out = dedup.sorted_neighborhood_pairs(df, window=w,
                                              threshold=0.0)
        assert out.count() == 0
        assert out.columns == ["d1", "d2", "jac"]
    # sanity: a real window still yields pairs on the same corpus
    assert dedup.sorted_neighborhood_pairs(
        df, window=2, threshold=0.0).count() > 0


def test_kmv_long_group_column(spark):
    """The sketch kernel's output schema now carries the group
    column's actual type — a bigint group used to crash the
    pandas-to-Arrow conversion against the hard-coded string field."""
    rows = [(g, k) for g in (10, 20) for k in range(g, g + 5)]
    df = spark.createDataFrame(rows, "grp long, k long")
    out = {r.grp: r.n_true for r in
           sketches.kmv_distinct(df, "k", "grp", k=8).collect()}
    assert out == {10: 5, 20: 5}


def test_cms_null_keys_do_not_pollute_counters(spark):
    """NULL items used to hash as the bare salt into one phantom cell
    per depth row (concat_ws drops NULL args); NULL probes returned a
    meaningless NULL-keyed row. Both are filtered now."""
    items = spark.createDataFrame(
        [("a",)] * 3 + [(None,)] * 50, "w string")
    probes = spark.createDataFrame([("a",), (None,)], "w string")
    got = {r.w: r.cnt_cms for r in
           sketches.cms_estimate(items, probes, "w").collect()}
    assert got == {"a": 3}  # est >= true, and no 50-item phantom mass


def test_bm25_fixed_parameters_contract():
    """k1/b are fixed in the integer algebra; the dead tuning knobs
    are gone from the signature."""
    import inspect

    from kafka_connect_msk_demo_spark.pipeline.text_analysis import (
        bm25_topk)
    params = inspect.signature(bm25_topk).parameters
    assert "k1_num" not in params and "b_num" not in params
