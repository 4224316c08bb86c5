"""r11 (VERDICT r10 ask #4): the corpus-proportional scale-path
registrations — ``ann_topk_scaled``, ``embedding_dup_pairs_lsh``,
``semdedup_scaled`` — whose knobs are computed live from COUNT(*) on
BOTH sides (Python in the Spark callable, integer SQL in the oracle).

The oracle-parity suite already hash-checks all three at sf0.001 on
every pytest run; these tests pin the sizing contract itself: the
integer knob formulas, their exact agreement with the SQL
reimplementation, and that the registered variants genuinely compute a
DIFFERENT sizing than the fixed-knob audit baselines at test scales.
"""

import math

import duckdb
import pytest

from kafka_connect_msk_demo_spark.pipeline.similarity import (
    bits_for_corpus, cells_for_corpus)


def test_bits_for_corpus_integer_matches_ceil_log2():
    """The integer body (min b with n <= target·2^b) must equal the
    mathematical ceil(log2(n/target)) everywhere — including exact
    powers of two, where a float log2 can be one off between
    engines."""
    for target in (4, 100):
        for n in list(range(1, 4100)) + [target << b for b in range(1, 25)] \
                + [(target << b) + 1 for b in range(1, 25)] + [10**9]:
            got = bits_for_corpus(n, target_bucket=target)
            if n <= target:
                want = 6
            else:
                # exact rational ceil-log2, no floats
                b = 1
                while target * (2 ** b) < n:
                    b += 1
                want = min(24, max(6, b))
            assert got == want, (n, target, got, want)


def test_bits_for_corpus_sql_twin_agrees():
    """The oracle's SQL reimplementation (MIN b over range with the
    shift comparison) returns the identical nbits for every count the
    test corpora and the sf1 scaling corpus can produce."""
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        _SCALED_LSH_CAP, _SCALED_LSH_FLOOR, _SCALED_LSH_TARGET)
    t, cap, floor = _SCALED_LSH_TARGET, _SCALED_LSH_CAP, _SCALED_LSH_FLOOR
    con = duckdb.connect()
    for n in [1, 4, 5, 8, 9, 500, 2000, 20000, 4 * 2**16, 4 * 2**16 + 1,
              10**7]:
        sql = f"""
        SELECT CASE WHEN {n} <= {t} THEN {floor}
               ELSE greatest({floor}, coalesce(
                 (SELECT MIN(b) FROM range(1, {cap + 1}) t(b)
                  WHERE {n} <= {t} * (1::BIGINT << b)), {cap})) END"""
        got_sql = con.sql(sql).fetchone()[0]
        got_py = bits_for_corpus(n, target_bucket=t, floor=floor, cap=cap)
        assert got_sql == got_py, (n, got_sql, got_py)


def test_cells_for_corpus_sql_twin_agrees():
    con = duckdb.connect()
    for n in [0, 1, 15, 16, 17, 255, 256, 257, 500, 2000, 20000]:
        got_sql = con.sql(
            f"SELECT greatest(16, ({n} + 15) // 16)").fetchone()[0]
        got_py = cells_for_corpus(n, target_cell=16)
        assert got_sql == got_py, (n, got_sql, got_py)


def test_scaled_sizing_differs_from_fixed_knobs():
    """At every committed test scale the registered *_scaled queries
    must exercise a sizing the fixed-knob baselines do NOT — otherwise
    the driver row would certify nothing new (the default production
    targets degenerate to nbits=6 / k=16 on the 500-row sf0.01
    corpus, which is exactly why the registrations use the tighter
    targets)."""
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        _SCALED_CELL_TARGET, _SCALED_LSH_CAP, _SCALED_LSH_FLOOR,
        _SCALED_LSH_TARGET)
    for n in (500, 2000):  # sf0.001/sf0.01 and sf0.1 embedding counts
        nb = bits_for_corpus(n, target_bucket=_SCALED_LSH_TARGET,
                             floor=_SCALED_LSH_FLOOR, cap=_SCALED_LSH_CAP)
        k = cells_for_corpus(n, target_cell=_SCALED_CELL_TARGET)
        assert nb != 6, (n, nb)   # fixed ann_topk / multimodal knob
        assert k != 16, (n, k)    # fixed semdedup_trained knob


def test_semdedup_scaled_cell_count(spark, sf_small):
    """semdedup_scaled's output has exactly cells_for_corpus(N) rows —
    one per trained cell — proving the dynamic k reached the
    quantizer (a silently-ignored knob would fall back to 16)."""
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        _SCALED_CELL_TARGET, q_semdedup_scaled)
    n = load_table(spark, sf_small, "embeddings").count()
    out = q_semdedup_scaled(spark, sf_small)
    assert out.count() == cells_for_corpus(n, target_cell=_SCALED_CELL_TARGET)


def test_dup_pairs_lsh_subset_of_exact(spark, sf_small):
    """The LSH-bucketed pair set is a SUBSET of the exact all-pairs
    scorer's at the same threshold (bucketing only prunes candidates,
    never invents them) — the containment that makes the approximate
    path safe to substitute at scale."""
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        q_embedding_dup_pairs, q_embedding_dup_pairs_lsh)
    exact = {(r.d1, r.d2) for r in
             q_embedding_dup_pairs(spark, sf_small).collect()}
    lsh = {(r.d1, r.d2) for r in
           q_embedding_dup_pairs_lsh(spark, sf_small).collect()}
    assert lsh <= exact
    assert lsh, "LSH pair set empty — buckets too fine for this corpus"


def test_ivf_assign_vectorized_matches_jvm(spark, sf_small):
    """The Arrow-batched assignment kernel (two-pass exact argmax,
    shared with the Lloyd trainer) must choose the IDENTICAL cell for
    every vector as the JVM max_by fold path — any divergence would
    silently fork the scaled SemDeDup family from its SQL oracle."""
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.pipeline import similarity
    from pyspark.sql import functions as F

    vecs = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = similarity.kmeans_centroids(
        load_table(spark, sf_small, "embeddings"), k=32, iters=2)
    jvm = {r.vec_id: r.cell for r in similarity.ivf_assign(
        vecs, cents, vec_col="v", vectorized=False).collect()}
    arrow = {r.vec_id: r.cell for r in similarity.ivf_assign(
        vecs, cents, vec_col="v", vectorized=True).collect()}
    assert jvm == arrow
    assert len(jvm) == vecs.count()
