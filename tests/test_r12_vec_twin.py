"""Round-12 additions (VERDICT r11 asks #1-#2 + ADVICE r11 fixes).

`semdedup_scaled_vec` exists so the Arrow vectorized IVF-assign
kernel — the code path that carries production k ∝ N sizing — earns
its OWN driver row: `semdedup_scaled`'s r11 row certified only the
JVM expression assignment (sf0.01's k sits below the k=512
crossover). These tests pin the twin's contract: the vectorized plan
carries the mapInPandas assign stage the JVM twin must not have, and
both twins produce identical results against the shared oracle SQL.
"""

import pytest

from kafka_connect_msk_demo_spark.pipeline.queries import (
    q_semdedup_scaled, q_semdedup_scaled_vec)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def test_vec_twin_plan_carries_arrow_assign_witness(spark, sf_small):
    """The whole point of the twin is that the DRIVER executes the
    Arrow kernel — assert the plan witness, so the twin can never
    silently fall back to the JVM fold and certify nothing new."""
    plan = _physical_plan(q_semdedup_scaled_vec(spark, sf_small))
    assert "MapInPandas" in plan, (
        "semdedup_scaled_vec's plan lost the mapInPandas assign "
        "stage — it would re-certify the JVM path, not the kernel:\n"
        + plan[:2000])


def test_jvm_twin_plan_has_no_arrow_assign(spark, sf_small):
    """And the converse: at sf-small the corpus-proportional k is far
    below the k=512 crossover, so `semdedup_scaled` must keep the
    driver-certified JVM expression plan (no Python in it at all)."""
    plan = _physical_plan(q_semdedup_scaled(spark, sf_small))
    assert "MapInPandas" not in plan
    assert "ArrowEvalPython" not in plan


def test_twins_bit_identical(spark, sf_small):
    """Same centroids (deterministic Lloyd), bit-identical argmax
    (shared _fold_argmax_cells two-pass) => identical per-cell stats.
    This is what lets the twin reuse _SQL_SEMDEDUP_SCALED verbatim."""
    jvm = [tuple(r) for r in q_semdedup_scaled(spark, sf_small)
           .collect()]
    vec = [tuple(r) for r in q_semdedup_scaled_vec(spark, sf_small)
           .collect()]
    assert jvm == vec
    assert jvm, "empty semdedup output — corpus or centroids missing"


def test_twins_share_one_oracle(spark):
    """Registry invariant: both twins map to the SAME oracle string
    object — the kernel is certified against the unchanged SQL, which
    is the whole evidentiary claim of the twin."""
    from kafka_connect_msk_demo_spark.queries import ALL_QUERIES
    assert (ALL_QUERIES["semdedup_scaled"][1]
            is ALL_QUERIES["semdedup_scaled_vec"][1])


def test_ivf_assign_vectorized_empty_centroids_raises(spark, sf_small):
    """ADVICE r11: an empty quantizer used to crash deep inside numpy
    (np.stack on []); it must surface the contract violation."""
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.pipeline import similarity
    from pyspark.sql import functions as F

    vecs = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    empty = (load_table(spark, sf_small, "embeddings").limit(1)
             .select(F.col("vec_id").alias("c_id"),
                     F.col("embedding").cast("array<double>")
                     .alias("c_vec"))
             .filter(F.lit(False)))
    with pytest.raises(ValueError, match="empty"):
        similarity.ivf_assign(vecs, empty, vec_col="v", vectorized=True)


def test_dup_pairs_lsh_unpersists_corpus_frames(spark, sf_small):
    """ADVICE r11: cosine_dup_pairs_lsh leaked its two corpus-sized
    persisted frames into the session (the r11 scaling audit measured
    a 63s-vs-10s distortion from exactly this). After the fix the only
    cache the call may leave behind is the O(#pairs) RESULT frame."""
    from kafka_connect_msk_demo_spark.pipeline.queries import (
        q_embedding_dup_pairs_lsh)

    spark.catalog.clearCache()
    out = q_embedding_dup_pairs_lsh(spark, sf_small)
    jpersist = spark.sparkContext._jsc.getPersistentRDDs()
    n_cached = jpersist.size()
    assert n_cached <= 1, (
        f"{n_cached} persisted RDDs after cosine_dup_pairs_lsh — the "
        f"corpus-sized v/bucketed frames leaked again")
    assert out.count() >= 0
    spark.catalog.clearCache()


def test_make_scale_rejects_replication_past_roll_period():
    """ADVICE r11: the embedding roll cycles with period dim-1, so
    replica dim would exactly duplicate replica 1 — _replicate must
    reject k > dim-1 instead of silently reintroducing the duplicate
    explosion."""
    import importlib.util
    import os

    import numpy as np
    import pyarrow as pa

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "make_scale", os.path.join(root, "tools", "make_scale.py"))
    ms = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ms)

    dim = 4
    emb = pa.table({
        "vec_id": pa.array([0, 1], type=pa.int64()),
        "embedding": pa.array(
            [list(np.arange(dim, dtype=np.float32)),
             list(np.arange(dim, dtype=np.float32) + 1)],
            type=pa.list_(pa.float32())),
    })
    strides = {"embeddings": 2}
    # replicas 0..dim-1 have distinct shifts — k = dim is the max safe
    ok = ms._replicate(emb, "embeddings", dim, strides)
    assert ok.num_rows == 2 * dim
    mats = [np.stack(ok.column("embedding").to_pylist()[2 * r:2 * r + 2])
            for r in range(dim)]
    for i in range(dim):
        for j in range(i + 1, dim):
            assert not np.array_equal(mats[i], mats[j]), (i, j)
    with pytest.raises(ValueError, match="roll period"):
        ms._replicate(emb, "embeddings", dim + 1, strides)
