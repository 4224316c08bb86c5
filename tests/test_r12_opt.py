"""Round-12 optimization: fused per-cell SemDeDup pair-stats kernel
(similarity._cell_pair_stats).

The kernel replaces the join-based within-cell pair scan (two
full-payload exchanges + Σ|cell|² codegen'd fold evaluations) with one
cell-key shuffle and a counts-only output. Its threshold decision is a
two-pass exact-margin re-score, so the per-cell stats must be
BIT-IDENTICAL to the JVM filter path — that identity is the whole
correctness argument and is asserted here path-vs-path, on both the
seed quantizer and trained centroids."""

from kafka_connect_msk_demo_spark.catalog import load_table
from kafka_connect_msk_demo_spark.pipeline import similarity


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_pair_kernel_matches_jvm_seed_quantizer(spark, sf_small):
    vecs = load_table(spark, sf_small, "embeddings")
    jvm = _rows(similarity.semantic_dedup_stats(vecs, threshold=0.4))
    vec = _rows(similarity.semantic_dedup_stats(vecs, threshold=0.4,
                                                pairs_vectorized=True))
    assert jvm == vec
    assert jvm, "empty semdedup output — corpus missing"


def test_pair_kernel_matches_jvm_trained(spark, sf_small):
    vecs = load_table(spark, sf_small, "embeddings")
    cents = similarity.kmeans_centroids(vecs, k=16, iters=2)
    jvm = _rows(similarity.semantic_dedup_stats(vecs, threshold=0.4,
                                                centroids=cents))
    vec = _rows(similarity.semantic_dedup_stats(vecs, threshold=0.4,
                                                centroids=cents,
                                                pairs_vectorized=True))
    assert jvm == vec


def test_pair_kernel_plan_shape(spark, sf_small):
    """The fused path must actually BE fused: one FlatMapGroupsInPandas
    stage, no self-join of the assigned frame (the join-based plan's
    SortMergeJoin/BroadcastHashJoin pair over 'cell')."""
    vecs = load_table(spark, sf_small, "embeddings")
    df = similarity.semantic_dedup_stats(vecs, threshold=0.4,
                                         pairs_vectorized=True)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "FlatMapGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan


def test_pair_kernel_threshold_band_rescore():
    """Margin-band re-score: pairs landing within 1e-12 of the
    threshold must be decided by the exact sequential fold. Construct
    vectors whose pair cosine is EXACTLY the threshold under the fold
    (identical vectors, cos = 1.0, threshold = 1.0): >= keeps them."""
    import numpy as np
    import pandas as pd

    v = list(np.linspace(0.1, 1.0, 64))
    pdf = pd.DataFrame({"cell": [7, 7, 7],
                        "vec_id": [3, 1, 2],
                        "v": [v, v, list(np.linspace(1.0, 0.1, 64))]})
    out = similarity._cell_pair_stats(pdf, threshold=1.0, dim=64)
    # ids 1 and 3 are identical vectors: one pair at cos == 1.0 >= 1.0;
    # the reversed vector pairs sit far below threshold
    assert out["n_members"].iloc[0] == 3
    assert out["n_dup_pairs"].iloc[0] == 1
    assert out["n_dropped"].iloc[0] == 1
    assert out["cell"].iloc[0] == 7
