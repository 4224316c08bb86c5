"""Deterministic hash sampling: stability, rate accuracy, split
independence — the properties ``df.sample()`` cannot give."""

from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.catalog import load_table
from kafka_connect_msk_demo_spark.operators.sampling import (
    hash_sample, stratified_hash_sample)


def test_membership_is_stable_across_runs_and_partitionings(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    a = {r.doc_id for r in
         hash_sample(docs, "doc_id", 0.4).select("doc_id").collect()}
    b = {r.doc_id for r in
         hash_sample(docs.repartition(17), "doc_id", 0.4)
         .select("doc_id").collect()}
    assert a == b and a


def test_fraction_accuracy(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    kept = hash_sample(docs, "doc_id", 0.5).count()
    # binomial(n, 0.5): allow 4 sigma
    assert abs(kept - 0.5 * n) <= 4 * (0.25 * n) ** 0.5


def test_disjoint_salts_give_independent_leak_free_splits(spark, sf_small):
    """train/eval splits from complementary predicates on ONE salt are
    exactly disjoint and exhaustive; a different salt draws an
    independent sample."""
    docs = load_table(spark, sf_small, "documents")
    from kafka_connect_msk_demo_spark.operators.sampling import sample_hash
    train = docs.filter(sample_hash("doc_id", 0.8, salt="split"))
    evl = docs.filter(~sample_hash("doc_id", 0.8, salt="split"))
    assert train.join(evl, "doc_id", "inner").count() == 0
    assert train.count() + evl.count() == docs.count()


def test_stratified_rates(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    out = stratified_hash_sample(docs, "lang", {"en": 0.1, "zh": 1.0},
                                 key_col="doc_id", default=0.5)
    by_lang = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
    src = {r.lang: r.n for r in
           docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    assert by_lang["zh"] == src["zh"]          # fraction 1.0 keeps all
    assert by_lang.get("en", 0) < 0.3 * src["en"]  # heavy downsample
    for lang in ("de", "es", "fr"):            # default 0.5 within 4σ
        n = src[lang]
        assert abs(by_lang.get(lang, 0) - 0.5 * n) <= 4 * (0.25 * n) ** 0.5


def test_weighted_sample_extremes_and_determinism(spark):
    """weight=0 keeps nothing, weight>=1 keeps everything, and
    mid-range membership is stable across partition layouts."""
    from kafka_connect_msk_demo_spark.operators.sampling import (
        weighted_hash_sample)

    df = spark.range(0, 2000).withColumnRenamed("id", "k") \
        .withColumn("k", F.col("k"))
    assert weighted_hash_sample(df, "k", F.lit(0.0)).count() == 0
    assert weighted_hash_sample(df, "k", F.lit(1.0)).count() == 2000
    half = weighted_hash_sample(df, "k", F.lit(0.5))
    n = half.count()
    assert 800 < n < 1200                      # ~Binomial(2000, .5)
    a = {r.k for r in half.collect()}
    b = {r.k for r in weighted_hash_sample(
        df.repartition(17), "k", F.lit(0.5)).collect()}
    assert a == b                              # layout-independent


def test_weighted_sample_negative_weight_drops_all(spark):
    """Review regression: a negative weight must behave as 0 (drop),
    not as keep-everything via two's-complement hex formatting."""
    from kafka_connect_msk_demo_spark.operators.sampling import (
        weighted_hash_sample)

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    assert weighted_hash_sample(df, "k", F.lit(-0.3)).count() == 0
    mixed = weighted_hash_sample(
        df, "k", F.when(F.col("k") < 250, F.lit(-1.0)).otherwise(F.lit(1.0)))
    kept = {r.k for r in mixed.collect()}
    assert kept == set(range(250, 500))


def test_epoch_shard_assign_properties(spark):
    """Each epoch is a full, independent permutation: every key appears
    exactly once per epoch; positions within an (epoch, shard) are a
    contiguous 1..n rank; epoch-salting makes the two epochs' shard
    assignments differ for at least one key; and the assignment is
    reproducible call-over-call."""
    from kafka_connect_msk_demo_spark.operators.sampling import (
        epoch_shard_assign)

    df = spark.range(200).withColumnRenamed("id", "k")
    out = epoch_shard_assign(df, "k", epochs=2, shards=4).collect()
    assert len(out) == 400
    for e in (0, 1):
        keys = [r.k for r in out if r.epoch == e]
        assert sorted(keys) == list(range(200))
    for e in (0, 1):
        for s in range(4):
            pos = sorted(r.pos for r in out
                         if r.epoch == e and r.shard == s)
            assert pos == list(range(1, len(pos) + 1))
    m0 = {r.k: r.shard for r in out if r.epoch == 0}
    m1 = {r.k: r.shard for r in out if r.epoch == 1}
    assert m0 != m1, "epoch salt must produce distinct permutations"
    again = epoch_shard_assign(df, "k", epochs=2, shards=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
