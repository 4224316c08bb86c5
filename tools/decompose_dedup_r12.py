"""Stage-level decomposition of the dedup-family cost at sf0.1 —
guide §1 empirical profiling: time each leg of jaccard_pairs /
minhash_lsh_pairs / connected_components in a warm session so the
optimization targets the leg that actually dominates."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_msk_demo_spark.catalog import load_table  # noqa: E402
from kafka_connect_msk_demo_spark.pipeline import dedup  # noqa: E402
from kafka_connect_msk_demo_spark.pipeline.textprep import doc_shingles  # noqa: E402
from kafka_connect_msk_demo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{time.perf_counter() - t0:7.3f}s  {label}", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("decompose", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    # warm-ups
    noop(docs)
    spark.range(64).mapInPandas(lambda it: it, "id long").write \
        .format("noop").mode("overwrite").save()
    for rep in range(2):
        print(f"--- rep {rep}")
        sh = doc_shingles(docs, "doc_id", "text", 3).persist()
        t("shingle kernel (materialize persist)", lambda: sh.count())
        ex = sh.select("doc_id", F.size("s").alias("n"),
                       F.explode("s").alias("sg"))
        t("explode count", lambda: noop(ex))
        from pyspark.sql import Window
        dfreq = ex.groupBy("sg").agg(F.count(F.lit(1)).alias("df"))
        w = Window.partitionBy("doc_id").orderBy("df", "sg")
        index = (ex.join(dfreq, "sg")
                 .withColumn("rk", F.row_number().over(w))
                 .filter(F.col("rk") <=
                         F.floor((1.0 - 0.8) * F.col("n") + 1e-9) + 1)
                 .select("doc_id", "sg")).persist()
        t("prefix index (materialize persist)", lambda: index.count())
        cand = (index.alias("a")
                .join(index.alias("b"), (F.col("a.sg") == F.col("b.sg"))
                      & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("d1"),
                        F.col("b.doc_id").alias("d2"))
                .distinct())
        cand = cand.persist()
        t("cand self-join + distinct", lambda: cand.count())
        pairs = dedup._verify_jaccard(cand, sh, 0.8).persist()
        t("verify (join shingles x2 + filter + sort)",
          lambda: pairs.count())
        both = (pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
                .union(pairs.select(F.col("d2").alias("a"),
                                    F.col("d1").alias("b"))))
        both = both.distinct().persist()
        t("both distinct count", lambda: both.count())
        t("toLocalIterator drain",
          lambda: sum(1 for _ in both.toLocalIterator()))
        t("toPandas drain", lambda: len(both.toPandas()))
        comp = t("connected_components (full)",
                 lambda: dedup.connected_components(pairs))
        t("dedup_clusters final join",
          lambda: noop(dedup.dedup_clusters(docs, pairs)))
        t("full q (dedup_clusters cold cache)", lambda: (
            spark.catalog.clearCache(),
            noop(dedup.dedup_clusters(
                docs, dedup.jaccard_pairs(docs, threshold=0.8, k=3)))))
        print("counts:", sh.count() if False else "",
              flush=True)
        spark.catalog.clearCache()
        # minhash leg
        t("full q (dedup_clusters_lsh cold)", lambda: (
            noop(dedup.dedup_clusters(
                docs, dedup.minhash_lsh_pairs(docs, threshold=0.8, k=3)))))
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
