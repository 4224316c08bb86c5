"""Round-13 wave-A experiment: isolate the JVM ivf_assign cost terms.

Variants (same session, interleaved reps, noop sink):
  base      — current shape: interpreted fold (dim=None), groupBy(all cols)
  unroll    — _dot(dim=64) unrolled codegen dot, groupBy(all cols)
  rekey     — interpreted fold, groupBy(vec_id) + max_by payload
  both      — unrolled + rekey

All variants must produce identical assignments (asserted once on
sorted collect). k is the corpus-proportional cells_for_corpus value
(the semdedup_scaled regime).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_msk_demo_spark.catalog import load_table  # noqa: E402
from kafka_connect_msk_demo_spark.pipeline import similarity as S  # noqa: E402
from kafka_connect_msk_demo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("REPS", "4"))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def assign_variant(vectors, cents, dim, rekey):
    c = (cents.select(F.col("c_id"), F.col("c_vec"))
         .withColumn("_cnrm", S._norm(F.col("c_vec"), dim)))
    keys = [f.name for f in vectors.schema.fields]
    scored = (vectors.withColumn("_vnrm", S._norm(F.col("v"), dim))
              .crossJoin(F.broadcast(c))
              .withColumn("sim",
                          S._dot(F.col("v"), F.col("c_vec"), dim)
                          / (F.col("_vnrm") * F.col("_cnrm"))))
    if not rekey:
        return (scored.groupBy(*keys)
                .agg(F.max_by("c_id", F.struct(F.col("sim"), -F.col("c_id")))
                     .alias("cell")))
    payload = [k for k in keys if k != "vec_id"]
    ordering = F.struct(F.col("sim"), -F.col("c_id"))
    agg = scored.groupBy("vec_id").agg(
        *[F.max_by(p, ordering).alias(p) for p in payload],
        F.max_by("c_id", ordering).alias("cell"))
    return agg.select(*keys, "cell")


def main():
    spark = get_spark("exp_ivf_assign", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    vecs = load_table(spark, SF_DIR, "embeddings")
    n = vecs.count()
    k = S.cells_for_corpus(n, target_cell=16)
    print(f"n={n} k={k}")
    cents = S.kmeans_centroids(vecs, k=k, iters=2)
    cents = cents.persist()
    cents.count()
    data = (vecs.select(F.col("vec_id"), S.as_double("embedding").alias("v"))
            .repartition(spark.sparkContext.defaultParallelism))

    variants = {
        "base": lambda: assign_variant(data, cents, None, False),
        "unroll": lambda: assign_variant(data, cents, 64, False),
        "rekey": lambda: assign_variant(data, cents, None, True),
        "both": lambda: assign_variant(data, cents, 64, True),
    }
    # warm-up
    _force(variants["base"]())
    # identity check
    ref = sorted(tuple(r) for r in variants["base"]().collect())
    for name in ("unroll", "rekey", "both"):
        got = sorted(tuple(r) for r in variants[name]().collect())
        assert got == ref, f"{name} output differs!"
    print("identity: all variants equal")
    times = {v: [] for v in variants}
    for _ in range(REPS):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"exp:{name}")
            t0 = time.perf_counter()
            _force(fn())
            times[name].append(round(time.perf_counter() - t0, 3))
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med}s  reps {ts}")
    spark.stop()


if __name__ == "__main__":
    main()
