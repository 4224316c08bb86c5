"""r12 wave-4 measurement: where do the graph queries spend time, and
does pre-partitioning the persisted edge frame by the superstep join key
remove the per-round edge re-shuffle? (guide §1.4 noop-sink timing,
§2.2 partition-once-reuse-many)

Runs each leg 3x in one JVM; prints medians. A/B variants call the same
library code with an edges frame that is repartition("src")-ed before
the persist, via the functions' own plumbing (no logic change).
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

from kafka_connect_msk_demo_spark.session import get_spark  # noqa: E402

spark = get_spark("decompose_graph_r12", master=f"local[{CPUS}]",
                  shuffle_partitions=int(CPUS))
spark.sparkContext.setLogLevel("ERROR")

from kafka_connect_msk_demo_spark.catalog import load_table  # noqa: E402
from kafka_connect_msk_demo_spark.queries import (  # noqa: E402
    bfs_hops_frame, copurchase_edges)
from kafka_connect_msk_demo_spark.pipeline import graph  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn, reps=3):
    ts = []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    print(f"{label:40s} median={statistics.median(ts):7.3f}  {ts}",
          flush=True)
    return statistics.median(ts)


li = load_table(spark, SF, "lineitem")
orders = load_table(spark, SF, "orders")

out = {}

# --- leg: edge construction alone ---
out["copurchase_edges_count"] = timeit(
    "copurchase_edges build+count",
    lambda: copurchase_edges(li).count())
out["bipartite_edges_count"] = timeit(
    "bipartite_edges build+count",
    lambda: graph.bipartite_edges(orders, li).count())

# --- bfs_hops as-is vs src-partitioned edges ---
out["bfs_asis"] = timeit("bfs_hops as-is", lambda: noop(bfs_hops_frame(li)))


def bfs_pre(li, max_hops=3):
    edges = copurchase_edges(li).repartition("src").persist()
    src0 = edges.agg(F.min("src").alias("node"))
    visited = src0.withColumn("hops", F.lit(0)).persist()
    frontier = visited.select("node")
    rounds = [visited]
    for h in range(1, max_hops + 1):
        nxt = (frontier.join(edges, F.col("node") == F.col("src"))
               .select(F.col("dst").alias("node")).distinct()
               .join(visited.select("node"), "node", "left_anti")
               .withColumn("hops", F.lit(h)).persist())
        rounds.append(nxt)
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out.orderBy("node")


out["bfs_srcpart"] = timeit("bfs_hops src-partitioned",
                            lambda: noop(bfs_pre(li)))

# --- pagerank as-is vs src-partitioned edges ---
out["pagerank_asis"] = timeit(
    "pagerank as-is",
    lambda: noop(graph.pagerank_topk(
        graph.bipartite_edges(orders, li), iters=3, k=25)))
out["pagerank_srcpart"] = timeit(
    "pagerank src-partitioned",
    lambda: noop(graph.pagerank_topk(
        graph.bipartite_edges(orders, li).repartition("src"),
        iters=3, k=25)))

# --- kcore as-is vs u-partitioned ---
from kafka_connect_msk_demo_spark.pipeline.queries import (  # noqa: E402
    q_kcore_peel)
out["kcore_asis"] = timeit(
    "kcore_peel as-is", lambda: noop(q_kcore_peel(spark, SF)))

print(json.dumps(out))
