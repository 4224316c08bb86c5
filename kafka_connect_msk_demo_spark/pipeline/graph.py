"""Iterative graph analytics — quantized PageRank as Pregel-style
join+aggregate supersteps.

PageRank (Page et al. 1999) in its textbook form is float-summed and
therefore not bit-stable under re-partitioning — partial sums of
doubles depend on reduction order. The variant here quantizes every
rank to an int64 fixed-point value (scale 2^30) and runs the recurrence
entirely in integer arithmetic:

    contrib(u->v) = rank_q(u) div outdeg(u)
    rank_q'(v)    = C + (85 * sum(contrib)) div 100
    C             = ((SCALE div N) * 15) div 100

Integer sums are associative-exact, so the result is identical on any
partitioning, any engine, any cluster size — the same bit-stability
argument as the int64-quantized Lloyd trainer in `similarity.py`, and
what lets the oracle UNROLL the iteration as plain SQL CTEs.

Execution shape per superstep: one equi-join (rank ⋈ edges, shuffle
key = src) + one hash aggregate (shuffle key = dst) — the standard
Pregel message-passing step expressed declaratively. The edge+degree
frame is persisted (it feeds every superstep); driver traffic is O(1)
(the node count). At 100 TB you would checkpoint the rank frame every
few supersteps to truncate lineage — with the handful of unrolled
iterations here the single lazy plan is the faster choice.

Graph construction from the TPC-H-ish tables: the bipartite
customer↔supplier relationship graph (an edge when a customer's order
contains a supplier's line item), made BIDIRECTIONAL so every node has
out-degree ≥ 1 — no dangling-mass correction needed, and the node
namespaces ('c:' / 's:') keep the two directions collision-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 2 ** 30


def bipartite_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Distinct customer↔supplier edges, both directions."""
    fwd = (orders.join(lineitem,
                       orders["o_orderkey"] == lineitem["l_orderkey"])
           .select(F.concat(F.lit("c:"),
                            F.col("o_custkey").cast("string")).alias("src"),
                   F.concat(F.lit("s:"),
                            F.col("l_suppkey").cast("string")).alias("dst"))
           .distinct())
    # namespaces are disjoint, so the reversed copy cannot collide with
    # a forward edge — plain union (Spark union == UNION ALL) is exact
    return fwd.union(fwd.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))


def pagerank_topk(edges: DataFrame, iters: int = 3,
                  k: int = 25) -> DataFrame:
    """Top-``k`` nodes by quantized PageRank after ``iters`` unrolled
    supersteps. Returns (node, outdeg, rank_q)."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edeg = edges.join(deg, "src").persist()
    try:
        # O(1) driver traffic: only the node count crosses over (the
        # bounded-collect class, like the K×dim centroid partials)
        n = edeg.select("src").distinct().count()
        base = SCALE // n
        c = (base * 15) // 100
        rank = (deg.select(F.col("src").alias("node"))
                .withColumn("rank_q", F.lit(base).cast("long")))
        for _ in range(iters):
            msgs = (rank.join(edeg, rank["node"] == edeg["src"])
                    .select(F.col("dst").alias("node"),
                            F.expr("rank_q div outdeg").alias("contrib")))
            in_sum = (msgs.groupBy("node")
                      .agg(F.sum("contrib").alias("in_sum")))
            rank = (deg.select(F.col("src").alias("node"))
                    .join(in_sum, "node", "left")
                    .select("node",
                            (F.lit(c) + F.expr(
                                "(85 * coalesce(in_sum, 0L)) div 100"))
                            .alias("rank_q")))
        # materialize the k-row result, then release the edge frame
        # (repo convention — see connected_components in dedup.py: the
        # returned frame stays persisted, the cleaner reclaims it once
        # unreferenced)
        out = (rank.join(deg, rank["node"] == deg["src"])
               .select("node", "outdeg", "rank_q")
               .orderBy(F.col("rank_q").desc(), F.col("node"))
               .limit(k)
               .persist())
        out.count()
    finally:
        edeg.unpersist()
    return out
