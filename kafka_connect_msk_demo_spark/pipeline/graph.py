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
    # The edge pipeline (orders⋈lineitem→distinct→union) feeds EVERY
    # superstep; without a persist each reference replays it (the
    # physical plan showed 96 parquet scans / 178 exchanges at
    # iters=3). Persist the raw edge frame ONCE — deg and every
    # message join derive from it — rather than a wider edge⋈deg
    # frame, which costs a second |E|-row materialization for a
    # column the rank frame can carry itself. deg is one row per
    # node (the graph is bidirectional, so every node occurs as src).
    edges_p = edges.persist()
    deg = (edges_p.groupBy("src")
           .agg(F.count(F.lit(1)).alias("outdeg")).persist())
    try:
        # O(1) driver traffic: only the node count crosses over (the
        # bounded-collect class, like the K×dim centroid partials).
        # deg.count() IS the node count — no distinct over |E| needed.
        n = deg.count()
        base = SCALE // n
        c = (base * 15) // 100
        # rank carries (node, outdeg, rank_q): the superstep join then
        # needs only the persisted raw edges, not an edge⋈deg frame.
        rank = (deg.select(F.col("src").alias("node"), "outdeg")
                .withColumn("rank_q", F.lit(base).cast("long")))
        for _ in range(iters):
            msgs = (rank.join(edges_p, rank["node"] == edges_p["src"])
                    .select(F.col("dst").alias("node"),
                            F.expr("rank_q div outdeg").alias("contrib")))
            in_sum = (msgs.groupBy("node")
                      .agg(F.sum("contrib").alias("in_sum")))
            rank = (deg.select(F.col("src").alias("node"), "outdeg")
                    .join(in_sum, "node", "left")
                    .select("node", "outdeg",
                            (F.lit(c) + F.expr(
                                "(85 * coalesce(in_sum, 0L)) div 100"))
                            .alias("rank_q")))
        # materialize the k-row result, then release the edge frame
        # (repo convention — see connected_components in dedup.py: the
        # returned frame stays persisted, the cleaner reclaims it once
        # unreferenced)
        out = (rank.select("node", "outdeg", "rank_q")
               .orderBy(F.col("rank_q").desc(), F.col("node"))
               .limit(k)
               .persist())
        out.count()
    finally:
        edges_p.unpersist()
        deg.unpersist()
    return out


def copart_supplier_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected supplier co-part edges: (u < v) when two suppliers
    ship the same part. Per-part supplier lists are small and bounded
    (TPC-H ships each part from ~4 suppliers), so the per-part pair
    expansion is linear in |lineitem| — never a bipartite blow-up."""
    ps = lineitem.select("l_partkey", "l_suppkey").distinct()
    return (ps.alias("a")
            .join(ps.alias("b"),
                  (F.col("a.l_partkey") == F.col("b.l_partkey"))
                  & (F.col("a.l_suppkey") < F.col("b.l_suppkey")))
            .select(F.col("a.l_suppkey").alias("u"),
                    F.col("b.l_suppkey").alias("v"))
            .distinct())


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle / wedge census of an undirected simple graph —
    one row: (n_nodes, n_edges, n_wedges, n_triangles).

    Uses the degree-ordered (compact-forward) orientation: each edge
    is directed from its LOWER-(degree, id) endpoint to the higher
    one, making every out-neighborhood at most O(sqrt(|E|)) — the
    classic bound that keeps the wedge join from exploding on skewed
    (celebrity) nodes. Each triangle is then counted exactly once as
    a directed wedge u->v->w closed by the directed edge u->w.

    Shuffle story: degree agg (key = node), wedge self-join
    (key = shared middle vertex), closure semi-equi-join (key = the
    (u, w) pair). All equi-joins; deterministic orientation makes the
    census engine-replayable.
    """
    # the census references `edges` five times (und x2 via deg legs,
    # the orientation, the final node count); cache the input so an
    # expensive upstream derivation (copart: distinct + self-join) is
    # computed once — same discipline as kcore_peel
    edges = edges.persist()
    und = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # orient: keep (a -> b) iff (deg_a, a) < (deg_b, b)
    d1 = deg.select(F.col("u").alias("a"), F.col("deg").alias("da"))
    d2 = deg.select(F.col("u").alias("b"), F.col("deg").alias("db"))
    oriented = (und.select(F.col("u").alias("a"), F.col("v").alias("b"))
                .join(d1, "a").join(d2, "b")
                .filter((F.col("da") < F.col("db"))
                        | ((F.col("da") == F.col("db"))
                           & (F.col("a") < F.col("b"))))
                .select("a", "b")).persist()
    wedges = (oriented.alias("e1")
              .join(oriented.alias("e2"),
                    F.col("e1.b") == F.col("e2.a"))
              .select(F.col("e1.a").alias("x"),
                      F.col("e1.b").alias("y"),
                      F.col("e2.b").alias("z")))
    closed = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("z")),
        ["x", "z"])
    # four single-row aggregates cross-joined (declared broadcast —
    # each side is exactly one row); materialize the 1-row result, then
    # release the oriented-edge cache (deterministic-release discipline,
    # same as gap_fill_days / connected_components)
    out = (deg.agg(F.count(F.lit(1)).alias("n_nodes"))
           .crossJoin(F.broadcast(
               oriented.agg(F.count(F.lit(1)).alias("n_edges"))))
           .crossJoin(F.broadcast(
               wedges.agg(F.count(F.lit(1)).alias("n_wedges"))))
           .crossJoin(F.broadcast(
               closed.agg(F.count(F.lit(1)).alias("n_triangles"))))
           ).persist()
    out.count()
    oriented.unpersist()
    edges.unpersist()
    return out


def kcore_peel(edges: DataFrame, k: int = 3, rounds: int = 3) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` rounds of removing nodes with
    degree < ``k`` from the undirected graph, reporting per round how
    many nodes were removed and how many remain — the standard
    spam-subgraph / community-density probe, here with a FIXED round
    count so the whole computation is one deterministic plan the SQL
    twin unrolls as CTEs (full k-core = loop to fixpoint; at 100 TB
    run this as a driver loop with a convergence probe, same shape as
    connected_components' label propagation).

    Per round: one degree aggregate (shuffle key = node) and two
    semi joins filtering the edge list to surviving endpoints —
    all equi-joins, integer-only state. The whole unrolled recurrence
    plus the per-round node census stays ONE lazy plan (a union of
    single-row aggregates + a 4-row lag window): an earlier
    driver-loop formulation with per-round ``count()`` probes paid
    ~12 scheduled jobs of latency for the same answer; at a true
    fixpoint loop the count comes back as the convergence probe.
    """
    from pyspark.sql import Window

    # the unrolled recurrence references the base graph ~2^rounds
    # times (each round's two semi-join legs + its census leg); the
    # per-round joins are cheap against a CACHED base, but recomputing
    # an expensive upstream edge derivation (distinct + self-join)
    # that many times is not — persist, materialize the 4-row result,
    # release (gap_fill_days discipline)
    und = (edges.select("u", "v")
           .union(edges.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))).persist()
    gens = [und]
    for _ in range(rounds):
        cur = gens[-1]
        deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("u")
        gens.append(cur.join(keep, "u")
                    .join(keep.select(F.col("u").alias("v")), "v")
                    .select("u", "v"))
    counts = None
    for i, g in enumerate(gens):
        row = g.agg(F.count_distinct("u").alias("n_remaining")) \
            .select(F.lit(i).alias("round"), "n_remaining")
        counts = row if counts is None else counts.union(row)
    # 4-row frame: the unpartitioned lag window is trivially fine
    w = Window.orderBy("round")
    out = (counts
           .withColumn("n_removed",
                       F.lag("n_remaining").over(w)
                       - F.col("n_remaining"))
           .filter(F.col("round") >= 1)
           .select(F.col("round").cast("int").alias("round"),
                   "n_removed", "n_remaining")
           .orderBy("round")
           .persist())
    out.count()
    und.unpersist()
    return out
