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
    #
    # Partition the cached frame by src FIRST (r12): the union that
    # builds the bidirectional edge list destroys any upstream
    # partitioning, so an unpartitioned cache re-shuffles the full
    # |E| frame at EVERY superstep join (iters+1 exchanges of the
    # biggest frame in the query — the degree aggregate too). Cached
    # hashpartitioning(src) satisfies both the groupBy("src") and the
    # rank⋈edges clustering, so only the node-sized rank side moves
    # per superstep. Integer quantization makes the result partition-
    # invariant (module docstring), so this cannot change output.
    edges_p = edges.repartition("src").persist()
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
    expansion is linear in |lineitem| — never a bipartite blow-up.

    The explicit repartition on the join key makes the self-join
    shuffle-free: both legs are the SAME subtree already hash-
    partitioned by part, so AQE reuses one exchange at runtime instead
    of re-shuffling each alias — measured 2x on the whole kernel at
    sf0.1 (4.9 s -> 2.5 s steady state), and at cluster scale it is
    the difference between one |ps| shuffle and three."""
    # r12 (§2.4): repartition FIRST — hashpartitioning(l_partkey)
    # satisfies the (l_partkey, l_suppkey) distinct (the key is a
    # subset of the grouping columns), so one exchange feeds dedup AND
    # both join legs; the old distinct-then-repartition shape paid the
    # (part, supp) distinct exchange plus the repartition exchange.
    ps = (lineitem.select("l_partkey", "l_suppkey")
          .repartition("l_partkey")
          .dropDuplicates(["l_partkey", "l_suppkey"]))
    return (ps.alias("a")
            .join(ps.alias("b"),
                  (F.col("a.l_partkey") == F.col("b.l_partkey"))
                  & (F.col("a.l_suppkey") < F.col("b.l_suppkey")))
            .select(F.col("a.l_suppkey").alias("u"),
                    F.col("b.l_suppkey").alias("v"))
            .distinct())


def triangle_count(edges: DataFrame,
                   assume_distinct: bool = False) -> DataFrame:
    """Global triangle / wedge census of an undirected simple graph —
    one row: (n_nodes, n_edges, n_wedges, n_triangles).

    Uses the degree-ordered (compact-forward) orientation: each edge
    is directed from its LOWER-(degree, id) endpoint to the higher
    one, making every out-neighborhood at most O(sqrt(|E|)) — the
    classic bound that keeps per-edge work small on skewed (celebrity)
    nodes. Triangles are counted by the EDGE ITERATOR: for each
    oriented edge (a, b), the triangles through it are
    ``|N+(a) ∩ N+(b)|`` — two node-keyed joins against the oriented
    adjacency arrays and one in-task ``array_intersect`` per edge.
    No wedge ROWS are ever materialized or shuffled: the earlier
    wedge self-join + closure-join formulation pushed ~|wedges| rows
    (O(E^1.5); 166M on the dense sf0.1 co-part graph) through an
    exchange — and twice, because the wedge census consumed the join a
    second time. This shape exchanges |E| rows, though each row of the
    second join carries its full N+(a) adjacency array, so exchange
    BYTES still scale with Σ_edges d+(a) (the wedge count) — the win
    is row count and the single pass, not byte volume. Per-row work is
    the O(sqrt(E))-bounded intersection: measured 17.7 s -> 6.4 s at
    sf0.1 with bit-identical output.

    Input contract: undirected edges, one row per unordered pair, no
    self-loops. Duplicate edge rows would skew the census MUTUALLY
    INCONSISTENTLY — ``array_intersect`` dedups (undercounting
    triangles) while the in·out wedge census counts with multiplicity
    — so the precondition is ENFORCED here: edges are deduplicated
    defensively unless the caller declares them already distinct
    (``assume_distinct=True``, which skips the redundant shuffle —
    the registered caller's ``copart_supplier_edges`` already ends in
    ``.distinct()``).

    The wedge census needs no join at all: a wedge x->y->z is an
    in-edge (x->y) paired with an out-edge (y->z) at its middle
    vertex, so n_wedges = sum over nodes of in(v) * out(v) in the
    oriented graph — two node-keyed aggregates.
    """
    # the census references `edges` three times (und's two legs + the
    # node count); cache the input so an expensive upstream derivation
    # (copart: distinct + self-join) is computed once — same
    # discipline as kcore_peel
    if not assume_distinct:
        edges = edges.select("u", "v").distinct()
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
    adj = oriented.groupBy("a").agg(F.collect_list("b").alias("nbr"))
    closed = (oriented
              .join(adj.select("a", F.col("nbr").alias("na")), "a")
              .join(adj.select(F.col("a").alias("b"),
                               F.col("nbr").alias("nb")), "b")
              .select(F.size(F.array_intersect("na", "nb")).alias("t")))
    inout = (oriented.select(F.col("a").alias("n"))
             .groupBy("n").agg(F.count(F.lit(1)).alias("o"))
             .join(oriented.select(F.col("b").alias("n"))
                   .groupBy("n").agg(F.count(F.lit(1)).alias("i")), "n"))
    # four single-row aggregates cross-joined (declared broadcast —
    # each side is exactly one row); materialize the 1-row result, then
    # release the oriented-edge cache (deterministic-release discipline,
    # same as gap_fill_days / connected_components)
    out = (deg.agg(F.count(F.lit(1)).alias("n_nodes"))
           .crossJoin(F.broadcast(
               oriented.agg(F.count(F.lit(1)).alias("n_edges"))))
           .crossJoin(F.broadcast(
               # coalesce: SUM over an empty frame is NULL where the
               # old COUNT-based census said 0 (wedge-free graphs)
               inout.agg(F.coalesce(F.sum(F.col("i") * F.col("o")),
                                    F.lit(0).cast("long"))
                         .alias("n_wedges"))))
           .crossJoin(F.broadcast(
               closed.agg(F.coalesce(F.sum("t"), F.lit(0).cast("long"))
                          .alias("n_triangles"))))
           ).persist()
    out.count()
    oriented.unpersist()
    edges.unpersist()
    return out


def kcore_peel(edges: DataFrame, k: int = 3, rounds: int = 3) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` rounds of removing nodes with
    degree < ``k`` from the undirected graph, reporting per round how
    many nodes were removed and how many remain — the standard
    spam-subgraph / community-density probe. A fixed round count keeps
    the SQL twin an unrolled CTE chain; a full k-core is the same loop
    run to fixpoint with ``n_removed == 0`` as the convergence probe.

    Driver loop, one superstep per round (the connected_components /
    pagerank discipline): filter the PERSISTED deduped edge list by the
    current alive set (two node-keyed equi-joins), recount degrees (one
    hash-agg keyed on node), checkpoint the node-sized degree frame
    LAZILY (``localCheckpoint(eager=False)``), and read ONE integer
    back — ``deg.count()`` is then the round's single scheduled job:
    it materializes the checkpoint AND serves as the census (a node
    remains iff it still has an edge, i.e. has a degree row). An eager
    checkpoint would schedule a separate materialization job before
    the count — two jobs per round for one pass of work. Driver
    traffic is O(1) per round.

    Filtering the BASE edge list each round is equivalent to filtering
    the previous generation: alive sets shrink monotonically, so
    ``e ∩ alive_r² == gen_{r-1} ∩ alive_r²`` — and it keeps every
    round's lineage one hop from the cache. An earlier single-lazy-plan
    unroll referenced each unpersisted generation three times (degree +
    both join legs), re-evaluating the recurrence ~3^rounds times:
    measured 20 s at sf0.1 where this shape is ~5 s.

    The per-round degree frame is ``localCheckpoint``-ed, not persisted:
    a persist keeps the full logical plan inside the InMemoryRelation,
    so round r's plan NESTS every earlier round's — plan-STRING
    rendering (event log / UI explain) then grows ~3^rounds and
    OOM-kills a 1 GiB driver before any task does. The checkpoint cuts
    the lineage to a flat RDD scan; the frame is one row per node, the
    cheapest thing in the query. On a cluster, reliable checkpointing
    (or the same node-sized frame written to the shuffle service) is
    the equivalent; recompute-on-loss is a non-concern for a frame this
    small. Superseded rounds' checkpoint blocks are reclaimed by the
    ContextCleaner once the rebound ``deg`` drops the last reference —
    with a bounded round count the transient accumulation is a few
    node-sized frames, so no explicit block release is needed (the
    DataFrame API offers none for checkpoint RDD blocks short of the
    raw-RDD escape hatch, which the repo's plan gate bans).
    """
    spark = edges.sparkSession
    # r12 (guide §2.4 — the pagerank/bfs cache-partitioning trick):
    # persist the BIDIRECTIONAL incidence list hash-partitioned by the
    # degree key. Every round's degree recount is then satisfied by
    # the cached distribution — two broadcast semi-filters (alive is a
    # dimension-bounded node frame, the side the old shape already
    # broadcast) feeding a co-partitioned hash-agg, ZERO per-round
    # exchanges — where the old union-of-projections shape re-shuffled
    # the full edge frame by u every round.
    bidir = (edges.select("u", "v")
             .unionAll(edges.select(F.col("v").alias("u"),
                                    F.col("u").alias("v")))
             .repartition("u").persist())

    def degrees(alive: DataFrame | None) -> DataFrame:
        # one row per node that still has an edge: undirected degree =
        # incidence count, with BOTH endpoints required alive — the
        # same two-sided filter the old explicit edge join applied
        cur = bidir
        if alive is not None:
            cur = (cur.join(F.broadcast(alive), "u")
                   .join(F.broadcast(
                       alive.select(F.col("u").alias("v"))), "v"))
        return cur.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))

    rows: list[tuple[int, int, int]] = []
    try:
        deg = degrees(None).localCheckpoint(eager=False)
        n_prev = deg.count()  # one job: materializes + round-0 census
        for r in range(1, rounds + 1):
            alive = deg.filter(F.col("deg") >= k).select("u")
            deg = degrees(alive).localCheckpoint(eager=False)
            n_rem = deg.count()  # one job: materializes + census
            rows.append((r, n_prev - n_rem, n_rem))
            n_prev = n_rem
    finally:
        bidir.unpersist()
    return spark.createDataFrame(
        rows, "round int, n_removed long, n_remaining long")
