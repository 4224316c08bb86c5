"""Document deduplication — exact and near-duplicate.

Four strategies, all DataFrame-native:

* :func:`exact_dedup` — hash-groupBy on normalized text. One shuffle on
  the 32-byte digest; at 100 TB the digest is the shuffle key, so skew
  equals true duplicate skew (use the group count output to spot it).
* :func:`jaccard_pairs` — EXACT n-gram-Jaccard near-dup pairs via an
  inverted shingle index with prefix filtering (the PPJoin-style exact
  algorithm): a pair with ``J ≥ t`` must share at least one of each
  document's ``⌊(1-t)·|s|⌋+1`` globally-rarest shingles, so only those
  prefix shingles are indexed. Candidate generation is a self-join on
  the shingle (a shuffle key, NOT a crossJoin); verification intersects
  the full shingle arrays. Exact at any scale; the prefix filter keeps
  the index a small fraction of the corpus.
* :func:`minhash_lsh_pairs` — banded MinHash LSH: signature → band
  buckets → per-bucket candidate pairs → exact-Jaccard verification.
  The band bucket is the shuffle key; cost scales with bucket
  occupancy, never |docs|². This is the 100 TB path: with b=16 bands of
  r=8 rows, P(candidate | J=0.9) ≈ 1-(1-0.9^8)^16 ≈ 0.9996 and
  P(candidate | J=0.3) ≈ 0.1%, so almost all quadratic work disappears.
* :func:`simhash` / :func:`simhash_pairs` — 64-bit SimHash with
  block-pigeonhole candidate generation (pairs within Hamming distance
  d must agree on one of d+1 bit-blocks → block value is the shuffle
  key).

The reference has no dedup surface; this family extends it for
training-data pipelines (BASELINE.json). Closest reference analog is
the W2-W4 ranked dedup (SURVEY.md §2.7), which :func:`exact_dedup`
generalizes from key-equality to content-equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..arrow_guard import exact_longs
from .textprep import doc_shingles, tokens

# ---------------------------------------------------------------------------
# Shared batch-axis hashing for the signature kernels
# ---------------------------------------------------------------------------

#: cross-document shingle-hash memo bound (per task); cleared when full
_SHINGLE_CACHE_MAX = 1 << 20


def _flat_base_hashes(s_values, cache):
    """(vals, counts): every shingle's 64-bit md5-prefix base hash for a
    whole Arrow batch, flattened in document order. Distinct shingles
    are hashed ONCE per task (``cache`` memo) — near-dup corpora repeat
    shingles heavily, so this removes most md5 calls the per-document
    formulation paid. ``counts[d]`` = number of shingles of document d,
    for numpy segment reduction downstream."""
    import hashlib as _hl

    import numpy as np

    counts = np.fromiter((len(s) for s in s_values), dtype=np.int64,
                         count=len(s_values))
    vals = np.empty(int(counts.sum()), dtype=np.uint64)
    pos = 0
    get = cache.get
    for s in s_values:
        for sgl in s:
            h = get(sgl)
            if h is None:
                if len(cache) >= _SHINGLE_CACHE_MAX:
                    cache.clear()
                h = int.from_bytes(_hl.md5(sgl.encode()).digest()[:8],
                                   "big")
                cache[sgl] = h
            vals[pos] = h
            pos += 1
    return vals, counts


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One canonical row per distinct normalized text: the lowest id
    wins; ``dup_count`` reports group size. Shuffle key = md5 digest."""
    digest = F.md5(F.lower(F.trim(F.col(text_col))))
    return (docs.select(F.col(id_col), digest.alias("text_hash"))
            .groupBy("text_hash")
            .agg(F.min(id_col).alias("canonical_id"),
                 F.count(F.lit(1)).alias("dup_count")))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (inverted index + prefix filter)
# ---------------------------------------------------------------------------


def jaccard_pairs(docs: DataFrame, threshold: float = 0.8, k: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  prefix_filter: bool = True,
                  shingles: DataFrame | None = None) -> DataFrame:
    """All pairs (d1 < d2) with shingle-Jaccard ≥ threshold — EXACT.

    Plan shape: shingle explode → (optional) global-df ranking → prefix
    index → self-equi-join on shingle → distinct candidate pairs →
    verify by intersecting full shingle arrays. The only shuffles are
    on the shingle string and on the pair key.

    The shingle table and the prefix index are persisted: each feeds
    ≥ 2 branches (self-join sides, verification legs), and without a
    cache every branch re-runs the shingle kernel. Both are corpus- or
    prefix-sized (PPJoin implementations cache the same structures);
    MEMORY_AND_DISK, evicted LRU.
    """
    # caller-supplied shingles (already persisted) avoid re-running the
    # shingle kernel when the caller also feeds other consumers from it
    sh = shingles if shingles is not None \
        else doc_shingles(docs, id_col, text_col, k).persist()
    # r12 (§2.3 shuffle keys, not payloads): every downstream
    # group/join keys on the 8-byte xxhash64 of the shingle instead of
    # the shingle STRING — the df aggregate, the df join and the
    # candidate self-join exchange longs. Correctness is unchanged:
    # a hash collision only MERGES two shingles' df counts (the same
    # way for every document, so the prefix ranking below stays one
    # globally consistent total order — the PPJoin prefix lemma holds
    # under ANY consistent order) and can only ADD candidate pairs,
    # which the exact full-array verification drops. The ranking
    # tiebreak stays the true shingle string, so the order is total
    # even across hash collisions.
    ex = sh.select("doc_id", F.size("s").alias("n"),
                   F.explode("s").alias("sg")) \
           .withColumn("sgh", F.xxhash64("sg"))

    if prefix_filter:
        # Rank each doc's shingles by global document frequency (rarest
        # first, shingle string as tiebreak); only the first
        # ⌊(1-t)·n⌋+1 can witness a pair at J ≥ t.
        dfreq = ex.groupBy("sgh").agg(F.count(F.lit(1)).alias("df"))
        w = Window.partitionBy("doc_id").orderBy("df", "sg")
        # +1e-9 before floor: (1-t) is not exact in binary (1-0.8 =
        # 0.19999999999999996), so for n a multiple of 1/(1-t) the raw
        # product lands just below the true integer and floor() would
        # shorten the prefix by one — a RECALL bug (a pair whose only
        # shared rare shingle sits at the true boundary is missed). The
        # epsilon only ever lengthens the prefix (more candidates, same
        # verified output), never shortens it.
        index = (ex.join(dfreq, "sgh")
                 .withColumn("rk", F.row_number().over(w))
                 .filter(F.col("rk") <=
                         F.floor((1.0 - threshold) * F.col("n") + 1e-9)
                         + 1)
                 .select("doc_id", "sgh")).persist()
    else:
        index = ex.select("doc_id", "sgh")

    cand = (index.alias("a")
            .join(index.alias("b"), (F.col("a.sgh") == F.col("b.sgh"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("d1"),
                    F.col("b.doc_id").alias("d2"))
            .distinct())

    return _verify_jaccard(cand, sh, threshold)


def _verify_jaccard(cand: DataFrame, sh: DataFrame,
                    threshold: float) -> DataFrame:
    """Exact Jaccard for candidate pairs via full-array intersection."""
    s1 = sh.select(F.col("doc_id").alias("d1"), F.col("s").alias("s1"))
    s2 = sh.select(F.col("doc_id").alias("d2"), F.col("s").alias("s2"))
    inter = F.size(F.array_intersect("s1", "s2"))
    union = F.size("s1") + F.size("s2") - inter
    return (cand.join(s1, "d1").join(s2, "d2")
            .withColumn("jac", inter.cast("double") / union)
            .filter(F.col("jac") >= threshold)
            .select("d1", "d2", "jac")
            .orderBy("d1", "d2"))


# ---------------------------------------------------------------------------
# MinHash-LSH (the 100 TB near-dup path)
# ---------------------------------------------------------------------------


def minhash_band_buckets(sh: DataFrame, num_hashes: int = 128,
                         bands: int = 16) -> DataFrame:
    """(doc_id, band, bh): banded MinHash bucket assignments, one row
    per (doc, band) — (band, bh) is the downstream shuffle key.

    Signature + banding happen in one Arrow-batched kernel: each
    shingle's 64-bit base fingerprint (md5 prefix) is expanded into
    ``num_hashes`` multiply-shift universal hashes (odd multipliers,
    mod 2⁶⁴ — one numpy outer product per batch), column-mins form the
    signature, and each band's ``r`` values are digested to the bucket
    id. An earlier JVM formulation (128 ``min(xxhash64(sg, i))``
    aggregates over the exploded shingles) was 5× slower: >100 agg
    buffers disables whole-stage codegen (spark.sql.codegen.maxFields)
    and the explode+shuffle moves |shingles|·128 values where this
    moves |docs|·bands. The hash family only needs determinism and
    uniformity — the emitted pairs are re-verified with exact Jaccard,
    so the output contract is hash-function-independent."""
    import hashlib as _hl

    import numpy as np
    import pandas as pd

    rows = num_hashes // bands

    # ONE hash family for banding and for full signatures: both draw
    # from module-level minhash_seed, so minhash_signatures' estimates
    # describe exactly the family the band buckets hashed
    mult = np.array([minhash_seed("a", i) | 1 for i in range(num_hashes)],
                    dtype=np.uint64)
    add = np.array([minhash_seed("b", i) for i in range(num_hashes)],
                   dtype=np.uint64)

    def kernel(pdfs):
        # Hybrid after measuring both extremes: the md5 phase is
        # memoized batch-wide (distinct shingles hashed once per task —
        # 3× fewer md5 calls on repeat-heavy corpora, the dedup case),
        # while the multiply-shift product stays PER-DOCUMENT — an
        # (80, 128) uint64 tile lives in L1/L2, whereas the batch-wide
        # (flat, 128) product is memory-bandwidth-bound and measured
        # 3-8× slower (134 MB intermediates; see round-3 microbench).
        cache: dict = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            vals, counts = _flat_base_hashes(pdf["s"], cache)
            ndocs = len(pdf)
            ids = exact_longs(pdf["doc_id"], "doc_id")
            bhs = np.empty(ndocs * bands, dtype=np.int64)
            i = 0
            lo = 0
            for d in range(ndocs):
                base = vals[lo:lo + int(counts[d])]
                lo += int(counts[d])
                sig = (base[:, None] * mult[None, :]
                       + add[None, :]).min(axis=0)  # (num_hashes,)
                for b in range(bands):
                    digest = _hl.md5(
                        sig[b * rows:(b + 1) * rows].tobytes()).digest()
                    bhs[i] = int.from_bytes(digest[:8], "big",
                                            signed=True)
                    i += 1
            yield pd.DataFrame({
                "doc_id": np.repeat(ids.to_numpy(), bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), ndocs),
                "bh": bhs})

    return sh.mapInPandas(kernel, "doc_id long, band int, bh long")


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.8, k: int = 3,
                      num_hashes: int = 128, bands: int = 16,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Near-dup pairs at ``J ≥ threshold`` via banded MinHash-LSH with
    exact verification. Output is identical to :func:`jaccard_pairs`
    whenever every qualifying pair lands in ≥ 1 shared band — with the
    default b=16, r=8 the miss probability at J = 0.8 is
    (1-0.8⁸)¹⁶ ≈ 4%, and ≈ 10⁻¹³ at the J ≈ 0.98 of true near-dups;
    tests/test_pipeline.py checks recall==1.0 against the exact pairs
    on the testdata."""
    # sh feeds the bucket kernel + both verification legs; buckets feed
    # both self-join sides — persist each (LRU-evicted) so the shingle
    # and signature kernels run once, not per branch
    sh = doc_shingles(docs, id_col, text_col, k).persist()
    buckets = minhash_band_buckets(sh, num_hashes, bands).persist()

    cand = (buckets.alias("a")
            .join(buckets.alias("b"),
                  ["band", "bh"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("d1"),
                    F.col("b.doc_id").alias("d2"))
            .distinct())
    return _verify_jaccard(cand, sh, threshold)


def incremental_neardup(docs: DataFrame, delta_pred,
                        threshold: float = 0.8, k: int = 3,
                        num_hashes: int = 128, bands: int = 16,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Incremental near-dup filter: probe a DELTA of newly-arrived
    documents against the HISTORICAL corpus's LSH bucket index and
    report, for every delta document, the history documents it
    near-duplicates at ``J >= threshold`` — the O(delta) admission
    check a production ingest pipeline runs per batch instead of
    re-deduplicating the full corpus (``delta_pred`` is a boolean
    Column marking delta membership; history is its complement).

    Output: (doc_id, dup_of, jac) — delta id, matched history id,
    exact Jaccard — ordered. Delta-internal pairs are NOT emitted
    (they are the next batch's history problem); a delta doc with no
    row is admitted as novel.

    Scale shape: ONE shingle+banding kernel pass over history+delta
    (in production the history bucket table is a persisted index and
    only the delta is hashed — the plan keeps that split visible by
    filtering AFTER the kernel, so either side can be swapped for a
    pre-built table); the probe is a (band, bh) equi-join whose cost
    is Σ_bucket |delta_b|·|hist_b|, never |delta|·|history|; exact
    verification touches only candidate pairs. Recall: identical to
    :func:`minhash_lsh_pairs` — a qualifying pair missing every band
    has probability (1-J^r)^b ≈ 4% at J = 0.8, ≈ 1e-13 for true
    near-dups; the oracle-parity suite checks equality with the exact
    cross-split pair set on the testdata corpus."""
    sh = doc_shingles(docs, id_col, text_col, k).persist()
    flags = docs.select(F.col(id_col).alias("doc_id"),
                        delta_pred.alias("is_delta"))
    buckets = (minhash_band_buckets(sh, num_hashes, bands)
               .join(flags, "doc_id").persist())
    cand = (buckets.filter("is_delta").alias("a")
            .join(buckets.filter("NOT is_delta").alias("b"),
                  ["band", "bh"])
            .select(F.col("a.doc_id").alias("d1"),
                    F.col("b.doc_id").alias("d2"))
            .distinct())
    return (_verify_jaccard(cand, sh, threshold)
            .select(F.col("d1").alias("doc_id"),
                    F.col("d2").alias("dup_of"), "jac")
            .orderBy("doc_id", "dup_of"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
            text_col: str = "text", bits: int = 64) -> DataFrame:
    """doc_id, simhash: 64-bit SimHash over shingle hashes — bit ``j``
    of the fingerprint is the sign of Σ±1 over the document shingles'
    ``j``-th hash bits.

    Computed in one Arrow-batched kernel straight off the shingle
    arrays (md5-prefix base hash, vectorized bit-matrix sum per doc) —
    the earlier explode + 64-conditional-sum aggregate shuffled
    |shingles|×64 values and kept the hot loop in interpreted CASE
    WHEN expressions. The fingerprint family only needs determinism:
    downstream consumes Hamming distances, and the pair quality is
    bounded against the exact-Jaccard truth set in tests."""
    import hashlib as _hl

    import numpy as np
    import pandas as pd

    sh = doc_shingles(docs, id_col, text_col, k)
    jbits = np.arange(bits, dtype=np.uint64)

    def kernel(pdfs):
        # same hybrid as minhash_band_buckets: batch-wide memoized md5
        # (cross-document shingle repeats hashed once per task), per-
        # document bit-matrix sum (cache-resident tile; the batch-wide
        # segment-sum formulation was measured memory-bandwidth-bound)
        cache: dict = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            vals, counts = _flat_base_hashes(pdf["s"], cache)
            ndocs = len(pdf)
            fps = np.empty(ndocs, dtype=np.uint64)
            lo = 0
            for d in range(ndocs):
                base = vals[lo:lo + int(counts[d])]
                lo += int(counts[d])
                pm = (((base[:, None] >> jbits[None, :])
                       & np.uint64(1)).astype(np.int64) * 2 - 1)
                fp_bits = (pm.sum(axis=0) > 0).astype(np.uint64)
                fps[d] = (fp_bits << jbits).sum(dtype=np.uint64)
            yield pd.DataFrame({
                "doc_id": exact_longs(pdf["doc_id"], "doc_id"),
                "simhash": fps.view(np.int64)})

    return sh.mapInPandas(kernel, "doc_id long, simhash long")


def simhash_pairs(docs: DataFrame, max_hamming: int = 6, k: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  blocks: int | None = None) -> DataFrame:
    """Pairs within ``max_hamming`` SimHash bits, found via the
    block-pigeonhole trick: split 64 bits into ``max_hamming+1``
    blocks — any qualifying pair agrees exactly on ≥ 1 block, so the
    block value is the join (shuffle) key. Exact w.r.t. the SimHash
    distance; no crossJoin."""
    nblocks = blocks or (max_hamming + 1)
    # both self-join sides re-run the fingerprint kernel without this
    fps = simhash(docs, k, id_col, text_col).persist()
    width = 64 // nblocks
    block_cols = [
        F.struct(F.lit(i).alias("blk"),
                 # unsigned slice: shift then mask
                 F.shiftrightunsigned("simhash", i * width)
                 .bitwiseAND((1 << width) - 1 if i < nblocks - 1
                             else (1 << (64 - i * width)) - 1)
                 .alias("bv"))
        for i in range(nblocks)]
    blocked = (fps.select("doc_id", "simhash",
                          F.explode(F.array(*block_cols)).alias("x"))
               .select("doc_id", "simhash", "x.blk", "x.bv"))
    a, b = blocked.alias("a"), blocked.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    return (a.join(b, ["blk", "bv"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("d1"),
                    F.col("b.doc_id").alias("d2"),
                    F.bit_count(xor).alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= max_hamming)
            .orderBy("d1", "d2"))


# ---------------------------------------------------------------------------
# Cluster assignment — pairs → canonical document per component
# ---------------------------------------------------------------------------


def connected_components(edges: DataFrame, src: str = "d1",
                         dst: str = "d2",
                         max_iters: int = 25,
                         driver_max_edges: int = 2_000_000) -> DataFrame:
    """(node, component) for every node in ``edges``, where component
    is the MINIMUM node id reachable over the undirected edge set —
    min-label propagation to a fixpoint.

    The edge list is already the DISTILLED graph — near-dup pairs
    after LSH bucketing, orders of magnitude smaller than the corpus
    they came from. When its (deduplicated) size fits comfortably on
    the driver (``driver_max_edges``), a collected union-find resolves
    the closure in O(E·α(E)) with zero extra Spark jobs — replacing
    per-round scheduler overhead that dominates on sparse graphs. This
    is the standard production split: distill distributed, close the
    tiny remainder locally.

    Above the threshold, distributed min-label propagation: each
    iteration is one co-partitioned join (labels ⋈ edges on the node)
    + one min-aggregate — no driver data beyond a single changed count
    per round (the documented O(1)-per-iteration action class, like
    the Lloyd trainer). Converges in O(component diameter) rounds;
    near-dup clusters are shallow (a dup of a dup of a dup...), so 2-3
    rounds in practice, with ``max_iters`` as the lineage bound. For
    adversarial long-chain graphs prefer the large-star/small-star
    O(log n) variant (Kiveris et al. 2014) — not needed for dedup
    workloads, where this formulation does strictly fewer shuffles per
    round. Both paths produce the identical (node, min-reachable-id)
    labeling — asserted against each other in tests.
    """
    both = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .union(edges.select(F.col(dst).alias("a"),
                                F.col(src).alias("b"))))
    both = both.distinct().persist()
    if both.count() <= driver_max_edges:
        try:
            return _cc_driver_union_find(edges.sparkSession, both)
        finally:
            both.unpersist()
    # seed labels with round 1 fused in: label₀(n) = min(n, min
    # neighbor) is exactly one propagation step, computed inside the
    # node-dedup aggregate instead of as a separate join round
    labels = (both.groupBy(F.col("a").alias("node"))
              .agg(F.min(F.least(F.col("a"), F.col("b")))
                   .alias("label"))).persist()
    # Convergence probe: labels only ever DECREASE, so the label sum
    # strictly decreases on any change — one tiny aggregate per round
    # replaces a join+filter+count convergence job.
    prev_sum = None
    try:
        for _ in range(max_iters):
            msgs = (both.join(labels, both.a == labels.node)
                    .select(F.col("b").alias("node"), "label"))
            new = (labels.unionByName(msgs)
                   .groupBy("node").agg(F.min("label").alias("label"))
                   ).persist()
            cur_sum = new.agg(F.sum("label")).collect()[0][0]
            labels.unpersist()
            labels = new
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        # materialize the (small) result, then release the loop frames
        # deterministically — otherwise each invocation parks a cached
        # label frame until the driver GC's ContextCleaner gets to it.
        # The returned frame itself stays persisted (callers consume it
        # immediately; the cleaner reclaims it once unreferenced).
        out = (labels.select("node", F.col("label").alias("component"))
               .persist())
        out.count()
        labels.unpersist()
        return out
    finally:
        both.unpersist()


def _cc_driver_union_find(spark, both: DataFrame) -> DataFrame:
    """Min-label union-find over a collected (a, b) edge frame —
    path-halving find, union roots to the smaller id so the root IS
    the component minimum.

    The edge frame arrives via ONE Arrow ``toPandas`` job: the earlier
    ``toLocalIterator`` drain scheduled a separate job per partition —
    32 sequential ~30 ms job round-trips for a pair set that fits in
    two int64 columns (measured 2.6 s vs 0.17 s at sf0.1,
    tools/decompose_dedup_r12.py; guide §5 — the driver transfer is
    bounded by ``driver_max_edges`` either way)."""
    pdf = both.toPandas()
    edges_a = pdf.iloc[:, 0].tolist()
    edges_b = pdf.iloc[:, 1].tolist()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges_a, edges_b):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    rows = [(n, find(n)) for n in parent]
    return spark.createDataFrame(rows, "node long, component long")


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Full dedup resolution: near-dup ``pairs`` → one canonical doc
    per connected component. Every document gets a row: singletons are
    their own canonical; ``keep`` marks the component minimum (the
    retention policy a training pipeline applies before tokenizing).

    CONTRACT: ``pairs`` must be derived from ``docs`` (as every caller
    in this package does) — cluster sizes are counted over the
    component labeling, so a stale pair set referencing ids absent
    from ``docs`` would inflate ``cluster_size`` and could elect an
    absent id as a cluster's canonical.

    Shuffle story: the corpus is touched ONCE. Cluster sizes come from
    the component labeling alone — every doc absent from ``comp`` is a
    singleton of size 1 by definition — so the per-cluster count runs
    on the distilled (node, component) frame (bounded by 2·|pairs|),
    not the corpus; an earlier formulation grouped the full corpus by
    cluster_id and re-joined, executing the docs subtree twice and
    shuffling it twice. The labeling join is left un-hinted: AQE
    broadcasts the label frame while it is small (the dedup norm) and
    falls back to a shuffle join if a pathological pair set makes it
    large — both correct, only the physical strategy shifts.
    """
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("_csize"))
    lab = comp.join(sizes, "component")
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(lab, F.col("doc_id") == F.col("node"), "left")
            .select("doc_id",
                    F.coalesce("component", "doc_id").alias("cluster_id"),
                    F.coalesce("_csize", F.lit(1)).alias("cluster_size"),
                    (F.col("doc_id")
                     == F.coalesce("component", "doc_id")).alias("keep"))
            .orderBy("doc_id"))


def minhash_seed(tag: str, i: int) -> int:
    """Deterministic 64-bit multiply-shift seed — sha256 of
    ("minhash", tag, i); shared by the Spark kernels and the generated
    SQL twins so both engines draw the identical hash family."""
    import hashlib as _hl
    return int.from_bytes(
        _hl.sha256(f"minhash:{tag}:{i}".encode()).digest()[:8], "big")


def minhash_signatures(sh: DataFrame, num_hashes: int = 128) -> DataFrame:
    """(doc_id, sig): the full ``num_hashes``-component MinHash
    signature per document — same base-fingerprint + multiply-shift
    (mod 2^64) family as :func:`minhash_band_buckets`, minimum taken in
    uint64 order, components emitted reinterpreted as int64 (equality
    comparisons are bijection-safe).

    Scale shape: one Arrow kernel pass over the shingle table; output
    is |docs| rows of fixed ``num_hashes``-long arrays — the sketch a
    signature store would persist for incremental dedup."""
    import numpy as np
    import pandas as pd

    mult = np.array([minhash_seed("a", i) | 1 for i in range(num_hashes)],
                    dtype=np.uint64)
    add = np.array([minhash_seed("b", i) for i in range(num_hashes)],
                   dtype=np.uint64)

    def kernel(pdfs):
        cache: dict = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            vals, counts = _flat_base_hashes(pdf["s"], cache)
            sigs = []
            lo = 0
            for d in range(len(pdf)):
                base = vals[lo:lo + int(counts[d])]
                lo += int(counts[d])
                sig = (base[:, None] * mult[None, :]
                       + add[None, :]).min(axis=0)
                sigs.append(sig.astype(np.int64))
            yield pd.DataFrame(
                {"doc_id": exact_longs(pdf["doc_id"], "doc_id").to_numpy(),
                 "sig": sigs})

    return sh.mapInPandas(kernel, "doc_id long, sig array<long>")


def minhash_jaccard_estimates(docs: DataFrame, threshold: float = 0.5,
                              k: int = 3, num_hashes: int = 128,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Sketch-accuracy audit: for every exact near-pair at
    ``J >= threshold``, the MinHash-ESTIMATED Jaccard (matching
    signature components / num_hashes) next to the exact value —
    the error-accounting row a dedup-threshold tuning run needs.

    The estimate is a rational (int match count over a constant), so
    it replays bit-for-bit; the pair set is the exact
    :func:`jaccard_pairs` output, keeping the oracle independent of
    banding. E[est] = J with sd sqrt(J(1-J)/num_hashes) ~ 0.044 at
    J = 0.5, k = 128.
    """
    sh = doc_shingles(docs, id_col, text_col, k).persist()
    # persist: the pair frame feeds THREE consumers (both signature
    # legs' participant pruning and the final join) — tiny (audit
    # pairs only), so caching it costs nothing and saves re-running
    # the exact jaccard plan per consumer
    pairs = jaccard_pairs(docs, threshold=threshold, k=k,
                          id_col=id_col, text_col=text_col,
                          shingles=sh).persist()
    # r12 (§1.2 don't compute what you throw away): the signature
    # kernel only serves docs that APPEAR in a pair — everything else
    # is dropped by the inner joins below. Semi-join the shingle table
    # down to the participant set (broadcast: bounded by 2·|pairs|)
    # before the Arrow pass, so the kernel's multiply-shift work and
    # both join legs scale with the audit set, not the corpus.
    ids = (pairs.select(F.col("d1").alias("doc_id"))
           .unionByName(pairs.select(F.col("d2").alias("doc_id")))
           .distinct())
    # persist: BOTH pair legs consume the signature kernel — without
    # this the Arrow pass over the shingle table runs twice
    sigs = minhash_signatures(
        sh.join(F.broadcast(ids), "doc_id", "leftsemi"),
        num_hashes).persist()
    s1 = sigs.select(F.col("doc_id").alias("d1"),
                     F.col("sig").alias("sig1"))
    s2 = sigs.select(F.col("doc_id").alias("d2"),
                     F.col("sig").alias("sig2"))
    matches = F.aggregate(
        F.zip_with("sig1", "sig2",
                   lambda a, b: (a == b).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (pairs.join(s1, "d1").join(s2, "d2")
            .withColumn("matches", matches)
            .withColumn("est_jac", F.col("matches").cast("double")
                        / F.lit(float(num_hashes)))
            .select("d1", "d2", "jac", "matches", "est_jac")
            .orderBy("d1", "d2"))


def sorted_neighborhood_pairs(docs: DataFrame, window: int = 4,
                              threshold: float = 0.5, k: int = 3,
                              key_len: int = 40,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Sorted-neighborhood near-dup blocking (Hernandez & Stolfo 1995,
    the merge/purge method): sort the corpus by a blocking key — here
    the first ``key_len`` chars of the normalized text — slide a
    ``window``-row window down the sorted order, and verify only pairs
    that co-occur in some window. The classic alternative to
    LSH/prefix-filter blocking: O(N log N + N*w) candidates, catches
    near-dups whose edits are PAST the key prefix (shared openings),
    and misses pairs whose first edit lands inside it — complementary
    recall to :func:`minhash_lsh_pairs`, which is edit-position-blind.

    Candidate generation is shuffle-friendly: ranks come from
    ``exact_global_rank`` (operators/ranking.py — parallel range
    shuffle + per-partition row_numbers + P-row offsets fold, the
    production SNM shape: no single-task sort anywhere), then each row
    emits (rn, rn+off) for off in [1, window-1] and candidates
    materialize via an EQUI-join on the offset rank (no non-equi/
    BNLJ; the rank equi-join IS the boundary-overlap handoff a
    range-partitioned SNM does by shipping edge rows). Verification
    reuses the exact Jaccard kernel.
    """
    from ..operators.ranking import exact_global_rank

    if window < 2:
        # sequence(rn+1, rn+window-1) DESCENDS when start > stop (the
        # same Spark hazard text_analysis documents for sequence(1,0)),
        # so window<=1 would emit self-probes / duplicated neighbors
        # instead of the correct "no neighborhood" answer: no pairs.
        spark = docs.sparkSession
        return spark.createDataFrame(
            [], "d1 long, d2 long, jac double")

    key = F.substring(F.lower(F.trim(F.col(text_col))), 1, key_len)
    ranked = (exact_global_rank(
        docs.select(F.col(id_col).alias("doc_id"), key.alias("ky")),
        [F.col("ky"), F.col("doc_id")], "rn")
        .select("doc_id", "rn")).persist()
    probes = ranked.select(
        "doc_id",
        F.explode(F.expr(f"sequence(rn + 1, rn + {window - 1})"))
        .alias("rn2"))
    cand = (probes.join(ranked.select(F.col("doc_id").alias("o_id"),
                                      F.col("rn").alias("rn2")), "rn2")
            .select(F.least("doc_id", "o_id").alias("d1"),
                    F.greatest("doc_id", "o_id").alias("d2")))
    sh = doc_shingles(docs, id_col, text_col, k).persist()
    return _verify_jaccard(cand, sh, threshold)


def winnowing_fingerprints(docs: DataFrame, k: int = 3, w: int = 4,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every overlapping ``k``-gram,
    slide a ``w``-window over the hash sequence, and keep each
    window's MINIMUM hash; the distinct kept hashes are the document's
    fingerprint set. Guarantees: any shared run of ``w + k - 1``
    tokens contributes at least one COMMON fingerprint (detection
    floor), and expected density is 2/(w+1) — the index is a fixed
    fraction of the gram stream, which is the whole point vs indexing
    every shingle. Position-aware where MinHash is bag-of-shingles:
    winnowing catches contiguous plagiarized passages, MinHash global
    resemblance.

    Hashes are the 48-bit md5 prefix of the gram (the engine-portable
    integer idiom used across this package), window minima are a plain
    ROWS frame over the dense per-doc position order, and the output
    is distinct (doc_id, fp). Docs with fewer than ``k + w - 1``
    tokens keep the minimum over whatever grams they have (one partial
    window), so short docs still fingerprint.

    Scale shape: narrow gram explode, one per-doc window pass (state =
    ``w`` hashes), distinct on (doc_id, fp) — the fingerprint is the
    downstream shuffle/join key.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(text_col).alias("t"))
    kg = toks.select(
        "doc_id",
        F.explode(F.expr(
            f"CASE WHEN size(t) >= {k} THEN "
            f"transform(sequence(1, size(t) - {k} + 1), "
            f"i -> struct(i AS pos, concat_ws(' ', slice(t, i, {k})) AS g)) "
            f"ELSE array(struct(1 AS pos, concat_ws(' ', t) AS g)) END"))
        .alias("x")) \
        .select("doc_id", F.col("x.pos").alias("pos"),
                F.conv(F.substring(F.md5(F.col("x.g")), 1, 12), 16, 10)
                .cast("long").alias("h"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    n_pos = Window.partitionBy("doc_id")
    sel = (kg.withColumn("np", F.max("pos").over(n_pos))
           .withColumn("wm", F.min("h").over(win))
           # a window must be FULL (or the doc's single partial
           # window starting at pos 1) to select its minimum
           .filter((F.col("pos") + (w - 1) <= F.col("np"))
                   | (F.col("pos") == 1)))
    return sel.select("doc_id", F.col("wm").alias("fp")).distinct()


def winnowing_pairs(docs: DataFrame, k: int = 3, w: int = 4,
                    min_shared: int = 2,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Near-dup candidates by shared winnowing fingerprints: pairs
    (d1 < d2) sharing >= ``min_shared`` fingerprints with the shared
    count — the MOSS match report. The join key is the fingerprint
    (inverted index over the 2/(w+1)-dense fingerprint set, never the
    full shingle set)."""
    # persist: both self-join sides would otherwise re-run the full
    # tokenize/gram/two-window fingerprint pipeline (the same reason
    # jaccard_pairs/simhash_pairs persist their self-joined frames)
    fps = winnowing_fingerprints(docs, k, w, id_col, text_col).persist()
    a = fps.select(F.col("doc_id").alias("d1"), "fp")
    b = fps.select(F.col("doc_id").alias("d2"), "fp")
    return (a.join(b, "fp")
            .filter(F.col("d1") < F.col("d2"))
            .groupBy("d1", "d2")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
            .orderBy("d1", "d2"))


def dedup_keep_policy(docs: DataFrame, pairs: DataFrame,
                      order_col: str = "n_chars",
                      id_col: str = "doc_id") -> DataFrame:
    """Policy-pluggable dedup retention: like :func:`dedup_clusters`
    but the survivor of each near-dup cluster is chosen by a QUALITY
    ordering (``order_col`` desc, id asc) instead of the minimum id —
    production pipelines keep the longest / highest-scoring variant of
    a duplicated document, not an arbitrary one. Same contract as
    dedup_clusters: ``pairs`` must derive from ``docs``.

    Shuffle story: the corpus is touched once (label left-join), then
    one window pass partitioned by cluster_id — per-group state is one
    row, and cluster sizes are near-dup-cluster sized, so no skew
    beyond the pathological all-duplicates corpus (where retention is
    moot anyway)."""
    comp = connected_components(pairs)
    base = (docs.select(F.col(id_col).alias("doc_id"),
                        F.col(order_col))
            .join(comp, F.col("doc_id") == F.col("node"), "left")
            .select("doc_id",
                    F.coalesce("component", "doc_id").alias("cluster_id"),
                    F.col(order_col)))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(order_col).desc(), F.col("doc_id"))
    return (base.withColumn("keep", F.row_number().over(w) == 1)
            .orderBy("doc_id"))
