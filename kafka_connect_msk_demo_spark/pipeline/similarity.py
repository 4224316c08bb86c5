"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine` — pure column expression (``zip_with`` +
  ``aggregate`` fold, JVM-side, no UDF). Arrays are cast to
  ``array<double>`` first so the arithmetic matches an oracle working
  in doubles bit-for-bit.
* :func:`brute_force_topk` — exact top-k for a (small) query set: the
  query side is broadcast, so the "crossJoin" is a map-side nested
  loop over the data partitioning — no shuffle of the big side. This
  is the baseline/oracle path; cost is |Q|·|N|.
* :func:`cosine_dup_pairs_blocked` — exact all-pairs cosine ≥
  threshold (embedding near-dup dedup) as a block-matrix self-join:
  quadratic compute by definition, but distributed as B(B+1)/2
  independent tiles with O(N·B) shuffle and no driver/corpus-sized
  state anywhere. This is the registered plan.
* :func:`cosine_dup_pairs` — the same semantics via driver-collect +
  broadcast; retained ONLY as a validation/test helper (collects the
  corpus to the driver, which caps N).
* :func:`hyperplane_buckets` / :func:`ann_topk` — random-hyperplane
  LSH: ``nbits`` sign bits of dot(v, plane_j) form the bucket id; the
  bucket id is the shuffle key. Queries multiprobe their own bucket
  plus all 1-bit flips, then rerank candidates exactly. At 100 TB the
  per-bucket candidate lists replace the |Q|·|N| scan with
  |Q|·(nbits+1)·E[bucket], tunable via ``nbits``.

The hyperplanes are deterministic (SHA-256-derived signs), so results
are reproducible across sessions and engines.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..arrow_guard import exact_longs

# ---------------------------------------------------------------------------
# Exact cosine
# ---------------------------------------------------------------------------


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential left-fold dot product. With ``dim`` known, unrolled
    into a flat arithmetic expression — whole-stage-codegen'd, ~10×
    faster than the interpreted higher-order ``aggregate`` lambda, and
    the same left-assoc summation order (bit-identical results and
    oracle-reproducible either way)."""
    if dim is not None:
        out = a[0] * b[0]
        for j in range(1, dim):
            out = out + a[j] * b[j]
        return out
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(_dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity of two double-array columns:
    dot/(‖a‖·‖b‖), computed as sequential left-folds (the order an SQL
    oracle reproduces)."""
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


# ---------------------------------------------------------------------------
# Vectorized (Arrow/numpy) exact kernels
#
# The JVM fold/unrolled expressions above are correct but evaluate one
# pair at a time; inside a BroadcastNestedLoopJoin stage the 64-term
# expression is re-evaluated per pair outside whole-stage codegen, which
# measured ~10 µs/pair. The numpy kernels below accumulate SEQUENTIALLY
# OVER THE DIMENSION AXIS (``for j: acc += A[:,j]·B[:,j]``) — the exact
# IEEE-754 rounding order of the left fold — so results stay
# bit-identical to the column expressions and to a SQL oracle's
# sequential ``list_dot_product``, while scoring a whole block of pairs
# per instruction stream.
# ---------------------------------------------------------------------------


# Fixed-point scale for the k-means trainer's order-independent
# partial sums: 2^20 keeps |Σ round(v·S)| < 2^53 for corpora up to
# ~2^32 rows per cell at |v_i| <= 1, so the int64 sum is exact and the
# final double division is a single IEEE op both here and in the
# DuckDB oracle.
_QUANT_SCALE = 1 << 20


def _adaptive_width(spark, n: int, rows_per_task: int = 256) -> int:
    """Kernel-feed partition width derived from the input size (guide
    §2 intro: scale-adaptive, never a constant): one task per
    ``rows_per_task`` rows, capped at the session's parallelism. At
    production corpus sizes this equals ``defaultParallelism``; on
    small inputs it stops paying a Python-worker round trip per
    near-empty partition."""
    par = spark.sparkContext.defaultParallelism
    return max(1, min(par, -(-int(n) // rows_per_task)))


def _np_stack(cells) -> np.ndarray:
    """(n, dim) float64 from an Arrow array column (cells are numpy
    arrays or lists)."""
    return np.stack([np.asarray(c, dtype=np.float64) for c in cells])


def _np_seq_norm(M: np.ndarray) -> np.ndarray:
    acc = M[:, 0] * M[:, 0]
    for j in range(1, M.shape[1]):
        acc = acc + M[:, j] * M[:, j]
    return np.sqrt(acc)


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     dim: int | None = 64) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    ``queries`` must carry (q_id, q_vec). The query matrix is
    broadcast dense (|Q|·dim doubles); each Arrow batch of the
    streamed data side scores a (batch × |Q|) block with the
    sequential-dim-axis numpy kernel (bit-identical to the column-
    expression left fold and to the oracle's ``list_dot_product``)
    and emits only its PER-BATCH top-k per query — exact, because the
    global top-k under the total order (cos desc, vec_id) is a subset
    of every batch's top-k under the same order. The final window
    ranks |tasks|·|Q|·k rows, not |N|·|Q|.

    An earlier formulation (crossJoin(broadcast(q)) + the unrolled
    cosine projection) evaluated three 64-term expressions per pair
    OUTSIDE whole-stage codegen — the BroadcastNestedLoopJoin stage
    falls back to interpreted eval for huge expressions — and
    recomputed both norms per pair; measured 6.9 s vs ~0.9 s for this
    kernel on the sf0.1 sweep."""
    spark = vectors.sparkSession
    qpd = queries.select("q_id", "q_vec").toPandas()
    if not len(qpd):
        # np.stack raises on a zero-length sequence; no queries means
        # an empty result, not a driver-side crash
        return spark.createDataFrame(
            [], "q_id long, vec_id long, cos double, rank int")
    q_ids = exact_longs(qpd["q_id"], "q_id",
                        allow_null=False).to_numpy(np.int64)
    Qm = _np_stack(qpd["q_vec"])
    q_nrm = _np_seq_norm(Qm)
    bc = spark.sparkContext.broadcast((q_ids, Qm, q_nrm))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qid, Q, nq = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = _np_stack(pdf["v"])
            ida = exact_longs(pdf["vec_id"], "vec_id",
                              allow_null=False).to_numpy(np.int64)
            na = _np_seq_norm(A)
            acc = A[:, 0:1] * Q[:, 0][None, :]
            for j in range(1, A.shape[1]):
                acc = acc + A[:, j:j + 1] * Q[:, j][None, :]
            cos = acc / (na[:, None] * nq[None, :])
            outs = []
            for c in range(len(qid)):
                valid = np.flatnonzero(ida != qid[c])
                # batch top-k by the SAME total order as the final
                # window: cos desc, vec_id asc
                order = valid[np.lexsort((ida[valid], -cos[valid, c]))][:k]
                outs.append(pd.DataFrame({
                    "q_id": qid[c], "vec_id": ida[order],
                    "cos": cos[order, c]}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scored = (vectors.select(F.col(id_col).alias("vec_id"),
                             as_double(vec_col).alias("v"))
              # spread the |Q|·|N| scoring loop (single-file sources
              # otherwise run it in one task)
              .repartition(spark.sparkContext.defaultParallelism)
              .mapInPandas(score, "q_id long, vec_id long, cos double"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "vec_id", "cos", "rank")
            .orderBy("q_id", "rank"))


def queries_by_mod(vectors: DataFrame, mod: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Deterministic query subset: every ``mod``-th vector id."""
    return vectors.filter(F.col(id_col) % mod == 0).select(
        F.col(id_col).alias("q_id"), as_double(vec_col).alias("q_vec"))


def cosine_dup_pairs(vectors: DataFrame, threshold: float = 0.45,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact embedding near-dup pairs (d1 < d2, cosine ≥ threshold) —
    VALIDATION/TEST HELPER ONLY, not registered: ``toPandas()``
    collects the whole corpus to the driver before broadcasting, which
    caps N at driver memory. The registered plan is
    :func:`cosine_dup_pairs_blocked` (same semantics, distributed
    block self-join, no driver transfer); this variant remains as the
    independent cross-check the blocked scorer's tests compare against.

    Execution: the build side is broadcast as a dense (N, dim) float64
    matrix (the same driver-mediated movement as the
    ``F.broadcast``-BNLJ it replaces); the streamed side is spread over
    all cores and each Arrow batch scores a (batch × N) block with the
    sequential-axis numpy kernel — bit-identical to the column
    expression, ~50× faster than per-pair evaluation."""
    spark = vectors.sparkSession
    v = vectors.select(F.col(id_col).alias("id"),
                       as_double(vec_col).alias("v"))
    build = v.toPandas()
    ids_b = exact_longs(build["id"], "id",
                        allow_null=False).to_numpy(np.int64)
    M = _np_stack(build["v"])
    nrm_b = _np_seq_norm(M)
    bc = spark.sparkContext.broadcast((ids_b, M, nrm_b))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idb, B, nb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = _np_stack(pdf["v"])
            ida = exact_longs(pdf["id"], "id",
                              allow_null=False).to_numpy(np.int64)
            na = _np_seq_norm(A)
            acc = A[:, 0:1] * B[:, 0][None, :]
            for j in range(1, A.shape[1]):
                acc = acc + A[:, j:j + 1] * B[:, j][None, :]
            cos = acc / (na[:, None] * nb[None, :])
            keep = (ida[:, None] < idb[None, :]) & (cos >= threshold)
            i, k = np.nonzero(keep)
            yield pd.DataFrame({"d1": ida[i], "d2": idb[k],
                                "cos": cos[i, k]})

    # the streamed side MUST be repartitioned: a single-file source
    # otherwise leaves the whole |N|²/2 block loop in one task
    out = (v.repartition(spark.sparkContext.defaultParallelism)
           .mapInPandas(score, "d1 long, d2 long, cos double"))
    return out.orderBy("d1", "d2")


def cosine_dup_pairs_blocked(vectors: DataFrame, threshold: float = 0.45,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             nblocks: int = 8) -> DataFrame:
    """Exact embedding near-dup pairs (d1 < d2, cosine ≥ threshold) as
    a distributed block-matrix self-join — NO corpus-sized driver
    transfer (the flaw that made :func:`cosine_dup_pairs`, which
    ``toPandas()``-collects and broadcasts the whole corpus,
    validation-only).

    Why not LSH as the primary: measured on this corpus, EVERY true
    pair sits in the weak 0.45–0.6 cosine band (sf0.1: 144 pairs, max
    cos 0.60) where the 6-bit × 8-table signature collides with
    per-table probability ≈ 0.08 — the bucketed scorer would miss
    roughly half the pairs. Exact all-pairs semantics at a weak
    threshold require exact candidate generation.

    Shape: vectors land in ``nblocks`` id-hash blocks; each unordered
    block pair (bi ≤ bj) becomes one cogroup task that scores its
    |Bi| × |Bj| tile with the same sequential numpy kernel as the SQL
    oracle's fold (bit-identical doubles). Each row is shuffled
    ``(nblocks+1)/2``× on average — O(N·B) exchange bytes and
    Σ tile² ≈ N²/2 compute spread over B(B+1)/2 independent tasks,
    with per-task memory two blocks, never the corpus. At 100 TB the
    same plan holds: raise ``nblocks`` so two blocks fit an executor;
    no driver or single-executor corpus copy exists anywhere."""
    v = vectors.select(F.col(id_col).alias("id"),
                       as_double(vec_col).alias("v"),
                       (F.pmod(F.xxhash64(F.col(id_col)), nblocks)
                        .cast("int").alias("blk")))
    pairs = [(bi, bj) for bi in range(nblocks)
             for bj in range(bi, nblocks)]
    spark = vectors.sparkSession
    idx = spark.createDataFrame(
        [(bi, bj, bi * nblocks + bj) for bi, bj in pairs],
        "bi int, bj int, bp int")
    # name-based join keys keep the two same-lineage joins unambiguous
    left = (v.withColumnRenamed("blk", "b")
            .join(F.broadcast(idx.selectExpr("bi AS b", "bp")), "b")
            .select("bp", "id", "v"))
    # fresh output names on the right give every attribute a new
    # exprId, or the cogroup trips Spark's ambiguous-self-join check
    right = (v.withColumnRenamed("blk", "b")
             .join(F.broadcast(idx.selectExpr("bj AS b", "bp")), "b")
             .selectExpr("bp AS rbp", "id AS rid", "v AS rv"))
    diag = {bi * nblocks + bi for bi in range(nblocks)}

    def score(key, a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        if not len(a) or not len(b):
            return pd.DataFrame({"d1": pd.Series(dtype="int64"),
                                 "d2": pd.Series(dtype="int64"),
                                 "cos": pd.Series(dtype="float64")})
        A, B = _np_stack(a["v"]), _np_stack(b["rv"])
        ida = exact_longs(a["id"], "id",
                          allow_null=False).to_numpy(np.int64)
        idb = exact_longs(b["rid"], "rid",
                          allow_null=False).to_numpy(np.int64)
        na, nb = _np_seq_norm(A), _np_seq_norm(B)
        acc = A[:, 0:1] * B[:, 0][None, :]
        for j in range(1, A.shape[1]):
            acc = acc + A[:, j:j + 1] * B[:, j][None, :]
        cos = acc / (na[:, None] * nb[None, :])
        if int(key[0]) in diag:
            keep = (ida[:, None] < idb[None, :]) & (cos >= threshold)
        else:
            keep = (ida[:, None] != idb[None, :]) & (cos >= threshold)
        i, k = np.nonzero(keep)
        d1 = np.minimum(ida[i], idb[k])
        d2 = np.maximum(ida[i], idb[k])
        return pd.DataFrame({"d1": d1, "d2": d2, "cos": cos[i, k]})

    out = (left.groupby("bp").cogroup(right.groupby("rbp"))
           .applyInPandas(score, "d1 long, d2 long, cos double"))
    return out.orderBy("d1", "d2")


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the scale path)
# ---------------------------------------------------------------------------


def _plane_signs(table: int, j: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane components (SHA-256 of
    (table, j, i)) — reproducible across sessions/engines."""
    return [1.0 if hashlib.sha256(f"{table}:{j}:{i}".encode()).digest()[0]
            & 1 else -1.0 for i in range(dim)]


def _plane_matrix(tables: int, nbits: int, dim: int) -> np.ndarray:
    """(tables·nbits, dim) stacked deterministic hyperplanes — ONE
    construction shared by every bucketing kernel so the data side,
    query side and the fused top-k kernel cannot drift."""
    return np.stack([
        np.asarray(_plane_signs(t, j, dim), dtype=np.float64)
        for t in range(tables) for j in range(nbits)])


def _bucket_ids(V: np.ndarray, planes: np.ndarray, tables: int,
                nbits: int) -> np.ndarray:
    """(n, tables) int64 bucket ids for a (n, dim) vector block: the
    plane dot products accumulate SEQUENTIALLY over the dimension axis
    (the IEEE left-fold order every cosine kernel in this module uses),
    sign of each dot = one bucket bit."""
    weights = (1 << np.arange(nbits, dtype=np.int64))
    acc = V[:, 0:1] * planes[:, 0][None, :]
    for j in range(1, V.shape[1]):
        acc = acc + V[:, j:j + 1] * planes[:, j][None, :]
    bits = (acc > 0).reshape(len(V), tables, nbits)
    return (bits * weights[None, None, :]).sum(axis=2)  # (n, T)


def lsh_buckets(df: DataFrame, vec_col: str, nbits: int, dim: int,
                tables: int) -> DataFrame:
    """Explode each vector into its (table, bucket) pairs — one row per
    hash table. (table, bucket) is the downstream shuffle key.

    All ``tables × nbits`` plane dot products are computed in one
    vectorized numpy pass per Arrow batch (a (batch, dim) × (dim,
    tables·nbits) product; sign of each dot = one bucket bit). Bucket
    assignment only needs the SIGN to be computed identically on the
    data and query sides — both go through the shared
    :func:`_bucket_ids` kernel."""
    planes = _plane_matrix(tables, nbits, dim)
    in_fields = [f"{f.name} {f.dataType.simpleString()}"
                 for f in df.schema.fields]
    out_schema = ", ".join(in_fields + ["tbl int", "bucket long"])
    cols = [f.name for f in df.schema.fields]
    long_cols = [f.name for f in df.schema.fields
                 if f.dataType.simpleString() == "bigint"]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            for lc in long_cols:
                exact_longs(pdf[lc], lc)
            V = _np_stack(pdf[vec_col])
            buckets = _bucket_ids(V, planes, tables, nbits)
            for t in range(tables):
                out = pdf[cols].copy()
                out["tbl"] = np.int32(t)
                out["bucket"] = buckets[:, t]
                yield out

    return df.mapInPandas(assign, out_schema)


def ann_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
             nbits: int = 6, dim: int = 64, tables: int = 8,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH + 1-bit multiprobe
    candidate generation, exact cosine rerank inside the candidates.

    ``tables`` independent hash tables of ``nbits`` bits each; each
    query probes its own bucket plus all single-bit flips in every
    table. For neighbours at cosine ≈ 0.45 (bit-agreement ≈ 0.65) the
    per-table hit rate with multiprobe is ≈ 0.3, so 8 tables give
    ≈ 95% recall — tests/test_pipeline.py asserts the floor. Tuning
    nbits up / tables down trades recall for candidate volume at
    100 TB.

    Execution is the fused :func:`_lsh_topk` kernel: bucketing, probe
    matching, collision dedup, exact scoring and per-batch top-k all
    happen map-side in one Arrow pass over the data; only
    (q_id, vec_id, cos) rows — |tasks|·|Q|·k of them — reach the final
    rank window. The earlier join-based plan shuffled every candidate
    with BOTH 64-double vectors aboard (~1 KB/row) through the
    collision dedup; at 100 TB that exchange is a multiple of the
    corpus, here it is gone outright (guide §2.3/§2.4/§8)."""
    return _lsh_topk(
        vectors.select(F.col(id_col).alias("vec_id"),
                       as_double(vec_col).alias("v")),
        queries.select("q_id", as_double("q_vec").alias("q_vec")),
        k, nbits, dim, tables, exclude_self=True)


def _lsh_topk(data_src: DataFrame, q_src: DataFrame, k: int,
              nbits: int, dim: int, tables: int, *,
              exclude_self: bool = False,
              different_label: bool = False) -> DataFrame:
    """Fused multi-table LSH + 1-bit-multiprobe top-k: ONE Arrow kernel
    pass over the data side computes bucket ids (shared
    :func:`_bucket_ids` — identical sign bits to ``lsh_buckets``),
    matches them against the broadcast query probe index (own bucket +
    every single-bit flip, built once per task), dedups collisions
    in-batch (each data row lives in exactly one batch, so batch-local
    dedup IS global dedup), scores survivors with the sequential-fold
    cosine (bit-identical to the column-expression left fold and the
    SQL oracle), and emits only each batch's per-query top-k under the
    final total order (cos DESC, vec_id ASC) — exact, because a pair
    beaten by k others globally is beaten by ≥ k in its own batch.

    The serving frames are small by construction: the query matrix is
    |Q|·dim doubles (the join-based predecessor broadcast the same
    vectors (nbits+1)× over inside its probe frame), and the probe
    index |Q|·(nbits+1)·tables longs. For a corpus-scale query set,
    shard ``q_src`` and run the shards as concurrent jobs (guide §2.6)
    — the same bound the predecessor had, minus the candidate
    exchange.

    ``exclude_self`` drops vec_id == q_id pairs (ann_topk);
    ``different_label`` keeps only lbl != q_lbl pairs (hard-negative
    mining; ``data_src`` must then carry ``lbl``, ``q_src``
    ``q_lbl``)."""
    spark = data_src.sparkSession
    qpd = q_src.toPandas()
    if not len(qpd):
        return spark.createDataFrame(
            [], "q_id long, vec_id long, cos double, rank int")
    q_ids = exact_longs(qpd["q_id"], "q_id",
                        allow_null=False).to_numpy(np.int64)
    Qm = _np_stack(qpd["q_vec"])
    q_lbl = qpd["q_lbl"].to_numpy() if different_label else None
    bc = spark.sparkContext.broadcast((q_ids, Qm, q_lbl))
    planes = _plane_matrix(tables, nbits, dim)

    data_cols = ["vec_id", "v"] + (["lbl"] if different_label else [])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qid, Q, qlb = bc.value
        nq = _np_seq_norm(Q)
        QB = _bucket_ids(Q, planes, tables, nbits)
        # probe index, once per task: (table, bucket) -> query indices
        probe: list[dict[int, list[int]]] = []
        for t in range(tables):
            d: dict[int, list[int]] = {}
            for qi in range(len(qid)):
                b0 = int(QB[qi, t])
                for b in (b0, *(b0 ^ (1 << j) for j in range(nbits))):
                    d.setdefault(b, []).append(qi)
            probe.append(d)
        for pdf in batches:
            if not len(pdf):
                continue
            A = _np_stack(pdf["v"])
            ida = exact_longs(pdf["vec_id"], "vec_id",
                              allow_null=False).to_numpy(np.int64)
            lbl = pdf["lbl"].to_numpy() if qlb is not None else None
            na = _np_seq_norm(A)
            DB = _bucket_ids(A, planes, tables, nbits)
            ii: list[int] = []
            qq: list[int] = []
            for i in range(len(A)):
                hits: set[int] = set()
                for t in range(tables):
                    lst = probe[t].get(int(DB[i, t]))
                    if lst:
                        hits.update(lst)
                if hits:
                    ii.extend([i] * len(hits))
                    qq.extend(hits)
            if not ii:
                continue
            i_arr = np.asarray(ii, dtype=np.int64)
            q_arr = np.asarray(qq, dtype=np.int64)
            keep = np.ones(len(i_arr), dtype=bool)
            if exclude_self:
                keep &= ida[i_arr] != qid[q_arr]
            if qlb is not None:
                keep &= lbl[i_arr] != qlb[q_arr]
            i_arr, q_arr = i_arr[keep], q_arr[keep]
            if not len(i_arr):
                continue
            Ai, Qi = A[i_arr], Q[q_arr]
            acc = Ai[:, 0] * Qi[:, 0]
            for j in range(1, Ai.shape[1]):
                acc = acc + Ai[:, j] * Qi[:, j]
            cos = acc / (nq[q_arr] * na[i_arr])
            vid = ida[i_arr]
            # batch-local top-k per query under the FINAL total order
            order = np.lexsort((vid, -cos, q_arr))
            qs = q_arr[order]
            starts = np.r_[0, np.flatnonzero(qs[1:] != qs[:-1]) + 1]
            lens = np.diff(np.r_[starts, len(qs)])
            rank = np.arange(len(qs)) - np.repeat(starts, lens)
            sel = order[rank < k]
            yield pd.DataFrame({"q_id": qid[q_arr[sel]],
                                "vec_id": vid[sel],
                                "cos": cos[sel]})

    scored = (data_src.select(*data_cols)
              .repartition(spark.sparkContext.defaultParallelism)
              .mapInPandas(score, "q_id long, vec_id long, cos double"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "vec_id", "cos", "rank")
            .orderBy("q_id", "rank"))


def _rerank_topk(cand: DataFrame, k: int) -> DataFrame:
    """Exact-cosine rerank + per-query top-k of a candidate frame
    carrying (q_id, q_vec, vec_id, v).

    Scoring runs as a row-wise Arrow kernel accumulating sequentially
    over the dimension axis — the identical IEEE rounding order to the
    column-expression left fold and the oracle's ``list_dot_product``
    (the unrolled 64-term column projection it replaces evaluated
    interpreted, ~10 µs/pair; the kernel scores a whole batch per
    instruction stream).

    The kernel also prunes each batch to its per-query top-``k``
    under the final total order (cos DESC, vec_id ASC) before
    anything is shuffled (r12, §2.3/§2.4 — the `_lsh_topk` argument):
    each candidate row lives in exactly one batch, and a row beaten
    by ≥ k rows globally is beaten by ≥ k rows in its own batch, so
    batch-local pruning never evicts a global winner. The rank window
    then sees at most k·|Q| rows per batch instead of the full
    |Q|·nprobe·N/K candidate volume. NaNs sort FIRST (descending) to
    match Spark's NaN-greatest ordering exactly."""
    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            A = _np_stack(pdf["q_vec"])
            B = _np_stack(pdf["v"])
            acc = A[:, 0] * B[:, 0]
            for j in range(1, A.shape[1]):
                acc = acc + A[:, j] * B[:, j]
            cos = acc / (_np_seq_norm(A) * _np_seq_norm(B))
            out = pd.DataFrame(
                {"q_id": exact_longs(pdf["q_id"], "q_id"),
                 "vec_id": exact_longs(pdf["vec_id"], "vec_id"),
                 "cos": cos})
            out = (out.sort_values(["cos", "vec_id"],
                                   ascending=[False, True],
                                   na_position="first",
                                   kind="mergesort")
                   .groupby("q_id", sort=False).head(k))
            yield out

    scored = (cand.select("q_id", "q_vec", "vec_id", "v")
              .mapInPandas(score, "q_id long, vec_id long, cos double"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "vec_id", "cos", "rank")
            .orderBy("q_id", "rank"))


def cosine_dup_pairs_lsh(vectors: DataFrame, threshold: float = 0.9,
                         nbits: int = 6, dim: int = 64, tables: int = 8,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs at SCALE: LSH buckets generate the
    candidates, exact cosine verifies them — the bucketed replacement
    for :func:`cosine_dup_pairs`' all-pairs scan.

    Two vectors collide when they share a (table, bucket); candidate
    volume is Σ bucket² per table, never |N|². At the true-near-dup
    cosines this targets (≥ 0.9, bit-agreement ≥ 0.85) the default
    6-bit × 8-table config misses a pair with probability
    (1 − 0.85⁶)⁸ ≈ 2 %, and ≈ 10⁻⁵ at cos 0.99 — recall 1.0 on planted
    duplicates is asserted in tests/test_pipeline.py. NOT for mining
    weak correlations (cos ≈ 0.45 ⇒ per-table collision ≈ 0.08): use
    the exact scorer at validation scale for that.

    Shuffle discipline (r11): the self-join and the (d1, d2) dedup
    move BARE id pairs — 16 bytes each — and the vectors join back in
    only for the exact-cosine verify of the deduped survivors. The
    first cut shuffled both 64-double vectors through the collision
    dedup (~1 KB per candidate, ~Σ bucket² of them); at the 10x
    scaling corpus that was 3x the wall-clock of the pair-first plan,
    and at 100 TB it is the difference between shuffling candidate
    KEYS and shuffling a multiple of the corpus."""
    spark = vectors.sparkSession
    v = (vectors.select(F.col(id_col).alias("id"),
                        as_double(vec_col).alias("v"))
         .repartition(spark.sparkContext.defaultParallelism)
         .withColumn("nrm", _norm(F.col("v"), dim))
         .persist())
    # one (tbl, bucket, id) row per table per vector — vector payloads
    # deliberately dropped before the self-join; persisted so the two
    # join sides don't re-run the bucket kernel
    bucketed = (lsh_buckets(v, "v", nbits, dim, tables)
                .select("tbl", "bucket", "id").persist())
    a = bucketed.select("tbl", "bucket", F.col("id").alias("d1"))
    b = bucketed.select("tbl", "bucket", F.col("id").alias("d2"))
    cand = (a.join(b, ["tbl", "bucket"])
            .filter(F.col("d1") < F.col("d2"))
            .select("d1", "d2")
            .dropDuplicates(["d1", "d2"]))
    scored = (cand
              .join(v.select(F.col("id").alias("d1"),
                             F.col("v").alias("v1"),
                             F.col("nrm").alias("n1")), "d1")
              .join(v.select(F.col("id").alias("d2"),
                             F.col("v").alias("v2"),
                             F.col("nrm").alias("n2")), "d2"))
    cos = _dot(F.col("v1"), F.col("v2"), dim) / (F.col("n1") * F.col("n2"))
    out = (scored.withColumn("cos", cos)
           .filter(F.col("cos") >= threshold)
           .select("d1", "d2", "cos")
           .orderBy("d1", "d2"))
    # ADVICE r11: v and bucketed are corpus-sized and were never
    # unpersisted — repeated calls in a long-lived session leaked
    # cached frames (the r11 scaling audit measured a 63s-vs-10s
    # distortion from exactly this). Materialize the result ONCE
    # (persisted — it is O(#near-dup pairs), tiny versus the corpus by
    # the >= 0.9 threshold's design), then drop the big inputs. The
    # caller's action hits the cached result; nothing recomputes.
    out = out.persist()
    out.count()
    v.unpersist()
    bucketed.unpersist()
    return out


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (inverted-file index — the coarse-quantizer scale path)
# ---------------------------------------------------------------------------


def _fold_argmax_cells(A: "np.ndarray", Cm: "np.ndarray",
                       nc: "np.ndarray", na: "np.ndarray") -> "np.ndarray":
    """Row-wise nearest-centroid INDEX (into the c_id-ordered ``Cm``),
    bit-identical to the sequential-fold cosine argmax with the
    (cos DESC, c_id ASC) tie-break — the kmeans trainer's two-pass
    trick, factored out so :func:`ivf_assign`'s vectorized path and
    the trainer cannot drift apart.

    Pass 1 scores every (row, centroid) with one dgemm; a 64-term
    dgemm summation differs from the fold by at most γ₆₄ of ‖a‖‖c‖
    (u = 2⁻⁵³), so post-division orders agree within ~1.5e-14 — any
    row whose top-2 margin exceeds 1e-12 provably shares the fold's
    argmax. Pass 2 re-scores only margin-tied rows with the exact
    fold and the lowest-id tie-break."""
    G = (A @ Cm.T) / (na[:, None] * nc[None, :])
    rows = np.arange(len(G))
    cell = G.argmax(axis=1)
    top1 = G[rows, cell]
    G[rows, cell] = -np.inf
    top2 = G.max(axis=1)
    for r in np.flatnonzero(top1 - top2 <= 1e-12):
        a = A[r]
        acc = a[0] * Cm[:, 0]
        for j in range(1, len(a)):
            acc = acc + a[j] * Cm[:, j]
        cos = acc / (na[r] * nc)
        # lowest c_id wins ties; Cm rows are c_id-ordered
        cell[r] = int(np.flatnonzero(cos == cos.max())[0])
    return cell


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               vec_col: str = "v", out: str = "cell",
               dim: int | None = None,
               vectorized: bool = False) -> DataFrame:
    """Assign each vector to its nearest centroid (highest cosine).

    Centroids are broadcast (K rows); the assignment is a map-side
    K-way scoring + ``max_by`` — one shuffle on the vector id. At scale
    this is the IVF coarse quantizer: the cell id becomes the partition
    / shuffle key for every downstream search.

    ``dim`` defaults to the interpreted fold on purpose: the K-way
    cross join evaluates the cosine K times per row, and unrolling a
    64-term dot into each copy explodes the generated code (measured
    2× slower than the fold here — the opposite of the pair scorers,
    where one unrolled copy per row wins).

    ``vectorized=True`` switches to one Arrow-batched kernel scoring a
    whole batch against the broadcast centroid matrix per instruction
    stream (:func:`_fold_argmax_cells` — the trainer's two-pass exact
    argmax, so the chosen cells are bit-identical to the fold path and
    the SQL oracle). The crossover is the JVM path's K-way expression
    cost: at k ∝ N sizing (``cells_for_corpus``, k in the hundreds+)
    the kernel wins ~an order of magnitude; fixed-k≈16 callers keep
    the JVM path — and their exact physical plan. The kernel collects
    the centroid frame to the driver (K×dim — the JVM path broadcasts
    the same rows), so pass only bounded centroid tables."""
    if vectorized:
        rows_c = centroids.select("c_id", "c_vec").collect()
        if not rows_c:
            # ADVICE r11: np.stack([]) raises an opaque numpy error;
            # surface the actual contract violation instead (the JVM
            # path degrades to an empty cross join, but an empty
            # quantizer is a caller bug either way).
            raise ValueError(
                "ivf_assign(vectorized=True): centroids frame is "
                "empty — the coarse quantizer needs >= 1 centroid")
        order = sorted(range(len(rows_c)), key=lambda i: rows_c[i]["c_id"])
        ids = np.asarray([rows_c[i]["c_id"] for i in order],
                         dtype=np.int64)
        Cm = np.stack([np.asarray(rows_c[i]["c_vec"], dtype=np.float64)
                       for i in order])
        nc = _np_seq_norm(Cm)
        bc = vectors.sparkSession.sparkContext.broadcast((ids, Cm, nc))
        in_fields = [f"{f.name} {f.dataType.simpleString()}"
                     for f in vectors.schema.fields]
        out_schema = ", ".join(in_fields + [f"{out} bigint"])
        cols = [f.name for f in vectors.schema.fields]
        long_cols = [f.name for f in vectors.schema.fields
                     if f.dataType.simpleString() == "bigint"]

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cids, Cmv, ncv = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                for lc in long_cols:
                    exact_longs(pdf[lc], lc)
                A = _np_stack(pdf[vec_col])
                idx = _fold_argmax_cells(A, Cmv, ncv, _np_seq_norm(A))
                outp = pdf[cols].copy()
                outp[out] = cids[idx]
                yield outp

        return vectors.mapInPandas(assign, out_schema)
    # r12 (§1.2 per-task work): hoist the norms out of the K-way
    # scoring. cosine(v, c) re-derived sqrt(dot(v,v)) and
    # sqrt(dot(c,c)) PER (vector, centroid) PAIR — 3 interpreted
    # folds per pair. Computing ‖v‖ once per vector (below the join)
    # and ‖c‖ once per centroid (inside the K-row broadcast) leaves
    # ONE fold per pair; sqrt/multiply/divide on the same operand
    # values in the same order keeps every sim double bit-identical.
    c = (centroids.select(F.col("c_id"), F.col("c_vec"))
         .withColumn("_cnrm", _norm(F.col("c_vec"), dim)))
    keys = [f.name for f in vectors.schema.fields]
    scored = (vectors.withColumn("_vnrm", _norm(F.col(vec_col), dim))
              .crossJoin(F.broadcast(c))
              .withColumn("sim",
                          _dot(F.col(vec_col), F.col("c_vec"), dim)
                          / (F.col("_vnrm") * F.col("_cnrm"))))
    return (scored.groupBy(*keys)
            .agg(F.max_by("c_id", F.struct(F.col("sim"), -F.col("c_id")))
                 .alias(out)))


def deterministic_centroids(vectors: DataFrame, k: int = 16,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """K data points as centroids, chosen deterministically (lowest
    ids) — a seeding equivalent to one k-means|| init round; swap in
    trained centroids for production without touching the index."""
    return (vectors.orderBy(id_col).limit(k)
            .select(F.col(id_col).alias("c_id"),
                    as_double(vec_col).alias("c_vec")))


def cells_for_corpus(n: int, target_cell: int = 128,
                     floor: int = 16) -> int:
    """IVF/SemDeDup cell count PROPORTIONAL to corpus size — the knob
    that keeps the within-cell pair scan linear at scale.

    Σ|cell|² with a FIXED k grows as N²/k: the r10 scaling audit
    measured the registered fixed-k=16 ``semdedup_trained`` at slope
    ~70x over a 10x corpus (tools/scaling_r10.json) — exactly this
    term. SemDeDup at LAION scale (Abbas et al. 2023) sizes k ∝ N
    (50k clusters for ~5B embeddings ≈ 100k per cell) so |cell| stays
    ~target_cell and Σ|cell|² ≈ N·target_cell — linear in N. The
    registered queries keep fixed k because the DuckDB oracle unrolls
    the Lloyd rounds with k as a literal loop bound; production
    callers pass ``n_centroids=cells_for_corpus(df.count())``.
    """
    return max(floor, -(-n // target_cell))


def bits_for_corpus(n: int, target_bucket: int = 100,
                    floor: int = 6, cap: int = 24) -> int:
    """Hyperplane-LSH hash width PROPORTIONAL to log2(corpus size) —
    the ann_topk/multimodal knob that keeps bucket occupancy (and so
    per-query candidate volume) ~target_bucket as N grows.

    With FIXED nbits the expected bucket holds N/2^nbits vectors, so
    candidates per query grow linearly in N — and when the query set
    also grows with the corpus (every mod-th vector), total rerank
    work is ~N²: the r10 scaling audit measured the registered
    fixed-nbits=6 ``multimodal_embed_ann`` at slope ~170x on 10x data
    (tools/scaling_r10.json). Production callers pass
    ``nbits=bits_for_corpus(df.count())``; the r11 ``*_scaled``
    registrations compute it live and their oracles recompute the
    identical value from COUNT(*) — which is why the body is pure
    integer arithmetic (min b with n <= target·2^b, exactly
    ceil(log2(n/target)) but immune to float-log2 ulp error at exact
    powers of two, where ``ceil`` would be one off either way between
    engines).
    """
    if n <= target_bucket:
        return floor
    b = 1
    while (target_bucket << b) < n and b < cap:
        b += 1
    return max(floor, b)


def kmeans_centroids(vectors: DataFrame, k: int = 16, iters: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Lloyd's iterations refining :func:`deterministic_centroids` —
    the IVF coarse-quantizer trainer.

    Per iteration: assign every vector to its nearest centroid
    (broadcast K-way scoring, :func:`ivf_assign`) and recompute each
    cell's mean via ``posexplode`` + one (cell, dim-index) hash
    aggregate — map-side partial sums, a shuffle of K·dim rows. The
    iteration count is a fixed hyperparameter (the classic bounded
    loop), so the lineage stays a finite DAG; each round materializes
    only the K×dim centroid table to the driver for re-broadcast —
    the per-iteration driver traffic is O(K·dim), independent of |N|.

    Per iteration the executors run ONE Arrow-batched kernel that
    assigns each batch to cells (vectorized cosine against the
    broadcast centroid matrix, ties to the lowest centroid id) and
    emits per-cell partial (count, Σ quantized-vec) rows — at most K
    rows per batch; the driver combines the K×partitions partials. No
    per-row shuffle at all, which is also the 1000-executor plan.

    Partial sums are quantized to int64 (coordinate × 2^20, round-
    half-up) BEFORE accumulation, so the result is bit-identical under
    any partitioning, executor count, or combine order — floating-
    point means would drift with partition layout. That makes the
    trained index reproducible across cluster resizes AND exactly
    replayable by a cross-engine SQL oracle (see
    ``_sql_ivf_kmeans_topk``). Empty cells keep their previous
    centroid."""
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    # r13 (guide §2 intro — derive partitioning from input size, not a
    # constant): each training partition costs a Python-worker round
    # trip per iteration, so tiny corpora on wide sessions paid 32
    # near-empty workers per pass (interleaved A/B at sf0.1: 0.45 ->
    # 0.30 s per partials job at width 8). Width = one task per ~256
    # rows, capped at the session parallelism — at production N this
    # IS defaultParallelism, so the cluster plan is unchanged. The
    # int64-quantized partials make the result bit-identical under any
    # width (docstring above); the count is a metadata-only scan job.
    width = _adaptive_width(spark, vectors.count())
    data = (vectors.select(F.col(id_col).alias("vec_id"),
                           as_double(vec_col).alias("v"))
            .repartition(width))
    data = data.persist()
    try:
        cents = [(r["c_id"], list(r["c_vec"])) for r in
                 deterministic_centroids(vectors, k, id_col, vec_col)
                 .collect()]
        for _ in range(iters):
            # centroids ordered by c_id so argmax ties pick the lowest id
            order = sorted(range(len(cents)), key=lambda i: cents[i][0])
            ids = [cents[i][0] for i in order]
            C = np.stack([np.asarray(cents[i][1]) for i in order])
            c_nrm = _np_seq_norm(C)
            bc = spark.sparkContext.broadcast((ids, C, c_nrm))

            def partials(batches):
                cids, Cm, nc = bc.value
                for pdf in batches:
                    if not len(pdf):
                        continue
                    A = _np_stack(pdf["v"])
                    # Assignment must equal the sequential-fold cosine
                    # argmax (ivf_assign / the oracle's _COS_CENT) on
                    # ANY BLAS — the shared two-pass exact argmax
                    # (:func:`_fold_argmax_cells`, rationale there)
                    # guarantees it; ivf_assign's vectorized path uses
                    # the SAME helper so trainer and assigner cannot
                    # drift.
                    cell = _fold_argmax_cells(A, Cm, nc,
                                              _np_seq_norm(A))
                    rows = []
                    for ci in np.unique(cell):
                        # Quantize BEFORE summing: int64 addition is
                        # associative, so the accumulated value is
                        # identical under ANY partition layout or
                        # combine order — the trainer is bit-stable on
                        # a 1000-executor cluster and exactly
                        # replayable by the DuckDB oracle. floor(x*S +
                        # 0.5) is round-half-up in both engines (np
                        # rint would be half-to-even; DuckDB round()
                        # half-away). Error <= 2^-21 per coordinate,
                        # far below centroid noise.
                        sel = np.floor(
                            A[cell == ci] * _QUANT_SCALE + 0.5
                        ).astype(np.int64)
                        rows.append((int(cids[ci]), sel.shape[0],
                                     sel.sum(axis=0).tolist()))
                    yield pd.DataFrame(rows,
                                       columns=["c_id", "n", "qsum"])

            agg = data.mapInPandas(
                partials,
                "c_id long, n long, qsum array<long>").collect()
            # the collect above fully consumed this iteration's plan —
            # release the broadcast blocks now instead of letting
            # `iters` generations pile up until ContextCleaner GC
            bc.unpersist()
            totals: dict[int, tuple[int, np.ndarray]] = {}
            for r in agg:
                n0, s0 = totals.get(
                    r["c_id"], (0, np.zeros(0, dtype=np.int64)))
                q = np.asarray(r["qsum"], dtype=np.int64)
                totals[r["c_id"]] = (
                    n0 + r["n"], q if not s0.size else s0 + q)
            # One IEEE division per coordinate — the same single
            # expression the oracle computes (qs::DOUBLE / (n * S)).
            cents = [(cid,
                      (totals[cid][1]
                       / float(totals[cid][0] * _QUANT_SCALE)).tolist()
                      if cid in totals else vec)
                     for cid, vec in cents]
        return spark.createDataFrame(cents, "c_id long, c_vec array<double>")
    finally:
        data.unpersist()


def _cell_pair_stats(pdf: pd.DataFrame, threshold: float,
                     dim: int) -> pd.DataFrame:
    """Per-cell SemDeDup summary for ONE assigned cell (an
    applyInPandas group): all within-cell pairs d1 < d2 scored, pair
    count and distinct-d2 drop count returned — ONE row out per cell.

    Scoring is the trainer's two-pass exact trick
    (:func:`_fold_argmax_cells` rationale): pass 1 scores every pair
    with a blocked dgemm; a 64-term dgemm summation differs from the
    sequential left fold by ≤ ~3e-14 after the (identical) norm-product
    division, so any pair whose dgemm cosine clears the threshold by
    more than 1e-12 provably passes the fold comparison too (and
    vice versa). Pass 2 re-scores only the ≤1e-12 margin band with the
    exact fold — the decision boundary is bit-identical to the JVM
    ``_dot/(n1·n2) >= threshold`` filter and the SQL oracle.

    Row blocks bound memory at |block|·|cell| doubles, so a
    pathological giant cell degrades gracefully instead of
    materializing |cell|² at once."""
    pdf = pdf.sort_values("vec_id", kind="mergesort")
    cell = int(pdf["cell"].iloc[0])
    A = _np_stack(pdf["v"])
    na = _np_seq_norm(A)
    m = len(A)
    n_pairs = 0
    dropped = np.zeros(m, dtype=bool)
    blk = 2048
    cols = np.arange(m)[None, :]
    for s in range(0, m, blk):
        e = min(s + blk, m)
        G = (A[s:e] @ A.T) / (na[s:e, None] * na[None, :])
        ut = cols > np.arange(s, e)[:, None]  # strict upper triangle
        band = ut & (np.abs(G - threshold) <= 1e-12)
        if band.any():
            bi, bj = np.nonzero(band)
            Ai, Aj = A[s + bi], A[bj]
            acc = Ai[:, 0] * Aj[:, 0]
            for d in range(1, dim):
                acc = acc + Ai[:, d] * Aj[:, d]
            exact = acc / (na[s + bi] * na[bj])
            G[band] = np.where(exact >= threshold,
                               threshold + 1.0, threshold - 1.0)
        hit = ut & (G >= threshold)
        n_pairs += int(hit.sum())
        dropped |= hit.any(axis=0)
    return pd.DataFrame({"cell": [cell], "n_members": [m],
                         "n_dup_pairs": [n_pairs],
                         "n_dropped": [int(dropped.sum())]})


def semantic_dedup_stats(vectors: DataFrame, threshold: float = 0.4,
                         n_centroids: int = 16,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         dim: int = 64,
                         centroids: DataFrame | None = None,
                         assign_vectorized: bool = False,
                         pairs_vectorized: bool = False) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster embeddings with the IVF coarse quantizer, then search for
    near-duplicates ONLY within each cluster — keeping the lowest id
    of every near-dup pair and dropping the rest.

    Per-cell summary output: (cell, n_members, n_dup_pairs,
    n_dropped). The within-cell pair scan costs Σ |cell|² instead of
    |N|² — the cluster id is the shuffle key, exactly the trick that
    makes semantic dedup tractable on a 100 TB embedding corpus (the
    paper runs it on LAION-440M this way). With a trained quantizer
    (:func:`kmeans_centroids`) cells track the data distribution;
    the deterministic seed default keeps the whole operator exactly
    replayable by the SQL oracle.

    A vector is dropped when some LOWER-id member of the same cell has
    cosine ≥ threshold with it — the same keep-lowest convention as
    the MinHash/SimHash dedup family (`pipeline/dedup.py`).

    ``pairs_vectorized=True`` (r12, guide §2.3/§2.4/§4.2) fuses the
    within-cell pair scan into ONE per-cell Arrow kernel
    (:func:`_cell_pair_stats`): the assigned frame shuffles ONCE on
    the cell key and only (cell, n_members, n_dup_pairs, n_dropped)
    rows come back — the join-based formulation exchanged the full
    vector payload TWICE (both join sides), materialized Σ|cell|²
    pair rows, and evaluated the 64-term fold per pair in codegen.
    The kernel's threshold decision is bit-identical to the JVM
    filter (two-pass exact margin re-score, see the kernel
    docstring); asserted path-vs-path in tests. Fixed-plan callers
    (``semdedup_scaled``'s contract-pinned Python-free plan) keep the
    default JVM path.
    """
    cents = centroids if centroids is not None else \
        deterministic_centroids(vectors, n_centroids, id_col, vec_col)
    spark = vectors.sparkSession
    asg = ivf_assign(
        vectors.select(F.col(id_col).alias("vec_id"),
                       as_double(vec_col).alias("v"))
        .repartition(spark.sparkContext.defaultParallelism),
        cents, vec_col="v", vectorized=assign_vectorized)
    if pairs_vectorized:
        return (asg.groupBy("cell")
                .applyInPandas(
                    lambda pdf: _cell_pair_stats(pdf, threshold, dim),
                    "cell long, n_members long, n_dup_pairs long, "
                    "n_dropped long")
                .orderBy("cell"))
    data = asg.withColumn("nrm", _norm(F.col("v"), dim)).persist()
    a = data.select("cell", F.col("vec_id").alias("d1"),
                    F.col("v").alias("v1"), F.col("nrm").alias("n1"))
    b = data.select("cell", F.col("vec_id").alias("d2"),
                    F.col("v").alias("v2"), F.col("nrm").alias("n2"))
    cos = _dot(F.col("v1"), F.col("v2"), dim) / (F.col("n1") * F.col("n2"))
    pairs = (a.join(b, "cell")
             .filter(F.col("d1") < F.col("d2"))
             .withColumn("cos", cos)
             .filter(F.col("cos") >= threshold))
    pair_stats = pairs.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_dup_pairs"),
        F.countDistinct("d2").alias("n_dropped"))
    members = data.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"))
    return (members.join(pair_stats, "cell", "left")
            .select("cell", "n_members",
                    F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
                    F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"))
            .orderBy("cell"))


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
             n_centroids: int = 16, nprobe: int = 6,
             id_col: str = "vec_id",
             vec_col: str = "embedding",
             centroids: DataFrame | None = None) -> DataFrame:
    """Approximate top-k via an inverted-file index: vectors are
    bucketed by nearest centroid; each query probes its ``nprobe``
    closest cells and reranks those candidates exactly.

    Candidate volume ≈ |Q| · nprobe · N/K — the (cell) join key is the
    shuffle key, nothing quadratic. Recall floor vs the exact brute
    force is asserted in tests/test_pipeline.py. Note the testdata's
    UNIFORM random vectors are IVF's worst case (neighbours spread
    across many cells — ~0.66 recall at nprobe=6); clustered real
    embedding corpora concentrate neighbours in few cells, which is
    what makes IVF the standard production index.

    ``centroids`` plugs in a trained quantizer (e.g.
    :func:`kmeans_centroids`); default is the deterministic seed."""
    cents = centroids if centroids is not None else \
        deterministic_centroids(vectors, n_centroids, id_col, vec_col)
    data = ivf_assign(
        vectors.select(F.col(id_col).alias("vec_id"),
                       as_double(vec_col).alias("v"))
        .repartition(vectors.sparkSession.sparkContext.defaultParallelism),
        cents, vec_col="v")
    # query side: nprobe nearest cells each (norms hoisted per side —
    # same rationale and bit-identity argument as ivf_assign's JVM path)
    qscored = (queries.withColumn("_qnrm", _norm(F.col("q_vec")))
               .crossJoin(F.broadcast(
                   cents.withColumn("_cnrm", _norm(F.col("c_vec")))))
               .withColumn("sim",
                           _dot(F.col("q_vec"), F.col("c_vec"))
                           / (F.col("_qnrm") * F.col("_cnrm"))))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), "c_id")
    probes = (qscored.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= nprobe)
              .select("q_id", "q_vec", F.col("c_id").alias("cell")))
    cand = (data.join(F.broadcast(probes), "cell")
            .filter(F.col("vec_id") != F.col("q_id")))
    return _rerank_topk(cand, k)


def embedding_dim_stats(vecs: DataFrame, vec_col: str = "embedding",
                        quant: int = 1_000_000) -> DataFrame:
    """Per-dimension embedding statistics — the normalization /
    drift-audit pass before standardizing or indexing a vector corpus:
    for each dimension, the vector count, the quantized-exact mean,
    and the raw min/max.

    Mean exactness: elements are quantized ``floor(double(v) * quant)``
    to int64 (float32 -> double is exact; the double multiply is one
    correctly-rounded op identical on any IEEE engine), summed as
    integers (order-independent), and divided back out in one fixed
    double-op sequence — no float accumulation anywhere, so the result
    hash-matches cross-engine. int64 headroom: unit-scale embeddings
    at quant=1e6 overflow only past ~9e12 vectors per dimension.

    Scale shape: posexplode is a narrow, scan-speed row multiply
    (x dim_count); the aggregate is a partial/final hash-agg keyed by
    the dimension index — at most ``dims`` rows per partition cross
    the wire. No UDFs, no driver state.
    """
    ex = vecs.select(F.posexplode(vec_col).alias("pos", "v"))
    d = (ex.withColumn("dim", (F.col("pos") + 1).cast("int"))
         .withColumn("vd", F.col("v").cast("double"))
         .withColumn("v_q", F.floor(F.col("vd") * F.lit(float(quant)))
                     .cast("long")))
    return (d.groupBy("dim")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("v_q").alias("sum_q"),
                 F.min("vd").alias("v_min"),
                 F.max("vd").alias("v_max"))
            .withColumn("mean_q",
                        (F.col("sum_q").cast("double") / F.col("n"))
                        / F.lit(float(quant)))
            .select("dim", "n", "sum_q", "mean_q", "v_min", "v_max")
            .orderBy("dim"))


def hard_negative_topk(vectors: DataFrame, k: int = 5, nbits: int = 6,
                       dim: int = 64, tables: int = 8, mod: int = 20,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive training: for every query
    vector (the deterministic ``id % mod == 0`` subset), the top-k
    most-cosine-similar vectors whose label DIFFERS from the query's —
    the near-misses a metric-learning loss needs.

    Same multi-table hyperplane LSH + 1-bit multiprobe candidate
    generation as :func:`ann_topk` (deterministic SHA planes, nothing
    quadratic); the label constraint is applied to candidates BEFORE
    the rank window, so the k survivors are the best different-label
    matches, not a post-filtered rump. Self-matches fall out for free
    (same label). Fully oracle-replayable for the same reason ann_topk
    is — it shares the fused :func:`_lsh_topk` kernel with ann_topk
    verbatim, plus the label constraint.
    """
    data_src = vectors.select(F.col(id_col).alias("vec_id"),
                              as_double(vec_col).alias("v"),
                              F.col(label_col).alias("lbl"))
    q_src = vectors.filter(F.col(id_col) % mod == 0).select(
        F.col(id_col).alias("q_id"),
        as_double(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_lbl"))
    return _lsh_topk(data_src, q_src, k, nbits, dim, tables,
                     different_label=True)


def label_centroid_similarity(vecs: DataFrame, quant: int = 1 << 20,
                              label_col: str = "label",
                              vec_col: str = "embedding") -> DataFrame:
    """Pairwise cosine similarity between per-label CENTROID
    embeddings — the class-confusion audit of an embedding space (two
    labels whose centroids nearly coincide are what a probe classifier
    will mix up; retrieval pipelines use the same matrix to pick hard
    negative classes).

    Exactness: cosine(μ_a, μ_b) is scale-invariant, so the vector
    counts cancel and the centroid dot products can be computed on the
    per-label SUM vectors directly — and those sums are exact int64
    over ``round(double(v)·2^20)`` quantized elements (float32→double
    exact, one correctly-rounded multiply, round-half-away identical in
    both engines; headroom ~8·10^12 unit-scale vectors per label).
    Sum-vector dot products run in DECIMAL(19,0)×(19,0)→(38,0) —
    exact — and the final ``dot / (sqrt(naa)·sqrt(nbb))`` is a fixed
    three-op double sequence, correctly rounded at every step, so the
    matrix hash-matches the DuckDB oracle bit for bit.

    Scale shape: ONE heavy stage — posexplode (scan-speed row
    multiply × dims) into a partial/final hash-agg keyed by
    (label, dim), shipping at most |labels|·dims partial rows per
    partition. Everything after operates on the |labels|·dims sum
    table (tiny by construction: label sets are enum-sized), pairing
    via a broadcast self-join on the dimension index. No N² over
    vectors, no UDFs, no driver math.
    """
    ex = vecs.select(F.col(label_col).alias("lbl"),
                     F.posexplode(vec_col).alias("pos", "v"))
    qv = F.round(F.col("v").cast("double") * F.lit(float(quant))) \
        .cast("long")
    s = (ex.withColumn("qv", qv)
         .groupBy("lbl", "pos").agg(F.sum("qv").alias("sv")))
    a = s.select(F.col("lbl").alias("la"), "pos",
                 F.col("sv").alias("sa"))
    b = s.select(F.col("lbl").alias("lb"), F.col("pos").alias("pos_b"),
                 F.col("sv").alias("sb"))
    dec19 = "decimal(19,0)"
    dots = (a.join(F.broadcast(b),
                   (F.col("pos") == F.col("pos_b"))
                   & (F.col("la") <= F.col("lb")))
            .groupBy("la", "lb")
            .agg(F.sum(F.col("sa").cast(dec19)
                       * F.col("sb").cast(dec19)).alias("dot")))
    na = dots.filter(F.col("la") == F.col("lb")) \
        .select(F.col("la").alias("n_la"), F.col("dot").alias("naa"))
    nb = dots.filter(F.col("la") == F.col("lb")) \
        .select(F.col("lb").alias("n_lb"), F.col("dot").alias("nbb"))
    cos = (F.col("dot").cast("double")
           / (F.sqrt(F.col("naa").cast("double"))
              * F.sqrt(F.col("nbb").cast("double"))))
    return (dots.filter(F.col("la") < F.col("lb"))
            .join(F.broadcast(na), F.col("la") == F.col("n_la"))
            .join(F.broadcast(nb), F.col("lb") == F.col("n_lb"))
            .select(F.col("la").alias("label_a"),
                    F.col("lb").alias("label_b"),
                    cos.alias("cosine"))
            .orderBy("label_a", "label_b"))


def pca_power_topk(vecs: DataFrame, k: int = 25, dims: int = 16,
                   iters: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Top-``k`` vectors by |projection| onto the corpus's FIRST
    PRINCIPAL COMPONENT, trained distributedly by power iteration on
    the exact centered scatter matrix — the "dominant direction" audit
    of an embedding space (the vectors a whitening or de-biasing pass
    would touch first), and the generalization of the
    :func:`kmeans_centroids` pattern to a second iterative trainer
    with an exactly-replayable oracle.

    Exactness pipeline (every step engine-replayable, see
    ``_sql_pca_power_topk``):

    1. elements quantize to ``floor(v·2^14 + 0.5)`` int64 over the
       first ``dims`` coordinates;
    2. first/second moments accumulate exactly (decimal / hugeint);
       the CENTERED scatter ``C = n·S₂ − S₁S₁ᵀ`` is computed in exact
       integers — scaling by n merely scales eigenvalues, so no
       division ever enters the trainer;
    3. each power step is an exact integer matvec ``w = C·v`` followed
       by an L∞ re-quantization ``v' = floor(w/‖w‖∞ · 2^10 + 0.5)``
       whose three double ops are correctly rounded and identically
       ordered on both engines (``m = 0`` keeps the previous vector,
       mirrored); the constant seed v₀ = 2^10·1 is deterministic;
    4. the final projection ``Σ qᵢ·wᵢ`` is an exact ≤ 2^27 integer per
       vector — sorted by |proj| with the id tiebreak.

    Integer headroom: |q| < 2^13.1, so S₂ entries ≤ n·2^26 and matvec
    terms ≤ n²·2^26·2^10·dims — under the 1.7e38 hugeint/decimal(38)
    ceiling for corpora to ~10^12 vectors (document and shrink the
    vector quantum for more).

    Scale shape: the moments are ONE self equi-join on the vector id
    (16 rows a side per vector, shuffle key = id) into a (dims²)-cell
    hash-agg; the trainer then runs on the DRIVER over dims² exact
    ints — O(dims²) traffic ONCE, no per-iteration cluster round-trip
    at all (cheaper than Lloyd's per-iteration partials); the final
    projection is a scan-speed narrow map with the trained component
    inlined as literals. At 100 TB nothing but the two scans and one
    bounded join touches the data.
    """
    import math

    arr = F.slice(as_double(vec_col), 1, dims)
    src = vecs.filter(F.size(F.col(vec_col)) >= dims)
    ex = (src.select(F.col(id_col).alias("vid"),
                     F.posexplode(arr).alias("pos", "v"))
          .withColumn("q", F.floor(F.col("v") * F.lit(16384.0)
                                   + F.lit(0.5)).cast("long")))
    # both moment jobs read the exploded frame — persist it so the
    # source is scanned once for the trainer, not once per job
    ex = ex.persist()
    try:
        mom1 = (ex.groupBy("pos")
                .agg(F.sum(F.col("q").cast("decimal(38,0)")).alias("s"),
                     F.count(F.lit(1)).alias("n")).collect())
        a = ex.select(F.col("vid"), F.col("pos").alias("i"),
                      F.col("q").alias("qa"))
        b = ex.select(F.col("vid"), F.col("pos").alias("j"),
                      F.col("q").alias("qb"))
        mom2 = (a.join(b, "vid")
                .groupBy("i", "j")
                .agg(F.sum((F.col("qa") * F.col("qb"))
                           .cast("decimal(38,0)")).alias("s2")).collect())
    finally:
        ex.unpersist()
    n = int(mom1[0]["n"]) if mom1 else 0
    s1 = {int(r["pos"]): int(r["s"]) for r in mom1}
    s2 = {(int(r["i"]), int(r["j"])): int(r["s2"]) for r in mom2}
    C = [[n * s2.get((i, j), 0) - s1.get(i, 0) * s1.get(j, 0)
          for j in range(dims)] for i in range(dims)]
    v = [1024] * dims
    for _ in range(iters):
        w = [sum(C[i][j] * v[j] for j in range(dims))
             for i in range(dims)]
        wd = [float(x) for x in w]
        m = max(abs(x) for x in wd)
        if m != 0.0:
            v = [math.floor(x / m * 1024.0 + 0.5) for x in wd]
    el = [F.floor(F.element_at(arr, i + 1) * F.lit(16384.0)
                  + F.lit(0.5)).cast("long") * F.lit(v[i])
          for i in range(dims)]
    proj_q = el[0]
    for term in el[1:]:
        proj_q = proj_q + term
    return (src.select(F.col(id_col), F.col(label_col),
                       proj_q.alias("proj_q"))
            .withColumn("proj", F.col("proj_q").cast("double")
                        / F.lit(16777216.0))
            .orderBy(F.abs(F.col("proj_q")).desc(), id_col)
            .limit(k))


def _sql_pca_power_topk(k: int = 25, dims: int = 16,
                        iters: int = 8) -> str:
    """DuckDB twin of :func:`pca_power_topk`: the power iteration
    unrolled as CTE triples (matvec, L∞ norm, requantize) over the
    same exact integer scatter — hugeint on the oracle side, Python
    ints on the driver, equal wherever both are exact."""
    steps = []
    prev = "v0"
    for t in range(1, iters + 1):
        steps.append(f"""w{t} AS MATERIALIZED (
  SELECT cov.i AS i, SUM(cov.c * {prev}.v) AS w
  FROM cov JOIN {prev} ON {prev}.i = cov.j GROUP BY 1
), m{t} AS MATERIALIZED (
  SELECT MAX(abs(CAST(w AS DOUBLE))) AS m FROM w{t}
), v{t} AS MATERIALIZED (
  SELECT w{t}.i AS i,
         CASE WHEN m{t}.m = 0 THEN {prev}.v
              ELSE CAST(floor(CAST(w{t}.w AS DOUBLE) / m{t}.m * 1024.0
                              + 0.5) AS HUGEINT) END AS v
  FROM w{t} JOIN {prev} ON {prev}.i = w{t}.i CROSS JOIN m{t}
)""")
        prev = f"v{t}"
    chain = ",\n".join(steps)
    return f"""
WITH base AS (
  SELECT vec_id, label, embedding AS e,
         unnest(range({dims})) AS pos
  FROM embeddings WHERE len(embedding) >= {dims}
), ex AS MATERIALIZED (
  SELECT vec_id, pos,
         CAST(floor(CAST(e[pos + 1] AS DOUBLE) * 16384.0 + 0.5)
              AS BIGINT) AS q
  FROM base
), mom1 AS (
  SELECT pos AS i, SUM(q) AS s, COUNT(*) AS n FROM ex GROUP BY 1
), mom2 AS MATERIALIZED (
  SELECT a.pos AS i, b.pos AS j, SUM(a.q * b.q) AS s2
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY 1, 2
), cov AS MATERIALIZED (
  SELECT mom2.i AS i, mom2.j AS j,
         si.n * mom2.s2 - si.s * sj.s AS c
  FROM mom2
  JOIN mom1 si ON si.i = mom2.i
  JOIN mom1 sj ON sj.i = mom2.j
), v0 AS (
  SELECT i, CAST(1024 AS HUGEINT) AS v FROM mom1
),
{chain},
proj AS (
  SELECT ex.vec_id, CAST(SUM(ex.q * {prev}.v) AS BIGINT) AS proj_q
  FROM ex JOIN {prev} ON {prev}.i = ex.pos GROUP BY 1
)
SELECT p.vec_id, emb.label, p.proj_q,
       CAST(p.proj_q AS DOUBLE) / 16777216.0 AS proj
FROM proj p JOIN embeddings emb ON emb.vec_id = p.vec_id
ORDER BY abs(p.proj_q) DESC, p.vec_id LIMIT {k}
"""
