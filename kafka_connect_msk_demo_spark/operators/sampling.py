"""Deterministic (content-stable) sampling for training-data pipelines.

``df.sample()`` draws from a per-partition RNG: membership changes with
partitioning, retries, and engine — unusable for reproducible corpus
construction or train/eval splits. The samplers here decide membership
as a PURE FUNCTION of a key column: hash the (salt, key) pair and keep
the row when the hash falls below ``fraction`` of the hash space.

Properties that matter at 100 TB:

* membership is stable across runs, partition layouts, and engines —
  the same row set comes back after a cluster resize or a backfill;
* no shuffle and no RNG state: the predicate is a scalar expression
  evaluated inside the scan's whole-stage-codegen pipeline, and it
  pushes down like any other filter;
* disjoint salts give independent samples (e.g. ``salt="train"`` vs
  ``salt="eval"`` for leak-free splits);
* SQL-expressible: the md5-hex comparison replays in any engine, so
  sampled queries stay oracle-checkable (lowercase-hex string order ==
  numeric order of the 128-bit hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _threshold_hex(fraction: float) -> str:
    """32-hex-char threshold such that P(md5_hex < threshold) ==
    fraction under a uniform hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        # any hex digest sorts below 'g'; the naive formula would emit
        # a 33-char string that '7...' digests sort ABOVE, dropping rows
        return "g"
    return format(int(fraction * (16 ** 32)), "032x")


def sample_hash(key_col: str | Column, fraction: float,
                salt: str = "sample") -> Column:
    """Boolean membership predicate: md5(salt:key) below ``fraction``
    of the hash space."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    digest = F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string")))
    return digest < F.lit(_threshold_hex(fraction))


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: str = "sample") -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, keyed on ``key_col``."""
    return df.filter(sample_hash(key_col, fraction, salt))


def stratified_hash_sample(df: DataFrame, strata_col: str,
                           fractions: dict[str, float], key_col: str,
                           salt: str = "sample",
                           default: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. downsample the dominant
    language while keeping the long tail, the standard corpus-balancing
    move. Strata not named in ``fractions`` get ``default``."""
    c = F.col(key_col)
    digest = F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string")))
    thr: Column = F.lit(_threshold_hex(default))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(_threshold_hex(frac))).otherwise(thr)
    return df.filter(digest < thr)


def weighted_hash_sample(df: DataFrame, key_col: str,
                         weight: Column, salt: str = "sample") -> DataFrame:
    """Deterministic sampling with a PER-ROW keep probability: keep the
    row when the first 8 hex chars of md5(salt:key) — 32 uniform bits —
    fall below ``weight`` (a [0, 1] Column, e.g. a quality score or a
    length ramp). Same engine-portable determinism as
    :func:`hash_sample`: the comparison is string-vs-string on
    fixed-width lowercase hex (``format_string('%08x', ...)`` /
    ``printf`` in SQL), so oracle replays stay exact, and the predicate
    still evaluates inside the scan.

    The weight→threshold mapping floors to 1/2³² granularity —
    documents with weight < 2⁻³² never qualify and weight >= 1 always
    does (the threshold hex then exceeds every 8-char digest prefix).
    """
    c = F.col(key_col)
    digest8 = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 8)
    # clamp BELOW as well: format_string('%08x', negativeLong) would
    # emit a 16-char two's-complement string every digest prefix sorts
    # under, silently keeping ALL rows a negative weight should drop
    w = F.greatest(weight, F.lit(0.0))
    thr = F.when(w >= 1.0, F.lit("g")).otherwise(
        F.format_string(
            "%08x", F.floor(w * F.lit(float(2 ** 32))).cast("long")))
    return df.filter(digest8 < thr)


def mixture_hash_sample(df: DataFrame, strata_col: str, key_col: str,
                        targets: dict[str, int], default: int = 0,
                        salt: str = "mix") -> DataFrame:
    """Deterministic mixture construction: sample each stratum down to
    an expected TARGET COUNT (``targets[stratum]`` rows), the way a
    pretraining mixture pins per-source token budgets (e.g. 3 parts
    web, 1 part code) regardless of how skewed the raw crawl is.

    The per-stratum rate ``min(1, target / n_stratum)`` is computed
    IN-PLAN: one hash-aggregate for stratum counts (tiny — one row per
    stratum), broadcast back, then the same hash-threshold predicate as
    :func:`weighted_hash_sample`. No collect, no RNG; membership stays
    a pure function of (salt, key), so upsizing the corpus keeps every
    previously-sampled row whose stratum rate did not tighten.
    """
    counts = (df.groupBy(strata_col)
              .agg(F.count(F.lit(1)).alias("_n_stratum")))
    tgt: Column = F.lit(default)
    for stratum, t in sorted(targets.items()):
        tgt = F.when(F.col(strata_col) == stratum,
                     F.lit(t)).otherwise(tgt)
    rate = F.least(tgt.cast("double") / F.col("_n_stratum"),
                   F.lit(1.0))
    joined = (df.join(F.broadcast(counts), strata_col)
              .withColumn("_rate", rate))
    return (weighted_hash_sample(joined, key_col, F.col("_rate"),
                                 salt=salt)
            .drop("_n_stratum", "_rate"))


def kfold_assign(df: DataFrame, key_col: str, k: int = 5,
                 salt: str = "fold") -> DataFrame:
    """Deterministic k-fold assignment for train/eval splits: fold =
    48-bit md5 prefix of (salt, key) mod ``k``. Like every sampler
    here, membership is a pure function of the key — folds are stable
    across runs, partitionings, and engines, folds from different
    salts are independent, and the expression evaluates inside the
    scan (no shuffle). Adds an ``int`` column ``fold`` in [0, k)."""
    c = F.col(key_col)
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 12),
        16, 10).cast("long")
    return df.withColumn("fold", F.pmod(h, F.lit(k)).cast("int"))


def temperature_quota_sample(df: DataFrame, strata_col: str,
                             key_col: str, budget: int,
                             salt: str = "temp") -> DataFrame:
    """Temperature-scaled mixture sampling at alpha = 1/2 — the
    multilingual-pretraining rebalance (T5 / mBERT style): stratum s
    receives a share of the ``budget`` proportional to ``n_s**alpha``,
    upweighting tail strata relative to raw proportions without letting
    the head dominate. Unlike :func:`mixture_hash_sample` (expected
    counts via a rate threshold), quotas here are EXACT row counts:

        quota_s = budget * isqrt(n_s) // sum_t isqrt(n_t)

    kept entirely in int64 — ``isqrt`` is ``floor(sqrt(n))`` via the
    IEEE-754 correctly-rounded double sqrt, which cannot cross an
    integer boundary for n < 2^52 (the nearest non-square sqrt sits
    >= 1/(2*sqrt(n)) from an integer, orders of magnitude beyond a
    half-ulp), so both engines compute identical quotas with no
    float-sum order dependence. Alpha values other than 1/2 need
    ``pow``, whose libm rounding is NOT engine-portable — the sqrt
    point on the temperature curve is the one that stays exact.

    Membership: rank rows within each stratum by md5(salt:key) (a
    deterministic uniform permutation) and keep rank <= quota. One
    tiny per-stratum count aggregate broadcast back, one window rank
    per stratum. At 100 TB the head stratum's window is the skew
    point; since only quota_s survivors matter, pre-filter with the
    rate threshold ``(quota_s + slack) / n_s`` (the
    :func:`weighted_hash_sample` predicate on the same digest) before
    ranking, which cuts the window input to ~quota rows per stratum —
    noted here, unnecessary at test scale.
    """
    from pyspark.sql import Window

    counts = (df.groupBy(strata_col)
              .agg(F.count(F.lit(1)).alias("_n_stratum")))
    isqrt = F.floor(F.sqrt(F.col("_n_stratum"))).cast("long")
    wsum = counts.agg(F.sum(isqrt).alias("_isqrt_sum"))
    quota = (counts.crossJoin(F.broadcast(wsum))
             .select(strata_col,
                     F.expr(f"({budget} * CAST(FLOOR(SQRT(_n_stratum)) "
                            f"AS BIGINT)) div _isqrt_sum")
                     .alias("_quota")))
    c = F.col(key_col)
    digest = F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string")))
    w = Window.partitionBy(strata_col).orderBy(digest.asc(), c.asc())
    return (df.join(F.broadcast(quota), strata_col)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= F.col("_quota"))
            .drop("_rk", "_quota"))


def weighted_bootstrap_counts(df: DataFrame, weight_col: str,
                              draws: int = 500, bucket: int = 4096,
                              key_col: str = "doc_id",
                              salt: str = "boot") -> DataFrame:
    """Deterministic weighted sampling WITH replacement (bootstrap):
    ``draws`` independent draws where row i is selected with
    probability w_i / W — epoch construction when upweighted sources
    should repeat, and the resampling primitive under bootstrap
    confidence intervals. Returns (key, w, n_draws) for rows drawn at
    least once.

    Everything is integer-exact, so the oracle replays it: the CDF is
    an exclusive prefix sum of integer weights — row i owns the
    interval [lo_i, lo_i + w_i) of [0, W) — and draw j lands at
    u_j = md5_48(salt:j) mod W. Both engines agree on every md5, mod,
    and interval bound; no float inverse-CDF.

    The interval-containment join is bucketed to stay equi: row
    intervals explode to the ~(w/bucket + 1) buckets they overlap,
    draws hash to their single bucket, and the join key is the bucket
    id with a residual range filter — candidates per draw are the
    O(bucket/avg_w) rows sharing it, never the corpus. The exclusive
    prefix sum that lays out the CDF intervals is
    ``partitioned_prefix_sum`` (operators/ranking.py): range shuffle +
    per-partition sums + a P-row offsets fold — no single-task window
    over the keys. The draws frame is ``draws`` rows and broadcasts.
    Zero-weight rows own empty intervals and are excluded up front
    (also keeps ``sequence()`` ascending).
    """
    from .ranking import partitioned_prefix_sum

    d = (df.select(F.col(key_col).alias("k"),
                   F.col(weight_col).cast("long").alias("w"))
         .filter(F.col("w") > 0))
    cdf = partitioned_prefix_sum(d, [F.col("k")], "w", "lo",
                                 exclusive=True).drop("_grand_total")
    tot = d.agg(F.sum("w").alias("tw"))
    spans = cdf.select(
        "k", "w", "lo",
        F.explode(F.expr(
            f"sequence(lo div {bucket}, (lo + w - 1) div {bucket})"))
        .alias("bk"))
    spark = df.sparkSession
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col("j").cast("string"))),
        1, 12), 16, 10).cast("long")
    drw = (spark.range(draws).select(F.col("id").alias("j"))
           .crossJoin(F.broadcast(tot))
           .select(F.pmod(h, F.col("tw")).alias("u"))
           .withColumn("bk", F.expr(f"u div {bucket}")))
    return (drw.join(spans, "bk")
            .filter((F.col("u") >= F.col("lo"))
                    & (F.col("u") < F.col("lo") + F.col("w")))
            .groupBy(F.col("k").alias("doc_id"), "w")
            .agg(F.count(F.lit(1)).alias("n_draws"))
            .orderBy("doc_id"))


def epoch_shard_assign(df: DataFrame, key_col: str, epochs: int = 2,
                       shards: int = 8,
                       salt: str = "shard-v1") -> DataFrame:
    """Deterministic training-order generator: for each epoch, assign
    every row to a shard (output file) and a position within that
    shard — the global-shuffle step between data curation and trainer
    ingestion. shard = 48-bit md5 of (salt, epoch, key) mod
    ``shards``; position = rank of that hash within the (epoch,
    shard) group. Because the hash is salted with the epoch, each
    epoch is an independent permutation, yet any (epoch, key)'s
    placement is reproducible from the key alone — resumable
    preprocessing with no RNG state to checkpoint.

    Scale: the explode is epochs-way (write amplification, not
    shuffle amplification); the only shuffle is the (epoch, shard)
    window sort. Positions are ranked per shard, NOT globally — a
    global row_number would serialize on one task, while shards rank
    in parallel and each shard is exactly one output file at write
    time (matching ``partitionBy(epoch, shard)``).
    """
    from pyspark.sql import Window
    ep = F.explode(F.array(*[F.lit(i) for i in range(epochs)]))
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{salt}:e"), F.col("epoch").cast("string"),
                       F.lit(":"), F.col(key_col).cast("string"))),
        1, 12), 16, 10).cast("long")
    w = Window.partitionBy("epoch", "shard").orderBy("hv", key_col)
    return (df.select(key_col, ep.alias("epoch"))
            .withColumn("hv", h)
            .withColumn("shard", F.pmod(F.col("hv"), F.lit(shards))
                        .cast("int"))
            .withColumn("pos", F.row_number().over(w))
            .select(key_col, "epoch", "shard", "pos")
            .orderBy("epoch", "shard", "pos"))
