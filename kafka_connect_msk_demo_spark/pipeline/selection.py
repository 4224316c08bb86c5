"""Data selection for pretraining — DSIR-style importance scoring.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") scores raw documents by how target-like their
hashed n-gram feature distribution is, then keeps the highest-weight
docs. The variant here uses hashed UNIGRAM buckets and a *rational*
importance ratio instead of a log-likelihood ratio — products and
integer divisions replay bit-exactly cross-engine, where ``ln`` would
not (same determinism argument as the rational idf in
`text_analysis.py`):

    w(bucket) = (2^20 * ct_b * CR) div (cr_b * CT)      (exact int64)
    score(doc) = Σ_{token occurrences} w(bucket(token))  (int64 sum)

ct/cr are bucket occurrence counts in the target/raw corpus, CT/CR the
corresponding totals; w is the quantized target-vs-raw rate ratio.

Scale shape: one explode over the corpus, two hash aggregates onto a
FIXED 1024-bucket key space (the whole weight table is ≤ 1024 rows —
broadcast), one broadcast join back, one per-doc aggregate, one
global top-k. No shuffle carries more than |corpus tokens| rows keyed
by a 1024-value key — fine under AQE coalescing; the weight table
cost is independent of corpus size, which is the point of hashed
features. int64 headroom: 2^20 * ct * CR stays under 2^63 while the
corpus is below ~3e6 target tokens × 3e6 raw tokens; past that, drop
the quantizer to 2^16 (documented, not silently scaled).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textprep import tokens

N_BUCKETS = 1024
QUANT = 1 << 20


def _bucket(term: Column) -> Column:
    """Deterministic 48-bit md5 prefix → bucket id (cross-engine: the
    same conv/cast contract as the KMV sketch)."""
    h = F.conv(F.substring(F.md5(term), 1, 12), 16, 10).cast("long")
    return F.pmod(h, F.lit(N_BUCKETS))


def dsir_topk(docs: DataFrame, target_pred: Column, k: int = 25,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-``k`` documents by quantized DSIR importance score, where
    ``target_pred`` is a boolean column marking the target-domain
    subset (e.g. ``F.col('lang') == 'en'``). Returns
    (doc_id, n_tokens, score_q)."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       target_pred.alias("is_target"),
                       F.explode(tokens(text_col)).alias("term"))
    b = toks.select("doc_id", "is_target",
                    _bucket(F.col("term")).alias("bkt"))
    # r12 (guide §2.4 fewer passes): the raw count, the target count
    # AND the corpus totals all come out of ONE bucket-keyed aggregate
    # over ONE explode — the old shape ran three separate corpus
    # passes (cr, ct, tot), each re-exploding and re-hashing every
    # token. ct as a conditional count equals the old left-join +
    # coalesce(ct, 0) (a bucket with no target tokens counts 0); the
    # totals are exact sums over the 1024-row bucket frame.
    cb = b.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(F.when(F.col("is_target"), 1)).alias("ct"))
    tot = cb.agg(F.sum("cr").alias("c_raw"),
                 F.sum("ct").alias("c_tgt"))
    w = (cb.crossJoin(F.broadcast(tot))
         .select("bkt", F.expr(
             f"({QUANT} * ct * c_raw) div (cr * c_tgt)")
             .alias("w")))
    # length-normalize: the quantized MEAN importance ratio per token
    # (integer division — exact both engines); a raw sum would just
    # rank long documents first
    scored = (b.join(F.broadcast(w), "bkt")
              .groupBy("doc_id")
              .agg(F.expr("sum(w) div count(1)").alias("score_q"),
                   F.count(F.lit(1)).alias("n_tokens")))
    return (scored
            .orderBy(F.col("score_q").desc(), F.col("doc_id"))
            .limit(k)
            .select("doc_id", "n_tokens", "score_q"))


def mix_allocation(docs: DataFrame, budget_num: int = 1,
                   budget_den: int = 2,
                   weights: tuple = (1, 2, 3, 4),
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Quality-tiered token-budget allocation — the "data mixing"
    planning step in front of a pretraining run: bucket documents into
    quality tiers, decide how many tokens of the global budget
    (``budget_num/budget_den`` of the corpus) each tier contributes
    (proportional to ``weights``, highest tier weighted heaviest), and
    emit the per-tier deterministic sampling rate that realizes it.

    Tier assignment uses FIXED quality-score thresholds (0.25/0.5/
    0.75), deliberately not global quantiles: a threshold is a
    scan-speed per-row predicate on any cluster size, where an exact
    global ntile would funnel the corpus through one window partition
    — the classic 100 TB anti-pattern (approximate quantile thresholds
    are the production middle ground; the fixed thresholds keep this
    exactly oracle-replayable).

    All rates are exact integer ratios carried as (num, den) pairs and
    converted to double by ONE division at the output boundary, so the
    result hash-matches cross-engine. A tier whose fair share exceeds
    its actual tokens is capped at rate 1.0 (the unused budget is
    reported, not silently reallocated — reallocation is a policy
    choice the caller owns).

    Output: one row per occupied tier with document/token counts and
    the allocation.
    """
    from .text_analysis import quality_score
    q = quality_score(docs, id_col=id_col, text_col=text_col)
    tier = (F.when(F.col("quality") < 0.25, 0)
            .when(F.col("quality") < 0.5, 1)
            .when(F.col("quality") < 0.75, 2)
            .otherwise(3))
    per_tier = (q.select(tier.alias("tier"), "n_tokens")
                .groupBy("tier")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("n_tokens").alias("tier_tokens")))
    total = per_tier.agg(F.sum("tier_tokens").alias("corpus_tokens"))
    w_sum = sum(weights)
    w_expr = F.element_at(
        F.array(*[F.lit(int(w)) for w in weights]), F.col("tier") + 1)
    alloc = (per_tier.crossJoin(F.broadcast(total))
             .withColumn("w", w_expr)
             # fair share of the budget in exact integer arithmetic:
             # target = corpus_tokens * budget_num * w / (budget_den * w_sum)
             .withColumn("target_num",
                         F.col("corpus_tokens") * budget_num * F.col("w"))
             .withColumn("target_den", F.lit(budget_den * w_sum)))
    capped = F.col("target_num") >= (F.col("tier_tokens")
                                     * F.col("target_den"))
    rate = F.when(capped, F.lit(1.0)).otherwise(
        F.col("target_num").cast("double")
        / (F.col("tier_tokens") * F.col("target_den")).cast("double"))
    target_tokens = F.expr("target_num div target_den")
    return (alloc.select(
        "tier", "n_docs", "tier_tokens",
        F.least(target_tokens, F.col("tier_tokens"))
        .alias("target_tokens"),
        rate.alias("sample_rate"),
        capped.alias("budget_capped"))
        .orderBy("tier"))


def domain_cap(docs: DataFrame, group_col: str = "source",
               id_col: str = "doc_id", cap: int = 100,
               salt: str = "cap", full_rows: bool = False) -> DataFrame:
    """Per-domain document cap — keep at most ``cap`` documents per
    ``group_col``, chosen by deterministic hash rank (the per-domain
    quota step every web-scale pretraining pipeline runs so no single
    domain dominates the mixture).

    Selection is a pure function of the row: rank within the domain by
    ``md5(salt:id)`` (tie-broken by id), keep rank <= cap. Same
    hash-not-rand reproducibility contract as `operators/sampling.py`
    — reruns, retries, and cluster resizes keep the identical set, and
    any engine can replay it.

    Scale shape: one shuffle on the domain key with an in-partition
    sort for the rank window — no joins, no driver state. A pathological
    mega-domain sorts on one executor; for those, pre-filter with a
    cheap ``pmod(hash) < p`` gate sized from domain counts so only
    ~cap survivors per domain reach the exact window.

    ``full_rows=True`` keeps every input column on the survivors (one
    lineage — composites avoid re-joining the capped ids back against
    the same upstream plan twice); the default returns the compact
    (group, id, rank) selection.
    """
    r = F.md5(F.concat_ws(":", F.lit(salt),
                          F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(r, id_col)
    capped = (docs.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= cap))
    if full_rows:
        return capped
    return (capped.select(group_col, id_col, "rk")
            .orderBy(group_col, id_col))
