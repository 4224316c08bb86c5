"""Sequence packing — assign documents to fixed token-budget bins.

The standard pretraining data layout concatenates documents into a
token stream and slices it into fixed-size training sequences
(GPT-style chunking). The *assignment* step — which bin does each
document start in — is a pure running-sum computation:

    bin = floor(tokens_before_this_doc / budget)

where ``tokens_before_this_doc`` is the exclusive prefix sum of token
counts in a deterministic document order. This is a single window
aggregate, no Python, no collect.

Scale shape: a window ``partitionBy(stream) orderBy(doc_id)`` sorts one
stream per task. A global single-stream pack would serialize the whole
corpus through one sort partition, so the pack is keyed by
``(lang, shard)`` where ``shard = pmod(doc_id, n_shards)`` — packing is
embarrassingly parallel across streams, and a training run reads each
stream independently anyway (one stream == one data-loader shard). At
100 TB you raise ``n_shards`` until a stream's token count fits a task;
membership of a document in a stream is a pure function of its id, so
the layout is reproducible across runs and cluster sizes.

The per-bin ``fill`` ratio divides by a power-of-two budget, so the
division is exact in IEEE doubles and the result stays hash-checkable
cross-engine.

Reference parity: the reference has no packing operator — this is part
of the LLM-pipeline extension family (training-data layout), same
corpus contract as `pipeline/text_analysis.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textprep import tokens


def pack_bins(docs: DataFrame, budget: int = 2048, n_shards: int = 8,
              id_col: str = "doc_id", text_col: str = "text",
              lang_col: str = "lang") -> DataFrame:
    """Per-document bin assignment: (doc_id, lang, shard, n_tokens,
    bin). Deterministic: stream = (lang, doc_id % n_shards), order =
    doc_id, bin = exclusive-prefix-sum div budget."""
    nt = F.size(tokens(text_col))
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.col(lang_col).alias("lang"),
                    shard.alias("shard"), nt.alias("n_tokens"))
    w = (Window.partitionBy("lang", "shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.withColumn(
        "bin", F.floor(cum_before / F.lit(budget)).cast("long"))


def pack_stats(docs: DataFrame, budget: int = 2048,
               n_shards: int = 8) -> DataFrame:
    """Per-(lang, shard, bin) packing stats: document count, token sum,
    and fill ratio vs the budget (exact division — budget is a power of
    two). The terminal bin of each stream is typically under-full; every
    interior bin's token span covers the budget boundary by
    construction."""
    binned = pack_bins(docs, budget=budget, n_shards=n_shards)
    return (binned.groupBy("lang", "shard", "bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("bin_tokens"))
            .withColumn("fill",
                        F.col("bin_tokens").cast("double")
                        / F.lit(float(budget)))
            .orderBy("lang", "shard", "bin"))
