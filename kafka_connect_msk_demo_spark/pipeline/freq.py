"""Exact distributed heavy hitters — Misra-Gries candidates + recount.

The classic two-pass exact pattern for "which tokens appear in at
least a 1/φ fraction of the corpus" at any scale:

1. **Candidate pass** — every input partition maintains a
   Misra-Gries summary of at most ``k`` counters (bounded state, no
   matter how many billions of distinct tokens stream by) and emits
   its surviving keys. MG's guarantee: an item with true partition
   count > n_p/(k+1) always survives the partition's summary, so by
   pigeonhole any item with GLOBAL count > N/(k+1) survives in at
   least one partition — the union of partition candidates is a
   strict superset of the global heavy hitters whenever the report
   threshold exceeds N/(k+1).
2. **Recount pass** — exact counts for the candidate set only (a
   semi join against ≤ k × partitions candidate keys, broadcast),
   then filter by the exact threshold. Output counts are EXACT, which
   is what makes the operator oracle-checkable: the DuckDB twin is a
   plain GROUP BY + HAVING.

Scale shape: pass 1 shuffles at most ``k`` rows per partition; pass 2
is a broadcast semi join + one hash aggregate on the token. Nothing
ever materializes the full distinct-token set. Compare
``pipeline/sketches.py`` (KMV) for the same partial-aggregate
philosophy applied to distinct counting.

Reference scope: the reference has no sketching plane; this extends
the engine for LLM-corpus frequency analysis (stopword discovery,
boilerplate detection) per the build brief.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textprep import tokens


def _mg_merge(state: dict[str, int], batch: pd.Series, k: int) -> None:
    """Merge a batch's exact value counts into a Misra-Gries summary,
    pruning back to ≤ k counters. Merging exact counts then
    subtracting the (k+1)-th largest count preserves the MG bound:
    total undercount ≤ n_seen/(k+1)."""
    for key, cnt in batch.value_counts().items():
        state[key] = state.get(key, 0) + int(cnt)
    if len(state) > k:
        cut = sorted(state.values(), reverse=True)[k]
        for key in [w for w, c in state.items() if c - cut <= 0]:
            del state[key]
        for key in state:
            state[key] -= cut


def heavy_hitters(docs: DataFrame, phi: int = 50, k: int = 64,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Tokens with exact corpus count ≥ N/``phi`` (N = total tokens).

    Exactness needs ``k + 1 > phi`` (the MG superset guarantee above);
    asserted. Output: (word, cnt, share) with share = cnt/N — one
    correctly-rounded division, bit-identical to the oracle's.
    """
    if k + 1 <= phi:
        raise ValueError(f"need k + 1 > phi for exactness; got {k=} {phi=}")
    ex = docs.select(F.explode(tokens(text_col)).alias("w"))

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[str, int] = {}
        for pdf in batches:
            if len(pdf):
                _mg_merge(state, pdf["w"], k)
        if state:
            yield pd.DataFrame({"w": list(state.keys())})

    cand = ex.mapInPandas(mg_partition, "w string").distinct()
    # total tokens WITHOUT a third explode pass: one narrow
    # sum(size(tokens)) projection over the documents scan
    total = docs.agg(F.sum(F.size(tokens(text_col)))
                     .cast("long").alias("n_total"))
    exact = (ex.join(F.broadcast(cand), "w")
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    return (exact.crossJoin(F.broadcast(total))
            # integer comparison — no rounding ambiguity at the gate
            .filter(F.col("cnt") * phi >= F.col("n_total"))
            .select(F.col("w").alias("word"), "cnt",
                    (F.col("cnt").cast("double") /
                     F.col("n_total")).alias("share"))
            .orderBy(F.col("cnt").desc(), "word"))
