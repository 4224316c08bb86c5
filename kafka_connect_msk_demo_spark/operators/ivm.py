"""Incremental view maintenance — keep an aggregate table current from
CDC deltas without rescanning the base fact.

The classic IVM result (Gupta & Mumick 1995): SUM/COUNT group-bys are
*self-maintainable* — an update stream folds into the materialized
aggregate as signed contributions (+after, -before), one tiny
aggregate + one outer merge join, cost O(|delta|) instead of
O(|base|). At 100 TB this is the difference between touching a
multi-terabyte fact table on every refresh and shuffling only the
day's changes: the delta aggregate shuffles |delta| rows on the group
key, the merge joins two aggregate-sized (not fact-sized) frames, and
groups whose membership drops to zero are retired by the count guard.

Exactness contract: contributions are cast to DECIMAL before summing,
so addition is associative-exact and maintained totals are
bit-identical to a full recompute — the property the oracle checks.
(Float sums would drift: base+delta and recompute would round
differently.) MIN/MAX are NOT self-maintainable under deletes (a
retired extremum needs the base); they are deliberately absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def signed_contributions(deltas: DataFrame, cols: list[str],
                         op_col: str = "op", after_col: str = "after",
                         before_col: str = "before") -> DataFrame:
    """Debezium-style delta rows → signed contribution rows.

    create/read/update contribute the ``after`` image with sign +1;
    update/delete contribute the ``before`` image with sign -1. The
    output carries ``cols`` (projected from the image struct) plus
    ``sign``.
    """
    op = F.col(op_col)
    plus = (deltas.filter(op.isin("c", "r", "u"))
            .select(*[F.col(f"{after_col}.{c}").alias(c) for c in cols],
                    F.lit(1).alias("sign")))
    minus = (deltas.filter(op.isin("u", "d"))
             .select(*[F.col(f"{before_col}.{c}").alias(c) for c in cols],
                     F.lit(-1).alias("sign")))
    return plus.unionByName(minus)


def maintain_sum_count(base_agg: DataFrame, contribs: DataFrame,
                       group_cols: list[str], val_col: str,
                       sum_col: str = "total",
                       cnt_col: str = "n") -> DataFrame:
    """Merge signed contributions into a (group..., total, n)
    aggregate. ``base_agg`` must carry ``sum_col``/``cnt_col``;
    ``contribs`` must carry ``val_col`` (already DECIMAL) and ``sign``.
    Groups are created and retired as deltas dictate (full-outer merge,
    n > 0 guard)."""
    delta = (contribs.groupBy(*group_cols)
             .agg(F.sum(F.col(val_col) * F.col("sign")).alias("_d_sum"),
                  F.sum("sign").alias("_d_n")))
    zero = F.lit(0).cast(
        base_agg.schema[sum_col].dataType)
    return (base_agg.join(delta, group_cols, "full_outer")
            .select(*group_cols,
                    (F.coalesce(F.col(sum_col), zero)
                     + F.coalesce(F.col("_d_sum"), zero)).alias(sum_col),
                    (F.coalesce(F.col(cnt_col), F.lit(0))
                     + F.coalesce(F.col("_d_n"), F.lit(0)))
                    .alias(cnt_col))
            .filter(F.col(cnt_col) > 0))
