"""Joins — enrichment, multi-way chains, subquery shapes.

Reference semantics (SURVEY.md §2.5):

* J1 — stream-static left-outer enrichment join on ``country`` against a
  cached 245-row dimension, null-filled to "Unassigned"
  (``08_streaming_read_kafka_join_window.py:94-95``, ``09:94-95``,
  ``12:98-99``).
* J2 — static 5-way inner equi-join chain producing the sales feed
  (``pyspark/data/sales.sql:12-16``).
* J3 — multi-way join + correlated scalar subquery views
  (``sql-scripts/pagila-schema.sql:483-498``).
* J4 — IN-subquery point lookups
  (``moma_debezium_hudi_demo.ipynb`` cells 17-20).

Scale notes
-----------
Dimension joins broadcast explicitly (``F.broadcast``): at 100 TB the
fact side never shuffles for a dim join — the 1000-executor plan is a
``BroadcastHashJoin`` inside the scan stage. Fact-fact joins
(orders ⋈ lineitem) shuffle on the join key; both sides hash-partition
once and AQE handles skew. Correlated scalar subqueries are left to
Catalyst's ``RewriteCorrelatedScalarSubquery`` (decorrelates to an
aggregate + join) — no hand rewrite needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(fact: DataFrame, dim: DataFrame, on: list[str],
           fill: dict[str, str] | None = None,
           broadcast_dim: bool = False) -> DataFrame:
    """J1: left-outer enrichment join to a dimension + na.fill.

    ``fill`` maps dim-column → default for unmatched keys (the
    reference fills "Unassigned", 08:95).

    ``broadcast_dim`` force-broadcasts the dimension. Only set it for
    TRUE fixed-size dims (the reference's 245-row regions CSV): forcing
    a broadcast of a table that scales with the data (customer) turns
    into an executor OOM at 100 TB instead of a plan choice. Default is
    to let AQE pick — it broadcasts small sides at runtime anyway.
    """
    out = fact.join(F.broadcast(dim) if broadcast_dim else dim,
                    on, "left_outer")
    if fill:
        out = out.na.fill(fill)
    return out


def star_join(tables: dict[str, DataFrame]) -> DataFrame:
    """J2: the 5-way chain over the test star schema —
    region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem.

    Mirrors ``sales.sql:12-16`` (payment⋈customer⋈address⋈city⋈country)
    on the driver's TPC-H-ish tables (FIXTURES.md §6). Dimension legs
    (region, nation) broadcast; orders⋈lineitem is the one real shuffle.
    """
    return (
        tables["lineitem"]
        .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(tables["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(tables["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(tables["region"]),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )


def semi_join_in(df: DataFrame, keys: DataFrame, left_key: str,
                 right_key: str) -> DataFrame:
    """J4: ``WHERE k IN (SELECT ...)`` as a left-semi join (Catalyst's
    own rewrite of IN-subqueries)."""
    return df.join(keys, df[left_key] == keys[right_key], "left_semi")


def anti_join_not_exists(df: DataFrame, keys: DataFrame, left_key: str,
                         right_key: str) -> DataFrame:
    """``WHERE NOT EXISTS (SELECT ...)`` as a left-anti join — the
    complement of :func:`semi_join_in` (SURVEY.md §2.5 notes semi/anti
    as the cheap capability extension beyond reference parity). Same
    scale shape as any equi-join: shuffle (or broadcast) on the key,
    emit only probe misses — no null-aware fallback needed because the
    anti condition is a plain equality, not ``NOT IN``."""
    return df.join(keys, df[left_key] == keys[right_key], "left_anti")


def bloom_semi_join(fact: DataFrame, dim_keys: DataFrame, key: str,
                    bits: int = 1 << 16, hashes: int = 3,
                    salt: str = "bloom") -> DataFrame:
    """Semi join with an explicit Bloom pre-filter — the declarative
    form of the runtime row-group filter a warehouse pushes to its
    scans: the fact side is first reduced by a ``bits``-wide Bloom
    membership test built from the dim keys, then verified with the
    exact semi join, so the OUTPUT equals a plain left-semi join
    (false positives are removed; the oracle is the plain semi join)
    while the expensive exact-join shuffle sees only the pre-filtered
    fraction.

    All Bloom positions are deterministic md5 buckets, and the filter
    is built WITHOUT driver state: dim positions (<= bits distinct
    rows) broadcast into the position probe; a fact row survives when
    all ``hashes`` of its positions hit. At 100 TB, bits scales to
    keep the false-positive rate ~ (1-e^{-kn/m})^k manageable, and the
    broadcast stays <= bits rows regardless of dim cardinality.
    """
    def positions(col):
        return F.array(*[
            F.pmod(F.conv(F.substring(
                F.md5(F.concat_ws(":", F.lit(f"{salt}{i}"),
                                  F.col(col).cast("string"))), 1, 12),
                16, 10).cast("long"), F.lit(bits))
            for i in range(hashes)])

    dim_pos = (dim_keys.select(F.explode(positions(key)).alias("_p"))
               .distinct())
    # membership test on DISTINCT fact keys (narrow), not full rows:
    # a key passes when all `hashes` positions hit the dim set
    passing = (fact.select(key).distinct()
               .withColumn("_p", F.explode(positions(key)))
               .join(F.broadcast(dim_pos), "_p", "left_semi")
               .groupBy(key)
               .agg(F.count(F.lit(1)).alias("_nhit"))
               .filter(F.col("_nhit") >= hashes)
               .select(key))
    return (fact.join(passing, key, "left_semi")
            .join(dim_keys.select(key).distinct(), key, "left_semi"))
