"""Market-basket co-occurrence mining over the order/lineitem fact.

The classic association-rule building block (frequent pairs + lift) a
retail analytics stack derives from the same denormalized order feed
the reference pipes through Kafka (reference sales schema:
kafka_producer.py / 03_relational_joins.py shapes); here it is one
declarative plan Catalyst can optimize end to end.

Scale shape (100 TB): the apriori prefilter is the load-bearing step —
a pair's support is bounded by either item's support, so items below
``min_support`` are dropped BEFORE the per-order self-join, and the
surviving frequent-item list (small by construction: support
thresholds exist precisely to cut the long tail) is broadcast. The
self-join explodes each order into its item pairs: O(items²) per
order, bounded by the basket size (≤ low tens in any real order feed,
≤ 13 in the TPC-H-shaped testdata), then hash-aggregates on the
(p1, p2) pair key. Nothing is ever driver-collected.

Exactness: support counts are integers; lift is a single division of
two exact decimal(38,0) products evaluated once in double — correctly
rounded, so bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_pairs(lineitem: DataFrame, k: int = 25,
                     min_support: int = 5) -> DataFrame:
    """Top-``k`` co-purchased part pairs by support, with lift.

    * support(p1, p2) = number of orders containing both parts;
    * lift = support · N / (c_p1 · c_p2) with N = distinct orders and
      c_p = per-part order frequency — > 1 means the parts co-occur
      more often than independence predicts.

    Output: ``p1 < p2``, ordered by (support desc, lift desc, p1, p2).
    """
    # r12 (§2.4 share one exchange, §2.3 shuffle fewer bytes):
    # repartition by okey FIRST — hashpartitioning(okey) satisfies the
    # (okey, part) distinct AND co-partitions both self-join sides, so
    # the whole candidate generator runs off ONE exchange. The pair
    # stream then shuffles bare (p1, p2) into the support aggregate —
    # the per-item frequencies (functionally dependent on the part id)
    # re-attach to the ~top-k-sized survivor set via two broadcast
    # joins instead of riding every pair row through the exchange.
    li = (lineitem
          .select(F.col("l_orderkey").alias("okey"),
                  F.col("l_partkey").alias("part"))
          .repartition("okey")
          .dropDuplicates(["okey", "part"]))
    item_freq = li.groupBy("part").agg(F.count(F.lit(1)).alias("c_item"))
    frequent = item_freq.filter(F.col("c_item") >= min_support)
    # apriori prune + the thresholded item list is the broadcast side.
    fli = li.join(F.broadcast(frequent.select("part")), "part")
    a = fli.select("okey", F.col("part").alias("p1"))
    b = fli.select("okey", F.col("part").alias("p2"))
    pairs = a.join(b, "okey").filter(F.col("p1") < F.col("p2"))
    sup = (pairs.groupBy("p1", "p2")
           .agg(F.count(F.lit(1)).alias("support"))
           .filter(F.col("support") >= min_support))
    sup = (sup.join(F.broadcast(frequent
                                .select(F.col("part").alias("p1"),
                                        F.col("c_item").alias("c1"))),
                    "p1")
           .join(F.broadcast(frequent
                             .select(F.col("part").alias("p2"),
                                     F.col("c_item").alias("c2"))),
                 "p2"))
    n_orders = li.agg(
        F.count_distinct(F.col("okey")).alias("n_orders"))
    dec = "decimal(19,0)"
    num = (F.col("support").cast(dec)
           * F.col("n_orders").cast(dec)).cast("double")
    den = (F.col("c1").cast(dec) * F.col("c2").cast(dec)).cast("double")
    return (sup.crossJoin(F.broadcast(n_orders))
            .select("p1", "p2", "support", (num / den).alias("lift"))
            .orderBy(F.col("support").desc(), F.col("lift").desc(),
                     "p1", "p2")
            .limit(k))
