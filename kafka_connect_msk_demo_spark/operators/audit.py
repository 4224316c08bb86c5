"""Scale-engineering audits — the statistics a 100 TB operator runs
BEFORE committing to a plan or a copy.

* :func:`key_skew_census` — per join-key skew profile (top key share,
  distinct count): the number that decides between a plain shuffle
  join, a broadcast, and a salted join. One map-side-combined hash-agg
  per key; the heavy-key probe runs on the already-aggregated (tiny)
  count table.
* :func:`join_cardinality` — exact join output size WITHOUT running
  the join: |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k) over the two per-key count
  tables — each side collapses to its distinct keys before anything is
  joined, so the "statistics join" costs two aggregations plus a
  distinct-key equi-join, never the data join it predicts.
* :func:`dataset_fingerprint` — order/partition-independent content
  hash per relation (sum mod 2^48 of a 48-bit md5 row digest over the
  relation's stable columns): equal fingerprints ⇔ equal row multisets
  (up to digest collisions), the cheap replication/migration equality
  check. Mergeable by addition, so partial fingerprints combine across
  shards/increments.

All three emit one row per audited relation/join — driver-safe output
regardless of input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 48-bit digest space — the md5-prefix idiom shared with the sketch
#: family (pipeline/sketches.py): Spark conv(substr(md5, 1, 12), 16, 10),
#: DuckDB CAST('0x' || substr(md5, 1, 12) AS BIGINT).
_FP_MOD = 1 << 48


def key_skew_census(rels: list[tuple[str, DataFrame, str]]) -> DataFrame:
    """(relation, key_col, n_rows, n_distinct, top_key, top_cnt,
    top_share) for each (name, df, key) audit target.

    top_share ≈ 1/n_distinct means uniform keys (hash join partitions
    evenly); top_share ≫ 1/n_distinct is the salting / skew-join-AQE
    signal. Ties on top_cnt break to the smallest key string."""
    outs = []
    for name, df, key in rels:
        counts = (df.select(F.col(key).cast("string").alias("k"))
                  .groupBy("k").agg(F.count(F.lit(1)).alias("cnt")))
        # r12 (guide §2.4 fewer passes): totals and the top key fold
        # into ONE aggregate over the per-key counts — the old shape
        # re-ran the count aggregate (a full scan + shuffle each) for
        # the top-1 sort and for the totals. The argmax is
        # min(struct(-cnt, k)): smallest -cnt = largest cnt, ties to
        # the smallest key string — exactly the old
        # orderBy(cnt DESC, k).limit(1).
        stats = counts.agg(
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.min(F.struct((-F.col("cnt")).alias("nc"),
                           F.col("k").alias("tk"))).alias("_top"))
        outs.append(stats.select(
            F.lit(name).alias("relation"), F.lit(key).alias("key_col"),
            "n_rows", "n_distinct",
            F.col("_top.tk").alias("top_key"),
            (-F.col("_top.nc")).alias("top_cnt"),
            ((-F.col("_top.nc")).cast("double") / F.col("n_rows"))
            .alias("top_share")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("relation", "key_col")


def join_cardinality(joins: list[tuple[str, DataFrame, str,
                                       DataFrame, str]]) -> DataFrame:
    """(join_name, distinct_left, distinct_right, matched_keys,
    out_rows) for each (name, left, lkey, right, rkey) audit target —
    out_rows is the EXACT row count the equi-join would produce."""
    outs = []
    for name, left, lk, right, rk in joins:
        a = (left.select(F.col(lk).alias("k"))
             .groupBy("k").agg(F.count(F.lit(1)).alias("ca")))
        b = (right.select(F.col(rk).alias("k"))
             .groupBy("k").agg(F.count(F.lit(1)).alias("cb")))
        # r12 (guide §2.4 fewer passes): ONE full-outer join of the two
        # count frames carries every statistic — the old shape ran each
        # count aggregate TWICE (its own total + the inner-join leg)
        # plus two crossJoins. count(ca) = keys present on the left
        # (count skips the nulls the outer join fills in; a NULL key
        # groups on each side but never equi-matches, exactly as
        # before); matched = both sides present; ca*cb is NULL unless
        # both are, so the sum is the old inner-join sum.
        m = a.join(b, "k", "full_outer")
        outs.append(
            m.agg(F.count("ca").alias("distinct_left"),
                  F.count("cb").alias("distinct_right"),
                  F.count(F.when(F.col("ca").isNotNull()
                                 & F.col("cb").isNotNull(), 1))
                  .alias("matched_keys"),
                  F.coalesce(F.sum(F.col("ca") * F.col("cb")),
                             F.lit(0)).alias("out_rows"))
            .select(F.lit(name).alias("join_name"), "distinct_left",
                    "distinct_right", "matched_keys", "out_rows"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("join_name")


def dataset_fingerprint(rels: list[tuple[str, DataFrame,
                                         list[str]]]) -> DataFrame:
    """(relation, n_rows, content_hash): mergeable multiset content
    hash per relation over the named columns — the row digest is the
    48-bit md5 prefix of the '|'-joined string casts (salted by the
    relation name so identical rows in different relations don't
    collide to the same digest), summed mod 2^48. Addition (not XOR:
    XOR cancels duplicate rows pairwise) keeps the combine associative
    and commutative — partition layout, shard count, and merge order
    cannot change the hash."""
    outs = []
    for name, df, cols in rels:
        digest = F.conv(F.substring(F.md5(F.concat_ws(
            "|", F.lit(f"fp:{name}"),
            *[F.col(c).cast("string") for c in cols])), 1, 12),
            16, 10).cast("long")
        outs.append(df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(digest.cast("decimal(38,0)")) % F.lit(_FP_MOD))
            .cast("long").alias("content_hash"))
            .select(F.lit(name).alias("relation"), "n_rows",
                    "content_hash"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("relation")
