"""Temporal join operators Spark lacks as built-ins: the as-of join
and the bucketed range (interval) join.

Both are compositions of existing DataFrame ops — no UDFs, no
nested-loop joins — chosen for their 100 TB shuffle story:

* :func:`asof_join` is the union+window formulation: ONE shuffle of
  left ∪ right on the key, then a running ``last(..., ignorenulls)``
  per key in (ts, side) order. No pairing step ever materializes —
  state per key is a single row, vs the naive
  join-then-max-per-left-row which shuffles |L|·avg-matches rows.
* :func:`bucketed_range_join` turns a value-in-interval predicate
  into an equi-join: intervals are exploded to the fixed-width
  buckets they cover, points map to exactly ONE bucket, and the
  bucket id becomes the shuffle key, followed by the exact BETWEEN
  filter. Candidate volume is |points| + Σ interval-widths/bucket —
  linear, never |points|·|intervals| (the broadcast-BNLJ fallback is
  only sane while the interval side stays tiny).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_prefix: str = "r_") -> DataFrame:
    """Backward as-of join: for every left row, the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (inclusive at equality), or NULLs if no such row — left-join
    semantics, |output| == |left|.

    DETERMINISM CONTRACT: the right side must be unique per
    (``on``, ``right_ts``) — pre-aggregate ties (e.g. ``max_by``)
    before calling, as the registered query does; otherwise which tied
    row wins depends on partition order.

    All right columns except the key come back prefixed with
    ``right_prefix``.
    """
    rcols = [c for c in right.columns if c != on]
    rpay = F.struct(*[F.col(c) for c in rcols])
    # SQL join semantics: NULL keys never match. Window.partitionBy
    # groups NULLs together, so drop NULL-key right rows — left rows
    # with a NULL key then sit in a right-free partition and get NULLs,
    # exactly the ASOF LEFT JOIN answer.
    right = right.filter(F.col(on).isNotNull())
    l = left.select(
        F.col(on), F.col(left_ts).alias("_ts"), F.lit(1).alias("_is_l"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"))
    r = right.select(
        F.col(on), F.col(right_ts).alias("_ts"), F.lit(0).alias("_is_l"),
        rpay.alias("_rpay"))
    u = (l.withColumn("_rpay", F.lit(None).cast(
            r.schema["_rpay"].dataType))
         .unionByName(r.withColumn("_lpay", F.lit(None).cast(
             l.schema["_lpay"].dataType))))
    # right rows sort BEFORE left rows at equal ts => inclusive (>=)
    w = (Window.partitionBy(on).orderBy("_ts", "_is_l")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
               .filter(F.col("_is_l") == 1))
    out_cols = [F.col(f"_lpay.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"{right_prefix}{c}")
                 for c in rcols]
    return matched.select(*out_cols)


def bucketed_range_join(points: DataFrame, intervals: DataFrame,
                        point_col: Column | str,
                        start_col: str, end_col: str,
                        bucket_width: int) -> DataFrame:
    """Equi-join plan for ``start <= point <= end`` (inclusive ends).

    ``points``/``intervals`` columns must be disjoint. Both sides'
    range dimension must be integral (cast dates to epoch-days, or
    timestamps to epoch-seconds, before calling). Each interval row is
    exploded to ``sequence(floor(start/w), floor(end/w))`` bucket ids —
    one row per covered bucket — while each point maps to exactly one
    bucket, so every qualifying (point, interval) pair meets exactly
    once and no dedup pass is needed. Pick ``bucket_width`` near the
    median interval width: candidate blow-up is then ~2 rows per
    interval and the exact filter discards ~half.
    """
    if isinstance(point_col, str):
        p, pc, drop = points, point_col, ["_b"]
    else:
        # materialize the expression so the post-join filter can see it
        p, pc, drop = points.withColumn("_point", point_col), "_point", \
            ["_b", "_point"]
    p = p.withColumn(
        "_b", F.floor(F.col(pc).cast("long") / F.lit(bucket_width))
        .cast("long"))
    iv = intervals.withColumn(
        "_b", F.explode(F.sequence(
            F.floor(F.col(start_col).cast("long") / bucket_width),
            F.floor(F.col(end_col).cast("long") / bucket_width))))
    joined = p.join(iv, "_b")
    return (joined
            .filter((F.col(pc) >= F.col(start_col))
                    & (F.col(pc) <= F.col(end_col)))
            .drop(*drop))


def gap_fill_days(per_day: DataFrame, group_cols: list[str],
                  day_col: str, value_col: str) -> DataFrame:
    """Dense per-group daily spine with zero-fill and LOCF — the
    time-series gap-filling operator (capability extension; warehouses
    ship it as ``GAP_FILL``/``date_spine``, Spark has no built-in).

    Input is an already-aggregated (group, day, value) frame with gaps;
    output has one row per group per day between that group's min and
    max day: ``value`` zero-filled, ``filled`` marking synthesized
    rows, and ``locf_<value>`` carrying the last observation forward
    (never NULL — each group's spine starts at an observed day).

    Scale shape: the spine is built per-group from a two-value bounds
    agg and ``explode(sequence(lo, hi))`` — generation happens on
    executors, sized by the OUTPUT (Σ per-group day ranges), never by
    the input row count, with no driver-side calendar. The spine→data
    join and the LOCF window share the (group) / (group, day) key, so
    AQE plans one shuffle of each side. A single group whose day range
    is pathological (millions of days from one corrupt timestamp)
    would explode on one executor — bound ranges upstream or validate
    with an integrity audit first.
    """
    lo, hi = f"_{day_col}_lo", f"_{day_col}_hi"
    # per_day feeds BOTH the bounds agg and the spine join; without a
    # cache the whole upstream subtree (at scale: a fact-table scan +
    # star join) executes twice. Same deterministic-release discipline
    # as connected_components: materialize the (output-sized) result,
    # then unpersist the input cache — repeated invocations in a
    # long-lived session must not accumulate cache entries.
    per_day = per_day.persist()
    bounds = per_day.groupBy(*group_cols).agg(
        F.min(day_col).alias(lo), F.max(day_col).alias(hi))
    spine = bounds.select(
        *group_cols, F.explode(F.sequence(lo, hi)).alias(day_col))
    j = spine.join(per_day, [*group_cols, day_col], "left")
    w = (Window.partitionBy(*group_cols).orderBy(day_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    zero = F.lit(0).cast(j.schema[value_col].dataType)
    out = (j.select(
        *group_cols, day_col,
        F.coalesce(F.col(value_col), zero).alias(value_col),
        F.col(value_col).isNull().alias("filled"),
        F.last(value_col, ignorenulls=True).over(w)
        .alias(f"locf_{value_col}")).persist())
    out.count()
    per_day.unpersist()
    return out
