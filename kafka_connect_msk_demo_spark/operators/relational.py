"""Scalar-expression / projection / limit-offset operators.

Reference semantics (SURVEY.md §2.3, §2.4, §2.8):

* P1-P7 — projection/rename/drop/cast/derived columns.
* F7 — ``sha1`` deterministic surrogate key (``06:98``); an md5 variant
  is provided because the DuckDB oracle has no sha1.
* F8/F9 — CASE WHEN buckets + interval addition (``pyspark/data/
  sales.sql:4-8``).
* F10 — ``group_concat(DISTINCT ...)`` (``pagila-schema.sql:486-492``)
  → sorted ``collect_set`` + ``array_join``. ``collect_set`` order is
  nondeterministic, so the array is always sorted before joining.
* O5 — LIMIT / OFFSET+LIMIT (``sales.sql:18,37``) — native
  ``DataFrame.offset`` over a distributed sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def surrogate_key(df: DataFrame, cols: list[str], out: str = "key",
                  algo: str = "sha1") -> DataFrame:
    """F7: deterministic surrogate key over one or more columns
    (reference 06:98 uses sha1(country))."""
    concat = F.concat_ws("", *[F.col(c).cast("string") for c in cols])
    fn = {"sha1": F.sha1, "md5": F.md5, "sha256": lambda c: F.sha2(c, 256)}[algo]
    return df.withColumn(out, fn(concat))


def bucket_case(col: Column, bounds: list[float],
                labels: list[str]) -> Column:
    """F8: CASE WHEN bucketing (sales.sql:4-7 shape).
    len(labels) == len(bounds) + 1."""
    expr = F.when(col < bounds[0], labels[0])
    for i in range(1, len(bounds)):
        expr = expr.when(col < bounds[i], labels[i])
    return expr.otherwise(labels[-1])


def shift_days(col: Column, days: int) -> Column:
    """F9: interval addition (sales.sql:8 adds INTERVAL '1565 days').

    Implemented as fixed-duration micros arithmetic (a day = 86,400 s),
    not ``col + INTERVAL n DAYS``: calendar-day intervals on TIMESTAMP
    are session-timezone dependent (a DST-crossing day is 23/25 h),
    which silently shifts results by ±1 h when the caller's session
    isn't UTC. Fixed-duration matches naive-timestamp SQL semantics.
    """
    return F.timestamp_micros(
        F.unix_micros(col) + F.lit(days * 86_400_000_000))


def group_concat_distinct(df: DataFrame, group_cols: list[str],
                          value_col: str, sep: str = ", ",
                          alias: str = "concat_list") -> DataFrame:
    """F10: per-group sorted distinct concatenation — deterministic
    replacement for Postgres group_concat(DISTINCT ...)."""
    return (
        df.groupBy(*group_cols)
        .agg(F.array_join(F.array_sort(F.collect_set(value_col)), sep)
             .alias(alias))
        .orderBy(*group_cols)
    )


def limit_offset(df: DataFrame, order_cols: list[Column], limit: int,
                 offset: int = 0) -> DataFrame:
    """O5: OFFSET+LIMIT over a deterministic ordering.

    Uses the native ``DataFrame.offset`` (Spark ≥ 3.4): the sort stays
    distributed and the limit+offset collapse into one
    CollectLimit/TakeOrdered boundary — no single-task global window
    (the previous row_number approach funneled every row through one
    task, a driver-adjacent bottleneck on a full fact table at scale).
    """
    if offset == 0:
        return df.orderBy(*order_cols).limit(limit)
    return df.orderBy(*order_cols).offset(offset).limit(limit)


def skyline_2d(df: DataFrame, x_col: str, y_col: str,
               order_col: str) -> DataFrame:
    """2-D Pareto frontier (skyline): rows where no other row is >= on
    BOTH dimensions with at least one strictly greater — "best
    customers" / "best offers" style queries.

    Two phases, neither quadratic:

    1. per-x reduction — only the max-y row per x value can be on the
       frontier (same x, lower y is dominated); ties on (x, y) keep
       the min ``order_col`` as the deterministic representative.
       One hash aggregate, shuffle key = x.
    2. frontier scan over the reduced set — sorted by x DESC, a row
       survives iff its y strictly exceeds the running y-max of all
       earlier (higher-x) rows. The window input is one row per
       DISTINCT x, so the unpartitioned running max is over the
       reduced set, not the corpus; with a continuous x, swap phase 2
       for per-range local frontiers + a frontier-of-frontiers merge.

    The SQL twin keeps the NOT-EXISTS dominance form — quadratic but
    unambiguous — exactly the cross-check a clever-plan operator needs.
    """
    best = (df.groupBy(x_col)
            .agg(F.max(F.struct(F.col(y_col).alias("y"),
                                (-F.col(order_col)).alias("no")))
                 .alias("m"))
            .select(x_col, F.col("m.y").alias(y_col),
                    (-F.col("m.no")).alias(order_col)))
    w = (Window.orderBy(F.col(x_col).desc())
         .rowsBetween(Window.unboundedPreceding, -1))
    return (best.withColumn("_pm", F.max(y_col).over(w))
            .filter(F.col("_pm").isNull() | (F.col(y_col) > F.col("_pm")))
            .drop("_pm")
            .orderBy(F.col(x_col).desc()))
