"""Product-analytics operators: ordered funnels and retention cohorts.

Both are single-table event-log computations that every analytics
engine ships; both reduce to window aggregates partitioned by user —
ONE shuffle on ``user_id`` no matter how many steps/periods, then a
tiny global aggregate.

Funnel semantics (strictly-ordered): a user reaches step ``i`` at the
EARLIEST event of type ``steps[i]`` that happens strictly after their
step ``i-1`` time. That is the standard "ordered funnel" definition —
``min(ts) over user`` filtered by the previous step's time, computed
as one chained window projection per step (same partition key, so
Catalyst plans a single Window exchange).

Retention semantics: periods are FIXED-WIDTH windows of the epoch
(``epoch_us div period``), not calendar buckets — integer division
keeps the math timezone-free and bit-exact cross-engine; the cohort is
the user's first-activity period (window min), the offset is
``period - cohort``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WEEK_US = 7 * 24 * 3600 * 1_000_000


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """One row per funnel step: (step, stage, n_users, conv_from_first,
    conv_from_prev). ``conv_*`` are double divisions of exact counts."""
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev: str | None = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        cur = f"_t{i}"
        df = df.withColumn(cur, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = cur
    per_user = df.select(user_col,
                         *[f"_t{i}" for i in range(len(steps))]).distinct()
    aggs = [F.count(F.col(f"_t{i}")).alias(f"n{i}")
            for i in range(len(steps))]
    totals = per_user.agg(*aggs)
    rows = []
    for i, step in enumerate(steps):
        conv_first = (F.col(f"n{i}").cast("double")
                      / F.col("n0")) if i else F.lit(1.0)
        conv_prev = (F.col(f"n{i}").cast("double")
                     / F.col(f"n{i - 1}")) if i else F.lit(1.0)
        rows.append(totals.select(
            F.lit(i + 1).alias("stage"), F.lit(step).alias("step"),
            F.col(f"n{i}").alias("n_users"),
            conv_first.alias("conv_from_first"),
            conv_prev.alias("conv_from_prev")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("stage")


def retention_cohorts(events: DataFrame, period_us: int = WEEK_US,
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """(cohort, offset, n_users): distinct users from first-activity
    period ``cohort`` who were active ``offset`` periods later."""
    w = Window.partitionBy(user_col)
    # integer div, not float-divide-then-cast: exact and engine-portable
    period = F.expr(f"unix_micros({ts_col}) div {period_us}")
    df = (events.select(F.col(user_col), period.alias("p"))
          .withColumn("cohort", F.min("p").over(w)))
    return (df.select(user_col,
                      "cohort", (F.col("p") - F.col("cohort"))
                      .alias("offset"))
            .distinct()
            .groupBy("cohort", "offset")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .orderBy("cohort", "offset"))
