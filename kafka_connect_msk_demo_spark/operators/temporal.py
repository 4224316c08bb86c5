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


def linear_interpolate_grid(obs: DataFrame, key_col: str, ts_col: str,
                            value_col: str, step: int) -> DataFrame:
    """Resample each key's observation series at fixed ``step``-second
    grid instants with LINEAR interpolation between the surrounding
    observations — the time-series `interpolate` companion to
    :func:`gap_fill_days`'s LOCF (warehouses ship it as
    ``time_bucket_gapfill(interpolate(...))``; Spark has no built-in).

    ``ts_col`` must be epoch seconds (long). Grid instants per key run
    from the first multiple of ``step`` at/after the key's min ts
    through its max ts, so every grid instant has an observation on
    both sides (the interpolation never extrapolates). Observations
    are pre-aggregated to one row per (key, ts) with ``max`` —
    order-independent, so results don't depend on partition layout.

    Scale shape (r12): ONE pass — each observation carries its
    successor via ``lead`` and generates exactly the grid instants it
    owns: its own timestamp when that is on-grid (prev = next = self,
    the observed value returns exactly), plus every multiple of
    ``step`` STRICTLY inside (t, next t). The intervals partition the
    timeline, so each grid multiple in [ceil(lo/step)·step, hi] is
    emitted exactly once — the same instant set, prev/next
    attributions and arithmetic as the earlier grid ∪ obs + two
    RANGE-window formulation, which paid a bounds aggregate, a second
    scan of the source (the union's obs leg), and a union twice the
    size into the window exchange (guide §2.3/§2.4: one lead window on
    the key replaces all of it; asserted value-identical in
    tests/test_round4b_ops.py). The interpolation weight
    ``(t-t0)/(t1-t0)`` is an exact-int division and the value formula
    ``v0 + (v1-v0)*w`` is evaluated as the same expression tree an SQL
    oracle writes, so results are bit-identical cross-engine.
    """
    o = (obs.select(F.col(key_col).alias("k"),
                    F.col(ts_col).alias("t"),
                    F.col(value_col).alias("v"))
         .groupBy("k", "t").agg(F.max("v").alias("v")))
    w = Window.partitionBy("k").orderBy("t")
    nxt = (o.withColumn("t1", F.lead("t").over(w))
           .withColumn("v1", F.lead("v").over(w)))
    empty = F.expr("CAST(array() AS array<bigint>)")
    # first grid multiple STRICTLY after t: (t div step + 1) * step
    first_in = (F.expr(f"(t div {step} + 1) * {step}")).cast("long")
    own = F.concat(
        F.when(F.col("t") % step == 0, F.array(F.col("t")))
         .otherwise(empty),
        F.when(first_in <= F.col("t1") - 1,
               F.sequence(first_in, F.col("t1") - 1,
                          F.lit(step).cast("long")))
         .otherwise(empty))
    g = nxt.select("k", "t", "v", "t1", "v1",
                   F.explode(own).alias("tg"))
    hit = F.col("tg") == F.col("t")
    t1o = F.when(hit, F.col("t")).otherwise(F.col("t1"))
    v1o = F.when(hit, F.col("v")).otherwise(F.col("v1"))
    frac = ((F.col("tg") - F.col("t")).cast("double")
            / (t1o - F.col("t")).cast("double"))
    interp = F.when(t1o == F.col("t"), F.col("v")) \
        .otherwise(F.col("v") + (v1o - F.col("v")) * frac)
    return (g.select(
        F.col("k").alias(key_col), F.col("tg").alias(ts_col),
        F.col("t").alias("prev_ts"), t1o.alias("next_ts"),
        interp.alias("v_interp"))
        .orderBy(key_col, ts_col))


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


def rolling_zscore_anomalies(df: DataFrame, key_col: str,
                             order_cols: list[str], value_col: str,
                             lookback: int = 20, k: int = 2,
                             scale: int = 10_000,
                             min_obs: int = 8) -> DataFrame:
    """Per-key rolling z-score anomaly detection: flag an observation
    whose deviation from its own trailing ``lookback``-row mean exceeds
    ``k`` trailing population standard deviations.

    The test runs ENTIRELY in int64 so it is bit-exact on any engine
    (a cross-engine ``stddev`` would mix Welford vs sum-of-squares
    float paths and never hash-match): values are quantized to
    ``v = floor(value * scale)`` and the flag condition

        (v - mean)^2 > k^2 * var_pop

    is cleared of divisions by multiplying through by ``n^2``:

        (n*v - s)^2 > k^2 * (n*ss - s^2)

    with ``s = sum(v)``, ``ss = sum(v^2)`` over the trailing window —
    every term an exact integer. Caller must size ``scale`` so
    ``(n * v_max)^2`` fits int64 (asserted cheaply at plan build is
    impossible; document per call site).

    Scale shape: one shuffle on ``key_col`` with an in-partition sort
    by ``order_cols``, then three running sums in a single window pass
    — O(1) state per row, no self-join, no Python. The trailing window
    is rows-based, so late/duplicate timestamps are handled by the
    deterministic composite ordering, not dropped.
    """
    v = F.floor(F.col(value_col) * F.lit(float(scale))).cast("long")
    w = (Window.partitionBy(key_col).orderBy(*order_cols)
         .rowsBetween(-(lookback - 1), 0))
    d = (df.withColumn("v_q", v)
         .withColumn("n_w", F.count("v_q").over(w))
         .withColumn("s_w", F.sum("v_q").over(w))
         .withColumn("ss_w", F.sum(F.col("v_q") * F.col("v_q")).over(w)))
    dev = F.col("n_w") * F.col("v_q") - F.col("s_w")
    var_n2 = (F.col("n_w") * F.col("ss_w")
              - F.col("s_w") * F.col("s_w"))
    return (d.filter((F.col("n_w") >= min_obs)
                     & (dev * dev > F.lit(k * k) * var_n2))
            .select(key_col, *order_cols, "v_q", "n_w", "s_w")
            .orderBy(key_col, *order_cols))


def activity_islands(df: DataFrame, key_col: str, ts_col: str
                     ) -> DataFrame:
    """Gaps-and-islands over per-key activity days: collapse each
    key's distinct active days into maximal runs of CONSECUTIVE days,
    reporting per key the day count, island count, and longest run.

    Days are fixed-width epoch buckets (``epoch_us // 86_400_000_000``)
    — integer division on the stored instant, so the same row lands in
    the same day on any engine in any session timezone (same contract
    as ``retention_cohorts``). The island id is the classic
    ``day - row_number()`` difference: constant within a consecutive
    run, distinct across runs.

    Scale shape: one shuffle on ``key_col`` carrying one row per
    (key, active day) after a map-side-combinable distinct, an
    in-partition sort for the row_number, then two hash-aggs that
    reuse the same partitioning — no joins, no driver state.
    """
    day = F.expr(f"unix_micros({ts_col}) div 86400000000")
    days = df.select(F.col(key_col), day.alias("d")).distinct()
    w = Window.partitionBy(key_col).orderBy("d")
    runs = (days.withColumn("grp", F.col("d") - F.row_number().over(w))
            .groupBy(key_col, "grp")
            .agg(F.count(F.lit(1)).alias("run_len")))
    return (runs.groupBy(key_col)
            .agg(F.sum("run_len").alias("n_active_days"),
                 F.count(F.lit(1)).alias("n_islands"),
                 F.max("run_len").alias("longest_run"))
            .orderBy(key_col))


#: DuckDB twin of :func:`rolling_zscore_anomalies` with the registered
#: parameters (lookback=20, k=2, scale=1e4, min_obs=8) on the events
#: table — ONE source of truth shared by the batch query and the
#: streaming stateful twin (their outputs are defined to be identical).
ROLLING_ANOMALY_ORACLE_SQL = """
WITH q AS (
  SELECT user_id, event_id, ts,
         CAST(floor(value * 10000) AS BIGINT) AS v_q
  FROM events
), w AS (
  SELECT user_id, event_id, v_q,
         CAST(COUNT(v_q) OVER win AS BIGINT) AS n_w,
         CAST(SUM(v_q) OVER win AS BIGINT) AS s_w,
         CAST(SUM(v_q * v_q) OVER win AS BIGINT) AS ss_w
  FROM q
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, v_q, n_w, s_w
FROM w
WHERE n_w >= 8
  AND (n_w * v_q - s_w) * (n_w * v_q - s_w)
      > 4 * (n_w * ss_w - s_w * s_w)
ORDER BY user_id, event_id
"""


def ewma_halving(df: DataFrame, key_col: str, order_cols: list[str],
                 value_col: str, frame: int = 32,
                 scale: int = 100) -> DataFrame:
    """Per-key trailing EWMA with decay α = 1/2 over the last ``frame``
    observations — the smoothing/forecast-baseline pass of a metrics
    pipeline, expressed so the result is BIT-EXACT across engines.

    A float EWMA is a sequential recurrence whose rounding depends on
    the summation path, so a naive port never hash-matches. With
    α = 1/2 every weight is a power of two: the windowed sum

        s_t = Σ_{k=0}^{min(t,frame)-1}  q_{t-k} · 2^-(k+1)

    over quantized values ``q = round(value·scale)`` is a sum of exact
    dyadic rationals, and stays EXACT in double as long as
    ``log2(max|q|) + frame ≤ 53`` (the events table: |q| < 2^16,
    frame 32 → 48 bits; caller must size scale/frame accordingly).
    Exact partial sums are order- and association-independent, so ANY
    evaluation strategy — the left fold here, the weighted self-join in
    the oracle — produces the identical double. The result is
    normalized by the exact-dyadic weight total (1 − 2^-n) and
    de-quantized; those two final divisions are each correctly rounded,
    hence still bit-identical cross-engine.

    Scale shape: ONE shuffle on ``key_col`` with an in-partition sort
    by ``order_cols``; ``collect_list`` over a rows-frame window holds
    ≤ ``frame`` int64 values per row (bounded state, no skew pitfall —
    hot keys cost O(frame) memory, not O(history)), and the fold is a
    whole-stage-codegen higher-order expression. No self-join, no
    Python, no unbounded state.
    """
    q = F.round(F.col(value_col) * F.lit(float(scale))).cast("long")
    w = (Window.partitionBy(key_col).orderBy(*order_cols)
         .rowsBetween(-(frame - 1), 0))
    lst = F.collect_list("q_v").over(w)
    d = (df.withColumn("q_v", q)
         .withColumn("lst", lst)
         .withColumn("n_window", F.size("lst")))
    folded = F.aggregate(
        F.col("lst"), F.lit(0.0),
        lambda acc, x: (x.cast("double") + acc) / F.lit(2.0))
    norm = F.lit(1.0) - F.pow(F.lit(2.0), -F.col("n_window"))
    # timestamps go out as epoch micros (the repo's tz-proof compare
    # convention); ordering uses the emitted names (same total order).
    names = [f"{c}_us"
             if dict(df.dtypes).get(c, "").startswith("timestamp") else c
             for c in order_cols]
    order_out = [F.unix_micros(c).alias(n) if n != c else F.col(c)
                 for c, n in zip(order_cols, names)]
    # an ALL-NULL window (n_window = 0, possible only when value_col
    # carries nulls) has no defined EWMA: norm is exactly 0.0 there,
    # which ANSI mode (Spark 4 default) rejects as DIVIDE_BY_ZERO
    # mid-scan — guard the branch explicitly and emit NULL (the
    # streaming twin emits the same; NaN is not an option there, since
    # pandas→Arrow reads a float64 NaN as the null sentinel anyway)
    ewma = F.when(F.col("n_window") == 0,
                  F.lit(None).cast("double")) \
        .otherwise((folded / norm) / F.lit(float(scale)))
    return (d.select(key_col, *order_out, value_col, "n_window",
                     ewma.alias("ewma"))
            .orderBy(key_col, *names))


#: DuckDB twin of :func:`ewma_halving` on the events table — the
#: weighted self-join evaluation of the same exact-dyadic sum (see the
#: docstring: exactness makes the two strategies bit-identical).
EWMA_HALVING_ORACLE_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
         CAST(round(value * 100) AS BIGINT) AS q_v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), s AS (
  SELECT a.user_id, a.event_id, a.ts_us, a.value,
         CAST(COUNT(*) AS INT) AS n_window,
         SUM(b.q_v * power(2.0, -(a.rn - b.rn + 1))) AS swt
  FROM e a JOIN e b
    ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 31 AND a.rn
  GROUP BY 1, 2, 3, 4
)
SELECT user_id, ts_us, event_id, value, n_window,
       (swt / (1 - power(2.0, -n_window))) / 100.0 AS ewma
FROM s ORDER BY user_id, ts_us, event_id
"""


def day_island_intervals(df: DataFrame, key_col: str,
                         ts_col: str) -> DataFrame:
    """:func:`activity_islands`' interval-producing half: maximal runs
    of CONSECUTIVE active days per key as ``(key, start_day,
    end_day)`` rows (epoch-day integers, inclusive ends) — the
    reusable building block when downstream wants the intervals
    themselves (overlap joins, coverage maps) rather than run
    statistics. Same tz-proof day bucketing and ``day − row_number``
    run id; same single-shuffle scale shape.
    """
    day = F.expr(f"unix_micros({ts_col}) div 86400000000")
    days = df.select(F.col(key_col), day.alias("d")).distinct()
    w = Window.partitionBy(key_col).orderBy("d")
    return (days.withColumn("grp", F.col("d") - F.row_number().over(w))
            .groupBy(key_col, "grp")
            .agg(F.min("d").alias("start_day"),
                 F.max("d").alias("end_day"))
            .drop("grp"))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          key_col: str, start_col: str = "start_day",
                          end_col: str = "end_day",
                          left_prefix: str = "a_",
                          right_prefix: str = "b_") -> DataFrame:
    """Per-key interval OVERLAP join: every (left, right) interval pair
    of the same key with ``s₁ ≤ e₂ AND s₂ ≤ e₁`` (inclusive ends) plus
    the overlap length — the interval-algebra primitive behind
    concurrent-session analysis, promo-window attribution, and
    schedule conflict checks.

    Scale shape: the key is the shuffle key — a plain hash equi-join
    with the overlap predicate applied post-match, NEVER a nested-loop
    over unrelated keys. The fan-out per key is |L_k|·|R_k| interval
    PAIRS, bounded in practice because interval sets per key are
    coarse (day-runs, sessions) — for pathological hot keys, pre-split
    the key by a time-bucket salt (both sides bucket an interval by
    the buckets it covers and dedup on the first shared bucket).
    Intervals must be integral (epoch days/seconds).
    """
    lcols = [c for c in left.columns if c != key_col]
    rcols = [c for c in right.columns if c != key_col]
    l = left.select(key_col, *[F.col(c).alias(f"{left_prefix}{c}")
                               for c in lcols])
    r = right.select(key_col, *[F.col(c).alias(f"{right_prefix}{c}")
                                for c in rcols])
    ls, le = f"{left_prefix}{start_col}", f"{left_prefix}{end_col}"
    rs, re_ = f"{right_prefix}{start_col}", f"{right_prefix}{end_col}"
    return (l.join(r, key_col)
            .filter((F.col(ls) <= F.col(re_))
                    & (F.col(rs) <= F.col(le)))
            .withColumn("overlap_len",
                        F.least(F.col(le), F.col(re_))
                        - F.greatest(F.col(ls), F.col(rs)) + 1))
