"""Skew mitigation — salting for hot keys.

AQE's skew-join handling (on by default in session.py) splits oversized
post-shuffle partitions automatically, but two shapes still need manual
salting at 100 TB:

* **skewed aggregation** — one hot group key (a null-ish default, a
  mega-tenant) funnels most rows through one reducer. Partial/final
  hash aggregation already combines map-side, so salting only matters
  for aggregates whose partial state is large (collect_list, exact
  distinct). :func:`salted_agg` implements the two-stage shape:
  group by (key, salt) first, then merge the per-salt partials.
* **skewed join** — a hot key on the probe side. :func:`salted_join`
  replicates the build side ``salt_buckets`` times and scatters the
  probe side, so the hot key spreads over ``salt_buckets`` reducers.

Both are semantics-preserving (verified in tests/test_skew.py) and
deterministic: the salt is a hash of a stable column, not a random
number, so re-runs shuffle identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_on: str | Column, buckets: int,
              out: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a stable column (e.g.
    the row's unique id) — reproducible across runs, unlike rand()."""
    c = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    return df.withColumn(
        out, F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int"))


def salted_agg(df: DataFrame, group_cols: list[str], salt_on: str,
               aggs: dict[str, Column], merges: dict[str, Column],
               buckets: int = 16) -> DataFrame:
    """Two-stage aggregation over a salted key.

    ``aggs`` maps output name → stage-1 aggregate (per key+salt);
    ``merges`` maps the same names → stage-2 merge over the stage-1
    columns. Example: ``aggs={"n": F.count(F.lit(1))}``,
    ``merges={"n": F.sum("n")}``.

    Stage 1 shuffles on (key, salt) — the hot key spreads over
    ``buckets`` reducers; stage 2 shuffles ``buckets`` rows per key.
    """
    salted = with_salt(df, salt_on, buckets)
    partial = (salted.groupBy(*group_cols, "__salt")
               .agg(*[a.alias(name) for name, a in aggs.items()]))
    return (partial.groupBy(*group_cols)
            .agg(*[m.alias(name) for name, m in merges.items()]))


def salted_join(probe: DataFrame, build: DataFrame, on: str,
                salt_on: str, buckets: int = 16) -> DataFrame:
    """Skew-safe equi-join: scatter the probe side by a deterministic
    salt, replicate the (small-ish) build side across every salt value,
    join on (key, salt). Output equals ``probe.join(build, on)``.

    Build-side cost is |build| × buckets rows — use for dimension-sized
    build sides with a skewed probe key when AQE's split heuristic
    isn't enough (or isn't available, e.g. inside foreachBatch)."""
    salted_probe = with_salt(probe, salt_on, buckets)
    salts = probe.sparkSession.range(buckets) \
        .select(F.col("id").cast("int").alias("__salt"))
    replicated = build.crossJoin(F.broadcast(salts))
    return (salted_probe.join(replicated, [on, "__salt"])
            .drop("__salt"))
