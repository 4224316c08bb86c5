"""Bucketed (co-located) joins — pre-shuffle once, join shuffle-free.

The reference joins its fact feed to dimensions per query (SURVEY.md
§2.5); at 100 TB a fact⋈fact join (orders ⋈ lineitem) re-shuffles both
sides every run. Hive-style bucketing amortizes that: both tables are
written ``bucketBy(N, key)`` into the warehouse, so matching keys land
in matching bucket files and Spark's scan reports the bucket spec as
its output partitioning — the sort-merge/hash join then needs NO
Exchange on either side (asserted in tests/test_bucketing.py by
walking the physical plan).

Scale contract:

* bucket count is chosen once per table (rule of thumb: target
  ~128-512 MB per bucket at full scale) and becomes the parallelism of
  every downstream co-located join;
* both sides must agree on (key, bucket count) — mismatched counts
  degrade to a normal shuffle join;
* ``sortBy`` on the bucket key additionally removes the in-join sort
  for sort-merge joins.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _drop_stale_location(spark: SparkSession, table: str) -> None:
    """With the in-memory catalog, table METADATA dies with the session
    but the managed-table DIRECTORY in the warehouse survives — a
    fresh session then fails saveAsTable with LOCATION_ALREADY_EXISTS.
    Remove the orphaned location (local filesystems only; a real
    deployment uses a persistent metastore and never hits this)."""
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme in ("", "file"):
        loc = os.path.join(wh.path, table.lower())
        if os.path.exists(loc):
            shutil.rmtree(loc)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int = 8, sort: bool = True,
                   fmt: str = "parquet") -> None:
    """Persist ``df`` as a bucketed managed table (overwriting any
    previous version). The (column, count) pair is the co-location
    contract every later join relies on."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        _drop_stale_location(spark, table)
    w = (df.write.mode("overwrite").format(fmt)
         .bucketBy(num_buckets, bucket_col))
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def _content_fingerprint(df: DataFrame):
    """Order-independent content digest: row count + sum of per-row
    xxhash64 over all columns (summed as DECIMAL(38,0), so it neither
    overflows nor — unlike XOR — cancels duplicate rows). One scan,
    the same cost class as the count() it replaces."""
    from pyspark.sql import functions as F

    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return tuple(df.agg(
        F.count(F.lit(1)),
        F.sum(h.cast("decimal(38,0)"))).collect()[0])


def _bucket_spec_matches(spark: SparkSession, table: str,
                         bucket_col: str, num_buckets: int) -> bool:
    meta = {r.col_name: (r.data_type or "")
            for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect()}
    return (meta.get("Num Buckets", "").strip() == str(num_buckets)
            and bucket_col in meta.get("Bucket Columns", ""))


def ensure_bucketed(spark: SparkSession, df: DataFrame, table: str,
                    bucket_col: str, num_buckets: int = 8,
                    sort: bool = True) -> str:
    """Idempotent staging: (re)write ``df`` as a bucketed managed table
    unless an existing one matches BOTH the requested bucket spec
    (column, count — the co-location contract downstream zero-Exchange
    joins rely on) AND an order-independent content fingerprint. A
    bare row-count guard would silently serve stale data after the
    input is regenerated in place (row counts are a function of SF) or
    a table bucketed on the wrong key. At scale the bucketed write is
    a ONE-TIME ETL step; the fingerprint scan is the same cost class
    as the count it replaces."""
    if spark.catalog.tableExists(table):
        if (_bucket_spec_matches(spark, table, bucket_col, num_buckets)
                and _content_fingerprint(
                    spark.table(table).select(*df.columns))
                == _content_fingerprint(df)):
            return table
        spark.sql(f"DROP TABLE {table}")
    write_bucketed(df, table, bucket_col, num_buckets, sort)
    return table


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the join key — executes without a
    shuffle on either side when their bucket specs match."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
