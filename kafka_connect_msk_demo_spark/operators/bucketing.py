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


def ensure_bucketed(spark: SparkSession, df: DataFrame, table: str,
                    bucket_col: str, num_buckets: int = 8,
                    sort: bool = True) -> str:
    """Idempotent staging: (re)write ``df`` as a bucketed managed table
    unless one with the same row count already exists. At scale the
    bucketed write is a ONE-TIME ETL step amortized over every later
    co-located join; the row-count guard exists for local runs where
    the input may have been regenerated under the same path."""
    if spark.catalog.tableExists(table):
        if spark.table(table).count() == df.count():
            return table
        spark.sql(f"DROP TABLE {table}")
    write_bucketed(df, table, bucket_col, num_buckets, sort)
    return table


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the join key — executes without a
    shuffle on either side when their bucket specs match."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
