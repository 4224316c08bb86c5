"""Data-layout operators: Z-order (Morton) clustering keys.

Multi-dimensional data skipping — the ``OPTIMIZE ZORDER BY`` idea:
interleaving the bits of two bucketized dimensions yields a 1-D sort
key whose contiguous ranges cover small, square-ish TILES of the 2-D
key space. Files written in z-key order therefore carry tight min/max
ranges on BOTH dimensions simultaneously, so a scan filtered on either
dimension (or both) can skip most files — a linear sort key gives that
property on one dimension only.

Everything is pure integer arithmetic (divide / modulo / multiply),
generated as one flat expression — portable verbatim to any SQL
engine, which is what lets the layout analysis be oracle-checked
exactly. At 100 TB the z-key is computed at scan speed and handed to a
``repartitionByRange(zkey).sortWithinPartitions(zkey)`` write; the
analysis query here reports the per-file min/max spans that the file
skipper would use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_interleave_expr(b1: Column, b2: Column, bits: int) -> Column:
    """Morton interleave of two ``bits``-bit bucket ids: ``b1`` on odd
    bit positions, ``b2`` on even. Built as a flat sum of
    ``(b >> i & 1) << pos`` terms in divide/modulo arithmetic, so the
    identical formula runs on any engine."""
    terms = []
    for i in range(bits):
        terms.append((b1 / (1 << i)).cast("long") % 2
                     * (1 << (2 * i + 1)))
        terms.append((b2 / (1 << i)).cast("long") % 2 * (1 << (2 * i)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def z_interleave_sql(b1: str, b2: str, bits: int) -> str:
    """The DuckDB twin of :func:`z_interleave_expr` (``//`` integer
    division; same term order)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({b1} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({b2} // {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_file_stats(df: DataFrame, b1: Column, b2: Column,
                      bits: int = 4, files: int = 16) -> DataFrame:
    """Assign each row a z-key from two ``bits``-bit bucket ids, split
    the z-range into ``files`` equal slices (the files a z-ordered
    write would produce), and report each file's min/max span on BOTH
    dimensions — the data-skipping evidence.

    With ``files = 2^(2k)`` each slice covers a ``2^(bits-k)`` ×
    ``2^(bits-k)`` tile, so both per-file spans are ~√(cells/file) —
    vs a linear layout whose files span the FULL range of the minor
    dimension. ``tests/test_round4b_ops.py`` asserts the tile bound.

    One scan-speed projection + one hash-agg on the file id; the
    shuffle carries ``files`` rows per partition.
    """
    zbits = 2 * bits
    per_file = (1 << zbits) // files
    z = z_interleave_expr(b1, b2, bits)
    return (df.select(b1.alias("b1"), b2.alias("b2"), z.alias("z"))
            .withColumn("file_id", (F.col("z") / per_file).cast("long"))
            .groupBy("file_id")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("b1").alias("b1_min"), F.max("b1").alias("b1_max"),
                 F.min("b2").alias("b2_min"), F.max("b2").alias("b2_max"))
            .withColumn("b1_span",
                        F.col("b1_max") - F.col("b1_min") + F.lit(1))
            .withColumn("b2_span",
                        F.col("b2_max") - F.col("b2_min") + F.lit(1))
            .orderBy("file_id"))


def compaction_bins(df: DataFrame, part_col: str, order_col: str,
                    size_col: str, target: int) -> DataFrame:
    """Small-file compaction plan: within each ``part_col`` partition,
    first-fit bin-packing of items (in ``order_col`` order) into
    output files of ~``target`` bytes — the maintenance pass behind
    the reference's ``hoodie.parquet.small.file.limit=134217728``
    (deltastreamer_artists_apicurio_cow.properties:23-24) and every
    lakehouse OPTIMIZE/compact command.

    bin = cumulative-size-before DIV target: an item starts a new bin
    exactly when the bytes already placed reach the next target
    multiple, so every bin but the last holds >= target bytes minus
    one item (first-fit-decreasing is NOT used — preserving
    ``order_col`` order keeps min/max stats tight, which is the point
    of compaction). Pure integer arithmetic -> portable to the oracle.

    Scale: one window cumsum per partition (parallel across
    partitions — there is no global sequence) + one hash-agg on
    (partition, bin). At 100 TB the input is one row per FILE from
    the table's metadata/listing, i.e. millions of rows, not the data
    itself — this plans the rewrite, it does not move bytes.
    """
    from pyspark.sql import Window
    w = (Window.partitionBy(part_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return (df.withColumn("cum_before", cum_before)
            .withColumn("bin", F.expr(f"cum_before div {target}"))
            .groupBy(part_col, "bin")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(size_col).cast("long").alias("bytes_total"))
            .withColumn("fill_ratio",
                        F.col("bytes_total") / F.lit(float(target)))
            .orderBy(part_col, "bin"))


def zone_map_audit(df: DataFrame, layouts: list[tuple[str, Column]],
                   stat_col: str, lo, hi) -> DataFrame:
    """Zone-map (min/max file-skipping) effectiveness audit: for each
    candidate layout — a (name, file-id expression) pair simulating
    how a write would chunk rows into files — compute per-file min/max
    of ``stat_col``, then report how many files a range predicate
    ``stat_col BETWEEN lo AND hi`` must scan and how many rows those
    files hold vs how many actually match. The number a table
    maintainer looks at before choosing a sort/partition key: a
    layout whose files_scanned ~ files holding matches is
    well-clustered; scan_ratio ~ 1.0 means the predicate reads the
    whole table regardless of the zone maps.

    Scale: one groupBy per layout on the file id (the natural shuffle
    key — file counts are ~table_bytes/128 MB, far smaller than the
    data), then a per-layout rollup over one row per file. No global
    windows, no collects.
    """
    parts = []
    for name, file_id in layouts:
        per_file = (df
                    .select(file_id.alias("f"), F.col(stat_col).alias("s"))
                    .groupBy("f")
                    .agg(F.min("s").alias("mn"), F.max("s").alias("mx"),
                         F.count(F.lit(1)).alias("n"),
                         F.sum(F.when((F.col("s") >= lo) & (F.col("s") <= hi),
                                      1).otherwise(0)).alias("matched"))
                    .select(F.lit(name).alias("layout"), "f", "mn", "mx",
                            "n", "matched"))
        parts.append(per_file)
    files = parts[0]
    for p in parts[1:]:
        files = files.unionAll(p)
    scanned = (F.col("mn") <= hi) & (F.col("mx") >= lo)
    return (files
            .groupBy("layout")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum(F.when(scanned, 1).otherwise(0)).alias("files_scanned"),
                 F.sum(F.when(scanned, F.col("n")).otherwise(0))
                 .cast("long").alias("rows_scanned"),
                 F.sum("matched").cast("long").alias("rows_matched"),
                 F.sum("n").cast("long").alias("rows_total"))
            .withColumn("scan_ratio",
                        F.col("rows_scanned") / F.col("rows_total"))
            .orderBy("layout"))
