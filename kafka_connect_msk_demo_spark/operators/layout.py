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
