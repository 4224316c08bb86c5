"""Multimodal columns — image/audio/video payloads as opaque ``binary``
columns with typed metadata, processed via Arrow-batched Pandas
(``mapInPandas``).

Design for 100 TB:

* the payload column stays ``BinaryType`` end-to-end; Spark never
  interprets it, so predicate pushdown / column pruning on the METADATA
  columns still reach the parquet scan (a metadata-only query must not
  read payload bytes — keep payloads in their own parquet column so the
  columnar reader skips them);
* per-record work runs inside ``mapInPandas`` over Arrow record
  batches — the Python boundary is crossed once per batch, not per row,
  and batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
  is payload-size-aware;
* heavy decode (image/audio codecs) is isolated behind
  :func:`decode_payload`, which raises ``NotImplementedError`` in this
  container (codec libraries are deliberately absent) — the Spark-side
  plumbing (schema, batching, partitioning) is real and tested via the
  metadata extractor, which exercises the identical batch path.

The synthetic payloads come from :func:`with_binary_payload` (UTF-8
document bytes prefixed with a fixed fake header), so metadata
extraction has a DuckDB-expressible oracle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: fake container header: 4-byte magic + 2×2-byte big-endian dimensions
MAGIC = b"MM01"

META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("payload_md5", T.StringType(), False),
    T.StructField("magic_ok", T.BooleanType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def with_binary_payload(docs: DataFrame, text_col: str = "text",
                        out: str = "payload") -> DataFrame:
    """Deterministic binary payload per document: MAGIC + 2×2-byte
    dims derived from the id + the UTF-8 text bytes. Pure column
    expression (no Python)."""
    did = F.col("doc_id")
    dims = F.concat(
        # width = doc_id % 256 in byte 5 (byte 4 zero), height likewise
        F.lit(bytes([0])), _byte(did % 256),
        F.lit(bytes([0])), _byte((did * 7) % 256))
    return docs.withColumn(
        out, F.concat(F.lit(MAGIC), dims, F.encode(F.col(text_col), "UTF-8")))


def _byte(c) -> F.Column:
    """One-byte binary from an int column in [0, 256)."""
    return F.unhex(F.lpad(F.conv(c.cast("string"), 10, 16), 2, "0"))


def extract_metadata(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction: byte length, md5, header
    parse. This is the template every real decoder follows — same
    batch iterator shape, same bounded memory contract."""
    cols = df.select(id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "n_bytes": payloads.map(len).astype("int32"),
                # md5 over the canonical UPPERCASE-hex encoding of the
                # bytes (portable: SQL engines md5 only VARCHAR)
                "payload_md5": payloads.map(
                    lambda b: hashlib.md5(
                        bytes(b).hex().upper().encode()).hexdigest()),
                "magic_ok": payloads.map(
                    lambda b: bytes(b[:4]) == MAGIC),
                "width": payloads.map(
                    lambda b: int.from_bytes(bytes(b[4:6]), "big")),
                "height": payloads.map(
                    lambda b: int.from_bytes(bytes(b[6:8]), "big")),
            })

    return cols.mapInPandas(run, META_SCHEMA)


def decode_payload(df: DataFrame, payload_col: str = "payload",
                   codec: str = "image") -> DataFrame:
    """Decode payloads into pixel/sample arrays.

    NOT implemented in this container: image/audio codec libraries
    (Pillow, torchaudio, av) are unavailable by design. The production
    implementation plugs a decoder into the same ``mapInPandas``
    template as :func:`extract_metadata`; everything around it —
    schema, Arrow batching, memory bounds — is already exercised."""
    raise NotImplementedError(
        f"payload decode ({codec}) requires codec libraries not present "
        "in this environment; see extract_metadata for the batch "
        "template the decoder plugs into")
