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
* heavy decode is isolated behind :func:`decode_payload`:
  ``codec="ppm"`` is a LIVE pure-Python decode of the uncompressed
  binary PPM (P6) format (header parse + raw pixel plane, planted
  declaratively by :func:`with_ppm_payload`, exact-oracle-checked by
  the registered ``multimodal_decode`` query); compressed codecs
  (JPEG/PNG/audio/video) still raise ``NotImplementedError`` — their
  libraries are deliberately absent in this container — and plug into
  the identical Arrow-batch kernel shape when present.

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

from ..arrow_guard import exact_longs

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
        # width = doc_id % 256 in byte 5 (byte 4 zero), height likewise.
        # Reduce mod 256 BEFORE the ×7: (did % 256) * 7 % 256 is
        # congruent to (did * 7) % 256 but cannot overflow — a 2^62
        # doc_id times 7 trips ANSI ARITHMETIC_OVERFLOW.
        F.lit(bytes([0])), _byte(did % 256),
        F.lit(bytes([0])), _byte((did % 256) * 7 % 256))
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
                "doc_id": exact_longs(pdf[id_col], id_col),
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


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_md5", T.StringType(), False),
    T.StructField("frame_bytes", T.IntegerType(), False),
])


def frame_sample(df: DataFrame, frame_size: int = 64, every_n: int = 4,
                 payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Video-style frame sampling: the payload body (after the 8-byte
    header) is treated as consecutive ``frame_size``-byte frames; every
    ``every_n``-th frame is emitted as its own row — the 1→N row
    expansion shape every real frame sampler needs (one input batch
    yields a larger output batch; Arrow sizes both).

    At 100 TB the sampled frames inherit the scan's partitioning —
    no shuffle is introduced; downstream per-frame work (decode,
    embed) stays embarrassingly parallel."""
    cols = df.select(id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s, sizes = [], [], [], []
            for doc_id, payload in zip(exact_longs(pdf[id_col], id_col),
                                       pdf[payload_col]):
                body = bytes(payload)[8:]
                nframes = (len(body) + frame_size - 1) // frame_size
                for j in range(0, nframes, every_n):
                    frame = body[j * frame_size:(j + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(j)
                    md5s.append(hashlib.md5(frame).hexdigest())
                    sizes.append(len(frame))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_md5": pd.Series(md5s, dtype=object),
                "frame_bytes": pd.Series(sizes, dtype="int32")})

    return cols.mapInPandas(run, FRAME_SCHEMA)


def resize_payload(df: DataFrame, out_w: int = 8, out_h: int = 8,
                   payload_col: str = "payload",
                   id_col: str = "doc_id") -> DataFrame:
    """Resize template: payload → payload with updated header dims.

    The deterministic stand-in samples ``out_w × out_h`` body bytes at
    evenly-spaced offsets (nearest-neighbor over the byte plane) — a
    real image resize swaps only the inner function; the payload→
    payload' signature, header rewrite, and batch contract are what
    production code reuses."""
    cols = df.select(id_col, payload_col)
    target = out_w * out_h
    header = MAGIC + out_w.to_bytes(2, "big") + out_h.to_bytes(2, "big")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                body = bytes(payload)[8:]
                if body:
                    step = max(len(body) // target, 1)
                    sampled = body[::step][:target]
                else:
                    sampled = b""
                out.append(header + sampled)
            yield pd.DataFrame({"doc_id": exact_longs(pdf[id_col],
                                                       id_col),
                                "payload": pd.Series(out, dtype=object)})

    return cols.mapInPandas(run, schema)


def embed_payload(df: DataFrame, dim: int = 64,
                  payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """Feature-extraction template: payload → ``array<float>`` embedding
    of fixed ``dim``, here a deterministic md5-expansion pseudo-encoder
    (each float from one digest byte, scaled to [-1, 1]).

    The hash chain runs over HEX STRINGS, not raw digest bytes:
    ``h0 = md5(hex_upper(payload)); h_i = md5(h_{i-1})`` with the
    digests' hex chars concatenated and decoded to bytes. That choice
    makes the encoder expressible in any SQL engine whose ``md5`` takes
    VARCHAR only (same portability rule as :func:`extract_metadata`'s
    payload_md5), so the full payload → embedding stage has an exact
    DuckDB twin (``pipeline/queries.py::_sql_multimodal_embed_ann``).

    The output column type matches the ``embeddings`` table exactly, so
    the result feeds straight into the similarity family (ann_topk /
    cosine_dup_pairs) — the payload → embedding → ANN composition a
    production multimodal pipeline runs, with the encoder swapped."""
    cols = df.select(id_col, payload_col)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for payload in pdf[payload_col]:
                h = bytes(payload).hex().upper()
                hexes = []
                while sum(map(len, hexes)) < dim * 2:
                    h = hashlib.md5(h.encode()).hexdigest()
                    hexes.append(h)
                raw = bytes.fromhex("".join(hexes))[:dim]
                vecs.append([b / 127.5 - 1.0 for b in raw])
            yield pd.DataFrame({"doc_id": exact_longs(pdf[id_col],
                                                       id_col),
                                "embedding": pd.Series(vecs, dtype=object)})

    return cols.mapInPandas(run, schema)


def with_ppm_payload(docs: DataFrame, out: str = "payload") -> DataFrame:
    """Plant a REAL binary PPM (P6) image per document, fully
    declaratively (no Python on the encode side): ASCII header
    ``P6\\n{w} {h}\\n255\\n`` followed by the raw ``w*h*3`` pixel
    plane, where ``w = doc_id%4+2``, ``h = doc_id%3+2`` and pixel
    ``i`` is ``(doc_id%256 + i*7) % 256``. Every byte is a closed-form
    function of ``doc_id``, so a DuckDB oracle can recompute the
    decoded plane without ever touching binary (the fixture
    :func:`decode_payload` is graded against)."""
    did = F.col("doc_id")
    w = (did % 4 + 2)
    h = (did % 3 + 2)
    n = (w * h * 3).cast("int")
    header = F.concat(F.lit("P6\n"), w.cast("string"), F.lit(" "),
                      h.cast("string"), F.lit("\n255\n"))
    hexplane = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - F.lit(1)),
            lambda i: F.lpad(
                F.conv(((did % 256 + i * 7) % 256).cast("string"),
                       10, 16), 2, "0")), "")
    return docs.withColumn(
        out, F.concat(F.encode(header, "UTF-8"), F.unhex(hexplane)))


def _parse_ppm(buf: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary PPM (P6): magic, ``#`` comments, arbitrary
    whitespace between header tokens, maxval < 256, then exactly one
    whitespace byte before the raw ``w*h*3`` plane. Returns
    ``(width, height, maxval, plane)``; raises ValueError on anything
    malformed — a corrupt payload must fail loudly, never decode into
    garbage pixels."""
    if buf[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {buf[:2]!r})")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(buf):
            raise ValueError("truncated PPM header")
        c = buf[pos:pos + 1]
        if c == b"#":                       # comment to end of line
            nl = buf.find(b"\n", pos)
            pos = len(buf) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            # a '#' terminates a token too: netpbm comments may start
            # anywhere in the header, including right after a number
            end = pos
            while (end < len(buf) and not buf[end:end + 1].isspace()
                   and buf[end:end + 1] != b"#"):
                end += 1
            tok = buf[pos:end]
            if not tok.isdigit():
                raise ValueError(f"bad PPM header token {tok!r}")
            tokens.append(int(tok))
            pos = end
    w, h, maxval = tokens
    if w <= 0 or h <= 0:
        # netpbm requires positive dimensions; a 0 would pass the
        # plane-length check (0 == 0) and decode into a degenerate
        # empty image instead of failing loudly
        raise ValueError(f"non-positive PPM dimensions {w}x{h}")
    if not 0 < maxval < 256:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    if pos >= len(buf) or not buf[pos:pos + 1].isspace():
        raise ValueError("missing whitespace after maxval")
    pos += 1                                 # exactly ONE (PPM spec)
    plane = buf[pos:pos + w * h * 3]
    if len(plane) != w * h * 3:
        raise ValueError(
            f"truncated pixel plane: want {w * h * 3}, got {len(plane)}")
    return w, h, maxval, plane


DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("maxval", T.IntegerType(), False),
    T.StructField("plane", T.ArrayType(T.IntegerType()), False),
])


def decode_payload(df: DataFrame, payload_col: str = "payload",
                   codec: str = "image",
                   id_col: str = "doc_id") -> DataFrame:
    """Decode payloads into pixel/sample arrays.

    ``codec="ppm"`` is a REAL pure-Python decode of the uncompressed
    binary PPM (P6) format — header parse (comments, whitespace,
    maxval) + raw pixel plane — running in the same Arrow-batched
    ``mapInPandas`` template as :func:`extract_metadata`: the Python
    boundary is crossed once per batch, memory is bounded by
    ``arrow.maxRecordsPerBatch``, and the output plane is
    ``array<int>`` so every downstream step (resize, embed, aggregate)
    can stay JVM-side.

    Compressed formats (JPEG/PNG, audio, video) still raise: their
    codec libraries (Pillow, torchaudio, av) are unavailable in this
    container by design; a production decoder plugs into the identical
    kernel shape."""
    if codec != "ppm":
        raise NotImplementedError(
            f"payload decode ({codec}) requires codec libraries not "
            "present in this environment; codec='ppm' is the live "
            "pure-Python path, and extract_metadata shows the batch "
            "template other decoders plug into")
    cols = df.select(id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, mxs, planes = [], [], [], [], []
            for doc_id, payload in zip(exact_longs(pdf[id_col], id_col),
                                       pdf[payload_col]):
                w, h, mx, plane = _parse_ppm(bytes(payload))
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                mxs.append(mx)
                planes.append(list(plane))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "maxval": pd.Series(mxs, dtype="int32"),
                "plane": pd.Series(planes, dtype=object)})

    return cols.mapInPandas(run, DECODE_SCHEMA)
