"""Unit tests for the column-level Avro serde (E5/E6) — the
``to_avro_column``/``from_avro_column`` pair on the Pandas-UDF fallback
path (the configuration this container always runs), plus the console
sinks (S7/S8)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_msk_demo_spark.catalog import struct_to_avro_json
from kafka_connect_msk_demo_spark.serde import (from_avro_column,
                                                to_avro_column)
from kafka_connect_msk_demo_spark.streaming.runner import (
    console_sink_batch, console_sink_stream)

SCHEMA = T.StructType([
    T.StructField("id", T.IntegerType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("amount", T.FloatType(), True),
    T.StructField("ok", T.BooleanType(), True),
    T.StructField("ts", T.TimestampType(), True),
])


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5, True, "2021-06-01 12:00:00.25"),
         (2, None, None, None, None),
         (3, "δ unicode", -0.25, False, "1969-12-31 23:59:59")],
        "id int, name string, amount float, ok boolean, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))


def test_avro_column_roundtrip(spark):
    df = _df(spark)
    avro_json = struct_to_avro_json("rec", SCHEMA)
    enveloped = df.select(
        to_avro_column(df, avro_json).alias("value"))
    back = from_avro_column(enveloped, avro_json, SCHEMA)
    assert sorted(map(tuple, back.collect())) \
        == sorted(map(tuple, df.collect()))


def test_avro_column_value_is_binary(spark):
    df = _df(spark)
    avro_json = struct_to_avro_json("rec", SCHEMA)
    out = df.select(to_avro_column(df, avro_json).alias("value"))
    assert isinstance(out.schema["value"].dataType, T.BinaryType)
    assert all(isinstance(r.value, (bytes, bytearray))
               for r in out.collect())


def test_console_sinks_smoke(spark, sf_small):
    from kafka_connect_msk_demo_spark.catalog import (load_table,
                                                      stream_table)
    console_sink_batch(load_table(spark, sf_small, "region"), num_rows=5)
    q = console_sink_stream(
        stream_table(spark, sf_small, "region"),
        num_rows=5, output_mode="append", query_name="t_console")
    q.awaitTermination()


# -- OCF parser edge cases (Avro spec compliance) ---------------------------

def test_ocf_parse_rejects_unsupported_codec():
    """A snappy/zstandard-coded OCF must fail loudly, not feed
    compressed bytes to the record decoder (null and deflate are the
    supported codecs)."""
    import io

    import pandas as pd
    import pytest

    from kafka_connect_msk_demo_spark.sources import files as fmod

    pdf = pd.DataFrame({"id": [1]})
    aj = '{"type":"record","name":"r","fields":[{"name":"id","type":"int"}]}'
    blob = bytearray(fmod._ocf_bytes(pdf, aj))
    buf = io.BytesIO()
    buf.write(fmod._OCF_MAGIC)
    meta = {"avro.schema": aj, "avro.codec": "snappy"}
    buf.write(fmod._zigzag(len(meta)))
    for k, v in meta.items():
        kb, vb = k.encode(), v.encode()
        buf.write(fmod._zigzag(len(kb)) + kb)
        buf.write(fmod._zigzag(len(vb)) + vb)
    buf.write(fmod._zigzag(0))
    buf.write(blob[-16:])  # reuse a sync marker
    with pytest.raises(ValueError, match="snappy"):
        fmod._ocf_parse(buf.getvalue())


def test_ocf_parse_negative_map_block_count():
    """Avro spec: a negative map-block count is followed by a byte-size
    long, with abs(n) entries — writers may emit this form."""
    import io

    import pandas as pd

    from kafka_connect_msk_demo_spark.sources import files as fmod

    pdf = pd.DataFrame({"id": [7]})
    aj = '{"type":"record","name":"r","fields":[{"name":"id","type":"int"}]}'
    normal = fmod._ocf_bytes(pdf, aj)
    schema_json, payloads, counts = fmod._ocf_parse(normal)

    # rebuild the same file with the metadata map in negative-count form
    buf = io.BytesIO()
    buf.write(fmod._OCF_MAGIC)
    meta = {"avro.schema": aj, "avro.codec": "null"}
    entries = io.BytesIO()
    for k, v in meta.items():
        kb, vb = k.encode(), v.encode()
        entries.write(fmod._zigzag(len(kb)) + kb)
        entries.write(fmod._zigzag(len(vb)) + vb)
    eb = entries.getvalue()
    buf.write(fmod._zigzag(-len(meta)))  # negative count ...
    buf.write(fmod._zigzag(len(eb)))     # ... then byte size
    buf.write(eb)
    buf.write(fmod._zigzag(0))
    # tail = sync + blocks: everything after the original header, whose
    # length we recover by re-serializing it
    hdr = io.BytesIO()
    hdr.write(fmod._OCF_MAGIC)
    hdr.write(fmod._zigzag(len(meta)))
    for k, v in meta.items():
        kb, vb = k.encode(), v.encode()
        hdr.write(fmod._zigzag(len(kb)) + kb)
        hdr.write(fmod._zigzag(len(vb)) + vb)
    hdr.write(fmod._zigzag(0))
    buf.write(normal[len(hdr.getvalue()):])
    schema_json2, payloads2, counts2 = fmod._ocf_parse(buf.getvalue())
    assert (schema_json2, payloads2, counts2) == (schema_json, payloads, counts)


def test_avro_schema_resolution_block():
    """Writer→reader resolution: promotions, dropped fields, defaults,
    and nullable-union handling at the codec level."""
    import pandas as pd

    from kafka_connect_msk_demo_spark.serde import (
        avro_decode_block_resolved, avro_encode_rows)

    writer = """
    {"type":"record","name":"v1","fields":[
      {"name":"id","type":"int"},
      {"name":"name","type":"string"},
      {"name":"val","type":["float","null"]}]}
    """
    reader = """
    {"type":"record","name":"v2","fields":[
      {"name":"id","type":"long"},
      {"name":"val","type":["double","null"]},
      {"name":"score","type":"double","default":1.5},
      {"name":"tag","type":["null","string"],"default":null}]}
    """
    rows = pd.DataFrame({"id": [1, 2], "name": ["a", "b"],
                         "val": [2.5, None]})
    body = b"".join(avro_encode_rows(rows, writer))
    out = avro_decode_block_resolved(body, 2, writer, reader)
    assert list(out.columns) == ["id", "val", "score", "tag"]
    assert list(out["id"]) == [1, 2]            # int -> long
    assert out["val"][0] == 2.5 and out["val"][1] is None
    assert list(out["score"]) == [1.5, 1.5]     # reader default
    assert list(out["tag"]) == [None, None]
    # "name" (writer-only) was decoded-and-skipped, not mis-aligned


def test_avro_schema_resolution_rejects_illegal():
    import pytest

    from kafka_connect_msk_demo_spark.serde import resolve_decode_plan

    w = '{"type":"record","name":"w","fields":[{"name":"a","type":"double"}]}'
    r = '{"type":"record","name":"r","fields":[{"name":"a","type":"int"}]}'
    with pytest.raises(ValueError, match="illegal Avro promotion"):
        resolve_decode_plan(w, r)
    r2 = ('{"type":"record","name":"r","fields":['
          '{"name":"a","type":"double"},{"name":"b","type":"long"}]}')
    with pytest.raises(ValueError, match="no default"):
        resolve_decode_plan(w, r2)


def test_avro_mixed_schema_directory_resolves(spark, tmp_path):
    """Two OCF files written with DIFFERENT schema generations read as
    one uniform frame under resolve=True — the schema-lifetime
    directory case."""
    from pyspark.sql import types as T

    from kafka_connect_msk_demo_spark.sources.files import (read_avro,
                                                            write_avro)

    v1 = """
    {"type":"record","name":"e","fields":[
      {"name":"id","type":"long"},
      {"name":"amount","type":"float"}]}
    """
    v2 = """
    {"type":"record","name":"e","fields":[
      {"name":"id","type":"long"},
      {"name":"amount","type":"double"},
      {"name":"source","type":"string","default":"legacy"}]}
    """
    old = spark.createDataFrame([(1, 1.5), (2, 2.25)],
                                "id long, amount float")
    new = spark.createDataFrame([(3, 3.125, "api")],
                                "id long, amount double, source string")
    p = str(tmp_path / "mixed")
    write_avro(old, p + "/g1", v1)
    write_avro(new, p + "/g2", v2)
    reader_schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("amount", T.DoubleType(), False),
        T.StructField("source", T.StringType(), False)])
    import glob as _g
    # read the whole tree as one frame
    back = read_avro(spark, p + "/*", v2, reader_schema, resolve=True)
    got = sorted(map(tuple, back.collect()))
    assert got == [(1, 1.5, "legacy"), (2, 2.25, "legacy"),
                   (3, 3.125, "api")]
