"""Ingest the reference repo's REAL wire artifacts.

``/root/reference/hudi/new_arvo_samples_hudi/`` ships actual
Kafka-Connect-S3-sink output: Avro OCF files (null codec) of the
Debezium-flattened ``moma.public.artists`` / ``artworks`` topics plus
their ``-value.avsc`` schemas. Reading them through the engine's
distributed Avro source (``sources/files.py::read_avro`` —
binaryFile scan + Arrow-batched pure-Python OCF parse) is the
strongest available no-broker parity check: the byte streams were
produced by the reference's own pipeline, not by this repo's writer.

Auto-skips if the reference checkout is absent (the tests never write
to it).
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

REF_DIR = "/root/reference/hudi/new_arvo_samples_hudi"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference artifacts not present")


def _avro_type_to_spark(t):
    if isinstance(t, list):                      # ["null", X]
        t = [x for x in t if x != "null"][0]
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-millis":
            return T.TimestampType()
        t = t["type"]
    return {"int": T.IntegerType(), "long": T.LongType(),
            "float": T.FloatType(), "double": T.DoubleType(),
            "string": T.StringType(), "boolean": T.BooleanType(),
            "bytes": T.BinaryType()}[t]


def _reader_schema(avsc_path):
    rec = json.load(open(avsc_path))
    fields = [T.StructField(f["name"], _avro_type_to_spark(f["type"]),
                            isinstance(f["type"], list))
              for f in rec["fields"]]
    return json.dumps(rec), T.StructType(fields)


@pytest.mark.parametrize("topic,key_field", [
    ("moma.public.artists", "artist_id"),
    ("moma.public.artworks", "artwork_id"),
])
def test_read_reference_connect_sink_files(spark, tmp_path, topic,
                                           key_field):
    from kafka_connect_msk_demo_spark.sources.files import read_avro

    avro_json, schema = _reader_schema(
        os.path.join(REF_DIR, f"{topic}-value.avsc"))
    # stage only this topic's files (read_avro globs *.avro in a dir)
    stage = tmp_path / "stage"
    stage.mkdir()
    n_files = 0
    for f in sorted(os.listdir(REF_DIR)):
        if f.startswith(topic) and f.endswith(".avro"):
            (stage / f).write_bytes(
                open(os.path.join(REF_DIR, f), "rb").read())
            n_files += 1
    assert n_files >= 3, "reference ships at least three chunks per topic"
    df = read_avro(spark, str(stage), avro_json, schema)
    rows = df.count()
    assert rows > 0
    # Kafka Connect S3 sink writes offset-ranged chunks (+0+0000000000,
    # +0+0000000300, ...): record count must exceed the highest base
    # offset, and the Debezium metadata columns must be populated
    max_off = max(int(f.split("+")[-1].split(".")[0])
                  for f in os.listdir(REF_DIR)
                  if f.startswith(topic) and f.endswith(".avro"))
    assert rows > max_off
    sample = df.filter(F.col(key_field).isNotNull())
    assert sample.count() == rows, "key field must be non-null everywhere"
    ops = {r["__op"] for r in df.select("__op").distinct().collect()}
    assert ops <= {"r", "c", "u", "d", None} and ops
    tables = {r["__table"] for r in
              df.select("__table").distinct().collect()}
    assert tables == {topic.rsplit(".", 1)[-1]}


def test_reference_files_roundtrip_through_upsert(spark, tmp_path):
    """The reference artifacts drive the engine's own CDC plane: the
    artists chunks MERGE into an UpsertTable keyed like the
    DeltaStreamer job (recordkey artist_id, ordering __source_ts_ms,
    partition nationality — deltastreamer_artists_apicurio_*.properties)
    and the table ends with exactly one live row per key."""
    from kafka_connect_msk_demo_spark.sources.files import read_avro
    from kafka_connect_msk_demo_spark.streaming.upsert import UpsertTable

    avro_json, schema = _reader_schema(
        os.path.join(REF_DIR, "moma.public.artists-value.avsc"))
    stage = tmp_path / "stage"
    stage.mkdir()
    for f in sorted(os.listdir(REF_DIR)):
        if f.startswith("moma.public.artists+") and f.endswith(".avro"):
            (stage / f).write_bytes(
                open(os.path.join(REF_DIR, f), "rb").read())
    df = read_avro(spark, str(stage), avro_json, schema)
    # the sink chunks overlap in offsets only across topics, not within;
    # rows may still contain multiple versions of a key (r then u)
    batch = (df.withColumn("__deleted",
                           F.when(F.col("__op") == "d", F.lit("true"))
                           .otherwise(F.lit("false")))
             .withColumn("nationality",
                         F.coalesce("nationality", F.lit("Unknown"))))
    t = UpsertTable(path=str(tmp_path / "t"), key_cols=["artist_id"],
                    ordering_col="__source_ts_ms", tiebreak_col="__lsn",
                    partition_by="nationality")
    t.merge_batch(batch, 0)
    out = t.read(spark)
    n_keys = batch.filter(F.col("__deleted") == "false") \
        .select("artist_id").distinct().count()
    assert out.count() <= n_keys
    assert out.groupBy("artist_id").count() \
        .filter(F.col("count") > 1).count() == 0
