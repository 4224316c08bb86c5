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
