"""OPTIONAL live-Kafka smoke path (VERDICT r5 stretch ask #8).

The sandbox ships no broker and no spark-sql-kafka connector jar, so
S2/S3/S5/S6 normally rest on option-shape unit tests plus the
file-envelope data plane. When a broker IS reachable (set
``SPARK_GRAFT_KAFKA_BOOTSTRAP``, e.g. ``localhost:9092``) and the
connector jar is on the session classpath, this module drives the real
wire path end-to-end: ``kafka_options`` → ``kafka_write_batch`` →
``kafka_batch`` round-trip, and a bounded ``kafka_stream`` micro-batch
drain. Everywhere else it auto-skips at collection time.
"""

import os
import socket
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP", "")


def _broker_reachable(addr: str) -> bool:
    if not addr or ":" not in addr:
        return False
    host, port = addr.rsplit(":", 1)
    try:
        with socket.create_connection((host, int(port)), timeout=2):
            return True
    except OSError:
        return False


def _kafka_source_available(spark) -> bool:
    """True iff the spark-sql-kafka DataSource resolves in this JVM."""
    try:
        spark.read.format("kafka").options(
            **{"kafka.bootstrap.servers": BOOTSTRAP,
               "subscribe": "__probe", "startingOffsets": "earliest",
               "endingOffsets": "earliest"}).load()
        return True
    except Exception as exc:  # noqa: BLE001 - classify, don't fail
        return "Failed to find data source" not in str(exc)


pytestmark = pytest.mark.skipif(
    not _broker_reachable(BOOTSTRAP),
    reason="no Kafka broker (set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port)")


def test_batch_roundtrip_real_broker(spark):
    from pyspark.sql import functions as F

    from kafka_connect_msk_demo_spark.sources.kafka import (kafka_batch,
                                                            kafka_write_batch)
    if not _kafka_source_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")
    topic = f"spark_graft_smoke_{uuid.uuid4().hex[:8]}"
    payload = spark.range(100).select(
        F.col("id").cast("string").alias("key"),
        F.to_json(F.struct(F.col("id"), (F.col("id") * 2).alias("v")))
        .cast("binary").alias("value"))
    kafka_write_batch(payload, BOOTSTRAP, topic)
    back = kafka_batch(spark, bootstrap_servers=BOOTSTRAP, topic=topic)
    rows = (back.select(F.col("key").cast("string"),
                        F.col("value").cast("string")).collect())
    assert len(rows) == 100
    keys = sorted(int(r.key) for r in rows)
    assert keys == list(range(100))


def test_stream_drain_real_broker(spark, tmp_path):
    from pyspark.sql import functions as F

    from kafka_connect_msk_demo_spark.sources.kafka import (kafka_stream,
                                                            kafka_write_batch)
    from kafka_connect_msk_demo_spark.streaming.runner import run_to_memory
    if not _kafka_source_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")
    topic = f"spark_graft_smoke_{uuid.uuid4().hex[:8]}"
    payload = spark.range(50).select(
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("string").cast("binary").alias("value"))
    kafka_write_batch(payload, BOOTSTRAP, topic)
    stream = kafka_stream(spark, bootstrap_servers=BOOTSTRAP, topic=topic,
                          starting_offsets="earliest",
                          max_offsets_per_trigger=10)
    counted = (stream.select(F.col("value").cast("string").alias("v"))
               .groupBy().count())
    out = run_to_memory(counted, output_mode="complete",
                        query_name=f"kafka_smoke_{topic}")
    assert out.collect()[0][0] == 50
