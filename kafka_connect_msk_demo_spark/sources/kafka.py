"""Kafka source/sink builders — option-complete (S2/S3/S4/S5/S6, T10).

The sandbox has no broker, so correctness queries run against the
file-envelope stand-in (``catalog.stream_table``); these builders carry
the full production configuration surface of the reference scripts and
are unit-tested at the options level:

* batch scan bounded by offsets — ``02_batch_read_kafka.py:36-60``
  (``startingOffsets=earliest``, ``endingOffsets=latest``), also
  ``07:44-70``, ``13:40-64``;
* tolerant read — ``failOnDataLoss=false``
  (``13_batch_read_results_avro.ipynb`` cell 6);
* stream scan — ``03:34-57`` and five twins;
* batch sink — ``01:74-80`` (key/value binary), Avro variant
  ``11:72-81``;
* streaming sink + checkpoint — ``06:105-112``, ``12:112-119`` (see
  also streaming/runner.kafka_sink).

Option building is a pure function (``kafka_options``) so the exact
wire configuration — the part that breaks silently in production — is
testable without a broker.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_options(bootstrap_servers: str,
                  topic: str | None = None,
                  topics: list[str] | None = None,
                  pattern: str | None = None,
                  starting_offsets: str | dict = "earliest",
                  ending_offsets: str | dict | None = None,
                  fail_on_data_loss: bool | None = None,
                  max_offsets_per_trigger: int | None = None,
                  extra: dict[str, str] | None = None) -> dict[str, str]:
    """The reference's full Kafka read-option surface as one dict.

    ``starting_offsets``/``ending_offsets`` accept the string presets
    or a per-partition dict (serialized to the JSON form the source
    expects: ``{"topic": {"0": 23}}``).
    """
    subscriptions = [s for s in (topic, topics, pattern) if s]
    if len(subscriptions) != 1:
        raise ValueError("exactly one of topic/topics/pattern is required")
    opts: dict[str, str] = {"kafka.bootstrap.servers": bootstrap_servers}
    if topic:
        opts["subscribe"] = topic
    elif topics:
        opts["subscribe"] = ",".join(topics)
    else:
        opts["subscribePattern"] = pattern  # type: ignore[assignment]
    opts["startingOffsets"] = (
        starting_offsets if isinstance(starting_offsets, str)
        else json.dumps(starting_offsets))
    if ending_offsets is not None:
        opts["endingOffsets"] = (
            ending_offsets if isinstance(ending_offsets, str)
            else json.dumps(ending_offsets))
    if fail_on_data_loss is not None:
        opts["failOnDataLoss"] = str(fail_on_data_loss).lower()
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update(extra or {})
    return opts


def kafka_batch(spark: SparkSession, **kwargs) -> DataFrame:
    """S2/S4/T10: bounded Kafka scan. Defaults mirror
    ``02_batch_read_kafka.py:36-60`` — earliest→latest, the full topic.
    """
    kwargs.setdefault("ending_offsets", "latest")
    return (spark.read.format("kafka")
            .options(**kafka_options(**kwargs)).load())


def kafka_stream(spark: SparkSession, **kwargs) -> DataFrame:
    """S3: unbounded Kafka scan (``03:34-57``). ``ending_offsets`` is
    rejected (streams have no end)."""
    if kwargs.get("ending_offsets") is not None:
        raise ValueError("ending_offsets is batch-only")
    return (spark.readStream.format("kafka")
            .options(**kafka_options(**kwargs)).load())


def kafka_write_batch(df: DataFrame, bootstrap_servers: str,
                      topic: str) -> None:
    """S5 (01:74-80): batch sink. The frame must already carry
    string/binary ``key`` and ``value`` columns (E4/E6 encoders)."""
    (df.select(F.col("key").cast("string"),
               F.col("value").cast("binary"))
     .write.format("kafka")
     .option("kafka.bootstrap.servers", bootstrap_servers)
     .option("topic", topic)
     .save())
