"""Unit tests for the Kafka option builders (S2-S6, S4, T10) and the
JDBC polling source (S11) — the production configuration surface that
has no broker/database in this sandbox."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.catalog import load_table
from kafka_connect_msk_demo_spark.sources.jdbc import JdbcPoller
from kafka_connect_msk_demo_spark.sources.kafka import kafka_options


# -- Kafka options (S2/S3/S4/T10) ------------------------------------------

def test_kafka_options_reference_batch_shape():
    # 02_batch_read_kafka.py:36-60
    opts = kafka_options("b-1.msk:9098", topic="pagila.sales",
                         starting_offsets="earliest",
                         ending_offsets="latest")
    assert opts == {"kafka.bootstrap.servers": "b-1.msk:9098",
                    "subscribe": "pagila.sales",
                    "startingOffsets": "earliest",
                    "endingOffsets": "latest"}


def test_kafka_options_tolerant_and_bounded():
    # 13 ipynb cell 6: failOnDataLoss=false; T10 per-partition offsets
    opts = kafka_options(
        "b:9098", topic="t",
        starting_offsets={"t": {"0": 23, "1": -2}},
        ending_offsets={"t": {"0": 100, "1": -1}},
        fail_on_data_loss=False, max_offsets_per_trigger=500)
    assert opts["startingOffsets"] == '{"t": {"0": 23, "1": -2}}'
    assert opts["endingOffsets"] == '{"t": {"0": 100, "1": -1}}'
    assert opts["failOnDataLoss"] == "false"
    assert opts["maxOffsetsPerTrigger"] == "500"


def test_kafka_options_subscription_validation():
    with pytest.raises(ValueError):
        kafka_options("b:9098")
    with pytest.raises(ValueError):
        kafka_options("b:9098", topic="a", pattern="a.*")
    opts = kafka_options("b:9098", topics=["a", "b"])
    assert opts["subscribe"] == "a,b"
    opts = kafka_options("b:9098", pattern="pagila.*")
    assert opts["subscribePattern"] == "pagila.*"


# -- JDBC poller (S11) ------------------------------------------------------

@pytest.fixture()
def orders(spark, sf_small):
    return load_table(spark, sf_small, "orders").cache()


def test_jdbc_incrementing_mode_no_redelivery(spark, orders):
    poller = JdbcPoller(table="orders", mode="incrementing",
                        incrementing_column="o_orderkey")

    # simulate a growing table: first 100 keys visible, then all
    visible = {"n": 100}

    def fetch(predicate):
        return (orders.filter(F.col("o_orderkey") <= visible["n"])
                .filter(F.expr(predicate)))

    first = poller.poll(fetch)
    assert first.count() == first.select("o_orderkey").distinct().count()
    n1 = first.count()
    assert poller.state.last_incrementing == 100

    # nothing new → empty poll, offsets hold
    assert poller.poll(fetch).count() == 0
    assert poller.state.last_incrementing == 100

    visible["n"] = 250
    second = poller.poll(fetch)
    n2 = second.count()
    # no overlap between deliveries
    assert first.join(second, "o_orderkey", "inner").count() == 0
    total = orders.filter(F.col("o_orderkey") <= 250).count()
    assert n1 + n2 == total


def test_jdbc_timestamp_incrementing_tuple_order(spark):
    rows = [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:00"),
            (3, "2024-01-02 00:00:00")]
    df = spark.createDataFrame(rows, "id int, ts string")
    poller = JdbcPoller(table="t", mode="timestamp+incrementing",
                        incrementing_column="id", timestamp_column="ts")

    seen = []

    def fetch(predicate):
        return df.filter(F.expr(predicate))

    # deliver one row at a time by capping each poll at the min id
    batch = poller.poll(fetch)
    seen += [r.id for r in batch.collect()]
    assert sorted(seen) == [1, 2, 3]
    # a same-timestamp row inserted later with a HIGHER id still arrives
    df2 = df.union(spark.createDataFrame(
        [(4, "2024-01-02 00:00:00")], "id int, ts string"))

    def fetch2(predicate):
        return df2.filter(F.expr(predicate))

    late = poller.poll(fetch2)
    assert [r.id for r in late.collect()] == [4]


def test_jdbc_advance_tracks_last_row_tuple_not_columnwise_max(spark):
    """Regression: a batch with a HIGH id at an EARLIER timestamp must
    not poison the offset. Column-wise maxes would record (ts=2,
    inc=100) from rows (ts=1,id=100),(ts=2,id=5) and silently drop a
    later (ts=2,id=6); the offset must be the (ts,id) of the last row
    in tuple order: (ts=2, inc=5)."""
    rows = [(100, "2024-01-01 00:00:00"), (5, "2024-01-02 00:00:00")]
    df = spark.createDataFrame(rows, "id int, ts string")
    poller = JdbcPoller(table="t", mode="timestamp+incrementing",
                        incrementing_column="id", timestamp_column="ts")

    def fetch(predicate):
        return df.filter(F.expr(predicate))

    first = poller.poll(fetch)
    assert {r.id for r in first.collect()} == {100, 5}
    assert poller.state.last_timestamp == "2024-01-02 00:00:00"
    assert poller.state.last_incrementing == 5

    # a later same-timestamp row with id between 5 and 100 still arrives
    df2 = df.union(spark.createDataFrame(
        [(6, "2024-01-02 00:00:00")], "id int, ts string"))
    late = poller.poll(lambda p: df2.filter(F.expr(p)))
    assert [r.id for r in late.collect()] == [6]
    assert poller.state.last_incrementing == 6


def test_jdbc_mode_validation():
    with pytest.raises(ValueError):
        JdbcPoller(table="t", mode="incrementing")
    with pytest.raises(ValueError):
        JdbcPoller(table="t", mode="timestamp")
