"""Unit tests for SMT-equivalent transforms not covered by oracle
queries (F4 processing-time stamp; tombstone handling in cdc_unwrap)."""

import datetime as dt

from kafka_connect_msk_demo_spark.transforms import stamp_processing_time


def test_stamp_processing_time_bounds(spark):
    before = dt.datetime.now(dt.timezone.utc) - dt.timedelta(minutes=5)
    row = stamp_processing_time(
        spark.createDataFrame([(1,)], "id int"), out="pt").first()
    stamped = row.pt.astimezone(dt.timezone.utc) if row.pt.tzinfo \
        else row.pt.replace(tzinfo=dt.timezone.utc)
    after = dt.datetime.now(dt.timezone.utc) + dt.timedelta(minutes=5)
    assert before <= stamped <= after
