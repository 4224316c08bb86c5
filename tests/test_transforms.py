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


def test_cdc_scd2_version_invariants(spark, sf_small):
    """SCD2 invariants against the envelope's construction rules:
    deleted keys (%10==0) end with NO current version; updated keys
    (%10 in 1,2) carry exactly two versions, the first closed at the
    update's ts; untouched keys have one open version. Version chains
    never overlap."""
    from kafka_connect_msk_demo_spark.queries import q_cdc_scd2

    out = q_cdc_scd2(spark, sf_small)
    rows = out.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.o_orderkey, []).append(r)
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r.valid_from)
        # chains are contiguous half-open intervals
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from
        if k % 10 == 0:
            assert all(not v.is_current for v in vs)
            assert vs[-1].valid_to is not None
        elif k % 10 in (1, 2):
            assert len(vs) == 2
            assert not vs[0].is_current and vs[1].is_current
            assert vs[0].valid_to == vs[1].valid_from
        else:
            assert len(vs) == 1 and vs[0].is_current


def test_summary_stats_exact_at_long_wrapping_magnitude(spark):
    """Values >= ~3.05e7 at scale=2 lift to cents whose long*long square
    would wrap; the per-row guard must switch those rows to the exact
    decimal multiply. Reference moments computed in exact integer
    arithmetic driver-side."""
    import math

    from kafka_connect_msk_demo_spark.operators.aggregates import (
        summary_stats)

    vals = [4.0e9, 4.0e9 + 0.25, 7.5e9, 12.5, 0.01]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, v double")
    row = summary_stats(df, ["g"], "v").collect()[0]
    cents = [round(v * 100) for v in vals]
    n = len(cents)
    s, s2 = float(sum(cents)) / 100.0, float(sum(c * c for c in cents)) / 1e4
    mean = s / n
    var = (s2 - s * s / n) / (n - 1.0)
    assert row.cnt == n
    assert row.mean_val == round(mean, 6)
    assert row.stddev_val == round(math.sqrt(max(var, 0.0)), 6)
    assert (row.min_val, row.max_val) == (0.01, 7.5e9)


def test_stock_smt_surface(spark):
    """MaskField/RegexRouter/TimestampRouter/HoistField/Flatten/Cast/
    ExtractField unit semantics on a hand-built frame."""
    from pyspark.sql import functions as F

    from kafka_connect_msk_demo_spark.transforms import (
        cast_fields, extract_json_field, flatten_value, hoist_field,
        mask_field, regex_router, timestamp_router)

    df = spark.createDataFrame(
        [(1, "a.raw", '{"k": 7}', "2021-03-14 01:30:00"),
         (2, "a.raw", '{"k": -3}', "1999-12-31 23:59:59")],
        "id long, topic string, props string, ts_s string") \
        .withColumn("ts", F.to_timestamp("ts_s", "yyyy-MM-dd HH:mm:ss")) \
        .drop("ts_s")

    routed = regex_router(df, r"^a\.raw$", "app_a")
    assert {r.topic for r in routed.collect()} == {"app_a"}

    # TimestampRouter suffixes the tz-free event date
    daily = timestamp_router(routed, "ts")
    topics = {r.id: r.topic for r in daily.collect()}
    assert topics[2].startswith("app_a-1999123")  # tz-free day number

    masked = mask_field(df, ["props"])
    assert all(r.props is None for r in masked.collect())
    assert masked.schema["props"].dataType.simpleString() == "string"

    lit = mask_field(df, ["props"], replacement="xxx")
    assert {r.props for r in lit.collect()} == {"xxx"}

    ext = extract_json_field(df, "props", "k", out="k", dtype="long")
    assert {r.id: r.k for r in ext.collect()} == {1: 7, 2: -3}

    cast = cast_fields(df, {"id": "string"})
    assert cast.schema["id"].dataType.simpleString() == "string"

    hoisted = hoist_field(df, "payload", keep=["topic"])
    assert hoisted.columns == ["topic", "payload"]
    flat = flatten_value(hoisted)
    assert flat.columns == ["topic", "payload_id", "payload_props",
                            "payload_ts"]
    assert {r.payload_id for r in flat.collect()} == {1, 2}
