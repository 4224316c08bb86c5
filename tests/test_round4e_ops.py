"""Semantic unit tests for the round-4e operators — hand-computed
expectations independent of the DuckDB oracles (which the parity suite
already runs): exact largest-remainder attribution, reset-segment
balances, CUSUM shift location, OLS closed form, and the null-safe
join's NULL-bucket semantics.
"""

import pytest
from pyspark.sql import functions as F


def _df_events(spark, rows):
    """(user_id, event_id, ts_s, event_type, value) helper frame."""
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, "
              "event_type string, value double")
    return df.withColumn(
        "ts", F.to_timestamp("ts_s", "yyyy-MM-dd HH:mm:ss")).drop("ts_s")


def test_largest_remainder_split_is_exact(spark):
    """A 10.01 purchase over 3 touches splits 334/334/333 cents with
    the remainder going to the EARLIEST touches, and sums back to the
    purchase total exactly."""
    from pyspark.sql import Window

    touches = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (1, 30, 102)],
        "pid long, t_ts long, touch_id long")
    w = Window.partitionBy("pid")
    wo = w.orderBy("t_ts", "touch_id")
    value_c = F.lit(1001).cast("long")
    out = (touches
           .withColumn("n", F.count(F.lit(1)).over(w))
           .withColumn("i", F.row_number().over(wo) - 1)
           .withColumn("value_c", value_c)
           .withColumn("attr_c",
                       F.expr("value_c div n")
                       + F.when(F.col("i") < value_c % F.col("n"), 1)
                       .otherwise(0))
           .orderBy("t_ts").collect())
    assert [r.attr_c for r in out] == [334, 334, 333]
    assert sum(r.attr_c for r in out) == 1001


def test_multi_touch_attribution_semantics(spark, sf_small):
    """Registered query invariant: attributed revenue across touch
    types equals the total value of purchases that HAVE >= 1 touch in
    their 7-day lookback (conservation of money)."""
    from kafka_connect_msk_demo_spark.queries import (
        q_multi_touch_attribution)

    from kafka_connect_msk_demo_spark.catalog import load_table

    out = q_multi_touch_attribution(spark, sf_small).collect()
    attributed = sum(r.attributed_revenue for r in out)

    ev = load_table(spark, sf_small, "events")
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("pu"),
                 F.col("event_id").alias("pid"),
                 F.expr("unix_micros(ts)").alias("pts"),
                 F.round(F.col("value") * 100).cast("long")
                 .alias("vc")))
    t = (ev.filter(F.col("event_type").isin("click", "view"))
         .select(F.col("user_id").alias("tu"),
                 F.expr("unix_micros(ts)").alias("tts")))
    wk = 7 * 86400000000
    covered = (p.join(t, (F.col("pu") == F.col("tu"))
                      & (F.col("tts") < F.col("pts"))
                      & (F.col("tts") >= F.col("pts") - wk), "left_semi")
               .agg(F.sum("vc")).first()[0])
    assert attributed == pytest.approx(covered / 100.0, abs=1e-6)


def test_running_balance_resets_segments(spark, monkeypatch):
    """signup opens a new segment; balances restart inside it."""
    import kafka_connect_msk_demo_spark.queries as Q

    df = _df_events(spark, [
        (1, 1, "2021-01-01 00:00:00", "click", 1.00),
        (1, 2, "2021-01-01 01:00:00", "signup", 2.00),
        (1, 3, "2021-01-01 02:00:00", "view", 3.00),
        (1, 4, "2021-01-01 03:00:00", "signup", 4.00),
        (1, 5, "2021-01-01 04:00:00", "click", 5.00),
    ])
    monkeypatch.setattr(Q, "load_table", lambda s, d, n: df)
    rows = {(r.user_id, r.segment): r
            for r in Q.q_running_balance_resets(spark, "-").collect()}
    assert rows[(1, 0)].end_balance == 1.00          # pre-signup
    assert rows[(1, 1)].end_balance == 5.00          # 2+3
    assert rows[(1, 1)].peak_balance == 5.00
    assert rows[(1, 2)].end_balance == 9.00          # 4+5
    assert rows[(1, 2)].n_events == 2


def test_cusum_locates_planted_shift(spark, monkeypatch):
    """A level shift at the midpoint maximizes the centered prefix sum
    exactly at the last pre-shift row."""
    import kafka_connect_msk_demo_spark.queries as Q

    rows = []
    for i in range(20):
        v = 1.00 if i < 10 else 5.00
        rows.append((1, i, f"2021-01-01 00:{i:02d}:00", "m", v))
    df = _df_events(spark, rows)
    monkeypatch.setattr(Q, "load_table", lambda s, d, n: df)
    out = Q.q_cusum_shift(spark, "-").collect()
    assert len(out) == 1
    r = out[0]
    # |P_i| = |n*S_i - i*T| peaks at i=10 (ts of event_id 9, the last
    # pre-shift row): P_10 = 20*1000 - 10*6000 = -40000
    import datetime as dt
    peak_ts = dt.datetime(2021, 1, 1, 0, 9)
    assert r.shift_ts_us == int(peak_ts.replace(
        tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    # drift range: max P - min P = n * (max dev); exact check:
    # T=60 cents*... v cents: 100*10 + 500*10 = 6000; n=20
    # S_10 = 1000 -> P_10 = 20*1000 - 10*6000 = -40000 (min)
    # P_0..: increasing after; max at i=20: 20*6000-20*6000=0
    assert r.drift_range == pytest.approx((0 - (-40000)) / 20 / 100.0)


def test_ols_slope_closed_form(spark, monkeypatch):
    """Perfect-line daily revenue recovers its slope exactly."""
    import kafka_connect_msk_demo_spark.queries as Q

    # region with daily revenue = 10.00 + 2.50 * day_index
    base_day = 18628  # 2021-01-01
    orders, custs = [], []
    for d in range(5):
        orders.append((d, 1, f"2021-01-0{d+1} 00:00:00",
                       10.00 + 2.50 * d))
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, ts_s string, "
                "o_totalprice double") \
        .withColumn("o_orderdate",
                    F.to_timestamp("ts_s", "yyyy-MM-dd HH:mm:ss")) \
        .drop("ts_s")
    cdf = spark.createDataFrame([(1, 7)],
                                "c_custkey long, c_nationkey long")
    ndf = spark.createDataFrame([(7, 3)],
                                "n_nationkey long, n_regionkey long")
    rdf = spark.createDataFrame([(3, "R1")],
                                "r_regionkey long, r_name string")
    tables = {"orders": odf, "customer": cdf, "nation": ndf,
              "region": rdf}
    monkeypatch.setattr(
        Q, "load_tables",
        lambda s, d, names: {n: tables[n] for n in names})
    out = Q.q_ols_trend(spark, "-").collect()
    assert len(out) == 1
    assert out[0].slope_per_day == pytest.approx(2.50, abs=1e-9)
    assert out[0].n == 5
    assert out[0].avg_day == pytest.approx(base_day + 2)


def test_null_safe_join_matches_null_bucket(spark, sf_small):
    """Every event row appears exactly once iff its (nulled) key has a
    signup; the NULL key matches the NULL dim row — count must exceed
    what a plain equi-join would keep."""
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.queries import q_null_safe_join

    out = q_null_safe_join(spark, sf_small).collect()
    n_matched = sum(r.n_matched for r in out)
    n_null = sum(r.n_null_key_matches for r in out)
    assert n_null > 0  # the NULL bucket really matched

    ev = load_table(spark, sf_small, "events")
    nulled = F.when(F.col("user_id") % 10 == 0, F.lit(None)) \
        .otherwise(F.col("user_id"))
    keys_with_signup = (ev.filter(F.col("event_type") == "signup")
                        .select(nulled.alias("k")).distinct())
    has_null_signup = keys_with_signup.filter(
        F.col("k").isNull()).count() == 1
    plain = (ev.select(nulled.alias("k"))
             .join(keys_with_signup.filter(F.col("k").isNotNull()),
                   "k").count())
    expect_null = (ev.filter(nulled.isNull()).count()
                   if has_null_signup else 0)
    assert n_matched == plain + expect_null
    assert n_null == expect_null


def test_unpivot_roundtrips_pivot(spark, sf_small):
    """Melting the wide frame preserves every (day, metric) count."""
    from kafka_connect_msk_demo_spark.catalog import load_table
    from kafka_connect_msk_demo_spark.queries import q_unpivot_metrics

    long = q_unpivot_metrics(spark, sf_small)
    ev = load_table(spark, sf_small, "events")
    direct = (ev.filter(F.col("event_type")
                        .isin("click", "view", "purchase"))
              .groupBy(F.expr("unix_micros(ts) div 86400000000")
                       .alias("day"),
                       F.col("event_type").alias("metric"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    assert long.count() == direct.count()
    assert (long.join(direct, ["day", "metric", "cnt"]).count()
            == direct.count())
