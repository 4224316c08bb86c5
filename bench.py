"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock seconds across the headline set
(lower is better). Each query executes to completion via a count-style
action (``df.count()`` after a cache-free plan), which forces the full
plan without driver-side collection of large results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from kafka_connect_msk_demo_spark import queries as _q  # noqa: E402
from kafka_connect_msk_demo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: headline set — one per major operator family
HEADLINE = [
    "sales_by_country",
    "sales_by_region",
    "windowed_sales",
    "latest_event_per_user",
    "latest_per_window",
    "top25_formatted",
    "revenue_by_region",
    "enrich_nullfill",
    "in_subquery",
    "correlated_subquery",
    "summary_stats",
]


def run() -> None:
    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    registry = _q.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in registry:
            continue
        fn = registry[name]
        # warm the file listing/JVM on the first query only implicitly;
        # measure a single cold run per query (matches driver behavior).
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    run()
