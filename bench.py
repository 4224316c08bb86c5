"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock seconds across the stable HEADLINE set
(lower is better) — kept fixed so the number is comparable round over
round. The ``queries`` dict additionally reports per-query seconds for
EVERY registered batch query, so per-operator regressions are visible
even for queries outside the headline set.

Methodology:
* one untimed warm-up action first (JVM/codegen/file-listing warm-up
  otherwise lands entirely on the first timed query);
* each query executes via the ``noop`` sink — unlike ``count()`` it
  preserves the full plan (a count aggregate lets Catalyst eliminate
  the final sort and prune projection work, under-measuring sorted/
  projected queries);
* EVERY timed query runs ``SPARK_GRAFT_REPEATS`` times (default 3)
  and reports the MEDIAN. Single-run numbers proved uncomparable round
  over round twice: round-3's sweep-pressure phantoms (dedup_simhash
  1.25 s -> 2.89 s with no code change), and round-4's registry reorder
  moving queries to different sweep positions (the first query at a new
  position pays whatever cold state — table first-scan, codegen class,
  GC debt — the old order had amortized elsewhere; lang_stats measured
  4x its steady-state on rep 1). The median drops the cold rep, so a
  query's number reflects the query, not its position in the sweep.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_connect_msk_demo_spark import queries as _q  # noqa: E402
from kafka_connect_msk_demo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))

#: headline set — one per major operator family; FIXED across rounds so
#: the total stays comparable (new operators are timed but not totaled).
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

#: slow/stateful queries excluded from the timed sweep (streaming drain
#: + checkpoint restore dominate; they are correctness-gated instead).
SKIP = {"cdc_upsert", "stream_anomaly", "stream_sales_by_type", "stream_windowed_by_type",
        "stream_enriched_windowed", "stream_running_user_stats",
        "stream_stream_join", "stream_session_agg", "stream_dedup_keys",
        "stream_hll", "stream_ewma", "stream_topk_users",
        "stream_left_join_nulls", "stream_record_high",
        "stream_dedup_census"}


def _force(df) -> None:
    """Execute the FULL plan (sort + projection included) without
    collecting results to the driver."""
    df.write.format("noop").mode("overwrite").save()


def run() -> None:
    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    registry = _q.queries()
    # Untimed warm-ups, one per cost class that otherwise lands on an
    # arbitrary first query: (a) JVM/codegen/file-listing, (b) Python
    # worker pool spin-up (the first mapInPandas crossing pays ~5-10 s
    # of daemon+Arrow startup), (c) bucket-table staging for the
    # bucketed query (a one-time ETL cost by design, not query time).
    _force(registry["sales_by_region"](spark, SF_DIR))
    spark.range(64).mapInPandas(lambda it: it, "id long").write \
        .format("noop").mode("overwrite").save()
    if "revenue_by_region_bucketed" in registry:
        _force(registry["revenue_by_region_bucketed"](spark, SF_DIR))
    # (d) first touch of the pipeline tables: file listing + footer +
    # OS page-cache warm-up. Without this the cost lands on whichever
    # pipeline query the registry happens to put first (measured ~4x on
    # lang_stats when the round-4 reorder moved it to position 1).
    from kafka_connect_msk_demo_spark.catalog import load_table
    for t in ("documents", "embeddings"):
        _force(load_table(spark, SF_DIR, t))
    timings: dict[str, float] = {}
    for name, fn in registry.items():
        if name in SKIP:
            continue
        # progress marker on stderr (stdout carries ONLY the JSON line):
        # names the in-flight query if the sweep dies mid-run
        print(f"bench: {name}", file=sys.stderr, flush=True)
        samples = []
        reps = REPEATS
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        # queries may persist shared subplans (dedup shingle tables,
        # BFS edge lists) for reuse WITHIN one plan; drop them between
        # sweeps so no query is timed against another query's cache
        spark.catalog.clearCache()
    total = round(sum(timings[n] for n in HEADLINE if n in timings), 3)
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
