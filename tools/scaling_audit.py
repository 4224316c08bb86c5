"""Scaling-slope audit (VERDICT r9 #2): run the most expensive
registered queries at sf0.1 and at a 10x scaled copy (sf1, generated
by tools/make_scale.py) and report per-query medians side by side.

slope = t(sf1) / t(sf0.1). With 10x the data a LINEAR operator's slope
is <= ~10 — usually much less, because at sf0.1 fixed overheads
(scheduling, JVM, file listing) dominate. A slope well beyond 10 that
isn't explained by output-size growth (pair-producing dedup ops) or
algorithmic rounds flags a plan that won't survive the 100x lens.

    python tools/make_scale.py                      # once, ~1 min
    python tools/scaling_audit.py                   # writes tools/scaling_r10.json

Methodology matches bench.py: noop-sink execution of the full plan,
one untimed warm-up per cost class, median of 3 reps per (query, sf).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from kafka_connect_msk_demo_spark import queries as _q  # noqa: E402
from kafka_connect_msk_demo_spark.session import get_spark  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sfdata/sf1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))

#: the ~25 most expensive queries by the r9 idle sweep
#: (tools/bench_r9_idle.json), the set the audit was asked to cover.
AUDIT_QUERIES = [
    "dedup_clusters", "interpolated_series", "dedup_keep_best",
    "kcore_peel", "dedup_clusters_lsh", "semdedup_trained",
    "avro_roundtrip", "ivf_kmeans_topk", "avro_wire_roundtrip",
    "dsir_select", "corr_matrix", "copurchase_pairs",
    "repeated_span_mask", "table_profile", "minhash_est", "bfs_hops",
    "multimodal_embed_ann", "pagerank", "bloom_semi_join",
    "winnowing_pairs", "embedding_dup_pairs", "ann_topk",
    "rfm_segments", "hard_negatives", "degree_histogram",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("scaling-audit", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    registry = _q.queries()
    out: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        # warm-ups per cost class (bench.py rationale): scan+codegen,
        # Python worker pool, pipeline-table first touch
        _force(registry["sales_by_region"](spark, sf_dir))
        spark.range(64).mapInPandas(lambda it: it, "id long") \
            .write.format("noop").mode("overwrite").save()
        _force(registry["token_stats"](spark, sf_dir))
        _force(registry["embed_dim_stats"](spark, sf_dir))
        for name in AUDIT_QUERIES:
            reps = []
            for _ in range(REPEATS):
                t0 = time.monotonic()
                _force(registry[name](spark, sf_dir))
                reps.append(round(time.monotonic() - t0, 3))
            med = statistics.median(reps)
            out.setdefault(name, {})[sf_label] = med
            print(f"{sf_label} {name}: {med} {reps}", flush=True)
    for name, rec in out.items():
        rec["slope"] = round(rec["sf1"] / rec["sf0.1"], 2) \
            if rec.get("sf0.1") else None
    result = {"metric": "scaling_slope_sf0.1_to_sf1", "cpus": CPUS,
              "repeats": REPEATS, "queries": out}
    path = os.path.join(HERE, "scaling_r10.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v["slope"] for k, v in out.items()},
                     sort_keys=True))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
