"""Hostile-timezone driver simulation (the /verify skill's key probe).

Builds a FRESH SparkSession pinned to a non-UTC DST zone — the real
driver builds its own session, so nothing may depend on
session.get_spark's UTC default — and replays every registered query
against its DuckDB oracle at sf0.01.

Usage: python tools/preverify_hostile_tz.py [start [end]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from kafka_connect_msk_demo_spark.oracle import compare, run_oracle  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_MEDIUM", "/root/testdata/sf0.01")
TZ = os.environ.get("SPARK_GRAFT_HOSTILE_TZ", "America/New_York")


def main() -> int:
    spark = (SparkSession.builder.master("local[16]")
             .appName("preverify-hostile-tz")
             .config("spark.sql.session.timeZone", TZ)
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    print(f"entry rows: {E.entry(spark).count()}", flush=True)
    qs, oracles = E.queries(), E.oracle_sql()
    names = list(qs)
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else len(names)
    failures = []
    for i, name in enumerate(names[start:end]):
        sql = oracles.get(name)
        if not sql:
            print(f"[{start+i:3d}] {name}: SKIP (no oracle)", flush=True)
            continue
        t0 = time.perf_counter()
        try:
            issues = compare(qs[name](spark, SF_DIR),
                             run_oracle(sql, SF_DIR))
        except Exception as exc:  # noqa: BLE001 - report and continue
            issues = [f"exception: {exc!r:.300}"]
        dt = time.perf_counter() - t0
        status = "ok" if not issues else "FAIL " + "; ".join(issues)[:300]
        print(f"[{start+i:3d}] {name}: {status} ({dt:.1f}s)", flush=True)
        if issues:
            failures.append(name)
        spark.catalog.clearCache()
    print(f"\n{end-start - len(failures)}/{end-start} ok; "
          f"failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
