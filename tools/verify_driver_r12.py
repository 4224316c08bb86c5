"""Simulated driver contract (verify skill surface 2): fresh
SparkSession with the hostile America/New_York timezone probe, entry(),
then every registered batch query vs its DuckDB oracle at sf0.01."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from kafka_connect_msk_demo_spark.oracle import compare, run_oracle  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
ONLY = {n for n in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if n}

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
E.entry(spark).count()

failed = []
n_checked = 0
t_start = time.monotonic()
for name, fn in E.queries().items():
    sql = E.oracle_sql().get(name)
    if sql is None or (ONLY and name not in ONLY):
        continue
    t0 = time.monotonic()
    try:
        diff = compare(fn(spark, SF), run_oracle(sql, SF))
    except Exception as exc:  # noqa: BLE001
        diff = f"EXCEPTION: {exc}"
    n_checked += 1
    status = "ok" if not diff else f"FAIL: {diff}"
    print(f"[{n_checked}] {name}: {status} ({time.monotonic()-t0:.1f}s)",
          flush=True)
    if diff:
        failed.append(name)

print(f"\nchecked={n_checked} failed={len(failed)} "
      f"wall={time.monotonic()-t_start:.0f}s")
if failed:
    print("FAILED:", failed)
    sys.exit(1)
print("ALL GREEN")
