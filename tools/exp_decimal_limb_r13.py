"""Round-13 experiment: are decimal(38,0) sum buffers the cost of
corr_matrix's single stage, and does a 21-bit limb split into plain
long sums (exact reconstruction after the 3-group aggregate) win?

Variants produce IDENTICAL final rows (asserted)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_msk_demo_spark.catalog import load_table  # noqa: E402
from kafka_connect_msk_demo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("REPS", "5"))
M21 = (1 << 21) - 1


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _base(li):
    d38 = "decimal(38,0)"
    meas = {
        "q": F.round(F.col("l_quantity")).cast("long"),
        "p": F.round(F.col("l_extendedprice") * 100).cast("long"),
        "d": F.round(F.col("l_discount") * 100).cast("long"),
        "t": F.round(F.col("l_tax") * 100).cast("long"),
    }
    base = li.select("l_returnflag", *[v.alias(k) for k, v in meas.items()])
    keys = list(meas)
    aggs = [F.count(F.lit(1)).alias("n")]
    for k in keys:
        aggs.append(F.sum(F.col(k).cast(d38)).alias(f"s_{k}"))
    for i, a in enumerate(keys):
        for b in keys[i:]:
            aggs.append(F.sum((F.col(a) * F.col(b)).cast(d38))
                        .alias(f"s_{a}{b}"))
    return base.groupBy("l_returnflag").agg(*aggs)


def _limb(li):
    meas = {
        "q": F.round(F.col("l_quantity")).cast("long"),
        "p": F.round(F.col("l_extendedprice") * 100).cast("long"),
        "d": F.round(F.col("l_discount") * 100).cast("long"),
        "t": F.round(F.col("l_tax") * 100).cast("long"),
    }
    base = li.select("l_returnflag", *[v.alias(k) for k, v in meas.items()])
    keys = list(meas)
    names = [(k, F.col(k)) for k in keys]
    prods = []
    for i, a in enumerate(keys):
        for b in keys[i:]:
            prods.append((f"{a}{b}", F.col(a) * F.col(b)))
    aggs = [F.count(F.lit(1)).alias("n")]
    for nm, expr in names + prods:
        aggs += [
            F.sum(expr.bitwiseAND(F.lit(M21))).alias(f"_{nm}_0"),
            F.sum(F.shiftrightunsigned(expr, 21)
                  .bitwiseAND(F.lit(M21))).alias(f"_{nm}_1"),
            F.sum(F.shiftrightunsigned(expr, 42)).alias(f"_{nm}_2"),
        ]
    m = base.groupBy("l_returnflag").agg(*aggs)
    d38 = "decimal(38,0)"
    recon = [
        (F.col(f"_{nm}_2").cast(d38) * F.lit(1 << 42).cast(d38)
         + F.col(f"_{nm}_1").cast(d38) * F.lit(1 << 21).cast(d38)
         + F.col(f"_{nm}_0").cast(d38)).cast(d38).alias(f"s_{nm}")
        for nm, _ in names + prods
    ]
    return m.select("l_returnflag", "n", *recon)


def main():
    spark = get_spark("exp_limb", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, SF_DIR, "lineitem")
    variants = {"base": lambda: _base(li), "limb": lambda: _limb(li)}
    _force(variants["base"]())
    a = sorted(tuple(r) for r in variants["base"]().collect())
    b = sorted(tuple(r) for r in variants["limb"]().collect())
    assert [r[:2] for r in a] == [r[:2] for r in b]
    assert a == b, f"mismatch:\n{a[0]}\n{b[0]}"
    print("identity ok")
    times = {v: [] for v in variants}
    for _ in range(REPS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            _force(fn())
            times[name].append(round(time.perf_counter() - t0, 3))
    for name, ts in times.items():
        print(f"{name}: median {sorted(ts)[len(ts)//2]}s reps {ts}")
    spark.stop()


if __name__ == "__main__":
    main()
