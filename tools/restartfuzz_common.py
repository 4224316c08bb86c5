"""Shared pieces of the restartfuzz stress axis (tools/stress.py) —
in a module of its own because the SIGKILL seeds run the drain in a
SUBPROCESS driver that imports it too.

The reference implementations replicate streaming/stateful.py's folds
VERBATIM (same null handling, same float operation order, Spark's
HALF_UP rounding for the EWMA quantizer), so census == reference is an
exact-set equality, not a tolerance check.
"""

from __future__ import annotations

import glob
import os
from decimal import ROUND_HALF_UP, Decimal

SCHEMA_DDL = ("ts timestamp, user_id bigint, event_id bigint, "
              "value double")

EWMA_FRAME = 32
EWMA_SCALE = 100
BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros


# -- feed --------------------------------------------------------------------

def gen_feed(rng) -> list[tuple]:
    """(us, user_id, event_id, value) rows, globally sorted by
    (us, event_id) — strictly increasing us, unique event ids, ~12%
    NULL values. Values are k/1000 doubles so the EWMA quantizer hits
    exact-half cases (the HALF_UP edge) regularly."""
    n = rng.randrange(60, 160)
    n_keys = rng.randrange(3, 7)
    rows = []
    for i in range(n):
        val = None if rng.random() < 0.12 \
            else rng.randrange(0, 100_000) / 1000.0
        rows.append((BASE_US + i * 1_000_000, rng.randrange(1, n_keys + 1),
                     i, val))
    return rows


def cut_files(rng, rows: list[tuple]) -> list[list[tuple]]:
    """Cut the sorted feed into 5-10 contiguous files at random
    boundaries (contiguity preserves the event-time ordering the
    append-mode operators document as their delivery contract)."""
    n_files = rng.randrange(5, 11)
    cuts = sorted(rng.sample(range(1, len(rows)), n_files - 1))
    out, prev = [], 0
    for c in cuts + [len(rows)]:
        out.append(rows[prev:c])
        prev = c
    return [f for f in out if f]


def group_sessions(rng, files: list) -> list[list]:
    """Partition the file list into 2-4 contiguous drain sessions."""
    n_sessions = rng.randrange(2, min(5, len(files) + 1))
    cuts = sorted(rng.sample(range(1, len(files)), n_sessions - 1))
    out, prev = [], 0
    for c in cuts + [len(files)]:
        out.append(files[prev:c])
        prev = c
    return [s for s in out if s]


def write_files(src: str, files: list[list[tuple]],
                offset: int = 0) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    for i, rows in enumerate(files):
        pdf = pd.DataFrame(rows, columns=["us", "user_id", "event_id",
                                          "value"])
        pdf["ts"] = pd.to_datetime(pdf.pop("us"), unit="us") \
            .astype("datetime64[us]")
        pdf = pdf[["ts", "user_id", "event_id", "value"]]
        f = os.path.join(src, f"f{offset + i:04d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf), f)
        # the file source orders batches by mtime — pin it increasing
        mt = 1_700_000_000 + offset + i
        os.utime(f, (mt, mt))


# -- drain -------------------------------------------------------------------

def _op_stream(op: str, stream):
    from kafka_connect_msk_demo_spark.streaming import stateful
    if op == "running_stats":
        return stateful.running_user_stats(stream), "update"
    if op == "record_high":
        return stateful.record_high_stream(stream), "append"
    if op == "ewma":
        return stateful.ewma_stream(stream, frame=EWMA_FRAME,
                                    scale=EWMA_SCALE), "update"
    raise ValueError(op)


def drain(spark, op: str, src: str, sink: str, ckpt: str,
          max_files: int | None = None) -> None:
    """One availableNow drain session: recover state from ``ckpt``,
    process whatever is in ``src``, write each micro-batch to
    ``sink/batch=<id>`` with overwrite — idempotent under replay, so a
    SIGKILLed drain resumed from the checkpoint cannot double-count."""
    reader = spark.readStream.schema(SCHEMA_DDL)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    out, mode = _op_stream(op, reader.parquet(src))

    def sink_batch(df, batch_id):
        if df.isEmpty():
            return
        df.write.mode("overwrite").parquet(
            os.path.join(sink, f"batch={batch_id:06d}"))

    q = (out.writeStream.foreachBatch(sink_batch).outputMode(mode)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()


# -- census vs reference -----------------------------------------------------

def census(spark, op: str, sink: str) -> set:
    dirs = sorted(glob.glob(os.path.join(sink, "batch=*")))
    if not dirs:
        return set()
    rows = [tuple(r) for r in spark.read.parquet(*dirs).collect()]
    if op == "running_stats":
        # update-mode emissions reconcile via W4 latest-wins: n is
        # monotone per key, so the census is each key's max-n row
        latest: dict[int, tuple] = {}
        for r in rows:  # (user_id, n, vmax, last_us)
            if r[0] not in latest or r[1] > latest[r[0]][1]:
                latest[r[0]] = r
        return set(latest.values())
    return set(rows)


def _round_half_up(x: float) -> int:
    """Spark's F.round on DoubleType: BigDecimal.valueOf(double)
    (the double's shortest decimal repr — Python's repr) + HALF_UP."""
    return int(Decimal(repr(x)).quantize(Decimal("1"),
                                         rounding=ROUND_HALF_UP))


def reference(op: str, rows: list[tuple]) -> set:
    """Pure-Python batch twin over the full feed (rows already in
    global (us, event_id) order)."""
    by_key: dict[int, list[tuple]] = {}
    for us, uid, eid, val in rows:
        by_key.setdefault(uid, []).append((us, eid, val))
    out: set = set()
    if op == "running_stats":
        for uid, rs in by_key.items():
            present = [v for _, _, v in rs if v is not None]
            vmax = max(present) if present else None
            out.add((uid, len(rs), vmax, max(us for us, _, _ in rs)))
    elif op == "record_high":
        for uid, rs in by_key.items():
            cur = None
            for us, eid, val in rs:
                if val is None:
                    continue
                if cur is None or val > cur:
                    out.add((uid, eid, us, val))
                cur = val if cur is None else max(cur, val)
    elif op == "ewma":
        for uid, rs in by_key.items():
            vals: list[int | None] = []
            for us, eid, val in rs:
                vals.append(None if val is None
                            else _round_half_up(val * float(EWMA_SCALE)))
                if len(vals) > EWMA_FRAME:
                    vals.pop(0)
                present = [x for x in vals if x is not None]
                n = len(present)
                s = 0.0
                for x in present:
                    s = (x + s) / 2.0
                ewma = None if n == 0 \
                    else (s / (1.0 - 2.0 ** -n)) / float(EWMA_SCALE)
                out.add((uid, us, eid, val, n, ewma))
    else:
        raise ValueError(op)
    return out
