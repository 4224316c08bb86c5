"""Generate a K-times scaled copy of a testdata SF directory for the
scaling-slope audit (VERDICT r9 #2) — testdata itself is read-only, so
the output goes under /tmp.

The scale-up replicates each fact/dim table K times with KEY REMAPPING
(stride = max key + 1 per key space) so referential integrity holds and
join fan-outs stay realistic, instead of inflating duplicate keys:

* region / nation are FIXED dims (TPC-H semantics) — copied verbatim;
* customer / supplier / part / orders / lineitem / events replicate
  with their primary and foreign keys offset consistently per replica;
* documents get a per-replica TOKEN SUBSTITUTION (every 7th token,
  phase-shifted by replica, gets a replica tag) — verbatim replication
  would give every doc K-1 exact twins, and a suffix-only perturbation
  still leaves cross-replica 3-shingle Jaccard ≈ 0.97, so every doc
  gains K-1 near-dup twins and the dedup family's pair output grows
  ~K² (measured: the first r10 audit pass put dedup_clusters at slope
  55x purely from this artifact). Substituting ~14% of tokens changes
  ~40% of 3-shingles, dropping cross-replica J to ~0.4 — below every
  registered near-dup threshold — while keeping each replica's
  WITHIN-replica dup structure natural;
* embeddings get a per-replica CYCLIC SHIFT of the vector — cosine
  structure within a replica is preserved while replicas stay far
  apart, for the same reason (K identical copies of every vector would
  make ANN/semdedup outputs degenerate).

Deterministic: no RNG anywhere, so two runs produce identical bytes.

    python tools/make_scale.py --src /root/testdata/sf0.1 \
        --out /tmp/sfdata/sf1 --k 10
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: key columns to offset, per table: {column: key-space table}
KEYMAP: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

#: where each key space's stride is measured: (table, column)
KEYSPACE_SOURCE: dict[str, tuple[str, str]] = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}

FIXED_DIMS = ["region", "nation"]


def _strides(src: str) -> dict[str, int]:
    out = {}
    for space, (table, col) in KEYSPACE_SOURCE.items():
        t = pq.read_table(f"{src}/{table}.parquet", columns=[col])
        out[space] = pc.max(t.column(col)).as_py() + 1
    return out


def _perturb_text(text: str | None, r: int) -> str | None:
    """Replica-r text: tag every 7th whitespace token (phase r % 7)
    with the replica id — ~14% of tokens, ~40% of 3-shingles, pushing
    cross-replica Jaccard to ~0.4 (below the 0.5-0.8 thresholds the
    near-dup operators use) while leaving within-replica structure
    untouched."""
    if text is None:
        return None
    toks = text.split(" ")
    phase = (r - 1) % 7
    return " ".join(
        f"{t}r{r}" if i % 7 == phase else t
        for i, t in enumerate(toks))


def _replicate(tbl: pa.Table, name: str, k: int,
               strides: dict[str, int]) -> pa.Table:
    reps = []
    for r in range(k):
        cols = {}
        for field in tbl.schema:
            col = tbl.column(field.name)
            space = KEYMAP.get(name, {}).get(field.name)
            if space is not None and r > 0:
                col = pc.add(col, r * strides[space])
                col = col.cast(field.type)
            elif name == "documents" and field.name == "text" and r > 0:
                col = pa.array(
                    [_perturb_text(t, r) for t in col.to_pylist()],
                    type=field.type)
            elif name == "documents" and field.name == "n_chars" and r > 0:
                texts = tbl.column("text").to_pylist()
                col = pa.array(
                    [len(_perturb_text(t, r)) if t is not None else None
                     for t in texts], type=field.type)
            elif name == "embeddings" and field.name == "embedding" \
                    and r > 0:
                import numpy as np
                flat = np.asarray(col.combine_chunks().flatten())
                offs = np.asarray(col.combine_chunks().offsets)
                dim = offs[1] - offs[0]
                mat = flat.reshape(-1, dim)
                # shift 1 + (r-1) % (dim-1) is never 0 for r > 0 —
                # `r % dim` would give replica r = dim a zero shift,
                # silently re-introducing the exact-duplicate ~K² pair
                # explosion this perturbation exists to avoid.
                # ADVICE r11: the shift still CYCLES with period dim-1
                # (replica r = dim would duplicate replica 1), so large
                # replication factors must be rejected, not silently
                # allowed to reintroduce the duplicate-pair explosion
                # against a non-base replica.
                if r > dim - 1:
                    raise ValueError(
                        f"replica r={r} exceeds the roll period "
                        f"dim-1={dim - 1}: its shift equals replica "
                        f"{r - (dim - 1)}'s, so the two would be "
                        f"exact duplicates. Keep k <= dim (= {dim} "
                        f"here; replicas 0..{dim - 1}) or add a "
                        f"second perturbation axis.")
                col = pa.array(
                    list(np.roll(mat, 1 + (r - 1) % (dim - 1), axis=1)),
                    type=field.type)
            cols[field.name] = col
        reps.append(pa.table(cols, schema=tbl.schema))
    return pa.concat_tables(reps)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfdata/sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    strides = _strides(args.src)
    for name in FIXED_DIMS:
        t = pq.read_table(f"{args.src}/{name}.parquet")
        pq.write_table(t, f"{args.out}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (fixed dim)", flush=True)
    for name in KEYMAP:
        t = pq.read_table(f"{args.src}/{name}.parquet")
        big = _replicate(t, name, args.k, strides)
        pq.write_table(big, f"{args.out}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows", flush=True)


if __name__ == "__main__":
    main()
