"""Local DuckDB-oracle harness — mirrors the driver's correctness gate.

Runs an engine query and its ANSI-SQL oracle side-by-side on the same
parquet tables and compares row count, column names, and exact values
(order-insensitive). Used by tests so oracle drift is caught locally
before the driver's CORRECTNESS run.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    # keep any out-of-core spill in the system temp dir, not the
    # repo-relative `.tmp/` DuckDB defaults to for in-memory DBs (a
    # runaway oracle once dropped >80 GB of spill files into the repo)
    con.execute("SET temp_directory = '/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = pd.to_datetime(out[c], utc=True)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(spark_df, oracle_df: pd.DataFrame,
            float_exact: bool = True) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    issues: list[str] = []
    left = _normalize(spark_df.toPandas())
    right = _normalize(oracle_df)
    if len(left) != len(right):
        issues.append(f"row count {len(left)} != {len(right)}")
    lcols, rcols = list(left.columns), list(right.columns)
    if lcols != rcols:
        issues.append(f"columns {lcols} != {rcols}")
        return issues
    if issues:
        return issues
    for c in left.columns:
        lv, rv = left[c], right[c]
        # The driver's value hash is dtype-sensitive: an int64 19525 and a
        # float64 19525.0 hash differently even though they compare equal
        # here. Flag the drift so it is caught locally (this is exactly how
        # lang_stats escaped the round-2 local gate: DuckDB SUM(BIGINT)
        # returns HUGEINT -> float64 while Spark emits int64).
        l_float = pd.api.types.is_float_dtype(lv)
        r_float = pd.api.types.is_float_dtype(rv)
        l_int = pd.api.types.is_integer_dtype(lv)
        r_int = pd.api.types.is_integer_dtype(rv)
        if (l_float and r_int) or (l_int and r_float):
            issues.append(
                f"column {c}: dtype drift {lv.dtype} vs {rv.dtype} "
                f"(driver hash would mismatch even on equal values)")
            continue
        if l_float or r_float:
            lf = lv.astype(float).to_numpy()
            rf = rv.astype(float).to_numpy()
            bad = 0
            for a, b in zip(lf, rf):
                if math.isnan(a) and math.isnan(b):
                    continue
                if float_exact:
                    if a != b:
                        bad += 1
                elif not math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
                    bad += 1
            if bad:
                idx = next(i for i, (a, b) in enumerate(zip(lf, rf))
                           if a != b and not (math.isnan(a) and math.isnan(b)))
                issues.append(
                    f"column {c}: {bad} float mismatches, first at row "
                    f"{idx}: {lf[idx]!r} != {rf[idx]!r}")
        else:
            neq = lv.astype(object).ne(rv.astype(object))
            both_na = lv.isna() & rv.isna()
            neq = neq & ~both_na
            if neq.any():
                i = int(neq.idxmax())
                issues.append(
                    f"column {c}: {int(neq.sum())} mismatches, first at "
                    f"row {i}: {lv.iloc[i]!r} != {rv.iloc[i]!r}")
    return issues


def check_query(spark: SparkSession, name: str, fn, sql: str,
                sf_dir: str) -> list[str]:
    return compare(fn(spark, sf_dir), run_oracle(sql, sf_dir))
