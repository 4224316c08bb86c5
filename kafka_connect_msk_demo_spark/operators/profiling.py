"""Column-level data profiling (Deequ / ydata-profiling class): one
census row per column — row count, null count, exact distinct count,
min and max — the first thing a data platform runs against a new drop
before letting a pipeline consume it.

Engine-exact by construction: every value is first rendered to a
string with a cross-engine-stable cast (ints and strings cast
verbatim; doubles go through DECIMAL(18,2), whose rendering both
engines agree on; timestamp columns are deliberately out of scope —
their string forms are timezone/format-dependent), so min/max compare
under binary string order in both engines and the distinct count is
over identical value sets.

Plan shape: the melt (one array-of-structs literal explode) is a
narrow scan-side map — each input row fans out to one row per
profiled column, all inside whole-stage codegen, no join. The single
shuffle is the hash-aggregate keyed on the column name, with the
distinct count running as Spark's standard two-phase
partial-distinct. At 100 TB the skew unit is one column's value set
on one reducer; for wide-profile jobs swap the exact distinct for a
KMV/HLL sketch (pipeline/sketches.py) — the census frame is otherwise
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (column, kind) with kind in {"str", "int", "dec"} — what the
#: profile renders and how; shared by the Spark plan and the SQL twin.
PROFILE_COLUMNS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "int"), ("c_name", "str"),
                 ("c_nationkey", "int"), ("c_acctbal", "dec"),
                 ("c_mktsegment", "str")],
    "orders": [("o_orderkey", "int"), ("o_custkey", "int"),
               ("o_orderstatus", "str"), ("o_totalprice", "dec"),
               ("o_orderpriority", "str")],
    "part": [("p_partkey", "int"), ("p_name", "str"),
             ("p_brand", "str"), ("p_type", "str"),
             ("p_size", "int"), ("p_retailprice", "dec")],
}


def _render(name: str, kind: str) -> F.Column:
    c = F.col(name)
    if kind == "dec":
        c = c.cast("decimal(18,2)")
    return c.cast("string")


def profile_table(df: DataFrame, table: str,
                  cols: list[tuple[str, str]]) -> DataFrame:
    """Per-column census of one table: (table_name, col_name, n_rows,
    n_null, n_distinct, min_v, max_v)."""
    melted = (df.select(F.explode(F.array(*[
        F.struct(F.lit(n).alias("col_name"),
                 _render(n, k).alias("v"))
        for n, k in cols])).alias("x"))
        .select("x.col_name", "x.v"))
    return (melted.groupBy("col_name")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("v").isNull().cast("long")).alias("n_null"),
                 F.count_distinct("v").alias("n_distinct"),
                 F.min("v").alias("min_v"),
                 F.max("v").alias("max_v"))
            .select(F.lit(table).alias("table_name"), "*"))


def profile_tables(tables: dict[str, DataFrame],
                   spec: dict[str, list[tuple[str, str]]] | None = None
                   ) -> DataFrame:
    """Census across tables — union of :func:`profile_table` frames."""
    spec = spec or PROFILE_COLUMNS
    out = None
    for t in sorted(spec):
        p = profile_table(tables[t], t, spec[t])
        out = p if out is None else out.unionByName(p)
    return out.orderBy("table_name", "col_name")


def profile_oracle_sql(spec: dict[str, list[tuple[str, str]]] | None = None
                       ) -> str:
    """DuckDB twin: UNION ALL of per-column aggregates over the same
    rendered strings (UNPIVOT drops NULLs, which would corrupt n_null
    — the explicit union keeps them)."""
    spec = spec or PROFILE_COLUMNS
    parts = []
    for t in sorted(spec):
        for n, k in spec[t]:
            v = f"CAST(CAST({n} AS DECIMAL(18,2)) AS VARCHAR)" \
                if k == "dec" else f"CAST({n} AS VARCHAR)"
            parts.append(f"""
SELECT '{t}' AS table_name, '{n}' AS col_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       COUNT(DISTINCT v) AS n_distinct,
       MIN(v) AS min_v, MAX(v) AS max_v
FROM (SELECT {v} AS v FROM {t}) _s""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY table_name, col_name"
