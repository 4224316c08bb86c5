"""Shared text preparation: tokenization and shingling.

Everything here is a pure column expression (JVM-side, whole-stage
codegen) and is deliberately mirrored 1:1 by DuckDB SQL in the oracle
strings, so every downstream dedup/analysis operator stays
hash-checkable:

* tokens   = ``split(lower(trim(text)), ' ')``
* shingles = distinct ``k``-word windows joined by one space; documents
  shorter than ``k`` tokens contribute their single partial shingle
  (DuckDB's ``t[i:i+k-1]`` slicing and Spark's null-skipping
  ``concat_ws`` agree on that edge case).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of the lower-cased, trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), " ")


def shingle_expr(tok_sql: str, k: int = 3) -> Column:
    """Shingle column built from a SQL fragment naming the token array
    (avoids Column→SQL round-trips inside generated lambdas)."""
    joined = ", ".join(f"{tok_sql}[i + {j}]" for j in range(k))
    return F.array_distinct(F.expr(
        f"transform(sequence(0, greatest(size({tok_sql}) - {k}, 0)), "
        f"i -> concat_ws(' ', {joined}))"))


def with_shingles(df, text_col: str = "text", k: int = 3,
                  out: str = "s"):
    """documents(text) → + tokens ``t`` and distinct shingles ``out``."""
    return (df.withColumn("t", tokens(text_col))
            .withColumn(out, shingle_expr("t", k)))


def doc_shingles(df, id_col: str = "doc_id", text_col: str = "text",
                 k: int = 3):
    """(doc_id, s): distinct ``k``-token shingles per document — the
    Arrow-batched kernel the dedup family feeds from.

    Same output values as :func:`with_shingles` (the testdata corpus is
    ASCII with single spaces, where Python and JVM lower/trim/split
    agree byte-for-byte; asserted in tests/test_pipeline.py), but
    computed in one Python pass per batch instead of the interpreted
    ``transform(sequence(...))`` higher-order expression, which is not
    whole-stage-codegen-able and measured ~60% of every dedup query's
    runtime. Short documents (< k tokens) contribute their single
    partial shingle, matching the null-skipping ``concat_ws`` edge
    case.

    A numpy batch-axis rewrite was evaluated and does NOT apply here:
    the work is string slicing/joining (object dtype end to end), which
    numpy cannot vectorize — unlike the numeric signature kernels in
    ``dedup.py``, where the md5 phase is batch-memoized (round-3
    measurements in those kernels' comments)."""
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col))

    def kernel(pdfs):
        from ..arrow_guard import exact_longs
        for pdf in pdfs:
            ids = exact_longs(pdf["doc_id"], "doc_id")
            out_s = []
            for txt in pdf[text_col]:
                toks = txt.strip(" ").lower().split(" ")
                n = len(toks)
                if n >= k:
                    sh = list(dict.fromkeys(
                        " ".join(toks[i:i + k]) for i in range(n - k + 1)))
                else:
                    sh = [" ".join(toks)]
                out_s.append(sh)
            yield pd.DataFrame({"doc_id": ids,
                                "s": out_s})

    return src.mapInPandas(kernel, "doc_id long, s array<string>")


#: DuckDB twin of ``with_shingles`` — CTE text for oracle strings.
#: Parameterized on the documents relation name.
def duckdb_shingle_cte(k: int = 3, rel: str = "documents") -> str:
    return f"""
  toks AS (
    SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM {rel}
  ), sh AS (
    SELECT doc_id, list_distinct([array_to_string(t[i:i+{k - 1}], ' ')
            FOR i IN generate_series(1, greatest(len(t) - {k - 1}, 1))]) AS s
    FROM toks
  )"""
