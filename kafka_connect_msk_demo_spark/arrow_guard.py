"""Guard for the Arrow→pandas nullable-BIGINT hazard.

Spark's Arrow→pandas conversion renders a LongType batch that contains
a null as **float64** — so any long with magnitude ≥ 2^53 silently
rounds BEFORE the Python kernel even sees it (the class the round-7
Avro fuzz caught; ``serde._as_wire_types`` carries wire longs as
``decimal(20,0)`` for exactly this reason).

The pipeline kernels' long columns are identifiers (``doc_id``,
``vec_id``, ``event_id`` …): a null id is invalid input, so they don't
pay the Decimal-carrier cost on the hot path. Instead every kernel
that passes a long column through pandas calls :func:`exact_longs` on
it first:

* normal path (no nulls in the batch) — the column arrives ``int64``
  and is returned untouched, zero overhead beyond one dtype check;
* null-bearing path — the column arrives ``float64``; if every non-
  null magnitude is < 2^53 the float rendering is still lossless and
  the column is returned as-is (nulls keep their existing downstream
  semantics), otherwise raise: a loud error instead of silently
  emitting rounded ids.

Columns whose nulls are *legitimate data* (Avro wire values) must use
the Decimal carrier instead — see ``serde._as_wire_types``.
"""

from __future__ import annotations

import pandas as pd

#: floats are exact integers below this; above it consecutive longs
#: collapse onto the same double
LOSSLESS_LONG = float(2 ** 53)


def exact_longs(series: pd.Series, col: str,
                allow_null: bool = True) -> pd.Series:
    """Validate a LongType column that crossed Arrow→pandas.

    Returns the series unchanged when its values are exactly
    representable; raises ``ValueError`` when a null-bearing batch
    (float64 rendering) carries magnitudes ≥ 2^53 that would have
    silently rounded.

    ``allow_null=False`` additionally rejects ANY null: kernels that
    feed the column into ``to_numpy(np.int64)`` must use it — numpy's
    unsafe cast turns NaN into INT64_MIN garbage without raising.
    """
    if pd.api.types.is_integer_dtype(series):
        return series
    if pd.api.types.is_float_dtype(series):
        nn = series.dropna()
        if not allow_null and len(nn) != len(series):
            raise ValueError(
                f"column {col!r}: null id in an Arrow batch feeding an "
                f"int64 conversion (NaN would cast to INT64_MIN garbage)."
                f" Filter null ids before this operator.")
        if len(nn) and (nn.abs() >= LOSSLESS_LONG).any():
            raise ValueError(
                f"column {col!r}: a null shared this Arrow batch, so the "
                f"long column crossed to pandas as float64, and it holds "
                f"magnitudes >= 2**53 that would silently round. Filter "
                f"null ids before this operator, or carry the column as "
                f"decimal(20,0) (see serde._as_wire_types).")
        return series
    # object dtype (e.g. a Decimal carrier or Python ints) is exact
    return series
