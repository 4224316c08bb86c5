"""The local oracle gate's dtype-drift detector — the defense that
keeps equal-value/different-dtype results (which the driver's
dtype-sensitive hash rejects) from escaping to a red CORRECTNESS row.

History this encodes: int64-vs-float64 escaped in round 2
(lang_stats); object(Decimal)-vs-float64 escaped in round 5
(grouping_sets_report) because the detector only knew int<->float.
Integer WIDTH drift is deliberately tolerated — driver-green rows
carry int32-vs-int64 (stream_topk_users r5, pii_scrub r4) and even
int32-vs-int8 (dedup_simhash r3).
"""

from decimal import Decimal

import pandas as pd
import pytest

from kafka_connect_msk_demo_spark.oracle import _value_kind, compare


class _FakeSparkDF:
    def __init__(self, pdf):
        self._pdf = pdf

    def toPandas(self):
        return self._pdf


@pytest.mark.parametrize("series,kind", [
    (pd.Series([1, 2], dtype="int32"), "int"),
    (pd.Series([1, 2], dtype="int64"), "int"),
    (pd.Series([1.0], dtype="float64"), "float"),
    (pd.Series([Decimal("1.10")]), "decimal"),
    (pd.Series(["a"]), "str"),
    (pd.Series([True, False]), "bool"),
    (pd.Series([None], dtype="object"), "empty"),
])
def test_value_kind(series, kind):
    assert _value_kind(series) == kind


def _issues(left_col, right_col):
    left = pd.DataFrame({"k": ["a", "b"], "v": left_col})
    right = pd.DataFrame({"k": ["a", "b"], "v": right_col})
    return compare(_FakeSparkDF(left), right)


def test_decimal_vs_float_flagged_on_equal_values():
    # the exact grouping_sets_report escape: equal values, Spark
    # object(Decimal) vs DuckDB float64
    issues = _issues([Decimal("1.10"), Decimal("2.20")], [1.1, 2.2])
    assert issues and "dtype-kind drift" in issues[0]
    assert "decimal" in issues[0] and "float" in issues[0]


def test_int_vs_float_still_flagged():
    issues = _issues(pd.Series([1, 2], dtype="int64"),
                     pd.Series([1.0, 2.0], dtype="float64"))
    assert issues and "dtype-kind drift" in issues[0]


def test_decimal_string_vs_varchar_passes():
    # the sanctioned money convention: fixed-scale strings both sides
    assert _issues(["1.10", "2.20"], ["1.10", "2.20"]) == []


def test_integer_width_drift_tolerated():
    assert _issues(pd.Series([1, 2], dtype="int32"),
                   pd.Series([1, 2], dtype="int64")) == []
    assert _issues(pd.Series([1, 2], dtype="int32"),
                   pd.Series([1, 2], dtype="int8")) == []


def test_equal_floats_pass_and_unequal_fail():
    assert _issues(pd.Series([1.5, 2.5]), pd.Series([1.5, 2.5])) == []
    bad = _issues(pd.Series([1.5, 2.5]), pd.Series([1.5, 2.5000001]))
    assert bad and "float mismatch" in bad[0]


def test_decimal_vs_decimal_compares_exactly():
    assert _issues([Decimal("1.10"), Decimal("2.20")],
                   [Decimal("1.10"), Decimal("2.20")]) == []
    bad = _issues([Decimal("1.10"), Decimal("2.20")],
                  [Decimal("1.10"), Decimal("2.21")])
    assert bad


def test_mixed_kind_column_no_longer_evades():
    """ADVICE r6: a column whose FIRST value is Decimal but later
    values are float used to classify from row 0 only — now the
    sampled scan reports mixed(...) and flags it against a pure-float
    counterpart."""
    import numpy as np
    mixed = pd.Series([Decimal("1.0"), 2.5], dtype="object")
    assert _value_kind(mixed) == "mixed(decimal,float)"
    issues = _issues(pd.Series([Decimal("1.0"), 2.5], dtype="object"),
                     pd.Series([1.0, 2.5], dtype="float64"))
    assert issues and "drift" in issues[0]
    # numpy scalar types map to their Python kinds (np.bool_ is 'bool',
    # not the type name 'bool_')
    assert _value_kind(pd.Series([np.bool_(True)], dtype="object")) \
        == "bool"
    assert _value_kind(pd.Series([np.int32(3)], dtype="object")) == "int"
    assert _value_kind(pd.Series([np.float32(3.5)], dtype="object")) \
        == "float"
    # identical mixtures on both sides stay comparable (not a drift)
    same = _issues(pd.Series([Decimal("1.0"), 2.5], dtype="object"),
                   pd.Series([Decimal("1.0"), 2.5], dtype="object"))
    assert same == []


def test_late_row_kind_drift_is_caught():
    """ADVICE r7/r8: a deviant kind anywhere in the column is caught.
    r7 closed the past-row-100 gap with a head+tail sample; r8's
    ADVICE flagged the residual mid-column blind spot (deviant
    strictly between head(100) and tail(100) of a >200-row series) —
    the classifier now scans the FULL column via one representative
    per distinct concrete type, so there is no positional gap left."""
    # deviant in the TAIL of a 500-row column → caught
    vals = [Decimal("1.0")] * 499 + [2.5]
    assert _value_kind(pd.Series(vals, dtype="object")) \
        == "mixed(decimal,float)"
    # deviant at row 150 of a 200-row column → caught
    vals = [Decimal("1.0")] * 150 + [2.5] + [Decimal("1.0")] * 49
    assert _value_kind(pd.Series(vals, dtype="object")) \
        == "mixed(decimal,float)"
    # deviant buried strictly MID-COLUMN of a 500-row series (row 250:
    # outside both head(100) and tail(100)) — the former blind spot
    vals = [Decimal("1.0")] * 250 + [2.5] + [Decimal("1.0")] * 249
    assert _value_kind(pd.Series(vals, dtype="object")) \
        == "mixed(decimal,float)"
    # same position, numpy-rendered deviant (distinct concrete type)
    import numpy as np
    vals = [Decimal("1.0")] * 250 + [np.float64(2.5)] \
        + [Decimal("1.0")] * 249
    assert _value_kind(pd.Series(vals, dtype="object")) \
        == "mixed(decimal,float)"
    # pure column of any length stays a single kind
    assert _value_kind(
        pd.Series([Decimal("1.0")] * 500, dtype="object")) == "decimal"
