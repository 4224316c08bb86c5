"""Property-based tests (hypothesis) for the pure-Python Avro binary
codec — the wire format must round-trip arbitrary flat records, not
just the fixtures the oracle queries happen to produce."""

import datetime
import json
import math
from decimal import Decimal

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_msk_demo_spark.serde import (_avro_encode_rows_py,
                                                avro_decode_rows,
                                                avro_encode_block,
                                                avro_encode_rows)

FIELDS = [
    ("i", "int", st.integers(-2**31, 2**31 - 1)),
    ("l", "long", st.integers(-2**63, 2**63 - 1)),
    ("d", "double", st.floats(allow_nan=False, width=64)),
    ("s", "string", st.text(max_size=80)),
    ("b", "boolean", st.booleans()),
    ("ts", {"type": "long", "logicalType": "timestamp-millis"},
     st.integers(-2**40, 2**40)),
]

SCHEMA = json.dumps({
    "type": "record", "name": "rec", "fields": [
        {"name": n, "type": [t, "null"]} for n, t, _ in FIELDS]})

ROW = st.tuples(*[st.one_of(st.none(), s) for _, _, s in FIELDS])


@settings(max_examples=200, deadline=None)
@given(st.lists(ROW, min_size=1, max_size=20))
def test_avro_codec_roundtrip(rows):
    pdf = pd.DataFrame(rows, columns=[n for n, _, _ in FIELDS],
                       dtype=object)
    blobs = avro_encode_rows(pdf, SCHEMA)
    back = avro_decode_rows(blobs, SCHEMA)
    for col, _, _ in FIELDS:
        for orig, got in zip(pdf[col], back[col]):
            if orig is None:
                assert got is None or (isinstance(got, float)
                                       and math.isnan(got))
            elif isinstance(orig, float):
                assert got == orig or (
                    math.isnan(orig) and math.isnan(got))
            else:
                assert got == orig, (col, orig, got)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200))
def test_avro_string_unicode_safe(s):
    pdf = pd.DataFrame({"i": [1], "l": [2], "d": [0.5], "s": [s],
                        "b": [True], "ts": [0]}, dtype=object)
    back = avro_decode_rows(avro_encode_rows(pdf, SCHEMA), SCHEMA)
    assert back["s"][0] == s


# ---------------------------------------------------------------------------
# r12 vectorized encoder — byte-identity vs the per-cell twin
# ---------------------------------------------------------------------------


def _assert_identical(pdf, schema):
    """Wire bytes of the vectorized encoder must equal the per-cell
    encoder's, row for row, and the block form must be their join."""
    vec = avro_encode_rows(pdf, schema)
    ref = _avro_encode_rows_py(pdf, schema)
    assert list(vec) == list(ref)
    assert avro_encode_block(pdf, schema) == b"".join(ref)


@settings(max_examples=200, deadline=None)
@given(st.lists(ROW, min_size=0, max_size=30))
def test_vectorized_encoder_matches_per_cell(rows):
    pdf = pd.DataFrame(rows, columns=[n for n, _, _ in FIELDS],
                       dtype=object)
    _assert_identical(pdf, SCHEMA)


SCHEMA_NULL_FIRST = json.dumps({
    "type": "record", "name": "rec", "fields": [
        {"name": n, "type": ["null", t]} for n, t, _ in FIELDS]})


@settings(max_examples=100, deadline=None)
@given(st.lists(ROW, min_size=0, max_size=20))
def test_vectorized_encoder_null_first_union(rows):
    pdf = pd.DataFrame(rows, columns=[n for n, _, _ in FIELDS],
                       dtype=object)
    _assert_identical(pdf, SCHEMA_NULL_FIRST)


def test_vectorized_encoder_native_dtypes():
    """Typed (non-object) pandas columns: int64, float64, float32-ish
    doubles, datetime64[ns] timestamps, bool — the shapes the OCF
    writer actually receives from Arrow toPandas."""
    schema = json.dumps({"type": "record", "name": "rec", "fields": [
        {"name": "l", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "ts",
         "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "b", "type": "boolean"},
        {"name": "s", "type": "string"},
    ]})
    n = 257  # crosses varint width classes
    pdf = pd.DataFrame({
        "l": np.arange(-128, 129, dtype=np.int64),
        "d": np.linspace(-1e300, 1e300, n),
        "f": np.linspace(-3.5, 3.5, n),
        "ts": pd.date_range("1969-12-25", periods=n, freq="13h"),
        "b": np.arange(n) % 2 == 0,
        "s": [f"row-{i}-δ" for i in range(n)],
    })
    _assert_identical(pdf, schema)


def test_vectorized_encoder_varint_boundaries():
    """Every base-128 width transition, int64 extremes, zigzag of
    negative numbers, and special doubles (signed zero, inf, nan,
    subnormal) — all must match the per-cell bytes exactly."""
    longs = [0, -1, 1, 63, 64, -64, -65]
    for t in range(1, 10):
        edge = 1 << (7 * t)
        for z in (edge - 1, edge, edge + 1):
            longs += [z // 2, -(z // 2) - 1]
    longs += [2**63 - 1, -2**63]
    doubles = [0.0, -0.0, float("inf"), float("-inf"), float("nan"),
               5e-324, -5e-324, 1.7976931348623157e308]
    k = max(len(longs), len(doubles))
    longs += [0] * (k - len(longs))
    doubles += [0.0] * (k - len(doubles))
    schema = json.dumps({"type": "record", "name": "rec", "fields": [
        {"name": "l", "type": "long"},
        {"name": "d", "type": "double"}]})
    pdf = pd.DataFrame({"l": np.array(longs, dtype=np.int64),
                        "d": np.array(doubles, dtype=np.float64)})
    _assert_identical(pdf, schema)
    # nullable variant: NaN doubles become the null branch
    schema_n = json.dumps({"type": "record", "name": "rec", "fields": [
        {"name": "l", "type": ["long", "null"]},
        {"name": "d", "type": ["null", "double"]}]})
    _assert_identical(pdf, schema_n)


def test_vectorized_encoder_object_coercions():
    """Object cells the per-cell encoder coerces (Decimal→int,
    float→int truncation toward zero, non-str→str, truthy booleans,
    datetime objects in timestamp fields) must coerce identically."""
    schema = json.dumps({"type": "record", "name": "rec", "fields": [
        {"name": "l", "type": ["long", "null"]},
        {"name": "ts", "type": [
            {"type": "long", "logicalType": "timestamp-millis"}, "null"]},
        {"name": "s", "type": ["string", "null"]},
        {"name": "b", "type": ["boolean", "null"]}]})
    pdf = pd.DataFrame({
        "l": [Decimal("12345678901234"), -2.7, 2.7, 7, None, float("nan")],
        "ts": [datetime.datetime(2021, 6, 1, 12, 0, 0, 250000),
               pd.Timestamp("1969-12-31 23:59:59"), 0, -1, None, 10**13],
        "s": ["", "plain", 42, 3.5, None, "é中\U0001f600"],
        "b": [True, False, 2, "", None, "x"]}, dtype=object)
    _assert_identical(pdf, schema)


def test_vectorized_encoder_bytes_falls_back():
    """A ``bytes`` field is not vectorized — the public entry points
    must transparently serve the per-cell encoding for the whole
    batch (and stay byte-identical by construction)."""
    from kafka_connect_msk_demo_spark.serde import \
        _vec_encode_record_buffer
    schema = json.dumps({"type": "record", "name": "rec", "fields": [
        {"name": "l", "type": "long"},
        {"name": "raw", "type": ["bytes", "null"]}]})
    pdf = pd.DataFrame({"l": [1, 2, 3],
                        "raw": [b"\x00\x01", None, b""]}, dtype=object)
    assert _vec_encode_record_buffer(pdf, schema) is None
    _assert_identical(pdf, schema)


def test_vectorized_encoder_empty_and_all_null():
    schema = json.dumps({"type": "record", "name": "rec", "fields": [
        {"name": "l", "type": ["long", "null"]},
        {"name": "s", "type": ["null", "string"]}]})
    _assert_identical(
        pd.DataFrame({"l": [], "s": []}, dtype=object), schema)
    _assert_identical(
        pd.DataFrame({"l": [None] * 5, "s": [None] * 5}, dtype=object),
        schema)
