"""Property-based tests (hypothesis) for the pure-Python Avro binary
codec — the wire format must round-trip arbitrary flat records, not
just the fixtures the oracle queries happen to produce."""

import json
import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_msk_demo_spark.serde import (avro_decode_rows,
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
