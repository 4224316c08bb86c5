"""SchemaRegistry — the Apicurio v2 artifact lifecycle
(``10_create_schemas.py:77-118``): delete→create→get replay of the
reference's exact artifact set, version/conflict semantics, BACKWARD
compatibility gating through the live decode resolver, and the
globalId → wire-framing integration with serde.
"""

import json

import pytest

from kafka_connect_msk_demo_spark.sources.registry import (ArtifactExists,
                                                            ArtifactNotFound,
                                                            RuleViolation,
                                                            SchemaRegistry)

# the reference's six artifacts, verbatim shapes (10_create_schemas.py)
SALES_CSV = """{"name":"Sales","type":"record",
    "doc":"Schema for CSV-format sales data",
    "fields":[
    {"name":"payment_id","type":"int"},
    {"name":"customer_id","type":"int"},
    {"name":"amount","type":"float"},
    {"name":"payment_date","type":"string"},
    {"name":"city","type":["string","null"]},
    {"name":"district","type":["string","null"]},
    {"name":"country","type":"string"}]}"""
REGIONS_CSV = """{"name":"Regions","type":"record",
    "fields":[
    {"name":"country","type":"string"},
    {"name":"region","type":"string"}]}"""
AVRO_KEY = '{"name":"Key","type":"int"}'
SUMMARY_VALUE = """{"name":"Value","type":"record",
    "fields":[
    {"name":"region","type":"string"},
    {"name":"sales","type":"float"},
    {"name":"orders","type":"int"},
    {"name":"window_start","type":{"type":"long","logicalType":"timestamp-millis"}},
    {"name":"window_end","type":{"type":"long","logicalType":"timestamp-millis"}}]}"""

REFERENCE_SET = [
    ("pagila.sales.csv", SALES_CSV),
    ("pagila.sales.regions.csv", REGIONS_CSV),
    ("pagila.sales.avro-key", AVRO_KEY),
    ("pagila.sales.summary.avro-key", AVRO_KEY),
    ("pagila.sales.summary.avro-value", SUMMARY_VALUE),
]


def test_reference_script_replay():
    """10_create_schemas.py's create_schema = delete (missing ok) +
    post + get, over its artifact set."""
    reg = SchemaRegistry()
    for artifact_id, content in REFERENCE_SET:
        reg.delete_artifact(artifact_id, missing_ok=True)
        meta = reg.create_artifact(artifact_id, content)
        assert meta["id"] == artifact_id
        assert meta["version"] == 1 and meta["state"] == "ENABLED"
        assert json.loads(reg.get_artifact(artifact_id)) \
            == json.loads(content)
    assert reg.list_artifacts() == sorted(a for a, _ in REFERENCE_SET)
    # globalIds are unique and monotonic across artifacts
    gids = [reg.global_id(a) for a, _ in REFERENCE_SET]
    assert len(set(gids)) == len(gids) == 5


def test_post_conflict_and_update_versions():
    reg = SchemaRegistry()
    reg.create_artifact("a", AVRO_KEY)
    with pytest.raises(ArtifactExists):
        reg.create_artifact("a", AVRO_KEY)
    meta = reg.create_artifact("a", AVRO_KEY, if_exists="UPDATE")
    assert meta["version"] == 2
    assert reg.list_versions("a") == [1, 2]
    assert reg.get_artifact("a", version=1) == AVRO_KEY
    with pytest.raises(ArtifactNotFound):
        reg.get_artifact("a", version=9)


def test_delete_semantics():
    reg = SchemaRegistry()
    with pytest.raises(ArtifactNotFound):
        reg.delete_artifact("missing")
    reg.delete_artifact("missing", missing_ok=True)  # the try/except path
    reg.create_artifact("a", AVRO_KEY)
    reg.delete_artifact("a")
    with pytest.raises(ArtifactNotFound):
        reg.get_artifact("a")


def test_backward_rule_gates_updates():
    base = ('{"name":"V","type":"record","fields":['
            '{"name":"id","type":"int"},'
            '{"name":"amount","type":"float"}]}')
    # legal: add a field WITH a default, promote float->double
    ok = ('{"name":"V","type":"record","fields":['
          '{"name":"id","type":"long"},'
          '{"name":"amount","type":"double"},'
          '{"name":"note","type":"string","default":""}]}')
    # illegal: new reader field without a default
    bad = ('{"name":"V","type":"record","fields":['
           '{"name":"id","type":"int"},'
           '{"name":"amount","type":"float"},'
           '{"name":"required_new","type":"string"}]}')
    reg = SchemaRegistry()
    reg.create_artifact("v", base)
    reg.set_rule("v", "BACKWARD")
    with pytest.raises(RuleViolation):
        reg.create_artifact("v", bad, if_exists="UPDATE")
    meta = reg.create_artifact("v", ok, if_exists="UPDATE")
    assert meta["version"] == 2


def test_persistence_roundtrip(tmp_path):
    path = str(tmp_path / "registry.json")
    reg = SchemaRegistry(path)
    reg.create_artifact("a", AVRO_KEY)
    reg.create_artifact("a", AVRO_KEY, if_exists="UPDATE")
    reg.create_artifact("b", REGIONS_CSV)
    reg2 = SchemaRegistry(path)
    assert reg2.list_versions("a") == [1, 2]
    assert reg2.global_id("b") == reg.global_id("b")
    # ids keep advancing after reload — no globalId reuse
    reg2.create_artifact("c", AVRO_KEY)
    assert reg2.global_id("c") > reg2.global_id("b")


def test_wire_framing_integration(spark):
    """End-to-end control+data plane: register a schema, frame encoded
    rows with its globalId, unframe, look the schema back up by the
    recovered id, decode."""
    from pyspark.sql import functions as F

    from kafka_connect_msk_demo_spark.serde import (avro_decode_rows,
                                                    frame_registry,
                                                    to_avro_column,
                                                    unframe_registry)

    schema = ('{"name":"S","type":"record","fields":['
              '{"name":"id","type":"long"},'
              '{"name":"country","type":"string"}]}')
    reg = SchemaRegistry()
    reg.create_artifact("sales-value", schema)
    gid = reg.global_id("sales-value")

    df = spark.range(5).select(
        F.col("id"), F.concat(F.lit("c"), F.col("id")).alias("country"))
    framed = df.select(
        frame_registry(to_avro_column(df, schema), gid).alias("value"))
    sid, payload = unframe_registry(F.col("value"))
    back = framed.select(sid.alias("sid"), payload.alias("payload")) \
        .toPandas()
    assert set(back["sid"]) == {gid}
    writer = reg.get_by_global_id(int(back["sid"].iloc[0]))
    decoded = avro_decode_rows(back["payload"], writer)
    assert sorted(decoded["country"]) == [f"c{i}" for i in range(5)]
