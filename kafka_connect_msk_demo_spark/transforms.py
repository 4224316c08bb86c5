"""SMT-equivalents — the Kafka Connect Single Message Transforms the
reference chains in its connector configs, as DataFrame operators.

Reference semantics (SURVEY.md §2.3 P8-P11):

* P8 — ``ValueToKey`` + ``ExtractField$Key``
  (``jdbc_source_connector_postgresql_01.json:13-17``).
* P9 — ``InsertField$Value`` static + topic-meta fields
  (``…_01.json:19-23``, ``s3_sink_connector_02.json:20-28``).
* P10 — ``ReplaceField$Value`` rename
  (``s3_sink_connector_02.json:17-19``).
* P11 — Debezium ``ExtractNewRecordState`` unwrap with delete rewrite
  and meta-column propagation
  (``debezium_avro_source_connector_postgresql_06.json:19-24``).

These are row-level, shuffle-free Projects — they fuse into the scan
stage under whole-stage codegen regardless of data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_to_key(df: DataFrame, field: str, key_col: str = "key") -> DataFrame:
    """P8: promote a value field to the record key."""
    return df.withColumn(key_col, F.col(field))


def insert_static_fields(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """P9: add static metadata columns (e.g. message_source=pagila)."""
    for name, value in fields.items():
        df = df.withColumn(name, F.lit(value))
    return df


def insert_topic_field(df: DataFrame, topic_col: str = "topic",
                       out: str = "message_topic") -> DataFrame:
    """P9 (topic variant): copy the envelope topic into the value."""
    return df.withColumn(out, F.col(topic_col))


def rename_fields(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    """P10: rename value fields (district → state_province)."""
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df


def stamp_processing_time(df: DataFrame,
                          out: str = "payment_date") -> DataFrame:
    """F4/P5 (04:81): overwrite/add a processing-time column with
    ``current_timestamp()``. Nondeterministic by nature, so it is
    exercised by a bounds-checking unit test rather than an oracle
    query; registered pipelines prefer explicit event times."""
    return df.withColumn(out, F.current_timestamp())


def cdc_unwrap(df: DataFrame, drop_tombstones: bool = True) -> DataFrame:
    """P11: Debezium ExtractNewRecordState.

    Input: the raw envelope ``(before, after, source, op, ts_ms)``.
    Output: flattened ``after.*`` (or ``before.*`` for deletes, matching
    ``delete.handling.mode=rewrite``) plus the connector's meta columns
    ``__op, __db, __table, __schema, __lsn, __source_ts_ms, __deleted``.
    Tombstones (both before/after null) are dropped unless kept.
    """
    if drop_tombstones:
        df = df.filter(F.col("after").isNotNull() |
                       F.col("before").isNotNull())
    record = F.when(F.col("op") == "d", F.col("before")) \
        .otherwise(F.col("after"))
    flat = df.withColumn("__record", record)
    field_names = [f.name for f in df.schema["after"].dataType.fields]
    return flat.select(
        *[F.col(f"__record.{name}").alias(name) for name in field_names],
        F.col("op").alias("__op"),
        F.col("source.db").alias("__db"),
        F.col("source.table").alias("__table"),
        F.col("source.schema").alias("__schema"),
        F.col("source.lsn").alias("__lsn"),
        F.col("source.ts_ms").alias("__source_ts_ms"),
        F.when(F.col("op") == "d", F.lit("true")).otherwise(F.lit("false"))
        .alias("__deleted"),
    )


def cdc_scd2(env: DataFrame, key_cols: list[str],
             ts_col: str = "ts_ms") -> DataFrame:
    """Type-2 slowly-changing-dimension history from a Debezium
    envelope: one row per VERSION of each key, with
    ``valid_from``/``valid_to`` effectivity bounds and ``is_current``
    (the complement of the latest-wins SCD1 MERGE in
    streaming/upsert.py — that keeps the last state, this keeps them
    all).

    Each change event (snapshot read / update) opens a version at its
    source timestamp; the NEXT event on the same key — including a
    delete — closes it (``valid_to`` = successor's ts, half-open
    interval). Deletes emit no version row of their own; a key whose
    last event is a delete therefore has no current version.

    One window pass over (key, ts, lsn): a single shuffle+sort, the
    same cost class as latest-wins dedup — no self-join against the
    history. Delete rows ride along for the ``lead`` computation and
    are filtered afterwards.
    """
    lsn = F.col("source.lsn")
    keys = [F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}"))
            .alias(k) for k in key_cols]
    field_names = [f.name for f in env.schema["after"].dataType.fields
                   if f.name not in key_cols]
    rows = env.select(
        *keys,
        *[F.col(f"after.{n}").alias(n) for n in field_names],
        F.col("op"), F.col(ts_col).alias("_ts"), lsn.alias("_lsn"))
    w = Window.partitionBy(*key_cols).orderBy("_ts", "_lsn")
    return (rows.withColumn("valid_to", F.lead("_ts").over(w))
            .filter(F.col("op") != "d")
            .select(*key_cols, *field_names,
                    F.col("_ts").alias("valid_from"), "valid_to",
                    F.col("valid_to").isNull().alias("is_current")))


# ---------------------------------------------------------------------------
# Additional stock Connect SMTs (public org.apache.kafka.connect.transforms
# classes the reference's connector configs could chain but don't in the
# checked-in JSONs — completing the SMT surface). All are row-level
# Projects: shuffle-free, codegen-fused into the scan at any scale.
# ---------------------------------------------------------------------------


def mask_field(df: DataFrame, fields: list[str],
               replacement=None) -> DataFrame:
    """``MaskField$Value``: replace fields with a type-preserving null
    (default) or a literal replacement."""
    for name in fields:
        dtype = df.schema[name].dataType
        df = df.withColumn(name, F.lit(replacement).cast(dtype))
    return df


def regex_router(df: DataFrame, pattern: str, replacement: str,
                 topic_col: str = "topic") -> DataFrame:
    """``RegexRouter``: rewrite the topic by regex."""
    return df.withColumn(
        topic_col, F.regexp_replace(F.col(topic_col), pattern, replacement))


def timestamp_router(df: DataFrame, ts_col: str,
                     topic_col: str = "topic",
                     fmt: str = "yyyyMMdd") -> DataFrame:
    """``TimestampRouter`` (``topic.format=${topic}-${timestamp}``):
    suffix the topic with the record's event date. The date is built
    from the tz-free epoch-day number (``unix_micros div 86400000000``
    applied to ``date_add``), not from ``date_format(ts)`` — the latter
    renders in the session timezone and would route the same instant to
    different daily topics depending on the driver's TZ."""
    day = F.expr(f"unix_micros({ts_col}) div 86400000000").cast("int")
    date_str = F.date_format(F.date_add(F.lit("1970-01-01").cast("date"),
                                        day), fmt)
    return df.withColumn(topic_col,
                         F.concat(F.col(topic_col), F.lit("-"), date_str))


def hoist_field(df: DataFrame, out: str,
                keep: list[str] | None = None) -> DataFrame:
    """``HoistField$Value``: wrap the record value in a single-field
    struct (``keep`` columns stay top-level, e.g. routing metadata)."""
    keep = keep or []
    payload = [c for c in df.columns if c not in keep]
    return df.select(*keep, F.struct(*payload).alias(out))


def flatten_value(df: DataFrame, sep: str = "_") -> DataFrame:
    """``Flatten$Value``: recursively flatten struct columns with a
    configurable delimiter (Connect's default is ``.``; parquet-hostile,
    so ``_`` here)."""
    cols = []

    def _walk(prefix: list[str], dtype, ref):
        from pyspark.sql import types as T
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                _walk(prefix + [f.name], f.dataType, ref[f.name])
        else:
            cols.append(ref.alias(sep.join(prefix)))

    for f in df.schema.fields:
        _walk([f.name], f.dataType, F.col(f.name))
    return df.select(*cols)


def cast_fields(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """``Cast$Value``: per-field spec casts (``field:type`` pairs)."""
    for name, dtype in casts.items():
        df = df.withColumn(name, F.col(name).cast(dtype))
    return df


def extract_json_field(df: DataFrame, col: str, path: str,
                       out: str, dtype: str = "string") -> DataFrame:
    """``ExtractField$Value`` over a JSON-string payload: pull one
    field out of the serialized value (the Connect chain would run
    JsonConverter first; here the converter+extract fuse into one
    ``get_json_object`` projection)."""
    return df.withColumn(
        out, F.get_json_object(F.col(col), f"$.{path}").cast(dtype))
