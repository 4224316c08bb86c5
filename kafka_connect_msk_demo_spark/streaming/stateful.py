"""Custom stateful streaming operators — ``applyInPandasWithState``.

The reference confines state to windowed/global aggregates (SURVEY.md
§2.9); this module adds the engine's arbitrary-state extension point,
the shape every bespoke streaming operator (sessionizers with side
outputs, CDC conflation, feature accumulators) plugs into:

* state lives per group key in the state store (checkpointed,
  recovered on restart like any built-in stateful op);
* each micro-batch delivers the group's new rows as Arrow batches —
  the Python boundary is crossed per group-batch, not per row;
* the operator emits update rows; downstream reconciles with the W4
  latest-wins pattern (monotone ``n`` makes "latest" well-defined).

:func:`running_user_stats` keeps the state exact-by-construction
(counts, max, last-event time — no float accumulation), so its final
emission is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n bigint, vmax double, last_us bigint"
OUTPUT_SCHEMA = "user_id bigint, n bigint, vmax double, last_us bigint"


def running_user_stats(stream: DataFrame,
                       key_col: str = "user_id",
                       ts_col: str = "ts",
                       value_col: str = "value") -> DataFrame:
    """Per-key running (count, max value, last event time) maintained in
    arbitrary user state. Emits one update row per key per micro-batch
    it appears in; ``n`` is monotone, so the latest emission per key is
    the row with max ``n``."""
    wire = stream.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.unix_micros(ts_col).alias("us"),
        F.col(value_col).cast("double").alias("v"))

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, vmax, last_us = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            batch_max = pdf["v"].max()
            vmax = batch_max if vmax is None else max(vmax, batch_max)
            batch_last = pdf["us"].max()
            last_us = batch_last if last_us is None \
                else max(last_us, batch_last)
        state.update((n, vmax, last_us))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n],
                            "vmax": [vmax], "last_us": [last_us]})

    return (wire.groupBy("user_id")
            .applyInPandasWithState(update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


def dedup_within_watermark(stream: DataFrame, keys: list[str],
                           ts_col: str = "ts",
                           delay: str = "10 minutes") -> DataFrame:
    """Streaming dedup with bounded state (T8 extension): the first row
    per key is emitted, subsequent arrivals of the same key are dropped
    while the key's state lives — and the state is EVICTED once the
    watermark passes its event time + ``delay``, so a key recurring
    after the horizon is admitted again (unlike ``dropDuplicates``,
    whose state grows with the key universe forever — unusable at
    100 TB). Exactly-once-within-delay semantics are pinned by
    tests/test_watermark.py across checkpointed restarts."""
    return (stream.withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(keys))


def latest_emission(df: DataFrame, key: str = "user_id",
                    monotone: str = "n") -> DataFrame:
    """W4 reconciliation for update-mode emissions: keep each key's row
    with the highest monotone counter."""
    from pyspark.sql import Window
    w = Window.partitionBy(key).orderBy(F.col(monotone).desc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))
