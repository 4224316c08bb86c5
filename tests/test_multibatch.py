"""Multi-micro-batch streaming: the staged stream dirs are chunked so
``maxFilesPerTrigger=1`` yields genuinely incremental execution — state
restore/save and watermark advancement across several real micro-batches
within one availableNow drain (not a single-batch simulation)."""

from pyspark.sql import functions as F

from kafka_connect_msk_demo_spark.catalog import (STREAM_CHUNKS, load_table,
                                                  stream_table)
from kafka_connect_msk_demo_spark.streaming.runner import run_to_memory
from kafka_connect_msk_demo_spark.streaming.stateful import (
    latest_emission, running_user_stats)


def _input_rows(progress_entry):
    if isinstance(progress_entry, dict):
        return progress_entry["numInputRows"]
    return progress_entry.numInputRows


def test_running_user_stats_executes_multiple_microbatches(spark, sf_small):
    events = stream_table(spark, sf_small, "events",
                          max_files_per_trigger=1)
    progress: list = []
    drained = run_to_memory(running_user_stats(events), "update",
                            collect_progress=progress)
    data_batches = [p for p in progress if _input_rows(p) > 0]
    assert len(data_batches) >= min(3, STREAM_CHUNKS), \
        f"expected >=3 data micro-batches, got {len(data_batches)}"

    # state carried across batches: final n per user == batch groupBy count
    out = latest_emission(drained)
    truth = (load_table(spark, sf_small, "events")
             .groupBy("user_id").count())
    mismatches = (out.join(truth, "user_id")
                  .filter(F.col("n") != F.col("count")).count())
    assert mismatches == 0
    assert out.count() == truth.count()


def test_complete_mode_agg_spans_batches(spark, sf_small):
    """Complete-mode all-time agg over a chunked stream equals the batch
    answer — and executes one micro-batch per staged chunk."""
    from kafka_connect_msk_demo_spark.operators.aggregates import dec

    events = stream_table(spark, sf_small, "events",
                          max_files_per_trigger=1)
    agg = (events.groupBy("event_type")
           .agg(F.sum(dec("value", 25, 8)).cast("double").alias("sales"),
                F.count("value").alias("orders")))
    progress: list = []
    result = run_to_memory(agg, "complete", collect_progress=progress)
    data_batches = [p for p in progress if _input_rows(p) > 0]
    assert len(data_batches) == STREAM_CHUNKS

    truth = (load_table(spark, sf_small, "events")
             .groupBy("event_type")
             .agg(F.sum(dec("value", 25, 8)).cast("double").alias("sales"),
                  F.count("value").alias("orders")))
    assert sorted(map(tuple, result.collect())) == \
        sorted(map(tuple, truth.collect()))
