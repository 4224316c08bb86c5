"""Multi-micro-batch streaming: the staged stream dirs are chunked so
``maxFilesPerTrigger=1`` yields genuinely incremental execution — state
restore/save and watermark advancement across several real micro-batches
within one availableNow drain (not a single-batch simulation)."""

from pyspark.sql import Window
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


def test_session_windows_merge_across_batches(spark, sf_small):
    """Session windows must MERGE state across micro-batches: a session
    whose events straddle a chunk boundary emits ONCE with the combined
    count. Proven by comparing the drained append output (finalized
    sessions only) against a batch-computed island sessionization under
    the same watermark cutoff — any double-emission or split session
    would break the row-for-row equality."""
    progress: list = []
    # re-run the registered query's internals with progress capture
    events = stream_table(spark, sf_small, "events",
                          max_files_per_trigger=1)
    sess = (events.withWatermark("ts", "10 minutes")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.unix_micros("session_window.start").alias("s_us"),
                    F.unix_micros("session_window.end").alias("e_us"),
                    "n_events"))
    out = run_to_memory(sess, "append", collect_progress=progress)
    data_batches = [p for p in progress if _input_rows(p) > 0]
    assert len(data_batches) >= min(3, STREAM_CHUNKS)

    ev = load_table(spark, sf_small, "events")
    w = Window.partitionBy("user_id").orderBy("us")
    gap = 30 * 60 * 1_000_000
    isl = (ev.select("user_id", F.unix_micros("ts").alias("us"))
           .withColumn("prev", F.lag("us").over(w))
           .withColumn("brk", F.when(F.col("prev").isNull()
                                     | (F.col("us") - F.col("prev") >= gap),
                                     1).otherwise(0))
           .withColumn("sid", F.sum("brk").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    cutoff = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0] \
        - 10 * 60 * 1_000_000
    truth = (isl.groupBy("user_id", "sid")
             .agg(F.min("us").alias("s_us"),
                  (F.max("us") + gap).alias("e_us"),
                  F.count(F.lit(1)).alias("n_events"))
             .filter(F.col("e_us") <= cutoff)
             .drop("sid"))
    assert sorted(map(tuple, out.select("user_id", "s_us", "e_us",
                                        "n_events").collect())) == \
        sorted(map(tuple, truth.select("user_id", "s_us", "e_us",
                                       "n_events").collect()))


def test_rolling_anomaly_stream_spans_batches_and_matches_batch(
        spark, sf_small):
    """The streaming anomaly detector must fold its bounded state
    across >=3 real micro-batches and emit EXACTLY the batch
    operator's flag set — same rows, same integer diagnostics."""
    from kafka_connect_msk_demo_spark.operators.temporal import (
        rolling_zscore_anomalies,
    )
    from kafka_connect_msk_demo_spark.streaming.stateful import (
        rolling_anomaly_stream,
    )

    events = stream_table(spark, sf_small, "events",
                          max_files_per_trigger=1)
    progress: list = []
    drained = run_to_memory(rolling_anomaly_stream(events), "update",
                            collect_progress=progress)
    data_batches = [p for p in progress if _input_rows(p) > 0]
    assert len(data_batches) >= min(3, STREAM_CHUNKS)

    got = {(r.user_id, r.event_id, r.v_q, r.n_w, r.s_w)
           for r in drained.collect()}
    batch = rolling_zscore_anomalies(
        load_table(spark, sf_small, "events"),
        "user_id", ["ts", "event_id"], "value")
    want = {(r.user_id, r.event_id, r.v_q, r.n_w, r.s_w)
            for r in batch.collect()}
    assert got == want and want


def test_staged_chunks_have_strictly_increasing_mtimes(sf_small):
    """FileStreamSource orders pending files by modification time in
    MILLISECONDS — chunks written back-to-back land in the same
    millisecond and the tie order is the directory listing's, so
    micro-batches could deliver chunk 2 before chunk 1 and silently
    re-order every stateful event-time fold (this bit: the rolling
    anomaly stream folded part-0 then part-2, seeing 19 of 20 window
    rows). The staging layer must pin strictly increasing whole-second
    mtimes so ascending modTime IS the staged order."""
    import glob
    import os

    from kafka_connect_msk_demo_spark.catalog import _stream_dir

    d = _stream_dir(sf_small, "events")
    parts = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
    assert len(parts) >= min(2, STREAM_CHUNKS)
    mtimes = [os.stat(p).st_mtime for p in parts]
    assert all(b - a >= 1.0 for a, b in zip(mtimes, mtimes[1:])), mtimes


def test_staging_recovers_from_planted_lock_entry(sf_small, tmp_path,
                                                  monkeypatch):
    """A pre-planted entry at the predictable per-uid lock path (a
    symlink here — O_NOFOLLOW turns it into ELOOP, the same failure
    shape as a foreign-owned 0o600 file's EACCES) must not crash
    staging forever: the lock's parent dir is ours, so _stream_dir
    unlinks the planted entry and retries once."""
    import glob
    import os
    import tempfile

    import kafka_connect_msk_demo_spark.catalog as cat

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    safe = sf_small.strip("/").replace("/", "_")
    d = os.path.join(str(tmp_path), "spark_graft_streams", safe,
                     "events-c3")
    os.makedirs(os.path.dirname(d), exist_ok=True)
    lock = f"{d}.lock.{os.getuid()}"
    os.symlink("/nonexistent-target", lock)
    staged = cat._stream_dir(sf_small, "events", chunks=3)
    assert staged == d
    assert not os.path.islink(lock), "planted symlink not replaced"
    assert len(glob.glob(os.path.join(d, "part-*.parquet"))) == 3


def test_concurrent_staging_yields_one_valid_dir(sf_small, tmp_path):
    """ADVICE r6 (catalog lock TOCTOU): N processes racing to stage the
    same stream dir must serialize through the flock and leave exactly
    one coherent staged dir — marker matches the stamp, full chunk set,
    strictly increasing mtimes, no leftover .tmp.* staging dirs. The
    flock is kernel-released on process death, so no stale-lock
    breaking (the TOCTOU class) exists anymore."""
    import glob
    import multiprocessing as mp
    import os
    import tempfile

    import kafka_connect_msk_demo_spark.catalog as cat

    def worker(tmpdir, q):
        tempfile.tempdir = tmpdir  # isolate from the shared /tmp cache
        try:
            q.put(cat._stream_dir(sf_small, "events", chunks=3))
        except Exception as exc:  # noqa: BLE001
            q.put(f"ERROR {exc!r}")

    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [ctx.Process(target=worker, args=(str(tmp_path), q))
             for _ in range(4)]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)
    assert all(isinstance(r, str) and not r.startswith("ERROR")
               for r in results), results
    assert len(set(results)) == 1
    d = results[0]
    parts = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
    assert len(parts) == 3
    mtimes = [os.stat(p).st_mtime for p in parts]
    assert all(b - a >= 1.0 for a, b in zip(mtimes, mtimes[1:])), mtimes
    assert not glob.glob(d + ".tmp.*"), "leftover torn staging dirs"
    marker = open(os.path.join(d, "_STAGED")).read()
    st = os.stat(f"{sf_small}/events.parquet")
    assert marker == f"{st.st_mtime_ns}:{st.st_size}:3:v3"
