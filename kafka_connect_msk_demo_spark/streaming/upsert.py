"""Upsertable table — the engine's native replacement for the
reference's Hudi DeltaStreamer plane (SURVEY.md §3.3, §2.1 S15).

Semantics reproduced:

* record key + ordering field, latest-wins
  (``deltastreamer_jobs_bulk.sh:13`` ``--source-ordering-field
  __source_ts_ms``; recordkey ``artist_id``
  ``deltastreamer_artists_apicurio_cow.properties:17``),
* hive-style partitioned layout (``:15-16``),
* delete rewrite: rows whose latest version has ``__deleted='true'``
  leave the table (``demonstration_notes.md:218-224``),
* cross-partition key moves — the reason the reference needs
  ``hoodie.index.type=GLOBAL_BLOOM`` (``…cow.properties:28``) — are
  handled by keying the MERGE on the record key alone and recomputing
  the partition path every batch.

Delivery contract (same as Hudi hard delete): redelivery of a key's
OLD version is harmless while any newer version is still present
(max_by re-picks the stored winner), but once a tombstone has been
APPLIED the deleted row leaves the table with no trace — an isolated
replay of a pre-tombstone version would then be treated as an insert
and resurrect the key (exactly what happens in Hudi when the hard
delete removed the index entry). This cannot occur under the
reference's transport: Debezium keys the topic by primary key, Kafka
preserves per-key order within a partition, and replays are
contiguous SUFFIX replays — an old event is only ever redelivered
together with every later event for that key, tombstone included, so
the fold reconverges. Feeds that violate per-key suffix-replay order
are outside the contract (pinned by
tests/test_mor.py::test_post_delete_isolated_replay_is_out_of_contract).
For feeds that CANNOT guarantee suffix replay, ``UpsertTable(...,
retain_tombstones=N)`` opts into Hudi's soft-delete pattern: applied
deletes stay stored as tombstone rows for N further merges — aged by
a persisted per-table merge counter, independent of caller batch_ids —
never surfacing on ``read()``, so an isolated pre-tombstone replay
within the window re-loses to the tombstone instead of resurrecting
(tests/test_upsert.py::test_retain_tombstones_blocks_resurrection).

Physical strategy (scale notes)
-------------------------------
Each ``foreachBatch`` MERGE:

1. reduces the incoming batch to one winner per key (``max_by`` — one
   shuffle on the key, map-side partials);
2. reads ONLY the currently-affected partitions of the base table —
   incoming partition values ∪ partitions that may hold moved keys
   (determined by an inner semi-join of base × batch keys, which
   Catalyst executes as a broadcast semi join for normal batch sizes);
3. re-merges and rewrites just those partitions via dynamic partition
   overwrite.

So the per-batch cost scales with the touched partitions, not the
table — the same contract Hudi's upsert gives. A 100 TB table with
date/tenant partitioning rewrites only the partitions the batch hits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) via the Hadoop FS API — works for file://,
    hdfs:// and s3a:// alike (the local-FS os.path probe this replaces
    broke on any non-local deployment)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _read_small_text(spark: SparkSession, path: str) -> str | None:
    """Read a small UTF-8 marker file via the Hadoop FS API; None when
    absent. Shared by the schema marker and the merge counter so the
    stream handling / charset semantics can never diverge."""
    fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


def _write_small_text(spark: SparkSession, path: str, text: str) -> None:
    """Overwrite-create a small UTF-8 marker file (Hadoop FS API)."""
    fs, jpath = _hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


class UpsertTable:
    """Primary-keyed, partitioned, time-ordered parquet table with
    latest-wins MERGE (W5)."""

    #: internal column stamping the persisted MERGE SEQUENCE at which a
    #: retained tombstone was applied (retain_tombstones mode only)
    TOMB_COL = "__tomb_since"

    def __init__(self, path: str, key_cols: list[str], ordering_col: str,
                 tiebreak_col: str, partition_by: str | None = None,
                 deleted_col: str = "__deleted",
                 retain_tombstones: int | None = None) -> None:
        """``retain_tombstones=N`` keeps an applied delete as a stored
        tombstone row for N further merge batches (Hudi's soft-delete
        pattern) instead of removing the key without trace: an
        ISOLATED replay of a pre-tombstone version within the
        retention window meets the stored tombstone and latest-wins
        keeps the delete — no resurrection. The default (``None``)
        preserves exact Hudi hard-delete parity: the documented
        delivery contract (suffix replay) needs no retention, and the
        table stores only live rows. Retention must be chosen at
        table creation and kept consistent across its lifetime.

        Tombstone age is measured by a PERSISTED per-table merge
        counter (``_merge_seq`` marker), not the caller-supplied
        ``batch_id`` (ADVICE r8): callers using the default
        ``batch_id=0`` on every merge no longer retain tombstones
        forever, and a checkpoint-restart batch-id jump can no longer
        purge the window early. A crash-replayed micro-batch counts as
        one more merge — the window is "N further successful merges",
        never shorter than N distinct batches."""
        self.path = path
        self.key_cols = key_cols
        self.ordering_col = ordering_col
        self.tiebreak_col = tiebreak_col
        self.partition_by = partition_by
        self.deleted_col = deleted_col
        self.retain_tombstones = retain_tombstones

    # -- helpers ----------------------------------------------------------

    SCHEMA_MARKER = "_schema.json"

    def _exists(self, spark: SparkSession) -> bool:
        """Table exists iff it holds at least one DATA file. A dir
        containing only _SUCCESS (a partitioned write of an EMPTY
        frame emits no part files) must read as absent — treating it
        as present made the next merge crash with
        UNABLE_TO_INFER_SCHEMA when a CDC feed's first batch resolved
        to all-deletes (every row's latest version a tombstone)."""
        fs, jpath = _hadoop_fs(spark, self.path)
        if not fs.exists(jpath):
            return False
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                return True
        return False

    def _write_schema_marker(self, spark: SparkSession,
                             schema) -> None:
        """Persist the table schema beside the data (partitioned
        layouts only): a partitioned write of an empty frame leaves no
        parquet footer, so an all-deletes table state would otherwise
        be unreadable. Hadoop FS API — works on file://, hdfs://,
        s3a:// alike."""
        _write_small_text(spark, f"{self.path}/{self.SCHEMA_MARKER}",
                          schema.json())

    def _merge_seq_path(self) -> str:
        """SIBLING of the table dir (``<path>__merge_seq``), never
        inside it: the non-partitioned merge swaps the whole table dir
        (delete + rename), so an in-dir marker would be lost by a
        crash between the swap and the counter persist — the sibling
        survives any data-dir rewrite in both layouts."""
        return f"{self.path.rstrip('/')}__merge_seq"

    def _read_merge_seq(self, spark: SparkSession) -> int:
        """Persisted count of completed merges (retention mode only);
        -1 when the table has never merged."""
        raw = _read_small_text(spark, self._merge_seq_path())
        if raw is None:
            return -1
        try:
            return int(raw.strip())
        except ValueError:
            return -1

    def _write_merge_seq(self, spark: SparkSession, seq: int) -> None:
        _write_small_text(spark, self._merge_seq_path(), str(seq))

    def _read_schema_marker(self, spark: SparkSession):
        import json as _json

        from pyspark.sql import types as T
        raw = _read_small_text(spark, f"{self.path}/{self.SCHEMA_MARKER}")
        if raw is None:
            return None
        return T.StructType.fromJson(_json.loads(raw))

    def _live(self, df: DataFrame) -> DataFrame:
        """Drop deleted rows, null-safely: a NULL deleted flag means the
        row was never deleted (external CDC feeds may leave it NULL)."""
        return df.filter(
            ~F.coalesce(F.col(self.deleted_col) == "true", F.lit(False)))

    def _read_stored(self, spark: SparkSession) -> DataFrame:
        """The stored state verbatim — includes retained tombstone
        rows when ``retain_tombstones`` is set. A table whose current
        state is EMPTY (every key deleted) has no parquet footers
        under a partitioned layout — the schema marker written
        alongside every partitioned write makes it read as a 0-row
        frame instead of erroring."""
        if not self._exists(spark):
            schema = self._read_schema_marker(spark)
            if schema is not None:
                return spark.createDataFrame([], schema)
        return spark.read.parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        """Read the merged table (live rows; retained tombstones and
        the internal stamp column never surface)."""
        stored = self._read_stored(spark)
        if self.retain_tombstones is None:
            return stored
        out = self._live(stored)
        return out.drop(self.TOMB_COL) if self.TOMB_COL in out.columns \
            else out

    def _latest_wins(self, df: DataFrame) -> DataFrame:
        ordering = F.struct(F.col(self.ordering_col),
                            F.col(self.tiebreak_col))
        others = [c for c in df.columns if c not in self.key_cols]
        return (df.groupBy(*self.key_cols)
                .agg(*[F.max_by(c, ordering).alias(c) for c in others])
                .select(*df.columns))

    def _merged_state(self, merged: DataFrame,
                      merge_seq: int) -> DataFrame:
        """Rows to STORE after a merge: live rows, plus — when
        ``retain_tombstones=N`` — applied tombstones stamped with the
        MERGE SEQUENCE that applied them and purged once ``N`` further
        merges have completed. Hard-delete mode (None) stores live
        rows only. ``merge_seq`` comes from the persisted per-table
        counter, never the caller's batch_id (see __init__)."""
        if self.retain_tombstones is None:
            return self._live(merged)
        dead = F.coalesce(F.col(self.deleted_col) == "true", F.lit(False))
        stamped = merged.withColumn(
            self.TOMB_COL,
            F.when(~dead, F.lit(None).cast("long"))
            .otherwise(F.coalesce(F.col(self.TOMB_COL),
                                  F.lit(merge_seq).cast("long"))))
        return stamped.filter(
            (~dead) | (F.lit(merge_seq) - F.col(self.TOMB_COL)
                       < F.lit(self.retain_tombstones)))

    def _with_tomb(self, df: DataFrame) -> DataFrame:
        """Ensure the internal stamp column exists (retention mode)."""
        if self.TOMB_COL in df.columns:
            return df
        return df.withColumn(self.TOMB_COL, F.lit(None).cast("long"))

    def _rewrite_partitions(self, base: DataFrame, incoming: DataFrame,
                            stamp: int, retain: bool) -> DataFrame:
        """Distinct partition values this merge must rewrite, AS A
        DATAFRAME (one column named ``partition_by``) — never a
        driver-side list:

        * where incoming rows land,
        * where existing versions of the incoming keys currently live
          (cross-partition moves must vacate their old partition; the
          lookup scans only (key, partition) — column pruning keeps it
          a 2-column parquet scan),
        * partitions holding tombstones this merge ages OUT of the
          retention window — the purge in ``_merged_state`` only
          reaches partitions in the rewrite set, so without this a
          tombstone in a cold partition would outlive its window
          (unbounded accumulation) and the "purged once N further
          merges have completed" contract would hold only for hot
          partitions. Each tombstone triggers at most ONE extra
          partition rewrite in its lifetime (at age N, then it is
          gone).
        """
        pcol = self.partition_by
        out = incoming.select(pcol).unionByName(
            base.select(*self.key_cols, pcol)
            .join(incoming.select(*self.key_cols).distinct(),
                  self.key_cols, "left_semi")
            .select(pcol))
        if retain:
            out = out.unionByName(
                base.filter(F.col(self.TOMB_COL)
                            <= stamp - self.retain_tombstones)
                .select(pcol))
        return out.distinct()

    # -- the MERGE --------------------------------------------------------

    def merge_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch body: MERGE a micro-batch of unwrapped CDC rows
        (must carry key, ordering, tiebreak and deleted columns)."""
        spark = batch.sparkSession
        incoming = self._latest_wins(batch)
        retain = self.retain_tombstones is not None
        # Tombstone ages advance on the PERSISTED merge counter, not
        # the caller's batch_id — batch_id only names the temp dir.
        stamp = (self._read_merge_seq(spark) + 1) if retain else batch_id
        if retain:
            incoming = self._with_tomb(incoming)

        if self._exists(spark):
            cols = list(batch.columns) + ([self.TOMB_COL] if retain
                                          else [])
            base = self._with_tomb(self._read_stored(spark)) if retain \
                else self._read_stored(spark)
            base = base.select(*cols)
            if self.partition_by:
                parts_df = self._rewrite_partitions(base, incoming,
                                                    stamp, retain)
                # The rewrite set stays a DataFrame end to end
                # (VERDICT r9 #3): the previous shape collected 3-4
                # distinct-partition lists to the driver and filtered
                # base with a literal ``isin(parts)``, which bloats
                # both the driver and the compiled plan once the
                # partition column is high-cardinality. A broadcast
                # left-semi join carries the same semantics with a
                # bounded-size build side (distinct partition VALUES
                # touched by one micro-batch — the same boundedness
                # the old collect assumed, but degrading gracefully
                # instead of OOMing the driver), and dynamic partition
                # pruning reuses the broadcast to prune the base scan
                # to the touched directories.
                affected = base.join(F.broadcast(parts_df),
                                     self.partition_by, "left_semi")
                live = self._merged_state(
                    self._latest_wins(affected.unionByName(incoming)),
                    stamp)
                # Dynamic overwrite only rewrites partitions present in
                # the written frame: a partition fully vacated by
                # deletes or key moves keeps its stale files and must
                # be dropped explicitly. Collect ONLY the vacated set
                # (rewrite set minus surviving partitions — normally
                # empty or tiny), and do it BEFORE the write: afterwards
                # the lazy plans would re-scan base files the overwrite
                # just replaced.
                vacated = [r[0] for r in parts_df.join(
                    live.select(self.partition_by).distinct(),
                    self.partition_by, "left_anti").collect()]
                with _dynamic_overwrite(spark):
                    (live.write.mode("overwrite")
                     .partitionBy(self.partition_by).parquet(self.path))
                fs, _ = _hadoop_fs(spark, self.path)
                jvm_path = spark._jvm.org.apache.hadoop.fs.Path
                for p in vacated:
                    fs.delete(
                        jvm_path(f"{self.path}/{self.partition_by}={p}"),
                        True)
                self._write_schema_marker(spark, live.schema)
            else:
                # Never overwrite the path a lazy plan is still reading:
                # Spark's static overwrite deletes target files before the
                # scan runs, destroying the table. Write the merged result
                # to a sibling temp dir, then swap via FS rename (atomic
                # on HDFS; copy-rename on S3A — a versioned-dir layout is
                # the production alternative there).
                live = self._merged_state(self._latest_wins(
                    base.unionByName(incoming)), stamp)
                tmp = f"{self.path.rstrip('/')}__tmp_{batch_id}"
                live.write.mode("overwrite").parquet(tmp)
                fs, jpath = _hadoop_fs(spark, self.path)
                jvm_path = spark._jvm.org.apache.hadoop.fs.Path
                fs.delete(jpath, True)
                fs.rename(jvm_path(tmp), jpath)
        else:
            live = self._merged_state(incoming, stamp)
            writer = live.write.mode("overwrite")
            if self.partition_by:
                writer = writer.partitionBy(self.partition_by)
            writer.parquet(self.path)
            if self.partition_by:
                # an all-deletes first batch writes no part files; the
                # marker keeps the (empty) table readable and _exists
                # stays False so the next batch re-runs initial insert
                self._write_schema_marker(spark, live.schema)
        if retain:
            # Persist AFTER the data write: a crashed merge re-reads
            # the old counter and replays as the same merge_seq (ages
            # never advance past data they didn't see). The marker is
            # a SIBLING of the table dir so the non-partitioned swap's
            # dir delete cannot drop the previous counter either.
            self._write_merge_seq(spark, stamp)

    # -- read views (S15: Hudi _ro/_rt analog) -----------------------------

    def register_view(self, spark: SparkSession, name: str) -> None:
        """Register the merged table for spark.sql() reads — the
        engine's equivalent of the Hive-synced ``_ro`` view."""
        self.read(spark).createOrReplaceTempView(name)

    # -- table services (the Hudi compaction/clustering analog) ------------

    def file_stats(self, spark: SparkSession) -> list[tuple[str, int, int]]:
        """(partition, n_files, total_bytes) per partition directory —
        the small-file diagnostic a compaction policy reads. Pure FS
        metadata (no data scan)."""
        fs, jpath = _hadoop_fs(spark, self.path)
        out = []
        if self.partition_by:
            for st in fs.listStatus(jpath):
                if not st.isDirectory():
                    continue
                name = st.getPath().getName()
                files = [f for f in fs.listStatus(st.getPath())
                         if f.getPath().getName().endswith(".parquet")]
                out.append((name, len(files),
                            sum(f.getLen() for f in files)))
        else:
            files = [f for f in fs.listStatus(jpath)
                     if f.getPath().getName().endswith(".parquet")]
            out.append(("", len(files), sum(f.getLen() for f in files)))
        return sorted(out)

    def compact(self, spark: SparkSession,
                target_bytes: int = 128 * 1024 * 1024,
                min_files: int = 2) -> list[str]:
        """Rewrite partitions whose file count exceeds ``min_files``
        into ⌈bytes/target⌉ right-sized files — the engine's analog of
        Hudi's compaction / clustering table service (the reference
        schedules it inline via ``hoodie.compact.inline``,
        ``deltastreamer_jobs_bulk.sh``; MERGE here produces the
        small-file debt the same way frequent micro-batch commits do).

        Data is byte-identical afterwards — compaction only changes the
        file layout, which tests assert by content equality. The
        rewrite reads the STORED state, so in ``retain_tombstones``
        mode in-window tombstone rows (and their stamp column) survive
        compaction — a layout service must never shrink the
        resurrection-protection window. Returns the list of partitions
        rewritten.

        Scale shape: the policy reads FS metadata only; each selected
        partition is read once, repartitioned to its target file count,
        and swapped in via dynamic partition overwrite — cost scales
        with the rewritten partitions, never the table. Unpartitioned
        tables use the same temp-dir + rename swap as the MERGE."""
        stats = self.file_stats(spark)
        todo = [(p, max(1, -(-size // target_bytes)))
                for p, n, size in stats if n > min_files]
        if not todo:
            return []
        if self.partition_by:
            for part, nfiles in todo:
                val = part.split("=", 1)[1]
                sub = self._read_stored(spark).filter(
                    F.col(self.partition_by) == val)
                with _dynamic_overwrite(spark):
                    (sub.repartition(nfiles).write.mode("overwrite")
                     .partitionBy(self.partition_by).parquet(self.path))
        else:
            nfiles = todo[0][1]
            stored = self._read_stored(spark).repartition(nfiles)
            tmp = f"{self.path.rstrip('/')}__compact_tmp"
            stored.write.mode("overwrite").parquet(tmp)
            fs, jpath = _hadoop_fs(spark, self.path)
            jvm_path = spark._jvm.org.apache.hadoop.fs.Path
            fs.delete(jpath, True)
            fs.rename(jvm_path(tmp), jpath)
        return [p for p, _ in todo]


class MergeOnReadTable:
    """Merge-on-Read twin of :class:`UpsertTable` — the engine's analog
    of the reference's MoR DeltaStreamer mode
    (``hudi/debezium_hudi_demo/deltastreamer_jobs_bulk.sh:7-79`` runs
    CoW AND MoR jobs; ``moma_debezium_hudi_demo.ipynb`` cells 8-11
    query the ``_ro`` vs ``_rt`` views of the MoR table).

    Layout::

        path/base/...             partitioned parquet (bulk insert +
                                   compaction output only)
        path/log/_delta=NNNN/...  append-only per-batch delta files

    Why MoR exists: a CoW MERGE rewrites every affected partition per
    micro-batch — at 100 TB CDC that write amplification is the #1
    cost lever. Here ingest (:meth:`append_batch`) writes ONLY the
    batch rows (one small parquet write, never reads or rewrites the
    base); the merge cost moves to read time (``_rt``) and is
    amortized away by :meth:`compact`.

    ``_rt`` scale shape: the uncompacted log between compactions is
    small relative to the base, so its distinct key set broadcasts.
    The base splits into untouched rows (anti join against the log
    keys — streams through with NO shuffle) and affected rows (semi
    join), and only affected ∪ log goes through the latest-wins
    window. A 100 TB base with a 10 GB log shuffles 10-GB-scale data,
    not the table.
    """

    LOG_COL = "_delta"

    def __init__(self, path: str, key_cols: list[str], ordering_col: str,
                 tiebreak_col: str, partition_by: str | None = None,
                 deleted_col: str = "__deleted",
                 max_delta_commits: int | None = None,
                 retain_tombstones: int | None = None) -> None:
        """``max_delta_commits`` is the ``hoodie.compact.inline.max.
        delta.commits`` analog (the reference's DeltaStreamer MoR jobs
        schedule inline compaction): when set, :meth:`append_batch`
        folds the log into base once it holds that many delta commits,
        which also bounds the log key set the ``_rt`` broadcast
        carries.

        ``retain_tombstones=N`` passes the soft-delete pattern through
        to the compacted base (see :class:`UpsertTable`): compaction
        stores applied deletes as tombstone rows for N further
        compaction merges, and ``_rt`` reads merge against the STORED
        state (tombstones included) so an isolated pre-tombstone
        replay appended to the log re-loses to a retained tombstone
        instead of resurrecting through the read-time merge."""
        self.base = UpsertTable(f"{path.rstrip('/')}/base", key_cols,
                                ordering_col, tiebreak_col, partition_by,
                                deleted_col,
                                retain_tombstones=retain_tombstones)
        self.path = path.rstrip("/")
        self.log_path = f"{self.path}/log"
        self.key_cols = key_cols
        self.ordering_col = ordering_col
        self.tiebreak_col = tiebreak_col
        self.partition_by = partition_by
        self.deleted_col = deleted_col
        self.max_delta_commits = max_delta_commits
        #: names registered via :meth:`register_views`, re-registered
        #: after every :meth:`compact` (the fold rewrites base files
        #: and drops consumed log dirs, so a view's previously-analyzed
        #: lazy plan would reference files that no longer exist — the
        #: reference notebook's query-then-compact-then-query sequence)
        self._view_names: set[str] = set()

    # -- helpers ------------------------------------------------------------

    def _log_batches(self, spark: SparkSession) -> list[str]:
        fs, jpath = _hadoop_fs(spark, self.log_path)
        if not fs.exists(jpath):
            return []
        return sorted(st.getPath().getName() for st in fs.listStatus(jpath)
                      if st.isDirectory()
                      and st.getPath().getName().startswith(
                          f"{self.LOG_COL}="))

    def _read_log(self, spark: SparkSession,
                  batches: list[str]) -> DataFrame | None:
        if not batches:
            return None
        paths = [f"{self.log_path}/{b}" for b in batches]
        return spark.read.parquet(*paths)

    # -- ingest (the whole point: no base read, no partition rewrite) -------

    def append_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch body: append the micro-batch to the delta log.

        Unlike the CoW MERGE this never reads the base table and never
        rewrites a partition — one parquet write of exactly the batch
        rows. Latest-wins is deferred to ``_rt`` reads / compaction,
        keyed on (ordering, tiebreak), so re-appended duplicates are
        harmless (max_by picks the same winner)."""
        spark = batch.sparkSession
        if not self.base._exists(spark):
            # initial bulk insert goes straight to base files, exactly
            # like DeltaStreamer's first commit.
            self.base.merge_batch(batch, batch_id)
            return
        (batch.write.mode("overwrite")
         .parquet(f"{self.log_path}/{self.LOG_COL}={batch_id:09d}"))
        if (self.max_delta_commits is not None
                and len(self._log_batches(spark)) >= self.max_delta_commits):
            self.compact(spark)  # inline compaction (hoodie analog)

    # -- read views (S15: _ro / _rt) ----------------------------------------

    def read_optimized(self, spark: SparkSession) -> DataFrame:
        """``_ro``: base files only — fast, possibly stale (pending log
        entries are invisible until compaction folds them in)."""
        return self.base.read(spark)

    def read_realtime(self, spark: SparkSession) -> DataFrame:
        """``_rt``: read-time merge of base ∪ log (W3 latest-wins over
        the record key, delete rows dropped) — always current.

        Base rows whose key never appears in the log bypass the merge
        entirely via a broadcast anti join (no shuffle of the base);
        only (base ⋉ log-keys) ∪ log enters the latest-wins window.

        Retention mode merges against the STORED base state —
        retained tombstones included — so a within-window isolated
        replay in the log loses to the stored tombstone; tombstones
        and the stamp column never surface in the returned frame."""
        retain = self.base.retain_tombstones is not None
        log = self._read_log(spark, self._log_batches(spark))
        base = self.base._with_tomb(self.base._read_stored(spark)) \
            if retain else self.read_optimized(spark)
        if log is None:
            out = self.base._live(base)
            return out.drop(UpsertTable.TOMB_COL) if retain else out
        log = self.base._with_tomb(log) if retain else log
        log = log.select(*base.columns)
        keys = F.broadcast(log.select(*self.key_cols).distinct())
        untouched = base.join(keys, self.key_cols, "left_anti")
        affected = base.join(keys, self.key_cols, "left_semi")
        if retain:
            # untouched STORED rows can be retained tombstones — the
            # live filter must cover both branches here, unlike the
            # hard-delete path below (whose base stores live rows
            # only, and whose plan shape is kept byte-identical).
            merged = self.base._latest_wins(affected.unionByName(log))
            return self.base._live(untouched.unionByName(merged)) \
                .drop(UpsertTable.TOMB_COL)
        merged = self.base._live(
            self.base._latest_wins(affected.unionByName(log)))
        return untouched.unionByName(merged)

    def register_views(self, spark: SparkSession, name: str) -> None:
        """``{name}_ro`` / ``{name}_rt`` temp views — the Hive-synced
        pair the reference notebook queries (ipynb cells 8-11).

        The views stay valid ACROSS compaction: :meth:`compact`
        re-registers every name seen here against the post-compaction
        file layout. (A raw DataFrame handle from
        :meth:`read_realtime` held across a compact() is NOT
        refreshed — its analyzed plan pins pre-compaction files — so
        query through the views, or re-call read_realtime after
        compacting.)"""
        self._view_names.add(name)
        self.read_optimized(spark).createOrReplaceTempView(f"{name}_ro")
        self.read_realtime(spark).createOrReplaceTempView(f"{name}_rt")

    # -- table service -------------------------------------------------------

    def compact(self, spark: SparkSession) -> list[str]:
        """Fold the delta log into base files (Hudi's MoR compaction,
        ``hoodie.compact.inline.max.delta.commits`` analog) and delete
        the consumed log batches. Afterwards ``_ro`` == ``_rt``.

        Reuses the CoW MERGE for the fold, so only partitions the log
        actually touches (incoming values ∪ partitions holding moved
        keys) are rewritten — cost scales with the log, not the base.
        The consumed-batch list is snapshotted BEFORE the fold so a
        concurrent append lands in a later compaction, never lost."""
        batches = self._log_batches(spark)
        log = self._read_log(spark, batches)
        if log is None:
            return []
        self.base.merge_batch(log.select(
            *self.read_optimized(spark).columns))
        fs, _ = _hadoop_fs(spark, self.log_path)
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path
        for b in batches:
            fs.delete(jvm_path(f"{self.log_path}/{b}"), True)
        # refresh registered views: their lazy plans referenced the
        # pre-compaction base files and the just-deleted log dirs.
        # Snapshot first — register_views re-adds each name to the
        # live set, and mutating a set mid-iteration is only benign
        # today because re-adding an existing element keeps the size.
        for name in list(self._view_names):
            self.register_views(spark, name)
        return batches


class _dynamic_overwrite:
    """Scoped spark.sql.sources.partitionOverwriteMode=dynamic, so the
    overwrite replaces only partitions present in the written frame."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                            "dynamic")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                            self.prev)
