"""Unit tests for the UpsertTable MERGE writer — the edge cases the
end-to-end cdc_upsert oracle check cannot reach:

* non-partitioned multi-batch merge (a naive overwrite of the path a
  lazy plan still reads destroys the table — FAILED_READ_FILE);
* a partition fully vacated by deletes / cross-partition key moves must
  not keep stale files under dynamic partition overwrite;
* NULL ``__deleted`` flags must be treated as live, not dropped.
"""

import pytest

from kafka_connect_msk_demo_spark.streaming.upsert import UpsertTable


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id int, part string, val string, ts bigint, seq int, "
              "__deleted string")


def _table(path, partition_by=None):
    return UpsertTable(path=str(path), key_cols=["id"], ordering_col="ts",
                       tiebreak_col="seq", partition_by=partition_by)


def test_nonpartitioned_multibatch(spark, tmp_path):
    t = _table(tmp_path / "t")
    t.merge_batch(_batch(spark, [(1, "a", "v1", 10, 0, "false"),
                                 (2, "a", "v1", 10, 0, "false")]), 0)
    # second batch: update key 1, insert key 3, delete key 2
    t.merge_batch(_batch(spark, [(1, "a", "v2", 20, 0, "false"),
                                 (3, "b", "v1", 20, 0, "false"),
                                 (2, "a", "v1", 20, 0, "true")]), 1)
    # third batch proves the table survived the second overwrite
    t.merge_batch(_batch(spark, [(4, "b", "v1", 30, 0, "false")]), 2)
    got = {(r.id, r.val) for r in t.read(spark).collect()}
    assert got == {(1, "v2"), (3, "v1"), (4, "v1")}


def test_partition_vacated_by_delete(spark, tmp_path):
    t = _table(tmp_path / "t", partition_by="part")
    t.merge_batch(_batch(spark, [(1, "a", "v1", 10, 0, "false"),
                                 (2, "b", "v1", 10, 0, "false")]), 0)
    # delete the only row of partition b → directory must disappear
    t.merge_batch(_batch(spark, [(2, "b", "v1", 20, 0, "true")]), 1)
    rows = t.read(spark).collect()
    assert {(r.id, r.part) for r in rows} == {(1, "a")}
    assert not (tmp_path / "t" / "part=b").exists()


def test_cross_partition_key_move(spark, tmp_path):
    t = _table(tmp_path / "t", partition_by="part")
    t.merge_batch(_batch(spark, [(1, "a", "v1", 10, 0, "false")]), 0)
    # key 1 moves a → b; old partition is fully vacated
    t.merge_batch(_batch(spark, [(1, "b", "v2", 20, 0, "false")]), 1)
    rows = t.read(spark).collect()
    assert {(r.id, r.part, r.val) for r in rows} == {(1, "b", "v2")}
    assert not (tmp_path / "t" / "part=a").exists()


def test_null_deleted_flag_is_live(spark, tmp_path):
    t = _table(tmp_path / "t")
    t.merge_batch(_batch(spark, [(1, "a", "v1", 10, 0, None),
                                 (2, "a", "v1", 10, 0, "true")]), 0)
    t.merge_batch(_batch(spark, [(3, "a", "v1", 20, 0, None)]), 1)
    got = {r.id for r in t.read(spark).collect()}
    assert got == {1, 3}


def test_latest_wins_tiebreak(spark, tmp_path):
    t = _table(tmp_path / "t")
    t.merge_batch(_batch(spark, [(1, "a", "lo", 10, 1, "false"),
                                 (1, "a", "hi", 10, 2, "false")]), 0)
    assert [r.val for r in t.read(spark).collect()] == ["hi"]
