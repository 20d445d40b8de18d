"""rollback(): bad-batch recovery — state restoration, re-ingest healing
(the batch-index/rollback interplay), crash-window safety, and the files()
metadata table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

N = 8000
BATCH = 2000


@pytest.fixture()
def setup(spark, tmp_path):
    log = str(tmp_path / "log")
    change_log(spark, N).write.parquet(log)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    ingest_changelog(spark, table, log, batch_size=BATCH, merge_mode="mor")
    return table, log


def _oracle_upto(spark, log, hi):
    ev = spark.read.parquet(log).filter(F.col("offset") <= hi)
    return oracle_state_df(spark, ev)


def test_rollback_restores_state_and_reingest_heals(spark, tmp_path, setup):
    table, log = setup
    assert table.current_snapshot_id() == 4  # create + 4 batches
    hi2 = table.manifest(2)["offsets"]["hi"]

    new_id = table.rollback(2)
    assert new_id == 5
    assert table.last_committed_offset() == hi2
    got = table.scan(spark)
    want = _oracle_upto(spark, log, hi2)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # re-ingest MUST re-apply the rolled-back ranges (not skip on stale
    # batch ids) and converge to the full oracle
    res = ingest_changelog(spark, table, log, batch_size=BATCH, merge_mode="mor")
    applied = [r for r in res if not r.get("skipped")]
    assert len(applied) == 2  # exactly the two rolled-back batches
    got = table.scan(spark)
    want = oracle_state_df(spark, spark.read.parquet(log))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # history keeps everything; the rollback row is labeled
    hist = {r["snapshot_id"]: r for r in table.history(spark).collect()}
    assert hist[5]["merge_mode"] == "rollback"
    # and the dead snapshots remain time-travel readable (non-destructive)
    assert table.scan(spark, snapshot_id=4).count() > 0


def test_rollback_idempotence_crash_window(spark, tmp_path, setup):
    """A stale marker surviving a crash before marker GC must not answer
    'committed' for a rolled-back batch: the dead-range record governs."""
    table, log = setup
    dead_bid = table.manifest(4)["batch_id"]
    assert table.batch_committed(dead_bid) == 4

    # crash simulation: rollback happens but marker GC never runs
    real_delete = table.io.delete
    table.io.delete = lambda path: None
    try:
        table.rollback(3)
    finally:
        table.io.delete = real_delete
    # the stale marker file still exists, yet the batch reads as not-applied
    assert table.io.exists(table._batch_marker_path(dead_bid))
    assert table.batch_committed(dead_bid) is None
    # live batches still answer
    live_bid = table.manifest(3)["batch_id"]
    assert table.batch_committed(live_bid) == 3

    # re-ingest re-applies the batch AND repairs the stale dead marker:
    # the fencing must work again afterwards (a pure create-if-absent
    # marker write would lose to the stale file and re-apply forever)
    res = ingest_changelog(spark, table, log, batch_size=BATCH, merge_mode="mor")
    assert len([r for r in res if not r.get("skipped")]) == 1
    new_sid = table.batch_committed(dead_bid)
    assert new_sid is not None and not table._is_dead(new_sid)
    res2 = ingest_changelog(spark, table, log, batch_size=BATCH, merge_mode="mor")
    assert [r for r in res2 if not r.get("skipped")] == []


def test_rollback_commit_conflict_unrecords_dead_range(spark, setup):
    """A rollback that loses the commit CAS must not leave live snapshots
    flagged dead (they are still applied state)."""
    from glad_tiles_pipeline_spark.plans.lake import CommitConflict, LakeTable

    table, _ = setup
    before = table._dead_ranges()

    real_commit = LakeTable.commit
    def conflict(self, **kw):
        raise CommitConflict("simulated racer")
    LakeTable.commit = conflict
    try:
        with pytest.raises(CommitConflict):
            table.rollback(2)
    finally:
        LakeTable.commit = real_commit
    assert table._dead_ranges() == before
    # every batch still answers committed
    for sid in range(1, table.current_snapshot_id() + 1):
        assert table.batch_committed(table.manifest(sid)["batch_id"]) == sid


def test_rollback_validation(spark, setup):
    table, _ = setup
    with pytest.raises(ValueError, match="cannot roll back"):
        table.rollback(99)
    table.vacuum(keep_last=2, orphan_grace_seconds=0.0)
    with pytest.raises(ValueError, match="vacuum horizon"):
        table.rollback(0)


def test_incremental_refuses_window_spanning_rollback(spark, setup):
    table, _ = setup
    table.rollback(2)
    with pytest.raises(ValueError, match="rewrite commit"):
        table.incremental(spark, from_snapshot=1)
    # windows entirely after the rollback are fine once new commits land
    assert table.incremental(spark, from_snapshot=5).count() == 0


def test_files_metadata_table(spark, setup):
    table, _ = setup
    f = table.files(spark)
    m = table.manifest()
    assert f.count() == len(m["files"])
    rows = f.collect()
    assert all(r["size_bytes"] and r["size_bytes"] > 0 for r in rows)
    assert {r["bucket"] for r in rows} <= set(range(4))
    assert all(r["is_delta"] for r in rows)  # pure-mor table, pre-compaction
