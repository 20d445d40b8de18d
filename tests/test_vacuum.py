"""Snapshot retention (lake.vacuum): expire data files of old snapshots,
remove crashed-commit orphans under a grace period, keep idempotent-replay
history, protect in-retention time travel."""

from __future__ import annotations

import os

import pytest

from glad_tiles_pipeline_spark.operators.merge import compact
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

N = 4000


def _mk(spark, tmp_path, mode="cow"):
    d = str(tmp_path / "log")
    change_log(spark, N).write.parquet(d)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    ingest_changelog(spark, table, d, batch_size=1000, merge_mode=mode)
    if mode == "mor":
        compact(spark, table)
    return table, d


def _parquet_count(root):
    return sum(
        1
        for dp, _dn, fns in os.walk(os.path.join(root, "data"))
        for f in fns
        if f.endswith(".parquet")
    )


def test_vacuum_removes_superseded_files_keeps_state(spark, tmp_path):
    table, d = _mk(spark, tmp_path, mode="cow")
    before = _parquet_count(table.root)
    res = table.vacuum(keep_last=1, orphan_grace_seconds=0)
    assert res["removed_files"] > 0
    assert _parquet_count(table.root) < before
    got = table.scan(spark)
    want = oracle_state_df(spark, spark.read.parquet(d))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_vacuum_respects_retention_window(spark, tmp_path):
    table, _ = _mk(spark, tmp_path, mode="cow")
    cur = table.current_snapshot_id()
    table.vacuum(keep_last=2, orphan_grace_seconds=0)
    # retained snapshots still scannable
    assert table.scan(spark, snapshot_id=cur - 1).count() > 0
    # below the horizon -> informative error, not a missing-file crash
    with pytest.raises(ValueError, match="vacuum horizon"):
        table.scan(spark, snapshot_id=1)


def test_vacuum_removes_orphans_but_honors_grace(spark, tmp_path):
    table, _ = _mk(spark, tmp_path, mode="cow")
    # fake a crashed commit attempt: data files written, manifest never
    # published
    orphan_abs, _rel = table.new_data_dir()
    with open(os.path.join(orphan_abs, "part-orphan.parquet"), "wb") as f:
        f.write(b"not really parquet")
    # fresh orphan survives (grace window)
    table.vacuum(keep_last=100, orphan_grace_seconds=3600)
    assert os.path.exists(os.path.join(orphan_abs, "part-orphan.parquet"))
    # aged orphan is collected
    table.vacuum(keep_last=100, orphan_grace_seconds=0)
    assert not os.path.exists(os.path.join(orphan_abs, "part-orphan.parquet"))


def test_vacuum_after_mor_compaction_drops_delta_files(spark, tmp_path):
    table, d = _mk(spark, tmp_path, mode="mor")
    before = _parquet_count(table.root)
    res = table.vacuum(keep_last=1, orphan_grace_seconds=0)
    assert res["removed_files"] > 0  # pre-compaction delta generations gone
    assert _parquet_count(table.root) < before
    got = table.scan(spark)
    want = oracle_state_df(spark, spark.read.parquet(d))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_replay_after_vacuum_is_still_idempotent(spark, tmp_path):
    table, d = _mk(spark, tmp_path, mode="cow")
    table.vacuum(keep_last=1, orphan_grace_seconds=0)
    snap = table.current_snapshot_id()
    # re-running the whole ingest must be a pure no-op (batch-id history
    # survives vacuum because manifests are never deleted)
    res = ingest_changelog(spark, table, d, batch_size=1000)
    assert [r for r in res if not r.get("skipped")] == []
    assert table.current_snapshot_id() == snap
