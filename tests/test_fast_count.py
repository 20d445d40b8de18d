"""Manifest-served row counts (plans/lake.py::fast_count — Iceberg
count-pushdown parity).

Contract under test: on a RESOLVED snapshot (CoW always; MoR/mor_dv
after compaction) the count is answered from per-file manifest rows with
no SparkSession at all and equals the scan count; on an unresolved
snapshot it falls back to the resolved scan (and refuses to guess
without a session); time travel counts the historical snapshot.
"""

from __future__ import annotations

import pytest

from glad_tiles_pipeline_spark.operators.merge import compact
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log


def _mk(spark, tmp_path, merge_mode):
    log_dir = str(tmp_path / "log")
    change_log(spark, 3000, n_repos=8, paths_per_repo=40).write.parquet(log_dir)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    ingest_changelog(spark, table, log_dir, batch_size=1000,
                     merge_mode=merge_mode)
    return table


def test_cow_counts_from_manifest_without_spark(spark, tmp_path):
    table = _mk(spark, tmp_path, "cow")
    want = table.scan(spark).count()
    assert table.fast_count() == want  # no session passed: manifest-only


def test_mor_falls_back_then_compaction_restores_fast_path(spark, tmp_path):
    table = _mk(spark, tmp_path, "mor")
    want = table.scan(spark).count()
    # unresolved: deltas need LWW arbitration — no session refuses
    with pytest.raises(ValueError, match="unresolved"):
        table.fast_count()
    assert table.fast_count(spark) == want
    compact(spark, table, batch_id="fc-compact")
    assert table.fast_count() == want  # manifest-only again


def test_mor_dv_sidecars_force_fallback(spark, tmp_path):
    table = _mk(spark, tmp_path, "mor_dv")
    want = table.scan(spark).count()
    m = table.manifest(None)
    assert any(f.get("kind") in ("tomb", "dv") for f in m["files"])
    assert table.fast_count(spark) == want
    compact(spark, table, batch_id="fc-compact")
    assert table.fast_count() == want


def test_time_travel_count(spark, tmp_path):
    table = _mk(spark, tmp_path, "cow")
    sid = 1  # after the first batch
    want = table.scan(spark, snapshot_id=sid).count()
    assert table.fast_count(snapshot_id=sid) == want
