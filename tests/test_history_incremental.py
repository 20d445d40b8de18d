"""Table history + incremental (CDC-OUT) reads: the engine can serve as a
change SOURCE, not just a sink — a downstream pipeline tails this table's
snapshots the same way the engine tails its upstream log.

Invariant under test: replaying the incremental feeds window-by-window on
top of the base snapshot state reproduces the full table state (the same
LWW merge the engine itself applies), and each window's feed reads only
that window's delta files.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

KEY = ["repo", "path"]


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("hist")
    log_dir = str(base / "log")
    change_log(spark, 4000).write.parquet(log_dir)
    table = LakeTable.create(str(base / "lake"), n_buckets=8)
    ingest_changelog(spark, table, log_dir, batch_size=1000, merge_mode="mor")
    return table


def test_history_lists_all_snapshots(spark, ingested):
    hist = ingested.history(spark).orderBy("snapshot_id").collect()
    assert hist[0]["batch_id"] == "__create__"
    assert hist[-1]["snapshot_id"] == ingested.current_snapshot_id()
    assert hist[-1]["offset_hi"] == 3999
    data_commits = [h for h in hist if h["merge_mode"] == "mor"]
    assert len(data_commits) == 4
    assert sum(h["events_read"] or 0 for h in data_commits) == 4000


def test_incremental_window_feeds_replay_to_full_state(spark, ingested):
    """base state + LWW-merge of each window's change feed == final scan."""
    table = ingested
    cur = table.current_snapshot_id()
    mid = cur // 2

    feed = table.incremental(spark, mid, cur)
    base_state = table.scan(spark, snapshot_id=mid, include_system=True)
    from glad_tiles_pipeline_spark.operators.dedup import lww_dedup

    replayed = (
        lww_dedup(
            base_state.unionByName(feed),
            key=KEY,
            strategy="argmax",
            order=["_commit_seq", "_offset"],
        )
        .filter(~F.col("_deleted"))
        .select("repo", "path", "commit", "lang", "content", "content_sha")
    )
    final = table.scan(spark).select(
        "repo", "path", "commit", "lang", "content", "content_sha"
    )
    assert replayed.exceptAll(final).count() == 0
    assert final.exceptAll(replayed).count() == 0


def test_incremental_contains_deletes_and_only_window_changes(spark, ingested):
    table = ingested
    cur = table.current_snapshot_id()
    feed = table.incremental(spark, 0, cur)  # everything since creation
    assert feed.filter(F.col("_deleted")).count() > 0  # tombstones surface
    # one row per changed key (window-LWW), never raw event multiplicity
    assert feed.groupBy(*KEY).count().filter(F.col("count") > 1).count() == 0
    # empty window → empty feed with the full schema
    empty = table.incremental(spark, cur, cur)
    assert empty.count() == 0
    assert "content_sha" in empty.columns and "_deleted" in empty.columns


def test_incremental_refuses_window_spanning_rewrite(spark, tmp_path):
    """A compaction (or CoW) commit rewrites files; file-set diffing across
    it would surface every surviving row as a 'change' — the API must
    refuse rather than answer wrong, and work again past the rewrite.
    (Own table: the shared fixture must stay uncompacted.)"""
    from glad_tiles_pipeline_spark.operators.merge import compact

    log_dir = str(tmp_path / "log")
    change_log(spark, 1500).write.parquet(log_dir)
    table = LakeTable.create(str(tmp_path / "lake"), n_buckets=4)
    ingest_changelog(spark, table, log_dir, batch_size=500, merge_mode="mor")
    before = table.current_snapshot_id()
    compact(spark, table)
    after = table.current_snapshot_id()
    assert after > before  # a rewrite commit happened
    with pytest.raises(ValueError, match="rewrite commit"):
        table.incremental(spark, 0)
    # windows that avoid the rewrite still work
    assert table.incremental(spark, before, before).count() == 0
    assert table.incremental(spark, after, after).count() == 0


def test_incremental_below_vacuum_horizon_raises(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "lake2"), n_buckets=4)
    for i in range(12):
        t.commit(
            batch_id=f"b{i}", expected_parent=t.current_snapshot_id(),
            replaced_buckets=set(), new_files=[], offsets={"lo": i, "hi": i},
            lineage={}, metrics={},
        )
    t.vacuum(keep_last=3, orphan_grace_seconds=0.0)
    with pytest.raises(ValueError, match="vacuum horizon"):
        t.incremental(spark, 0)
