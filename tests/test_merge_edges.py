"""apply_batch degenerate batches: empty, delete-only, control-only —
the manifest chain must stay consistent and resumable through all of them."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.merge import apply_batch
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.sources.changelog import CHANGE_SCHEMA
from glad_tiles_pipeline_spark.sources.generator import change_log


def test_compact_conflict_does_not_kill_ingest(spark, tmp_path, monkeypatch):
    """A compaction-time CommitConflict (concurrent writer won the race) is
    an optimization failure, not an ingest failure: the loop must continue
    and retry compaction at the next interval (ADVICE round 1)."""
    from glad_tiles_pipeline_spark.plans import planner as planner_mod
    from glad_tiles_pipeline_spark.plans.lake import CommitConflict, LakeTable
    from glad_tiles_pipeline_spark.sources.generator import change_log

    log_dir = str(tmp_path / "log")
    change_log(spark, 2000).write.parquet(log_dir)
    table = LakeTable.create(str(tmp_path / "lake"), n_buckets=4)

    calls = {"n": 0}

    def conflicting_compact(*a, **k):
        calls["n"] += 1
        raise CommitConflict("simulated concurrent-writer race")

    monkeypatch.setattr(planner_mod, "compact", conflicting_compact)
    results = planner_mod.ingest_changelog(
        spark, table, log_dir, batch_size=500, merge_mode="mor", compact_every=1
    )
    assert len(results) == 4  # every batch applied despite 4 failed compacts
    assert calls["n"] == 4
    assert table.last_committed_offset() == 1999


def test_empty_batch_commits_cleanly(spark, tmp_path):
    for mode in ("cow", "mor"):
        table = LakeTable.create(str(tmp_path / f"t_{mode}"), n_buckets=4)
        empty = spark.createDataFrame([], CHANGE_SCHEMA)
        res = apply_batch(spark, table, empty, "b-empty", merge_mode=mode,
                          offsets={"lo": 0, "hi": -1})
        assert not res["skipped"]
        assert res["metrics"]["events_read"] == 0
        assert table.current_snapshot_id() == 1
        assert table.scan(spark).count() == 0
        # replay of the empty batch is still a no-op
        again = apply_batch(spark, table, empty, "b-empty", merge_mode=mode)
        assert again["skipped"]


def test_delete_only_batch_leaves_tombstones(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    ev = change_log(spark, 200)
    deletes = (
        ev.withColumn("op", F.lit("D"))
        .withColumn("content", F.lit(None).cast("string"))
    )
    apply_batch(spark, table, deletes, "b-del", merge_mode="mor",
                offsets={"lo": 0, "hi": 199})
    assert table.scan(spark).count() == 0  # nothing live
    raw = table.scan(spark, include_system=True)
    assert raw.filter(F.col("_deleted")).count() > 0  # tombstones recorded
    # a LATER batch carrying an OLDER event for a deleted key must lose
    older = ev.filter("offset < 50").withColumn(
        "commit_seq", F.col("commit_seq") - 1000
    )
    apply_batch(spark, table, older, "b-old", merge_mode="mor",
                offsets={"lo": 200, "hi": 399})
    assert table.scan(spark).count() == 0


def test_control_only_batch_evolves_without_data(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    row = {
        "offset": 0, "commit_seq": 0, "commit": None, "op": None,
        "repo": None, "path": None, "lang": None, "content": None,
        "ts": None, "schema_ver": None,
        "control": json.dumps({"op": "add_column", "name": "stars",
                               "type": "bigint"}),
    }
    ctrl = spark.createDataFrame([row], CHANGE_SCHEMA)
    res = apply_batch(spark, table, ctrl, "b-ctrl", merge_mode="cow",
                      offsets={"lo": 0, "hi": 0})
    assert res["metrics"]["control_events"] == 1
    assert "stars" in [f.name for f in table.current_schema().fields]
    # subsequent data batch lands under the evolved schema
    ev = change_log(spark, 300).withColumn("offset", F.col("offset") + 1)
    apply_batch(spark, table, ev, "b-data", merge_mode="cow",
                offsets={"lo": 1, "hi": 300})
    got = table.scan(spark)
    assert "stars" in got.columns
    want = oracle_state_df(spark, ev)
    proj = got.select("repo", "path", "commit", "lang", "content", "content_sha")
    assert proj.exceptAll(want).count() == 0 and want.exceptAll(proj).count() == 0
