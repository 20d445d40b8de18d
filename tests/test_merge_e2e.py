"""End-to-end: changelog → batched MERGE → final table == replay oracle
(SURVEY.md §5.2/§5.3), plus idempotence, batch-split invariance, fencing.

The correctness gate (BASELINE.json): symmetric exceptAll on
(repo, path, commit, lang, content, content_sha) is empty.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.merge import apply_batch
from glad_tiles_pipeline_spark.plans.lake import CommitConflict, LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import batch_id_for, ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

N = 6000  # late_max_lag=5000 → late events WILL cross batch boundaries


def _assert_table_equals_oracle(spark, table, events):
    got = table.scan(spark)
    want = oracle_state_df(spark, events)
    extra = got.exceptAll(want).count()
    missing = want.exceptAll(got).count()
    assert (extra, missing) == (0, 0), f"extra={extra} missing={missing}"


@pytest.fixture()
def log_dir(spark, tmp_path):
    d = str(tmp_path / "changelog")
    change_log(spark, N).write.parquet(d)
    return d


def test_single_batch_matches_oracle(spark, tmp_path, log_dir):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    events = spark.read.parquet(log_dir)
    res = apply_batch(spark, table, events, "b0")
    assert not res["skipped"]
    _assert_table_equals_oracle(spark, table, events)


def test_batched_ingest_matches_oracle_and_split_invariance(spark, tmp_path, log_dir):
    """One batch of N == many batches of 1500 (SURVEY.md §5.3c) — both equal
    the global-order replay oracle even though late events cross windows."""
    events = spark.read.parquet(log_dir)

    t_many = LakeTable.create(str(tmp_path / "many"), n_buckets=8)
    results = ingest_changelog(spark, t_many, log_dir, batch_size=1500)
    assert len(results) == 4
    _assert_table_equals_oracle(spark, t_many, events)

    t_one = LakeTable.create(str(tmp_path / "one"), n_buckets=8)
    ingest_changelog(spark, t_one, log_dir, batch_size=N)
    one = t_one.scan(spark)
    many = t_many.scan(spark)
    assert one.exceptAll(many).count() == 0
    assert many.exceptAll(one).count() == 0


def test_idempotent_replay(spark, tmp_path, log_dir):
    """Re-applying a committed batch is a no-op (exactly-once sink)."""
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    events = spark.read.parquet(log_dir)
    r1 = apply_batch(spark, table, events, "bX")
    snap = table.current_snapshot_id()
    r2 = apply_batch(spark, table, events, "bX")
    assert r2["skipped"] and r2["snapshot_id"] == r1["snapshot_id"]
    assert table.current_snapshot_id() == snap
    _assert_table_equals_oracle(spark, table, events)


def test_resume_after_partial_ingest(spark, tmp_path, log_dir):
    """Crash-resume: ingest half, 'restart' (fresh planner call), finish —
    offsets come from the manifest, state equals the oracle."""
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, log_dir, batch_size=2000, max_batches=1)
    assert table.last_committed_offset() == 1999
    ingest_changelog(spark, table, log_dir, batch_size=2000)
    events = spark.read.parquet(log_dir)
    _assert_table_equals_oracle(spark, table, events)


def test_fencing_conflict(spark, tmp_path, log_dir):
    """Two committers with the same expected parent: exactly one wins."""
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    events = spark.read.parquet(log_dir).limit(500)
    apply_batch(spark, table, events, "b-first")
    parent = table.current_snapshot_id()
    # simulate the loser: commit directly with a stale expected parent
    with pytest.raises(CommitConflict):
        table.commit(
            batch_id="b-loser",
            expected_parent=parent - 1,
            replaced_buckets=set(),
            new_files=[],
            offsets={"lo": 0, "hi": 0},
            lineage={},
            metrics={},
        )


def test_orphan_files_ignored(spark, tmp_path, log_dir):
    """Data files from a crashed commit (written but never referenced by a
    manifest) are invisible to readers (SURVEY.md §5.4)."""
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    events = spark.read.parquet(log_dir)
    apply_batch(spark, table, events, "b0")
    before = table.scan(spark).count()
    # crashed commit: files land, manifest never published
    orphan_abs, _ = table.new_data_dir()
    events.limit(10).write.parquet(orphan_abs, mode="overwrite")
    assert table.scan(spark).count() == before


def test_manifest_lineage_and_metrics(spark, tmp_path, log_dir):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    events = spark.read.parquet(log_dir)
    apply_batch(spark, table, events, batch_id_for(0, N - 1),
                offsets={"lo": 0, "hi": N - 1})
    m = table.manifest()
    assert m["offsets"] == {"lo": 0, "hi": N - 1}
    assert m["metrics"]["events_read"] == N
    assert m["metrics"]["winners"] == m["metrics"]["events_read"] - m["metrics"]["dupes_dropped"]
    assert len(m["lineage"]) > 0
    # every lineage bucket reports files + rows
    for b, lin in m["lineage"].items():
        assert "files" in lin and "rows_applied" in lin
    # live rows in scan == sum of non-tombstone rows
    live = table.scan(spark).count()
    winners = m["metrics"]["winners"]
    assert live <= winners


def test_dedup_strategies_agree_e2e(spark, tmp_path, log_dir):
    events = spark.read.parquet(log_dir)
    finals = []
    for strat in ["argmax", "window"]:
        t = LakeTable.create(str(tmp_path / f"t-{strat}"), n_buckets=8)
        apply_batch(spark, t, events, "b0", dedup_strategy=strat)
        finals.append(t.scan(spark))
    a, b = finals
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
