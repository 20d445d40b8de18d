"""Merge-on-read mode (SURVEY.md §4.3 extension): O(batch) ingest with
scan-time LWW resolution, compaction restores read-optimal layout, and
every combination (mor-only, mor+compact, mor→cow) equals the replay oracle."""

from __future__ import annotations

import pytest

from glad_tiles_pipeline_spark.operators.merge import compact
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

N = 6000


def _assert_equals_oracle(spark, table, events):
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


def test_mor_scan_resolves_without_compaction(spark, tmp_path, log_dir):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    res = ingest_changelog(
        spark, table, log_dir, batch_size=1000, merge_mode="mor"
    )
    assert len(res) == 6
    assert all(r["metrics"]["buckets_rewritten"] == 0 for r in res)
    assert table.unresolved_buckets() == set(range(8))
    _assert_equals_oracle(spark, table, spark.read.parquet(log_dir))


def test_mor_compaction_preserves_state_and_clears_deltas(
    spark, tmp_path, log_dir
):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, log_dir, batch_size=1000, merge_mode="mor")
    res = compact(spark, table)
    assert not res["skipped"] and res["compacted_buckets"] == 8
    assert table.unresolved_buckets() == set()
    _assert_equals_oracle(spark, table, spark.read.parquet(log_dir))
    # compaction is idempotent: nothing left to do
    again = compact(spark, table)
    assert again["skipped"]


def test_mor_periodic_compaction_during_ingest(spark, tmp_path, log_dir):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(
        spark, table, log_dir, batch_size=1000, merge_mode="mor", compact_every=2
    )
    assert table.unresolved_buckets() == set()
    _assert_equals_oracle(spark, table, spark.read.parquet(log_dir))


def test_cow_batch_on_top_of_mor_deltas_resolves(spark, tmp_path, log_dir):
    # first half mor, second half cow — the cow merge unions all generations
    # of the affected buckets and resolves them in passing
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(
        spark, table, log_dir, batch_size=1000, max_batches=3, merge_mode="mor"
    )
    ingest_changelog(spark, table, log_dir, batch_size=1000, merge_mode="cow")
    assert table.unresolved_buckets() == set()
    _assert_equals_oracle(spark, table, spark.read.parquet(log_dir))


def test_mor_equals_cow_final_state(spark, tmp_path, log_dir):
    t_mor = LakeTable.create(str(tmp_path / "m"), n_buckets=8)
    t_cow = LakeTable.create(str(tmp_path / "c"), n_buckets=8)
    ingest_changelog(spark, t_mor, log_dir, batch_size=1500, merge_mode="mor")
    ingest_changelog(spark, t_cow, log_dir, batch_size=1500, merge_mode="cow")
    a, b = t_mor.scan(spark), t_cow.scan(spark)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_mor_time_travel_snapshots_resolve(spark, tmp_path, log_dir):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, log_dir, batch_size=2000, merge_mode="mor")
    # snapshot after the first mor batch == oracle over offsets [0, 2000)
    first_events = spark.read.parquet(log_dir).filter("offset < 2000")
    got = table.scan(spark, snapshot_id=1)
    want = oracle_state_df(spark, first_events)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_plan_compaction_picks_worst_buckets_and_converges(
    spark, tmp_path, log_dir
):
    """The maintenance policy: selection is pure manifest arithmetic,
    worst delta counts first, bounded per round; compacting the planned
    subsets round by round drains every bucket below the threshold while
    state stays oracle-exact."""
    from glad_tiles_pipeline_spark.operators.merge import plan_compaction

    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, log_dir, batch_size=1000, merge_mode="mor")
    # 6 batches appended one delta per touched bucket per batch
    counts = {}
    for f in table.manifest(None)["files"]:
        if f.get("delta"):
            counts[f["bucket"]] = counts.get(f["bucket"], 0) + 1
    assert plan_compaction(table, max_delta_files=99) == set()
    picked = plan_compaction(table, max_delta_files=4, max_buckets=2)
    assert len(picked) <= 2
    assert all(counts[b] > 4 for b in picked)
    worst_count = max(counts.values())
    assert any(counts[b] == worst_count for b in picked)

    rounds = 0
    while True:
        todo = plan_compaction(table, max_delta_files=0, max_buckets=3)
        if not todo:
            break
        compact(spark, table, buckets=todo)
        rounds += 1
        assert rounds <= 4, "policy must converge: ceil(8/3) rounds"
    assert table.unresolved_buckets() == set()
    _assert_equals_oracle(spark, table, spark.read.parquet(log_dir))
