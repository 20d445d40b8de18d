"""S29: multi-writer ingest via per-source offset channels.

Contract under test: N planners tailing N changelogs into ONE table can
run concurrently.  Each source keeps its own monotone offset high-water
(``source_offsets`` channels in the manifest), batch ids are namespaced
per source, the manifest CAS serializes commits, and a ``CommitConflict``
loser re-plans the same window against the new head — so every window of
every source commits exactly once and the final table state equals the
LWW replay oracle over the UNION of the logs.

Fixture shape: each source's log gets a disjoint repo namespace (prefix),
so the union oracle is deterministic (cross-source events never contend
for a key; within a source the usual (commit_seq, offset) LWW applies).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import batch_id_for, ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log


def _write_log(spark, path, n_events, prefix, seed):
    """A change log whose repos (and content, which embeds the repo) live
    in a disjoint ``prefix-`` namespace."""
    df = change_log(spark, n_events, n_repos=8, paths_per_repo=40, seed=seed)
    df = df.withColumn(
        "repo",
        F.when(F.col("repo").isNotNull(), F.concat(F.lit(prefix + "-"), F.col("repo"))),
    )
    df.write.parquet(path)
    return path


def _union_oracle(spark, *log_dirs):
    logs = [spark.read.parquet(d) for d in log_dirs]
    u = logs[0]
    for other in logs[1:]:
        u = u.unionByName(other)
    # offsets collide across sources but keys are disjoint, so per-key LWW
    # never compares cross-source versions — the oracle stays well-defined
    return oracle_state_df(spark, u)


def _assert_equals_union_oracle(spark, table, *log_dirs):
    want = _union_oracle(spark, *log_dirs)
    got = table.scan(spark).select(*want.columns)
    extra = got.exceptAll(want).count()
    missing = want.exceptAll(got).count()
    assert (extra, missing) == (0, 0), f"extra={extra} missing={missing}"


def test_interleaved_sources_keep_independent_resume_points(spark, tmp_path):
    """Alternate single batches of two sources through one table: each
    planner resumes from ITS channel, never from the other's window."""
    log_a = _write_log(spark, str(tmp_path / "a"), 4000, "A", seed=1)
    log_b = _write_log(spark, str(tmp_path / "b"), 3000, "B", seed=2)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)

    done_a = done_b = False
    while not (done_a and done_b):
        done_a = not ingest_changelog(
            spark, table, log_a, batch_size=1000, max_batches=1, source="A"
        )
        done_b = not ingest_changelog(
            spark, table, log_b, batch_size=1000, max_batches=1, source="B"
        )

    assert table.last_committed_offset("A") == 3999
    assert table.last_committed_offset("B") == 2999
    assert table.last_committed_offset("never-committed") == -1
    _assert_equals_union_oracle(spark, table, log_a, log_b)
    # every window of both sources answers "already committed"
    for src, hi in (("A", 3999), ("B", 2999)):
        for lo in range(0, hi + 1, 1000):
            bid = batch_id_for(lo, min(lo + 999, hi), src)
            assert table.batch_committed(bid) is not None, bid


def test_concurrent_writers_commit_every_window_exactly_once(spark, tmp_path):
    """Two threads ingest two changelogs into the same table at the same
    time with small windows (real CAS races).  Both finish; the final
    state equals the union replay oracle; commits = windows (a conflict
    re-plans, never drops or double-applies)."""
    log_a = _write_log(spark, str(tmp_path / "a"), 6000, "A", seed=11)
    log_b = _write_log(spark, str(tmp_path / "b"), 6000, "B", seed=12)
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)

    def run(src, log):
        # own handle per thread (shared SparkSession is fine — concurrent
        # job submission is supported; LakeTable reads manifests fresh)
        t = LakeTable(root)
        return ingest_changelog(
            spark, t, log, batch_size=750, source=src, merge_mode="mor"
        )

    with ThreadPoolExecutor(max_workers=2) as ex:
        fa = ex.submit(run, "A", log_a)
        fb = ex.submit(run, "B", log_b)
        ra, rb = fa.result(timeout=600), fb.result(timeout=600)

    assert len(ra) == 8 and len(rb) == 8  # 6000 / 750 windows each
    assert not any(r["skipped"] for r in ra + rb)
    table = LakeTable(root)
    assert table.last_committed_offset("A") == 5999
    assert table.last_committed_offset("B") == 5999
    _assert_equals_union_oracle(spark, table, log_a, log_b)
    # exactly one snapshot per committed window (conflict losers re-plan
    # without publishing): 16 ingest commits on top of v0
    assert table.current_snapshot_id() == 16
    # replay of either source is a no-op
    again = ingest_changelog(spark, LakeTable(root), log_a, batch_size=750,
                             source="A")
    assert again == []


def test_channels_survive_compaction_and_rewind_on_rollback(spark, tmp_path):
    log_a = _write_log(spark, str(tmp_path / "a"), 3000, "A", seed=3)
    log_b = _write_log(spark, str(tmp_path / "b"), 2000, "B", seed=4)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, log_a, batch_size=1500, source="A",
                     merge_mode="mor")
    pre = table.current_snapshot_id()
    chans_pre = table.manifest()["source_offsets"]
    ingest_changelog(spark, table, log_b, batch_size=1000, source="B",
                     merge_mode="mor")

    from glad_tiles_pipeline_spark.operators.merge import compact

    compact(spark, table)
    # compaction carries every channel forward untouched
    assert table.manifest()["source_offsets"] == {
        "A": {"hi": 2999}, "B": {"hi": 1999},
    }

    # rollback to before B ever wrote: B's channel must rewind with the
    # table, or B's planner would skip re-ingesting its dead windows
    table.rollback(pre)
    assert table.manifest()["source_offsets"] == chans_pre
    assert table.last_committed_offset("B") == -1
    ingest_changelog(spark, table, log_b, batch_size=1000, source="B",
                     merge_mode="mor")
    _assert_equals_union_oracle(spark, table, log_a, log_b)


def test_default_channel_falls_back_to_legacy_scalar(spark, tmp_path):
    """A manifest written before channels existed has no
    ``source_offsets``: the default channel must read the legacy verbatim
    scalar so pre-existing tables resume correctly under new code."""
    log = _write_log(spark, str(tmp_path / "a"), 2000, "A", seed=5)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, log, batch_size=1000)

    # doctor the head manifest into the pre-S29 shape
    sid = table.current_snapshot_id()
    p = table._manifest_path(sid)
    m = json.loads(table.io.read_text(p))
    assert m["source_offsets"] == {"default": {"hi": 1999}}
    del m["source_offsets"]
    os.remove(p)  # put_if_absent would refuse the overwrite
    table.io.put_atomic(p, json.dumps(m))

    assert table.last_committed_offset("default") == 1999
    assert table.last_committed_offset() == 1999
    # and the unnamed planner still resumes cleanly (no re-apply)
    assert ingest_changelog(spark, table, log, batch_size=1000) == []


def test_unnamed_ingest_is_unchanged_and_maintains_default_channel(
    spark, tmp_path
):
    log = _write_log(spark, str(tmp_path / "a"), 2000, "A", seed=6)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    res = ingest_changelog(spark, table, log, batch_size=1000)
    # legacy batch ids, verbatim scalar, and the default channel all hold
    assert [r["batch_id"] for r in res] == ["b0-999", "b1000-1999"]
    assert table.manifest()["offsets"] == {"lo": 1000, "hi": 1999}
    assert table.manifest()["source_offsets"] == {"default": {"hi": 1999}}


def test_stream_conflict_retries_instead_of_failing(spark, tmp_path, monkeypatch):
    """A foreachBatch CommitConflict means a CONCURRENT writer won the
    manifest CAS — the micro-batch is still valid, so the bridge must
    retry against the new head instead of letting Spark fail the whole
    streaming query.  Simulated: the first three apply attempts lose the
    race, the fourth succeeds; nothing is dropped or double-applied."""
    from glad_tiles_pipeline_spark.operators.merge import apply_batch as real_apply
    from glad_tiles_pipeline_spark.plans.lake import CommitConflict
    from glad_tiles_pipeline_spark.streaming import bridge as bridge_mod

    log = _write_log(spark, str(tmp_path / "a"), 2000, "A", seed=21)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)

    fails = {"left": 3, "seen": 0}

    def flaky_apply(*a, **k):
        if fails["left"] > 0:
            fails["left"] -= 1
            fails["seen"] += 1
            raise CommitConflict("simulated concurrent-writer race")
        return real_apply(*a, **k)

    monkeypatch.setattr(bridge_mod, "apply_batch", flaky_apply)
    results = bridge_mod.stream_ingest(
        spark, table, log, str(tmp_path / "ckpt")
    )
    assert fails["seen"] == 3
    assert [r for r in results if not r.get("skipped")]
    _assert_equals_union_oracle(spark, table, log)

    # a conflict that never resolves surfaces after the retry budget
    # (honest failure, not an infinite stall)
    monkeypatch.setattr(bridge_mod, "_CONFLICT_RETRIES", 1)
    fails["left"] = 10**9
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        bridge_mod.stream_ingest(
            spark, LakeTable.create(str(tmp_path / "t2"), n_buckets=4),
            log, str(tmp_path / "ckpt2"),
        )


def test_two_streaming_channels_do_not_collide_on_fencing_ids(spark, tmp_path):
    """Two streaming writers with named channels both start at offset 0:
    without per-channel namespacing the second stream's first micro-batch
    would match the first's committed ``s0-...`` id and be silently
    dropped.  Also proves ``channel=`` advances ITS offset channel only."""
    from glad_tiles_pipeline_spark.streaming import stream_ingest

    log_a = _write_log(spark, str(tmp_path / "a"), 2000, "A", seed=22)
    log_b = _write_log(spark, str(tmp_path / "b"), 1500, "B", seed=23)
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=4)

    ra = stream_ingest(spark, LakeTable(root), log_a, str(tmp_path / "ck_a"),
                       channel="A")
    rb = stream_ingest(spark, LakeTable(root), log_b, str(tmp_path / "ck_b"),
                       channel="B")
    assert not any(r["skipped"] for r in ra + rb)

    table = LakeTable(root)
    assert table.batch_committed("src-A-s0-1999") is not None
    assert table.batch_committed("src-B-s0-1499") is not None
    assert table.last_committed_offset("A") == 1999
    assert table.last_committed_offset("B") == 1499
    _assert_equals_union_oracle(spark, table, log_a, log_b)


def test_concurrent_stream_and_batch_writer_one_table(spark, tmp_path):
    """The real race: a streaming writer (channel A) and a batch planner
    (source B) ingest into ONE table at the same time.  CAS losers retry
    (stream) / re-plan (batch); the final state equals the union replay
    oracle and both channels reach their logs' heads."""
    from concurrent.futures import ThreadPoolExecutor

    from glad_tiles_pipeline_spark.streaming import stream_ingest

    log_a = _write_log(spark, str(tmp_path / "a"), 4000, "A", seed=31)
    log_b = _write_log(spark, str(tmp_path / "b"), 4000, "B", seed=32)
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)

    def run_stream():
        return stream_ingest(
            spark, LakeTable(root), log_a, str(tmp_path / "ckpt"),
            channel="A", max_files_per_trigger=2, merge_mode="mor",
        )

    def run_batch():
        return ingest_changelog(
            spark, LakeTable(root), log_b, batch_size=800, source="B",
            merge_mode="mor",
        )

    with ThreadPoolExecutor(max_workers=2) as ex:
        fa = ex.submit(run_stream)
        fb = ex.submit(run_batch)
        ra, rb = fa.result(timeout=600), fb.result(timeout=600)

    assert [r for r in ra if not r.get("skipped")]
    assert len(rb) == 5 and not any(r["skipped"] for r in rb)
    table = LakeTable(root)
    assert table.last_committed_offset("A") == 3999
    assert table.last_committed_offset("B") == 3999
    _assert_equals_union_oracle(spark, table, log_a, log_b)


def test_stream_channel_refuses_derived_sinks(spark, tmp_path):
    """Same honesty contract as the CLI: derived tables are single-writer,
    so a named streaming channel with a post_apply hook is refused up
    front (before any catch-up side effect)."""
    from glad_tiles_pipeline_spark.streaming import stream_ingest

    log = _write_log(spark, str(tmp_path / "a"), 100, "A", seed=41)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(ValueError, match="named channel.*post_apply"):
        stream_ingest(
            spark, table, log, str(tmp_path / "ck"), channel="A",
            post_apply=lambda df, bid, off: None,
        )
