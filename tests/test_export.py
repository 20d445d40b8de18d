"""Snapshot export (plans/lake.py::export_to) — portable DR restore.

Contract under test: the clone's readers see EXACTLY the exported
snapshot's state (MoR deltas restored unresolved, delete memos intact);
the carried offsets make the clone a checkpoint restore — resuming
ingest on the clone from the same log converges to the full replay
oracle; the clone passes the independent audit (copied stats/blooms
still describe the copied bytes); older snapshots export via time
travel; vacuumed snapshots refuse; named offset channels survive; the
export commit is fenced and visible as its own kind in report().
"""

from __future__ import annotations

import os

import pytest

from glad_tiles_pipeline_spark.operators.merge import compact
from glad_tiles_pipeline_spark.plans.audit import audit_table
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

N = 5000


def _same_state(a, b):
    cols = sorted(set(a.columns) & set(b.columns))
    return (
        a.select(cols).exceptAll(b.select(cols)).count() == 0
        and b.select(cols).exceptAll(a.select(cols)).count() == 0
    )


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export")
    log_dir = str(tmp / "log")
    change_log(spark, N, n_repos=6, paths_per_repo=25).write.parquet(log_dir)
    table = LakeTable.create(str(tmp / "src"), n_buckets=8)
    ingest_changelog(spark, table, log_dir, batch_size=1000,
                     merge_mode="mor")
    return table, log_dir


def test_clone_state_is_exact_and_unresolved(spark, src, tmp_path):
    table, _ = src
    clone = table.export_to(str(tmp_path / "clone"))
    assert _same_state(clone.scan(spark), table.scan(spark))
    # MoR restores unresolved: the copied manifest still carries deltas
    assert any(f.get("delta") for f in clone.manifest()["files"])
    # fenced single commit, visible as its own kind
    assert clone.report()["snapshots"] == {"export": 1}
    assert clone.batch_committed(
        f"export-v{table.current_snapshot_id()}") == 1


def test_clone_resumes_ingest_as_a_checkpoint_restore(spark, src, tmp_path):
    table, log_dir = src
    # export the MID-LOG state: a fresh table fed only the first 3 windows
    half = LakeTable.create(str(tmp_path / "half"), n_buckets=8)
    ingest_changelog(spark, half, log_dir, batch_size=1000, max_batches=3,
                     merge_mode="mor")
    clone = half.export_to(str(tmp_path / "clone2"))
    assert clone.last_committed_offset() == 2999
    # resume THE SAME log on the clone: picks up at offset 3000 and
    # converges to the full replay oracle
    res = ingest_changelog(spark, clone, log_dir, batch_size=1000,
                           merge_mode="mor")
    applied = [r for r in res if not r.get("skipped")]
    assert len(applied) == 2
    events = spark.read.parquet(log_dir)
    assert _same_state(clone.scan(spark), oracle_state_df(spark, events))
    # the source of the export is untouched
    assert half.last_committed_offset() == 2999
    # maintenance continues on the clone like on any table
    compact(spark, clone)
    assert _same_state(clone.scan(spark), oracle_state_df(spark, events))


def test_clone_passes_independent_audit(spark, src, tmp_path):
    table, _ = src
    clone = table.export_to(str(tmp_path / "clone3"))
    res = audit_table(clone)
    assert res["ok"], res["findings"]
    assert res["checked"]["files"] > 0


def test_export_older_snapshot_time_travel(spark, src, tmp_path):
    table, _ = src
    clone = table.export_to(str(tmp_path / "clone4"), snapshot_id=2)
    assert _same_state(clone.scan(spark),
                       table.scan(spark, snapshot_id=2))
    assert clone.last_committed_offset() == \
        table.manifest(2)["offsets"]["hi"]


def test_export_refuses_vacuumed_snapshot(spark, src, tmp_path):
    table, log_dir = src
    t2 = LakeTable.create(str(tmp_path / "v"), n_buckets=8)
    ingest_changelog(spark, t2, log_dir, batch_size=1000, merge_mode="cow")
    t2.vacuum(keep_last=1, orphan_grace_seconds=0)
    with pytest.raises(ValueError, match="vacuum horizon"):
        t2.export_to(str(tmp_path / "never"), snapshot_id=1)


def test_cli_export_roundtrip(spark, src, tmp_path):
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    try:
        from ingest import main as ingest_main
    finally:
        sys.path.pop(0)
    _, log_dir = src
    dest = str(tmp_path / "dr")

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = ingest_main([
            "--changelog", log_dir, "--table", str(tmp_path / "t"),
            "--create", "--batch-size", "2500", "--merge-mode", "mor",
            "--export-to", dest,
        ])
    assert rc == 0
    summary = json.loads(
        [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
    )
    assert summary["exported"]["dest"] == dest
    clone = LakeTable(dest)
    assert clone.last_committed_offset() == N - 1
    assert _same_state(clone.scan(spark),
                       LakeTable(str(tmp_path / "t")).scan(spark))
    # a second CLI run against the CLONE is a pure replay (restore done)
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        rc = ingest_main([
            "--changelog", log_dir, "--table", dest,
            "--batch-size", "2500", "--merge-mode", "mor",
        ])
    assert rc == 0
    s2 = json.loads(
        [l for l in buf2.getvalue().splitlines() if l.startswith("{")][-1]
    )
    assert s2["batches_applied"] == 0


def test_dr_story_table_plus_derived_sink(spark, src, tmp_path):
    """The full disaster-restore composition: export a MID-LOG table,
    rebuild its derived sink on the clone from table state
    (backfill_lww_sink — exact for LWW sinks by construction), resume
    ingest with the ordinary hook — table and sink both converge exactly
    as if never interrupted."""
    from pyspark.sql import functions as F

    from glad_tiles_pipeline_spark.operators.incremental import (
        cdc_docs,
        create_signature_index,
        index_signatures_cdc,
    )
    from glad_tiles_pipeline_spark.operators.docs import (
        minhash_signatures,
        simhash32,
    )
    from glad_tiles_pipeline_spark.streaming.dedup_index import (
        backfill_lww_sink,
        catch_up_derived_index,
        signature_index_hook,
    )

    n_hashes = 16
    _, log_dir = src
    half = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, half, log_dir, batch_size=1000, max_batches=3,
                     merge_mode="mor")
    clone = half.export_to(str(tmp_path / "dr"))

    # restore the derived sink FROM CLONE STATE — no source sink needed
    index = create_signature_index(str(tmp_path / "sig"),
                                   n_hashes=n_hashes, n_buckets=8)
    hook = signature_index_hook(spark, index, n_hashes=n_hashes)
    assert not backfill_lww_sink(spark, clone, hook).get("skipped")
    assert index.last_committed_offset() == clone.last_committed_offset()

    # resume: remaining windows flow through the ordinary hook; the
    # generic catch-up confirms the sink is already current afterwards
    ingest_changelog(spark, clone, log_dir, batch_size=1000,
                     merge_mode="mor", post_apply=hook)
    assert catch_up_derived_index(spark, clone, index, log_dir,
                                  hook=hook) is None

    events = spark.read.parquet(log_dir)
    assert _same_state(clone.scan(spark), oracle_state_df(spark, events))
    docs = cdc_docs(clone.scan(spark))
    want = minhash_signatures(
        docs, n_hashes=n_hashes, id_col="doc_id", text_col="text"
    ).join(
        docs.select("doc_id", simhash32(F.col("text"),
                                        token_hash="sha256").alias("simhash")),
        "doc_id",
    )
    got = index_signatures_cdc(spark, index, n_hashes=n_hashes)
    assert _same_state(got, want)


def test_named_offset_channels_survive_export(spark, src, tmp_path):
    _, log_dir = src
    t3 = LakeTable.create(str(tmp_path / "ch"), n_buckets=8)
    ingest_changelog(spark, t3, log_dir, batch_size=2500, merge_mode="mor",
                     source="feed-a")
    clone = t3.export_to(str(tmp_path / "clone5"))
    assert clone.last_committed_offset("feed-a") == N - 1
    assert clone.last_committed_offset("feed-b") == -1
