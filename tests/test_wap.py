"""S23 write-audit-publish branches: staged commits are invisible to main,
auditable through every read surface, fast-forward published verbatim (with
idempotence carried over), conflict-refused on divergence, and reclaimed by
vacuum only after drop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.plans.lake import CommitConflict, LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

N = 8000
BATCH = 2000
HALF = N // 2 - 1  # offsets are 0-based


@pytest.fixture()
def setup(spark, tmp_path):
    """Main table holding the first half of the log; second half staged
    later on branches."""
    log = str(tmp_path / "log")
    change_log(spark, N).write.parquet(log)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    ingest_changelog(
        spark, table, log, batch_size=BATCH, merge_mode="mor", max_batches=2
    )
    return table, log


def _oracle_upto(spark, log, hi):
    ev = spark.read.parquet(log).filter(F.col("offset") <= hi)
    return oracle_state_df(spark, ev)


def _eq(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_stage_audit_publish_roundtrip(spark, tmp_path, setup):
    table, log = setup
    main_head = table.current_snapshot_id()
    br = table.create_branch("audit")
    assert table.list_branches() == ["audit"]

    # stage the second half on the branch — full MoR machinery
    res = ingest_changelog(spark, br, log, batch_size=BATCH, merge_mode="mor")
    assert len([r for r in res if not r.get("skipped")]) == 2

    # main is untouched; the branch reads the staged state (the audit)
    assert table.current_snapshot_id() == main_head
    _eq(table.scan(spark), _oracle_upto(spark, log, HALF))
    _eq(br.scan(spark), oracle_state_df(spark, spark.read.parquet(log)))
    # audit surfaces: history covers shared pre-fork history + staged rows,
    # incremental exposes exactly the staged window
    hist = br.history(spark).collect()
    assert len(hist) == main_head + 3
    inc = br.incremental(spark, main_head)
    assert inc.count() > 0

    out = table.publish_branch("audit")
    assert out["published"] == 2
    _eq(table.scan(spark), oracle_state_df(spark, spark.read.parquet(log)))
    # idempotence carried over: replaying the log on MAIN applies nothing
    res = ingest_changelog(spark, table, log, batch_size=BATCH, merge_mode="mor")
    assert [r for r in res if not r.get("skipped")] == []
    # publish is idempotent too (resumable fast-forward)
    assert table.publish_branch("audit")["published"] == 0


def test_publish_refuses_non_fast_forward(spark, tmp_path, setup):
    table, log = setup
    br = table.create_branch("audit")
    ingest_changelog(spark, br, log, batch_size=BATCH, merge_mode="mor",
                     max_batches=1)
    # main advances with a DIFFERENT batch shape after the fork
    ingest_changelog(spark, table, log, batch_size=BATCH // 2,
                     merge_mode="mor", max_batches=1)
    with pytest.raises(CommitConflict, match="diverged|not a fast-forward"):
        table.publish_branch("audit")
    # the staged branch remains readable for post-mortem
    assert br.scan(spark).count() > 0
    # audit-reject path: drop discards staged work, main unaffected
    table.drop_branch("audit")
    assert table.list_branches() == []
    _eq(table.scan(spark), _oracle_upto(spark, log, HALF + BATCH // 2))


def test_publish_refuses_branch_rollbacks_and_dead_fork(spark, tmp_path, setup):
    table, log = setup
    br = table.create_branch("rb")
    ingest_changelog(spark, br, log, batch_size=BATCH, merge_mode="mor")
    br.rollback(br._branch_meta()["fork_snapshot_id"] + 1)
    with pytest.raises(ValueError, match="rollbacks"):
        table.publish_branch("rb")
    table.drop_branch("rb")

    # fork point rolled back on main → unpublishable
    br2 = table.create_branch("stale")
    ingest_changelog(spark, br2, log, batch_size=BATCH, merge_mode="mor",
                     max_batches=1)
    table.rollback(1)
    with pytest.raises(CommitConflict, match="rolled back"):
        table.publish_branch("stale")


def test_vacuum_retains_live_branch_files_until_drop(spark, tmp_path, setup):
    table, log = setup
    br = table.create_branch("audit")
    ingest_changelog(spark, br, log, batch_size=BATCH, merge_mode="mor")
    staged = {f["path"] for f in br.manifest(None)["files"]} - {
        f["path"] for f in table.manifest(None)["files"]
    }
    assert staged
    table.vacuum(keep_last=1, orphan_grace_seconds=0.0)
    _eq(br.scan(spark), oracle_state_df(spark, spark.read.parquet(log)))

    table.drop_branch("audit")
    table.vacuum(keep_last=1, orphan_grace_seconds=0.0)
    import os

    gone = [p for p in staged if not os.path.exists(os.path.join(table.root, p))]
    assert sorted(gone) == sorted(staged)


def test_tags_pin_snapshots_and_survive_vacuum(spark, tmp_path, setup):
    """S24: a tag is an immutable named ref whose snapshot stays readable
    — data files retained, horizon guard exempted — after vacuum expired
    the ordinary history around it."""
    table, log = setup
    tagged_head = table.current_snapshot_id()
    want = _oracle_upto(spark, log, table.last_committed_offset())
    assert table.create_tag("release-1") == tagged_head

    ingest_changelog(spark, table, log, batch_size=BATCH, merge_mode="mor")
    table.vacuum(keep_last=1, orphan_grace_seconds=0.0)
    assert table.vacuum_horizon() > tagged_head

    got = table.scan(spark, tag="release-1")
    _eq(got, want)
    # the same snapshot via snapshot_id is also exempt (it is tagged)...
    _eq(table.scan(spark, snapshot_id=tagged_head), want)
    # ...but its untagged neighbor below the horizon still refuses
    with pytest.raises(ValueError, match="vacuum horizon"):
        table.scan(spark, snapshot_id=tagged_head - 1)

    assert table.tags() == {"release-1": tagged_head}
    with pytest.raises(ValueError, match="immutable"):
        table.create_tag("release-1")  # head != tagged_head: retag refused
    # a tag below the horizon would be broken at creation: files are gone
    with pytest.raises(ValueError, match="vacuum horizon"):
        table.create_tag("too-late", snapshot_id=tagged_head - 1)
    with pytest.raises(ValueError, match="no such tag"):
        table.scan(spark, tag="nope")
    with pytest.raises(ValueError, match="not both"):
        table.scan(spark, snapshot_id=0, tag="release-1")
    table.drop_tag("release-1")
    assert table.tags() == {}


def test_staged_schema_evolution_publishes_verbatim(spark, tmp_path, setup):
    """Schema ops staged on a branch are commits like any other: after
    publish, main carries the evolved schema AND the data ingested under
    it — the WAP shape for risky DDL."""
    table, log = setup
    br = table.create_branch("ddl")
    br.evolve([{"op": "add_column", "name": "review_state", "type": "string"}],
              batch_id="ddl-1")
    ingest_changelog(spark, br, log, batch_size=BATCH, merge_mode="mor")
    assert "review_state" not in [f.name for f in table.current_schema()]
    table.publish_branch("ddl")
    assert "review_state" in [f.name for f in table.current_schema()]
    got = table.scan(spark)
    assert got.filter(F.col("review_state").isNull()).count() == got.count()
    _eq(
        got.drop("review_state"),
        oracle_state_df(spark, spark.read.parquet(log)),
    )


def test_incremental_between_tags(spark, tmp_path, setup):
    """S24 sugar: incremental(from_tag=, to_tag=) ≡ the same snapshot
    window — 'every change since release-N' without snapshot-id bookkeeping."""
    table, log = setup
    v_rel = table.current_snapshot_id()
    table.create_tag("rel-1", v_rel)
    ingest_changelog(spark, table, log, batch_size=BATCH, merge_mode="mor")
    table.create_tag("rel-2")
    by_tag = table.incremental(spark, from_tag="rel-1", to_tag="rel-2")
    by_sid = table.incremental(spark, v_rel, table.tags()["rel-2"])
    _eq(by_tag, by_sid)
    assert by_tag.count() > 0
    with pytest.raises(ValueError, match="not both"):
        table.incremental(spark, from_snapshot=0, from_tag="rel-1")
    with pytest.raises(ValueError, match="no such tag"):
        table.incremental(spark, from_tag="nope")
    with pytest.raises(ValueError, match="required"):
        table.incremental(spark)


def test_wap_lifecycle_on_in_memory_backend(spark, tmp_path):
    """Seam-completeness (X5) extended to the round-4 surfaces: the whole
    branch/tag lifecycle — fork, stage, audit, publish, tag, drop — runs
    with ALL metadata in a dict and zero metadata files on disk.  Any
    direct os.* metadata access in the new code paths would crash or fail
    the no-files assertion."""
    import os

    from glad_tiles_pipeline_spark.plans.lake import InMemoryManifestIO

    work = tmp_path / "mem"
    log = str(work / "log")
    change_log(spark, N).write.parquet(log)
    root = str(work / "table")
    io = InMemoryManifestIO(root)
    table = LakeTable.create(root, n_buckets=4, io=io)
    ingest_changelog(spark, table, log, batch_size=BATCH, merge_mode="mor",
                     max_batches=2)

    br = table.create_branch("audit")
    ingest_changelog(spark, br, log, batch_size=BATCH, merge_mode="mor")
    _eq(br.scan(spark), oracle_state_df(spark, spark.read.parquet(log)))
    assert table.publish_branch("audit")["published"] == 2
    table.create_tag("rel-1")
    _eq(
        table.scan(spark, tag="rel-1"),
        oracle_state_df(spark, spark.read.parquet(log)),
    )
    table.drop_branch("audit")
    assert table.list_branches() == []
    assert not os.path.exists(os.path.join(root, "manifests")), (
        "metadata leaked to disk — a branch/tag path bypassed ManifestIO"
    )


def test_concurrent_branches_race_on_publish(spark, tmp_path, setup):
    """Two branches forked at the same snapshot: first publish wins the
    fast-forward, the second refuses (its chain now diverges from main)."""
    table, log = setup
    b1 = table.create_branch("b1")
    b2 = table.create_branch("b2")
    ingest_changelog(spark, b1, log, batch_size=BATCH, merge_mode="mor")
    ingest_changelog(spark, b2, log, batch_size=BATCH // 2, merge_mode="mor",
                     max_batches=1)
    assert table.publish_branch("b1")["published"] == 2
    with pytest.raises(CommitConflict, match="diverged|not a fast-forward"):
        table.publish_branch("b2")
    # the loser's staged work remains intact for drop-and-restage
    assert b2.scan(spark).count() > 0
    table.drop_branch("b2")


def test_branch_handle_guards(spark, tmp_path, setup):
    table, _ = setup
    br = table.create_branch("g")
    with pytest.raises(ValueError, match="main table handle"):
        br.create_branch("nested")
    with pytest.raises(ValueError, match="main table handle"):
        br.vacuum()
    with pytest.raises(ValueError, match="already exists"):
        table.create_branch("g")
    with pytest.raises(ValueError, match="invalid branch name"):
        table.create_branch("main")
    with pytest.raises(ValueError, match="no such branch"):
        table.branch("nope")
    # tags pin MAIN snapshot ids — resolving one against a branch's
    # divergent chain could silently read staged data
    table.create_tag("t1")
    with pytest.raises(ValueError, match="main table handle"):
        br.scan(spark, tag="t1")
    with pytest.raises(ValueError, match="main table handle"):
        br.incremental(spark, from_tag="t1")
    # pre-fork time travel works through the shared-history fallback
    assert br.scan(spark, snapshot_id=1).count() > 0
