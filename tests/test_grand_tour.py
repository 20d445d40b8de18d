"""Cross-feature integration: one table driven through the full round-4
lifecycle — ingest → WAP stage/publish → mid-migration point lookups →
re-bucketing → key-clustered compaction → tag → vacuum → incremental —
with oracle equality (or the appropriate IO gate) asserted at EVERY step.
Guards the interactions single-feature tests can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.merge import compact, plan_compaction
from glad_tiles_pipeline_spark.operators.rebucket import (
    rebucket_step,
    start_rebucket,
)
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

N = 8000
BATCH = 2000


def _eq(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_grand_tour(spark, tmp_path):
    log = str(tmp_path / "log")
    change_log(spark, N).write.parquet(log)
    events = spark.read.parquet(log)
    oracle_full = oracle_state_df(spark, events)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)

    # 1. half the log on main (MoR), half staged on a WAP branch, publish
    ingest_changelog(spark, table, log, batch_size=BATCH, merge_mode="mor",
                     max_batches=2)
    br = table.create_branch("audit")
    ingest_changelog(spark, br, log, batch_size=BATCH, merge_mode="mor")
    _eq(br.scan(spark), oracle_full)
    table.publish_branch("audit")
    table.drop_branch("audit")
    _eq(table.scan(spark), oracle_full)

    # 2. pick a key; lookup is exact on the delta-pending state
    k = table.scan(spark).select("repo", "path").first()
    ref_row = table.scan(spark).filter(
        (F.col("repo") == k["repo"]) & (F.col("path") == k["path"])
    )

    # 3. live re-bucketing 4 -> 8; lookup stays exact MID-MIGRATION
    #    (generation-aware bucket pruning — scan(buckets=) must refuse here)
    start_rebucket(table, 8)
    rebucket_step(spark, table, max_buckets=2)
    assert table.migration() is not None
    got = table.lookup(spark, k["repo"], k["path"])
    _eq(got, ref_row)
    while table.migration() is not None:
        rebucket_step(spark, table, max_buckets=2)
    _eq(table.scan(spark), oracle_full)

    # 4. policy-driven key-clustered compaction on the new layout
    todo = plan_compaction(table, max_delta_files=0)
    if todo:
        compact(spark, table, buckets=todo, cluster_by_key=True,
                target_file_rows=200)
    _eq(table.scan(spark), oracle_full)
    got = table.lookup(spark, k["repo"], k["path"])
    _eq(got, ref_row)
    assert len(got.inputFiles()) <= 2

    # 5. tag the clustered release; vacuum history; the tag still reads
    table.create_tag("release")
    table.vacuum(keep_last=1, orphan_grace_seconds=0.0)
    _eq(table.scan(spark, tag="release"), oracle_full)

    # 6. the change feed across the WHOLE lifecycle stays consumable:
    #    incremental from the publish point merged over the published base
    #    equals... nothing new happened after publish except rewrites, so
    #    the exact-semantics guard must refuse windows spanning them
    import pytest

    with pytest.raises(ValueError):
        table.incremental(spark, 0)  # spans compaction/rebucket rewrites


def test_merge_into_and_zorder_in_the_loop(spark, tmp_path):
    """Round-5 second wave composed with the CDC stream: declarative
    MERGEs on a disjoint manual keyspace run BETWEEN changelog batches
    (proving the offset high-water passthrough — the planner's resume
    point survives interleaved merges), and the background rewrite is the
    z-order compaction.  Expected state per cycle = replay-oracle(prefix)
    ∪ the manually-tracked merge rows."""
    from glad_tiles_pipeline_spark.operators.merge_into import merge_into

    N3, B = 8000, 2000
    log = str(tmp_path / "log")
    change_log(spark, N3).write.parquet(log)
    events = spark.read.parquet(log)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    cols = ["repo", "path", "commit", "lang", "content", "content_sha"]

    manual: dict[str, tuple[str, str, str]] = {}  # path -> (commit, lang, content)
    for c in range(4):
        ingest_changelog(spark, table, log, batch_size=B, merge_mode="mor",
                         max_batches=1)
        # two inserts + (if any) an update of the oldest manual key
        src_rows = [(f"m{2 * c:03d}", f"manual body {2 * c}"),
                    (f"m{2 * c + 1:03d}", f"manual body {2 * c + 1}")]
        upd = min(manual) if manual else None
        if upd is not None:
            src_rows.append((upd, manual[upd][2] + " v2"))
        src = spark.createDataFrame(
            [("manual", p, "mc", "python", b) for p, b in src_rows],
            ["repo", "path", "commit", "lang", "content"],
        )
        merge_into(
            spark, table, src, f"merge-{c}",
            when_matched_update={"content": "s.content"},
            when_not_matched_insert={"commit": "s.commit", "lang": "s.lang",
                                     "content": "s.content"},
            merge_mode="mor", use_arrow_udfs=False,
        )
        for p, b in src_rows:
            old = manual.get(p)
            manual[p] = ("mc", "python", b) if old is None else (
                old[0], old[1], b)
        if c == 2:  # one declarative delete mid-loop
            dead = next(iter(manual))
            merge_into(
                spark, table,
                src.filter(F.col("path") == dead),
                "merge-del", when_matched_delete=True, merge_mode="mor",
                use_arrow_udfs=False,
            )
            del manual[dead]
        if c % 2 == 1:
            todo = plan_compaction(table, max_delta_files=1, max_buckets=4)
            if todo:
                compact(spark, table, buckets=todo,
                        zorder_by=("repo", "_offset"), target_file_rows=500)
        prefix = oracle_state_df(
            spark, events.filter(F.col("offset") < (c + 1) * B)
        ).select(cols)
        want_manual = spark.createDataFrame(
            [("manual", p, v[0], v[1], v[2]) for p, v in manual.items()],
            ["repo", "path", "commit", "lang", "content"],
        ).withColumn("content_sha", F.sha2(F.col("content"), 256))
        _eq(table.scan(spark).select(cols),
            prefix.unionByName(want_manual.select(cols)))

    # the merges never disturbed the changelog resume point
    assert table.last_committed_offset() == N3 - 1


def test_long_haul_maintenance_cycles(spark, tmp_path):
    """Round-5 hardening (VERDICT r4 "Next #5"): N maintenance cycles
    interleaving ingest (alternating mor / mor_dv), policy-driven
    compaction, a live 4->8 re-bucketing spread across cycles, and a WAP
    stage/publish — with replay-oracle equality asserted on the ingested
    PREFIX after every cycle.  This is the shape of the production
    maintenance loop: ingest never stops while compact/rebucket run in
    O(step) slices beside it."""
    N2, B = 12000, 2000
    log = str(tmp_path / "log")
    change_log(spark, N2, late_denom=4, late_max_lag=3000).write.parquet(log)
    events = spark.read.parquet(log)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)

    modes = ["mor_dv", "mor", "mor_dv", "mor", "mor_dv", "mor"]
    for c in range(6):
        if c == 3:
            start_rebucket(table, 8)
        # cow/mor_dv refuse mid-migration ingest by design; the loop keeps
        # ingesting with mor while the rebucket drains in O(step) slices
        mode = "mor" if table.migration() is not None else modes[c]
        if c == 2:
            # stage this cycle's batch on a WAP branch, verify, publish
            br = table.create_branch("wap")
            ingest_changelog(spark, br, log, batch_size=B, merge_mode=mode,
                             max_batches=1)
            table.publish_branch("wap")
            table.drop_branch("wap")
        else:
            ingest_changelog(spark, table, log, batch_size=B,
                             merge_mode=mode, max_batches=1)
        if table.migration() is not None:
            rebucket_step(spark, table, max_buckets=2)
        if table.migration() is None:
            todo = plan_compaction(table, max_delta_files=1, max_buckets=2)
            if todo:
                compact(spark, table, buckets=todo,
                        cluster_by_key=(c % 2 == 0), target_file_rows=500)
        prefix = oracle_state_df(
            spark, events.filter(F.col("offset") < (c + 1) * B)
        )
        _eq(table.scan(spark), prefix)
        # S31: every cycle's snapshot also passes the independent audit
        # (stats bracket the data, blooms sound, DV refs live, batch index
        # consistent) — maintenance churn must never corrupt a claim
        from glad_tiles_pipeline_spark.plans.audit import audit_table

        res = audit_table(table)
        assert res["ok"], res["findings"]

    while table.migration() is not None:
        rebucket_step(spark, table, max_buckets=2)
    compact(spark, table, cluster_by_key=True, target_file_rows=500)
    oracle_full = oracle_state_df(spark, events)
    _eq(table.scan(spark), oracle_full)
    assert not table.unresolved_buckets()
    from glad_tiles_pipeline_spark.plans.audit import audit_table

    res = audit_table(table)
    assert res["ok"], res["findings"]

    # closing acts of the lifecycle (round-5 eighth wave): retention on
    # the fully-consumed log, then a portable restore — the pruned log
    # still replays clean, and the clone equals the final state and
    # passes the same independent audit
    from glad_tiles_pipeline_spark.sources.changelog import prune_changelog

    pr = prune_changelog(log, consumers=[table])
    assert pr["pruned_files"] > 0
    replay = ingest_changelog(spark, table, log, batch_size=B)
    assert all(r.get("skipped") for r in replay)
    clone = table.export_to(str(tmp_path / "dr"))
    _eq(clone.scan(spark), oracle_full)
    res = audit_table(clone)
    assert res["ok"], res["findings"]

    k = table.scan(spark).select("repo", "path").first()
    got = table.lookup(spark, k["repo"], k["path"])
    assert got.count() == 1 and len(got.inputFiles()) <= 2


def test_long_haul_view_and_constraints_cycles(spark, tmp_path):
    """Round-5 third wave composition: N cycles of CONSTRAINED ingest
    (X14) with a materialized view (X13) riding post_apply, plus
    policy-driven compaction and one WAP stage/publish cycle.  Staged
    ingest must NOT touch the derived view (same rule as the CLI's
    derived-index + --branch refusal); after publish the generic catch-up
    brings the view current.  Asserted every cycle: table == replay
    oracle of the PRE-FILTERED prefix, view == live GROUP BY recompute,
    quarantine == the prefix's violators."""
    from pyspark.sql import types as T

    from glad_tiles_pipeline_spark.operators.constraints import (
        read_quarantine,
        split_by_constraints,
    )
    from glad_tiles_pipeline_spark.operators.matview import (
        create_matview,
        matview_hook,
        read_matview,
    )
    from glad_tiles_pipeline_spark.streaming.dedup_index import (
        catch_up_derived_index,
    )

    N3, B = 8000, 2000
    log = str(tmp_path / "log")
    change_log(spark, N3, late_denom=4, late_max_lag=3000).write.parquet(log)
    events = spark.read.parquet(log)
    constraints = {"no_lucky_paths": "path NOT LIKE '%7.py'"}
    ok_all, bad_all = split_by_constraints(events, constraints)
    qdir = str(tmp_path / "q")

    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    aggs = {
        "n_paths": F.count("*"),
        "total_chars": F.sum(F.length("content")),
    }
    view = create_matview(
        str(tmp_path / "mv"),
        [("n_paths", T.LongType()), ("total_chars", T.LongType())],
        n_buckets=4,
    )
    hook = matview_hook(spark, table, view, aggs)

    for c in range(4):
        if c == 2:
            # WAP: staged batches skip the view hook; catch up post-publish
            br = table.create_branch("wap")
            ingest_changelog(spark, br, log, batch_size=B, merge_mode="mor",
                             max_batches=1, constraints=constraints,
                             quarantine_dir=qdir)
            table.publish_branch("wap")
            table.drop_branch("wap")
            # the catch-up re-reads the RAW window — pass the rule set so
            # the recovery applies the same split the staged ingest did
            caught = catch_up_derived_index(spark, table, view, log,
                                            hook=hook,
                                            constraints=constraints)
            assert caught is not None
        else:
            ingest_changelog(spark, table, log, batch_size=B,
                             merge_mode="mor", max_batches=1,
                             constraints=constraints, quarantine_dir=qdir,
                             post_apply=hook)
        todo = plan_compaction(table, max_delta_files=1, max_buckets=2)
        if todo:
            compact(spark, table, buckets=todo, target_file_rows=500)

        prefix_ok = ok_all.filter(F.col("offset") < (c + 1) * B)
        _eq(table.scan(spark), oracle_state_df(spark, prefix_ok))
        want_view = (
            table.scan(spark)
            .groupBy(F.col("repo").alias("grp"))
            .agg(*[col.alias(n) for n, col in aggs.items()])
        )
        _eq(read_matview(spark, view), want_view)
        assert (
            read_quarantine(spark, qdir).count()
            == bad_all.filter(F.col("offset") < (c + 1) * B).count()
        )

    # final act — the lifecycle's third phase INSIDE the maintenance
    # loop: waive the rules and requeue with the composed hook; the
    # table converges to the full unconstrained replay, the view rides
    # along exactly, the audit record is never mutated, and maintenance
    # plus an independent audit stay healthy after the repair
    from glad_tiles_pipeline_spark.operators.constraints import (
        requeue_quarantine,
    )
    from glad_tiles_pipeline_spark.plans.audit import audit_table

    res = requeue_quarantine(spark, table, qdir, constraints=None,
                             post_apply=hook)
    assert res["requeued"] == bad_all.count()
    oracle_full = oracle_state_df(spark, events)
    _eq(table.scan(spark), oracle_full)
    want_view = (
        table.scan(spark)
        .groupBy(F.col("repo").alias("grp"))
        .agg(*[col.alias(n) for n, col in aggs.items()])
    )
    _eq(read_matview(spark, view), want_view)
    assert read_quarantine(spark, qdir).count() == bad_all.count()
    todo = plan_compaction(table, max_delta_files=1, max_buckets=2)
    if todo:
        compact(spark, table, buckets=todo, target_file_rows=500)
    _eq(table.scan(spark), oracle_full)
    assert audit_table(table)["ok"]
    assert audit_table(view)["ok"]
