"""S26 — positional-delete merge-on-read (``merge_mode='mor_dv'``,
Iceberg v2 delete-vector parity).

Contract: batch winners are arbitrated against the live table AT WRITE
TIME; superseded live rows are killed by (file, row-position) sidecars and
delete winners become tombstone MEMOS invisible to resolved readers.  The
payoff under test: resolved scans between compactions are RESOLUTION-FREE
— no LWW shuffle at all, just a broadcast anti-join of the kills — while
the final state stays bit-equal to the replay oracle (and to cow/mor on
the same log), late events, deletes, crashes and all.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.merge import apply_batch, compact
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

OUT_COLS = ["repo", "path", "commit", "lang", "content", "content_sha"]


def _state_equal(got, want):
    g = got.select(OUT_COLS)
    w = want.select(OUT_COLS)
    return g.exceptAll(w).count() == 0 and w.exceptAll(g).count() == 0


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("mordv")
    # delete-heavy, late-heavy log: ~10% D ops and 1/4 of events late by
    # up to 2500 offsets — late events SPAN batch boundaries, so write-time
    # arbitration sees genuine losers
    events = change_log(spark, 8000, late_denom=4, late_max_lag=2500)
    log = str(base / "log")
    events.write.parquet(log)
    table = LakeTable.create(str(base / "dv"), n_buckets=8)
    ingest_changelog(spark, table, log, batch_size=2000, merge_mode="mor_dv")
    return {"events": spark.read.parquet(log), "table": table, "log": log,
            "base": base}


def test_replay_oracle_equality(spark, env):
    got = env["table"].scan(spark)
    want = oracle_state_df(spark, env["events"])
    assert _state_equal(got, want)
    assert got.count() > 0


def test_manifest_carries_dv_and_tomb_entries(spark, env):
    kinds = {f.get("kind") for f in env["table"].manifest(None)["files"]}
    assert "dv" in kinds and "tomb" in kinds
    kills = sum(
        (m.get("metrics") or {}).get("position_kills", 0)
        for m in (env["table"].manifest(s)
                  for s in range(1, env["table"].current_snapshot_id() + 1))
    )
    assert kills > 0  # later batches really superseded earlier live rows


def test_resolved_scan_is_resolution_free(spark, env):
    """The headline read-side win: no Exchange / no aggregate / no window
    anywhere in the resolved-scan plan — the kills apply as a broadcast
    anti-join and the data files stream straight through.  The plain-mor
    twin on the same log DOES carry the LWW shuffle."""
    plan = env["table"].scan(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortAggregate" not in plan and "HashAggregate" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    mor = LakeTable.create(str(env["base"] / "mor_twin"), n_buckets=8)
    ingest_changelog(spark, mor, env["log"], batch_size=2000, merge_mode="mor")
    mor_plan = mor.scan(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in mor_plan  # the shuffle dv removes
    assert _state_equal(mor.scan(spark), env["table"].scan(spark))


def test_late_loser_is_not_applied(spark, env):
    """A batch whose winner is OLDER than the stored row must apply as a
    no-op for that key (write-time arbitration), not resurrect old
    content."""
    table = env["table"]
    key = table.scan(spark).select("repo", "path").first()
    before = table.lookup(spark, key[0], key[1]).collect()
    stale = spark.createDataFrame(
        [(10**9, -1, "c-stale", "U", key[0], key[1], "py", "STALE", None)],
        "offset long, commit_seq long, commit string, op string, repo string,"
        "path string, lang string, content string, control string",
    )
    r = apply_batch(spark, table, stale, "stale-batch", merge_mode="mor_dv",
                    offsets={"lo": 10**9, "hi": 10**9})
    assert not r["skipped"]
    after = table.lookup(spark, key[0], key[1]).collect()
    assert [tuple(x) for x in after] == [tuple(x) for x in before]
    assert r["metrics"]["winners"] == 0  # arbitration dropped it


def test_dv_delete_not_resurrected_by_mor_batch(spark, env, tmp_path):
    """Mixed-mode safety: a plain-mor late event must still lose to a
    mor_dv delete memo — the resolved read re-admits memos into the LWW
    pass whenever delta files force one."""
    table = LakeTable.create(str(tmp_path / "mixed"), n_buckets=2)
    ev = spark.createDataFrame(
        [
            (0, 0, "c0", "I", "r1", "a.py", "py", "v0", None),
            (1, 1, "c1", "D", "r1", "a.py", None, None, None),
        ],
        "offset long, commit_seq long, commit string, op string, repo string,"
        "path string, lang string, content string, control string",
    )
    apply_batch(spark, table, ev, "b0", merge_mode="mor_dv",
                offsets={"lo": 0, "hi": 1})
    assert table.scan(spark).count() == 0  # deleted
    late = spark.createDataFrame(
        [(2, 0, "c0", "U", "r1", "a.py", "py", "ZOMBIE", None)],
        "offset long, commit_seq long, commit string, op string, repo string,"
        "path string, lang string, content string, control string",
    )
    apply_batch(spark, table, late, "b1", merge_mode="mor",
                offsets={"lo": 2, "hi": 2})
    rows = table.scan(spark).collect()
    assert rows == [], f"dv-deleted key resurrected by mor batch: {rows}"


def test_idempotent_replay(spark, env):
    table = env["table"]
    sid = table.current_snapshot_id()
    res = ingest_changelog(spark, table, env["log"], batch_size=2000,
                           merge_mode="mor_dv")
    assert all(r.get("skipped", False) or r["metrics"]["winners"] == 0
               for r in res) or res == []
    assert table.current_snapshot_id() == sid
    assert _state_equal(table.scan(spark),
                        oracle_state_df(spark, env["events"]))


def test_compact_restores_plain_layout(spark, env, tmp_path):
    table = LakeTable.create(str(tmp_path / "dvcomp"), n_buckets=4)
    events = change_log(spark, 4000, late_denom=4, late_max_lag=1500)
    log = str(tmp_path / "log2")
    events.write.parquet(log)
    ingest_changelog(spark, table, log, batch_size=1000, merge_mode="mor_dv")
    assert table.unresolved_buckets()
    compact(spark, table, batch_id="dv-compact")
    m = table.manifest(None)
    assert not any(f.get("kind") for f in m["files"])
    assert not table.unresolved_buckets()
    assert _state_equal(table.scan(spark), oracle_state_df(spark, events))
    # post-compact scan needs neither kills nor resolution
    plan = table.scan(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_time_travel_and_incremental_on_dv_snapshots(spark, env):
    table = env["table"]
    assert table.scan(spark, snapshot_id=1).count() >= 0
    feed = table.incremental(spark, 1)
    assert feed.count() > 0
    # deletes surface in the feed (memos are the delete changes)
    assert feed.filter(F.col("_deleted")).count() > 0


def test_schema_evolution_through_mor_dv(spark, env, tmp_path):
    """Control events evolve the schema before the merge; memos and data
    files written under the new version still project correctly."""
    from glad_tiles_pipeline_spark.sources.generator import inject_controls

    table = LakeTable.create(str(tmp_path / "dvevo"), n_buckets=2)
    events = change_log(spark, 2000)
    log = str(tmp_path / "log3")
    inject_controls(
        events,
        {500: '{"op": "add_column", "name": "size_bytes", "type": "bigint"}'},
    ).write.parquet(log)
    ingest_changelog(spark, table, log, batch_size=700, merge_mode="mor_dv")
    got = table.scan(spark)
    assert "size_bytes" in got.columns
    ev = spark.read.parquet(log).filter(F.col("control").isNull())
    want = oracle_state_df(spark, ev)
    assert _state_equal(got, want)


def test_stream_ingest_mor_dv_matches_oracle(spark, tmp_path):
    """The foreachBatch bridge composes with S26 unchanged (merge kwargs
    pass through): a multi-micro-batch stream under merge_mode='mor_dv'
    lands resolution-free state equal to the replay oracle, and the kills
    accumulate across micro-batches."""
    from glad_tiles_pipeline_spark.streaming.bridge import stream_ingest

    log = str(tmp_path / "log")
    change_log(spark, 4000, late_denom=4, late_max_lag=1500).repartition(
        6
    ).write.parquet(log)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    results = stream_ingest(
        spark, table, log, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, merge_mode="mor_dv",
    )
    assert len(results) >= 2
    kinds = {f.get("kind") for f in table.manifest(None)["files"]}
    assert "dv" in kinds and "tomb" in kinds
    assert sum(
        r.get("metrics", {}).get("position_kills", 0) for r in results
    ) > 0  # later micro-batches killed earlier live rows
    got = table.scan(spark)
    want = oracle_state_df(spark, spark.read.parquet(log))
    assert _state_equal(got, want)


def test_sidecar_files_pack_to_one_per_bucket_per_batch(spark, env):
    """Round-5 write-path shape gates: (a) tomb/dv sidecars are packed by
    one bounded shuffle each to at most one file per bucket per commit —
    a naive partitionBy write fans them into tasks x buckets ~30-row
    files whose footers dominate every later write-time arbitration
    scan; (b) data files stay on the planned __pid partitioning (the one
    full-width shuffle), so their count per commit is bounded by the pid
    space, never tasks x buckets."""
    table = env["table"]
    n_buckets = table.manifest(None)["n_buckets"]
    per_commit: dict[tuple[int, str, int], int] = {}
    seen = set()
    for sid in range(1, table.current_snapshot_id() + 1):
        m = table.manifest(sid)
        for f in m["files"]:
            if f["path"] in seen:
                continue
            seen.add(f["path"])
            kind = f.get("kind") or "data"
            k = (sid, kind, f["bucket"])
            per_commit[k] = per_commit.get(k, 0) + 1
    assert any(kind == "dv" for _, kind, _ in per_commit), "no dv files seen"
    for (sid, kind, bucket), n in per_commit.items():
        if kind in ("dv", "tomb"):
            assert n <= 1, (
                f"snapshot {sid}: {n} {kind} files in bucket {bucket} "
                f"(expected <=1 per bucket per commit)"
            )
    data_per_sid: dict[int, int] = {}
    for (sid, kind, _), n in per_commit.items():
        if kind == "data":
            data_per_sid[sid] = data_per_sid.get(sid, 0) + n
    for sid, n in data_per_sid.items():
        assert n <= 8 * n_buckets, f"snapshot {sid}: {n} data files"
