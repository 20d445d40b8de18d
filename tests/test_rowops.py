"""S30: predicate row-level ops (DELETE WHERE / UPDATE SET ... WHERE)
compiled onto the exactly-once CDC apply path (operators/rowops.py).

Contract under test: each op is one predicate-filtered live read emitting
O(matched) changelog events into ``apply_batch`` — so it inherits batch-id
idempotence, LWW ordering (the op is ONE version: later CDC batches beat
it), merge modes, and leaves the offset high-water untouched.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.merge import apply_batch
from glad_tiles_pipeline_spark.operators.rowops import delete_where, update_where
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

COLS = ["repo", "path", "commit", "lang", "content", "content_sha"]


def _seeded(spark, tmp_path, n=4000, merge_mode="cow"):
    log = str(tmp_path / "log")
    change_log(spark, n).write.parquet(log)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, log, batch_size=2000,
                     merge_mode=merge_mode)
    return table, log


def _assert_same(got, want):
    d1 = got.exceptAll(want).count()
    d2 = want.exceptAll(got).count()
    assert (d1, d2) == (0, 0), (d1, d2)


@pytest.mark.parametrize("merge_mode", ["cow", "mor", "mor_dv"])
def test_delete_where_equals_filtered_state(spark, tmp_path, merge_mode):
    table, _ = _seeded(spark, tmp_path, merge_mode=merge_mode)
    before = table.scan(spark).select(COLS).cache()
    pred = "length(content) % 3 = 1"
    hi_before = table.last_committed_offset()

    res = delete_where(spark, table, pred, "del-1", merge_mode=merge_mode)
    assert res["skipped"] is False
    _assert_same(
        table.scan(spark).select(COLS),
        before.filter(f"NOT ({pred})"),
    )
    # offset high-water untouched: a row-op consumes nothing upstream
    assert table.last_committed_offset() == hi_before
    # idempotent replay on the batch id
    assert delete_where(spark, table, pred, "del-1",
                        merge_mode=merge_mode)["skipped"] is True
    before.unpersist()


def test_delete_where_none_deletes_everything(spark, tmp_path):
    table, _ = _seeded(spark, tmp_path, n=1500, merge_mode="mor")
    delete_where(spark, table, None, "purge", merge_mode="mor")
    assert table.scan(spark).count() == 0


def test_update_where_rewrites_named_keeps_rest_recomputes_sha(
    spark, tmp_path
):
    table, _ = _seeded(spark, tmp_path, merge_mode="mor")
    before = table.scan(spark).select(COLS).cache()
    pred = "length(content) % 4 = 0"
    assert before.filter(pred).count() > 0
    update_where(
        spark, table,
        {"content": "concat(content, '!patched')"},
        pred, "upd-1", merge_mode="mor",
    )
    want = before.withColumn(
        "content",
        F.when(F.expr(pred), F.concat("content", F.lit("!patched")))
        .otherwise(F.col("content")),
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    _assert_same(table.scan(spark).select(COLS), want)
    # spot-check the derived sha against python hashlib on a changed row
    row = (
        table.scan(spark)
        .filter(F.col("content").endswith("!patched"))
        .select("content", "content_sha")
        .first()
    )
    assert row is not None
    assert row["content_sha"] == hashlib.sha256(
        row["content"].encode()
    ).hexdigest()
    before.unpersist()


def test_rowop_is_one_lww_version_interleaved_with_cdc(spark, tmp_path):
    """The op's events sit at max stored commit_seq + 1, offset 0: they
    beat every row stored BEFORE them, and later changelog events
    arbitrate against them under the engine's ordinary (commit_seq,
    offset) LWW.  Definitional check: ingest half the log → DELETE WHERE →
    ingest the rest must equal the replay oracle over the log UNIONED
    with the very delete events the op emitted."""
    log = str(tmp_path / "log")
    change_log(spark, 6000).write.parquet(log)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, log, batch_size=2000, max_batches=1,
                     merge_mode="mor")
    pred = "length(content) % 2 = 0"
    doomed = table.scan(spark).filter(pred).select("repo", "path").cache()
    res = delete_where(spark, table, pred, "mid-del", merge_mode="mor")
    # the delete out-versions everything stored so far
    assert table.scan(spark).filter(pred).count() == 0
    # resume the log; final state ≡ oracle over log ∪ the delete events
    ingest_changelog(spark, table, log, batch_size=2000, merge_mode="mor")
    events = spark.read.parquet(log)
    del_events = doomed.select(
        F.lit(0).cast("long").alias("offset"),
        F.lit(res["rowop_commit_seq"]).cast("long").alias("commit_seq"),
        F.lit(None).cast("string").alias("commit"),
        F.lit("D").alias("op"),
        F.col("repo"), F.col("path"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("content"),
    )
    want = oracle_state_df(
        spark,
        events.select("offset", "commit_seq", "commit", "op", "repo",
                      "path", "lang", "content").unionByName(del_events),
    ).select(COLS)
    _assert_same(table.scan(spark).select(COLS), want)
    doomed.unpersist()


def test_update_where_refusals(spark, tmp_path):
    table, _ = _seeded(spark, tmp_path, n=800)
    with pytest.raises(ValueError, match="no SET expressions"):
        update_where(spark, table, {}, "1=1", "x")
    with pytest.raises(ValueError, match="key column"):
        update_where(spark, table, {"repo": "'r'"}, None, "x")
    with pytest.raises(ValueError, match="engine-derived"):
        update_where(spark, table, {"content_sha": "'0'"}, None, "x")
    with pytest.raises(ValueError, match="no such column"):
        update_where(spark, table, {"nope": "1"}, None, "x")


def test_repos_prune_matches_unpruned_result(spark, tmp_path):
    """``repos=`` engages the manifest key-stats prune; with a predicate
    that already restricts to those repos the result is identical to the
    unpruned run on a twin table."""
    log = str(tmp_path / "log")
    change_log(spark, 3000).write.parquet(log)
    t1 = LakeTable.create(str(tmp_path / "t1"), n_buckets=8)
    t2 = LakeTable.create(str(tmp_path / "t2"), n_buckets=8)
    for t in (t1, t2):
        ingest_changelog(spark, t, log, batch_size=3000, merge_mode="mor")
    repos = [
        r["repo"]
        for r in t1.scan(spark).select("repo").distinct().limit(2).collect()
    ]
    in_list = ", ".join(f"'{r}'" for r in repos)
    pred = f"repo IN ({in_list}) AND length(content) % 2 = 0"
    delete_where(spark, t1, pred, "d", merge_mode="mor", repos=repos)
    delete_where(spark, t2, pred, "d", merge_mode="mor")
    _assert_same(t1.scan(spark).select(COLS), t2.scan(spark).select(COLS))
# the registered EXTRA query (rowops_update_delete) runs against its
# DuckDB oracle via the parametrized tests/test_queries_oracle.py sweep


def test_update_conflict_retry_recompiles_against_new_head(
    spark, tmp_path, monkeypatch
):
    """Serializable OCC: an UPDATE that loses the manifest CAS to a
    concurrent CDC batch must RECOMPILE against the new head — its SET
    expressions read current values, so a blind re-apply of the stale
    events would resurrect the pre-conflict content.  Simulated: the
    first apply attempt lands a real interleaved commit (changing the
    target row) and then loses the race; the retry must see it."""
    import datetime

    from glad_tiles_pipeline_spark.operators import merge as merge_mod
    from glad_tiles_pipeline_spark.plans.lake import CommitConflict
    from glad_tiles_pipeline_spark.sources.changelog import CHANGE_SCHEMA

    table, _ = _seeded(spark, tmp_path, merge_mode="mor")
    victim = (
        table.scan(spark)
        .filter(F.col("content").isNotNull())
        .select("repo", "path")
        .first()
    )
    from glad_tiles_pipeline_spark.operators.merge_into import max_commit_seq

    hi = table.last_committed_offset()
    seq = max_commit_seq(spark, table)
    interleave = str(tmp_path / "interleave")
    spark.createDataFrame(
        [(hi + 1, int(seq) + 5, "c-x", "M", victim["repo"], victim["path"],
          "py", "INTERLEAVED", datetime.datetime(2024, 1, 1), 1, None)],
        CHANGE_SCHEMA,
    ).write.parquet(interleave)

    real_apply = merge_mod.apply_batch
    state = {"interleaved": False, "conflicts": 0}

    def racing_apply(spark_, table_, events, batch_id, **kw):
        if batch_id.startswith("upd-") and not state["interleaved"]:
            state["interleaved"] = True
            ingest_changelog(spark, LakeTable(str(tmp_path / "t")),
                             interleave, merge_mode="mor")
            state["conflicts"] += 1
            raise CommitConflict("lost the race to the interleaved batch")
        return real_apply(spark_, table_, events, batch_id, **kw)

    monkeypatch.setattr(merge_mod, "apply_batch", racing_apply)

    cond = (F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"])

    # without retries the conflict surfaces to the caller
    with pytest.raises(CommitConflict):
        update_where(spark, table, {"content": "concat(content, '!')"},
                     cond, "upd-noretry", merge_mode="mor")
    assert state["conflicts"] == 1
    state["interleaved"] = False  # next first attempt loses again

    out = update_where(
        spark, LakeTable(str(tmp_path / "t")),
        {"content": "concat(content, '!')"}, cond,
        "upd-retry", merge_mode="mor", conflict_retries=2,
    )
    assert not out.get("skipped")
    assert state["conflicts"] == 2
    row = (
        LakeTable(str(tmp_path / "t")).scan(spark).filter(cond)
        .select("content", "content_sha").collect()[0]
    )
    # the retry recompiled: SET read the INTERLEAVED value, and the
    # derived sha was recomputed from the new content
    assert row["content"] == "INTERLEAVED!"
    assert row["content_sha"] == hashlib.sha256(b"INTERLEAVED!").hexdigest()
