"""X12 streaming twin — one foreachBatch stream maintains the main CDC
table AND the inverted token index exactly-once via the same `post_apply`
seam the signature index uses.

Contracts: index search ≡ re-tokenizing the final table state (deletes,
late events, same-seq re-ingests all arbitrated identically — the
sentinel carries the event's full (commit_seq, offset) ordering pair);
fresh-checkpoint replay no-ops both sinks; batch-mode crash between the
sinks converges via the generic catch-up."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.textindex import (
    TOKEN_RE,
    create_token_index,
    search_terms_cdc,
    token_index_hook,
)
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.sources.generator import change_log
from glad_tiles_pipeline_spark.streaming.bridge import stream_ingest

TERMS = ["def", "import", "return", "value"]


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("streamtok")
    log = str(base / "log")
    change_log(spark, 2500, late_denom=4, late_max_lag=900).repartition(
        5
    ).write.parquet(log)
    table = LakeTable.create(str(base / "t"), n_buckets=8)
    index = create_token_index(str(base / "tok"), n_buckets=8)
    results = stream_ingest(
        spark, table, log, str(base / "ckpt"),
        max_files_per_trigger=2,
        post_apply=token_index_hook(spark, index),
    )
    return {"base": base, "log": log, "table": table, "index": index,
            "results": results}


def _want_postings(state):
    """Definitional recompute: tokenize the final live contents."""
    return (
        state.filter(F.col("content").isNotNull())
        .select(
            "repo", "path",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("content")), F.lit(TOKEN_RE), F.lit(0)
                )
            ).alias("term"),
        )
        .groupBy("repo", "path", "term")
        .agg(F.count("*").alias("tf"))
        .filter(F.col("term").isin(TERMS))
        .select("term", "repo", "path", "tf")
    )


def test_stream_search_equals_final_state_recompute(spark, env):
    for r in env["results"]:
        assert not r.get("skipped") and not r["post"].get("skipped")
    got = search_terms_cdc(spark, env["index"], TERMS)
    want = _want_postings(env["table"].scan(spark))
    assert got.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # and the main table itself is still oracle-exact
    state = env["table"].scan(spark)
    oracle = oracle_state_df(spark, spark.read.parquet(env["log"]))
    cols = ["repo", "path", "commit", "content"]
    assert state.select(cols).exceptAll(oracle.select(cols)).count() == 0


def test_fresh_checkpoint_replay_noops_both_sinks(spark, env):
    table_snap = env["table"].current_snapshot_id()
    index_snap = env["index"].current_snapshot_id()
    results = stream_ingest(
        spark, env["table"], env["log"], str(env["base"] / "ckpt2"),
        max_files_per_trigger=2,
        post_apply=token_index_hook(spark, env["index"]),
    )
    assert all(r.get("skipped") and r["post"].get("skipped") for r in results)
    assert env["table"].current_snapshot_id() == table_snap
    assert env["index"].current_snapshot_id() == index_snap


def test_gc_works_on_cdc_composite_ids(spark, env):
    """GC must reclaim dead postings on a changelog-maintained index too:
    the stored composite doc_id rides back verbatim as the event path (a
    numeric re-format would tombstone nonexistent keys and reclaim
    nothing)."""
    from glad_tiles_pipeline_spark.operators.textindex import gc_token_index

    before = {
        (r["term"], r["repo"], r["path"], r["tf"])
        for r in search_terms_cdc(spark, env["index"], TERMS).collect()
    }
    out = gc_token_index(spark, env["index"], "gc-cdc")
    # the late-heavy log guarantees superseded versions -> dead postings
    assert out["metrics"]["deletes_requested"] > 0
    after = {
        (r["term"], r["repo"], r["path"], r["tf"])
        for r in search_terms_cdc(spark, env["index"], TERMS).collect()
    }
    assert after == before


def test_batch_crash_between_sinks_converges_via_catchup(spark, tmp_path):
    """Batch planner: the main table commits a window the index never
    saw (simulated crash between the two MERGEs); the generic catch-up
    closes exactly the un-indexed window from the index's own offset
    high-water."""
    from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
    from glad_tiles_pipeline_spark.streaming.dedup_index import (
        catch_up_signature_index,
    )

    log = str(tmp_path / "log")
    change_log(spark, 1200).write.parquet(log)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    index = create_token_index(str(tmp_path / "tok"), n_buckets=4)
    hook = token_index_hook(spark, index)
    # first window reaches both sinks; second reaches only the main table
    ingest_changelog(spark, table, log, batch_size=600, max_batches=1,
                     post_apply=hook)
    ingest_changelog(spark, table, log, batch_size=600, max_batches=1)
    assert index.last_committed_offset() < table.last_committed_offset()
    out = catch_up_signature_index(spark, table, index, log, hook=hook)
    assert out is not None and not out.get("skipped")
    assert index.last_committed_offset() == table.last_committed_offset()
    got = search_terms_cdc(spark, index, TERMS)
    want = _want_postings(table.scan(spark))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # catch-up is a no-op once current
    assert catch_up_signature_index(spark, table, index, log, hook=hook) is None
