"""X11'' — streaming maintenance of the near-dup signature index.

One foreachBatch stream maintains TWO tables exactly-once: the main CDC
table (the usual T6 MERGE) and the signature index (the `post_apply`
hook), fenced by the same content-addressed batch id.  Contracts under
test:

  * index ≡ signatures-of-final-table-state: offsets/commit_seq ride
    through verbatim, so index LWW arbitration IS the table's — deletes,
    late events, re-ingests and all;
  * replay safety: a fresh checkpoint over the same log no-ops BOTH
    sinks;
  * crash-between-sinks: a table that already committed a batch the
    index missed converges on replay (main skips, index applies);
  * the maintained index serves the production probe: incremental
    simhash dedup of a NEW batch against it equals the full-corpus
    recompute restricted to batch-touching pairs, without reading any
    corpus content.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.incremental import (
    cdc_docs,
    create_signature_index,
    index_signatures_cdc,
    incremental_simhash_neardup,
)
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.sources.generator import change_log
from glad_tiles_pipeline_spark.streaming.bridge import stream_ingest
from glad_tiles_pipeline_spark.streaming.dedup_index import signature_index_hook

N_HASHES = 24


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("streamsig")
    log = str(base / "log")
    # deletes + late re-ingests so index LWW has real arbitration to do
    change_log(spark, 3000, late_denom=4, late_max_lag=1000).repartition(
        6
    ).write.parquet(log)
    table = LakeTable.create(str(base / "t"), n_buckets=8)
    index = create_signature_index(str(base / "sig"), n_hashes=N_HASHES,
                                   n_buckets=8)
    results = stream_ingest(
        spark, table, log, str(base / "ckpt"),
        max_files_per_trigger=2,
        post_apply=signature_index_hook(spark, index, n_hashes=N_HASHES),
    )
    return {"base": base, "log": log, "table": table, "index": index,
            "results": results}


def _want_signatures(spark, state):
    """Recompute what the index MUST hold from the final table state:
    one signature row per live hashable (repo, path) content."""
    from glad_tiles_pipeline_spark.operators.docs import (
        minhash_signatures,
        simhash32,
    )

    docs = cdc_docs(state)
    sigs = minhash_signatures(docs, n_hashes=N_HASHES, id_col="doc_id",
                              text_col="text")
    sims = docs.select(
        "doc_id", simhash32(F.col("text"), token_hash="sha256").alias("simhash")
    )
    return sigs.join(sims, "doc_id")


def test_stream_maintains_both_tables(spark, env):
    assert len(env["results"]) >= 2
    for r in env["results"]:
        assert not r.get("skipped")
        assert not r["post"].get("skipped")
    # main table correct as usual
    got = env["table"].scan(spark)
    want = oracle_state_df(spark, spark.read.parquet(env["log"]))
    cols = ["repo", "path", "commit", "lang", "content"]
    assert got.select(cols).exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got.select(cols)).count() == 0


def test_index_equals_signatures_of_final_state(spark, env):
    got = index_signatures_cdc(spark, env["index"], n_hashes=N_HASHES)
    want = _want_signatures(spark, env["table"].scan(spark))
    cols = got.columns
    assert got.exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got).count() == 0
    assert got.count() > 0


def test_replay_noops_both_sinks(spark, env):
    """Fresh checkpoint over the same log: every micro-batch replays under
    the same content-addressed id and BOTH MERGEs fence it out."""
    sid_t = env["table"].current_snapshot_id()
    sid_i = env["index"].current_snapshot_id()
    results = stream_ingest(
        spark, env["table"], env["log"], str(env["base"] / "ckpt2"),
        max_files_per_trigger=2,
        post_apply=signature_index_hook(spark, env["index"],
                                        n_hashes=N_HASHES),
    )
    assert results and all(r.get("skipped") for r in results)
    assert all(r["post"].get("skipped") for r in results)
    assert env["table"].current_snapshot_id() == sid_t
    assert env["index"].current_snapshot_id() == sid_i


def test_crash_between_sinks_converges_on_replay(spark, tmp_path):
    """The asymmetric crash: the main table committed a batch whose index
    MERGE never ran (process died between the two).  Replay = rerun the
    stream; the main side skips every batch, the hook applies the missing
    index batches, and the pair converges to the symmetric final state."""
    log = str(tmp_path / "log")
    change_log(spark, 1200, late_denom=4, late_max_lag=400).repartition(
        4
    ).write.parquet(log)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    index = create_signature_index(str(tmp_path / "sig"), n_hashes=N_HASHES,
                                   n_buckets=4)
    # "crash before any index MERGE": drain the whole stream with no hook
    stream_ingest(spark, table, log, str(tmp_path / "ckpt"),
                  max_files_per_trigger=2)
    # replay with the hook attached (fresh checkpoint = worst case)
    results = stream_ingest(
        spark, table, log, str(tmp_path / "ckpt2"),
        max_files_per_trigger=2,
        post_apply=signature_index_hook(spark, index, n_hashes=N_HASHES),
    )
    assert results and all(r.get("skipped") for r in results)
    assert all(not r["post"].get("skipped") for r in results)
    got = index_signatures_cdc(spark, index, n_hashes=N_HASHES)
    want = _want_signatures(spark, table.scan(spark))
    cols = got.columns
    assert got.exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got).count() == 0


def test_batch_planner_hook_and_catch_up(spark, tmp_path):
    """Batch mode: `ingest_changelog(post_apply=...)` maintains the index
    per window; a crash between sinks (simulated by ingesting a log
    extension with NO hook) is closed by `catch_up_signature_index` from
    the index's own offset high-water — which also bootstraps an index
    for a pre-existing table (the lo=0 case)."""
    from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
    from glad_tiles_pipeline_spark.streaming.dedup_index import (
        catch_up_signature_index,
        signature_index_hook,
    )

    log = str(tmp_path / "log")
    change_log(spark, 2000, late_denom=4, late_max_lag=500).write.parquet(log)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    index = create_signature_index(str(tmp_path / "sig"), n_hashes=N_HASHES,
                                   n_buckets=4)
    hook = signature_index_hook(spark, index, n_hashes=N_HASHES)

    # normal run: hook rides every window
    res = ingest_changelog(spark, table, log, batch_size=600,
                           merge_mode="mor", post_apply=hook)
    assert len(res) >= 3 and all("post" in r for r in res)
    # current index → catch-up is a no-op
    assert catch_up_signature_index(spark, table, index, log,
                                    hook=hook) is None

    got = index_signatures_cdc(spark, index, n_hashes=N_HASHES)
    want = _want_signatures(spark, table.scan(spark))
    cols = got.columns
    assert got.exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got).count() == 0

    # "crash between sinks": the table advances without the hook...
    extra = change_log(spark, 2600, late_denom=4, late_max_lag=500).filter(
        F.col("offset") >= 2000
    )
    extra.write.mode("append").parquet(log)
    ingest_changelog(spark, table, log, batch_size=600, merge_mode="mor")
    assert index.last_committed_offset() < table.last_committed_offset()
    # ...and catch-up closes exactly the un-indexed window
    caught = catch_up_signature_index(spark, table, index, log, hook=hook)
    assert caught is not None and not caught.get("skipped")
    assert index.last_committed_offset() == table.last_committed_offset()
    got = index_signatures_cdc(spark, index, n_hashes=N_HASHES)
    want = _want_signatures(spark, table.scan(spark))
    assert got.exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got).count() == 0


def test_incremental_probe_against_streamed_index(spark, env):
    """The production per-batch operation: a NEW batch (exact copies of
    five live contents under new paths) probed against the streamed index
    finds exactly the pairs the full-corpus recompute finds, touching no
    corpus content (simhash verify is bit math on stored signatures)."""
    from glad_tiles_pipeline_spark.operators.docs import simhash_neardup

    state = env["table"].scan(spark)
    corpus_docs = cdc_docs(state)
    batch_docs = (
        cdc_docs(
            state.withColumn("path", F.concat(F.col("path"), F.lit(".copy")))
        )
        .orderBy("doc_id")
        .limit(5)
    )
    inc = incremental_simhash_neardup(
        batch_docs,
        index_signatures_cdc(spark, env["index"], n_hashes=N_HASHES),
        max_hamming=3, id_col="doc_id", text_col="text",
    )
    full = simhash_neardup(
        corpus_docs.unionByName(batch_docs), max_hamming=3,
        token_hash="sha256", id_col="doc_id", text_col="text",
    )
    batch_ids = {r[0] for r in batch_docs.select("doc_id").collect()}
    want = sorted(
        tuple(r) for r in full.collect()
        if r[0] in batch_ids or r[1] in batch_ids
    )
    got = sorted(tuple(r) for r in inc.collect())
    assert got == want
    assert len(got) >= 5  # every copied doc pairs with its original


def test_backfill_bootstraps_exactly_over_mixed_rule_history(spark, tmp_path):
    """Rules added MID-HISTORY: windows ingested before the rules carry
    rows the table applied but the current rules would drop — so a raw-log
    catch-up with today's rules under-feeds a NEW index, while
    ``backfill_lww_sink`` (table state at original versions) is exact by
    construction.  Also: the backfill is idempotent, and subsequent
    constrained windows compose through the ordinary hook + catch-up."""
    from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
    from glad_tiles_pipeline_spark.streaming.dedup_index import (
        backfill_lww_sink,
        catch_up_derived_index,
    )

    log = str(tmp_path / "log")
    change_log(spark, 4000, late_denom=4, late_max_lag=1500).write.parquet(log)
    constraints = {"no_lucky_paths": "path NOT LIKE '%7.py'"}
    qdir = str(tmp_path / "q")

    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    # window 1: BEFORE the rules existed — '%7.py' docs enter the table
    ingest_changelog(spark, table, log, batch_size=1000, max_batches=1)
    # windows 2-3: rules in force — violators quarantined
    ingest_changelog(spark, table, log, batch_size=1000, max_batches=2,
                     constraints=constraints, quarantine_dir=qdir)

    # bootstrap a NEW index.  A raw-log catch-up with today's rules would
    # drop window-1's '%7.py' docs that ARE live in the table — the
    # documented inexact flow; the backfill feeds table state instead.
    index = create_signature_index(str(tmp_path / "sig"), n_hashes=N_HASHES,
                                   n_buckets=8)
    hook = signature_index_hook(spark, index, n_hashes=N_HASHES)
    res = backfill_lww_sink(spark, table, hook)
    assert not res.get("skipped")

    got = index_signatures_cdc(spark, index, n_hashes=N_HASHES)
    want = _want_signatures(spark, table.scan(spark))
    cols = got.columns
    assert got.exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got).count() == 0
    # non-degenerate: pre-rules '%7.py' docs are live and indexed
    assert got.filter(F.col("doc_id").like("%7.py")).count() > 0

    # idempotent: same snapshot-addressed id no-ops
    assert backfill_lww_sink(spark, table, hook).get("skipped")
    # high-water landed at the backfilled snapshot; catch-up is current
    assert index.last_committed_offset() == table.last_committed_offset()

    # the remaining window composes through the ordinary constrained path
    ingest_changelog(spark, table, log, batch_size=1000,
                     constraints=constraints, quarantine_dir=qdir,
                     post_apply=hook)
    caught = catch_up_derived_index(spark, table, index, log, hook=hook,
                                    constraints=constraints)
    assert caught is None  # hook kept it current; nothing to catch up
    got = index_signatures_cdc(spark, index, n_hashes=N_HASHES)
    want = _want_signatures(spark, table.scan(spark))
    assert got.exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got).count() == 0
