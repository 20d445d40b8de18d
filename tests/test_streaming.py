"""EP-C streaming ingest (SURVEY.md §2.9, §3): foreachBatch bridge ==
batch MERGE path, exactly-once across restarts, hygiene + metrics streams."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.sources.changelog import read_changelog_stream
from glad_tiles_pipeline_spark.sources.generator import change_log
from glad_tiles_pipeline_spark.streaming import (
    stream_ingest,
    stream_ingest_continuous,
    stream_metrics,
)

N = 4000


def _assert_equals_oracle(spark, table, events):
    got = table.scan(spark)
    want = oracle_state_df(spark, events)
    extra = got.exceptAll(want).count()
    missing = want.exceptAll(got).count()
    assert (extra, missing) == (0, 0), f"extra={extra} missing={missing}"


@pytest.fixture()
def log_dir(spark, tmp_path):
    d = str(tmp_path / "changelog")
    # several files → several micro-batches under maxFilesPerTrigger
    change_log(spark, N).repartition(6).write.parquet(d)
    return d


def test_stream_ingest_matches_oracle(spark, tmp_path, log_dir):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    results = stream_ingest(
        spark, table, log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    assert len(results) >= 2  # genuinely incremental, not one giant batch
    assert not any(r["skipped"] for r in results)
    _assert_equals_oracle(spark, table, spark.read.parquet(log_dir))


def test_stream_resume_is_exactly_once(spark, tmp_path, log_dir):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    stream_ingest(spark, table, log_dir, ckpt, max_files_per_trigger=3)
    snap = table.current_snapshot_id()

    # Re-run with the same checkpoint: backlog drained → no new micro-batches.
    again = stream_ingest(spark, table, log_dir, ckpt, max_files_per_trigger=3)
    assert [r for r in again if not r.get("skipped")] == []
    assert table.current_snapshot_id() == snap

    # New events arrive → only the delta is applied; final state == oracle.
    change_log(spark, 1500, seed=43).withColumn(
        "offset", F.col("offset") + N
    ).repartition(2).write.mode("append").parquet(log_dir)
    more = stream_ingest(spark, table, log_dir, ckpt, max_files_per_trigger=3)
    assert [r for r in more if not r.get("skipped")]
    _assert_equals_oracle(spark, table, spark.read.parquet(log_dir))


def test_stream_hygiene_drops_duplicate_deliveries(spark, tmp_path):
    # at-least-once source: every file delivered twice
    d = str(tmp_path / "changelog")
    ev = change_log(spark, 1000)
    ev.repartition(2).write.parquet(d)
    ev.repartition(2).write.mode("append").parquet(d)

    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    results = stream_ingest(
        spark,
        table,
        d,
        str(tmp_path / "ckpt"),
        watermark="1 hour",
        dedup_keys=["offset"],
    )
    applied = [r for r in results if not r.get("skipped")]
    assert sum(r["metrics"]["events_read"] for r in applied) == 1000  # dups gone
    _assert_equals_oracle(spark, table, ev)


def test_quarantine_policy_diverts_late_events(spark, tmp_path, log_dir):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    qdir = str(tmp_path / "quarantine")
    results = stream_ingest(
        spark,
        table,
        log_dir,
        str(tmp_path / "ckpt"),
        quarantine_dir=qdir,
        late_threshold="10 minutes",
    )
    applied = [r for r in results if not r.get("skipped")]
    n_merged = sum(r["metrics"]["events_read"] for r in applied)
    n_quarantined = (
        spark.read.parquet(qdir).count() if os.path.isdir(qdir) else 0
    )
    # generator: ~1/10 of events are late by up to 5000s → some quarantined,
    # and every event went exactly one way
    assert n_quarantined > 0
    assert n_merged + n_quarantined == N


def test_stream_metrics_tumbling_counts(spark, tmp_path, log_dir):
    stream = read_changelog_stream(spark, log_dir, max_files_per_trigger=3)
    q = (
        stream_metrics(stream, window="1 minute")
        .writeStream.format("memory")
        .queryName("health")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("health")
    assert got.count() > 0
    # batch twin on the same frame agrees on totals
    batch = stream_metrics(spark.read.parquet(log_dir), window="1 minute")
    assert got.agg(F.sum("n_events")).collect()[0][0] == N
    assert batch.agg(F.sum("n_events")).collect()[0][0] == N


def test_stream_sliding_window_counts(spark, tmp_path, log_dir):
    """T2 sliding variant under a REAL stream: 2h windows sliding by 1h —
    every event counted in exactly two windows; totals equal the batch twin."""
    stream = read_changelog_stream(spark, log_dir, max_files_per_trigger=3)
    q = (
        stream.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("sliding")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("sliding")
    assert got.agg(F.sum("n")).collect()[0][0] == 2 * N  # 2 windows/event
    batch = (
        spark.read.parquet(log_dir)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0


def test_stateful_repo_activity(spark, tmp_path, log_dir):
    """T5: applyInPandasWithState carries per-repo running totals across
    micro-batches; the final update row per repo equals the batch truth."""
    from glad_tiles_pipeline_spark.streaming.stateful import repo_activity_state

    stream = read_changelog_stream(spark, log_dir, max_files_per_trigger=2)
    q = (
        repo_activity_state(stream)
        .writeStream.format("memory")
        .queryName("repo_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    updates = spark.table("repo_state")
    # multiple micro-batches really happened (running state was exercised)
    assert updates.groupBy("repo").count().agg(F.max("count")).collect()[0][0] > 1
    # last update per repo == plain batch aggregation over the whole log
    last = (
        updates.groupBy("repo")
        .agg(F.max(F.struct("batches_seen", "total_events", "max_commit_seq")).alias("w"))
        .select("repo", F.col("w.total_events").alias("total_events"),
                F.col("w.max_commit_seq").alias("max_commit_seq"))
    )
    truth = (
        spark.read.parquet(log_dir)
        .groupBy("repo")
        .agg(F.count("*").alias("total_events"),
             F.max("commit_seq").alias("max_commit_seq"))
    )
    assert last.exceptAll(truth).count() == 0 and truth.exceptAll(last).count() == 0


def test_stateful_repo_activity_transform_with_state(spark, tmp_path, log_dir):
    """T5 on the Spark 4 transformWithStateInPandas surface: same final
    telemetry as the applyInPandasWithState form and the batch truth.
    Needs the RocksDB state store provider (restored after the test) and
    the protobuf runtime (transformWithState's state-server protocol —
    not installed in this sandbox, so the test skips there; the operator
    itself is plain PySpark and runs wherever protobuf exists)."""
    pytest.importorskip("google.protobuf.descriptor")
    from glad_tiles_pipeline_spark.streaming.stateful import repo_activity_state_tws

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_changelog_stream(spark, log_dir, max_files_per_trigger=2)
        q = (
            repo_activity_state_tws(stream)
            .writeStream.format("memory")
            .queryName("repo_state_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    updates = spark.table("repo_state_tws")
    assert updates.groupBy("repo").count().agg(F.max("count")).collect()[0][0] > 1
    last = (
        updates.groupBy("repo")
        .agg(F.max(F.struct("batches_seen", "total_events", "max_commit_seq")).alias("w"))
        .select("repo", F.col("w.total_events").alias("total_events"),
                F.col("w.max_commit_seq").alias("max_commit_seq"))
    )
    truth = (
        spark.read.parquet(log_dir)
        .groupBy("repo")
        .agg(F.count("*").alias("total_events"),
             F.max("commit_seq").alias("max_commit_seq"))
    )
    assert last.exceptAll(truth).count() == 0 and truth.exceptAll(last).count() == 0


def test_continuous_trigger_is_same_query(spark, tmp_path, log_dir):
    """The production loop really is 'the same query with a continuous
    trigger': a processing-time-trigger run over two arrival waves —
    started, ≥2 data micro-batches, stopped gracefully — must leave the
    table in exactly the state AvailableNow produces on the same log."""
    import time

    table = LakeTable.create(str(tmp_path / "t_cont"), n_buckets=8)
    query, results = stream_ingest_continuous(
        spark, table, log_dir, str(tmp_path / "ckpt_cont"),
        processing_time="1 second", max_files_per_trigger=4,
    )

    def _wait(pred, timeout=120.0):
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            if pred():
                return
            time.sleep(0.25)
        raise AssertionError(f"continuous run stalled: {query.status}")

    try:
        _wait(lambda: len(results) >= 1)  # wave 1 applied by a live tick
        change_log(spark, 1500, seed=43).withColumn(
            "offset", F.col("offset") + N
        ).repartition(2).write.mode("append").parquet(log_dir)
        _wait(lambda: len(results) >= 2)  # wave 2 picked up WHILE running
        # drain in-flight work, then stop gracefully
        _wait(lambda: not query.status["isDataAvailable"]
              and not query.status["isTriggerActive"])
    finally:
        query.stop()
    query.awaitTermination()

    assert len(results) >= 2
    assert not any(r.get("skipped") for r in results)
    _assert_equals_oracle(spark, table, spark.read.parquet(log_dir))

    # AvailableNow twin over the same (two-wave) log: identical final state
    twin = LakeTable.create(str(tmp_path / "t_twin"), n_buckets=8)
    stream_ingest(spark, twin, log_dir, str(tmp_path / "ckpt_twin"))
    got = table.scan(spark)
    want = twin.scan(spark)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_checkpoint_reset_does_not_lose_data(spark, tmp_path, log_dir):
    """Regression: with epoch-based batch ids, a lost/reset checkpoint made
    Spark re-deliver everything as batch 0, which matched an old committed
    id and silently dropped the NEW events.  Content-addressed ids must
    survive a full checkpoint reset."""
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    stream_ingest(spark, table, log_dir, str(tmp_path / "ckptA"))

    change_log(spark, 1500, seed=47).withColumn(
        "offset", F.col("offset") + N
    ).repartition(2).write.mode("append").parquet(log_dir)

    # checkpoint lost: fresh dir → epochs restart at 0
    stream_ingest(spark, table, log_dir, str(tmp_path / "ckptB"))
    _assert_equals_oracle(spark, table, spark.read.parquet(log_dir))


def test_stream_compact_every_bounds_read_amplification(spark, tmp_path, log_dir):
    """In-loop maintenance for the production stream (the batch planner's
    compact_every, policy-driven): after every K applied micro-batches,
    only read-amplified buckets are rewritten; final state still equals
    the replay oracle and the delta count stays bounded."""
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    results = stream_ingest(
        spark, table, log_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, merge_mode="mor",
        compact_every=2, compact_policy={"max_delta_files": 1},
    )
    applied = [r for r in results if not r.get("skipped")]
    assert len(applied) >= 4  # several micro-batches, several intervals
    assert any("compacted_buckets" in r for r in applied)
    _assert_equals_oracle(spark, table, spark.read.parquet(log_dir))

    # the policy actually bounded amplification: no bucket holds more
    # delta files than one trailing interval can stack (compact_every
    # applies × 1 delta file per bucket per batch, vs 6 without)
    from collections import Counter

    per_bucket = Counter(
        f["bucket"] for f in table.manifest()["files"]
        if f.get("kind") in ("delta", "tomb")
    )
    assert not per_bucket or max(per_bucket.values()) <= 2, per_bucket

    # resume with the same checkpoint stays a no-op (maintenance commits
    # don't disturb the fencing or the offset high-water)
    again = stream_ingest(
        spark, table, log_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, merge_mode="mor", compact_every=2,
    )
    assert [r for r in again if not r.get("skipped")] == []
