"""S17 Python DataSource: batch/stream parity, partitioning invariance,
and an end-to-end streamed MERGE against the replay oracle."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.sources.pyds import CdcGenDataSource

N = 6000


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(CdcGenDataSource)


def _batch(spark, n=N, **opts):
    r = spark.read.format("cdc_gen").option("n_events", n)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_shape_and_determinism(spark):
    df = _batch(spark)
    assert df.count() == N
    assert df.select("offset").distinct().count() == N
    assert df.columns == [
        "offset", "commit_seq", "commit", "op", "repo", "path",
        "lang", "content", "ts", "schema_ver", "control",
    ]
    # two reads with different partitioning: byte-identical rows
    a = _batch(spark, num_partitions=3)
    b = _batch(spark, num_partitions=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_empty_source_reads_zero_rows(spark):
    assert _batch(spark, n=0).count() == 0


def test_event_semantics_match_s6_contract(spark):
    df = _batch(spark).cache()
    try:
        ops = {r["op"]: r["n"] for r in
               df.groupBy("op").agg(F.count("*").alias("n")).collect()}
        assert 0.5 < ops["I"] / N < 0.7      # ~60%
        assert 0.05 < ops["D"] / N < 0.15    # ~10%
        # deletes carry NULL content, upserts never do
        assert df.filter((F.col("op") == "D") & F.col("content").isNotNull()).count() == 0
        assert df.filter((F.col("op") != "D") & F.col("content").isNull()).count() == 0
        # ~10% late (commit_seq < offset), the rest equal
        late = df.filter(F.col("commit_seq") < F.col("offset")).count()
        assert 0.05 < late / N < 0.15
        assert df.filter(F.col("commit_seq") > F.col("offset")).count() == 0
        # Zipf skew: hottest repo well above uniform share
        top = (df.groupBy("repo").count().orderBy(F.desc("count"))
               .first()["count"])
        assert top / N > 0.10
    finally:
        df.unpersist()


def test_stream_equals_batch(spark, tmp_path):
    q = (
        spark.readStream.format("cdc_gen")
        .option("n_events", N).option("rows_per_batch", 1300)
        .load()
        .writeStream.format("memory").queryName("cdc_gen_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        t0 = time.monotonic()
        while time.monotonic() - t0 < 120:
            if spark.table("cdc_gen_sink").count() >= N:
                break
            time.sleep(0.25)
    finally:
        q.stop()
    q.awaitTermination()
    got = spark.table("cdc_gen_sink")
    assert got.count() == N  # exhausted, then idled — no duplicates
    want = _batch(spark)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streamed_merge_matches_oracle(spark, tmp_path):
    """The source feeding the real T6 bridge through the PUBLIC API:
    ``stream_ingest_continuous(source=<cdc_gen stream>)`` must converge to
    the replay oracle of the batch read — the bridge is source-agnostic."""
    from glad_tiles_pipeline_spark.streaming import stream_ingest_continuous

    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    feed = (
        spark.readStream.format("cdc_gen")
        .option("n_events", N).option("rows_per_batch", 2100)
        .load()
    )
    query, results = stream_ingest_continuous(
        spark, table, None, str(tmp_path / "ckpt"),
        source=feed, processing_time="0 seconds",
    )
    try:
        t0 = time.monotonic()
        while time.monotonic() - t0 < 180:
            if table.io.exists(table._manifest_path(1)) and \
               table.last_committed_offset() >= N - 1:
                break
            time.sleep(0.3)
    finally:
        query.stop()
    query.awaitTermination()
    assert table.last_committed_offset() == N - 1
    assert len(results) >= 2  # several live micro-batches, none skipped
    assert not any(r.get("skipped") for r in results)
    got = table.scan(spark)
    want = oracle_state_df(spark, _batch(spark))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
