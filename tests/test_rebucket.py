"""S21 bucket-layout evolution: phased re-bucketing migration of a live
table, interleaved with ingest, with replay-oracle equality before/during/
after, rollback across the migration, and loud refusal of every operation
whose semantics need a single layout (CoW, compact, bucket-pruned scan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.merge import compact
from glad_tiles_pipeline_spark.operators.rebucket import (
    rebucket,
    rebucket_step,
    start_rebucket,
)
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

N = 3000


def _assert_oracle(spark, table, events):
    scan = table.scan(spark)
    oracle = oracle_state_df(spark, events)
    cols = sorted(set(scan.columns) & set(oracle.columns))
    a, b = scan.select(*cols), oracle.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_migration_mid_ingest_oracle_before_during_after(spark, tmp_path):
    """The headline: 8 → 32 mid-ingest.  Every stage — pre-migration,
    post-start, after a partial step, after more ingest, post-finish,
    post-compact — scans equal to the replay oracle."""
    log = str(tmp_path / "log")
    events = change_log(spark, N)
    events.filter(F.col("offset") < 1000).write.parquet(log)
    table = LakeTable.create(str(tmp_path / "lake"), n_buckets=8)
    ingest_changelog(spark, table, log, batch_size=500, merge_mode="mor")
    _assert_oracle(spark, table, events.filter(F.col("offset") < 1000))

    res = start_rebucket(table, 32)
    assert table.migration() is not None
    assert table.n_buckets == 32  # write layout flipped immediately
    mid_snapshot = res["snapshot_id"]

    # ingest DURING the migration: deltas route under the new layout
    events.filter(
        (F.col("offset") >= 1000) & (F.col("offset") < 2000)
    ).write.mode("append").parquet(log)
    ingest_changelog(spark, table, log, batch_size=500, merge_mode="mor")
    _assert_oracle(spark, table, events.filter(F.col("offset") < 2000))
    gens = {
        f.get("layout_gen", 1) for f in table.manifest(None)["files"]
    }
    assert gens == {1, 2}  # both generations live mid-migration

    # partial step, then more ingest, oracle still exact
    step = rebucket_step(spark, table, max_buckets=3)
    assert not step["done"] and step["rebucketed_buckets"] == 3
    _assert_oracle(spark, table, events.filter(F.col("offset") < 2000))
    events.filter(F.col("offset") >= 2000).write.mode("append").parquet(log)
    ingest_changelog(spark, table, log, batch_size=500, merge_mode="mor")
    _assert_oracle(spark, table, events)

    # finish: remaining old buckets move, migration clears
    while not rebucket_step(spark, table, max_buckets=2)["done"]:
        pass
    assert table.migration() is None
    assert table.n_buckets == 32
    assert table.layout_info()["layouts"] == {2: 32}
    assert {
        f.get("layout_gen", 1) for f in table.manifest(None)["files"]
    } == {2}
    _assert_oracle(spark, table, events)

    # post-migration the single-layout ops work again
    compact(spark, table)
    _assert_oracle(spark, table, events)
    assert table.scan(spark, buckets={0, 1}).count() > 0

    # time travel to a mid-migration snapshot stays exact
    assert table.scan(spark, snapshot_id=mid_snapshot).count() > 0


def test_single_layout_ops_refuse_mid_migration(spark, tmp_path):
    log = str(tmp_path / "log")
    change_log(spark, 600).write.parquet(log)
    table = LakeTable.create(str(tmp_path / "lake"), n_buckets=4)
    ingest_changelog(spark, table, log, batch_size=300, merge_mode="mor")
    start_rebucket(table, 8)
    from glad_tiles_pipeline_spark.operators.merge import apply_batch

    more = change_log(spark, 100, seed=9).withColumn(
        "offset", F.col("offset") + 600
    )
    with pytest.raises(ValueError, match="cow ingest during"):
        apply_batch(spark, table, more, "cow-mid-migration", merge_mode="cow")
    with pytest.raises(ValueError, match="compact during"):
        compact(spark, table)
    with pytest.raises(ValueError, match="bucket-pruned scan"):
        table.scan(spark, buckets={0})
    with pytest.raises(ValueError, match="already in progress"):
        start_rebucket(table, 16)
    # full scans stay exact throughout (guards never affect readers)
    _assert_oracle(spark, table, spark.read.parquet(log))


def test_rollback_across_migration_restores_layout(spark, tmp_path):
    log = str(tmp_path / "log")
    events = change_log(spark, 1000)
    events.write.parquet(log)
    table = LakeTable.create(str(tmp_path / "lake"), n_buckets=4)
    ingest_changelog(spark, table, log, batch_size=500, merge_mode="mor")
    pre = table.current_snapshot_id()
    rebucket(spark, table, 16, buckets_per_step=2)
    assert table.n_buckets == 16 and table.migration() is None
    table.rollback(pre)
    assert table.n_buckets == 4
    assert table.migration() is None
    assert table.layout_info()["layouts"] == {1: 4}
    _assert_oracle(spark, table, events)
    # the table keeps working at the restored layout
    rebucket(spark, table, 8)
    assert table.n_buckets == 8
    _assert_oracle(spark, table, events)


def test_step_idempotent_and_non_multiple_width(spark, tmp_path):
    log = str(tmp_path / "log")
    events = change_log(spark, 900)
    events.write.parquet(log)
    table = LakeTable.create(str(tmp_path / "lake"), n_buckets=4)
    ingest_changelog(spark, table, log, batch_size=300, merge_mode="mor")
    start_rebucket(table, 6)  # 6 % 4 != 0: the uniform-estimate path
    step = rebucket_step(spark, table, batch_id="rb-step-1")
    assert step["done"]
    again = rebucket_step(spark, table, batch_id="rb-step-1")
    assert again["skipped"]
    assert table.n_buckets == 6
    _assert_oracle(spark, table, events)
    # every surviving file sits in a valid new-layout bucket
    assert all(
        0 <= f["bucket"] < 6 for f in table.manifest(None)["files"]
    )


def test_incremental_and_lake_cdc_across_rebucket(spark, tmp_path):
    """incremental() refuses a window spanning a rebucket commit (it is a
    rewrite); lake_cdc skips it exactly and an e2e mirror stays equal."""
    from glad_tiles_pipeline_spark.sources.lake_cdc import (
        LakeCdcDataSource,
        feed_as_changelog,
    )
    from glad_tiles_pipeline_spark.streaming.bridge import stream_ingest

    spark.dataSource.register(LakeCdcDataSource)
    log = str(tmp_path / "log")
    events = change_log(spark, 1200)
    events.filter(F.col("offset") < 600).write.parquet(log)
    table = LakeTable.create(str(tmp_path / "lake"), n_buckets=4)
    ingest_changelog(spark, table, log, batch_size=300, merge_mode="mor")

    # mirror catches up pre-migration
    mirror = LakeTable.create(str(tmp_path / "mirror"), n_buckets=4)
    def _tail():
        feed = (
            spark.readStream.format("lake_cdc")
            .option("path", table.root)
            .option("on_rewrite", "skip")
            .load()
        )
        stream_ingest(
            spark, mirror, None, str(tmp_path / "ckpt"),
            source=feed_as_changelog(feed), merge_mode="mor",
        )
    _tail()

    rebucket(spark, table, 8, buckets_per_step=2)
    with pytest.raises(ValueError, match="rewrite commit"):
        table.incremental(spark, 0)
    events.filter(F.col("offset") >= 600).write.mode("append").parquet(log)
    ingest_changelog(spark, table, log, batch_size=300, merge_mode="mor")

    _tail()  # skips the rebucket commits, ingests the new deltas
    cols = ["repo", "path", "commit", "lang", "content", "content_sha"]
    up, down = table.scan(spark).select(*cols), mirror.scan(spark).select(*cols)
    assert down.exceptAll(up).count() == 0 and up.exceptAll(down).count() == 0
