"""S20 lake_cdc Python DataSource: the lake table's OWN change feed as a
batch/stream Spark source, closing the table-to-table loop (a downstream
table tails this one the way this engine tails its upstream changelog).

Invariants under test:
* batch feed ≡ ``LakeTable.incremental()`` after window-LWW (same manifests,
  two surfaces);
* stream feed ≡ batch feed (offset = snapshot id, replay-exact);
* the e2e mirror: a downstream table ingesting the feed through the public
  streaming bridge converges to the upstream table's state;
* rewrite commits: compact is skippable exactly, CoW always refuses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.dedup import lww_dedup
from glad_tiles_pipeline_spark.operators.merge import compact
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log
from glad_tiles_pipeline_spark.sources.lake_cdc import (
    LakeCdcDataSource,
    feed_as_changelog,
)
from glad_tiles_pipeline_spark.streaming.bridge import stream_ingest

KEY = ["repo", "path"]
STATE_COLS = ["repo", "path", "commit", "lang", "content", "content_sha"]
N = 4000


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LakeCdcDataSource)


@pytest.fixture(scope="module")
def upstream(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lakecdc")
    log_dir = str(base / "log")
    change_log(spark, N).write.parquet(log_dir)
    table = LakeTable.create(str(base / "lake"), n_buckets=8)
    ingest_changelog(spark, table, log_dir, batch_size=1000, merge_mode="mor")
    return table


def _batch_feed(spark, root, **opts):
    r = spark.read.format("lake_cdc").option("path", root)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_feed_matches_incremental_after_window_lww(spark, upstream):
    cur = upstream.current_snapshot_id()
    feed = _batch_feed(spark, upstream.root)
    collapsed = lww_dedup(
        feed.drop("_snapshot_id"),
        key=KEY,
        strategy="argmax",
        order=["_commit_seq", "_offset"],
    )
    inc = upstream.incremental(spark, 0, cur)
    cols = [c for c in inc.columns]
    a, b = collapsed.select(*cols), inc.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_batch_feed_tags_rows_with_adding_snapshot(spark, upstream):
    feed = _batch_feed(spark, upstream.root)
    hist = upstream.history(spark).collect()
    mor_sids = {h["snapshot_id"] for h in hist if h["merge_mode"] == "mor"}
    tagged = {
        r["_snapshot_id"]
        for r in feed.select("_snapshot_id").distinct().collect()
    }
    assert tagged == mor_sids  # every data commit feeds, nothing else
    # sub-window: only that window's snapshots
    sids = sorted(mor_sids)
    lo, hi = sids[0], sids[1]
    sub = _batch_feed(spark, upstream.root, from_snapshot=lo, to_snapshot=hi)
    assert {
        r["_snapshot_id"] for r in sub.select("_snapshot_id").distinct().collect()
    } == {hi}


def test_batch_feed_surfaces_tombstones(spark, upstream):
    feed = _batch_feed(spark, upstream.root)
    assert feed.filter(F.col("_deleted")).count() > 0
    assert (
        feed.filter(F.col("_deleted") & F.col("content").isNotNull()).count() == 0
    )


def test_empty_and_invalid_windows(spark, upstream):
    cur = upstream.current_snapshot_id()
    assert _batch_feed(
        spark, upstream.root, from_snapshot=cur, to_snapshot=cur
    ).count() == 0
    with pytest.raises(Exception, match="invalid lake_cdc window"):
        _batch_feed(
            spark, upstream.root, from_snapshot=cur + 1, to_snapshot=cur + 2
        ).count()


def test_stream_feed_equals_batch_feed(spark, upstream, tmp_path):
    q = (
        spark.readStream.format("lake_cdc")
        .option("path", upstream.root)
        .load()
        .writeStream.format("memory")
        .queryName("lake_cdc_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("lake_cdc_sink")
    want = _batch_feed(spark, upstream.root)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_e2e_mirror_via_streaming_bridge(spark, upstream, tmp_path):
    """Downstream table tails the upstream through the PUBLIC surfaces only:
    lake_cdc stream → feed_as_changelog → stream_ingest → scan equality."""
    mirror = LakeTable.create(str(tmp_path / "mirror"), n_buckets=4)
    feed = (
        spark.readStream.format("lake_cdc").option("path", upstream.root).load()
    )
    stream_ingest(
        spark,
        mirror,
        None,
        str(tmp_path / "ckpt"),
        source=feed_as_changelog(feed),
        merge_mode="mor",
    )
    up = upstream.scan(spark).select(*STATE_COLS)
    down = mirror.scan(spark).select(*STATE_COLS)
    assert down.exceptAll(up).count() == 0 and up.exceptAll(down).count() == 0
    # tailing again after new upstream commits catches the mirror up
    extra_log = str(tmp_path / "log2")
    change_log(spark, 1200, seed=43).withColumn(
        "offset", F.col("offset") + N
    ).write.parquet(extra_log)
    ingest_changelog(
        spark, upstream, extra_log, batch_size=600, merge_mode="mor"
    )
    stream_ingest(
        spark,
        mirror,
        None,
        str(tmp_path / "ckpt"),
        source=feed_as_changelog(
            spark.readStream.format("lake_cdc")
            .option("path", upstream.root)
            .load()
        ),
        merge_mode="mor",
    )
    up = upstream.scan(spark).select(*STATE_COLS)
    down = mirror.scan(spark).select(*STATE_COLS)
    assert down.exceptAll(up).count() == 0 and up.exceptAll(down).count() == 0


def test_rewrite_commits_error_and_skip(spark, tmp_path):
    """compact: refused by default, skipped exactly with on_rewrite=skip;
    CoW ingest: always refused (its delta is irrecoverable from file diffs).
    Own table — the shared fixture must stay uncompacted."""
    log_dir = str(tmp_path / "log")
    change_log(spark, 1500).write.parquet(log_dir)
    table = LakeTable.create(str(tmp_path / "lake"), n_buckets=4)
    ingest_changelog(spark, table, log_dir, batch_size=500, merge_mode="mor")
    # pin to_snapshot: the source plans lazily, so an unpinned window would
    # re-resolve to the post-compact head at action time
    pre_cur = table.current_snapshot_id()
    pre_feed = _batch_feed(spark, table.root, to_snapshot=pre_cur).drop(
        "_snapshot_id"
    )
    compact(spark, table)
    with pytest.raises(Exception, match="rewrite commit"):
        _batch_feed(spark, table.root).count()
    skipped = _batch_feed(spark, table.root, on_rewrite="skip").drop(
        "_snapshot_id"
    )
    assert skipped.exceptAll(pre_feed).count() == 0
    assert pre_feed.exceptAll(skipped).count() == 0
    # a window starting at/after the rewrite needs no skip
    cur = table.current_snapshot_id()
    assert _batch_feed(spark, table.root, from_snapshot=cur).count() == 0
    # CoW: even skip mode refuses
    log2 = str(tmp_path / "log2")
    change_log(spark, 500, seed=44).withColumn(
        "offset", F.col("offset") + 1500
    ).write.parquet(log2)
    ingest_changelog(spark, table, log2, batch_size=500, merge_mode="cow")
    with pytest.raises(Exception, match="CoW ingest commit"):
        _batch_feed(spark, table.root, on_rewrite="skip").count()


def test_feed_projects_evolved_schema(spark, tmp_path):
    """Files written before an add_column evolve project the new field as
    NULL — the same field-id mapping contract as LakeTable.scan."""
    log_dir = str(tmp_path / "log")
    change_log(spark, 800).write.parquet(log_dir)
    table = LakeTable.create(str(tmp_path / "lake"), n_buckets=4)
    ingest_changelog(spark, table, log_dir, batch_size=400, merge_mode="mor")
    table.evolve(
        [{"op": "add_column", "name": "stars", "type": "bigint"}],
        batch_id="evo-1",
    )
    feed = _batch_feed(spark, table.root)
    assert "stars" in feed.columns
    assert feed.filter(F.col("stars").isNotNull()).count() == 0
    assert feed.count() > 0


def test_feed_over_generic_derived_index_table(spark, tmp_path):
    """The change feed is schema-GENERIC: a derived token index (generic
    (term, doc_id, tf, doc_seq, doc_off) schema, maintained through the
    same MERGE path) serves its own lake_cdc feed, and window-LWW over
    the feed reproduces the index's resolved state — a downstream of a
    downstream, closing the table-to-table loop for derived tables."""
    from pyspark.sql import Row

    from glad_tiles_pipeline_spark.operators.textindex import (
        create_token_index,
        update_token_index,
    )

    idx = create_token_index(str(tmp_path / "tok"), n_buckets=4)
    d1 = spark.createDataFrame([(1, "a b"), (2, "b c")], ["doc_id", "text"])
    d2 = spark.createDataFrame([(1, "c d")], ["doc_id", "text"])
    update_token_index(spark, idx, d1, "b1", 1)
    update_token_index(spark, idx, d2, "b2", 2,
                       deletes=spark.createDataFrame([Row(doc_id=2)]))

    feed = (
        spark.read.format("lake_cdc").option("path", idx.root).load()
    )
    collapsed = lww_dedup(
        feed.drop("_snapshot_id"),
        key=["term", "doc_id"],
        strategy="argmax",
        order=["_commit_seq", "_offset"],
    ).filter(~F.col("_deleted"))
    cols = ["term", "doc_id", "tf", "doc_seq", "doc_off"]
    a = collapsed.select(*cols)
    b = idx.scan(spark).select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert b.count() > 0
