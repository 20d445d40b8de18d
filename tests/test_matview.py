"""Incrementally-maintained materialized views (operators/matview.py, X13).

Contract under test: after every maintenance step the view EQUALS a full
``GROUP BY`` recompute over the table's live state (the definitional
answer), across multi-batch ingest with late events and deletes, a
delete-everything batch (group tombstone), idempotent replay, the batch
planner's crash-between-sinks window (closed by the generic catch-up),
and the recompute read is pruned to the touched groups' files.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from glad_tiles_pipeline_spark.operators.matview import (
    MV_SENTINEL,
    create_matview,
    matview_hook,
    mv_refresh_events,
    read_matview,
)
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log
from glad_tiles_pipeline_spark.streaming.dedup_index import catch_up_derived_index

N = 6000  # late_max_lag=5000 -> late events cross batch windows

AGG_FIELDS = [
    ("n_paths", T.LongType()),
    ("total_chars", T.LongType()),
    ("n_langs", T.LongType()),
]


def _aggs():
    return {
        "n_paths": F.count("*"),
        "total_chars": F.sum(F.length("content")),
        "n_langs": F.countDistinct("lang"),
    }


def _recompute(spark, table):
    return (
        table.scan(spark)
        .groupBy(F.col("repo").alias("grp"))
        .agg(*[c.alias(n) for n, c in _aggs().items()])
    )


def _assert_view_equals_recompute(spark, table, view):
    got = read_matview(spark, view)
    want = _recompute(spark, table)
    extra = got.exceptAll(want).count()
    missing = want.exceptAll(got).count()
    assert (extra, missing) == (0, 0), f"extra={extra} missing={missing}"


def _mk(spark, tmp_path, log_events=N):
    log_dir = str(tmp_path / "log")
    change_log(spark, log_events, n_repos=12, paths_per_repo=50).write.parquet(
        log_dir
    )
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    view = create_matview(str(tmp_path / "mv"), AGG_FIELDS, n_buckets=4)
    return log_dir, table, view


def test_view_tracks_multibatch_ingest(spark, tmp_path):
    log_dir, table, view = _mk(spark, tmp_path)
    hook = matview_hook(spark, table, view, _aggs())
    ingest_changelog(spark, table, log_dir, batch_size=1500, post_apply=hook)
    _assert_view_equals_recompute(spark, table, view)
    # the view's own offset high-water tracked the table's
    assert view.last_committed_offset() == table.last_committed_offset()


def test_group_deleted_to_zero_is_tombstoned(spark, tmp_path):
    log_dir, table, view = _mk(spark, tmp_path)
    hook = matview_hook(spark, table, view, _aggs())
    ingest_changelog(spark, table, log_dir, batch_size=N, post_apply=hook)
    victim = read_matview(spark, view).orderBy("grp").first()["grp"]
    # delete every live path of one repo in a follow-up batch
    hi = table.last_committed_offset()
    from pyspark.sql import Window

    keys = table.scan(spark, repos=[victim]).select("repo", "path")
    ev = keys.select(
        (F.lit(hi) + F.row_number().over(Window.orderBy("path"))).alias("offset"),
        F.lit(10**9).cast("long").alias("commit_seq"),
        F.lit("D").alias("op"),
        "repo",
        "path",
        F.lit(None).cast("string").alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("content"),
        F.lit(None).cast("string").alias("control"),
    )
    n_dead = ev.count()
    from glad_tiles_pipeline_spark.operators.merge import apply_batch

    offsets = {"lo": hi + 1, "hi": hi + n_dead}
    apply_batch(spark, table, ev, "kill-repo", offsets=offsets)
    hook(ev, "kill-repo", offsets)
    got = read_matview(spark, view)
    assert got.filter(F.col("grp") == victim).count() == 0
    _assert_view_equals_recompute(spark, table, view)


def test_hook_replay_is_noop(spark, tmp_path):
    log_dir, table, view = _mk(spark, tmp_path, log_events=2000)
    hook = matview_hook(spark, table, view, _aggs())
    events = spark.read.parquet(log_dir)
    from glad_tiles_pipeline_spark.operators.merge import apply_batch

    offsets = {"lo": 0, "hi": 1999}
    apply_batch(spark, table, events, "b0", offsets=offsets)
    r1 = hook(events, "b0", offsets)
    snap = view.current_snapshot_id()
    r2 = hook(events, "b0", offsets)
    assert r2["skipped"] and view.current_snapshot_id() == snap
    assert r1["snapshot_id"] == snap
    _assert_view_equals_recompute(spark, table, view)


def test_crash_between_sinks_converges_via_generic_catch_up(spark, tmp_path):
    """Batch planner crash after the main MERGE, before the view hook:
    the view's window is closed by catch_up_derived_index from the view's
    OWN high-water — the hook-generic contract (streaming/dedup_index.py)."""
    log_dir, table, view = _mk(spark, tmp_path)
    hook = matview_hook(spark, table, view, _aggs())
    # first half maintained, second half "crashes" before the hook
    ingest_changelog(spark, table, log_dir, batch_size=1500, post_apply=hook,
                     max_batches=2)
    ingest_changelog(spark, table, log_dir, batch_size=1500)  # no hook
    assert view.last_committed_offset() < table.last_committed_offset()
    res = catch_up_derived_index(spark, table, view, log_dir, hook=hook)
    assert res is not None
    _assert_view_equals_recompute(spark, table, view)
    # now current: catch-up is a no-op
    assert catch_up_derived_index(spark, table, view, log_dir, hook=hook) is None


def test_control_only_window_advances_view_highwater(spark, tmp_path):
    """A window with no data events still commits an empty view batch —
    otherwise the generic catch-up would re-feed it forever."""
    _, table, view = _mk(spark, tmp_path, log_events=100)
    hook = matview_hook(spark, table, view, _aggs())
    schema = T.StructType(
        [
            T.StructField("offset", T.LongType()),
            T.StructField("commit_seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content", T.StringType()),
            T.StructField("control", T.StringType()),
        ]
    )
    empty = spark.createDataFrame([], schema)
    res = hook(empty, "b-empty", {"lo": 0, "hi": 41})
    assert not res.get("skipped")
    assert view.last_committed_offset() == 41
    assert read_matview(spark, view).count() == 0


def test_refresh_read_is_pruned_to_touched_groups(spark, tmp_path):
    """IO gate: the recompute behind a one-group refresh opens only the
    files whose key-1 stats can contain that repo — O(touched data) after
    key-clustered compaction, never the corpus."""
    from glad_tiles_pipeline_spark.operators.merge import compact

    log_dir, table, view = _mk(spark, tmp_path)
    ingest_changelog(spark, table, log_dir, batch_size=500)
    compact(spark, table, batch_id="cluster", cluster_by_key=True)
    all_files = set(table.scan(spark).inputFiles())
    g = table.scan(spark).select("repo").orderBy("repo").first()["repo"]
    ev = mv_refresh_events(spark, table, [g], _aggs(), version=10**6)
    opened = {p for p in ev.inputFiles()}
    assert opened  # the scan is file-backed
    assert opened < all_files, (len(opened), len(all_files))
    # and the refresh itself lands the right row
    want = (
        table.scan(spark, repos=[g])
        .groupBy("repo")
        .agg(*[c.alias(n) for n, c in _aggs().items()])
        .collect()[0]
    )
    got = {r["op"]: r for r in ev.collect()}
    assert set(got) == {"U"}
    assert got["U"]["path"] == MV_SENTINEL
    assert got["U"]["n_paths"] == want["n_paths"]
    assert got["U"]["total_chars"] == want["total_chars"]


def test_streaming_ingest_maintains_view_and_respects_constraints(
    spark, tmp_path
):
    """X13 composes with the T6 bridge like the other derived sinks: one
    stream MERGEs each micro-batch into the table AND refreshes the view,
    both exactly-once; with X14 constraints active, quarantined rows reach
    NEITHER — the view recomputes from a table state that never saw them."""
    from glad_tiles_pipeline_spark.streaming.bridge import stream_ingest

    log_dir, table, view = _mk(spark, tmp_path)
    hook = matview_hook(spark, table, view, _aggs())
    constraints = {"no_lucky_paths": "path NOT LIKE '%7.py'"}
    stream_ingest(
        spark, table, log_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, post_apply=hook,
        constraints=constraints,
        check_quarantine_dir=str(tmp_path / "q"),
    )
    _assert_view_equals_recompute(spark, table, view)
    # and the table state really excludes the violators
    assert table.scan(spark).filter(F.col("path").like("%7.py")).count() == 0


def test_out_of_order_windows_view_reflects_latest_recompute(spark, tmp_path):
    """Regression: a file-source stream can deliver micro-batches out of
    OFFSET order.  When the later-APPLIED window carries the LOWER
    offsets (a late-listed file), its recompute is still the newest
    truth; a refresh stamped with the window's ``hi`` would lose LWW to
    the earlier window's higher stamp and freeze the view stale.  The
    fix versions refreshes by the view's own monotone commit counter, so
    application order — the order recomputes actually observe the table
    — decides."""
    from glad_tiles_pipeline_spark.operators.matview import refresh_matview
    from glad_tiles_pipeline_spark.operators.merge import apply_batch

    log_dir, table, view = _mk(spark, tmp_path, log_events=3000)
    log = spark.read.parquet(log_dir)
    cut = 1500
    hi_win = log.filter(F.col("offset") >= cut)  # delivered first
    lo_win = log.filter(F.col("offset") < cut)  # delivered second (late)

    def _touched(ev):
        return [
            r["repo"]
            for r in ev.filter(F.col("control").isNull())
            .select("repo").distinct().collect()
        ]

    apply_batch(spark, table, hi_win, "b-hi", offsets={"lo": cut, "hi": 2999})
    refresh_matview(
        spark, table, view, _touched(hi_win), _aggs(),
        batch_id="mv-b-hi", offsets={"lo": cut, "hi": 2999},
    )
    apply_batch(spark, table, lo_win, "b-lo", offsets={"lo": 0, "hi": cut - 1})
    refresh_matview(
        spark, table, view, _touched(lo_win), _aggs(),
        batch_id="mv-b-lo", offsets={"lo": 0, "hi": cut - 1},
    )
    _assert_view_equals_recompute(spark, table, view)
