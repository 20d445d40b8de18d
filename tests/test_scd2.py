"""SCD Type 2 history materialization (operators/scd2.py, X15).

Contract under test: after every maintenance step the history EQUALS the
definitional ``scd2_state`` recompute over every event seen so far
(late events split windows in place, deletes close them), replays and
wider catch-up windows emit ZERO change events (changed-only upserts),
the crash-between-sinks window closes via the generic catch-up, the
point-in-time read at the final LWW instant equals the MAIN table's live
state, and the refresh read is pruned to the touched repos' files.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from glad_tiles_pipeline_spark.operators.scd2 import (
    create_scd2_history,
    read_scd2,
    refresh_scd2,
    scd2_as_of,
    scd2_hook,
    scd2_refresh_events,
    scd2_state,
)
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log
from glad_tiles_pipeline_spark.streaming.dedup_index import catch_up_derived_index

N = 4000  # late_max_lag=5000 -> late events cross batch windows

PAYLOAD = ["commit", "lang", "content"]
PAYLOAD_FIELDS = [
    ("commit", T.StringType()),
    ("lang", T.StringType()),
    ("content", T.StringType()),
]

EV_SCHEMA = T.StructType(
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

OUT_COLS = [
    "repo", "rpath", "v_seq", "v_off", *PAYLOAD,
    "valid_to_seq", "valid_to_off", "is_current",
]


def _mk(spark, tmp_path, log_events=N):
    log_dir = str(tmp_path / "log")
    change_log(spark, log_events, n_repos=10, paths_per_repo=40).write.parquet(
        log_dir
    )
    history = create_scd2_history(str(tmp_path / "hist"), PAYLOAD_FIELDS,
                                  n_buckets=8)
    return log_dir, history


def _assert_history_equals_definitional(spark, history, events):
    got = read_scd2(spark, history).select(*OUT_COLS)
    want = scd2_state(events, PAYLOAD).select(*OUT_COLS)
    extra = got.exceptAll(want).count()
    missing = want.exceptAll(got).count()
    assert (extra, missing) == (0, 0), f"extra={extra} missing={missing}"


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_scd2_state_definitional(spark):
    """Hand-computed fixture: two versions then a delete for key a, one
    current version for key b, a delete closing by LWW order not arrival
    order."""
    ev = _ev(spark, [
        (1, 1, "U", "r", "a", "c1", "py", "v1", None),
        (5, 2, "U", "r", "a", "c2", "py", "v2", None),
        (9, 3, "D", "r", "a", None, None, None, None),
        (2, 1, "U", "r", "b", "c9", "go", "w1", None),
    ])
    rows = {(r["rpath"], r["v_seq"]): r
            for r in scd2_state(ev, PAYLOAD).collect()}
    assert set(rows) == {("a", 1), ("a", 2), ("b", 1)}
    a1, a2, b1 = rows[("a", 1)], rows[("a", 2)], rows[("b", 1)]
    assert (a1["valid_to_seq"], a1["valid_to_off"], a1["is_current"]) == (2, 5, False)
    # v2 is closed BY THE DELETE, not current
    assert (a2["valid_to_seq"], a2["valid_to_off"], a2["is_current"]) == (3, 9, False)
    assert (b1["valid_to_seq"], b1["is_current"]) == (None, True)
    assert a2["content"] == "v2"


def test_late_event_splits_window(spark, tmp_path):
    """A mid-timeline (seq) arrival lands in its ordinal slot: it closes
    its predecessor and is closed by its successor — recompute, not
    patching."""
    history = create_scd2_history(str(tmp_path / "h"), PAYLOAD_FIELDS,
                                  n_buckets=4)
    b1 = _ev(spark, [
        (1, 1, "U", "r", "a", "c1", "py", "v1", None),
        (2, 5, "U", "r", "a", "c5", "py", "v5", None),
    ])
    refresh_scd2(spark, history, b1, PAYLOAD, "b1", offsets={"lo": 1, "hi": 2})
    late = _ev(spark, [(3, 3, "U", "r", "a", "c3", "py", "v3", None)])
    refresh_scd2(spark, history, late, PAYLOAD, "b2", offsets={"lo": 3, "hi": 3})
    rows = {r["v_seq"]: r for r in read_scd2(spark, history).collect()}
    assert (rows[1]["valid_to_seq"], rows[1]["valid_to_off"]) == (3, 3)
    assert (rows[3]["valid_to_seq"], rows[3]["valid_to_off"]) == (5, 2)
    assert rows[5]["is_current"] and rows[5]["valid_to_seq"] is None
    _assert_history_equals_definitional(spark, history, b1.unionByName(late))


def test_history_tracks_multibatch_ingest(spark, tmp_path):
    """The post_apply hook keeps the history ≡ definitional recompute
    across a real multi-batch ingest with late events and deletes, and
    the history's offset high-water tracks the table's."""
    log_dir, history = _mk(spark, tmp_path)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    hook = scd2_hook(spark, history, PAYLOAD)
    ingest_changelog(spark, table, log_dir, batch_size=1000, post_apply=hook)
    _assert_history_equals_definitional(
        spark, history, spark.read.parquet(log_dir)
    )
    assert history.last_committed_offset() == table.last_committed_offset()


def test_wider_replay_window_emits_zero_events(spark, tmp_path):
    """Idempotence beyond batch-id fencing: a catch-up window that
    re-feeds already-folded events recomputes identical windows, so the
    changed-only filter emits ZERO events (the commit still advances the
    high-water)."""
    log_dir, history = _mk(spark, tmp_path, log_events=1500)
    events = spark.read.parquet(log_dir)
    refresh_scd2(spark, history, events, PAYLOAD, "b0",
                 offsets={"lo": 0, "hi": 1499})
    ev = scd2_refresh_events(spark, history, events, PAYLOAD, version=10**6)
    assert ev.count() == 0
    # and a replayed refresh under a NEW id leaves the state unchanged
    before = read_scd2(spark, history).count()
    refresh_scd2(spark, history, events, PAYLOAD, "b0-again",
                 offsets={"lo": 0, "hi": 1499})
    assert read_scd2(spark, history).count() == before
    _assert_history_equals_definitional(spark, history, events)


def test_as_of_final_instant_equals_main_table(spark, tmp_path):
    """Point-in-time read at the final LWW instant ≡ the main table's
    live LWW state — the history and the engine agree on who won."""
    log_dir, history = _mk(spark, tmp_path)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    hook = scd2_hook(spark, history, PAYLOAD)
    ingest_changelog(spark, table, log_dir, batch_size=1000, post_apply=hook)
    seq = spark.read.parquet(log_dir).agg(F.max("commit_seq")).collect()[0][0]
    got = scd2_as_of(spark, history, int(seq)).select(
        "repo", F.col("rpath").alias("path"), "commit", "content"
    )
    want = table.scan(spark).select("repo", "path", "commit", "content")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_as_of_mid_instant_equals_prefix_replay(spark, tmp_path):
    """As-of at an interior instant ≡ the main engine replaying only the
    events at or before that instant."""
    log_dir, history = _mk(spark, tmp_path, log_events=2000)
    events = spark.read.parquet(log_dir)
    refresh_scd2(spark, history, events, PAYLOAD, "all",
                 offsets={"lo": 0, "hi": 1999})
    mid = 900
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    prefix = events.filter(F.col("commit_seq") <= mid)
    from glad_tiles_pipeline_spark.operators.merge import apply_batch

    apply_batch(spark, table, prefix, "prefix")
    got = scd2_as_of(spark, history, mid).select(
        "repo", F.col("rpath").alias("path"), "commit", "content"
    )
    want = table.scan(spark).select("repo", "path", "commit", "content")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_crash_between_sinks_converges_via_generic_catch_up(spark, tmp_path):
    log_dir, history = _mk(spark, tmp_path)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    hook = scd2_hook(spark, history, PAYLOAD)
    ingest_changelog(spark, table, log_dir, batch_size=1000, post_apply=hook,
                     max_batches=2)
    ingest_changelog(spark, table, log_dir, batch_size=1000)  # no hook
    assert history.last_committed_offset() < table.last_committed_offset()
    res = catch_up_derived_index(spark, table, history, log_dir, hook=hook)
    assert res is not None
    _assert_history_equals_definitional(
        spark, history, spark.read.parquet(log_dir)
    )
    assert catch_up_derived_index(spark, table, history, log_dir,
                                  hook=hook) is None


def test_refresh_read_is_pruned_to_touched_repos(spark, tmp_path):
    """IO gate: a refresh touching one repo reads only the history files
    whose key-1 stats can contain it — O(touched timeline), never the
    corpus."""
    from glad_tiles_pipeline_spark.operators.merge import compact

    log_dir, history = _mk(spark, tmp_path)
    events = spark.read.parquet(log_dir)
    refresh_scd2(spark, history, events, PAYLOAD, "seed",
                 offsets={"lo": 0, "hi": N - 1})
    compact(spark, history, batch_id="cluster", cluster_by_key=True)
    all_files = set(history.scan(spark).inputFiles())
    repo = history.scan(spark).select("repo").orderBy("repo").first()["repo"]
    batch = _ev(spark, [
        (10**9, 10**9, "U", repo, "000001.py", "cx", "py", "fresh", None),
    ])
    ev = scd2_refresh_events(spark, history, batch, PAYLOAD, version=10**6)
    opened = set(ev.inputFiles())
    assert opened  # file-backed
    assert opened < all_files, (len(opened), len(all_files))
    # and the refresh emits the new version as current
    rows = [r for r in ev.collect() if r["v_seq"] == 10**9]
    assert len(rows) == 1 and rows[0]["is_current"]


def test_refresh_plan_shape(spark, tmp_path):
    """Plan gate: the refresh joins are all hash joins (no cartesian /
    nested-loop anywhere), and with the pin both the union leg and the
    changed-only leg read the SAME persisted stored frame — one pruned
    history materialization per refresh, not two."""
    log_dir, history = _mk(spark, tmp_path, log_events=2000)
    events = spark.read.parquet(log_dir)
    refresh_scd2(spark, history, events, PAYLOAD, "b0",
                 offsets={"lo": 0, "hi": 1999})
    pin = []
    ev = scd2_refresh_events(spark, history, events, PAYLOAD, version=10**6,
                             _pin=pin)
    plan = ev._jdf.queryExecution().executedPlan().toString()
    try:
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert len(pin) == 1
        # every stored-side subtree (suffix, boundary + its argmax probe,
        # changed-only old) reads the ONE persisted frame — a single
        # pruned history materialization per refresh
        assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
    finally:
        for df in pin:
            df.unpersist()


def test_delete_marker_survives_replay(spark, tmp_path):
    """The stored D row keeps the predecessor closed when a later window
    re-feeds only the predecessor's event (at-least-once catch-up)."""
    history = create_scd2_history(str(tmp_path / "h"), PAYLOAD_FIELDS,
                                  n_buckets=4)
    b1 = _ev(spark, [(1, 1, "U", "r", "a", "c1", "py", "v1", None)])
    b2 = _ev(spark, [(2, 2, "D", "r", "a", None, None, None, None)])
    refresh_scd2(spark, history, b1, PAYLOAD, "b1", offsets={"lo": 1, "hi": 1})
    refresh_scd2(spark, history, b2, PAYLOAD, "b2", offsets={"lo": 2, "hi": 2})
    # replay the U alone under a new id: the delete must keep winning
    refresh_scd2(spark, history, b1, PAYLOAD, "b1-replay",
                 offsets={"lo": 1, "hi": 2})
    rows = read_scd2(spark, history).collect()
    assert len(rows) == 1
    assert not rows[0]["is_current"]
    assert (rows[0]["valid_to_seq"], rows[0]["valid_to_off"]) == (2, 2)
    assert scd2_as_of(spark, history, 10).count() == 0


def test_streaming_ingest_maintains_history(spark, tmp_path):
    """X15 composes with the T6 bridge like the other derived sinks: one
    stream, table + history, both exactly-once."""
    from glad_tiles_pipeline_spark.streaming.bridge import stream_ingest

    log_dir, history = _mk(spark, tmp_path)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    hook = scd2_hook(spark, history, PAYLOAD)
    stream_ingest(
        spark, table, log_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=4, post_apply=hook,
    )
    _assert_history_equals_definitional(
        spark, history, spark.read.parquet(log_dir)
    )
