"""Declarative CHECK constraints + quarantine (operators/constraints.py, X14).

Contract under test: a constrained ingest applies exactly the passing
rows (table state == unconstrained ingest of the pre-filtered log) and
quarantines exactly the violators with the full list of violated
constraint names; NULL predicate results and control events pass (SQL
CHECK semantics); the quarantine is replay-safe (re-running rewrites,
never appends); the stream twin matches the batch twin; derived sinks
(post_apply) never see a quarantined row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.constraints import (
    read_quarantine,
    split_by_constraints,
)
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log
from glad_tiles_pipeline_spark.streaming.bridge import stream_ingest

N = 4000

# generator paths look like src/dirNN/fileNNNN.py, so ~10% of events hit
# the "forbidden" file-number predicate; the second constraint holds by
# generator construction (deletes carry NULL content) -> never fires
CONSTRAINTS = {
    "no_lucky_paths": "path NOT LIKE '%7.py'",
    "delete_has_no_content": "op <> 'D' OR content IS NULL",
}


def _log(spark, tmp_path, name="log"):
    d = str(tmp_path / name)
    change_log(spark, N).write.parquet(d)
    return d


def test_split_semantics(spark):
    rows = [
        # (offset, op, path, content, control) -> expectation
        (1, "U", "a/ok.py", "x", None),       # passes
        (2, "U", "a/bad7.py", "x", None),     # violates no_lucky_paths
        (3, "D", "a/ok.py", None, None),      # passes (content NULL)
        (4, "U", None, "x", None),            # NULL path -> predicate NULL -> passes
        (5, "U", "b7.py", None, "{}"),        # control event: always passes
    ]
    df = spark.createDataFrame(
        rows, "offset long, op string, path string, content string, control string"
    )
    ok, bad = split_by_constraints(df, CONSTRAINTS)
    assert {r["offset"] for r in ok.collect()} == {1, 3, 4, 5}
    got_bad = {r["offset"]: r["violations"] for r in bad.collect()}
    assert got_bad == {2: ["no_lucky_paths"]}
    # multi-violation rows report every name, sorted
    df2 = spark.createDataFrame(
        [(9, "D", "x7.py", "boom", None)],
        "offset long, op string, path string, content string, control string",
    )
    _, bad2 = split_by_constraints(df2, CONSTRAINTS)
    assert bad2.collect()[0]["violations"] == [
        "delete_has_no_content", "no_lucky_paths",
    ]


def test_constrained_ingest_equals_prefiltered_oracle(spark, tmp_path):
    log_dir = _log(spark, tmp_path)
    qdir = str(tmp_path / "quarantine")
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    results = ingest_changelog(
        spark, table, log_dir, batch_size=1000,
        constraints=CONSTRAINTS, quarantine_dir=qdir,
    )
    events = spark.read.parquet(log_dir)
    ok, bad = split_by_constraints(events, CONSTRAINTS)
    n_bad = bad.count()
    assert n_bad > 0  # the fixture must exercise the quarantine
    assert sum(r["quarantined"] for r in results) == n_bad

    got = table.scan(spark)
    want = oracle_state_df(spark, ok)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # quarantine holds exactly the violators (across batches)
    q = read_quarantine(spark, qdir)
    assert q.count() == n_bad
    assert set(q.select("offset").toPandas()["offset"]) == {
        r["offset"] for r in bad.select("offset").collect()
    }
    # offsets were consumed-and-diverted: the planner reached the end
    assert table.last_committed_offset() == N - 1


def test_quarantine_replay_overwrites_not_appends(spark, tmp_path):
    log_dir = _log(spark, tmp_path)
    qdir = str(tmp_path / "quarantine")
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, log_dir, batch_size=1000,
                     constraints=CONSTRAINTS, quarantine_dir=qdir)
    n1 = read_quarantine(spark, qdir).count()
    # a fresh table replays the same windows -> same quarantine content
    table2 = LakeTable.create(str(tmp_path / "t2"), n_buckets=8)
    ingest_changelog(spark, table2, log_dir, batch_size=1000,
                     constraints=CONSTRAINTS, quarantine_dir=qdir)
    assert read_quarantine(spark, qdir).count() == n1


def test_constraints_require_quarantine_dir(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    with pytest.raises(ValueError, match="quarantine_dir"):
        ingest_changelog(spark, table, str(tmp_path), constraints=CONSTRAINTS)


def test_stream_twin_matches_batch_and_hook_sees_only_passing(spark, tmp_path):
    log_dir = _log(spark, tmp_path)
    qdir = str(tmp_path / "q_stream")
    t_stream = LakeTable.create(str(tmp_path / "ts"), n_buckets=8)
    seen: list[int] = []

    def probe_hook(df, batch_id, offsets):
        ok, bad = split_by_constraints(df, CONSTRAINTS)
        seen.append(bad.count())
        return None

    results = stream_ingest(
        spark, t_stream, log_dir, str(tmp_path / "ckpt"),
        constraints=CONSTRAINTS, check_quarantine_dir=qdir,
        post_apply=probe_hook,
    )
    assert sum(r["check_quarantined"] for r in results) > 0
    assert all(n == 0 for n in seen)  # the hook never saw a violator

    t_batch = LakeTable.create(str(tmp_path / "tb"), n_buckets=8)
    ingest_changelog(spark, t_batch, log_dir, batch_size=N,
                     constraints=CONSTRAINTS,
                     quarantine_dir=str(tmp_path / "q_batch"))
    a, b = t_stream.scan(spark), t_batch.scan(spark)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # both spellings quarantined the same offsets
    qa = set(read_quarantine(spark, qdir).toPandas()["offset"])
    qb = set(
        read_quarantine(spark, str(tmp_path / "q_batch")).toPandas()["offset"]
    )
    assert qa == qb


def test_read_quarantine_empty_dir(spark, tmp_path):
    assert read_quarantine(spark, str(tmp_path / "nope")).count() == 0


def test_window_with_all_events_quarantined_still_advances(spark, tmp_path):
    """If every event in a window violates, the (empty) batch must still
    commit and advance the offset high-water — otherwise the planner
    would re-plan the same window forever."""
    d = str(tmp_path / "log")
    change_log(spark, 200).write.parquet(d)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    results = ingest_changelog(
        spark, table, d, batch_size=50,
        constraints={"nothing_passes": "1 = 0"},
        quarantine_dir=str(tmp_path / "q"),
    )
    assert len(results) == 4  # terminated, four windows
    assert table.last_committed_offset() == 199
    assert table.scan(spark).count() == 0
    assert read_quarantine(spark, str(tmp_path / "q")).count() == 200


def test_requeue_after_relaxing_constraints(spark, tmp_path):
    """Divert -> audit -> requeue: quarantined events re-applied under a
    relaxed rule set land at their ORIGINAL LWW version (keys the stream
    updated since keep the newer value; untouched keys land as they would
    have originally), the audit record is not mutated, the offset
    high-water does not move, and the requeue is idempotent."""
    from glad_tiles_pipeline_spark.operators.constraints import (
        requeue_quarantine,
    )

    log_dir = _log(spark, tmp_path)
    qdir = str(tmp_path / "q")
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, log_dir, batch_size=1000,
                     constraints=CONSTRAINTS, quarantine_dir=qdir)
    hi = table.last_committed_offset()
    n_q = read_quarantine(spark, qdir).count()
    events = spark.read.parquet(log_dir)

    # relax: only files ending 77.py stay forbidden
    relaxed = {"no_very_lucky_paths": "path NOT LIKE '%77.py'"}
    res = requeue_quarantine(spark, table, qdir, constraints=relaxed)
    assert res["requeued"] > 0
    assert res["requeued"] + res["still_quarantined"] == n_q

    # final state == replay of the originally-passing set plus the
    # requeued subset of the violators that pass the relaxed rules
    ok_strict, bad_strict = split_by_constraints(events, CONSTRAINTS)
    requeued_ok, _ = split_by_constraints(bad_strict.drop("violations"), relaxed)
    want = oracle_state_df(spark, ok_strict.unionByName(requeued_ok))
    got = table.scan(spark)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # audit record untouched, high-water unchanged
    assert read_quarantine(spark, qdir).count() == n_q
    assert table.last_committed_offset() == hi

    # idempotent: same rules -> same content-addressed id -> no-op
    res2 = requeue_quarantine(spark, table, qdir, constraints=relaxed)
    assert res2.get("skipped") and res2["requeued"] == 0

    # further relaxation gets a fresh id and applies the rest
    res3 = requeue_quarantine(spark, table, qdir, constraints=None)
    assert res3["requeued"] == n_q  # LWW-idempotent re-apply of the overlap
    want_full = oracle_state_df(spark, events)
    got_full = table.scan(spark)
    assert got_full.exceptAll(want_full).count() == 0
    assert want_full.exceptAll(got_full).count() == 0


def test_requeue_reaches_derived_sinks(spark, tmp_path):
    """Requeued offsets sit BELOW the high-water, so the generic catch-up
    can never deliver them to a derived table — the requeue's post_apply
    is the only path.  Contract: after a requeue with the ingest's hook,
    the derived view equals a recompute over the repaired table; a
    crash between the main apply and the hook is recovered by RE-RUNNING
    the same requeue (main no-ops on its fenced id, the hook applies);
    no sink's offset high-water moves."""
    from pyspark.sql import types as T

    from glad_tiles_pipeline_spark.operators.constraints import (
        requeue_quarantine,
    )
    from glad_tiles_pipeline_spark.operators.matview import (
        create_matview,
        matview_hook,
        read_matview,
    )

    log_dir = _log(spark, tmp_path)
    qdir = str(tmp_path / "q")
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    view = create_matview(str(tmp_path / "mv"),
                          [("n_paths", T.LongType())], n_buckets=4)
    aggs = {"n_paths": F.count("*")}
    hook = matview_hook(spark, table, view, aggs)
    ingest_changelog(spark, table, log_dir, batch_size=1000,
                     constraints=CONSTRAINTS, quarantine_dir=qdir,
                     post_apply=hook)
    view_hi = view.last_committed_offset()

    def _view_matches_recompute():
        want = (table.scan(spark).groupBy(F.col("repo").alias("grp"))
                .agg(F.count("*").alias("n_paths")))
        got = read_matview(spark, view)
        return got.exceptAll(want).count() == 0 \
            and want.exceptAll(got).count() == 0

    # crash window: requeue WITHOUT the hook — table repaired, view stale
    res1 = requeue_quarantine(spark, table, qdir, constraints=None)
    assert res1["requeued"] > 0
    assert not _view_matches_recompute()

    # recovery = re-run the SAME requeue with the hook: main no-ops on
    # its fenced id, the hook delivers; view converges
    res2 = requeue_quarantine(spark, table, qdir, constraints=None,
                              post_apply=hook)
    assert res2.get("skipped") and "post_apply" in res2
    assert _view_matches_recompute()

    # replaying the composed requeue is a no-op on BOTH sinks
    snap = view.current_snapshot_id()
    requeue_quarantine(spark, table, qdir, constraints=None,
                       post_apply=hook)
    assert view.current_snapshot_id() == snap

    # no high-water moved anywhere
    assert view.last_committed_offset() == view_hi
    assert table.last_committed_offset() == view_hi


def test_requeue_does_not_advance_a_lagging_sink(spark, tmp_path):
    """A sink that LAGS the table (crash between sinks, catch-up not yet
    run) has unseen windows above its high-water, and requeued events can
    carry offsets from those windows — folding them into the sink's
    high-water (what ``offsets=None`` would do) makes the generic
    catch-up skip the unseen windows forever.  Contract: the requeue is
    invisible to EVERY resume point it touches (NO_ADVANCE resolves
    per-sink), so requeue-then-catch-up converges to the recompute."""
    from pyspark.sql import types as T

    from glad_tiles_pipeline_spark.operators.constraints import (
        requeue_quarantine,
    )
    from glad_tiles_pipeline_spark.operators.matview import (
        create_matview,
        matview_hook,
        read_matview,
    )
    from glad_tiles_pipeline_spark.streaming.dedup_index import (
        catch_up_derived_index,
    )

    log_dir = _log(spark, tmp_path)
    qdir = str(tmp_path / "q")
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    view = create_matview(str(tmp_path / "mv"),
                          [("n_paths", T.LongType())], n_buckets=4)
    hook = matview_hook(spark, table, view, {"n_paths": F.count("*")})

    # first half: both sinks current
    ingest_changelog(spark, table, log_dir, batch_size=1000, max_batches=2,
                     constraints=CONSTRAINTS, quarantine_dir=qdir,
                     post_apply=hook)
    view_hi = view.last_committed_offset()
    # second half WITHOUT the hook: the view now lags the table
    ingest_changelog(spark, table, log_dir, batch_size=1000,
                     constraints=CONSTRAINTS, quarantine_dir=qdir)
    assert table.last_committed_offset() > view_hi

    # requeue everything with the composed hook: repaired keys reach the
    # view, but its resume point must NOT move — second-half quarantined
    # offsets sit above view_hi, and folding them in would skip the
    # un-delivered windows forever
    res = requeue_quarantine(spark, table, qdir, constraints=None,
                             post_apply=hook)
    assert res["requeued"] > 0
    assert view.last_committed_offset() == view_hi

    # the generic catch-up still sees the missed windows; the view
    # converges to the recompute over the repaired table
    caught = catch_up_derived_index(spark, table, view, log_dir, hook=hook,
                                    constraints=CONSTRAINTS)
    assert caught is not None and not caught.get("skipped")
    want = (table.scan(spark).groupBy(F.col("repo").alias("grp"))
            .agg(F.count("*").alias("n_paths")))
    got = read_matview(spark, view)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_catch_up_applies_the_constraint_split(spark, tmp_path):
    """The catch-up re-reads the RAW changelog, but a constrained ingest
    diverted violators BEFORE main apply and hooks — recovery must apply
    the same split, or a crash-between-sinks catch-up feeds the derived
    sink rows the table never saw (no re-quarantine either: the planner
    persisted the violators under the original window ids before the
    crash could happen)."""
    from glad_tiles_pipeline_spark.operators.incremental import (
        create_signature_index,
    )
    from glad_tiles_pipeline_spark.streaming.dedup_index import (
        catch_up_derived_index,
        signature_index_hook,
    )

    log_dir = _log(spark, tmp_path)
    qdir = str(tmp_path / "q")
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    # worst-case crash window: every ingest window reached main, none
    # reached the index
    ingest_changelog(spark, table, log_dir, batch_size=1000,
                     constraints=CONSTRAINTS, quarantine_dir=qdir)
    n_q = read_quarantine(spark, qdir).count()
    assert n_q > 0

    index = create_signature_index(str(tmp_path / "sig"), n_buckets=4)
    hook = signature_index_hook(spark, index)
    caught = catch_up_derived_index(spark, table, index, log_dir, hook=hook,
                                    constraints=CONSTRAINTS)
    assert caught is not None and not caught.get("skipped")

    # every event for a '%7.py' doc violates no_lucky_paths, so the index
    # must not know those documents at all — and the quarantine record is
    # untouched (the catch-up never re-writes it)
    sigs = index.scan(spark)
    assert sigs.filter(F.col("doc_id").like("%7.py")).count() == 0
    assert sigs.count() > 0
    assert read_quarantine(spark, qdir).count() == n_q
