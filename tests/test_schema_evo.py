"""Schema evolution through the change stream (SURVEY.md §1.3, §5.5):
add / rename / widen applied before the MERGE batch; old snapshots stay
readable; old data files are never rewritten (field-id name mapping)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.merge import apply_batch
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.sources.changelog import CHANGE_SCHEMA
from glad_tiles_pipeline_spark.sources.generator import change_log


def _control(spark, offset, payload: dict):
    row = {
        "offset": offset, "commit_seq": offset, "commit": f"c{offset:012d}",
        "op": "C", "repo": None, "path": None, "lang": None, "content": None,
        "ts": None, "schema_ver": None, "control": json.dumps(payload),
    }
    return spark.createDataFrame([row], CHANGE_SCHEMA)


def test_add_column_mid_stream(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=16)
    ev = change_log(spark, 1000)
    apply_batch(spark, table, ev.filter(F.col("offset") < 990), "b0")
    files_before = {f["path"] for f in table.manifest()["files"]}

    # tiny second batch → most buckets untouched → their files carried forward
    batch2 = ev.filter(F.col("offset") >= 990).unionByName(
        _control(spark, 10_000, {"op": "add_column", "name": "stars", "type": "int"})
    )
    apply_batch(spark, table, batch2, "b1")

    cur = table.scan(spark)
    assert "stars" in cur.columns
    assert cur.filter(F.col("stars").isNotNull()).count() == 0
    # old data files survive unrewritten (metadata-only evolution)
    files_after = {f["path"] for f in table.manifest()["files"]}
    untouched_buckets = {
        f["bucket"] for f in table.manifest()["files"] if f["path"] in files_before
    }
    assert untouched_buckets, "some old files should be carried forward"
    # old snapshot (pre-evolution) still readable, without the new column
    old = table.scan(spark, snapshot_id=1)
    assert "stars" not in old.columns
    assert old.count() > 0


def test_rename_column_keeps_old_files_readable(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    ev = change_log(spark, 1000)
    apply_batch(spark, table, ev.filter(F.col("offset") < 500), "b0")
    langs_before = set(
        r["lang"] for r in table.scan(spark).select("lang").distinct().collect()
    )

    batch2 = ev.filter(F.col("offset") >= 500).unionByName(
        _control(spark, 10_000, {"op": "rename_column", "from": "lang", "to": "language"})
    )
    apply_batch(spark, table, batch2, "b1")

    cur = table.scan(spark)
    assert "language" in cur.columns and "lang" not in cur.columns
    # rows written BEFORE the rename surface under the new name via field-id
    # mapping — including keys untouched by batch 2
    langs_after = set(
        r["language"] for r in cur.select("language").distinct().collect()
    )
    assert langs_before <= langs_after
    # and rows written AFTER the rename keep populating the same field id
    assert cur.filter(F.col("language").isNull()).count() == 0


def test_widen_type(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    ev = change_log(spark, 600)
    b1 = ev.filter(F.col("offset") < 300).unionByName(
        _control(spark, 10_000, {"op": "add_column", "name": "stars", "type": "int"})
    )
    apply_batch(spark, table, b1, "b0")
    assert dict(table.scan(spark).dtypes)["stars"] == "int"

    b2 = ev.filter(F.col("offset") >= 300).unionByName(
        _control(spark, 10_001, {"op": "widen_type", "name": "stars", "type": "bigint"})
    )
    apply_batch(spark, table, b2, "b1")
    assert dict(table.scan(spark).dtypes)["stars"] == "bigint"
    # illegal narrowing rejected
    with pytest.raises(ValueError):
        table.evolve([{"op": "widen_type", "name": "stars", "type": "int"}], "bad")


def test_evolution_is_idempotent_with_batch(spark, tmp_path):
    """Replaying a batch that contains control events must not re-apply the
    schema ops (exactly-once covers metadata too)."""
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    ev = change_log(spark, 300).unionByName(
        _control(spark, 10_000, {"op": "add_column", "name": "stars", "type": "int"})
    )
    apply_batch(spark, table, ev, "b0")
    v = table.manifest()["schema_version"]
    apply_batch(spark, table, ev, "b0")  # replay
    assert table.manifest()["schema_version"] == v


def test_controls_embedded_in_stream_e2e(spark, tmp_path):
    """Schema ops ride the SAME changelog as data events: the planner's
    batched ingest discovers them mid-stream and evolves the table BEFORE
    each affected MERGE; base-column state still equals the replay oracle;
    old snapshots keep the old schema (time travel across an evolution)."""
    import json as _json

    from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
    from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
    from glad_tiles_pipeline_spark.sources.generator import inject_controls

    log = inject_controls(
        change_log(spark, 5000),
        {
            2600: _json.dumps(
                {"op": "add_column", "name": "size_bytes", "type": "bigint",
                 "source": "commit_seq"}
            ),
            4500: _json.dumps({"op": "rename_column", "from": "lang",
                               "to": "language"}),
        },
    )
    d = str(tmp_path / "log")
    log.write.parquet(d)

    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, d, batch_size=1000, merge_mode="mor")

    # final schema carries both evolutions
    names = [f.name for f in table.current_schema().fields]
    assert "size_bytes" in names and "language" in names and "lang" not in names

    # base columns == replay oracle over the DATA events (controls excluded)
    events = spark.read.parquet(d).filter(F.col("control").isNull())
    got = table.scan(spark).select(
        "repo", "path", "commit", F.col("language").alias("lang"),
        "content", "content_sha",
    )
    want = oracle_state_df(spark, events)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # the sourced new column: keys whose winning event merged in a batch at
    # or after the add_column control carry size_bytes == its commit_seq;
    # keys last touched before it keep NULL (schema-on-read, no rewrite)
    with_sys = table.scan(spark, include_system=True).filter(~F.col("_deleted"))
    post = with_sys.filter(F.col("_offset") >= 2000)  # batch containing 2600+
    assert post.filter(
        F.col("size_bytes") != F.col("_commit_seq")
    ).count() == 0
    pre = with_sys.filter(F.col("_offset") < 2000)
    assert pre.filter(F.col("size_bytes").isNotNull()).count() == 0
    assert pre.count() > 0 and post.count() > 0

    # time travel: snapshot before the rename still reads as "lang"
    early = table.scan(spark, snapshot_id=2)
    assert "lang" in early.columns and "language" not in early.columns


def test_drop_column_old_snapshots_readable_both_ways(spark, tmp_path):
    """drop_column (VERDICT r4 "Next #7"): the field leaves the CURRENT
    schema only — old files keep the bytes, new readers project the column
    away, old snapshots still serve it; re-adding the same NAME allocates a
    FRESH field id, so pre-drop bytes stay dead (no resurrection)."""
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=16)
    ev = change_log(spark, 1200)
    apply_batch(spark, table, ev.filter(F.col("offset") < 1190), "b0")
    pre_drop_sid = table.current_snapshot_id()
    assert table.scan(spark).filter(F.col("lang").isNotNull()).count() > 0

    # tiny second batch: most buckets untouched, their b0 files carry over
    batch2 = ev.filter(F.col("offset") >= 1190).unionByName(
        _control(spark, 10_000, {"op": "drop_column", "name": "lang"})
    )
    apply_batch(spark, table, batch2, "b1")

    cur = table.scan(spark)
    assert "lang" not in cur.columns
    assert cur.count() > 0
    # time travel: the pre-drop snapshot still reads the column, populated
    old = table.scan(spark, snapshot_id=pre_drop_sid)
    assert "lang" in old.columns
    assert old.filter(F.col("lang").isNotNull()).count() > 0
    # the drop itself rewrote nothing: some pre-drop files (the buckets the
    # tiny batch2 didn't touch) are still live in the current manifest
    b0_files = {f["path"] for f in table.manifest(pre_drop_sid)["files"]}
    assert b0_files & {f["path"] for f in table.manifest()["files"]}

    # re-add under the same name -> fresh field id -> NULL everywhere,
    # including keys whose only version predates the drop
    table.evolve([{"op": "add_column", "name": "lang", "type": "string"}],
                 batch_id="evo-readd")
    readded = table.scan(spark)
    assert "lang" in readded.columns
    assert readded.filter(F.col("lang").isNotNull()).count() == 0
    ids = {
        f["name"]: f["id"]
        for f in table.manifest()["schemas"][
            str(table.manifest()["schema_version"])
        ]
    }
    old_ids = {
        f["name"]: f["id"]
        for f in table.manifest(pre_drop_sid)["schemas"][
            str(table.manifest(pre_drop_sid)["schema_version"])
        ]
    }
    assert ids["lang"] > max(old_ids.values())  # fresh id, never reused


def test_drop_column_key_fields_refused(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=2)
    apply_batch(spark, table, change_log(spark, 100), "b0")
    with pytest.raises(ValueError, match="upsert identity"):
        table.evolve([{"op": "drop_column", "name": "path"}], batch_id="x")
    with pytest.raises(ValueError, match="no such column"):
        table.evolve([{"op": "drop_column", "name": "nope"}], batch_id="y")


def test_drop_column_in_stream_then_ingest_continues(spark, tmp_path):
    """The control rides the changelog; post-drop batches write WITHOUT the
    column and the final base state (minus the dropped field) still equals
    the replay oracle."""
    import json as _json

    from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
    from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
    from glad_tiles_pipeline_spark.sources.generator import inject_controls

    log = inject_controls(
        change_log(spark, 4000),
        {2100: _json.dumps({"op": "drop_column", "name": "lang"})},
    )
    d = str(tmp_path / "log")
    log.write.parquet(d)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    ingest_changelog(spark, table, d, batch_size=1000, merge_mode="mor")
    assert "lang" not in table.scan(spark).columns

    events = spark.read.parquet(d).filter(F.col("control").isNull())
    got = table.scan(spark).select(
        "repo", "path", "commit", "content", "content_sha"
    )
    want = oracle_state_df(spark, events).select(
        "repo", "path", "commit", "content", "content_sha"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
