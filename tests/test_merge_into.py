"""Generic ``MERGE INTO`` (operators/merge_into.py) — the declarative
row-level merge compiled onto the CDC apply path.

Contract under test: Delta-parity clause semantics (conditional UPDATE /
DELETE / INSERT, delete-before-update precedence, untouched-when-no-
clause-fires, partial SET keeps target values, ambiguous source refused),
engine integration (idempotent replay, LWW interplay with later CDC
batches, identical final state across cow / mor / mor_dv, derived sha
recomputed when content changes), and the scale gate (bucket-pruned live
read)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from glad_tiles_pipeline_spark.operators.merge import apply_batch
from glad_tiles_pipeline_spark.operators.merge_into import max_commit_seq, merge_into
from glad_tiles_pipeline_spark.plans.lake import LakeTable

DOC_SCHEMA = T.StructType(
    [
        T.StructField("corpus", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType()),
        T.StructField("commit_seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("control", T.StringType()),
    ]
)

SEED = [
    ("c", "a", "en", 10),
    ("c", "b", "de", 20),
    ("c", "c", "en", 30),
    ("c", "d", "fr", 40),
    ("c", "e", "en", 50),
    ("c", "f", "de", 60),
]


def _seed_table(spark, root, merge_mode="cow", n_buckets=8) -> LakeTable:
    table = LakeTable.create(str(root), schema=DOC_SCHEMA, n_buckets=n_buckets)
    ev = spark.createDataFrame(
        [Row(offset=i, commit_seq=5, op="U", repo=c, path=d, lang=lg,
             n_chars=n, control=None)
         for i, (c, d, lg, n) in enumerate(SEED)],
        EVENT_SCHEMA,
    )
    apply_batch(spark, table, ev, "seed", merge_mode=merge_mode,
                use_arrow_udfs=False)
    return table


def _source(spark):
    # a: matched, update fires.  b: matched, delete fires.  c: matched,
    # neither condition holds -> untouched.  g/h: inserts (h filtered out
    # by the insert condition).
    return spark.createDataFrame(
        [
            Row(corpus="c", doc_id="a", lang="EN ", n_chars=11),
            Row(corpus="c", doc_id="b", lang="de", n_chars=-1),
            Row(corpus="c", doc_id="c", lang="xx", n_chars=0),
            Row(corpus="c", doc_id="g", lang="pt", n_chars=70),
            Row(corpus="c", doc_id="h", lang="pt", n_chars=-5),
        ],
        DOC_SCHEMA,
    )


def _merge(spark, table, merge_mode="cow", batch_id="m1"):
    return merge_into(
        spark, table, _source(spark), batch_id,
        when_matched_update={"lang": "trim(lower(s.lang))",
                             "n_chars": "t.n_chars + s.n_chars"},
        matched_condition="s.n_chars > 0",
        when_matched_delete=True,
        delete_condition="s.n_chars < 0",
        when_not_matched_insert={"lang": "s.lang", "n_chars": "s.n_chars"},
        insert_condition="s.n_chars > 0",
        merge_mode=merge_mode,
    )


EXPECTED = {
    ("c", "a"): ("en", 21),   # updated: lang normalized expr, n_chars t+s
    # ("c","b") deleted
    ("c", "c"): ("en", 30),   # matched, no clause fired -> untouched
    ("c", "d"): ("fr", 40),
    ("c", "e"): ("en", 50),
    ("c", "f"): ("de", 60),
    ("c", "g"): ("pt", 70),   # inserted
    # ("c","h") insert condition false
}


def _state(spark, table) -> dict:
    rows = table.scan(spark).collect()
    return {(r["corpus"], r["doc_id"]): (r["lang"], r["n_chars"]) for r in rows}


def test_clause_semantics_cow(spark, tmp_path):
    table = _seed_table(spark, tmp_path / "t")
    out = _merge(spark, table)
    assert _state(spark, table) == EXPECTED
    assert out["merge_commit_seq"] == 6  # seed wrote commit_seq 5
    assert not out.get("skipped")


@pytest.mark.parametrize("mode", ["mor", "mor_dv"])
def test_modes_agree(spark, tmp_path, mode):
    table = _seed_table(spark, tmp_path / mode, merge_mode=mode)
    _merge(spark, table, merge_mode=mode)
    assert _state(spark, table) == EXPECTED


def test_idempotent_replay(spark, tmp_path):
    table = _seed_table(spark, tmp_path / "t")
    _merge(spark, table)
    snap = table.current_snapshot_id()
    out = _merge(spark, table, batch_id="m1")  # same id -> fenced no-op
    assert out["skipped"] and table.current_snapshot_id() == snap
    assert _state(spark, table) == EXPECTED


def test_lww_interplay_with_cdc_batches(spark, tmp_path):
    """A MERGE wins over every stored row, then loses to a LATER CDC
    batch — the merge is one version in the table's normal LWW order,
    not a side channel."""
    table = _seed_table(spark, tmp_path / "t")
    _merge(spark, table)
    mseq = max_commit_seq(spark, table)
    # stale CDC event (commit_seq below the merge's) must NOT resurrect b
    stale = spark.createDataFrame(
        [Row(offset=100, commit_seq=mseq - 1, op="U", repo="c", path="b",
             lang="it", n_chars=99, control=None)], EVENT_SCHEMA)
    apply_batch(spark, table, stale, "stale", use_arrow_udfs=False)
    assert ("c", "b") not in _state(spark, table)
    # newer CDC event beats the merged row
    newer = spark.createDataFrame(
        [Row(offset=101, commit_seq=mseq + 1, op="U", repo="c", path="a",
             lang="it", n_chars=99, control=None)], EVENT_SCHEMA)
    apply_batch(spark, table, newer, "newer", use_arrow_udfs=False)
    assert _state(spark, table)[("c", "a")] == ("it", 99)


def test_ambiguous_source_refused(spark, tmp_path):
    table = _seed_table(spark, tmp_path / "t")
    dup = _source(spark).unionByName(_source(spark).filter(F.col("doc_id") == "a"))
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_into(spark, table, dup, "dup",
                   when_matched_update={"n_chars": "s.n_chars"})


def test_validation_errors(spark, tmp_path):
    table = _seed_table(spark, tmp_path / "t")
    src = _source(spark)
    with pytest.raises(ValueError, match="no WHEN clause"):
        merge_into(spark, table, src, "x")
    with pytest.raises(ValueError, match="key column"):
        merge_into(spark, table, src, "x",
                   when_matched_update={"doc_id": "s.doc_id"})
    with pytest.raises(ValueError, match="no such column"):
        merge_into(spark, table, src, "x",
                   when_matched_update={"nope": "1"})
    with pytest.raises(ValueError, match="missing key column"):
        merge_into(spark, table, src.drop("doc_id"), "x",
                   when_matched_update={"n_chars": "1"})


def test_no_clause_fires_leaves_state(spark, tmp_path):
    table = _seed_table(spark, tmp_path / "t")
    before = _state(spark, table)
    out = merge_into(
        spark, table, _source(spark), "noop",
        when_matched_update={"n_chars": "s.n_chars"},
        matched_condition="s.n_chars > 1000000",
        merge_mode="mor",
    )
    assert _state(spark, table) == before
    assert out["metrics"]["winners"] == 0


def test_bucket_pruned_live_read(spark, tmp_path):
    """Scale gate: a merge whose source touches a strict subset of
    buckets reads only those buckets' files — the classification join's
    scan never opens the rest of the table."""
    table = _seed_table(spark, tmp_path / "t", n_buckets=8)
    one = _source(spark).filter(F.col("doc_id") == "a")
    out = merge_into(spark, table, one, "one",
                     when_matched_update={"n_chars": "s.n_chars"})
    assert 0 < out["buckets_read"] < 8
    assert _state(spark, table)[("c", "a")] == ("en", 11)
    # the pruned read is sound: untouched keys intact
    assert _state(spark, table)[("c", "f")] == ("de", 60)


def test_content_sha_recomputed_on_updated_content(spark, tmp_path):
    """Derived-column invariant: a MERGE that rewrites ``content`` must
    not freeze the stored sha — the event carries sha NULL and the apply
    path recomputes it post-dedup."""
    import hashlib

    table = LakeTable.create(str(tmp_path / "cdc"), n_buckets=4)
    ev = spark.createDataFrame(
        [Row(offset=0, commit_seq=1, op="U", repo="r", path="f.py",
             lang="py", content="old body", control=None)],
        "offset long, commit_seq long, op string, repo string, path string,"
        " lang string, content string, control string",
    )
    apply_batch(spark, table, ev, "seed", use_arrow_udfs=False)
    src = spark.createDataFrame([Row(repo="r", path="f.py", body="new body")])
    with pytest.raises(ValueError, match="engine-derived"):
        merge_into(spark, table, src, "bad",
                   when_matched_update={"content_sha": "'x'"})
    merge_into(spark, table, src, "m",
               when_matched_update={"content": "s.body"},
               use_arrow_udfs=False)
    row = table.scan(spark).collect()[0]
    assert row["content"] == "new body"
    assert row["content_sha"] == hashlib.sha256(b"new body").hexdigest()


def test_merge_conflict_retry_recompiles_against_new_head(
    spark, tmp_path, monkeypatch
):
    """Serializable OCC for MERGE: clause arithmetic reads target values
    (t.n_chars), so a retry after a lost CAS must recompile against the
    interleaved writer's commit, not re-apply the stale verdicts."""
    from pyspark.sql import Row

    from glad_tiles_pipeline_spark.operators import merge as merge_mod
    from glad_tiles_pipeline_spark.plans.lake import CommitConflict

    table = _seed_table(spark, tmp_path / "t", merge_mode="mor")
    src = spark.createDataFrame([("c", "a", "en", 1)], DOC_SCHEMA)

    real_apply = merge_mod.apply_batch
    state = {"interleaved": False, "conflicts": 0}

    def racing_apply(spark_, table_, events, batch_id, **kw):
        if batch_id.startswith("m-") and not state["interleaved"]:
            state["interleaved"] = True
            # a concurrent CDC batch re-states the target row: n_chars 100
            seq = max_commit_seq(spark, LakeTable(str(tmp_path / "t")))
            ev = spark.createDataFrame(
                [Row(offset=100, commit_seq=seq + 5, op="U", repo="c",
                     path="a", lang="en", n_chars=100, control=None)],
                EVENT_SCHEMA,
            )
            real_apply(spark, LakeTable(str(tmp_path / "t")), ev,
                       "interleaved-b100", merge_mode="mor",
                       offsets={"lo": 100, "hi": 100})
            state["conflicts"] += 1
            raise CommitConflict("lost the race to the interleaved batch")
        return real_apply(spark_, table_, events, batch_id, **kw)

    monkeypatch.setattr(merge_mod, "apply_batch", racing_apply)

    with pytest.raises(CommitConflict):
        merge_into(
            spark, table, src, "m-noretry",
            when_matched_update={"n_chars": "t.n_chars + s.n_chars"},
            merge_mode="mor",
        )
    assert state["conflicts"] == 1
    state["interleaved"] = False

    out = merge_into(
        spark, LakeTable(str(tmp_path / "t")), src, "m-retry",
        when_matched_update={"n_chars": "t.n_chars + s.n_chars"},
        merge_mode="mor", conflict_retries=2,
    )
    assert not out.get("skipped")
    assert state["conflicts"] == 2
    got = {
        (r["doc_id"]): r["n_chars"]
        for r in LakeTable(str(tmp_path / "t")).scan(spark).collect()
    }
    # serializable order: interleaved (n_chars=100) THEN merge (+1) — a
    # blind re-apply of the stale verdict would leave 11
    assert got["a"] == 101
