"""Incremental inverted text index (operators/textindex.py).

Contract under test: the index answers term search EQUAL to re-tokenizing
the live corpus (the definitional recompute), across updates that change
a document's token set (dropped terms retire via the version sentinel,
without the write path knowing the old tokens), deletes, and replay;
GC removes version-dead postings without changing any answer; and the
read side is pruned — a term search opens only the stats-pruned posting
files, never the whole index."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.merge import compact
from glad_tiles_pipeline_spark.operators.textindex import (
    DOC_SENTINEL,
    TOKEN_RE,
    create_token_index,
    gc_token_index,
    search_terms,
    update_token_index,
)

DOCS_V1 = [
    (1, "spark merge batch spark"),
    (2, "window scan filter"),
    (3, "merge merge hash"),
    (4, "vector spark table"),
]
# doc 1 re-ingested with a DIFFERENT token set: 'spark' tf changes,
# 'merge'/'batch' dropped, 'join' added.  doc 5 is new.  doc 2 deleted.
DOCS_V2 = [
    (1, "spark join join"),
    (5, "batch filter batch"),
]


def _expected(live_docs: dict, terms: set) -> set:
    out = set()
    for did, text in live_docs.items():
        toks = text.split()
        for t in set(toks):
            if t in terms:
                out.add((t, did, toks.count(t)))
    return out


def _search(spark, idx, terms):
    return {
        (r["term"], r["doc_id"], r["tf"])
        for r in search_terms(spark, idx, list(terms)).collect()
    }


def _build(spark, tmp_path):
    idx = create_token_index(str(tmp_path / "tok"), n_buckets=8)
    v1 = spark.createDataFrame(DOCS_V1, ["doc_id", "text"])
    update_token_index(spark, idx, v1, "b1", 1)
    v2 = spark.createDataFrame(DOCS_V2, ["doc_id", "text"])
    dels = spark.createDataFrame([Row(doc_id=2)])
    update_token_index(spark, idx, v2, "b2", 2, deletes=dels)
    return idx


LIVE = {1: "spark join join", 3: "merge merge hash",
        4: "vector spark table", 5: "batch filter batch"}
TERMS = {"spark", "merge", "batch", "join", "filter"}


def test_search_equals_live_recompute(spark, tmp_path):
    idx = _build(spark, tmp_path)
    assert _search(spark, idx, TERMS) == _expected(LIVE, TERMS)
    # dropped term retired, tf updated, delete observed
    got = _search(spark, idx, {"merge"})
    assert got == {("merge", 3, 2)}          # doc 1's old 'merge' is dead
    assert _search(spark, idx, {"scan"}) == set()   # doc 2 deleted
    assert ("spark", 1, 1) in _search(spark, idx, {"spark"})  # tf 2 -> 1


def test_replay_is_idempotent(spark, tmp_path):
    idx = _build(spark, tmp_path)
    snap = idx.current_snapshot_id()
    v2 = spark.createDataFrame(DOCS_V2, ["doc_id", "text"])
    out = update_token_index(spark, idx, v2, "b2", 2)
    assert out["skipped"] and idx.current_snapshot_id() == snap


def test_gc_reclaims_dead_postings_without_changing_answers(spark, tmp_path):
    idx = _build(spark, tmp_path)
    before = _search(spark, idx, TERMS)
    out = gc_token_index(spark, idx, "gc1")
    # doc 1's dropped postings (merge, batch) + doc 2's three postings
    assert out["metrics"]["deletes_requested"] == 5
    assert _search(spark, idx, TERMS) == before
    # physically gone from a raw resolved read, not just filtered
    live_rows = idx.scan(spark).filter(F.col("term") != DOC_SENTINEL)
    assert live_rows.count() == sum(
        len(set(t.split())) for t in LIVE.values()
    )
    # GC replay is fenced like any commit
    assert gc_token_index(spark, idx, "gc1")["skipped"]


def test_search_reads_are_term_pruned(spark, tmp_path):
    """IO gate: after key-clustered compaction the posting read for one
    term opens a strict subset of the index's data files."""
    idx = _build(spark, tmp_path)
    compact(spark, idx, batch_id="c1", cluster_by_key=True)
    total = len([f for f in idx.manifest()["files"] if f["rows"] > 0])
    opened = len(
        idx.scan(spark, repos=["vector"]).inputFiles()
    )
    assert 0 < opened < total
    # and pruning stayed exact
    assert _search(spark, idx, TERMS) == _expected(LIVE, TERMS)


def test_doc_in_both_docs_and_deletes_deletes(spark, tmp_path):
    """MERGE clause precedence: a doc present in the batch AND in the
    delete set deletes — the two sentinel events would otherwise tie on
    the LWW pair and resolve nondeterministically."""
    idx = create_token_index(str(tmp_path / "tok"), n_buckets=4)
    v1 = spark.createDataFrame(DOCS_V1, ["doc_id", "text"])
    update_token_index(spark, idx, v1, "b1", 1)
    dels = spark.createDataFrame([Row(doc_id=1)])
    update_token_index(spark, idx, v1.filter(F.col("doc_id") == 1),
                       "b2", 2, deletes=dels)
    assert _search(spark, idx, {"spark"}) == {("spark", 4, 1)}


def test_null_text_doc_tombstones_like_cdc_twin(spark, tmp_path):
    """A doc re-submitted with NULL text retires its old postings — the
    same contract as posting_events_from_changelog on a NULL-content
    winner."""
    idx = create_token_index(str(tmp_path / "tok"), n_buckets=4)
    v1 = spark.createDataFrame(DOCS_V1, ["doc_id", "text"])
    update_token_index(spark, idx, v1, "b1", 1)
    cleared = spark.createDataFrame([(3, None)], "doc_id long, text string")
    update_token_index(spark, idx, cleared, "b2", 2)
    # doc 3's postings are gone; doc 1 still holds its own 'merge'
    assert _search(spark, idx, {"merge", "hash"}) == {("merge", 1, 1)}


def test_gc_tombstone_loses_to_same_seq_reingest(spark, tmp_path):
    """The GC stamps deletes at (max_seq+1, offset -1); a later re-ingest
    at that same commit_seq (offset = doc id >= 0) must deterministically
    WIN, or a re-added term would vanish depending on tie-break luck."""
    idx = _build(spark, tmp_path)           # index max commit_seq == 2
    gc_token_index(spark, idx, "gc1")       # tombstones stamped at seq 3
    # doc 1 re-adds 'merge' (tombstoned dead at GC time) at seq 3
    re_add = spark.createDataFrame([(1, "merge spark")], ["doc_id", "text"])
    update_token_index(spark, idx, re_add, "b3", 3)
    assert ("merge", 1, 1) in _search(spark, idx, {"merge"})


def test_search_ranked_bm25(spark, tmp_path):
    """BM25 ranking over the index equals a NumPy recompute from the live
    corpus — doc lengths come from the version sentinels, so staleness
    (the re-ingested doc 1) is already arbitrated before scoring."""
    import math

    idx = _build(spark, tmp_path)
    from glad_tiles_pipeline_spark.operators.textindex import search_ranked

    terms = ["spark", "merge", "batch"]
    got = [(r["doc_id"], r["score"], r["total_tf"])
           for r in search_ranked(spark, idx, terms, k=10).collect()]

    # reference BM25 over LIVE (post-update, post-delete) docs
    dls = {d: len(t.split()) for d, t in LIVE.items()}
    n, avgdl = len(dls), sum(dls.values()) / len(dls)
    tfs = {(d, w): t.split().count(w)
           for d, t in LIVE.items() for w in set(t.split()) if w in terms}
    dfs = {w: sum(1 for (d, ww) in tfs if ww == w) for w in terms}
    scores = {}
    for (d, w), tf in tfs.items():
        idf = math.log((n - dfs[w] + 0.5) / (dfs[w] + 0.5) + 1.0)
        scores.setdefault(d, [0.0, 0])
        scores[d][0] += idf * tf * 2.2 / (
            tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
        scores[d][1] += tf
    want = sorted(
        ((d, round(s, 6), t) for d, (s, t) in scores.items()),
        key=lambda x: (-x[1], x[0]),
    )
    assert got == want


def test_tokenizer_matches_oracle_regex(spark):
    """The Spark tokenizer and the DuckDB oracle share TOKEN_RE verbatim;
    sanity-check the Spark spelling on mixed punctuation/case."""
    df = spark.createDataFrame([(1, "Foo-bar! baz2 FOO")], ["doc_id", "text"])
    toks = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), F.lit(0))
            ).alias("t")
        )
        .groupBy("t").count().collect()
    )
    assert {(r["t"], r["count"]) for r in toks} == {
        ("foo", 2), ("bar", 1), ("baz2", 1)
    }
