"""Incremental near-dup dedup against the persisted signature index
(operators/incremental.py).

The contract under test: with the index built over corpus ∖ batch through
the real MERGE path, the incremental operators equal the full-corpus
recompute restricted to pairs touching the batch — bit-for-bit, for both
the MinHash+Jaccard and SimHash families — while re-shingling ONLY the
batch (O(batch) work + O(candidates) verify, never O(corpus)).

IO gates (the batch lives in its OWN parquet, as in real ingest):
  * simhash: the incremental plan reads ZERO corpus-text files — verify is
    bit math on stored signatures;
  * minhash: corpus text enters only through the candidate-id semi-join
    (frame row-count == candidate-doc count, corpus-size independent), and
    the index's data files contain no text column at all;
  * plan: the banded index side probes a BROADCAST of the banded batch —
    no Exchange between the index scan and the first join (the
    corpus-sized side never shuffles).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.docs import minhash_neardup, simhash_neardup
from glad_tiles_pipeline_spark.operators.merge import compact
from glad_tiles_pipeline_spark.operators.incremental import (
    create_signature_index,
    incremental_minhash_candidates,
    incremental_minhash_neardup,
    incremental_simhash_neardup,
    index_signatures,
    signature_events,
    update_signature_index,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    base_dir = tmp_path_factory.mktemp("incdedup")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # the incoming batch arrives as its own files (real ingest shape)
    docs.filter(F.col("doc_id") % 7 == 3).write.parquet(str(base_dir / "batch"))
    docs.filter(F.col("doc_id") % 7 != 3).write.parquet(str(base_dir / "base"))
    batch = spark.read.parquet(str(base_dir / "batch"))
    base = spark.read.parquet(str(base_dir / "base"))
    index = create_signature_index(str(base_dir / "sigidx"), n_buckets=4)
    # two MERGE batches so the index accretes like a stream would
    update_signature_index(
        spark, index, base.filter(F.col("doc_id") % 2 == 0), "sig-b0", 0
    )
    update_signature_index(
        spark, index, base.filter(F.col("doc_id") % 2 == 1), "sig-b1", 1
    )
    # steady state: MoR deltas are compacted periodically, making the index
    # scan resolution-free (pure file scan, no LWW shuffle) — the layout
    # the no-index-shuffle plan gate below asserts against
    compact(spark, index, batch_id="sig-compact")
    sigs = index_signatures(spark, index)
    batch_ids = {r[0] for r in batch.select("doc_id").collect()}
    return {
        "docs": docs, "batch": batch, "base": base,
        "index": index, "sigs": sigs, "batch_ids": batch_ids,
    }


def _touching(rows, ids):
    return sorted(t for t in rows if t[0] in ids or t[1] in ids)


def test_minhash_incremental_equals_full_recompute(spark, env):
    inc = incremental_minhash_neardup(
        env["docs"], env["batch"], env["sigs"], threshold=0.5
    )
    full = minhash_neardup(env["docs"], threshold=0.5, n_hashes=24, n_bands=8)
    got = sorted(tuple(r) for r in inc.collect())
    want = _touching([tuple(r) for r in full.collect()], env["batch_ids"])
    assert got == want and len(got) > 0


def test_simhash_incremental_equals_full_recompute(spark, env):
    inc = incremental_simhash_neardup(env["batch"], env["sigs"])
    full = simhash_neardup(env["docs"], token_hash="sha256")
    got = sorted(tuple(r) for r in inc.collect())
    want = _touching([tuple(r) for r in full.collect()], env["batch_ids"])
    assert got == want and len(got) > 0


def test_simhash_incremental_reads_zero_corpus_text_files(spark, env):
    """The strongest IO gate: the whole simhash dedup plan touches only
    the batch parquet and the index's integer-column data files."""
    inc = incremental_simhash_neardup(env["batch"], env["sigs"])
    corpus_files = set(env["base"].inputFiles()) | set(env["docs"].inputFiles())
    assert not (set(inc.inputFiles()) & corpus_files)


def test_index_files_carry_no_text_column(spark, env):
    """Re-shingling the corpus from the index is impossible by
    construction: its parquet files hold key + signature columns only."""
    import pyarrow.parquet as pq

    for f in env["sigs"].inputFiles():
        names = set(pq.ParquetFile(f.removeprefix("file:")).schema_arrow.names)
        assert "text" not in names
        assert {"corpus", "doc_id", "h0", "h23", "simhash"} <= names


def test_minhash_verify_frame_is_candidate_sized(spark, env):
    """Corpus text is read only for candidate ids: the semi-join-restricted
    frame has exactly one row per candidate doc — O(candidates), not
    O(corpus)."""
    cands = incremental_minhash_candidates(env["batch"], env["sigs"])
    cand_ids = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    n_cand = cand_ids.count()
    restricted = env["docs"].join(F.broadcast(cand_ids), "doc_id", "left_semi")
    assert restricted.count() == n_cand
    assert n_cand < env["docs"].count() / 3  # corpus-size independence proxy


def test_index_side_never_shuffles_before_probe(spark, env):
    """Plan gate: on a compacted (resolution-free) index snapshot the
    corpus-sized side stays map-side — every join is a BroadcastHashJoin
    (batch side built), and the ONLY row shuffle in the whole plan is the
    output-sized pair distinct.  At 100 TB that means per-batch dedup cost
    = one index scan + broadcast probes + an O(pairs) aggregate."""
    inc = incremental_simhash_neardup(env["batch"], env["sigs"])
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(shuffles) == 1, plan
    assert "id_a" in shuffles[0] and "id_b" in shuffles[0]  # the pair distinct


def test_update_is_idempotent_and_o_batch(spark, env):
    """Replaying a committed batch_id is a no-op; the signature-event
    frame scans only the batch's own files (O(batch) input IO)."""
    r = update_signature_index(
        spark, env["index"], env["base"].limit(50), "sig-b0", 0
    )
    assert r.get("skipped") is True
    ev = signature_events(env["batch"], commit_seq=2)
    assert set(ev.inputFiles()) <= set(env["batch"].inputFiles())


def test_reingested_doc_pairs_by_fresh_signature(spark, env):
    """A doc present in both index and batch (re-ingest) must not pair
    with itself, and its index-side stale signature is ignored."""
    # re-ingest: batch = some docs already in the index
    reingest = env["base"].limit(20)
    inc = incremental_simhash_neardup(reingest, env["sigs"])
    ids = {r[0] for r in reingest.select("doc_id").collect()}
    for a, b, _ in inc.collect():
        assert a != b
        assert a in ids or b in ids


@pytest.fixture(scope="module")
def emb_env(spark, tmp_path_factory):
    """Embedding modality: same production shape — index over corpus ∖
    batch through the MERGE path, compacted to a resolution-free layout."""
    from glad_tiles_pipeline_spark.operators.incremental import (
        create_embedding_index,
        index_embedding_buckets,
        update_embedding_index,
    )

    base_dir = tmp_path_factory.mktemp("incembdedup")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb.filter(F.col("vec_id") % 7 == 3).write.parquet(str(base_dir / "batch"))
    emb.filter(F.col("vec_id") % 7 != 3).write.parquet(str(base_dir / "base"))
    batch = spark.read.parquet(str(base_dir / "batch"))
    base = spark.read.parquet(str(base_dir / "base"))
    index = create_embedding_index(str(base_dir / "embidx"), n_buckets=4)
    update_embedding_index(
        spark, index, base.filter(F.col("vec_id") % 2 == 0), "emb-b0", 0
    )
    update_embedding_index(
        spark, index, base.filter(F.col("vec_id") % 2 == 1), "emb-b1", 1
    )
    compact(spark, index, batch_id="emb-compact")
    buckets = index_embedding_buckets(spark, index)
    batch_ids = {r[0] for r in batch.select("vec_id").collect()}
    return {
        "emb": emb, "batch": batch, "base": base,
        "index": index, "buckets": buckets, "batch_ids": batch_ids,
    }


def test_embedding_incremental_equals_full_recompute(spark, emb_env):
    from glad_tiles_pipeline_spark.operators.incremental import (
        incremental_embedding_neardup,
    )
    from glad_tiles_pipeline_spark.operators.similarity import embedding_neardup

    inc = incremental_embedding_neardup(
        emb_env["emb"], emb_env["batch"], emb_env["buckets"], threshold=0.45
    )
    full = embedding_neardup(emb_env["emb"], threshold=0.45, dim=64, n_bands=16)
    got = sorted(tuple(r) for r in inc.collect())
    want = _touching(
        [tuple(r) for r in full.collect()], emb_env["batch_ids"]
    )
    assert got == want and len(got) > 0


def test_embedding_candidates_read_zero_corpus_vector_files(spark, emb_env):
    """The candidate stage touches only the batch parquet and the index's
    integer-column files — the corpus-sized side contributes stored
    buckets, never vectors (vectors enter later, candidate-restricted)."""
    from glad_tiles_pipeline_spark.operators.incremental import (
        incremental_embedding_candidates,
    )

    cands = incremental_embedding_candidates(emb_env["batch"], emb_env["buckets"])
    corpus_files = set(emb_env["base"].inputFiles()) | set(
        emb_env["emb"].inputFiles()
    )
    assert not (set(cands.inputFiles()) & corpus_files)


def test_embedding_index_files_carry_no_vector_column(spark, emb_env):
    import pyarrow.parquet as pq

    for f in emb_env["buckets"].inputFiles():
        names = set(pq.ParquetFile(f.removeprefix("file:")).schema_arrow.names)
        assert "embedding" not in names
        assert {"corpus", "vec_id", "b0", "b15"} <= names


def test_embedding_index_side_never_shuffles_before_probe(spark, emb_env):
    """Plan gate (mirror of the simhash gate): on the compacted index the
    corpus-sized side stays map-side — the stored-bucket posexplode probes
    a BROADCAST of the banded batch, and the only row shuffle in the
    candidate plan is the output-sized pair distinct."""
    from glad_tiles_pipeline_spark.operators.incremental import (
        incremental_embedding_candidates,
    )

    cands = incremental_embedding_candidates(emb_env["batch"], emb_env["buckets"])
    plan = cands._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(shuffles) == 1, plan
    assert "id_a" in shuffles[0] and "id_b" in shuffles[0]
    # the banding kernel runs on the batch side only: two Arrow-UDF nodes
    # (broadcast probe side + batch-internal union leg), both O(batch) —
    # and every Python node scans BATCH files, never the index/corpus
    assert plan.count("ArrowEvalPython") == 2, plan
    batch_dirs = {
        "/" + f.removeprefix("file:").lstrip("/").rsplit("/", 1)[0]
        for f in emb_env["batch"].inputFiles()
    }
    for chunk in plan.split("ArrowEvalPython")[1:]:
        scan = next(
            ln for ln in chunk.splitlines() if "FileScan parquet" in ln
        )
        assert any(d in scan for d in batch_dirs), scan


def test_embedding_update_is_idempotent_and_o_batch(spark, emb_env):
    from glad_tiles_pipeline_spark.operators.incremental import (
        embedding_bucket_events,
        update_embedding_index,
    )

    r = update_embedding_index(
        spark, emb_env["index"], emb_env["base"].limit(20), "emb-b0", 0
    )
    assert r.get("skipped") is True
    ev = embedding_bucket_events(emb_env["batch"], commit_seq=2)
    assert set(ev.inputFiles()) <= set(emb_env["batch"].inputFiles())


def test_reembedded_vector_pairs_by_fresh_buckets(spark, emb_env):
    """A vector present in both index and batch (re-embed) must not pair
    with itself; its stale index-side buckets are anti-joined out."""
    from glad_tiles_pipeline_spark.operators.incremental import (
        incremental_embedding_neardup,
    )

    reingest = emb_env["base"].limit(15)
    inc = incremental_embedding_neardup(
        emb_env["emb"], reingest, emb_env["buckets"], threshold=0.45
    )
    ids = {r[0] for r in reingest.select("vec_id").collect()}
    for a, b, _ in inc.collect():
        assert a != b
        assert a in ids or b in ids


def test_embedding_deletes_leave_the_index(spark, emb_env, tmp_path):
    from glad_tiles_pipeline_spark.operators.incremental import (
        create_embedding_index,
        index_embedding_buckets,
        update_embedding_index,
    )

    index = create_embedding_index(str(tmp_path / "embidx2"), n_buckets=2)
    update_embedding_index(spark, index, emb_env["base"], "ed0", 0)
    victim = emb_env["base"].select("vec_id").limit(5)
    update_embedding_index(
        spark, index, emb_env["base"].limit(0), "ed1", 1, deletes=victim
    )
    bk = index_embedding_buckets(spark, index)
    gone = {r[0] for r in victim.collect()}
    left = {r[0] for r in bk.select("vec_id").collect()}
    assert not (gone & left)
    assert len(left) > 0


def test_deletes_leave_the_index(spark, env, tmp_path):
    """Tombstone events remove a doc's signature under LWW like any CDC
    delete — it stops pairing afterwards."""
    index = create_signature_index(str(tmp_path / "sigidx2"), n_buckets=2)
    update_signature_index(spark, index, env["base"], "d0", 0)
    victim = env["base"].select("doc_id").limit(5)
    update_signature_index(
        spark, index, env["base"].limit(0), "d1", 1, deletes=victim
    )
    sigs = index_signatures(spark, index)
    gone = {r[0] for r in victim.collect()}
    left = {r[0] for r in sigs.select("doc_id").collect()}
    assert not (gone & left)
    assert len(left) > 0
