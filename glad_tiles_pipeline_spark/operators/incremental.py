"""Incremental (batch-vs-corpus) near-dup deduplication against a
PERSISTED signature index — the production shape of the dedup family.

The batch operators in ``operators/docs.py`` recompute signatures
corpus-wide on every call: fine for analytics, wrong for a 100 TB ingest
pipeline where each incoming batch must be deduplicated against an
ever-growing corpus.  This module closes that gap:

  * the signature index IS a ``LakeTable`` (schema ``SIG_SCHEMA``: key =
    (corpus, doc_id-as-path), payload = K minhash columns + the 32-bit
    simhash) maintained by the SAME idempotent MERGE path as the main
    table — ``apply_batch`` gives it LWW upserts, exactly-once batch ids,
    MoR deltas + compaction, time travel, and snapshot fencing for free;
  * deduplicating an incoming batch re-shingles ONLY the batch: the
    corpus side contributes pre-computed signatures read from the index
    (slim integer columns — the ``text`` column never exists there), and
    banding a signature is two hash expressions per row, not a shingle
    explode;
  * the candidate join BROADCASTS the banded batch against the banded
    index, so the corpus-sized side never shuffles — scan, band, probe,
    all map-side (plan gate: tests/test_incremental_dedup.py);
  * exact-Jaccard verification touches corpus text only for CANDIDATE
    ids (a semi-join-restricted frame, O(candidates) rows); the simhash
    variant needs no text at all — its verify is bit math on the stored
    signatures (IO gate: the simhash plan reads zero corpus-text files).

Equivalence contract (the reason the banding lives in the shared helpers
``minhash_bands`` / ``simhash_bands``): with the index built over
``corpus ∖ batch``,

    incremental(batch, index) == full_recompute(corpus).filter(
        pair touches the batch)

bit-for-bit — asserted on fixtures by tests/test_incremental_dedup.py and
cross-checked against the exact DuckDB all-pairs oracle via the
``dedup_minhash_incremental`` / ``dedup_simhash_incremental`` entries in
queries.EXTRA_QUERIES.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from glad_tiles_pipeline_spark.operators.docs import (
    jaccard_pairs,
    minhash_bands,
    minhash_signatures,
    simhash32,
    simhash_bands,
)
from glad_tiles_pipeline_spark.plans.lake import LakeTable

DEFAULT_N_HASHES = 24
DEFAULT_N_BANDS = 8
DEFAULT_SHINGLE_N = 3
DEFAULT_MAX_HAMMING = 3

# embedding-modality index defaults — MUST match the full-corpus operator's
# operating point (operators/similarity.py::lsh_banded_pairs defaults /
# queries.q_dedup_embedding) so stored buckets equal recomputed ones
DEFAULT_EMB_DIM = 64
DEFAULT_EMB_BANDS = 16
DEFAULT_EMB_ROWS_PER_BAND = 2
DEFAULT_EMB_SEED = 7


def signature_schema(n_hashes: int = DEFAULT_N_HASHES) -> T.StructType:
    """Index-table schema: (corpus, doc_id) key + K minhash longs + the
    32-bit simhash.  Field ids 1 and 2 are the MERGE key (repo/path slots
    of the generic apply_batch projection)."""
    fields = [
        T.StructField("corpus", T.StringType()),
        T.StructField("doc_id", T.StringType()),
    ]
    fields += [T.StructField(f"h{i}", T.LongType()) for i in range(n_hashes)]
    fields.append(T.StructField("simhash", T.LongType()))
    return T.StructType(fields)


def create_signature_index(
    root: str,
    n_hashes: int = DEFAULT_N_HASHES,
    n_buckets: int = 16,
    io=None,
) -> LakeTable:
    """Create the signature-index lake table (same manifest log, fencing,
    and vacuum semantics as the main CDC table)."""
    return LakeTable.create(
        root, schema=signature_schema(n_hashes), n_buckets=n_buckets, io=io
    )


def signature_events(
    docs: DataFrame,
    commit_seq: int,
    corpus: str = "documents",
    n_hashes: int = DEFAULT_N_HASHES,
    shingle_n: int = DEFAULT_SHINGLE_N,
    token_hash: str = "sha256",
    id_col: str = "doc_id",
    text_col: str = "text",
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Change events carrying one document-signature row per batch doc —
    the ONLY place the batch is shingled.  ``deletes`` (optional frame of
    ids) emits tombstone events so removed docs leave the index under the
    same LWW rules as the main table.

    Shape: one shingle explode + K-min aggregate over the BATCH (the same
    one-pass stage as the full-corpus operator, but O(batch)); the simhash
    rides the same frame as a per-row expression.  Offsets are the doc ids
    (unique within a batch); commit_seq orders batches, so a re-ingested
    doc's newer signature wins by LWW exactly like a CDC update."""
    base = docs.filter(F.col(text_col).isNotNull())
    sigs = minhash_signatures(
        base, n_hashes=n_hashes, shingle_n=shingle_n,
        id_col=id_col, text_col=text_col,
    )
    sims = base.select(
        F.col(id_col),
        simhash32(F.col(text_col), token_hash=token_hash).alias("simhash"),
    )
    ev = (
        sigs.join(sims, id_col)
        .select(
            F.col(id_col).cast("long").alias("__id"),
            *[F.col(f"h{i}") for i in range(n_hashes)],
            F.col("simhash"),
        )
        .withColumn("op", F.lit("U"))
    )
    if deletes is not None:
        tomb = deletes.select(F.col(id_col).cast("long").alias("__id")).withColumn(
            "op", F.lit("D")
        )
        for i in range(n_hashes):
            tomb = tomb.withColumn(f"h{i}", F.lit(None).cast("long"))
        tomb = tomb.withColumn("simhash", F.lit(None).cast("long"))
        ev = ev.unionByName(tomb)
    return ev.select(
        F.col("__id").alias("offset"),
        F.lit(int(commit_seq)).cast("long").alias("commit_seq"),
        F.col("op"),
        F.lit(corpus).alias("repo"),
        F.format_string("%012d", F.col("__id")).alias("path"),
        *[F.col(f"h{i}") for i in range(n_hashes)],
        F.col("simhash"),
        F.lit(None).cast("string").alias("control"),
    )


def update_signature_index(
    spark: SparkSession,
    index: LakeTable,
    docs: DataFrame,
    batch_id: str,
    commit_seq: int,
    merge_mode: str = "mor",
    deletes: DataFrame | None = None,
    **sig_kw,
) -> dict:
    """Maintain the index through the real MERGE path: idempotent on
    ``batch_id``, MoR-delta writes by default (O(batch) write cost), LWW
    on (corpus, doc_id) by ``commit_seq``."""
    from glad_tiles_pipeline_spark.operators.merge import apply_batch

    ev = signature_events(docs, commit_seq, deletes=deletes, **sig_kw)
    return apply_batch(
        spark, index, ev, batch_id,
        merge_mode=merge_mode, use_arrow_udfs=False,
    )


def index_signatures(
    spark: SparkSession,
    index: LakeTable,
    n_hashes: int = DEFAULT_N_HASHES,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read the index back as (doc_id:long, h0.., simhash) — slim integer
    columns only; there is no text column to read even by accident."""
    return index.scan(spark, snapshot_id=snapshot_id).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *[F.col(f"h{i}") for i in range(n_hashes)],
        F.col("simhash"),
    )


# separator for the composite string doc id of a CDC "document" — a
# (repo, path) file.  \x01 cannot appear in either half (repo/path are
# path-like strings), so the concatenation is collision-free.
CDC_DOC_SEP = "\x01"


def signature_events_from_changelog(
    events: DataFrame,
    n_hashes: int = DEFAULT_N_HASHES,
    shingle_n: int = DEFAULT_SHINGLE_N,
    token_hash: str = "sha256",
) -> DataFrame:
    """Project a CDC changelog (micro-)batch onto the signature-index
    changelog: one signature row per content-bearing upsert (signatures of
    the NEW content), a tombstone per delete or NULL-content upsert.

    ``offset``/``commit_seq``/``op``/``repo``/``path`` ride through
    VERBATIM — the index's LWW arbitration is therefore the *same*
    arbitration the main table applies to the content, so the index's
    winning signature is, by construction, the signature of the table's
    winning content (NULL-content winners tombstone their key: the index
    invariant is "row present iff the live content is hashable").  This is
    what lets one stream maintain table + index exactly-once
    (streaming/dedup_index.py): both sides are idempotent MERGEs fenced by
    the same content-addressed batch id.

    Shape: one shingle explode + K-min aggregate over the MICRO-BATCH
    (O(batch), the same single pass as ``signature_events``); the simhash
    rides as a per-row expression; control events are dropped (the index
    schema never evolves with the table's)."""
    rows = events.filter(F.col("control").isNull())
    head = ["offset", "commit_seq", "op", "repo", "path"]
    live = rows.filter((F.col("op") != "D") & F.col("content").isNotNull())
    sigs = minhash_signatures(
        live, n_hashes=n_hashes, shingle_n=shingle_n,
        id_col="offset", text_col="content",
    )
    sims = live.select(
        "offset", simhash32(F.col("content"), token_hash=token_hash).alias("simhash")
    )
    ev_u = live.select(*head).join(sigs, "offset").join(sims, "offset")
    dead = rows.filter(
        (F.col("op") == "D") | F.col("content").isNull()
    ).select(*head).withColumn("op", F.lit("D"))
    for i in range(n_hashes):
        dead = dead.withColumn(f"h{i}", F.lit(None).cast("long"))
    dead = dead.withColumn("simhash", F.lit(None).cast("long"))
    return ev_u.unionByName(dead).withColumn(
        "control", F.lit(None).cast("string")
    )


def index_signatures_cdc(
    spark: SparkSession,
    index: LakeTable,
    n_hashes: int = DEFAULT_N_HASHES,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read a changelog-maintained signature index back with the composite
    string doc id (``repo ⊕ path``) the CDC composition uses — the key
    slots hold repo/path values, their schema NAMES stay corpus/doc_id.
    Slim integer payload columns only, like ``index_signatures``."""
    return index.scan(spark, snapshot_id=snapshot_id).select(
        F.concat_ws(CDC_DOC_SEP, "corpus", "doc_id").alias("doc_id"),
        *[F.col(f"h{i}") for i in range(n_hashes)],
        F.col("simhash"),
    )


def cdc_docs(state: DataFrame) -> DataFrame:
    """Project a main-table state frame onto the docs shape the incremental
    near-dup operators take: composite string ``doc_id`` + ``text``."""
    return state.filter(F.col("content").isNotNull()).select(
        F.concat_ws(CDC_DOC_SEP, "repo", "path").alias("doc_id"),
        F.col("content").alias("text"),
    )


def _normalize_pairs(pairs: DataFrame) -> DataFrame:
    return (
        pairs.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def incremental_minhash_candidates(
    batch_docs: DataFrame,
    index_sigs: DataFrame,
    n_hashes: int = DEFAULT_N_HASHES,
    n_bands: int = DEFAULT_N_BANDS,
    shingle_n: int = DEFAULT_SHINGLE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH candidate pairs touching the batch: batch×index ∪ batch×batch.

    100 TB shape: the batch side (signatures of the incoming micro-batch)
    is exploded into bands and BROADCAST; the index side bands its stored
    signatures with two expressions per row and probes the broadcast map —
    the corpus-sized side never shuffles and is never re-shingled.  Docs
    present in both (a re-ingested doc) pair by their FRESH signatures:
    batch ids are anti-joined out of the index side first."""
    batch_sigs = minhash_signatures(
        batch_docs.filter(F.col(text_col).isNotNull()),
        n_hashes=n_hashes, shingle_n=shingle_n,
        id_col=id_col, text_col=text_col,
    )
    batch_bands = minhash_bands(batch_sigs, n_hashes, n_bands, id_col)
    batch_ids = batch_sigs.select(id_col)
    idx = index_sigs.join(
        F.broadcast(batch_ids.withColumnRenamed(id_col, "doc_id")),
        "doc_id", "left_anti",
    )
    idx_bands = minhash_bands(idx, n_hashes, n_bands, "doc_id")
    cross = (
        idx_bands.withColumnRenamed("doc_id", "id_a")
        .join(
            F.broadcast(batch_bands.withColumnRenamed(id_col, "id_b")),
            ["band", "band_hash"],
        )
        .select("id_a", "id_b")
    )
    within = (
        batch_bands.withColumnRenamed(id_col, "id_a")
        .join(
            F.broadcast(batch_bands.withColumnRenamed(id_col, "id_b")),
            ["band", "band_hash"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return _normalize_pairs(cross.unionByName(within))


def incremental_minhash_neardup(
    corpus_docs: DataFrame,
    batch_docs: DataFrame,
    index_sigs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = DEFAULT_N_HASHES,
    n_bands: int = DEFAULT_N_BANDS,
    shingle_n: int = DEFAULT_SHINGLE_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, jaccard) between the batch and the
    corpus (plus batch-internal), exact-Jaccard verified.

    ``corpus_docs`` must contain the text of every doc the index covers
    plus the batch (the full corpus); it is touched ONLY for candidate
    ids — a semi-join restricts the frame before any shingling, so verify
    cost is O(candidate docs), never O(corpus).  Equivalent by
    construction to ``minhash_neardup(corpus)`` filtered to pairs with at
    least one side in the batch (shared banding spelling; exact verify is
    a pure function of the two texts)."""
    cands = incremental_minhash_candidates(
        batch_docs, index_sigs,
        n_hashes=n_hashes, n_bands=n_bands, shingle_n=shingle_n,
        id_col=id_col, text_col=text_col,
    )
    cand_ids = (
        cands.select(F.col("id_a").alias(id_col))
        .unionByName(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand_docs = corpus_docs.join(F.broadcast(cand_ids), id_col, "left_semi")
    return jaccard_pairs(
        cand_docs, cands, threshold=threshold, shingle_n=shingle_n,
        id_col=id_col, text_col=text_col,
    )


def incremental_simhash_neardup(
    batch_docs: DataFrame,
    index_sigs: DataFrame,
    max_hamming: int = DEFAULT_MAX_HAMMING,
    token_hash: str = "sha256",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs touching the batch — NO corpus text access
    at all: the verify (bit_count of the signature xor) runs on the stored
    index signature and the batch's freshly computed one, so the whole
    query reads only integer columns from the index (IO gate:
    tests/test_incremental_dedup.py asserts zero corpus-text input files
    in the plan).  Recall within the radius is 1.0 by the same pigeonhole
    argument as the full-corpus operator (shared ``simhash_bands``)."""
    batch_sigs = batch_docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        simhash32(F.col(text_col), token_hash=token_hash).alias("sig"),
    )
    batch_bands = simhash_bands(batch_sigs, max_hamming, id_col=id_col)
    batch_ids = batch_sigs.select(id_col)
    idx = index_sigs.select(
        "doc_id", F.col("simhash").alias("sig")
    ).join(
        F.broadcast(batch_ids.withColumnRenamed(id_col, "doc_id")),
        "doc_id", "left_anti",
    )
    idx_bands = simhash_bands(idx, max_hamming, id_col="doc_id")
    b_side = F.broadcast(
        batch_bands.select(
            F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"),
            "band", "band_bits",
        )
    )
    cross = (
        idx_bands.select(
            F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"),
            "band", "band_bits",
        )
        .join(b_side, ["band", "band_bits"])
        .select("id_a", "id_b", "sig_a", "sig_b")
    )
    within = (
        batch_bands.select(
            F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"),
            "band", "band_bits",
        )
        .join(b_side, ["band", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
    )
    pairs = cross.unionByName(within).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
    )
    return (
        pairs.filter(
            (F.col("id_a") < F.col("id_b")) & (F.col("hamming") <= max_hamming)
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Embedding modality: incremental near-dup vs a persisted hyperplane-LSH
# bucket index.  Same production shape as the text families above — the
# index is a LakeTable of SLIM INTEGER columns (one bucket id per LSH band,
# B longs per vector; the embedding itself never lives in the index), the
# incoming batch is the only side that runs the numpy banding kernel, and
# the index side re-bands its stored buckets with a posexplode of B columns
# — pure expressions, no Python, no re-hash, map-side against a broadcast
# of the banded batch.  Exact-cosine verify touches corpus vectors only for
# candidate ids (semi-join-restricted, O(candidates)).
# ---------------------------------------------------------------------------


def embedding_index_schema(n_bands: int = DEFAULT_EMB_BANDS) -> T.StructType:
    """Embedding-index table schema: (corpus, vec_id) key + one bucket id
    per LSH band.  Field ids 1 and 2 are the MERGE key, exactly like
    ``signature_schema``."""
    fields = [
        T.StructField("corpus", T.StringType()),
        T.StructField("vec_id", T.StringType()),
    ]
    fields += [T.StructField(f"b{i}", T.LongType()) for i in range(n_bands)]
    return T.StructType(fields)


def create_embedding_index(
    root: str,
    n_bands: int = DEFAULT_EMB_BANDS,
    n_buckets: int = 16,
    io=None,
) -> LakeTable:
    """Create the embedding-bucket index lake table (same manifest log,
    fencing, compaction, and vacuum semantics as any table)."""
    return LakeTable.create(
        root, schema=embedding_index_schema(n_bands), n_buckets=n_buckets, io=io
    )


def embedding_bucket_events(
    vectors: DataFrame,
    commit_seq: int,
    corpus: str = "embeddings",
    dim: int = DEFAULT_EMB_DIM,
    n_bands: int = DEFAULT_EMB_BANDS,
    rows_per_band: int = DEFAULT_EMB_ROWS_PER_BAND,
    seed: int = DEFAULT_EMB_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Change events carrying one bucket-signature row per batch vector —
    the ONLY place the banding kernel runs (one numpy matmul over the
    BATCH).  Malformed rows (NULL / wrong-dim) are filtered with the same
    predicate as ``lsh_banded_pairs`` so stored candidates stay bit-equal
    to a full recompute.  ``deletes`` emits tombstones under the same LWW
    rules as any CDC delete."""
    from glad_tiles_pipeline_spark.operators.similarity import (
        as_double,
        banded_buckets_udf,
    )

    base = vectors.filter(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
    )
    buckets = banded_buckets_udf(dim, n_bands, rows_per_band, seed)
    ev = (
        base.withColumn("__b", buckets(as_double(vec_col)))
        .select(
            F.col(id_col).cast("long").alias("__id"),
            *[F.col("__b").getItem(i).alias(f"b{i}") for i in range(n_bands)],
        )
        .withColumn("op", F.lit("U"))
    )
    if deletes is not None:
        tomb = deletes.select(F.col(id_col).cast("long").alias("__id")).withColumn(
            "op", F.lit("D")
        )
        for i in range(n_bands):
            tomb = tomb.withColumn(f"b{i}", F.lit(None).cast("long"))
        ev = ev.unionByName(tomb)
    return ev.select(
        F.col("__id").alias("offset"),
        F.lit(int(commit_seq)).cast("long").alias("commit_seq"),
        F.col("op"),
        F.lit(corpus).alias("repo"),
        F.format_string("%012d", F.col("__id")).alias("path"),
        *[F.col(f"b{i}") for i in range(n_bands)],
        F.lit(None).cast("string").alias("control"),
    )


def update_embedding_index(
    spark: SparkSession,
    index: LakeTable,
    vectors: DataFrame,
    batch_id: str,
    commit_seq: int,
    merge_mode: str = "mor",
    deletes: DataFrame | None = None,
    **bucket_kw,
) -> dict:
    """Maintain the embedding index through the real MERGE path:
    idempotent on ``batch_id``, MoR deltas, LWW on (corpus, vec_id) by
    ``commit_seq`` — a re-embedded vector's newer buckets win exactly like
    a CDC update."""
    from glad_tiles_pipeline_spark.operators.merge import apply_batch

    ev = embedding_bucket_events(vectors, commit_seq, deletes=deletes, **bucket_kw)
    return apply_batch(
        spark, index, ev, batch_id,
        merge_mode=merge_mode, use_arrow_udfs=False,
    )


def index_embedding_buckets(
    spark: SparkSession,
    index: LakeTable,
    n_bands: int = DEFAULT_EMB_BANDS,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read the index back as (vec_id:long, b0..b{B-1}) — slim integer
    columns only; the embedding column does not exist there even to read
    by accident."""
    return index.scan(spark, snapshot_id=snapshot_id).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        *[F.col(f"b{i}") for i in range(n_bands)],
    )


def incremental_embedding_candidates(
    batch_vecs: DataFrame,
    index_buckets: DataFrame,
    dim: int = DEFAULT_EMB_DIM,
    n_bands: int = DEFAULT_EMB_BANDS,
    rows_per_band: int = DEFAULT_EMB_ROWS_PER_BAND,
    seed: int = DEFAULT_EMB_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH candidate pairs touching the batch: batch×index ∪ batch×batch.

    100 TB shape: the banding kernel (one numpy matmul) runs over BATCH
    rows only — it appears in exactly two plan branches, the broadcast
    probe side and the batch-internal union leg, both O(batch) — while
    the index side turns its stored B bucket columns back into
    (band, bucket) rows with one posexplode of an array literal: zero
    Python, zero hashing, map-side probe of the broadcast.  The two pair
    families share ONE BroadcastHashJoin (the index leg and the
    flagged batch leg are unioned before the probe), so the corpus-sized
    side never shuffles and never touches a vector; the only row shuffle
    is the output-sized pair distinct.  Vectors present in both
    (re-embedded ids) pair by their FRESH buckets: batch ids are
    anti-joined out of the index side first."""
    from glad_tiles_pipeline_spark.operators.similarity import (
        as_double,
        banded_buckets_udf,
    )

    base = batch_vecs.filter(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
    )
    buckets = banded_buckets_udf(dim, n_bands, rows_per_band, seed)
    # posexplode a FIXED-SIZE array of extractions (not the raw UDF output):
    # the kernel returns exactly n_bands elements, and the literal-sized
    # array lets Catalyst constant-fold the inferred size()>0 generate
    # filter that would otherwise evaluate the UDF twice per branch
    batch_banded = (
        base.withColumn("__b", buckets(as_double(vec_col)))
        .select(
            F.col(id_col),
            F.posexplode(
                F.array(*[F.col("__b").getItem(i) for i in range(n_bands)])
            ).alias("band", "bucket"),
        )
    )
    batch_ids = base.select(id_col)
    idx = index_buckets.join(
        F.broadcast(batch_ids.withColumnRenamed(id_col, "vec_id")),
        "vec_id", "left_anti",
    )
    idx_banded = idx.select(
        F.col("vec_id").alias("id_a"),
        F.posexplode(
            F.array(*[F.col(f"b{i}") for i in range(n_bands)])
        ).alias("band", "bucket"),
    ).withColumn("from_batch", F.lit(False))
    left = idx_banded.unionByName(
        batch_banded.withColumnRenamed(id_col, "id_a").withColumn(
            "from_batch", F.lit(True)
        )
    )
    b_side = F.broadcast(batch_banded.withColumnRenamed(id_col, "id_b"))
    pairs = (
        left.join(b_side, ["band", "bucket"])
        .filter(~F.col("from_batch") | (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
    )
    return _normalize_pairs(pairs)


def incremental_embedding_neardup(
    corpus_vecs: DataFrame,
    batch_vecs: DataFrame,
    index_buckets: DataFrame,
    threshold: float = 0.45,
    dim: int = DEFAULT_EMB_DIM,
    n_bands: int = DEFAULT_EMB_BANDS,
    rows_per_band: int = DEFAULT_EMB_ROWS_PER_BAND,
    seed: int = DEFAULT_EMB_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs (id_a, id_b, sim) between the batch and
    the corpus (plus batch-internal), exact-cosine verified.

    ``corpus_vecs`` must contain every vector the index covers plus the
    batch; it is touched ONLY for candidate ids — a broadcast semi-join
    restricts the frame before any vector math, so verify cost is
    O(candidate vectors), never O(corpus).  Equivalent by construction to
    ``embedding_neardup(corpus)`` filtered to pairs touching the batch:
    banding is the same kernel at the same operating point (stored index
    buckets ARE that kernel's output), and exact cosine is a pure function
    of the two vectors."""
    from glad_tiles_pipeline_spark.operators.similarity import as_double, cosine_udf

    cands = incremental_embedding_candidates(
        batch_vecs, index_buckets,
        dim=dim, n_bands=n_bands, rows_per_band=rows_per_band, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    cand_ids = (
        cands.select(F.col("id_a").alias(id_col))
        .unionByName(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand_vecs = corpus_vecs.join(F.broadcast(cand_ids), id_col, "left_semi")
    va = cand_vecs.select(
        F.col(id_col).alias("id_a"), as_double(vec_col).alias("__va")
    )
    vb = cand_vecs.select(
        F.col(id_col).alias("id_b"), as_double(vec_col).alias("__vb")
    )
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("sim", cosine_udf()(F.col("__va"), F.col("__vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )
