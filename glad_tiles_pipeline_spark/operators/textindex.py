"""Incrementally-maintained inverted text index + term search — the
secondary-index story for the document corpus, built ENTIRELY out of the
engine's existing table machinery.

A 100 TB corpus cannot answer "which documents contain <term>" by
scanning text; it needs posting lists.  This module persists them as a
normal ``LakeTable`` keyed ``(term, doc_id)`` and maintained by the same
idempotent MERGE path as every other table — so the index gets
exactly-once batch ids, MoR deltas + compaction, snapshot isolation, and
time travel for free, and each of the engine's read-side levers becomes a
retrieval lever:

  * ``scan(repos=[term...])`` — the S22' key-1 stats prune — IS the
    posting-list read: after key-clustered compaction (S22''), the files
    are term-clustered and a term's postings open O(1) files of the whole
    index;
  * staleness is VERSIONED, not rewritten: each batch upserts one
    sentinel row per document (term ``\\x00doc`` — no real token can
    collide, tokens are ``[a-z0-9]+``) carrying the doc's new version;
    a posting is live iff its ``doc_seq`` equals the sentinel's.  A
    re-ingested document therefore retires its dropped terms WITHOUT the
    write path ever knowing the previous token set (shared terms are
    LWW-updated in place, dropped terms fail the version check, a deleted
    document tombstones its sentinel and every posting dies) — writes
    stay O(batch tokens);
  * dead postings are storage, not wrong answers; ``gc_token_index``
    reclaims them in the background by emitting delete events for
    postings whose version lost — through the same MERGE path, so the GC
    is itself idempotent and crash-safe.

Search shape: the term-restricted posting read is output-sized, so it
BROADCASTS against the sentinel scan (itself pruned to the sentinel
"term"'s files) — no corpus-sized shuffle anywhere.

Oracle: the whole pipeline (tokenize → tf → version filter) is
SQL-expressible; the ``text_search_terms`` EXTRA query's DuckDB twin
recomputes postings from the live corpus text directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from glad_tiles_pipeline_spark.plans.lake import LakeTable

# one token class, shared verbatim with the DuckDB oracle
TOKEN_RE = "[a-z0-9]+"
# sentinel "term" carrying each document's current version; \x00 cannot
# appear in a TOKEN_RE match, so it collides with no real posting
DOC_SENTINEL = "\x00doc"

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tf", T.LongType()),
        T.StructField("doc_seq", T.LongType()),
    ]
)


def create_token_index(root: str, n_buckets: int = 16, io=None) -> LakeTable:
    return LakeTable.create(root, schema=INDEX_SCHEMA, n_buckets=n_buckets, io=io)


def posting_events(
    docs: DataFrame,
    commit_seq: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Index change events for one document batch: (term, doc_id) posting
    upserts with term frequency, one version sentinel per doc, tombstoned
    sentinels for deletes.  Pure column expressions — tokenize, explode,
    count — O(batch tokens), no Python."""
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(text_col).alias("__text"),
    )
    posts = (
        base.select(
            "__id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("__text")), F.lit(TOKEN_RE), F.lit(0))
            ).alias("term"),
        )
        .groupBy("__id", "term")
        .agg(F.count("*").alias("tf"))
    )
    sent = base.select(
        "__id", F.lit(DOC_SENTINEL).alias("term"), F.lit(None).cast("long").alias("tf")
    )
    ev = posts.unionByName(sent, allowMissingColumns=False).select(
        "__id", "term", "tf", F.lit("U").alias("op")
    )
    if deletes is not None:
        # only the sentinel needs a tombstone: without a live sentinel the
        # doc's every posting fails the version check
        tomb = deletes.select(F.col(id_col).cast("long").alias("__id")).select(
            "__id",
            F.lit(DOC_SENTINEL).alias("term"),
            F.lit(None).cast("long").alias("tf"),
            F.lit("D").alias("op"),
        )
        ev = ev.unionByName(tomb)
    return ev.select(
        F.col("__id").alias("offset"),
        F.lit(int(commit_seq)).cast("long").alias("commit_seq"),
        F.col("op"),
        F.col("term").alias("repo"),
        F.format_string("%012d", F.col("__id")).alias("path"),
        F.col("tf"),
        F.lit(int(commit_seq)).cast("long").alias("doc_seq"),
        F.lit(None).cast("string").alias("control"),
    )


def update_token_index(
    spark: SparkSession,
    index: LakeTable,
    docs: DataFrame,
    batch_id: str,
    commit_seq: int,
    merge_mode: str = "mor",
    deletes: DataFrame | None = None,
    **kw,
) -> dict:
    """Maintain the index through the real MERGE path — idempotent on
    ``batch_id``, O(batch) MoR writes by default."""
    from glad_tiles_pipeline_spark.operators.merge import apply_batch

    ev = posting_events(docs, commit_seq, deletes=deletes, **kw)
    return apply_batch(
        spark, index, ev, batch_id, merge_mode=merge_mode, use_arrow_udfs=False
    )


def _live_sentinels(spark: SparkSession, index: LakeTable) -> DataFrame:
    return index.scan(spark, repos=[DOC_SENTINEL]).select(
        F.col("doc_id"), F.col("doc_seq").alias("__cur")
    )


def search_terms(
    spark: SparkSession,
    index: LakeTable,
    terms: "list[str]",
    snapshot_id: int | None = None,
) -> DataFrame:
    """Documents containing any of ``terms``: (term, doc_id, tf), live
    versions only.  Read cost: the posting files the S22' stats prune
    keeps (O(1) per term once compaction term-clusters the index) plus
    the sentinel files; the only join broadcasts the output-sized posting
    set — nothing corpus-sized shuffles."""
    terms = sorted({t.lower() for t in terms})
    if DOC_SENTINEL in terms:
        raise ValueError("sentinel term is not searchable")
    post = index.scan(spark, repos=terms, snapshot_id=snapshot_id).select(
        "term", "doc_id", "tf", "doc_seq"
    )
    sent = index.scan(spark, repos=[DOC_SENTINEL], snapshot_id=snapshot_id).select(
        F.col("doc_id"), F.col("doc_seq").alias("__cur")
    )
    return (
        sent.join(F.broadcast(post), "doc_id")
        .filter(F.col("doc_seq") == F.col("__cur"))
        .select("term", F.col("doc_id").cast("long").alias("doc_id"), "tf")
    )


def gc_token_index(
    spark: SparkSession, index: LakeTable, batch_id: str
) -> dict:
    """Background reclamation of version-dead postings: one pass over the
    index joins postings against the live sentinels and emits delete
    events for every posting whose version lost (or whose doc has no
    sentinel) — through the same MERGE, so the GC commit is fenced,
    idempotent, and time-travel-visible like any other.  O(index) read,
    O(dead) write; correctness never depends on running it."""
    from glad_tiles_pipeline_spark.operators.merge import apply_batch
    from glad_tiles_pipeline_spark.operators.merge_into import max_commit_seq

    full = index.scan(spark).filter(F.col("term") != DOC_SENTINEL)
    sent = _live_sentinels(spark, index)
    dead = full.join(sent, "doc_id", "left").filter(
        F.col("__cur").isNull() | (F.col("doc_seq") != F.col("__cur"))
    )
    seq = max_commit_seq(spark, index)  # O(manifest) via per-file stats
    ev = dead.select(
        F.col("doc_id").cast("long").alias("offset"),
        F.lit(seq + 1).cast("long").alias("commit_seq"),
        F.lit("D").alias("op"),
        F.col("term").alias("repo"),
        F.format_string("%012d", F.col("doc_id").cast("long")).alias("path"),
        F.lit(None).cast("long").alias("tf"),
        F.lit(None).cast("long").alias("doc_seq"),
        F.lit(None).cast("string").alias("control"),
    )
    return apply_batch(spark, index, ev, batch_id, merge_mode="mor",
                       use_arrow_udfs=False)
