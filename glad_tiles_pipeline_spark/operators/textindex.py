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

# a posting's version identity is the emitting event's FULL LWW ordering
# pair (commit_seq, offset) — doc_seq alone cannot distinguish two versions
# of a doc arriving under the same commit_seq (the changelog tie-break is
# by offset, so the sentinel must be too)
INDEX_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tf", T.LongType()),
        T.StructField("doc_seq", T.LongType()),
        T.StructField("doc_off", T.LongType()),
    ]
)


def create_token_index(root: str, n_buckets: int = 16, io=None) -> LakeTable:
    return LakeTable.create(root, schema=INDEX_SCHEMA, n_buckets=n_buckets, io=io)


def _tokens(text_col):
    """THE tokenizer — one spelling shared by the batch events, the CDC
    events, and (verbatim regex) the DuckDB oracle."""
    return F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_RE), F.lit(0))


def posting_events(
    docs: DataFrame,
    commit_seq: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Index change events for one document batch: (term, doc_id) posting
    upserts with term frequency, one version sentinel per doc, tombstoned
    sentinels for deletes AND for NULL-text docs (a doc re-submitted with
    its text cleared must retire its old postings — same contract as the
    CDC twin ``posting_events_from_changelog``).  A doc appearing in both
    ``docs`` and ``deletes`` deletes (MERGE clause precedence) — the two
    events would otherwise carry an identical LWW pair and tie
    nondeterministically.  Pure column expressions — tokenize, explode,
    count — O(batch tokens), no Python."""
    ids = docs.select(F.col(id_col).cast("long").alias("__id"),
                      F.col(text_col).alias("__text"))
    dead_ids = ids.filter(F.col("__text").isNull()).select("__id")
    if deletes is not None:
        dead_ids = dead_ids.unionByName(
            deletes.select(F.col(id_col).cast("long").alias("__id"))
        ).distinct()
    base = ids.filter(F.col("__text").isNotNull()).join(
        F.broadcast(dead_ids), "__id", "left_anti"
    )
    posts = (
        base.select(
            "__id",
            F.explode(_tokens(F.col("__text"))).alias("term"),
        )
        .groupBy("__id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # the sentinel's tf slot carries the DOC LENGTH (token count) — free
    # at write time, and exactly the per-doc state BM25 ranking needs
    sent = base.select(
        "__id",
        F.lit(DOC_SENTINEL).alias("term"),
        F.size(_tokens(F.col("__text"))).cast("long").alias("tf"),
    )
    ev = posts.unionByName(sent, allowMissingColumns=False).select(
        "__id", "term", "tf", F.lit("U").alias("op")
    )
    tomb = dead_ids.select(
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
        F.col("__id").alias("doc_off"),
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


def _live_sentinels(spark: SparkSession, index: LakeTable,
                    snapshot_id: int | None = None) -> DataFrame:
    return index.scan(spark, repos=[DOC_SENTINEL], snapshot_id=snapshot_id).select(
        F.col("doc_id"),
        F.col("doc_seq").alias("__cur"),
        F.col("doc_off").alias("__cur_off"),
        F.col("tf").alias("__dl"),  # doc length (see posting_events)
    )


def _live_postings(
    spark: SparkSession,
    index: LakeTable,
    terms: "list[str]",
    snapshot_id: int | None = None,
) -> DataFrame:
    """The shared retrieval pipeline behind both search spellings:
    stats-pruned posting read for ``terms``, broadcast against the pruned
    sentinel read, version-PAIR liveness filter.  Read cost: the posting
    files the S22' stats prune keeps (O(1) per term once compaction
    term-clusters the index) plus the sentinel files; the only join
    broadcasts the output-sized posting set — nothing corpus-sized
    shuffles."""
    terms = sorted({t.lower() for t in terms})
    if DOC_SENTINEL in terms:
        raise ValueError("sentinel term is not searchable")
    post = index.scan(spark, repos=terms, snapshot_id=snapshot_id).select(
        "term", "doc_id", "tf", "doc_seq", "doc_off"
    )
    sent = _live_sentinels(spark, index, snapshot_id)
    return sent.join(F.broadcast(post), "doc_id").filter(
        (F.col("doc_seq") == F.col("__cur"))
        & (F.col("doc_off") == F.col("__cur_off"))
    )


def search_terms(
    spark: SparkSession,
    index: LakeTable,
    terms: "list[str]",
    snapshot_id: int | None = None,
) -> DataFrame:
    """Documents containing any of ``terms``: (term, doc_id, tf), live
    versions only — the numeric-doc-id spelling (see ``_live_postings``
    for the plan shape)."""
    return _live_postings(spark, index, terms, snapshot_id).select(
        "term", F.col("doc_id").cast("long").alias("doc_id"), "tf"
    )


def search_ranked(
    spark: SparkSession,
    index: LakeTable,
    terms: "list[str]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    snapshot_id: int | None = None,
) -> DataFrame:
    """BM25-ranked retrieval over the index: top-``k`` documents for a
    term set, (doc_id, score, total_tf).  Every ranking input already
    lives in the index — tf per live posting, doc length in the sentinel
    row, N/avgdl one slim agg over the sentinels, df an output-sized agg
    over the query's own postings — so ranking reads the SAME pruned
    files as the boolean search plus zero corpus IO.

    Determinism: the score is rounded to 6 decimals and ties break by
    doc_id, so ranking and the top-k cut are engine-independent (the
    DuckDB oracle recomputes the whole formula from the live corpus)."""
    live = _live_postings(spark, index, terms, snapshot_id)
    sent = _live_sentinels(spark, index, snapshot_id)
    stats = sent.agg(
        F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    dfreq = live.groupBy("term").agg(
        F.countDistinct("doc_id").alias("__df")
    )
    tf = F.col("tf").cast("double")
    idf = F.log(
        (F.col("__n") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    w = idf * tf * F.lit(k1 + 1.0) / norm
    scored = (
        live.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__w", w)
    )
    docs = scored.groupBy("doc_id").agg(
        F.round(F.sum("__w"), 6).alias("score"),
        F.sum("tf").alias("total_tf"),
    )
    return (
        docs.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select(F.col("doc_id").cast("long").alias("doc_id"),
                "score", "total_tf")
    )


def posting_events_from_changelog(events: DataFrame) -> DataFrame:
    """Project a CDC changelog (micro-)batch onto the token-index
    changelog — the X12 twin of
    ``incremental.signature_events_from_changelog``: postings of each
    content-bearing event's NEW token set, one version sentinel per event
    carrying the event's full LWW ordering pair ``(commit_seq, offset)``,
    and a sentinel tombstone per delete / NULL-content event.

    ``offset``/``commit_seq`` ride VERBATIM, so index arbitration — both
    the per-key LWW inside ``apply_batch`` and the read-side version
    check — reproduces the main table's exactly: the sentinel's winning
    (doc_seq, doc_off) IS the table's winning version, postings from any
    other version (older, late, same-seq-lower-offset) fail the pair
    check.  Documents are the composite ``repo ⊕ path`` string id used by
    the incremental-dedup CDC spellings.  Control events are dropped (the
    index schema never evolves with the table's).  O(batch tokens)."""
    from glad_tiles_pipeline_spark.operators.incremental import CDC_DOC_SEP

    rows = events.filter(F.col("control").isNull())
    doc = F.concat_ws(CDC_DOC_SEP, "repo", "path").alias("__doc")
    live = rows.filter(
        (F.col("op") != "D") & F.col("content").isNotNull()
    ).select("offset", "commit_seq", doc, F.col("content"))
    posts = (
        live.select(
            "offset", "commit_seq", "__doc",
            F.explode(_tokens(F.col("content"))).alias("term"),
        )
        .groupBy("offset", "commit_seq", "__doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    sent = live.select(
        "offset", "commit_seq", "__doc",
        F.lit(DOC_SENTINEL).alias("term"),
        # doc length in the sentinel tf slot, like the batch spelling
        F.size(_tokens(F.col("content"))).cast("long").alias("tf"),
    )
    ev_u = posts.unionByName(sent).withColumn("op", F.lit("U"))
    dead = rows.filter(
        (F.col("op") == "D") | F.col("content").isNull()
    ).select(
        "offset", "commit_seq", doc,
        F.lit(DOC_SENTINEL).alias("term"),
        F.lit(None).cast("long").alias("tf"),
        F.lit("D").alias("op"),
    )
    return ev_u.unionByName(dead).select(
        "offset", "commit_seq", "op",
        F.col("term").alias("repo"),
        F.col("__doc").alias("path"),
        "tf",
        F.col("commit_seq").alias("doc_seq"),
        F.col("offset").alias("doc_off"),
        F.lit(None).cast("string").alias("control"),
    )


def token_index_hook(spark: SparkSession, index: LakeTable,
                     merge_mode: str = "mor"):
    """A ``post_apply`` hook for the T6 bridges / batch planner: MERGE
    each micro-batch's posting events into ``index`` under the batch's
    content-addressed id (prefixed ``tok-``) — one stream maintaining
    table + token index exactly-once, same fencing/crash story as the
    signature-index hook (streaming/dedup_index.py); catch-up after a
    batch-mode crash between the sinks reuses
    ``dedup_index.catch_up_signature_index(hook=token_index_hook(...))``."""
    from glad_tiles_pipeline_spark.operators.merge import apply_batch

    def _hook(df: DataFrame, batch_id: str, offsets: dict) -> dict:
        ev = posting_events_from_changelog(df)
        return apply_batch(
            spark, index, ev, batch_id=f"tok-{batch_id}",
            offsets=offsets, merge_mode=merge_mode, use_arrow_udfs=False,
        )

    return _hook


def search_terms_cdc(
    spark: SparkSession,
    index: LakeTable,
    terms: "list[str]",
    snapshot_id: int | None = None,
) -> DataFrame:
    """CDC spelling of ``search_terms``: (term, repo, path, tf) over a
    changelog-maintained index whose doc ids are the composite
    ``repo ⊕ path`` string — same shared pipeline, different id
    projection."""
    from glad_tiles_pipeline_spark.operators.incremental import CDC_DOC_SEP

    live = _live_postings(spark, index, terms, snapshot_id)
    parts = F.split(F.col("doc_id"), CDC_DOC_SEP, 2)
    return live.select(
        "term",
        parts.getItem(0).alias("repo"),
        parts.getItem(1).alias("path"),
        "tf",
    )


def gc_token_index(
    spark: SparkSession, index: LakeTable, batch_id: str
) -> dict:
    """Background reclamation of version-dead postings: one pass over the
    index joins postings against the live sentinels and emits delete
    events for every posting whose version lost (or whose doc has no
    sentinel) — through the same MERGE, so the GC commit is fenced,
    idempotent, and time-travel-visible like any other.  O(index) read,
    O(dead) write; correctness never depends on running it.

    Works on both index spellings: the stored ``doc_id`` rides back
    VERBATIM as the event ``path`` (batch-numeric or CDC-composite
    alike).  The tombstones are stamped ``(max stored commit_seq + 1,
    offset -1)``: the commit_seq strictly beats every stored row, and no
    legitimate event ever carries a negative offset — so a future
    re-ingest at the same commit_seq (offset ≥ 0) deterministically WINS
    over the GC tombstone instead of tying on the LWW pair."""
    from glad_tiles_pipeline_spark.operators.merge import apply_batch
    from glad_tiles_pipeline_spark.operators.merge_into import max_commit_seq

    full = index.scan(spark).filter(F.col("term") != DOC_SENTINEL)
    sent = _live_sentinels(spark, index)
    dead = full.join(sent, "doc_id", "left").filter(
        F.col("__cur").isNull()
        | (F.col("doc_seq") != F.col("__cur"))
        | (F.col("doc_off") != F.col("__cur_off"))
    )
    seq = max_commit_seq(spark, index)  # O(manifest) via per-file stats
    ev = dead.select(
        F.lit(-1).cast("long").alias("offset"),
        F.lit(seq + 1).cast("long").alias("commit_seq"),
        F.lit("D").alias("op"),
        F.col("term").alias("repo"),
        F.col("doc_id").alias("path"),
        F.lit(None).cast("long").alias("tf"),
        F.lit(None).cast("long").alias("doc_seq"),
        F.lit(None).cast("long").alias("doc_off"),
        F.lit(None).cast("string").alias("control"),
    )
    prev_hi = index.last_committed_offset()
    return apply_batch(spark, index, ev, batch_id, merge_mode="mor",
                       use_arrow_udfs=False,
                       # GC consumes nothing from any upstream log: keep
                       # the offset high-water where it was (the -1 event
                       # offsets must not regress it)
                       offsets={"lo": prev_hi + 1, "hi": prev_hi})
