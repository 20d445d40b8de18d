"""SCD Type 2 history materialization (X15) — the CDC downstream a
warehouse runs next to the LWW table: every key keeps EVERY version it
ever had, each stamped with the validity window in the changelog's own
LWW order, so "what did repo/path look like as of version v" is one
filtered read instead of a log replay.

This is Delta Live Tables' ``APPLY CHANGES INTO ... STORED AS SCD TYPE 2``
parity, re-expressed on this engine's machinery:

  * the history lives in a normal ``LakeTable`` keyed
    ``(repo, vkey)`` where ``vkey = path \\x00 seq \\x00 offset``
    (zero-padded so lexicographic order equals numeric order) — one row
    per event, so the row's identity never changes and maintenance is
    pure upserts through the same idempotent MERGE path as every other
    table (batch-id fencing, MoR deltas + compaction, snapshot isolation,
    time travel all free);
  * validity windows are recomputed per touched key by PRUNED TIMELINE
    RECOMPUTE — the SCD2 analog of the matview's pruned group recompute
    (operators/matview.py): the incoming batch names the (repo, path)
    keys it touches, the stored timeline of exactly those keys is read
    back through the S22' key-1 stats prune, the union of stored + new
    events is re-windowed (``lead`` over ``(commit_seq, offset)``), and
    only rows whose window CHANGED (plus the new events' rows) are
    re-upserted — so a batch costs O(touched keys' history) read and
    O(new + boundary-shift) write, never O(corpus);
  * recompute-from-union is SELF-HEALING exactly like the matview: the
    union is a set, so a replayed or widened window (crash-between-sinks
    catch-up via ``streaming/dedup_index.catch_up_derived_index``)
    converges instead of corrupting windows — and LATE events are not a
    special case at all: an event with a mid-timeline ``(seq, off)``
    lands in its ordinal slot, closes its predecessor and is closed by
    its successor, because the window is recomputed rather than patched;
  * deletes are first-class timeline entries: a ``D`` event is stored as
    a row (``v_op = 'D'``, NULL payload) that CLOSES its predecessor's
    window and is never current itself — readers of versions filter it
    out, the recompute needs it (without the marker, a replay would
    resurrect the predecessor as current).

Refresh rows are stamped with the HISTORY table's own monotone commit
counter (``max _commit_seq stored + 1`` — O(manifest) via per-file
stats), not the window's offsets, for the same out-of-order-delivery
reason the matview documents.

``scd2_as_of(seq, off)`` answers the point-in-time read from the history
alone, and at the final version it must equal the MAIN table's live LWW
state — a cross-check ``tests/test_scd2.py`` runs against the real
``apply_batch`` engine.

Oracle: the whole materialization is one window function over the event
log — SQL-expressible by definition; the ``scd2_history`` EXTRA query's
DuckDB twin recomputes ``lead() OVER (PARTITION BY key ORDER BY seq,
off)`` from the same definitional event set.

Event-identity contract: ``(repo, path, commit_seq, offset)`` uniquely
identifies an event (the changelog generator's invariant; replays repeat
rows VERBATIM).  Exact duplicates collapse in the union's ``distinct``;
two DIFFERENT payloads under one identity are a source defect upstream
of this operator.

A payload column named ``lang`` rides the engine's lang normalization,
exactly like the main table (the MERGE path normalizes any field sourced
``lang``) — so the history's ``lang`` equals the table's.  Both
``scd2_state`` and the refresh canonicalize it UP FRONT with the shared
JVM twin (``functions/text.normalize_lang_expr``): the stored timeline
holds normalized values, and a raw re-fed event must collapse into its
stored row in the union's ``distinct``, not sit beside it as a
same-identity twin with a different payload.  Payloads that must store
verbatim use a different column name (the matview/rowops convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from glad_tiles_pipeline_spark.plans.lake import LakeTable

# vkey separator: \x00 sorts below every printable path byte, and the
# fixed %020d padding makes string order equal numeric (seq, off) order
_SEP = "\x00"


def scd2_schema(payload_fields: "list[tuple[str, T.DataType]]") -> T.StructType:
    """History-table schema. Keys: (repo, vkey). ``rpath`` carries the
    real path (vkey is the composite row identity), ``v_seq/v_off/v_op``
    the originating event's identity and op, then the payload snapshot,
    then the recomputed validity window."""
    fields = [
        T.StructField("repo", T.StringType()),
        T.StructField("vkey", T.StringType()),
        T.StructField("rpath", T.StringType()),
        T.StructField("v_seq", T.LongType()),
        T.StructField("v_off", T.LongType()),
        T.StructField("v_op", T.StringType()),
    ]
    fields += [T.StructField(n, t) for n, t in payload_fields]
    fields += [
        T.StructField("valid_to_seq", T.LongType()),
        T.StructField("valid_to_off", T.LongType()),
        T.StructField("is_current", T.BooleanType()),
    ]
    return T.StructType(fields)


def create_scd2_history(
    root: str,
    payload_fields: "list[tuple[str, T.DataType]]",
    n_buckets: int = 8,
    io=None,
) -> LakeTable:
    return LakeTable.create(
        root, schema=scd2_schema(payload_fields), n_buckets=n_buckets, io=io
    )


def _vkey(path_col, seq_col, off_col):
    return F.concat(
        path_col, F.lit(_SEP),
        F.format_string("%020d", seq_col), F.lit(_SEP),
        F.format_string("%020d", off_col),
    )


def _canon_payload(ev: DataFrame, payload_cols: "list[str]") -> DataFrame:
    """Canonicalize payload columns the engine's apply path would rewrite
    anyway (today: ``lang`` normalization), so batch events and stored
    history rows agree byte-for-byte and replays dedup exactly."""
    if "lang" in payload_cols:
        from glad_tiles_pipeline_spark.functions.text import normalize_lang_expr

        ev = ev.withColumn(
            "lang",
            F.when(F.col("op") != "D", normalize_lang_expr("lang")),
        )
    return ev


def _window_timeline(ev: DataFrame) -> DataFrame:
    """Recompute validity windows over a deduplicated event set with
    columns (repo, path, commit_seq, offset, op, *payload): one ``lead``
    per key in LWW order.  Pure window arithmetic — stays JVM-side."""
    w = Window.partitionBy("repo", "path").orderBy("commit_seq", "offset")
    return ev.select(
        "*",
        F.lead("commit_seq").over(w).alias("valid_to_seq"),
        F.lead("offset").over(w).alias("valid_to_off"),
    ).withColumn(
        "is_current",
        F.col("valid_to_seq").isNull() & (F.col("op") != F.lit("D")),
    )


def scd2_state(events: DataFrame, payload_cols: "list[str]") -> DataFrame:
    """Definitional batch operator: the full SCD2 version table from one
    changelog DataFrame (columns offset, commit_seq, op, repo, path,
    *payload_cols[, control]).  Returns one row per NON-DELETE event with
    its validity window — deletes contribute only by closing windows.
    This is the spelling the incremental path must equal (and the DuckDB
    oracle recomputes verbatim)."""
    cols = ["offset", "commit_seq", "op", "repo", "path", *payload_cols]
    ev = events
    if "control" in ev.columns:
        ev = ev.filter(F.col("control").isNull())
    timeline = _window_timeline(
        _canon_payload(ev.select(*cols), payload_cols).distinct()
    )
    return timeline.filter(F.col("op") != "D").select(
        "repo",
        F.col("path").alias("rpath"),
        F.col("commit_seq").alias("v_seq"),
        F.col("offset").alias("v_off"),
        *payload_cols,
        "valid_to_seq",
        "valid_to_off",
        "is_current",
    )


def scd2_refresh_events(
    spark: SparkSession,
    history: LakeTable,
    batch: DataFrame,
    payload_cols: "list[str]",
    version: int,
    _pin: "list | None" = None,
) -> DataFrame:
    """History change events for one micro-batch: re-window the touched
    keys' timelines (stored ∪ batch) and upsert the rows that are new or
    whose window moved.

    Plan shape: the stored read is ``scan(repos=touched repos)`` — key-1
    stats-pruned — semi-joined to the exact touched (repo, path) pairs
    (batch-sized, so AQE broadcasts it in the common push shape); the
    re-window shuffles O(touched timelines); the changed-only filter is a
    join back against the same stored frame on the row identity, so an
    idempotent replay emits ZERO events (gate-tested) while still
    committing the window's high-water.  The stored frame feeds BOTH the
    union leg and the changed-only leg: ``refresh_scd2`` passes ``_pin``
    so it is persisted once (single pruned read) and unpersisted after
    the commit — without it the plan scans the history files twice
    (verified on the executed plan)."""
    ev_cols = ["offset", "commit_seq", "op", "repo", "path", *payload_cols]
    fresh = _canon_payload(
        batch.filter(F.col("control").isNull()).select(*ev_cols),
        payload_cols,
    ).distinct()
    repos = [
        r["repo"] for r in fresh.select("repo").distinct().collect()
    ]

    stored = history.scan(spark, repos=repos) if repos else None
    if stored is not None:
        # affected-suffix restriction: a batch can only move the windows
        # of stored versions AT OR ABOVE its per-key minimum identity,
        # plus the single BOUNDARY version just below it (its window may
        # now close into the batch's earliest event).  Everything older
        # keeps its window verbatim — no new event lands below the batch
        # minimum, so those rows' successors are unchanged stored rows.
        # In-order ingest (batch min > every stored version) therefore
        # re-windows ONE stored row per key: maintenance is O(batch), not
        # O(timeline); a late event pulls in exactly the suffix it
        # reorders.
        bmin = fresh.groupBy("repo", "path").agg(
            F.min(F.struct(F.col("commit_seq"), F.col("offset"))).alias(
                "_bmin"
            )
        )
        st = stored.select(
            F.col("v_off").alias("offset"),
            F.col("v_seq").alias("commit_seq"),
            F.col("v_op").alias("op"),
            "repo",
            F.col("rpath").alias("path"),
            *payload_cols,
            F.col("valid_to_seq").alias("_old_to_seq"),
            F.col("valid_to_off").alias("_old_to_off"),
            F.col("is_current").alias("_old_current"),
        ).join(bmin, on=["repo", "path"], how="inner")
        ident = F.struct(F.col("commit_seq"), F.col("offset"))
        if _pin is not None:
            st = st.persist()
            _pin.append(st)
        suffix = st.filter(ident >= F.col("_bmin"))
        below = st.filter(ident < F.col("_bmin"))
        bnd = below.groupBy("repo", "path").agg(
            F.max(F.struct(F.col("commit_seq"), F.col("offset"))).alias(
                "_bid"
            )
        )
        boundary = below.join(bnd, on=["repo", "path"], how="inner").filter(
            F.struct(F.col("commit_seq"), F.col("offset")) == F.col("_bid")
        ).drop("_bid")
        stored = suffix.unionByName(boundary).drop("_bmin")
        union = fresh.unionByName(
            stored.drop("_old_to_seq", "_old_to_off", "_old_current")
        ).distinct()
    else:
        union = fresh
    timeline = _window_timeline(union)
    if stored is not None:
        # changed-only: drop rows whose recomputed window equals the
        # stored one (null-safe on the open end) — replays write nothing
        old = stored.select(
            "repo", "path", "commit_seq", "offset",
            "_old_to_seq", "_old_to_off", "_old_current",
        )
        timeline = timeline.join(
            old, on=["repo", "path", "commit_seq", "offset"], how="left"
        ).filter(
            ~(
                F.col("valid_to_seq").eqNullSafe(F.col("_old_to_seq"))
                & F.col("valid_to_off").eqNullSafe(F.col("_old_to_off"))
                & F.col("is_current").eqNullSafe(F.col("_old_current"))
            )
        ).drop("_old_to_seq", "_old_to_off", "_old_current")
    return timeline.select(
        F.lit(version).cast("long").alias("offset"),
        F.lit(version).cast("long").alias("commit_seq"),
        F.lit("U").alias("op"),
        "repo",
        _vkey(F.col("path"), F.col("commit_seq"), F.col("offset")).alias(
            "path"
        ),
        F.col("path").alias("rpath"),
        F.col("commit_seq").alias("v_seq"),
        F.col("offset").alias("v_off"),
        F.col("op").alias("v_op"),
        *payload_cols,
        "valid_to_seq",
        "valid_to_off",
        "is_current",
        F.lit(None).cast("string").alias("control"),
    )


def refresh_scd2(
    spark: SparkSession,
    history: LakeTable,
    batch: DataFrame,
    payload_cols: "list[str]",
    batch_id: str,
    offsets: dict | None = None,
    merge_mode: str = "mor",
) -> dict:
    """One history refresh through the real MERGE path — idempotent on
    ``batch_id``, offsets pass through for the generic catch-up."""
    from glad_tiles_pipeline_spark.operators.merge import apply_batch
    from glad_tiles_pipeline_spark.operators.merge_into import max_commit_seq

    version = max_commit_seq(spark, history) + 1
    pin: list = []
    ev = scd2_refresh_events(spark, history, batch, payload_cols, version,
                             _pin=pin)
    try:
        return apply_batch(
            spark, history, ev, batch_id=batch_id, offsets=offsets,
            merge_mode=merge_mode, use_arrow_udfs=False,
        )
    finally:
        for df in pin:
            df.unpersist()


def scd2_hook(
    spark: SparkSession,
    history: LakeTable,
    payload_cols: "list[str]",
    merge_mode: str = "mor",
):
    """A ``post_apply`` hook for the T6 bridges / batch planner: after the
    main MERGE, fold the micro-batch into the history under the batch's
    content-addressed id (``scd2-`` prefix).  Exactly-once across table +
    history by the same asymmetric-crash argument as the signature index
    (streaming/dedup_index.py); the batch-mode crash-between-sinks window
    closes via ``catch_up_derived_index``."""

    def _hook(df: DataFrame, batch_id: str, offsets: dict) -> dict:
        return refresh_scd2(
            spark, history, df, payload_cols,
            batch_id=f"scd2-{batch_id}", offsets=offsets,
            merge_mode=merge_mode,
        )

    return _hook


def read_scd2(
    spark: SparkSession,
    history: LakeTable,
    repos: "list[str] | None" = None,
    current_only: bool = False,
) -> DataFrame:
    """Version rows (delete markers filtered out).  A per-repo read is
    stats-pruned like any key-1 scan."""
    df = history.scan(spark, repos=repos).filter(F.col("v_op") != "D")
    if current_only:
        df = df.filter(F.col("is_current"))
    return df.drop("vkey")


def scd2_as_of(
    spark: SparkSession,
    history: LakeTable,
    seq: int,
    off: "int | None" = None,
    repos: "list[str] | None" = None,
) -> DataFrame:
    """Point-in-time read from the history alone: the version visible at
    LWW instant ``(seq, off)`` (``off=None`` = end of ``seq``) — rows
    whose window contains the instant.  At the final instant this equals
    the main table's live LWW state (cross-checked in tests).  One
    filtered scan; no log replay, no snapshot needed."""
    if off is None:
        off = (1 << 62)
    at = F.struct(F.lit(seq).cast("long"), F.lit(off).cast("long"))
    frm = F.struct(F.col("v_seq"), F.col("v_off"))
    to = F.struct(F.col("valid_to_seq"), F.col("valid_to_off"))
    df = history.scan(spark, repos=repos).filter(
        (F.col("v_op") != "D")
        & (frm <= at)
        & (F.col("valid_to_seq").isNull() | (to > at))
    )
    return df.drop("vkey")
