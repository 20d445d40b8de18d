"""Streaming maintenance of the near-dup signature index (X11'' — the
last piece of the dedup-at-ingest loop).

``operators/incremental.py`` gives the batch composition: a persisted
signature index probed by each incoming batch, corpus never re-shingled.
This module closes the loop for the STREAMING ingest path: the same
foreachBatch bridge (T6) that MERGEs a micro-batch into the main table
also projects that micro-batch onto the signature-index changelog
(``signature_events_from_changelog``) and MERGEs it into the index — one
stream, two tables, both exactly-once.

Exactly-once across BOTH sinks without a cross-table transaction: the two
MERGEs run under the same content-addressed batch id (``s{lo}-{hi}`` from
the micro-batch's offset range, index side prefixed ``sig-``), and each
table's manifest fences its own id.  A crash between the two replays the
micro-batch: the main table no-ops on its committed id, the index applies
its missing one — the pair converges to applied-exactly-once on each side
whichever side the crash falls on.  (Order matters only for liveness, not
correctness: the hook runs after the main MERGE, so the index is never
AHEAD of the table it summarizes beyond the in-flight batch.)

Index semantics: offsets/commit_seq ride through verbatim, so the index's
LWW arbitration IS the table's — the index's winning signature equals the
signature of the table's winning content, with deletes and NULL-content
winners tombstoned out (invariant: index row present iff the live content
is hashable).  Probing it with ``incremental_minhash_neardup`` /
``incremental_simhash_neardup`` (string ids via ``cdc_docs`` /
``index_signatures_cdc``) dedups the NEXT batch against the whole corpus
in O(batch) — the operation a 100 TB pretraining-ingest pipeline runs per
micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.incremental import (
    DEFAULT_N_HASHES,
    DEFAULT_SHINGLE_N,
    signature_events_from_changelog,
)
from glad_tiles_pipeline_spark.plans.lake import LakeTable


def signature_index_hook(
    spark: SparkSession,
    index: LakeTable,
    n_hashes: int = DEFAULT_N_HASHES,
    shingle_n: int = DEFAULT_SHINGLE_N,
    token_hash: str = "sha256",
    merge_mode: str = "mor",
):
    """A ``post_apply`` hook for the T6 bridges: MERGE each micro-batch's
    signature events into ``index`` under the batch's own
    content-addressed id (prefixed ``sig-`` so the two tables' id spaces
    can't collide in logs/metrics).  Idempotent by the index manifest's
    own fencing — safe under stream replay and checkpoint resets, like
    the main MERGE."""
    from glad_tiles_pipeline_spark.operators.merge import apply_batch

    def _hook(df: DataFrame, batch_id: str, offsets: dict) -> dict:
        ev = signature_events_from_changelog(
            df, n_hashes=n_hashes, shingle_n=shingle_n, token_hash=token_hash
        )
        return apply_batch(
            spark, index, ev, batch_id=f"sig-{batch_id}",
            offsets=offsets, merge_mode=merge_mode, use_arrow_udfs=False,
        )

    return _hook


def catch_up_signature_index(
    spark: SparkSession,
    table: LakeTable,
    index: LakeTable,
    changelog_dir: str,
    hook=None,
    constraints: "dict[str, str] | None" = None,
    **hook_kw,
) -> dict | None:
    """Close the batch-planner's crash-between-sinks gap: the batch loop
    advances by the MAIN table's offset high-water, so a crash after the
    main MERGE but before the index hook would otherwise skip that
    window's index update forever.  The index records its OWN offset
    high-water (the hook passes ``offsets`` through), so the un-indexed
    window is exactly ``(index_hi, table_hi]`` — re-read it and apply the
    hook once, as one window.  A wider-than-original window is harmless:
    signature events are LWW-idempotent, like re-merging previously-seen
    events under a wider stream batch (bridge docstring).  No-op (returns
    None) when the index is current.  Run at the top of every batch-mode
    ingest; the stream path doesn't need it (its checkpoint only commits
    AFTER the whole foreachBatch body, so a crash between the two MERGEs
    re-feeds the micro-batch).

    ``constraints`` — the CHECK rule set (X14) IN EFFECT FOR THE WINDOWS
    BEING RECOVERED: the catch-up re-reads the raw changelog, so without
    the same split the recovery would feed the sink rows the table
    quarantined.  Precise contract, stated honestly: this is exact for
    the crash-between-sinks case (the lagging windows ran under these
    rules) and for bootstrap over a uniformly-ruled history.  Two narrow
    flows fall outside it and are deliberately NOT solved here: (1)
    bootstrap over history ingested BEFORE the rules existed — the
    current rules would drop rows the table applied back then; (2)
    bootstrap after a ``requeue_quarantine`` — requeued rows live in the
    table but still match the quarantine record.  Both are
    rules-changed-over-time problems the offset log cannot answer; for
    an exact new-sink bootstrap in those flows use ``backfill_lww_sink``
    (table state at original versions — winners-only is the exact final
    state for any LWW-arbitrated sink) and let this catch-up handle only
    subsequent windows."""
    from glad_tiles_pipeline_spark.plans.planner import batch_id_for
    from glad_tiles_pipeline_spark.sources.changelog import read_changelog_batch

    lo = index.last_committed_offset() + 1
    hi = table.last_committed_offset()
    if lo > hi:
        return None
    if hook is None:
        hook = signature_index_hook(spark, index, **hook_kw)
    events = read_changelog_batch(spark, changelog_dir, lo - 1, hi)
    if constraints is not None:
        # the catch-up re-reads the RAW changelog, but a constrained
        # ingest (X14) diverted violators before main apply AND hooks —
        # without re-applying the same split here, a crash-between-sinks
        # recovery would feed the sink rows the table never saw.  Drop
        # them (no re-quarantine: the quarantine write precedes the main
        # apply in the planner, so every window being caught up already
        # persisted its violators under the ORIGINAL window ids —
        # re-writing them under the catch-up's wider window id would
        # interleave ranges and break the requeue's content addressing).
        from glad_tiles_pipeline_spark.operators.constraints import (
            split_by_constraints,
        )

        events, _ = split_by_constraints(events, constraints)
    return hook(events, batch_id_for(lo, hi), {"lo": lo, "hi": hi})


# the catch-up is hook-generic — any derived index maintained through a
# post_apply hook (signature index, token index, ...) closes its
# crash-between-sinks window the same way
catch_up_derived_index = catch_up_signature_index


def backfill_lww_sink(
    spark: SparkSession,
    table: LakeTable,
    hook,
    snapshot_id: int | None = None,
) -> dict:
    """Exact NEW-SINK bootstrap from TABLE STATE for LWW-arbitrated
    sinks — the two flows the offset-log catch-up cannot answer exactly
    (rules added mid-history, bootstrap after a requeue; see
    ``catch_up_signature_index``) both disappear when the feed is the
    table itself: stored rows at their ORIGINAL ``(_commit_seq,
    _offset)`` are exactly what the table applied — quarantined rows
    absent, requeued rows present, by construction.  Winners-only IS the
    exact final state for any LWW sink (every loser is superseded by the
    stored winner at the sink's own arbitration), which is also why this
    works on UNRESOLVED MoR snapshots: extra stored versions per key are
    just more events the sink arbitrates away.  Delete memos feed as
    ``op='D'`` so late events keep losing to tombstones in the sink too.
    NOT for history-shaped sinks (SCD2 needs losers); those rebuild from
    the full log.

    Commits under a snapshot-addressed batch id with the table's
    high-water AT THAT SNAPSHOT, so the generic catch-up resumes exactly
    after the backfilled range and a re-run no-ops."""
    m = table.manifest(snapshot_id)
    sid = m["snapshot_id"]
    hi = int(m["offsets"]["hi"])
    rows = table.scan(spark, snapshot_id=sid, include_system=True)
    ev = rows.select(
        F.col("_offset").alias("offset"),
        F.col("_commit_seq").alias("commit_seq"),
        F.when(F.col("_deleted"), F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        "repo", "path", "commit", "lang", "content",
        F.lit(None).cast("string").alias("control"),
    )
    return hook(ev, f"backfill-v{sid}", {"lo": 1, "hi": hi})
