"""EP-B step 1 — the offset-window planner (SURVEY.md §3 EP-B).

Driver-side, pure Python: read the last committed offset from the table's
checkpoint manifest, carve the next offset window, hand it to
``apply_batch``.  Resume-exactly-where-it-stopped falls out of the manifest:
after a crash the next window starts at ``last_committed_offset() + 1``
(BASELINE.json north_star: "replay resumes exactly where it stopped").
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.merge import apply_batch, compact
from glad_tiles_pipeline_spark.plans.lake import CommitConflict, LakeTable
from glad_tiles_pipeline_spark.sources.changelog import read_changelog_batch


def max_offset(spark: SparkSession, changelog_dir: str) -> int:
    """Highest offset present in the log (Parquet footer-stats-friendly agg)."""
    row = (
        spark.read.parquet(changelog_dir)
        .agg(F.max("offset").alias("m"))
        .collect()[0]
    )
    return -1 if row["m"] is None else int(row["m"])


def batch_id_for(lo: int, hi: int, source: str | None = None) -> str:
    """Deterministic batch id from the offset window → idempotent replay.
    Named sources are namespaced: two writers' logs both start at offset
    0, and a shared ``b0-...`` id would make the second source's first
    window read as already committed (silent data loss)."""
    return f"b{lo}-{hi}" if source is None else f"src-{source}-b{lo}-{hi}"


def ingest_changelog(
    spark: SparkSession,
    table: LakeTable,
    changelog_dir: str,
    batch_size: int = 100_000,
    max_batches: int | None = None,
    compact_every: int | None = None,
    post_apply=None,
    constraints: dict | None = None,
    quarantine_dir: str | None = None,
    source: str | None = None,
    **apply_kwargs,
) -> list[dict]:
    """Tail the changelog to the end (or ``max_batches``), one fenced MERGE
    per offset window.  Safe to re-run after any crash/kill.

    ``compact_every=k`` (with ``merge_mode='mor'``) compacts merge-on-read
    deltas after every k batches — the write-amplification knob: ingest
    stays O(batch) per commit, readers pay resolution only between
    compactions.

    ``constraints`` (name → SQL boolean expr, X14): rows violating any
    constraint are diverted to ``quarantine_dir`` (required alongside —
    dropping violators silently is not offered) BEFORE the MERGE and
    before ``post_apply``, so neither the table nor any derived index
    ever sees them; the quarantine write is keyed by batch id and
    overwritten, hence replay-safe (operators/constraints.py).  The
    window still covers the quarantined offsets — consumed-and-diverted,
    never re-fed.

    ``source`` (S29 multi-writer): names this changelog's offset channel.
    N planners tailing N changelogs (CDC shards, per-topic streams) into
    ONE table run CONCURRENTLY: each resumes from its own channel's
    high-water, batch ids are namespaced per source, and the manifest CAS
    serializes the actual commits — a loser's ``CommitConflict`` re-plans
    the same window against the new head (its staged files become vacuum
    orphans), so every window commits exactly once.  Unnamed ingest uses
    the ``default`` channel, byte-identical to the single-writer
    behavior.  Derived sinks (``post_apply``) stay single-writer per
    derived table: give each source its own index/view, or fan all
    sources through one planner.

    ``post_apply(events, batch_id, offsets)`` mirrors the T6 bridge hook
    (streaming/bridge.py): a derived sink riding the same batch window
    (e.g. the dedup signature index).  NOTE the batch loop advances by the
    MAIN table's offset high-water, so a crash between the main MERGE and
    the hook is NOT replayed here (unlike the stream, whose checkpoint
    re-feeds the micro-batch) — pair it with
    ``streaming.dedup_index.catch_up_signature_index`` at the top of each
    run, which closes exactly that gap from the derived table's own
    offset high-water.
    """
    if constraints is not None and quarantine_dir is None:
        raise ValueError(
            "constraints require a quarantine_dir: silently dropping "
            "violating events is not offered (X14 audit contract)"
        )
    results = []
    hi_available = max_offset(spark, changelog_dir)
    chan = source or "default"
    n = 0
    while True:
        lo = table.last_committed_offset(chan) + 1
        if lo > hi_available:
            break
        hi = min(lo + batch_size - 1, hi_available)
        events = read_changelog_batch(spark, changelog_dir, lo - 1, hi)
        n_quarantined = 0
        if constraints is not None:
            from glad_tiles_pipeline_spark.operators.constraints import (
                quarantine_batch,
                split_by_constraints,
            )

            events, bad = split_by_constraints(events, constraints)
            n_quarantined = quarantine_batch(
                bad, quarantine_dir, batch_id_for(lo, hi, source)
            )
        try:
            res = apply_batch(
                spark,
                table,
                events,
                batch_id_for(lo, hi, source),
                offsets={"lo": lo, "hi": hi},
                source=chan,
                **apply_kwargs,
            )
        except CommitConflict:
            # another writer published our target snapshot first — re-plan
            # against the new table state (the loop re-reads the committed
            # offset); our unpublished data files are orphans for vacuum
            continue
        if constraints is not None:
            res["quarantined"] = n_quarantined
        if post_apply is not None:
            res["post"] = post_apply(
                events, batch_id_for(lo, hi, source), {"lo": lo, "hi": hi}
            )
        results.append(res)
        n += 1
        if compact_every is not None and n % compact_every == 0:
            try:
                compact(spark, table)
            except CommitConflict:
                # compaction lost a commit race to a concurrent writer —
                # idempotent and purely an optimization, so skip; the next
                # compact_every interval retries against the new snapshot
                pass
        if max_batches is not None and n >= max_batches:
            break
    return results
