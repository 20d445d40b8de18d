"""EP-C — the streaming ingest path (SURVEY.md §3 EP-C, §2.9 T1–T7).

``readStream`` over the changelog directory → optional in-stream hygiene
(watermark T1, dedup-within-watermark T4) → **foreachBatch bridge (T6)**:
every micro-batch goes through exactly the same ``apply_batch`` MERGE path
as batch ingest, with Spark's monotonic ``batch_id`` as the fencing /
idempotence token.

Exactly-once, end-to-end: Spark's streaming checkpoint guarantees a
micro-batch is re-delivered with the SAME batch_id after a crash; the lake
table's manifest records every committed batch_id; ``apply_batch`` no-ops on
a replayed id (BASELINE.json north_star: "idempotent MERGE ... exactly-once
sink").  The two commit logs (Spark checkpoint + table manifest) therefore
never double-apply, whichever side the crash falls on.

Late-data policy (T7): LWW-by-commit-order makes late events *semantically
harmless* — a late event simply loses (or wins) the arg-max like any other —
so the default is to merge them.  ``quarantine_dir`` opts into the stricter
policy for feeds where lateness beyond the watermark means corruption:
those rows are appended to a quarantine parquet sink and counted in the
batch metrics instead of merged.

Scale notes: micro-batch size is bounded by ``maxFilesPerTrigger`` (source
side), so state on the cluster is O(batch), not O(stream); the watermark
bounds ``dropDuplicatesWithinWatermark`` state.  ``Trigger.AvailableNow``
drains the backlog in bounded batches then stops — the production loop is
the same query with a continuous trigger.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.merge import apply_batch
from glad_tiles_pipeline_spark.plans.lake import CommitConflict, LakeTable
from glad_tiles_pipeline_spark.sources.changelog import read_changelog_stream

# A CommitConflict in foreachBatch means a CONCURRENT writer won the
# manifest CAS — the micro-batch itself is still valid, so the bridge
# retries the apply against the new head instead of letting the conflict
# kill the streaming query (Spark would re-run the task a few times and
# then fail the whole stream).  Bounded: the writer is making no progress
# if it loses this many CAS races in a row against the same micro-batch.
_CONFLICT_RETRIES = 12


def with_stream_hygiene(
    events: DataFrame,
    watermark: str | None = "10 minutes",
    dedup_keys: list[str] | None = None,
) -> DataFrame:
    """T1 + T4: bound event-time state and drop exact duplicate deliveries.

    ``dedup_keys`` defaults to ``["offset"]`` — the offset is globally
    unique, so any re-delivery of the same event (at-least-once source) is
    dropped inside the watermark window.
    """
    out = events
    if watermark is not None:
        out = out.withWatermark("ts", watermark)
        if dedup_keys is not None:
            out = out.dropDuplicatesWithinWatermark(dedup_keys)
    elif dedup_keys is not None:
        out = out.dropDuplicates(dedup_keys)
    return out


def _guard_pruned_log(table, changelog_dir, channel) -> None:
    """Pruned-log guard (mirror of ``read_changelog_batch``'s): a FRESH
    stream checkpoint re-feeds whatever files still exist, so a table
    whose resume point sits below the prune horizon would silently miss
    the truncated range.  A table at/above the horizon is safe — replayed
    files no-op via fencing + LWW."""
    if changelog_dir is None:
        return
    from glad_tiles_pipeline_spark.sources.changelog import prune_horizon

    h = prune_horizon(changelog_dir)
    resume = table.last_committed_offset(channel or "default")
    if h > resume:
        raise ValueError(
            f"table resume point {resume} is below the changelog prune "
            f"horizon {h}; the truncated range cannot be re-fed"
        )


def stream_ingest(
    spark: SparkSession,
    table: LakeTable,
    changelog_dir: str | None,
    checkpoint_dir: str,
    *,
    source: DataFrame | None = None,
    max_files_per_trigger: int | None = None,
    watermark: str | None = None,
    dedup_keys: list[str] | None = None,
    quarantine_dir: str | None = None,
    late_threshold: str | None = None,
    await_termination: bool = True,
    post_apply=None,
    constraints: dict | None = None,
    check_quarantine_dir: str | None = None,
    channel: str | None = None,
    compact_every: int | None = None,
    compact_policy: dict | None = None,
    **apply_kwargs,
) -> list[dict]:
    """Drain the changelog into the lake table via foreachBatch (T6).

    Runs with ``Trigger.AvailableNow`` (bounded replay); returns the
    per-micro-batch ``apply_batch`` summaries.  Safe to re-run: replayed
    micro-batches are detected by batch_id and skipped.

    The fencing batch_id is CONTENT-ADDRESSED — ``s{lo}-{hi}`` from the
    micro-batch's own offset range, like the batch planner's ``b{lo}-{hi}``
    — never Spark's checkpoint-relative epoch number.  An epoch-based id
    silently collides after a checkpoint reset (fresh checkpoint → epoch
    restarts at 0 → a batch containing NEW data matches an old committed
    id and is dropped); the offset range keeps fencing tied to what the
    batch actually holds, and re-merging previously-seen events under a
    wider range is harmless by LWW idempotence.

    ``compact_every`` (in-loop maintenance, the batch planner's knob for
    the stream): after every K APPLIED micro-batches, run POLICY-DRIVEN
    compaction — ``plan_compaction`` picks only the buckets whose
    merge-on-read delta count exceeds the read-amplification threshold
    (override thresholds via ``compact_policy``, kwargs for
    ``plan_compaction``), so each maintenance round stays O(step) and a
    continuously-running stream writer never accumulates unbounded
    deltas.  A maintenance-time ``CommitConflict`` (lost a race to a
    concurrent writer) is an optimization failure, not an ingest failure
    — skipped, retried at the next interval.
    """
    _guard_pruned_log(table, changelog_dir, channel)
    results: list[dict] = []
    _apply = _make_foreach_batch(
        spark, table, results, quarantine_dir, late_threshold, apply_kwargs,
        post_apply=post_apply, constraints=constraints,
        check_quarantine_dir=check_quarantine_dir, channel=channel,
        compact_every=compact_every, compact_policy=compact_policy,
    )

    events = _resolve_source(spark, changelog_dir, source, max_files_per_trigger)
    events = with_stream_hygiene(events, watermark=watermark, dedup_keys=dedup_keys)

    query = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return results


def _resolve_source(
    spark: SparkSession,
    changelog_dir: str | None,
    source: DataFrame | None,
    max_files_per_trigger: int | None,
) -> DataFrame:
    """Either the default file-based changelog tail, or ANY caller-supplied
    streaming DataFrame with the changelog schema (a Kafka reader, the
    ``cdc_gen`` Python DataSource, ...) — the bridge is source-agnostic."""
    if source is not None:
        if not source.isStreaming:
            raise ValueError("source must be a streaming DataFrame")
        return source
    if changelog_dir is None:
        raise ValueError("need either changelog_dir or source")
    return read_changelog_stream(
        spark, changelog_dir, max_files_per_trigger=max_files_per_trigger
    )


def stream_ingest_continuous(
    spark: SparkSession,
    table: LakeTable,
    changelog_dir: str | None,
    checkpoint_dir: str,
    *,
    source: DataFrame | None = None,
    processing_time: str = "1 second",
    max_files_per_trigger: int | None = None,
    watermark: str | None = None,
    dedup_keys: list[str] | None = None,
    quarantine_dir: str | None = None,
    late_threshold: str | None = None,
    post_apply=None,
    constraints: dict | None = None,
    check_quarantine_dir: str | None = None,
    channel: str | None = None,
    compact_every: int | None = None,
    compact_policy: dict | None = None,
    **apply_kwargs,
):
    """The production loop: the SAME query as ``stream_ingest`` under a
    processing-time trigger — it keeps firing as new changelog files land
    instead of draining once and stopping.  Returns ``(query, results)``:
    ``results`` grows by one summary per applied micro-batch; the caller
    owns the lifecycle (``query.stop()``).

    A stop (or crash) mid-batch is safe by construction: the micro-batch
    either committed its snapshot or didn't, and on restart the replayed
    batch's content-addressed id makes the MERGE a no-op if it did —
    identical fencing to the AvailableNow path, which is the point: one
    code path, two triggers."""
    _guard_pruned_log(table, changelog_dir, channel)
    results: list[dict] = []
    _apply = _make_foreach_batch(
        spark, table, results, quarantine_dir, late_threshold, apply_kwargs,
        post_apply=post_apply, constraints=constraints,
        check_quarantine_dir=check_quarantine_dir, channel=channel,
        compact_every=compact_every, compact_policy=compact_policy,
    )
    events = _resolve_source(spark, changelog_dir, source, max_files_per_trigger)
    events = with_stream_hygiene(events, watermark=watermark, dedup_keys=dedup_keys)
    query = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=processing_time)
        .start()
    )
    return query, results


def _make_foreach_batch(
    spark: SparkSession,
    table: LakeTable,
    results: list[dict],
    quarantine_dir: str | None,
    late_threshold: str | None,
    apply_kwargs: dict,
    post_apply=None,
    constraints: dict | None = None,
    check_quarantine_dir: str | None = None,
    channel: str | None = None,
    compact_every: int | None = None,
    compact_policy: dict | None = None,
):
    if constraints is not None and check_quarantine_dir is None:
        raise ValueError(
            "constraints require a check_quarantine_dir: silently dropping "
            "violating events is not offered (X14 audit contract)"
        )
    # S29 multi-writer: a NAMED channel namespaces the fencing id, exactly
    # like the batch planner's ``src-{source}-b{lo}-{hi}`` — two streams
    # tailing two logs that both start at offset 0 must not share a
    # ``s0-...`` id (the second would read as already committed: silent
    # drop).  It also names the offset channel apply_batch advances.  The
    # kwarg is ``channel`` (not the planner's ``source``) only because the
    # bridge's ``source=`` is taken by the caller-supplied streaming
    # DataFrame.  The unnamed default keeps the legacy ``s{lo}-{hi}``
    # spelling so existing tables/checkpoints resume without re-fencing.
    channel = channel or "default"
    if channel != "default" and post_apply is not None:
        # Same honesty contract as the CLI's --source refusal: derived
        # sinks are single-writer per derived table (their batch-mode
        # catch-up is addressed by the main table's verbatim offset
        # scalar, which interleaved writers alternate, and concurrent
        # hooks would race on the derived table's own manifest CAS).
        # Maintain derived tables from the unnamed single-writer ingest.
        raise ValueError(
            "a named channel cannot be combined with post_apply derived "
            "sinks; maintain derived tables from the default channel"
        )
    apply_kwargs = {**apply_kwargs, "source": channel}
    id_prefix = "s" if channel == "default" else f"src-{channel}-s"
    applied = {"n": 0}  # non-skipped applies, for the compact_every cadence

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        df = batch_df
        # One slim job pins the batch's identity + offsets (column-pruned
        # offset/ts scan); also feeds the late-event cut.
        stats = df.agg(
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
            F.max("ts").alias("max_ts"),
        ).collect()[0]
        if stats["lo"] is None:
            return  # empty micro-batch: nothing to commit
        content_batch_id = f"{id_prefix}{int(stats['lo'])}-{int(stats['hi'])}"
        offsets = {"lo": int(stats["lo"]), "hi": int(stats["hi"])}

        n_late = 0
        if quarantine_dir is not None and late_threshold is not None:
            # T7 strict policy: quarantine events whose event-time lags the
            # batch's own max ts by more than the threshold.  The sink path
            # is keyed by batch_id and overwritten, so a replayed
            # micro-batch rewrites the same files instead of appending
            # duplicates (exactly-once for the quarantine too).
            cut = F.lit(stats["max_ts"]) - F.expr(f"INTERVAL {late_threshold}")
            late = df.filter(F.col("ts") < cut)
            n_late = late.count()
            if n_late:
                late.write.mode("overwrite").parquet(
                    os.path.join(quarantine_dir, f"batch={content_batch_id}")
                )
            df = df.filter(F.col("ts") >= cut)
        n_checked_out = 0
        if constraints is not None:
            # X14 CHECK constraints, same replay-safe overwrite contract as
            # the late-data quarantine above but its OWN directory (the two
            # schemas differ: violators carry a `violations` array).  Runs
            # after the late cut — a row both late and invalid is late.
            from glad_tiles_pipeline_spark.operators.constraints import (
                quarantine_batch,
                split_by_constraints,
            )

            df, bad = split_by_constraints(df, constraints)
            n_checked_out = quarantine_batch(
                bad, check_quarantine_dir, content_batch_id
            )
        for attempt in range(_CONFLICT_RETRIES + 1):
            try:
                res = apply_batch(
                    spark, table, df, batch_id=content_batch_id,
                    offsets=offsets, **apply_kwargs,
                )
                break
            except CommitConflict:
                # Losing the CAS publishes NOTHING (our staged files are
                # vacuum orphans), so a plain retry re-plans against the
                # refreshed head; if an earlier attempt DID commit, the
                # content-addressed batch_id makes the retry a no-op.
                if attempt == _CONFLICT_RETRIES:
                    raise
                time.sleep(min(0.05 * (2 ** attempt), 1.0))
        res["quarantined"] = n_late
        if constraints is not None:
            res["check_quarantined"] = n_checked_out
        if post_apply is not None:
            # Derived sinks riding the SAME micro-batch (e.g. the dedup
            # signature index, streaming/dedup_index.py).  Runs after the
            # main MERGE, so a crash between the two replays the batch
            # with the same content-addressed id: the main table no-ops
            # and the hook retries — the hook MUST therefore be
            # idempotent on the batch id (ours are: they're apply_batch
            # MERGEs with their own fencing).
            res["post"] = post_apply(df, content_batch_id, offsets)
        results.append(res)
        if compact_every is not None and not res.get("skipped"):
            applied["n"] += 1
            if applied["n"] % compact_every == 0:
                _maintain(spark, table, compact_policy, res)

    return _apply


def _maintain(spark, table, compact_policy, res) -> None:
    """Policy-driven in-loop compaction (see ``stream_ingest`` docstring):
    ``plan_compaction`` selects only read-amplified buckets, so the round
    is O(step); a lost commit race is skipped — the deltas are still
    there and the next interval re-plans against the new head."""
    from glad_tiles_pipeline_spark.operators.merge import (
        compact,
        plan_compaction,
    )

    todo = plan_compaction(table, **(compact_policy or {}))
    if not todo:
        return
    try:
        res["compacted_buckets"] = compact(spark, table, buckets=todo)[
            "compacted_buckets"
        ]
    except CommitConflict:
        pass


def stream_metrics(
    events: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """T2: events/sec health stream — tumbling (or sliding) window counts per
    op code, watermarked so state is bounded.  Works on batch frames too
    (same plan, no watermark state) — that twin is the DuckDB-checked
    ``stream_tumbling_counts`` query."""
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(win.alias("win"), F.col("op"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "op",
            "n_events",
        )
    )
