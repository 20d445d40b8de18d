"""Declarative CHECK constraints with replay-safe quarantine (X14) —
Delta constraint / DLT-expectation parity for the ingest path.

A 100 TB CDC stream WILL carry malformed events (truncated content,
impossible paths, enum drift).  Failing the whole batch poisons the
pipeline; silently applying them poisons the table.  The production
answer is Delta Live Tables' expectations: declare named boolean
predicates, apply the rows that pass, QUARANTINE the rows that don't —
per batch, exactly-once, auditable.

Semantics (SQL/Delta CHECK):

  * a constraint is violated only when its expression evaluates to
    FALSE — NULL passes (``coalesce(expr, true)``), so a constraint on
    an optional column doesn't reject rows that legitimately omit it;
  * control events (schema evolution) always pass — their payload
    columns are NULL by design;
  * a quarantined row records EVERY constraint it violated (sorted
    array of names), not just the first — the audit trail operators
    actually debug from.

Exactly-once: the quarantine sink is keyed by the batch id and written
with ``mode("overwrite")`` (the T7 late-data pattern,
streaming/bridge.py): a replayed window re-derives the identical split
from the identical events and rewrites the same files — no appended
duplicates, and the main MERGE's own fencing covers the applied side.
Offset accounting: quarantined offsets stay covered by the window's
``(lo, hi)`` — they are consumed-and-diverted, never re-fed, so the
planner's resume point and the derived-index catch-up are unaffected.

Everything is pure column expressions over the batch — one extra
projection and an output-sized quarantine write; the applied-side plan
is unchanged but for one codegen filter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def violations_col(constraints: "dict[str, str]"):
    """Sorted array of the names of every violated constraint — empty
    array when the row passes.  NULL predicate results pass (SQL CHECK);
    control events pass unconditionally."""
    flags = [
        F.when(
            F.col("control").isNull() & ~F.coalesce(F.expr(expr), F.lit(True)),
            F.lit(name),
        )
        for name, expr in sorted(constraints.items())
    ]
    return F.array_compact(F.array(*flags))


def split_by_constraints(
    events: DataFrame, constraints: "dict[str, str]"
) -> "tuple[DataFrame, DataFrame]":
    """``(passing, quarantined)``: quarantined rows carry a
    ``violations: array<string>`` column naming every failed constraint;
    passing rows come back with the input schema unchanged."""
    tagged = events.withColumn("violations", violations_col(constraints))
    ok = tagged.filter(F.size("violations") == 0).drop("violations")
    bad = tagged.filter(F.size("violations") > 0)
    return ok, bad


def quarantine_batch(
    bad: DataFrame, quarantine_dir: str, batch_id: str
) -> int:
    """Write one batch's quarantined rows, replay-safe: the path is keyed
    by the batch id and overwritten, so a replayed window rewrites the
    same content instead of appending duplicates.  Returns the row count
    (0 rows → no directory, keeping empty batches free)."""
    n = bad.count()
    if n:
        bad.write.mode("overwrite").parquet(
            os.path.join(quarantine_dir, f"batch={batch_id}")
        )
    return n


def read_quarantine(spark, quarantine_dir: str) -> DataFrame:
    """All quarantined events across batches (empty-dir tolerant)."""
    try:
        return spark.read.option("basePath", quarantine_dir).parquet(
            os.path.join(quarantine_dir, "batch=*")
        )
    except Exception:
        return spark.createDataFrame([], "offset long, violations array<string>")


def requeue_quarantine(
    spark,
    table,
    quarantine_dir: str,
    constraints: "dict[str, str] | None" = None,
    post_apply=None,
    **apply_kwargs,
) -> dict:
    """Re-apply quarantined events after the rules changed (the lifecycle's
    third act: divert → audit → requeue).  Events still carry their
    ORIGINAL ``(commit_seq, offset)``, so LWW arbitration makes the requeue
    order-free: a key the stream updated since loses to the newer version,
    an untouched key lands exactly as it would have originally — no
    special-case merge logic, the ordinary arbitration IS the repair.

    ``constraints``: the (presumably relaxed) rule set to re-validate
    against — rows still violating stay quarantined (the audit record is
    NEVER mutated here; it is the immutable log of what was diverted).
    ``None`` waives validation and requeues everything.

    Idempotent: the batch id is content-addressed over the quarantined
    offset range AND the rule set (names + expressions), so re-running the
    same requeue no-ops, while a later, further-relaxed requeue gets a
    fresh id and applies the newly-passing rows (already-applied ones are
    LWW-idempotent).  The range is a sound content address because a
    table's quarantine only grows at the top: new violators arrive from
    new ingest windows, whose offsets sit above every prior window's, so
    any quarantine growth moves ``hi`` and with it the id.  (Don't point
    two different tables' ingests at one quarantine dir — their ranges
    interleave and the address stops meaning "this exact set".)  The offset high-water is NOT advanced — quarantined
    offsets sit below it already (consumed-and-diverted), so the planner's
    resume point must not move.

    ``post_apply``: the same derived-sink hook (composition) the ingest
    ran with.  Requeued offsets sit BELOW the high-water, so the generic
    catch-up can never re-feed them to a derived table — the requeue
    itself must, or the signature/token/matview/scd2 sinks permanently
    miss the repaired keys.  The hook runs under the requeue's own
    content-addressed batch id and EVEN WHEN the main apply was fenced as
    a replay: a crash between the main apply and the hook is recovered by
    re-running the same requeue (the committed side no-ops on its id, the
    missed side applies) — the standard asymmetric-crash convergence,
    addressed here by re-invocation instead of the offset catch-up.
    Events reach the hook with their ORIGINAL ``(commit_seq, offset)``,
    so every derived table arbitrates them exactly like the main one.
    """
    import hashlib

    from pyspark.sql import functions as F

    from glad_tiles_pipeline_spark.operators.merge import apply_batch

    q = read_quarantine(spark, quarantine_dir)
    ev = q.drop("violations", "batch")
    n_still_bad = 0
    if constraints is not None:
        ev, still_bad = split_by_constraints(ev, constraints)
        n_still_bad = still_bad.count()
    stats = ev.agg(
        F.min("offset").alias("lo"), F.max("offset").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    if stats["n"] == 0:
        return {"requeued": 0, "still_quarantined": n_still_bad,
                "skipped": True}
    rules = "|".join(
        f"{k}={v}" for k, v in sorted((constraints or {}).items())
    )
    digest = hashlib.sha256(rules.encode()).hexdigest()[:12]
    batch_id = f"rq{stats['lo']}-{stats['hi']}-{digest}"
    hi_now = table.last_committed_offset()
    res = apply_batch(
        spark, table, ev, batch_id,
        offsets={"lo": hi_now + 1, "hi": hi_now},  # high-water unchanged
        **apply_kwargs,
    )
    res["requeued"] = 0 if res.get("skipped") else int(stats["n"])
    res["still_quarantined"] = n_still_bad
    if post_apply is not None:
        # NO_ADVANCE → each sink resolves "keep MY high-water" against its
        # OWN parent inside apply_batch.  Neither alternative is safe for
        # a sink that LAGS the table (crash between sinks, catch-up not
        # yet run): the table's hi would jump the sink's channel past
        # windows it never saw, and offsets=None folds the requeued batch
        # max into the sink's high-water — same skip-forever hazard when
        # some requeued offsets sit above the lagging sink's hi.  The
        # requeue must be invisible to every resume point it touches.
        from glad_tiles_pipeline_spark.operators.merge import NO_ADVANCE

        res["post_apply"] = post_apply(ev, batch_id, NO_ADVANCE)
    return res
