"""Generic ``MERGE INTO`` — Delta/Iceberg row-level merge parity on top
of the engine's own exactly-once CDC apply path.

``apply_batch`` (operators/merge.py) is the CDC-shaped merge: a changelog
of (offset, commit_seq, op) events arbitrated by LWW.  Real lakehouse
users also run the DECLARATIVE form::

    MERGE INTO target t USING source s ON t.k = s.k
    WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE
    WHEN NOT MATCHED [AND cond] THEN INSERT ...

This module COMPILES that statement into one changelog micro-batch and
feeds the existing ``apply_batch`` — so a MERGE inherits, with zero new
write-path code: content-addressed batch-id fencing (idempotent replay),
all three merge modes (cow / mor / mor_dv positional deletes), stats +
bloom manifest attachment, snapshot isolation, time travel, and the
kill -9 crash-resume story the CDC path is tested under.

Scale shape (the 100 TB argument):

* the matched/not-matched classification joins the source against a
  live read PRUNED to the buckets the source keys hash to — the engine's
  own partition-pruning rule; a merge touching K of B buckets never
  reads the other B-K (bucket ids are a pure key function, computed with
  the same ``xxhash64`` expression the write path uses, so driver and
  executors cannot disagree);
* one equi-join on the key (full_outer, both sides bucket-bounded),
  then the compiled events enter ``apply_batch``'s normal one-shuffle
  pipeline.  No driver-side data movement: the only collects are the
  affected-bucket id set (≤ n_buckets ints) and the duplicate-source
  guard (LIMIT 1);
* clause arithmetic is pure column expressions (whole-stage codegen) —
  no UDFs anywhere on the path.

Semantics notes (Delta parity):

* a source with two rows for one key makes the merge ambiguous — refused
  up front (Delta raises the same way);
* WHEN MATCHED THEN DELETE is evaluated before UPDATE when both clauses
  are present (document order of the two kwargs is fixed: delete wins
  where its condition holds);
* matched rows where no clause fires are left untouched (no event is
  emitted for them — under every merge mode the absent key keeps its
  stored row);
* UPDATE SET only rewrites the named columns; unnamed payload columns
  keep the target's value (copied into the event, since apply_batch
  events carry full rows);
* the merge's events get ``commit_seq = max stored commit_seq + 1``
  (read O(manifest) from the per-file _commit_seq stats the writers
  already record), so they beat every stored row under the engine's LWW
  order — and a later CDC batch with a higher commit_seq beats them,
  exactly like Delta's version ordering;
* the changelog-offset high-water is passed through UNCHANGED (a MERGE
  consumes nothing from the upstream log), so a changelog-fed table can
  be merged into without corrupting the ingest planner's resume point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.functions.hashing import bucket_col
from glad_tiles_pipeline_spark.plans.lake import LakeTable


def max_commit_seq(spark: SparkSession, table: LakeTable) -> int:
    """Largest ``_commit_seq`` stored in the current snapshot, O(manifest)
    via the per-file column stats (S22).  ``dv`` sidecars hold (path, pos)
    rows — no commit_seq column — and are skipped; if any ROW file lacks
    the stat (never the case for files this engine wrote, but cheap to
    stay correct about) the answer falls back to a slim system-column
    scan of just those files' buckets."""
    m = table.manifest()
    hi = -1
    missing_buckets: set[int] = set()
    for f in m["files"]:
        if f.get("kind") == "dv":
            continue
        s = (f.get("stats") or {}).get("_commit_seq")
        if s is None:
            if f["rows"] > 0:
                missing_buckets.add(int(f["bucket"]))
            continue
        hi = max(hi, int(s[1]))
    if missing_buckets:
        # bucket pruning is ambiguous mid-migration — scan(buckets=)
        # refuses there, so fall back to the unpruned raw read
        kw = (
            {"buckets": missing_buckets} if table.migration() is None else {}
        )
        row = (
            table.scan(spark, include_system=True, **kw)
            .agg(F.max("_commit_seq").alias("m"))
            .collect()[0]
        )
        if row["m"] is not None:
            hi = max(hi, int(row["m"]))
    return hi


def _as_col(expr: "Column | str | None") -> Column | None:
    if expr is None:
        return None
    return F.expr(expr) if isinstance(expr, str) else expr


def validate_settable(by_name: dict, clause: str, names) -> None:
    """Refuse SET/INSERT targets that aren't event-settable: unknown
    columns, the two key fields (ids 1/2 — the upsert identity), columns
    without a changelog source mapping, and the engine-derived sha (it is
    recomputed from content post-dedup; a caller-supplied value would go
    stale the moment content changes).  Shared by ``merge_into`` and the
    predicate row-ops (operators/rowops.py)."""
    for name in names or ():
        f = by_name.get(name)
        if f is None:
            raise ValueError(f"{clause}: no such column {name!r}")
        if f["id"] in (1, 2):
            raise ValueError(f"{clause}: key column {name!r} cannot be set")
        if f.get("source") is None:
            raise ValueError(
                f"{clause}: column {name!r} has no changelog source "
                "mapping (evolve(add_column, source=...) to make it "
                "event-settable)"
            )
        if f.get("source") == "content_sha":
            raise ValueError(
                f"{clause}: {name!r} is engine-derived "
                "(sha256 of content) and cannot be set by a MERGE"
            )


def merge_into(
    spark: SparkSession,
    table: LakeTable,
    source: DataFrame,
    batch_id: str,
    *,
    when_matched_update: "dict[str, Column | str] | None" = None,
    matched_condition: "Column | str | None" = None,
    when_matched_delete: bool = False,
    delete_condition: "Column | str | None" = None,
    when_not_matched_insert: "dict[str, Column | str] | None" = None,
    insert_condition: "Column | str | None" = None,
    merge_mode: str = "cow",
    use_arrow_udfs: bool = True,
    conflict_retries: int = 0,
) -> dict:
    """Run one declarative MERGE of ``source`` into ``table``.

    ``source`` must carry the table's two key columns under their CURRENT
    schema names, at most one row per key.  Set-expressions and clause
    conditions are Columns or SQL strings and may reference ``s.<col>``
    (source) and ``t.<col>`` (target) — e.g.
    ``when_matched_update={"n_chars": "t.n_chars + s.n_chars"}``.
    Returns ``apply_batch``'s summary dict extended with the merge's own
    counters (source_rows, matched/updated/deleted/inserted,
    buckets_read).  Idempotent on ``batch_id`` like every commit.

    ``conflict_retries`` (OCC under concurrent writers): losing the
    manifest CAS means the clause verdicts and ``commit_seq`` were derived
    against a head another writer has since replaced — a blind re-apply
    could merge stale target values, so each retry RECOMPILES the whole
    statement against the new head (serializable: the winning merge is
    equivalent to one that ran entirely after the conflicting commit).
    The loser's staged files become vacuum orphans; 0 keeps the
    raise-to-caller behavior."""
    if not (when_matched_update or when_matched_delete or when_not_matched_insert):
        raise ValueError("MERGE with no WHEN clause does nothing — refused")

    fields = table.current_fields()
    by_name = {f["name"]: f for f in fields}
    key1 = next(f["name"] for f in fields if f["id"] == 1)
    key2 = next(f["name"] for f in fields if f["id"] == 2)
    for k in (key1, key2):
        if k not in source.columns:
            raise ValueError(f"source is missing key column {k!r}")
    validate_settable(by_name, "when_matched_update", when_matched_update)
    validate_settable(
        by_name, "when_not_matched_insert", when_not_matched_insert
    )

    # ambiguous-merge guard (Delta parity): ≤1 source row per key
    dup = (
        source.groupBy(key1, key2)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        r = dup[0]
        raise ValueError(
            f"multiple source rows match key ({r[key1]!r}, {r[key2]!r}) — "
            "MERGE is ambiguous; pre-aggregate the source"
        )

    # bucket-pruned live read: buckets are a pure function of the key's
    # event-string form (the same expression the write path hashes), so
    # the untouched buckets are provably irrelevant to every clause.
    _, n_buckets = table.write_layout()
    skey = source.select(
        F.col(key1).cast("string").alias("repo"),
        F.col(key2).cast("string").alias("path"),
    )
    affected = {
        int(r["b"])
        for r in skey.select(bucket_col(n_buckets).alias("b")).distinct().collect()
    }
    if table.migration() is None and len(affected) < n_buckets:
        live = table.scan(spark, buckets=affected or None)
    else:
        live = table.scan(spark)  # mid-migration: bucket ids are ambiguous

    s = source.withColumn("__s_present", F.lit(True)).alias("s")
    t = live.withColumn("__t_present", F.lit(True)).alias("t")
    j = s.join(t, on=[key1, key2], how="full_outer")
    is_matched = F.col("__s_present").isNotNull() & F.col("__t_present").isNotNull()
    is_insert = F.col("__s_present").isNotNull() & F.col("__t_present").isNull()

    commit_seq = max_commit_seq(spark, table) + 1
    payload = [f for f in fields if f["id"] not in (1, 2) and f.get("source")]

    # single-pass clause compilation: ONE verdict column over the joined
    # frame (when() chains encode Delta's delete-before-update precedence;
    # a NULL condition is falsy, like SQL), so the classification join and
    # the bucket-pruned live read under it execute exactly once — a
    # per-clause union would re-evaluate them per WHEN clause
    def _and(base: Column, extra: "Column | str | None") -> Column:
        c = _as_col(extra)
        return base if c is None else base & c

    chain = []
    if when_matched_delete:
        chain.append((_and(is_matched, delete_condition), "D"))
    if when_matched_update:
        chain.append((_and(is_matched, matched_condition), "UPD"))
    if when_not_matched_insert:
        chain.append((_and(is_insert, insert_condition), "INS"))
    verdict = F.when(chain[0][0], F.lit(chain[0][1]))
    for cond, tag_v in chain[1:]:
        verdict = verdict.when(cond, F.lit(tag_v))

    upd_vals = {n: _as_col(e) for n, e in (when_matched_update or {}).items()}
    # unnamed payload columns keep the target's value — EXCEPT the derived
    # sha, which rides as NULL so apply_batch's post-dedup coalesce
    # recomputes it from the (possibly updated) content; a copied stored
    # sha would go stale the moment content changes
    for f in payload:
        if f.get("source") == "content_sha":
            upd_vals.setdefault(f["name"], F.lit(None))
        else:
            upd_vals.setdefault(f["name"], F.col(f"t.{f['name']}"))
    ins_vals = {n: _as_col(e) for n, e in (when_not_matched_insert or {}).items()}

    cols = [
        F.lit(0).cast("long").alias("offset"),
        F.lit(commit_seq).cast("long").alias("commit_seq"),
        F.when(F.col("__verdict") == "D", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        F.col(key1).cast("string").alias("repo"),
        F.col(key2).cast("string").alias("path"),
    ]
    for f in payload:
        v = F.when(F.col("__verdict") == "UPD",
                   upd_vals.get(f["name"], F.lit(None)))
        v = v.when(F.col("__verdict") == "INS",
                   ins_vals.get(f["name"], F.lit(None)))
        cols.append(v.cast(f["type"]).alias(f["source"]))
    cols.append(F.lit(None).cast("string").alias("control"))
    events = (
        j.withColumn("__verdict", verdict)
        .filter(F.col("__verdict").isNotNull())
        .select(*cols)
    )

    from glad_tiles_pipeline_spark.operators.merge import apply_batch
    from glad_tiles_pipeline_spark.plans.lake import CommitConflict

    prev_hi = table.last_committed_offset()
    try:
        out = apply_batch(
            spark, table, events, batch_id,
            merge_mode=merge_mode,
            use_arrow_udfs=use_arrow_udfs,
            offsets={"lo": prev_hi + 1, "hi": prev_hi},
        )
    except CommitConflict:
        if conflict_retries <= 0:
            raise
        # full recompile against the new head (see docstring) — recursion
        # re-runs the live read, clause arithmetic, and commit_seq
        return merge_into(
            spark, table, source, batch_id,
            when_matched_update=when_matched_update,
            matched_condition=matched_condition,
            when_matched_delete=when_matched_delete,
            delete_condition=delete_condition,
            when_not_matched_insert=when_not_matched_insert,
            insert_condition=insert_condition,
            merge_mode=merge_mode,
            use_arrow_udfs=use_arrow_udfs,
            conflict_retries=conflict_retries - 1,
        )
    out["buckets_read"] = len(affected)
    out["merge_commit_seq"] = commit_seq
    return out
