"""Predicate row-level operations — ``DELETE FROM t WHERE`` and
``UPDATE t SET ... WHERE`` (Delta/Iceberg row-op parity), compiled onto
the engine's exactly-once CDC apply path.

``merge_into`` (operators/merge_into.py) covers the source-driven form;
real lakehouse users equally run the PREDICATE form — retention deletes
("purge rows older than X"), GDPR erasure ("delete everything for key
K"), and bulk corrections ("backfill this column where ..."), with no
source table in sight.  Both compile to the same thing: one changelog
micro-batch fed to ``apply_batch``, which contributes batch-id fencing
(idempotent replay), all three merge modes (cow / mor / mor_dv), stats +
bloom manifests, snapshot isolation, time travel, and the kill -9
crash-resume story, with zero new write-path code.

Scale shape (the 100 TB argument) — STRICTLY CHEAPER than MERGE:

* no join at all: the matched set is ONE live read filtered by the
  predicate.  The filter is a pure column expression, so Catalyst pushes
  it into the parquet scans (and the caller can pass ``repos=`` to engage
  the manifest min/max key-stats prune when the key bounds are known —
  the same prune every read path uses);
* emitted events are O(matched rows), not O(table); under mor/mor_dv the
  write cost is O(matched) too — a retention delete on a 100 TB table
  rewrites nothing in the hot path, it appends tombstones/delete-vectors
  exactly like a CDC delete batch;
* a DELETE's events drop the payload columns entirely (tombstones carry
  NULLs), so nothing content-sized shuffles.

Semantics notes:

* events get ``commit_seq = max stored + 1`` (O(manifest) from per-file
  stats), so the row-op is one version in the table's normal LWW order —
  a later CDC batch beats it, a stale replay doesn't, exactly like the
  declarative MERGE;
* ``condition=None`` means ALL rows (Delta's unconditional
  ``DELETE FROM t`` / ``UPDATE t SET ...``);
* UPDATE set-expressions may reference any current-schema column by its
  bare name (one relation in scope — no s./t. aliases needed); unnamed
  payload columns keep their stored value; key columns, unmapped columns
  and the engine-derived sha are refused (shared ``validate_settable``
  rule), and an update that touches ``content`` gets its sha recomputed
  post-dedup because the derived column rides as NULL;
* the changelog-offset high-water passes through UNCHANGED — a row-op
  consumes nothing from the upstream log, so a changelog-fed table can
  be deleted-from/updated without corrupting any planner's resume point.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.merge_into import (
    _as_col,
    max_commit_seq,
    validate_settable,
)
from glad_tiles_pipeline_spark.plans.lake import LakeTable


def _compile_rowop(
    spark: SparkSession,
    table: LakeTable,
    condition: "Column | str | None",
    batch_id: str,
    *,
    set_exprs: "dict[str, Column | str] | None",
    merge_mode: str,
    use_arrow_udfs: bool,
    repos=None,
    conflict_retries: int = 0,
) -> dict:
    """Shared compile: live read → predicate filter → one event per
    matched row (op 'D' when ``set_exprs`` is None, else op 'U' with the
    set-expressions applied), into ``apply_batch``."""
    fields = table.current_fields()
    key1 = next(f["name"] for f in fields if f["id"] == 1)
    key2 = next(f["name"] for f in fields if f["id"] == 2)
    payload = [f for f in fields if f["id"] not in (1, 2) and f.get("source")]

    live = table.scan(spark, repos=repos)
    cond = _as_col(condition)
    matched = live if cond is None else live.filter(cond)

    commit_seq = max_commit_seq(spark, table) + 1
    is_delete = set_exprs is None
    vals = {n: _as_col(e) for n, e in (set_exprs or {}).items()}

    cols = [
        F.lit(0).cast("long").alias("offset"),
        F.lit(commit_seq).cast("long").alias("commit_seq"),
        F.lit("D" if is_delete else "U").alias("op"),
        F.col(key1).cast("string").alias("repo"),
        F.col(key2).cast("string").alias("path"),
    ]
    for f in payload:
        if is_delete:
            v = F.lit(None)  # tombstones carry no payload
        elif f.get("source") == "content_sha":
            v = F.lit(None)  # derived: recomputed from content post-dedup
        else:
            v = vals.get(f["name"], F.col(f["name"]))
        cols.append(v.cast(f["type"]).alias(f["source"]))
    cols.append(F.lit(None).cast("string").alias("control"))
    events = matched.select(*cols)

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
        # OCC loser: the matched set, SET-expression inputs, and
        # commit_seq were read at a head another writer has since
        # replaced — recurse to RECOMPILE the whole op against the new
        # head (serializable; a blind re-apply could resurrect stale
        # values).  This attempt's staged files become vacuum orphans.
        return _compile_rowop(
            spark, table, condition, batch_id,
            set_exprs=set_exprs, merge_mode=merge_mode,
            use_arrow_udfs=use_arrow_udfs, repos=repos,
            conflict_retries=conflict_retries - 1,
        )
    out["rowop_commit_seq"] = commit_seq
    return out


def delete_where(
    spark: SparkSession,
    table: LakeTable,
    condition: "Column | str | None",
    batch_id: str,
    *,
    merge_mode: str = "cow",
    use_arrow_udfs: bool = True,
    repos=None,
    conflict_retries: int = 0,
) -> dict:
    """``DELETE FROM table WHERE condition`` — tombstone every current row
    matching ``condition`` (a Column or SQL string over the table's
    current-schema column names; ``None`` deletes all rows).  Returns
    ``apply_batch``'s summary dict; idempotent on ``batch_id``.
    ``conflict_retries``: under concurrent writers, a lost manifest CAS
    recompiles the whole op against the new head (serializable OCC, like
    ``merge_into``) up to N times before surfacing the conflict."""
    return _compile_rowop(
        spark, table, condition, batch_id,
        set_exprs=None, merge_mode=merge_mode,
        use_arrow_udfs=use_arrow_udfs, repos=repos,
        conflict_retries=conflict_retries,
    )


def update_where(
    spark: SparkSession,
    table: LakeTable,
    set_exprs: "dict[str, Column | str]",
    condition: "Column | str | None",
    batch_id: str,
    *,
    merge_mode: str = "cow",
    use_arrow_udfs: bool = True,
    repos=None,
    conflict_retries: int = 0,
) -> dict:
    """``UPDATE table SET col = expr, ... WHERE condition`` — re-emit every
    matching row at the next commit_seq with the set-expressions applied
    (expressions see the row's CURRENT values; unnamed payload columns
    keep theirs).  Returns ``apply_batch``'s summary dict; idempotent on
    ``batch_id``.  ``conflict_retries``: a lost manifest CAS recompiles
    against the new head (serializable OCC, like ``merge_into``) up to N
    times — essential here, since SET expressions read current values."""
    if not set_exprs:
        raise ValueError("UPDATE with no SET expressions does nothing — "
                         "refused")
    by_name = {f["name"]: f for f in table.current_fields()}
    validate_settable(by_name, "update_where SET", set_exprs)
    return _compile_rowop(
        spark, table, condition, batch_id,
        set_exprs=set_exprs, merge_mode=merge_mode,
        use_arrow_udfs=use_arrow_udfs, repos=repos,
        conflict_retries=conflict_retries,
    )
