"""S8 — the idempotent MERGE apply path (SURVEY.md §3 EP-B steps 2–8).

``apply_batch`` takes one offset-window of change events and applies it to a
``LakeTable`` exactly once:

  1. schema evolution — control events in the batch are applied to the table
     metadata BEFORE the merge (BASELINE.json north_star: "schema evolution
     ... applied via schema updates before each MERGE batch");
  2. commit-ordered LWW dedup (skew-immune arg-max by default) → one winning
     event per (repo, path);
  3. vectorized normalize (lang) + sha256 (content) — computed on WINNERS
     only, never on the raw event stream: at 10^10 events this is the
     difference between hashing every event and hashing every surviving key;
  4. bucket-pruned merge: only buckets containing a touched key participate
     (custom partition pruning, SURVEY.md §4.1).  Two physical modes:
     ``cow`` rewrites each affected bucket with (surviving ∪ incoming)
     LWW-resolved — read-optimal; ``mor`` appends the winners as per-bucket
     delta files — write cost O(batch), resolution deferred to scan/compact;
  5. atomic manifest commit with snapshot-ID fencing + batch-id idempotence,
     carrying per-bucket lineage, offsets, and rows-applied metrics.

Scale notes:
  * Batch statistics/lineage are computed on slim columns only (~40 B/row
    shuffle); full-width rows cross exactly ONE shuffle per batch — an
    explicit repartition by __bucket that Catalyst reuses for both the
    dedup group-by (bucket ⊂ grouping keys ⇒ no second exchange) and the
    partitionBy write.
  * The bucket layout (xxhash64(repo,path) % B) spreads a hot monorepo
    across buckets by path, so a monorepo-heavy batch still fans out across
    the cluster; the dedup aggregate itself is skew-immune (argmax with
    map-side partial agg).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.functions.hashing import bucket_col
from glad_tiles_pipeline_spark.functions.text import (
    normalize_lang,
    normalize_lang_expr,
)
from glad_tiles_pipeline_spark.operators.dedup import lww_dedup, lww_dedup_argmax
from glad_tiles_pipeline_spark.plans.lake import LakeTable


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def apply_schema_controls(table: LakeTable, controls: list[dict], batch_id: str) -> int:
    """Apply control-event payloads (JSON schema ops) in offset order."""
    ops = [json.loads(c["control"]) for c in controls]
    if not ops:
        return table.current_snapshot_id()
    return table.evolve(ops, batch_id=f"{batch_id}:evo")


def apply_batch(
    spark: SparkSession,
    table: LakeTable,
    events: DataFrame,
    batch_id: str,
    *,
    dedup_strategy: str = "argmax",
    use_arrow_udfs: bool = True,
    offsets: dict | None = None,
    merge_mode: str = "cow",
) -> dict:
    """Apply one micro-batch of change events exactly once.  Returns a
    summary dict (snapshot_id, metrics).  Re-invocation with a committed
    batch_id is a no-op (idempotent replay)."""
    already = table.batch_committed(batch_id)
    if already is not None:
        return {"snapshot_id": already, "batch_id": batch_id, "skipped": True}

    # -- 1. schema evolution first (control events are rare; collect is tiny)
    controls = [
        r.asDict()
        for r in events.filter(F.col("control").isNotNull())
        .select("offset", "control")
        .orderBy("offset")
        .collect()
    ]
    if controls:
        apply_schema_controls(table, controls, batch_id)
    data_events = events.filter(F.col("control").isNull())

    expected_parent = table.current_snapshot_id()
    fields = table.current_fields()
    n_buckets = table.n_buckets
    key_names = [f["name"] for f in fields if f["id"] in (1, 2)]  # repo, path ids

    # -- 2. Batch statistics on SLIM columns only (SURVEY.md §4.2 layout
    #       note): the stats/lineage pass never touches ``content``, so its
    #       shuffle moves ~40 B/row instead of whole source files, and the
    #       full-width winners never need a persist().  The slim argmax is
    #       provably the same winner set as any full dedup strategy
    #       ((commit_seq, offset) is a total order).
    slim = lww_dedup_argmax(
        data_events.select("repo", "path", "commit_seq", "offset", "op"),
        key=["repo", "path"],
        count_col="__n_events",
    ).withColumn("__bucket", bucket_col(n_buckets))
    bucket_stats = (
        slim.groupBy("__bucket")
        .agg(
            F.count("*").alias("winners"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("deleted"),
            F.min("offset").alias("off_lo"),
            F.max("offset").alias("off_hi"),
            F.sum("__n_events").alias("n_events"),
        )
        .collect()
    )
    affected = {r["__bucket"] for r in bucket_stats}
    w_parts = max(len(affected), 1)

    # Full-width winners, bucket-aligned: ONE explicit shuffle by __bucket,
    # which Catalyst recognizes as satisfying the group-by's clustering
    # (bucket ⊂ (bucket, repo, path)) — the dedup aggregate and the
    # partitionBy write both reuse it, so ``content`` crosses the wire
    # exactly once per batch.
    src_events = data_events.withColumn("__bucket", bucket_col(n_buckets)).repartition(
        w_parts, F.col("__bucket")
    )
    winners = lww_dedup(
        src_events, key=["__bucket", "repo", "path"], strategy=dedup_strategy
    )

    # -- 3. normalize + sha on winners only (Arrow-vectorized per the
    #       input_hint; JVM twin available for the pure-codegen path).
    #       Deletes become tombstone rows (payload NULL, _deleted=true):
    #       the table must remember a winning delete's commit order, or a
    #       still-older event arriving in a later batch would resurrect the
    #       key (the replay oracle applies in global commit order).
    lang_norm = (
        normalize_lang(F.col("lang")) if use_arrow_udfs else normalize_lang_expr("lang")
    )
    is_del = F.col("op") == "D"
    winner_src = (
        winners.withColumn("lang", F.when(is_del, F.lit(None)).otherwise(lang_norm))
        .withColumn("content_sha", F.sha2(F.col("content"), 256))
        .withColumn("_deleted", is_del)
    )
    # project event payload -> current table schema via stable field sources;
    # key fields (ids 1, 2) always come from the event key, even on deletes
    proj = []
    for f in fields:
        src = f.get("source")
        if f["id"] == 1:
            proj.append(F.col("repo").cast(f["type"]).alias(f["name"]))
        elif f["id"] == 2:
            proj.append(F.col("path").cast(f["type"]).alias(f["name"]))
        elif src is not None and src in winner_src.columns:
            expr = F.when(is_del, F.lit(None)).otherwise(F.col(src))
            proj.append(expr.cast(f["type"]).alias(f["name"]))
        else:
            proj.append(F.lit(None).cast(f["type"]).alias(f["name"]))
    incoming = winner_src.select(
        *proj,
        F.col("commit_seq").alias("_commit_seq"),
        F.col("offset").alias("_offset"),
        F.col("_deleted"),
        F.col("__bucket"),
    )

    # -- 4. bucket-pruned LWW merge: union the affected buckets' raw rows
    #       (incl. tombstones) with the incoming winners, take the arg-max
    #       by (_commit_seq, _offset) per key — table rows older than an
    #       incoming event lose; incoming events older than the table lose.
    if merge_mode == "cow":
        # Copy-on-write: rewrite every affected bucket with the LWW winner
        # per key.  Read-optimal (scan needs no resolution), write cost
        # O(affected table data) per batch.  The union is repartitioned by
        # __bucket so the final dedup and the write share one shuffle.
        live = table.scan(spark, buckets=affected, include_system=True).withColumn(
            "__bucket", bucket_col(n_buckets, key_names[0], key_names[1])
        )
        merged = live.unionByName(incoming).repartition(w_parts, F.col("__bucket"))
        new_data = lww_dedup(
            merged,
            key=["__bucket"] + key_names,
            strategy=dedup_strategy if dedup_strategy != "semijoin" else "argmax",
            order=["_commit_seq", "_offset"],
        )
    elif merge_mode == "mor":
        # Merge-on-read: append this batch's winners as per-bucket delta
        # files — write cost O(batch), never O(table).  Readers (scan) and
        # the compactor resolve the LWW arg-max across generations; the
        # answer is identical to CoW because (commit_seq, offset) is a total
        # order.  This is the 10^10-events/day ingest path; compact()
        # restores read-optimal layout asynchronously.
        new_data = incoming
    else:
        raise ValueError(f"unknown merge_mode: {merge_mode}")

    # new_data is already hash-partitioned by __bucket (the one shuffle),
    # so partitionBy splits cleanly into one file per bucket per partition.
    data_abs, data_rel = table.new_data_dir()
    new_data.write.partitionBy("__bucket").parquet(data_abs, mode="append")

    # -- 5. manifest: new files per bucket, lineage, metrics, fenced commit
    new_files: list[dict] = []
    lineage: dict[str, dict] = {}
    schema_version = table.manifest(None)["schema_version"]
    for entry in sorted(os.listdir(data_abs)):
        if not entry.startswith("__bucket="):
            continue
        b = int(entry.split("=")[1])
        bdir = os.path.join(data_abs, entry)
        bfiles = []
        rows = 0
        for fn in sorted(os.listdir(bdir)):
            if fn.endswith(".parquet"):
                rel = os.path.join(data_rel, entry, fn)
                r = _parquet_rows(os.path.join(bdir, fn))
                entry_meta = {
                    "path": rel, "bucket": b, "schema_version": schema_version,
                    "rows": r,
                }
                if merge_mode == "mor":
                    entry_meta["delta"] = True
                new_files.append(entry_meta)
                bfiles.append(rel)
                rows += r
        lineage[str(b)] = {"files": bfiles, "rows_live": rows}

    n_winners = sum(r["winners"] for r in bucket_stats)
    n_deletes = sum(r["deleted"] for r in bucket_stats)
    off_hi_seen = max((r["off_hi"] for r in bucket_stats), default=None)
    events_read = sum(r["n_events"] or 0 for r in bucket_stats)
    for r in bucket_stats:
        lineage.setdefault(str(r["__bucket"]), {}).update(
            {
                "rows_applied": r["winners"] - r["deleted"],
                "rows_deleted": r["deleted"],
            }
        )

    if offsets is None:
        prev_hi = table.manifest(expected_parent)["offsets"]["hi"]
        offsets = {"lo": prev_hi + 1,
                   "hi": int(off_hi_seen if off_hi_seen is not None else prev_hi)}
    metrics = {
        "events_read": events_read,
        "control_events": len(controls),
        "winners": int(n_winners),
        "dupes_dropped": events_read - int(n_winners),
        "deletes_requested": int(n_deletes),
        "buckets_rewritten": len(affected) if merge_mode == "cow" else 0,
        "merge_mode": merge_mode,
    }
    snapshot_id = table.commit(
        batch_id=batch_id,
        expected_parent=expected_parent,
        replaced_buckets=affected if merge_mode == "cow" else set(),
        new_files=new_files,
        offsets=offsets,
        lineage=lineage,
        metrics=metrics,
    )
    return {"snapshot_id": snapshot_id, "batch_id": batch_id,
            "skipped": False, "metrics": metrics}


def compact(
    spark: SparkSession,
    table: LakeTable,
    buckets: set[int] | None = None,
    batch_id: str | None = None,
) -> dict:
    """Rewrite merge-on-read buckets to one LWW-resolved generation per key.

    Restores read-optimal layout after a run of ``merge_mode='mor'``
    batches; tombstones are RETAINED (a still-older late event in a future
    batch must keep losing to a winning delete).  Idempotent via batch_id;
    fenced like any other commit.  At scale this runs asynchronously,
    bucket-subset at a time — each bucket's rewrite is independent.
    """
    unresolved = table.unresolved_buckets()
    targets = unresolved if buckets is None else set(buckets) & unresolved
    if not targets:
        return {"skipped": True, "compacted_buckets": 0,
                "snapshot_id": table.current_snapshot_id()}
    expected_parent = table.current_snapshot_id()
    if batch_id is None:
        batch_id = f"compact-p{expected_parent}"
    already = table.batch_committed(batch_id)
    if already is not None:
        return {"skipped": True, "compacted_buckets": 0, "snapshot_id": already}

    fields = table.current_fields()
    key_names = [f["name"] for f in fields if f["id"] in (1, 2)]
    n_buckets = table.n_buckets
    raw = table.scan(spark, buckets=targets, include_system=True).withColumn(
        "__bucket", bucket_col(n_buckets, key_names[0], key_names[1])
    )
    # one shuffle: bucket-aligned repartition feeds both the LWW resolution
    # group-by (bucket ⊂ grouping keys) and the partitionBy write
    resolved = lww_dedup(
        raw.repartition(max(len(targets), 1), F.col("__bucket")),
        key=["__bucket"] + key_names,
        strategy="argmax",
        order=["_commit_seq", "_offset"],
    )

    data_abs, data_rel = table.new_data_dir()
    resolved.write.partitionBy("__bucket").parquet(data_abs, mode="append")
    schema_version = table.manifest(None)["schema_version"]
    new_files: list[dict] = []
    lineage: dict[str, dict] = {}
    for entry in sorted(os.listdir(data_abs)):
        if not entry.startswith("__bucket="):
            continue
        b = int(entry.split("=")[1])
        bdir = os.path.join(data_abs, entry)
        bfiles, rows = [], 0
        for fn in sorted(os.listdir(bdir)):
            if fn.endswith(".parquet"):
                rel = os.path.join(data_rel, entry, fn)
                r = _parquet_rows(os.path.join(bdir, fn))
                new_files.append(
                    {"path": rel, "bucket": b, "schema_version": schema_version,
                     "rows": r}
                )
                bfiles.append(rel)
                rows += r
        lineage[str(b)] = {"files": bfiles, "rows_live": rows}

    parent_offsets = table.manifest(expected_parent)["offsets"]
    snapshot_id = table.commit(
        batch_id=batch_id,
        expected_parent=expected_parent,
        replaced_buckets=targets,
        new_files=new_files,
        offsets=parent_offsets,
        lineage=lineage,
        metrics={"compacted_buckets": len(targets), "merge_mode": "compact"},
    )
    return {"skipped": False, "compacted_buckets": len(targets),
            "snapshot_id": snapshot_id, "batch_id": batch_id}
