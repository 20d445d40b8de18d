"""S21 — bucket-layout evolution: migrate a live table to a new bucket
count (8 → 32 when the table outgrows its layout) WITHOUT stopping ingest
and without ever presenting readers an inconsistent state.

Why phased, not one big rewrite: at 100 TB a single-commit re-layout is one
giant job whose CAS window spans hours of concurrent ingest — every ingest
commit in between would conflict.  Instead the migration is a sequence of
small, fenced, data-preserving rewrite commits (Iceberg's
``rewrite_data_files`` + partition-spec-evolution shape):

1. ``start_rebucket`` — a metadata-only commit adds layout generation
   ``g+1`` with the new width and flips the WRITE layout: every subsequent
   merge-on-read delta routes under the new bucketing (files tagged
   ``layout_gen``).  Old-generation files stay exactly where they are.
2. ``rebucket_step`` — rewrites a bounded set of old-generation buckets
   into new-generation files (LWW-compacting them in the same single
   shuffle), retiring precisely those old files via generation-qualified
   ``replaced_buckets``.  Steps interleave freely with ingest commits —
   each is an independent CAS.
3. The step that retires the last old-generation file also clears the
   migration state and drops the old layout — the table is then a normal
   single-generation table at the new width.

Reader consistency: every snapshot is internally consistent (atomic
manifest swap), and MoR scans resolve LWW by KEY, which is bucket-layout-
independent — so full scans are exact at every point of the migration,
including time travel to mid-migration snapshots.  The three operations
whose semantics DO depend on a single layout — bucket-pruned scans, CoW
ingest, and compact — refuse loudly mid-migration rather than answer
wrong (``plans/lake.py`` raises on ``scan(buckets=...)``;
``operators/merge.py`` on cow/compact).

Rollback safety: rolling back to any snapshot (before, during, or after
the migration) restores that snapshot's complete layout state — layouts,
write generation, and migration progress — because rollback replays the
target manifest's layout keys verbatim.

Scale shape: each step reads and writes only the chosen old buckets
(O(step), never O(table)); the rewrite reuses the engine's stats-planned
single shuffle (``plan_partition_ids``) so the LWW compaction and the
``partitionBy`` write share one Exchange, and file counts stay ~1 per
touched new bucket.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.functions.hashing import bucket_col
from glad_tiles_pipeline_spark.operators.dedup import lww_dedup
from glad_tiles_pipeline_spark.operators.merge import (
    _key1_name,
    _key_name,
    _parquet_meta,
    plan_partition_ids,
)
from glad_tiles_pipeline_spark.plans.lake import LakeTable


def start_rebucket(
    table: LakeTable, new_n_buckets: int, batch_id: str | None = None
) -> dict:
    """Begin a migration to ``new_n_buckets``: metadata-only commit that
    adds the new layout generation and flips the write layout.  Widths that
    are a multiple of the old (8 → 32) keep each old bucket's keys within
    ``new/old`` new buckets — cheaper steps and better planner estimates —
    but any width is correct (bucket assignment is per-key hashing)."""
    info = table.layout_info()
    if info["migration"] is not None:
        m = info["migration"]
        raise ValueError(
            f"a re-bucketing migration (gen {m['from_gen']} → "
            f"{m['to_gen']}) is already in progress; finish it first"
        )
    from_gen = info["write_gen"]
    old_n = info["layouts"][from_gen]
    if new_n_buckets == old_n:
        raise ValueError(f"table already has n_buckets={old_n}")
    if new_n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    to_gen = from_gen + 1
    expected_parent = table.current_snapshot_id()
    parent = table.manifest(expected_parent)
    snapshot_id = table.commit(
        batch_id=batch_id or f"rebucket-start-g{to_gen}",
        expected_parent=expected_parent,
        replaced_buckets=set(),
        new_files=[],
        offsets=dict(parent["offsets"]),
        lineage={},
        metrics={
            "merge_mode": "rebucket_start",
            "from_n_buckets": old_n,
            "to_n_buckets": new_n_buckets,
        },
        layout_update={
            "layouts": {**info["layouts"], to_gen: new_n_buckets},
            "write_gen": to_gen,
            "migration": {
                "from_gen": from_gen,
                "to_gen": to_gen,
                "migrated": [],
            },
        },
    )
    return {
        "snapshot_id": snapshot_id,
        "from_gen": from_gen,
        "to_gen": to_gen,
        "n_buckets": new_n_buckets,
    }


def rebucket_step(
    spark: SparkSession,
    table: LakeTable,
    max_buckets: int | None = None,
    batch_id: str | None = None,
) -> dict:
    """Rewrite up to ``max_buckets`` old-generation buckets into the new
    layout (all remaining ones by default).  Data-preserving: rows keep
    their LWW ordering metadata and tombstones; the rewrite LWW-compacts
    the old buckets' generations in the same shuffle (output stays
    ``delta=True`` — a key may be superseded by a new-layout delta written
    mid-migration, so readers keep resolving until a post-migration
    ``compact``).  The step retiring the last old file clears the
    migration.  Fenced and idempotent like every commit."""
    mig = table.migration()
    if mig is None:
        return {"skipped": True, "done": True,
                "snapshot_id": table.current_snapshot_id()}
    from_gen, to_gen = mig["from_gen"], mig["to_gen"]
    info = table.layout_info()
    old_n, new_n = info["layouts"][from_gen], info["layouts"][to_gen]

    expected_parent = table.current_snapshot_id()
    if batch_id is None:
        batch_id = f"rebucket-g{to_gen}-p{expected_parent}"
    already = table.batch_committed(batch_id)
    if already is not None:
        return {"skipped": True, "done": table.migration() is None,
                "snapshot_id": already}

    m = table.manifest(expected_parent)
    # S26 sidecars: dv kill lists are (path, pos) metadata, not rows — the
    # rewrite must NOT project them.  Skipping their content is exact: a
    # kill only exists where a newer winner of the same key does, that
    # winner lives in the same old bucket (same key -> same bucket), so the
    # LWW arg-max below supersedes every killed row anyway.  The entries
    # themselves retire with their bucket via the generation-qualified
    # replaced_buckets (kills and the files they reference drop atomically).
    # Tomb memos DO ride along: they are full-schema delete winners the
    # compacted generation must remember.
    old_files = [
        f
        for f in m["files"]
        if int(f.get("layout_gen", 1)) == from_gen and f.get("kind") != "dv"
    ]
    remaining = sorted({f["bucket"] for f in old_files})
    if not remaining:
        # nothing left to move — clear the migration in a metadata commit
        snapshot_id = table.commit(
            batch_id=batch_id,
            expected_parent=expected_parent,
            replaced_buckets=set(),
            new_files=[],
            offsets=dict(m["offsets"]),
            lineage={},
            metrics=_passthrough_metrics(m, to_gen)
            | {"merge_mode": "rebucket", "rebucketed_buckets": 0},
            layout_update={
                "layouts": {to_gen: new_n},
                "write_gen": to_gen,
                "migration": None,
            },
        )
        return {"skipped": False, "done": True, "snapshot_id": snapshot_id,
                "rebucketed_buckets": 0}

    chosen = set(remaining[: max_buckets or len(remaining)])
    files = [f for f in old_files if f["bucket"] in chosen]
    fields = table.current_fields()
    key_names = [f["name"] for f in fields if f["id"] in (1, 2)]

    raw = table._project_files(spark, m, files).withColumn(
        "__bucket", bucket_col(new_n, key_names[0], key_names[1])
    )
    # Planner estimate for the NEW buckets: when new % old == 0 an old
    # bucket b's keys land exactly in {b + j*old_n} (h%old == (h%new)%old),
    # split evenly; otherwise spread the total over every new bucket.
    old_rows: dict[int, int] = {}
    for f in files:
        old_rows[f["bucket"]] = old_rows.get(f["bucket"], 0) + f.get("rows", 0)
    new_rows: dict[int, int] = {}
    if new_n % old_n == 0:
        factor = new_n // old_n
        for b, r in old_rows.items():
            for j in range(factor):
                new_rows[b + j * old_n] = max(1, r // factor)
    else:
        total = max(1, sum(old_rows.values()))
        for nb in range(new_n):
            new_rows[nb] = max(1, total // new_n)
    target_parts = max(
        2 * spark.sparkContext.defaultParallelism, len(new_rows), 1
    )
    planned, _n_pids = plan_partition_ids(
        raw, new_rows, 4 * target_parts, path_col=key_names[1]
    )
    resolved = lww_dedup(
        planned.repartition(target_parts, F.col("__pid")),
        key=["__pid", "__bucket"] + key_names,
        strategy="argmax",
        order=["_commit_seq", "_offset"],
    ).drop("__pid")

    data_abs, data_rel = table.new_data_dir()
    resolved.write.partitionBy("__bucket").parquet(data_abs, mode="append")
    schema_version = m["schema_version"]
    _key1 = _key1_name(m, schema_version)
    _key2 = _key_name(m, schema_version, 2)
    new_files: list[dict] = []
    lineage: dict[str, dict] = {}
    for entry in sorted(os.listdir(data_abs)):
        if not entry.startswith("__bucket="):
            continue
        nb = int(entry.split("=")[1])
        bdir = os.path.join(data_abs, entry)
        bfiles, rows = [], 0
        for fn in sorted(os.listdir(bdir)):
            if fn.endswith(".parquet"):
                rel = os.path.join(data_rel, entry, fn)
                r, fstats = _parquet_meta(
                    os.path.join(bdir, fn), str_cols=(_key1, _key2)
                )
                entry_meta = {
                    "path": rel, "bucket": nb,
                    "schema_version": schema_version, "rows": r,
                    "layout_gen": to_gen, "delta": True,
                }
                if fstats:
                    entry_meta["stats"] = fstats
                new_files.append(entry_meta)
                bfiles.append(rel)
                rows += r
        lineage[str(nb)] = {"files": bfiles, "rows_live": rows}

    done = not (set(remaining) - chosen)
    if done:
        layout_update = {
            "layouts": {to_gen: new_n},
            "write_gen": to_gen,
            "migration": None,
        }
    else:
        layout_update = {
            "layouts": info["layouts"],
            "write_gen": to_gen,
            "migration": {
                "from_gen": from_gen,
                "to_gen": to_gen,
                "migrated": sorted(set(mig.get("migrated", [])) | chosen),
            },
        }
    snapshot_id = table.commit(
        batch_id=batch_id,
        expected_parent=expected_parent,
        replaced_buckets={(from_gen, b) for b in chosen},
        new_files=new_files,
        offsets=dict(m["offsets"]),
        lineage=lineage,
        metrics=_passthrough_metrics(m, to_gen)
        | {
            "merge_mode": "rebucket",
            "rebucketed_buckets": len(chosen),
            "from_gen": from_gen,
            "to_gen": to_gen,
        },
        layout_update=layout_update,
    )
    return {"skipped": False, "done": done, "snapshot_id": snapshot_id,
            "rebucketed_buckets": len(chosen), "batch_id": batch_id}


def _passthrough_metrics(parent_manifest: dict, write_gen: int) -> dict:
    """Carry the parent's per-bucket planner stats through a rebucket commit
    when they were recorded under the surviving write layout — the next mor
    batch keeps its stats-planned partitioning instead of falling back to
    uniform."""
    pm = parent_manifest.get("metrics") or {}
    if int(pm.get("bucket_rows_gen", 1)) == write_gen and pm.get("bucket_rows"):
        return {"bucket_rows": pm["bucket_rows"], "bucket_rows_gen": write_gen}
    return {}


def rebucket(
    spark: SparkSession,
    table: LakeTable,
    new_n_buckets: int,
    buckets_per_step: int | None = None,
) -> dict:
    """Convenience: run a full migration start-to-finish (steps of
    ``buckets_per_step`` old buckets; one step for everything by default).
    Production would interleave these calls with live ingest — the tests
    do exactly that."""
    start = start_rebucket(table, new_n_buckets)
    steps = 0
    while True:
        res = rebucket_step(spark, table, max_buckets=buckets_per_step)
        steps += 1
        if res.get("done"):
            return {"start_snapshot": start["snapshot_id"],
                    "final_snapshot": res["snapshot_id"], "steps": steps,
                    "n_buckets": new_n_buckets}
