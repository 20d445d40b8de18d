"""S20 — the lake table's OWN change feed as a first-class Spark data
source: ``spark.read.format("lake_cdc")`` / ``spark.readStream.format(
"lake_cdc")`` over a ``LakeTable`` root, closing the table-to-table loop —
a downstream pipeline tails THIS table exactly the way this engine tails
its upstream changelog (Delta CDF `readChangeFeed` / Iceberg incremental-
scan-as-source parity).

Relationship to ``LakeTable.incremental()`` (plans/lake.py): that API is
the window-at-a-time BATCH surface (Spark-side reads, window-LWW applied);
this source is the *tailing* surface on top of the same manifests.  It
emits the raw per-commit change rows (one row per key per commit — the
MERGE already LWW-collapsed each batch before writing), so consecutive
micro-batches compose: downstream applies its own LWW merge, which is the
engine's native ingest path.

Offsets are SNAPSHOT IDS.  Manifests are immutable once published, so
``readBetweenOffsets`` replay after a crash regenerates exactly the same
rows — the exactly-once story needs no buffering.  Rewrite commits are
split by what they do to DATA (Delta CDF's ``skipChangeCommits`` is the
precedent, tightened):

* ``compact`` rewrites files but preserves every row — ``on_rewrite=skip``
  skips it *exactly*.
* ``rollback`` restores an earlier snapshot: skipping it keeps tailing,
  but a downstream mirror retains rolled-back values until later commits
  overwrite them — documented divergence; restart the feed from the
  rollback snapshot when exactness matters.
* ``cow`` ingest commits CHANGE data while rewriting whole buckets; the
  per-commit delta is irrecoverable from a file diff, so they ALWAYS
  error (skipping would silently lose committed changes).  Tail mor
  tables — the append path is what a change feed is for.

``on_rewrite=error`` (default) refuses all three loudly, matching the
batch ``incremental()`` contract.

Scale shape: the BATCH reader plans one InputPartition per added data file
— executor-side pyarrow reads, no driver materialization — so a backfill
over a large window distributes.  The STREAM reader uses
``SimpleDataSourceStreamReader`` (driver-side reads, like every simple
source): right for tailing commit-sized deltas; point a backfill at the
batch reader or ``incremental()``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SYSTEM_COLS = [
    ("_commit_seq", "long"),
    ("_offset", "long"),
    ("_deleted", "boolean"),
    ("_n_src_events", "long"),
]
# Rewrite commits by effect on data: compact and rebucket preserve rows
# exactly, rollback restores an earlier state (skippable with documented
# divergence), cow CHANGES data while rewriting files — never skippable.
_SKIPPABLE_REWRITES = {"compact", "rollback", "rebucket"}
_REWRITE_MODES = _SKIPPABLE_REWRITES | {"cow"}


def _pa_type(type_str: str):
    import pyarrow as pa

    return {
        "string": pa.string(),
        "long": pa.int64(),
        "bigint": pa.int64(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "boolean": pa.bool_(),
        "double": pa.float64(),
        "float": pa.float32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
    }[type_str]


class _Catalog:
    """Driver-side manifest reads for the source — a thin stand-in for
    LakeTable that avoids importing Spark types in the data source worker
    process (the Python DataSource runs in its own interpreter).

    Deliberately filesystem-direct rather than going through the
    ``ManifestIO`` seam: DataSource options are plain strings, so only a
    path-addressable table can be named here anyway; an object-store
    deployment would register a sibling source whose catalog speaks that
    store's GET/LIST (same three methods)."""

    def __init__(self, root: str):
        self.root = root
        self.mdir = os.path.join(root, "manifests")

    def current_snapshot_id(self) -> int:
        ids = [
            int(f[1:-5])
            for f in os.listdir(self.mdir)
            if f.startswith("v") and f.endswith(".json")
        ]
        if not ids:
            raise FileNotFoundError(f"no manifests under {self.mdir}")
        return max(ids)

    def manifest(self, sid: int) -> dict:
        with open(os.path.join(self.mdir, f"v{sid}.json")) as fh:
            return json.load(fh)

    def vacuum_horizon(self) -> int:
        p = os.path.join(self.root, "vacuum.json")
        if not os.path.exists(p):
            return 0
        with open(p) as fh:
            return int(json.load(fh)["vacuum_horizon"])


def _plan_window(
    cat: _Catalog, lo: int, hi: int, on_rewrite: str
) -> list[dict]:
    """Files ADDED per snapshot in (lo, hi] with their schema-version and
    snapshot tags — the per-commit diff.  Cost: O(snapshots in window)
    driver-side JSON reads, never O(table)."""
    if not (0 <= lo <= hi <= cat.current_snapshot_id()):
        raise ValueError(
            f"invalid lake_cdc window ({lo}, {hi}]: need "
            f"0 <= from <= to <= current {cat.current_snapshot_id()}"
        )
    if lo < cat.vacuum_horizon():
        raise ValueError(
            f"from_snapshot {lo} is below the vacuum horizon "
            f"{cat.vacuum_horizon()}; its data files were expired"
        )
    out: list[dict] = []
    prev_paths = {f["path"] for f in cat.manifest(lo)["files"]}
    for sid in range(lo + 1, hi + 1):
        m = cat.manifest(sid)
        mode = (m.get("metrics") or {}).get("merge_mode")
        cur_paths = {f["path"] for f in m["files"]}
        if mode in _REWRITE_MODES:
            if mode not in _SKIPPABLE_REWRITES:
                raise ValueError(
                    f"lake_cdc window ({lo}, {hi}] spans a CoW ingest commit "
                    f"(snapshot {sid}): it changes data while rewriting whole "
                    "buckets, so its per-commit delta cannot be recovered "
                    "from a file diff — tail a merge-on-read table, or start "
                    "from a snapshot at or after the CoW commit"
                )
            if on_rewrite == "error":
                raise ValueError(
                    f"lake_cdc window ({lo}, {hi}] spans a rewrite commit "
                    f"(snapshot {sid}, merge_mode={mode}); rewrites are not "
                    "changes — pass on_rewrite=skip to tail past them, or "
                    "start from a snapshot at or after the rewrite"
                )
            # skip: compact preserves all rows; rollback divergence is
            # documented in the module docstring
            prev_paths = cur_paths
            continue
        for f in m["files"]:
            if f["path"] not in prev_paths:
                out.append(
                    {
                        "path": os.path.join(cat.root, f["path"]),
                        "schema_version": str(f["schema_version"]),
                        "snapshot_id": sid,
                    }
                )
        prev_paths = cur_paths
    return out


def _read_file_arrow(entry: dict, target_fields: list[dict], schemas: dict):
    """One data file → one Arrow table projected (by FIELD ID, the schema-
    evolution contract shared with LakeTable.scan) onto the target fields,
    plus system columns and the _snapshot_id tag."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(entry["path"])
    old_by_id = {f["id"]: f for f in schemas[entry["schema_version"]]}
    n = t.num_rows
    cols, names = [], []
    for f in target_fields:
        old = old_by_id.get(f["id"])
        typ = _pa_type(f["type"])
        if old is None:
            cols.append(pa.nulls(n, typ))
        else:
            cols.append(pc.cast(t.column(old["name"]), typ))
        names.append(f["name"])
    for name, typ in _SYSTEM_COLS:
        cols.append(pc.cast(t.column(name), _pa_type(typ)))
        names.append(name)
    cols.append(pa.array([entry["snapshot_id"]] * n, pa.int64()))
    names.append("_snapshot_id")
    return pa.table(cols, names=names)


class _FilePartition(InputPartition):
    def __init__(self, entry: dict):
        self.entry = entry


class LakeCdcBatchReader(DataSourceReader):
    """Distributed backfill: one partition per added file, executor-side
    pyarrow reads — the window plan (driver) is O(snapshots), the data
    reads are O(changes) and parallel."""

    def __init__(self, options, target_fields, schemas):
        self.options = options
        self.target_fields = target_fields
        self.schemas = schemas
        cat = _Catalog(options["path"])
        lo = int(options.get("from_snapshot", 0))
        hi_opt = options.get("to_snapshot")
        hi = int(hi_opt) if hi_opt is not None else cat.current_snapshot_id()
        self.entries = _plan_window(
            cat, lo, hi, options.get("on_rewrite", "error")
        )

    def partitions(self):
        if not self.entries:
            return [_FilePartition({"path": None})]
        return [_FilePartition(e) for e in self.entries]

    def read(self, partition: _FilePartition):
        if partition.entry["path"] is None:
            return
        t = _read_file_arrow(partition.entry, self.target_fields, self.schemas)
        yield from t.to_batches(max_chunksize=65536)


class LakeCdcStreamReader(SimpleDataSourceStreamReader):
    """Tail the table: each micro-batch advances the snapshot-id offset to
    the current head.  Manifest immutability makes replay exact."""

    def __init__(self, options, target_fields, schemas):
        self.root = options["path"]
        self.start_snapshot = int(options.get("from_snapshot", 0))
        self.on_rewrite = options.get("on_rewrite", "error")
        self.target_fields = target_fields
        self.schemas = schemas

    def initialOffset(self):
        return {"snapshot": self.start_snapshot}

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        cat = _Catalog(self.root)
        # schema versions published after planning time: pick them up from
        # the live manifest so a mid-stream evolve doesn't KeyError (new
        # fields still project as NULL until the reader is re-planned)
        schemas = dict(cat.manifest(hi)["schemas"]) | dict(self.schemas)
        rows: list[tuple] = []
        for e in _plan_window(cat, lo, hi, self.on_rewrite):
            t = _read_file_arrow(e, self.target_fields, schemas)
            cols = [c.to_pylist() for c in t.columns]
            rows.extend(zip(*cols))
        return rows

    def read(self, start: dict):
        lo = int(start["snapshot"])
        hi = _Catalog(self.root).current_snapshot_id()
        if hi <= lo:
            return iter([]), {"snapshot": lo}
        return iter(self._rows(lo, hi)), {"snapshot": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["snapshot"]), int(end["snapshot"])))


class LakeCdcDataSource(DataSource):
    """``spark.dataSource.register(LakeCdcDataSource)`` then::

        spark.read.format("lake_cdc").option("path", root)
             .option("from_snapshot", 3).load()            # batch backfill
        spark.readStream.format("lake_cdc").option("path", root).load()

    Options: ``path`` (table root, required), ``from_snapshot`` (default
    0), ``to_snapshot`` (batch only; default current), ``on_rewrite``
    (``error`` | ``skip``)."""

    @classmethod
    def name(cls):
        return "lake_cdc"

    def _fields(self):
        cat = _Catalog(self.options["path"])
        m = cat.manifest(cat.current_snapshot_id())
        return m["schemas"][str(m["schema_version"])], m["schemas"]

    def schema(self):
        fields, _ = self._fields()
        user = ", ".join(f"{f['name']} {f['type']}" for f in fields)
        sys_ = ", ".join(f"{n} {t}" for n, t in _SYSTEM_COLS)
        return f"{user}, {sys_}, _snapshot_id long"

    def reader(self, schema):
        fields, schemas = self._fields()
        return LakeCdcBatchReader(self.options, fields, schemas)

    def simpleStreamReader(self, schema):
        fields, schemas = self._fields()
        return LakeCdcStreamReader(self.options, fields, schemas)


def feed_as_changelog(feed):
    """Project a lake_cdc feed DataFrame onto the engine's changelog schema
    so the downstream T6 bridges ingest it unchanged (table-to-table
    pipeline): tombstones become op='D', everything else 'U' (an upsert —
    LWW MERGE makes I-vs-U routing equivalent), ordering metadata passes
    through as (commit_seq, offset), ts is derived from the offset exactly
    like the generator so watermark hygiene keeps working."""
    from pyspark.sql import functions as F

    return feed.select(
        F.col("_offset").alias("offset"),
        F.col("_commit_seq").alias("commit_seq"),
        F.col("commit"),
        F.when(F.col("_deleted"), F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("repo"),
        F.col("path"),
        F.col("lang"),
        F.col("content"),
        F.timestamp_seconds(F.lit(1_704_067_200) + F.col("_offset")).alias("ts"),
        F.lit(1).alias("schema_ver"),
        F.lit(None).cast("string").alias("control"),
    )
