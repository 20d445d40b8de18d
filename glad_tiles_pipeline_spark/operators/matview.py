"""Incrementally-maintained materialized aggregate views (X13) — the CDC
downstream a reporting/serving layer runs, built out of the engine's
existing derived-table machinery.

A 100 TB CDC pipeline rarely ends at the raw table: dashboards and
serving layers read per-group aggregates ("how many live paths / bytes /
languages per repo"), and recomputing those corpus-wide per micro-batch
is a full scan nobody can afford.  This module maintains the aggregate as
a normal ``LakeTable`` (one row per group, keyed by the group value) and
refreshes it by **pruned group recompute**:

  * the incoming batch names the groups it touches (``distinct repo`` —
    metadata-scale, same cost class as the MERGE path's bucket-id
    collect: a CDC batch touches few repos, the common push shape);
  * only those groups are recomputed, from a ``scan(repos=touched)``
    read that the S22' key-1 file stats prune — IO is O(touched groups'
    data), never O(corpus);
  * results MERGE into the view through the same idempotent
    ``apply_batch`` every other table uses, so the view gets batch-id
    fencing, MoR deltas + compaction, snapshot isolation, and time
    travel for free.

Recompute-from-current-state makes the refresh **self-healing**: whatever
window triggers it, the refreshed groups come out equal to the live
table's aggregates at that moment — a replayed or widened window
(crash-between-sinks catch-up) converges instead of double-counting.
That is why recompute beats delta-maintenance (+x on insert, -x on
delete) here: delta math must see every change exactly once, which a
crash between the main MERGE and the view MERGE violates; recompute only
needs the GROUP SET at-least-once, which the generic
``catch_up_derived_index`` guarantees.

Version stamping: each refresh writes its groups' rows with the LWW pair
``(v, v)`` where ``v = max _commit_seq stored in the VIEW + 1`` (the
merge_into counter, O(manifest) from per-file stats).  The counter is
monotone in APPLICATION order — which the window's offsets are NOT: a
file-source stream can deliver micro-batches out of offset order, and a
refresh stamped with its window's ``hi`` could then lose LWW to an
OLDER window's refresh even though it recomputed newer truth (observed
as a real flake under load).  Hooks run sequentially (foreachBatch /
the batch loop / catch-up are all single-writer, like every admin op
here), so max+1 is race-free.  Groups whose live-row count reaches zero
are TOMBSTONED (the view never serves an all-deleted group as a stale
row).

Exactly-once across table + view without a cross-table transaction:
the same asymmetric-crash argument as the signature index
(streaming/dedup_index.py) — both MERGEs are fenced by the same
content-addressed batch id (view side prefixed ``mv-``), the streaming
checkpoint re-feeds a micro-batch that crashed between the two, and the
batch planner closes its gap with ``catch_up_derived_index`` from the
view's own offset high-water.

Oracle: the refreshed view must equal a full ``GROUP BY`` over the live
table — SQL-expressible by definition; the ``matview_repo_stats`` EXTRA
query's DuckDB twin recomputes the aggregates from the final corpus
state directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from glad_tiles_pipeline_spark.plans.lake import LakeTable

# the view is keyed (group value, MV_SENTINEL): key-1 carries the group,
# so the S22' stats prune makes single-group reads O(1) files after
# key-clustered compaction; key-2 is a constant — \x00 keeps it out of
# any real path namespace, mirroring textindex.DOC_SENTINEL
MV_SENTINEL = "\x00mv"


def create_matview(
    root: str,
    agg_fields: "list[tuple[str, str]]",
    group_name: str = "grp",
    n_buckets: int = 8,
    io=None,
) -> LakeTable:
    """Create the view table: ``(group, sentinel, *aggregates)``.
    ``agg_fields`` is ``[(name, DataType), ...]`` — e.g.
    ``[("n_paths", T.LongType()), ("total_chars", T.LongType())]``."""
    fields = [
        T.StructField(group_name, T.StringType()),
        T.StructField("mv", T.StringType()),
    ] + [T.StructField(n, t) for n, t in agg_fields]
    return LakeTable.create(
        root, schema=T.StructType(fields), n_buckets=n_buckets, io=io
    )


def mv_refresh_events(
    spark: SparkSession,
    table: LakeTable,
    groups: "list[str]",
    aggs: "dict[str, Column]",
    version: int,
) -> DataFrame:
    """View change events refreshing ``groups`` from ``table``'s CURRENT
    live state: one upsert per group still holding live rows (aggregates
    recomputed), one tombstone per group that no longer does.  The read
    is ``scan(repos=groups)`` — pruned by the key-1 file stats, sound on
    delta-heavy snapshots (lake.py::scan) — and the only shuffle is the
    groups-sized aggregate."""
    groups = sorted(set(groups))  # duplicate names would emit LWW-tied twins
    live = table.scan(spark, repos=groups)
    key1 = table.current_fields()[0]["name"]
    refreshed = live.groupBy(F.col(key1).alias("repo")).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    wanted = spark.createDataFrame(
        [(g,) for g in groups], T.StructType([T.StructField("repo", T.StringType())])
    )
    # groups named by the batch but absent from the live state → tombstone
    # (agg slots ride as NULLs of the recompute's own types)
    agg_types = {f.name: f.dataType for f in refreshed.schema.fields}
    dead = wanted.join(F.broadcast(refreshed.select("repo")), "repo", "left_anti")
    for n in aggs:
        dead = dead.withColumn(n, F.lit(None).cast(agg_types[n]))
    head = [
        F.lit(version).cast("long").alias("offset"),
        F.lit(version).cast("long").alias("commit_seq"),
    ]
    ev_u = refreshed.select(
        *head, F.lit("U").alias("op"), F.col("repo"),
        F.lit(MV_SENTINEL).alias("path"),
        *[F.col(n) for n in aggs],
    )
    ev_d = dead.select(
        *head, F.lit("D").alias("op"), F.col("repo"),
        F.lit(MV_SENTINEL).alias("path"),
        *[F.col(n) for n in aggs],
    )
    return ev_u.unionByName(ev_d).withColumn(
        "control", F.lit(None).cast("string")
    )


def refresh_matview(
    spark: SparkSession,
    table: LakeTable,
    view: LakeTable,
    groups: "list[str]",
    aggs: "dict[str, Column]",
    batch_id: str,
    offsets: dict,
    merge_mode: str = "mor",
) -> dict:
    """Refresh ``groups`` through the real MERGE path — idempotent on
    ``batch_id``; passes ``offsets`` through so the view records its own
    high-water for the generic catch-up.  The refresh version is the
    view's own monotone commit counter, NOT the window's offsets (see
    module docstring: stream micro-batches can arrive out of offset
    order, and the view must reflect the LATEST recompute)."""
    from glad_tiles_pipeline_spark.operators.merge import apply_batch
    from glad_tiles_pipeline_spark.operators.merge_into import max_commit_seq

    version = max_commit_seq(spark, view) + 1
    ev = mv_refresh_events(spark, table, groups, aggs, version=version)
    return apply_batch(
        spark, view, ev, batch_id=batch_id, offsets=offsets,
        merge_mode=merge_mode, use_arrow_udfs=False,
    )


def matview_hook(
    spark: SparkSession,
    table: LakeTable,
    view: LakeTable,
    aggs: "dict[str, Column]",
    merge_mode: str = "mor",
):
    """A ``post_apply`` hook for the T6 bridges / batch planner: after
    each micro-batch MERGEs into ``table``, recompute the view rows of
    the groups that batch touched.  Runs AFTER the main MERGE by seam
    contract, so ``table.scan`` already sees the batch's effect.  A
    control-only window still commits an (empty) view batch — the view's
    offset high-water must advance or the generic catch-up would re-feed
    the window forever."""

    def _hook(df: DataFrame, batch_id: str, offsets: dict) -> dict:
        groups = [
            r["repo"]
            for r in df.filter(F.col("control").isNull())
            .select("repo").distinct().collect()
        ]
        return refresh_matview(
            spark, table, view, groups, aggs,
            batch_id=f"mv-{batch_id}", offsets=offsets,
            merge_mode=merge_mode,
        )

    return _hook


def read_matview(spark: SparkSession, view: LakeTable,
                 groups: "list[str] | None" = None) -> DataFrame:
    """Serve the view: live rows, group key + aggregate columns.  A
    single-group read is ``scan(repos=[g])`` — O(1) files once the view
    is key-clustered (it is one row per group, so it compacts tiny)."""
    df = view.scan(spark, repos=groups) if groups is not None else view.scan(spark)
    names = [f["name"] for f in view.current_fields()]
    return df.select(names[0], *names[2:])
