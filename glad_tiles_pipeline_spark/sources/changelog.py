"""S2/S3 — changelog tail sources (SURVEY.md §2.1).

The change log at rest is a directory of Parquet files (binlog/WAL-style:
append-only, offset-addressed).  Two read paths:

  * batch  — ``read_changelog_batch(spark, dir, lo, hi)``: offset-window scan.
    The ``offset BETWEEN`` predicate is sargable, so Parquet row-group
    min/max stats prune files/row-groups that lie wholly outside the window —
    at 10^10 events the tail read touches only the new files, never the
    history.  (.explain shows PushedFilters: [GreaterThan(offset,..),
    LessThanOrEqual(offset,..)]).
  * stream — ``read_changelog_stream``: Structured Streaming file source;
    ``maxFilesPerTrigger`` bounds micro-batch size, ``Trigger.AvailableNow``
    (applied at writeStream time) gives bounded replay for tests.

Retention (``prune_changelog``): WAL truncation for the at-rest log.  A
10^10-event/day tail grows the directory unboundedly; once every
consumer's resume point has passed an offset, the files wholly below it
are dead weight.  Pruning deletes exactly those files (proven per file
from parquet footer stats, driver-side) and records the horizon in an
underscore-prefixed marker the readers enforce: any read that would
START below the horizon raises instead of silently missing history —
the same honest-refusal contract as vacuum vs time travel.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType()),
        T.StructField("commit_seq", T.LongType()),
        T.StructField("commit", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("schema_ver", T.IntegerType()),
        T.StructField("control", T.StringType()),
    ]
)


def write_changelog(df: DataFrame, path: str, mode: str = "append") -> None:
    """Archive change events as Parquet (S9 append sink)."""
    df.write.mode(mode).parquet(path)


def read_changelog_batch(
    spark: SparkSession,
    path: str,
    offset_lo: int | None = None,
    offset_hi: int | None = None,
) -> DataFrame:
    """Offset-window batch tail: events with offset in (lo, hi].

    ``offset_lo`` is EXCLUSIVE (the last committed offset from the checkpoint
    manifest); ``offset_hi`` inclusive.  Both optional → full scan.

    Pruned logs: a window that would START below the prune horizon (or a
    full scan of a pruned log) raises — those events were truncated, and
    returning a silently-partial window would diverge the table from the
    replay oracle without a trace (the rollback-then-reingest path hits
    exactly this, by design: pruning forfeits replay below the horizon).
    """
    h = prune_horizon(path)
    if h > -1 and (offset_lo is None or offset_lo < h):
        raise ValueError(
            f"changelog window starts at offset "
            f"{'(full scan)' if offset_lo is None else offset_lo + 1} but "
            f"offsets <= {h} were pruned from {path}; resume points below "
            "the prune horizon cannot be replayed"
        )
    df = spark.read.schema(CHANGE_SCHEMA).parquet(path)
    if offset_lo is not None:
        df = df.filter(F.col("offset") > offset_lo)
    if offset_hi is not None:
        df = df.filter(F.col("offset") <= offset_hi)
    return df


PRUNE_MARKER = "_pruned.json"


def prune_horizon(path: str) -> int:
    """Highest offset pruned from this changelog directory (-1 = never
    pruned).  The marker file is underscore-prefixed, so Spark's parquet
    readers ignore it like ``_SUCCESS``."""
    p = os.path.join(path, PRUNE_MARKER)
    if not os.path.exists(p):
        return -1
    return int(json.loads(open(p).read())["below_offset"])


def prune_changelog(
    path: str,
    below_offset: int | None = None,
    consumers: "list | None" = None,
) -> dict:
    """WAL truncation: delete changelog files whose events ALL sit at or
    below the effective horizon — offsets every consumer has already
    applied.  The at-rest log is append-only and offset-addressed, so a
    file is provably dead when its parquet footer's max(offset) <= the
    horizon: the proof is driver-side metadata IO (the fast_count/audit
    shape), no SparkSession, no data read, O(files) at any log size.

    ``below_offset`` — explicit horizon.  ``consumers`` — LakeTable
    handles or ``(LakeTable, channel)`` pairs whose resume points CAP the
    horizon: the effective horizon is the MINIMUM over everything given,
    so a lagging derived sink (its catch-up re-reads the raw log) or a
    slower writer's channel keeps the files it still needs.  At least one
    of the two must be given.

    Safety order: the horizon marker is published (atomic replace,
    monotone max) BEFORE any file is deleted — a crash between the two
    leaves a conservative marker over intact files, never silently
    missing data.  The newest file (highest footer max) is always
    retained so the log keeps its end-of-stream marker (``max_offset``
    stays answerable).  Files without usable offset stats are kept and
    counted, never guessed about.

    What pruning forfeits, stated honestly: rollback-then-reingest below
    the horizon (the re-read raises via the ``read_changelog_batch``
    guard instead of silently diverging), and bootstrap of a NEW derived
    sink from the raw log (use ``backfill_lww_sink`` — table state — the
    same answer as the rules-changed-mid-history flow).
    """
    import pyarrow.parquet as pq

    if below_offset is None and not consumers:
        raise ValueError("prune_changelog needs below_offset or consumers")
    horizon = below_offset if below_offset is not None else None
    for c in consumers or []:
        table, chan = c if isinstance(c, tuple) else (c, None)
        hi = table.last_committed_offset(chan) if chan else (
            table.last_committed_offset()
        )
        horizon = hi if horizon is None else min(horizon, int(hi))
    horizon = int(horizon)

    # classify every data file by its footer's offset range
    candidates: list[tuple[str, int]] = []  # (path, max_offset) <= horizon
    kept_statless = 0
    tail_max = -1
    tail_file = None
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(path, name)
        pf = pq.ParquetFile(full)
        names = pf.schema_arrow.names
        if pf.metadata.num_rows == 0:
            candidates.append((full, -1))
            continue
        if "offset" not in names:
            kept_statless += 1
            continue
        ci = names.index("offset")
        fmax = None
        ok = True
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            fmax = st.max if fmax is None else max(fmax, st.max)
        if not ok or fmax is None:
            kept_statless += 1
            continue
        if fmax > tail_max:
            tail_max, tail_file = int(fmax), full
        if fmax <= horizon:
            candidates.append((full, int(fmax)))

    # never drop the newest file: the log keeps its end-of-stream marker
    doomed = [(f, mx) for f, mx in candidates if f != tail_file]

    if doomed:
        # the marker records what is ACTUALLY missing — the max offset of
        # the files being deleted, not the requested horizon: a horizon
        # beyond the log's tail would otherwise refuse reads of ranges
        # that are fully present.  Published BEFORE deleting (a crash
        # between the two is conservative) and monotone (a laxer later
        # call can't lower it).
        pruned_hi = max(mx for _, mx in doomed)
        prev = prune_horizon(path)
        marker = os.path.join(path, PRUNE_MARKER)
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(json.dumps({"below_offset": max(pruned_hi, prev)}))
        os.replace(tmp, marker)
        for f, _ in doomed:
            os.remove(f)

    return {
        "horizon": horizon,
        "pruned_files": len(doomed),
        "kept_statless": kept_statless,
        "marker": prune_horizon(path),
    }


def read_changelog_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured Streaming tail over the changelog directory (S3)."""
    reader = spark.readStream.schema(CHANGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
