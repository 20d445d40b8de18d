"""W1/A4 — commit-ordered last-writer-wins dedup (SURVEY.md §2.4 A4, §2.5 W1).

Semantics (BASELINE.json north_star): keep, per key (repo, path), the event
with the greatest (commit_seq, offset) — commit order, offset as the
deterministic tie-break.  ``offset`` is globally unique, so the winner is
unique; all three implementations below are provably equivalent (property
test: tests/test_dedup.py).

Three physical strategies, chosen for scale:

  * ``lww_dedup_window`` — the flagship spelling: ``row_number`` over a
    (repo, path) window.  One shuffle; simple; but a hot monorepo key lands
    on ONE reducer and AQE cannot split a skewed *window* partition
    (it only splits skewed joins).  Fine for uniform keys.
  * ``lww_dedup_argmax`` — skew-immune: ``groupBy(key).agg(max_by(payload,
    (commit_seq, offset)))``.  HashAggregate runs partial (map-side combine)
    → final: a key hot in the input is reduced to ≤1 row per map task
    BEFORE the shuffle, so the reducer for a hot key receives at most
    #map-tasks rows, not #events.  This is the 100 TB default.
  * ``lww_dedup_semijoin`` — additionally keeps the (potentially large)
    ``content`` column OUT of the shuffle (SURVEY.md §4.2 layout note):
    phase 1 aggregates only (key, commit_seq, offset) to pick winning
    offsets; phase 2 left-semi-joins the original events on ``offset``.
    Shuffle bytes drop from O(sum content) to O(#events × ~40B).  Best when
    content ≫ key width (source files: yes).

``lww_dedup`` picks ``argmax`` by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["repo", "path"]
ORDER = ["commit_seq", "offset"]


def lww_dedup_window(
    events: DataFrame,
    key: list[str] | None = None,
    order: list[str] | None = None,
) -> DataFrame:
    """W1: row_number() over (key ORDER BY commit_seq DESC, offset DESC) == 1."""
    key = key or KEY
    order = order or ORDER
    w = Window.partitionBy(*key).orderBy(*[F.desc(c) for c in order])
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lww_dedup_argmax(
    events: DataFrame,
    key: list[str] | None = None,
    order: list[str] | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """A4: arg-max by (commit_seq, offset) via max(struct(...)) with map-side
    partial aggregation — the skew-immune path.

    ``count_col``: also emit the per-key pre-dedup event count under this
    name — it rides the same HashAggregate for free, so callers that need
    batch metrics (events_read) avoid a second pass over the input.
    """
    key = key or KEY
    order = order or ORDER
    payload = [c for c in events.columns if c not in key]
    # The order columns lead the struct; they are unique per event, so the
    # trailing payload fields never participate in the comparison.
    ordered = F.struct(
        *[F.col(c) for c in order], *[F.col(c) for c in payload if c not in order]
    )
    aggs = [F.max(ordered).alias("__w")]
    if count_col is not None:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    agg = events.groupBy(*key).agg(*aggs)
    extra = [F.col(count_col)] if count_col is not None else []
    return agg.select(
        *key, *[F.col(f"__w.{c}").alias(c) for c in payload], *extra
    )


def lww_dedup_semijoin(
    events: DataFrame,
    key: list[str] | None = None,
    order: list[str] | None = None,
) -> DataFrame:
    """Slim-shuffle LWW: aggregate only the ordering columns to choose the
    winning offset per key, then semi-join the full rows back on the last
    order column (``offset`` — globally unique).  content never crosses the
    dedup shuffle."""
    key = key or KEY
    order = order or ORDER
    uniq = order[-1]
    winners = (
        events.select(*key, *order)
        .groupBy(*key)
        .agg(F.max(F.struct(*[F.col(c) for c in order])).alias("__w"))
        .select(F.col(f"__w.{uniq}").alias(uniq))
    )
    return events.join(winners, uniq, "left_semi")


def lww_dedup(
    events: DataFrame,
    key: list[str] | None = None,
    strategy: str = "argmax",
    order: list[str] | None = None,
) -> DataFrame:
    """Dispatch: 'window' | 'argmax' (default, skew-immune) | 'semijoin'."""
    fn = {
        "window": lww_dedup_window,
        "argmax": lww_dedup_argmax,
        "semijoin": lww_dedup_semijoin,
    }[strategy]
    return fn(events, key, order)
