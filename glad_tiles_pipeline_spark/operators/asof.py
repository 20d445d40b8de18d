"""J9 — as-of join (SURVEY.md §2.3 J9).

``asof_join(left, right, ...)``: for each left row, attach the latest right
row with the same key and ``right_time <= left_time``.

Physical strategy: UNION + WINDOW, not join-then-filter.  A naive
``left.join(right, key & (rt <= lt))`` fans out to |left|×|right| per key
before the QUALIFY prunes it; the union-window form is O((|L|+|R|) log)
with ONE shuffle on the key and no fan-out — the strategy that survives a
100× scale-up.  Right rows sort before left rows at equal timestamps
(inclusive as-of); ties among right rows at the same timestamp resolve by
``right_order`` (latest wins, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    right_order: str | None = None,
) -> DataFrame:
    """Left as-of join.  ``value_cols`` are the right columns to attach
    (null when no right row precedes the left row)."""
    order_col = right_order or right_time
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__r_ord"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    # a right row with NULL time can never satisfy right_time <= left_time;
    # unfiltered it would sort FIRST (asc = NULLS FIRST) and be carried onto
    # left rows that should have no match
    right = right.filter(F.col(right_time).isNotNull())
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(order_col).cast("long").alias("__r_ord"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    ).select(*l_tagged.columns)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__r_ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the whole right payload as one struct so all value columns come
    # from the SAME winning right row
    carried = F.last(
        F.when(
            F.col("__is_left") == 0,
            F.struct(*[F.col(f"__v_{c}").alias(c) for c in value_cols]),
        ),
        ignorenulls=True,
    ).over(w)
    out = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", carried)
        .filter(F.col("__is_left") == 1)
    )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in value_cols],
    )
