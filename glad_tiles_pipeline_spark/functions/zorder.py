"""Z-order (Morton) clustering expressions — Delta ``OPTIMIZE ZORDER BY``
parity for the background compaction rewrite.

Key-clustered compaction (S22'') narrows ONE dimension per file: sorted
by (bucket, repo, path), a file's repo range is tight but its
offset/commit_seq range stays as wide as the bucket's history — so a
combined "repo X over offset window W" read prunes on repo only.
Z-ordering sorts by an interleaved-bit curve over TWO dimensions, making
BOTH per-file stat ranges narrow at once; the existing S22/S22' manifest
stats then prune the combined predicate multiplicatively.  No new read
machinery: z-order only changes WHERE rows land, the stats and scan
pruning are unchanged.

Everything here is pure column expressions (whole-stage codegen):

* numeric dimensions are min-max scaled to ``bits`` bits (bounds read
  O(manifest) from the stats the writers already record, or one slim agg);
* string dimensions are RANGE-RANKED against K-1 sampled boundaries
  (Delta's approach) — one slim distinct over the dimension picks evenly
  spaced boundary values, then the rank is K-1 chained comparisons per
  row.  The boundary collect is K values, metadata-scale, never the data;
* the Morton code interleaves the per-dimension ranks bit by bit
  (shiftleft/bitwiseOR chains — ~4·bits tiny JVM ops per row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 6  # 64 ranks per dimension -> 12-bit curve; plenty for
#                   file-level pruning (files >> 4096 curve cells is rare)


def interleave_bits(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative ints:
    z = ...b1 a1 b0 a0.  Pure shift/and/or expression chain."""
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(one), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(
                F.shiftright(b.cast("long"), i).bitwiseAND(one), 2 * i + 1
            )
        )
    return z


def numeric_rank(col: Column, lo: float, hi: float,
                 bits: int = DEFAULT_BITS) -> Column:
    """Min-max scale a numeric column into [0, 2^bits)."""
    k = 1 << bits
    if hi <= lo:
        return F.lit(0)
    span = float(hi) - float(lo) + 1.0
    r = F.floor((col.cast("double") - F.lit(float(lo))) * F.lit(k) / F.lit(span))
    return F.greatest(F.lit(0), F.least(F.lit(k - 1), r)).cast("int")


def string_boundaries(df: DataFrame, col: str,
                      bits: int = DEFAULT_BITS) -> list:
    """K-1 evenly spaced boundary values of the column's sorted distinct
    domain — one slim distinct + window over (distinct values), collected
    as at most 2^bits - 1 strings."""
    k = 1 << bits
    from pyspark.sql import Window

    dom = (
        df.select(col).distinct()
        .withColumn("__rn", F.row_number().over(Window.orderBy(col)))
    )
    n = dom.count()
    if n <= 1:
        return []
    step = max(n // k, 1)
    rows = (
        dom.filter((F.col("__rn") % step == 0) & (F.col("__rn") < n))
        .orderBy("__rn")
        .limit(k - 1)
        .collect()
    )
    return [r[col] for r in rows]


def string_rank(col: Column, boundaries: list,
                bits: int = DEFAULT_BITS) -> Column:
    """Range-rank a string column against sorted ``boundaries`` —
    rank = #boundaries <= value (chained comparisons, codegen) — then
    LEFT-SCALE the rank into the full [0, 2^bits) space.  The scaling
    matters: a small domain (say 8 repos) ranks into 3 low bits, and
    un-scaled those land in the curve's FASTEST-varying positions, so
    consecutive rows cycle through repos and every output file spans the
    whole repo range — the opposite of clustering.  Scaled, both
    dimensions vary at comparable curve frequency."""
    r = F.lit(0)
    for b in boundaries:
        r = r + (col >= F.lit(b)).cast("int")
    scale = max((1 << bits) // (len(boundaries) + 1), 1)
    return r * F.lit(scale)
