"""Property-based invariants for the stats-driven partition planner —
the one piece of custom 'physical planning' the engine does (SURVEY §4.2).
A wrong ``__pid`` silently serializes buckets onto single reducers or
splits a bucket across write partitions; these properties pin the
contract under arbitrary bucket-row histograms.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from glad_tiles_pipeline_spark.operators.merge import plan_partition_ids


def _plan(bucket_rows: dict[int, int], target: int):
    """Drive the pure planning arithmetic without a SparkSession: replicate
    the offsets/splits computation by calling the real function lazily on a
    stub frame is overkill — instead recompute from the same inputs the
    function uses and cross-check on a real frame in the Spark test below."""
    total = sum(bucket_rows.values()) or 1
    splits, offsets, off = {}, {}, 0
    for b in sorted(bucket_rows):
        s = max(1, round(target * bucket_rows[b] / total))
        splits[b] = s
        offsets[b] = off
        off += s
    return splits, offsets, off


@given(
    bucket_rows=st.dictionaries(
        st.integers(min_value=0, max_value=63),
        st.integers(min_value=1, max_value=10**9),
        min_size=1,
        max_size=64,
    ),
    target=st.integers(min_value=1, max_value=512),
)
@settings(max_examples=300, deadline=None)
def test_pid_ranges_disjoint_and_proportional(bucket_rows, target):
    splits, offsets, total_pids = _plan(bucket_rows, target)
    # every bucket gets ≥1 split; ranges tile [0, total_pids) with no overlap
    covered = []
    for b in sorted(bucket_rows):
        assert splits[b] >= 1
        covered += list(range(offsets[b], offsets[b] + splits[b]))
    assert covered == list(range(total_pids))
    # proportionality: a bucket with k× the rows gets ≥ its fair floor
    total = sum(bucket_rows.values())
    for b, rows in bucket_rows.items():
        fair = target * rows / total
        assert splits[b] >= max(1, int(fair) - 1)


def test_pid_assignment_matches_contract_on_spark(spark):
    """End-to-end on a real frame: pid ∈ [offset_b, offset_b + splits_b)
    for every row, and pid is a pure function of (bucket, path)."""
    from pyspark.sql import functions as F

    bucket_rows = {0: 100, 1: 10_000, 5: 1}
    df = (
        spark.range(2000)
        .withColumn("path", F.concat(F.lit("p"), F.col("id")))
        .withColumn(
            "__bucket",
            F.when(F.col("id") % 3 == 0, 0)
            .when(F.col("id") % 3 == 1, 1)
            .otherwise(5),
        )
    )
    out, n_pids = plan_partition_ids(df, bucket_rows, 32, path_col="path")
    splits, offsets, total = _plan(bucket_rows, 32)
    assert n_pids == total
    rows = out.select("__bucket", "__pid", "path").collect()
    seen = {}
    for r in rows:
        lo = offsets[r["__bucket"]]
        hi = lo + splits[r["__bucket"]]
        assert lo <= r["__pid"] < hi, (r["__bucket"], r["__pid"], lo, hi)
        # determinism: same (bucket, path) → same pid
        key = (r["__bucket"], r["path"])
        assert seen.setdefault(key, r["__pid"]) == r["__pid"]
    # the hot bucket actually received (almost) all its splits
    hot_pids = {r["__pid"] for r in rows if r["__bucket"] == 1}
    assert len(hot_pids) >= splits[1] - 2
