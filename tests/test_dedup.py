"""LWW dedup: three-strategy equivalence + agreement with the replay oracle
winner set (SURVEY.md §5.3d)."""

from __future__ import annotations

from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.dedup import (
    lww_dedup_argmax,
    lww_dedup_semijoin,
    lww_dedup_window,
)
from glad_tiles_pipeline_spark.sources.generator import change_log

N = 8000


def _canon(df):
    return df.select(
        "offset", "commit_seq", "op", "repo", "path", "lang", "content"
    )


def test_three_strategies_equivalent(spark):
    events = change_log(spark, N).cache()
    w = _canon(lww_dedup_window(events))
    a = _canon(lww_dedup_argmax(events))
    s = _canon(lww_dedup_semijoin(events))
    assert w.exceptAll(a).count() == 0 and a.exceptAll(w).count() == 0
    assert w.exceptAll(s).count() == 0 and s.exceptAll(w).count() == 0
    # exactly one row per key
    n_keys = events.select("repo", "path").distinct().count()
    assert w.count() == n_keys
    events.unpersist()


def test_winner_is_max_commit_order(spark):
    """The surviving event per key carries the max (commit_seq, offset)."""
    events = change_log(spark, N).cache()
    winners = lww_dedup_argmax(events)
    golden = (
        events.groupBy("repo", "path")
        .agg(F.max(F.struct("commit_seq", "offset")).alias("m"))
        .select("repo", "path", F.col("m.commit_seq").alias("commit_seq"),
                F.col("m.offset").alias("offset"))
    )
    got = winners.select("repo", "path", "commit_seq", "offset")
    assert got.exceptAll(golden).count() == 0
    assert golden.exceptAll(got).count() == 0
    events.unpersist()


def test_dedup_partitioning_invariance(spark):
    events = change_log(spark, N)
    a = _canon(lww_dedup_argmax(events.repartition(1)))
    b = _canon(lww_dedup_argmax(events.repartition(13)))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
