"""S6 generator invariants: determinism across partitionings, schema, mix."""

from __future__ import annotations

from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.sources.generator import change_log

N = 5000


def test_schema_and_counts(spark):
    df = change_log(spark, N)
    assert df.columns == [
        "offset", "commit_seq", "commit", "op", "repo", "path",
        "lang", "content", "ts", "schema_ver", "control",
    ]
    assert df.count() == N
    # offsets unique and dense
    assert df.select("offset").distinct().count() == N


def test_partitioning_invariance(spark):
    """Same data under 1, 3, and 16 generator partitions (SURVEY.md §5.3a)."""
    a = change_log(spark, N, partitions=1)
    b = change_log(spark, N, partitions=3)
    c = change_log(spark, N, partitions=16)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.exceptAll(c).count() == 0 and c.exceptAll(a).count() == 0


def test_op_mix_and_late_events(spark):
    df = change_log(spark, N).cache()
    mix = {r["op"]: r["n"] for r in df.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert set(mix) == {"I", "U", "D"}
    assert mix["I"] > mix["U"] > mix["D"]
    late = df.filter(F.col("commit_seq") < F.col("offset")).count()
    assert 0.05 < late / N < 0.15
    # deletes carry null content; others not
    assert df.filter((F.col("op") == "D") & F.col("content").isNotNull()).count() == 0
    assert df.filter((F.col("op") != "D") & F.col("content").isNull()).count() == 0
    df.unpersist()


def test_repo_skew(spark):
    """Zipf-ish: hottest repo should hold a large share (hot monorepo)."""
    df = change_log(spark, N)
    top = (
        df.groupBy("repo").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n")).limit(1).collect()[0]
    )
    assert top["n"] / N > 0.10
