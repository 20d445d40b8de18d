"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``glad_tiles_pipeline_spark.queries``; keys without
an oracle entry (xxhash64-seeded LSH internals that DuckDB cannot
reproduce) take the driver's weaker rows-only check.

The registry submitted here is capped at EXACTLY 50 entries: round 2
registered 56 and the driver's CORRECTNESS file truncated at 50, silently
starving the tail of any check.  Redundant spellings / near-duplicate join
variants live in ``queries.EXTRA_QUERIES`` and are verified by the local
DuckDB harness (tests/test_queries_oracle.py) with the same comparison.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: LWW dedup → broadcast join
    → Arrow lang-normalize → sha256 → per-lang aggregate (SURVEY.md §3 EP-A)."""
    from glad_tiles_pipeline_spark.queries import q_flagship

    return q_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from glad_tiles_pipeline_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    from glad_tiles_pipeline_spark.queries import ORACLES

    return dict(ORACLES)
