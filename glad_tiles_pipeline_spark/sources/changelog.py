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
"""

from __future__ import annotations

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
    """
    df = spark.read.schema(CHANGE_SCHEMA).parquet(path)
    if offset_lo is not None:
        df = df.filter(F.col("offset") > offset_lo)
    if offset_hi is not None:
        df = df.filter(F.col("offset") <= offset_hi)
    return df


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
