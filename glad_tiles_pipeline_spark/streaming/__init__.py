"""Structured Streaming surface (SURVEY.md §2.9, §3 EP-C)."""

from glad_tiles_pipeline_spark.streaming.bridge import (
    stream_ingest,
    stream_ingest_continuous,
    stream_metrics,
    with_stream_hygiene,
)
from glad_tiles_pipeline_spark.streaming.stateful import repo_activity_state

__all__ = [
    "repo_activity_state",
    "stream_ingest",
    "stream_ingest_continuous",
    "stream_metrics",
    "with_stream_hygiene",
]
