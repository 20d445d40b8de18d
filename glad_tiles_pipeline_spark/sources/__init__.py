from glad_tiles_pipeline_spark.sources.generator import change_log
from glad_tiles_pipeline_spark.sources.changelog import (
    read_changelog_batch,
    read_changelog_stream,
    write_changelog,
)
from glad_tiles_pipeline_spark.sources.pyds import CdcGenDataSource

__all__ = [
    "CdcGenDataSource",
    "change_log",
    "read_changelog_batch",
    "read_changelog_stream",
    "write_changelog",
]
