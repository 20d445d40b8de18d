from glad_tiles_pipeline_spark.sources.generator import change_log
from glad_tiles_pipeline_spark.sources.changelog import (
    read_changelog_batch,
    read_changelog_stream,
    write_changelog,
)
from glad_tiles_pipeline_spark.sources.pyds import CdcGenDataSource
from glad_tiles_pipeline_spark.sources.lake_cdc import (
    LakeCdcDataSource,
    feed_as_changelog,
)

__all__ = [
    "CdcGenDataSource",
    "LakeCdcDataSource",
    "feed_as_changelog",
    "change_log",
    "read_changelog_batch",
    "read_changelog_stream",
    "write_changelog",
]
