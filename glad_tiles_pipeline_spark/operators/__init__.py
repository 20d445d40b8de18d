from glad_tiles_pipeline_spark.operators.dedup import (
    lww_dedup,
    lww_dedup_argmax,
    lww_dedup_semijoin,
    lww_dedup_window,
)

__all__ = [
    "lww_dedup",
    "lww_dedup_argmax",
    "lww_dedup_semijoin",
    "lww_dedup_window",
]
