from glad_tiles_pipeline_spark.operators.dedup import (
    lww_dedup,
    lww_dedup_argmax,
    lww_dedup_semijoin,
    lww_dedup_window,
)
from glad_tiles_pipeline_spark.operators.rebucket import (
    rebucket,
    rebucket_step,
    start_rebucket,
)

__all__ = [
    "lww_dedup",
    "lww_dedup_argmax",
    "lww_dedup_semijoin",
    "lww_dedup_window",
    "rebucket",
    "rebucket_step",
    "start_rebucket",
]
