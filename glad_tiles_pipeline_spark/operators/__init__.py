from glad_tiles_pipeline_spark.operators.dedup import (
    lww_dedup,
    lww_dedup_argmax,
    lww_dedup_semijoin,
    lww_dedup_window,
)
from glad_tiles_pipeline_spark.operators.docs import (
    decontaminate,
    hash_sample,
    stratified_sample,
)
from glad_tiles_pipeline_spark.operators.rebucket import (
    rebucket,
    rebucket_step,
    start_rebucket,
)
from glad_tiles_pipeline_spark.operators.similarity import ivf_topk

__all__ = [
    "decontaminate",
    "hash_sample",
    "ivf_topk",
    "lww_dedup",
    "lww_dedup_argmax",
    "lww_dedup_semijoin",
    "lww_dedup_window",
    "rebucket",
    "rebucket_step",
    "start_rebucket",
    "stratified_sample",
]
