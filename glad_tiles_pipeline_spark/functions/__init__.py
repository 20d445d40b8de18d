from glad_tiles_pipeline_spark.functions.hashing import content_sha, sha256_pandas_udf
from glad_tiles_pipeline_spark.functions.text import (
    LANG_ALIASES,
    normalize_lang,
    normalize_lang_expr,
    normalize_lang_series,
)

__all__ = [
    "content_sha",
    "sha256_pandas_udf",
    "LANG_ALIASES",
    "normalize_lang",
    "normalize_lang_expr",
    "normalize_lang_series",
]
