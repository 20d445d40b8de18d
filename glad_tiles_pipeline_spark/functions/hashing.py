"""F1/F2 — hashing (SURVEY.md §2.8).

The per-row invariant column ``content_sha = sha256(content)`` uses Spark's
built-in ``sha2`` — JVM-native, inside whole-stage codegen, zero Python.
A pandas/Arrow UDF twin (``sha256_pandas_udf``) exists ONLY as the test
cross-check (SURVEY.md §5.7) and to demonstrate the mandated vectorized-UDF
surface (BASELINE.json north_star: "vectorized pandas/Arrow UDFs for content
sha256").  The hot path always takes the built-in.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def content_sha(col: str | Column = "content") -> Column:
    """sha256 hex of a string column; NULL stays NULL.  JVM-native."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


@F.pandas_udf(StringType())
def sha256_pandas_udf(s: pd.Series) -> pd.Series:
    """Arrow-vectorized sha256 (hashlib over a pandas Series).

    Batch-at-a-time over Arrow record batches — no per-row Python dispatch
    from Spark's side.  Used in tests to cross-check ``sha2`` and in the
    negative test asserting we never register a row-at-a-time ``udf``.
    """
    return s.map(
        lambda v: hashlib.sha256(v.encode("utf-8")).hexdigest()
        if isinstance(v, str)
        else None
    )


def salt_col(n_salts: int, *key_cols: str) -> Column:
    """Deterministic salt in [0, n_salts) from the key columns + offset-free
    entropy — used by the skew path (SURVEY.md §4.2)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_salts)).cast("int")


def bucket_col(n_buckets: int, repo: str = "repo", path: str = "path") -> Column:
    """Stable bucket id for the lake-table layout: xxhash64(repo,path) % B.

    pmod (not %) so the result is non-negative for negative hashes.
    """
    return F.pmod(F.xxhash64(F.col(repo), F.col(path)), F.lit(n_buckets)).cast("int")
