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


# -- S27: per-file key blooms for point lookups ------------------------------
#
# One sha256 per key yields EIGHT independent 16-bit probe positions (the
# digest's first 8 disjoint 4-hex-char slices), so the bloom geometry is
# fixed at m = 2^16 bits (8 KiB packed), k = 8 — no modulo bias, and the
# same positions are computable JVM-side (write path, ``sha2`` inside
# codegen) and driver-side (lookup planning, ``hashlib``) with zero
# cross-engine drift.  fpp at the row cap (16 Ki keys): (1-e^-2)^8 ~ 0.25 —
# a saturating file keeps a 4x prune; at a typical per-bucket delta size
# (~1-2k keys) fpp < 1e-5.  Files above the cap skip the bloom (compaction's
# key-clustered layout gives them min/max path pruning instead).
BLOOM_BITS = 1 << 16
BLOOM_MAX_ROWS = 16384
_BLOOM_K = 8
_KEY_SEP = "\x00"


def bloom_positions_expr(key1: str, key2: str) -> Column:
    """array<int> of the 8 bloom probe positions for each row's key —
    pure JVM expressions (sha2 + conv), no Python on the write path."""
    digest = F.sha2(
        F.concat(F.col(key1), F.lit(_KEY_SEP), F.col(key2)), 256
    )
    return F.array(
        *[
            F.conv(F.substring(digest, 4 * i + 1, 4), 16, 10).cast("int")
            for i in range(_BLOOM_K)
        ]
    )


def bloom_positions(repo: str, path: str) -> list[int]:
    """Driver-side twin of ``bloom_positions_expr`` (bit-identical:
    both hash the UTF-8 bytes of ``repo + NUL + path``)."""
    hexd = hashlib.sha256(f"{repo}{_KEY_SEP}{path}".encode("utf-8")).hexdigest()
    return [int(hexd[4 * i : 4 * i + 4], 16) for i in range(_BLOOM_K)]


def pack_bloom(positions) -> str:
    """Pack set-bit positions into a base64 bitmap for the manifest entry."""
    import base64

    bm = bytearray(BLOOM_BITS // 8)
    for p in positions:
        bm[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(bm)).decode("ascii")


def bloom_may_contain(b64: str, positions: list[int]) -> bool:
    """Membership test: False is definite (the key is NOT in the file)."""
    import base64

    bm = base64.b64decode(b64)
    return all(bm[p >> 3] & (1 << (p & 7)) for p in positions)
