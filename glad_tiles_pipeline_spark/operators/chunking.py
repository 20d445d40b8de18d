"""Document chunking — the training-data op that turns documents into
overlapping token-window chunks (context-length packing feeds on this).

Two spellings with identical output:

  * ``chunk_documents`` — pure column expressions (sequence → transform →
    slice → posexplode): JVM-side, whole-stage codegen, the 100 TB path.
    One explode, no shuffle, no Python.
  * ``chunk_documents_udtf`` — the same operator through the modern
    PySpark UDTF surface (V6): a lateral-join table function, Arrow-
    optimized (``useArrow=True`` — a non-Arrow UDTF would be row-at-a-time
    pickle, the banned V5 shape).  Exists to cover the API surface and as
    the template for chunkers that need real tokenizers (which are Python
    libraries); equality with the expression twin is pytest-gated.

Chunk geometry: windows of ``chunk_tokens`` whitespace tokens advancing by
``chunk_tokens - overlap``; the last window may be shorter but is never
empty; a document shorter than one window yields exactly one chunk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.docs import _tokens, fan_out


def _chunk_starts(toks: Column, chunk_tokens: int, stride: int) -> Column:
    """1-based start indices: 1, 1+stride, ... while start <= n_tokens,
    clamped so a short/empty doc still yields start=[1]."""
    n = F.greatest(F.size(toks), F.lit(1))
    # number of windows = ceil((n - chunk_tokens) / stride) + 1, min 1
    n_win = F.greatest(
        F.ceil((n - F.lit(chunk_tokens)).cast("double") / F.lit(stride)).cast("int")
        + F.lit(1),
        F.lit(1),
    )
    return F.transform(
        F.sequence(F.lit(0), n_win - 1), lambda i: i * stride + 1
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text) — one row per window."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}")
    stride = chunk_tokens - overlap
    # NULL text is canonicalized to '' so both twins yield one (0, 1, '')
    # chunk (bare split(NULL) would NULL-poison size/slice downstream)
    toks = _tokens(F.coalesce(F.col(text_col), F.lit("")))
    windows = F.transform(
        _chunk_starts(toks, chunk_tokens, stride),
        lambda s: F.slice(toks, s, chunk_tokens),
    )
    return (
        fan_out(docs)
        .select(F.col(id_col), F.posexplode(windows).alias("chunk_idx", "__w"))
        .select(
            id_col,
            "chunk_idx",
            F.size("__w").alias("n_tokens"),
            F.concat_ws(" ", "__w").alias("chunk_text"),
        )
    )


def _greedy_bins(sizes, capacity: int, start_bin: int = 0, start_fill: int = 0):
    """Greedy bin assignment over ``sizes`` in order, looping over BINS, not
    chunks: each iteration closes one bin via a ``searchsorted`` on the
    prefix sums — O(bins · log chunks) Python cost instead of a per-chunk
    interpreter loop (matters for million-chunk shard streams; property-
    tested equivalent to the per-chunk scan).  ``start_bin``/``start_fill``
    continue a partially-filled bin (the streaming twin's carried state).

    Returns (bins ndarray, last_bin, last_fill)."""
    import numpy as np

    n = len(sizes)
    if n == 0:
        return np.empty(0, dtype=np.int64), start_bin, int(start_fill)
    cs = np.cumsum(np.asarray(sizes, dtype=np.int64))
    bins = np.empty(n, dtype=np.int64)
    b = start_bin
    base = -int(start_fill)  # cs[j] - base == current bin's fill after j
    i = 0
    while i < n:
        j = int(np.searchsorted(cs, base + capacity, side="right"))
        if j <= i:
            # the current bin can't take chunk i: close it iff it holds
            # anything (an oversized chunk into an EMPTY bin stays there)
            content = int(cs[i - 1] - base) if i > 0 else int(start_fill)
            if content > 0:
                b += 1
            base = int(cs[i - 1]) if i > 0 else 0
            j = int(np.searchsorted(cs, base + capacity, side="right"))
            j = max(j, i + 1)  # oversized chunk: a bin of its own
        bins[i:j] = b
        i = j
    return bins, b, int(cs[-1] - base)


def pack_chunks(
    chunks: DataFrame,
    capacity: int = 64,
    id_col: str = "doc_id",
    order_col: str = "chunk_idx",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Greedy sequence packing — assign ordered chunks to token-budget bins
    (context-window packing): a chunk that would overflow the current bin
    opens the next one; an oversized chunk gets a bin of its own.  This is
    inherently a sequential scan per document, which Spark's expression
    language cannot fold (the bin depends on every previous chunk), so it
    runs as an A7-style grouped ``applyInPandas``: one shuffle on the doc
    key, then a vectorizable per-group pass.  Cross-document packing — one
    global bin stream — is the stateful-stream variant
    (``applyInPandasWithState`` over a partition key), deliberately out of
    scope here: per-document bins are what training-data shuffling wants.

    Output: (doc_id, chunk_idx, n_tokens, bin_idx).  The DuckDB oracle for
    the EXTRA query is an exact recursive CTE over the same chunk stream —
    the 'operator Spark lacks → Arrow grouped map + independently-computed
    oracle' pattern."""
    import pandas as pd

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        bins, _, _ = _greedy_bins(pdf[size_col].to_numpy(), capacity)
        pdf = pdf[[id_col, order_col, size_col]].copy()
        pdf["bin_idx"] = bins
        return pdf

    return (
        chunks.select(id_col, order_col, size_col)
        .groupBy(id_col)
        .applyInPandas(
            _pack,
            f"{id_col} long, {order_col} int, {size_col} int, bin_idx int",
        )
    )


def pack_chunks_global(
    chunks: DataFrame,
    capacity: int = 64,
    key_col: str = "shard",
    doc_col: str = "doc_id",
    order_col: str = "chunk_idx",
    size_col: str = "n_tokens",
) -> DataFrame:
    """CROSS-document sequence packing — one continuous greedy bin stream
    per partition key (shard/lang/corpus slice), chunks consumed in
    (doc_id, chunk_idx) order: the context-window packing that minimizes
    padding by letting short documents share bins.

    Per-key, this is one sequential scan Spark expressions cannot fold, so
    it runs as a grouped ``applyInPandas`` — parallelism comes from the KEY
    dimension (shards), which is how a 100 TB packing job is laid out
    anyway: you pick enough shards that each key's chunk stream fits a
    task, and bins never cross shards so tasks stay independent.  The
    STREAMING twin (``streaming/stateful.py::pack_chunks_stream``) carries
    (open bin, fill) per key across micro-batches as managed state and is
    equality-tested against this spelling.

    Output: (key, doc_id, chunk_idx, n_tokens, bin_idx); bins restart at 0
    per key.  Oracle: an independently-written recursive-CTE twin (EXTRA
    ``text_pack_global``)."""
    import pandas as pd

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([doc_col, order_col])
        bins, _, _ = _greedy_bins(pdf[size_col].to_numpy(), capacity)
        pdf = pdf[[key_col, doc_col, order_col, size_col]].copy()
        pdf["bin_idx"] = bins
        return pdf

    slim = chunks.select(key_col, doc_col, order_col, size_col)
    # output schema mirrors the INPUT column types (the key may be a
    # string lang, an int shard, ...) plus the computed bin index
    in_types = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in slim.schema.fields
    )
    return slim.groupBy(key_col).applyInPandas(
        _pack, f"{in_types}, bin_idx int"
    )


def chunk_documents_udtf(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """V6 twin via an Arrow-optimized Python UDTF lateral join."""
    from pyspark.sql.functions import lit, udtf

    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}")

    @udtf(returnType="chunk_idx int, n_tokens int, chunk_text string",
          useArrow=True)
    class ChunkWindows:
        def eval(self, text: str, chunk: int, ov: int):
            # mirrors the expression twin exactly, including the Spark
            # `split` edge case where an empty string yields [''] (so an
            # empty doc produces one 1-token chunk of '')
            import math
            import re

            toks = re.split(r"\s+", (text or "").strip().lower())
            stride = chunk - ov
            n = max(len(toks), 1)
            n_win = max(math.ceil((n - chunk) / stride) + 1, 1)
            for i in range(n_win):
                w = toks[i * stride: i * stride + chunk]
                yield i, len(w), " ".join(w)

    return (
        fan_out(docs)
        .lateralJoin(
            ChunkWindows(
                F.col(text_col).outer(), lit(chunk_tokens), lit(overlap)
            )
        )
        .select(id_col, "chunk_idx", "n_tokens", "chunk_text")
    )
