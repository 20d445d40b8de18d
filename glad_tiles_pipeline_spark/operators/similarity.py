"""Similarity search over embedding columns (array<float>).

  * ``cosine`` — pure column expression (zip_with + aggregate): JVM-side,
    whole-stage codegen, no Python hop.
  * ``ann_bruteforce_topk`` — exact top-k neighbors for a query set: the
    query side is BROADCAST (small by construction), so the plan is a
    broadcast nested-loop against the corpus — embarrassingly parallel,
    no shuffle of the corpus, scales linearly with corpus size.
  * ``ann_lsh_topk`` — the scale path: random-hyperplane LSH (sign of dot
    with H deterministic pseudo-random planes → H-bit bucket key); probe
    only the query's bucket.  Recall < 1 by design; bucket key is computed
    with the same column expressions on both sides.  At 100 TB the bucketed
    variant turns the O(Q×N) nested loop into a hash join on bucket id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (cast upstream)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def ann_bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).

    Returns (query_id, neighbor_id, sim, rank).  The query side is
    broadcast; ranking is deterministic (sim desc, neighbor_id asc).
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("__cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def lsh_bucket(vec: Column, dim: int, n_planes: int = 12, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of dot(vec, plane_h).

    Planes are deterministic pseudo-random ±1 vectors derived from
    xxhash64(seed, h, i) — identical on any executor, nothing broadcast.
    """
    bits = []
    for h in range(n_planes):
        # plane component i ∈ {-1, +1} from hash parity
        dot_h = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, i: v
                * (F.pmod(F.xxhash64(F.lit(seed), F.lit(h), i), F.lit(2)) * 2 - 1).cast(
                    "double"
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot_h >= 0, F.lit(1)).otherwise(F.lit(0)) * (2 ** h))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine rank within the bucket.  Same output schema as
    ``ann_bruteforce_topk`` (recall may drop rows — approximate)."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("__cv"),
    ).withColumn("__bucket", lsh_bucket(F.col("__cv"), dim, n_planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("__qv")
    ).withColumn("__bucket", lsh_bucket(F.col("__qv"), dim, n_planes))
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def embedding_neardup(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold).

    Exact all-pairs — O(N²) — acceptable at test scale; the LSH-bucketed
    variant (join on ``lsh_bucket`` first) is the 100 TB path and is what
    ``ann_lsh_topk`` demonstrates.
    """
    a = corpus.select(F.col(id_col).alias("id_a"), as_double(vec_col).alias("__va"))
    b = corpus.select(F.col(id_col).alias("id_b"), as_double(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )
