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
  * ``ivf_topk`` — the other scale path: IVF-Flat partition pruning
    (nearest-centroid cells, probe nprobe of n_cells).  Deterministic
    centroids make it SQL-expressible end-to-end, unlike the LSH family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.docs import fan_out


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (cast upstream) as a
    pure column expression (zip_with + aggregate HOFs).  Kept as the
    no-Python-hop twin; the hot verify/scoring paths use ``cosine_udf`` —
    the HOF chain re-evaluates per-element lambdas per row and measured
    ~4× slower than one numpy einsum per Arrow batch."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_udf():
    """Arrow-vectorized pairwise cosine: (array<double>, array<double>) →
    double, ONE numpy einsum per batch.  Malformed rows (NULL / ragged /
    mismatched dims) yield NULL, matching the HOF twin's NULL semantics;
    a rare non-rectangular batch falls back to a per-row numpy loop."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    def _cos(a, b):  # pd.Series[list[float]] ×2 -> pd.Series[float]
        if not len(a):
            return pd.Series([], dtype="float64")
        av, bv = a.tolist(), b.tolist()
        try:
            A = np.asarray(av, dtype=np.float64)
            B = np.asarray(bv, dtype=np.float64)
            rect = A.ndim == 2 and B.ndim == 2 and A.shape == B.shape
        except (ValueError, TypeError):
            rect = False
        if rect:
            num = np.einsum("ij,ij->i", A, B)
            with np.errstate(divide="ignore", invalid="ignore"):
                out = num / np.sqrt(
                    np.einsum("ij,ij->i", A, A) * np.einsum("ij,ij->i", B, B)
                )
            # zero-norm (or NaN-element) rows must surface as NULL, not NaN:
            # Spark sorts NaN above every double, so a NaN sim would float a
            # degenerate vector to rank 1 under desc('sim')
            return pd.Series(out).where(np.isfinite(out))
        vals = []
        for x, y in zip(av, bv):
            if x is None or y is None or len(x) != len(y):
                vals.append(None)
                continue
            try:
                xa = np.asarray(x, dtype=np.float64)
                ya = np.asarray(y, dtype=np.float64)
            except (TypeError, ValueError):  # NULL element inside a vector
                vals.append(None)
                continue
            den = np.sqrt(xa @ xa) * np.sqrt(ya @ ya)
            sim = float(xa @ ya / den) if den else None
            vals.append(sim if sim is not None and np.isfinite(sim) else None)
        return pd.Series(vals, dtype="float64")

    return F.pandas_udf(_cos, returnType=DoubleType())


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
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("__cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_udf()(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _plane(dim: int, h: int, seed: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane.  Derived from sha256 of
    (seed, plane, component) — identical on every executor and across
    engines, nothing broadcast."""
    import hashlib

    out = []
    for i in range(dim):
        d = hashlib.sha256(f"{seed}:{h}:{i}".encode()).digest()
        out.append(1.0 if d[0] & 1 else -1.0)
    return out


def _planes_matrix(dim: int, n_planes: int, seed: int):
    """(dim, n_planes) ±1 matrix; cached per process."""
    import numpy as np

    key = (dim, n_planes, seed)
    cache = _planes_matrix.__dict__.setdefault("_cache", {})
    if key not in cache:
        if len(cache) >= 32:  # bound: long-lived workers across many configs
            cache.clear()
        cache[key] = np.array(
            [_plane(dim, h, seed) for h in range(n_planes)], dtype=np.float64
        ).T
    return cache[key]


def lsh_bucket(vec: Column, dim: int, n_planes: int = 12, seed: int = 42) -> Column:
    """Single-probe LSH bucket id (sign bits of dot(vec, plane_h)) as a pure
    column expression — fine for a handful of planes.  The banded/multi-
    plane paths use ``banded_buckets_udf`` instead: per-row higher-order
    aggregates don't amortize at 32 planes (and 64×32 literal-array nodes
    blow past whole-stage codegen limits — measured slower, not faster)."""
    bits = []
    for h in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _plane(dim, h, seed)])
        dot_h = F.aggregate(
            F.zip_with(vec, plane, lambda v, p: v * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot_h >= 0, F.lit(1)).otherwise(F.lit(0)) * (2 ** h))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def banded_buckets_udf(dim: int, n_bands: int, rows_per_band: int, seed: int):
    """Arrow-vectorized bucket computation: ONE numpy matmul per batch —
    (batch, dim) @ (dim, n_bands·rows_per_band) — then sign-bit packing per
    band.  Returns a pandas UDF mapping array<double> → array<bigint> of
    length n_bands (bucket id per band).  This is exactly the 'vectorized
    Pandas UDF for embedding math' pattern: the JVM expression twin
    (``lsh_bucket``) re-evaluates per-row lambda aggregates and measured
    ~10× slower at 32 planes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    total = n_bands * rows_per_band

    def _buckets(s):  # pd.Series[array<double>] -> pd.Series[array<bigint>]
        # (annotations omitted: `from __future__ import annotations` would
        # stringify them and pandas_udf cannot resolve locals; the explicit
        # returnType below pins the scalar-UDF signature)
        if not len(s):  # a zero-row Arrow batch would make X 1-D and break @
            return pd.Series([], dtype=object)
        M = _planes_matrix(dim, total, seed)  # cached per worker
        X = np.array(s.tolist(), dtype=np.float64)  # (batch, dim)
        signs = (X @ M) >= 0  # (batch, total)
        out = np.zeros((signs.shape[0], n_bands), dtype=np.int64)
        for b in range(n_bands):
            for j in range(rows_per_band):
                out[:, b] |= signs[:, b * rows_per_band + j].astype(np.int64) << j
        return pd.Series(list(out))

    return F.pandas_udf(_buckets, returnType=ArrayType(LongType()))


def _banded_buckets(
    vec_df: DataFrame,
    out_id: str,
    dim: int,
    n_bands: int,
    rows_per_band: int,
    seed: int,
    id_col: str,
    vec_col: str,
    vec_out: str,
) -> DataFrame:
    """(id, vec, band, bucket) — one slim row per (vector, band).

    Malformed rows (NULL embedding or wrong dimensionality) are filtered
    up front: the numpy kernel needs a rectangular batch, and such rows
    can never hash or score anyway (the exact twin drops them too, via
    NULL cosine)."""
    vecs = fan_out(
        vec_df.filter(
            F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
        )
    ).select(F.col(id_col).alias(out_id), as_double(vec_col).alias(vec_out))
    buckets = banded_buckets_udf(dim, n_bands, rows_per_band, seed)
    return vecs.select(
        out_id, vec_out, F.posexplode(buckets(F.col(vec_out))).alias("band", "bucket")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bands: int = 16,
    rows_per_band: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via BANDED multi-probe LSH: a corpus vector is a
    candidate for a query if they share ANY of ``n_bands`` bucket keys; the
    candidate set is deduped and ranked by exact cosine.  Same output schema
    as ``ann_bruteforce_topk``; recall floor measured/asserted in
    tests/test_similarity_recall.py (a single-bucket probe — round 1's
    shape — measured recall 0.02 at the fixture's similarity levels; the
    banded union measures ≥0.9 with the same per-band key width).

    P(true neighbor at angle θ becomes a candidate) = 1 - (1-p^r)^B,
    p = 1 - θ/π — each extra band multiplies the miss rate by (1-p^r).
    The probe side is broadcast (queries ≪ corpus); the corpus never
    shuffles: candidates stream out of the broadcast hash join."""
    from pyspark.sql import Window

    c = _banded_buckets(
        corpus, "neighbor_id", dim, n_bands, rows_per_band, seed, id_col, vec_col,
        "__cv",
    )
    q = _banded_buckets(
        queries, "query_id", dim, n_bands, rows_per_band, seed, id_col, vec_col,
        "__qv",
    )
    # candidate dedup moves ONLY the id pair (16 B/row) — vectors are
    # re-joined afterwards (corpus shuffle of N slim rows + broadcast of the
    # small query side), not dragged through the multi-band explode/dedup
    cand_ids = (
        c.select("neighbor_id", "band", "bucket")
        .join(F.broadcast(q.select("query_id", "band", "bucket")),
              ["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cvecs = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("__cv")
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("__qv")
    )
    scored = (
        cand_ids.join(cvecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .withColumn("sim", cosine_udf()(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def ivf_cells_udf(centroids, nprobe: int):
    """Arrow-vectorized IVF coarse quantizer: array<double> → array<bigint>
    of the ``nprobe`` nearest centroid ids by cosine (ties broken by
    centroid id asc, matching the SQL twin's ``ORDER BY sim DESC, cid``).
    ONE numpy matmul per batch — (batch, dim) @ (dim, K).

    ``centroids`` is a list of (cid, vector) pairs, closure-captured: K is
    metadata-scale (≤ a few thousand even at 100 TB — centroids are to an
    IVF index what the manifest is to the table), so shipping it inside
    the serialized UDF is the standard broadcast-small-side move."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    C = np.array([v for _, v in centroids], dtype=np.float64)  # (K, dim)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    def _cells(s):  # pd.Series[array<double>] -> pd.Series[array<bigint>]
        if not len(s):
            return pd.Series([], dtype=object)
        X = np.array(s.tolist(), dtype=np.float64)  # (batch, dim)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = (X / np.linalg.norm(X, axis=1, keepdims=True)) @ Cn.T
        # a zero-norm vector yields all-NaN sims; map NaN → -inf so the
        # lexsort places it deterministically (lowest cid wins) instead of
        # depending on numpy's engine-specific NaN ordering — ivf_topk also
        # filters zero-norm rows up front, this is defense in depth
        np.nan_to_num(sims, copy=False, nan=-np.inf)
        # lexsort is stable: secondary key cid asc via primary -sims
        order = np.lexsort((np.broadcast_to(cids, sims.shape), -sims), axis=1)
        return pd.Series(list(cids[order[:, :nprobe]]))

    return F.pandas_udf(_cells, returnType=ArrayType(LongType()))


def _vec_ok(vec_col: str, dim: int):
    """Well-formed-embedding predicate: non-NULL, right dimensionality,
    non-zero norm (a zero vector has no defined cosine direction)."""
    return (
        F.col(vec_col).isNotNull()
        & (F.size(F.col(vec_col)) == dim)
        & (F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        ) > 0)
    )


def seed_centroids(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Deterministic coarse-quantizer seeds: the embeddings of the
    ``n_cells`` lowest ids — reproducible by any engine (the DuckDB twin
    recomputes them), and the k-means init for ``train_ivf_centroids``."""
    return [
        (r[0], r[1])
        for r in corpus.filter(_vec_ok(vec_col, dim))
        .select(F.col(id_col), as_double(vec_col))
        .orderBy(id_col)
        .limit(n_cells)
        .collect()
    ]


_IVF_SCALE = float(1 << 20)  # fixed-point quantum for deterministic means


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rate: float | None = None,
) -> list:
    """Seeded Lloyd's iterations producing DETERMINISTIC, engine-
    reproducible centroids — the production replacement for the raw
    id-ordered seeds.

    Determinism is the hard part: a distributed float mean depends on
    partial-sum order, so each component is quantized to fixed point
    (``floor(x * 2^20)`` — exact: float32→double is lossless and scaling
    by a power of two never rounds) and summed as INTEGERS, which are
    associative.  The mean ``(sum / count) / 2^20`` is then the same IEEE
    double in this engine, in DuckDB (the ``ann_ivf_trained`` oracle
    recomputes both iterations in SQL), and under any partitioning.
    Assignment ties break by centroid id asc, matching the SQL twin's
    ``ORDER BY sim DESC, cid``.

    100 TB shape: each iteration is one slim shuffle of
    (cell, pos, int64) rows with map-side partial aggregation down to
    ``n_cells × dim`` groups; the collect is metadata-scale (K·dim longs).
    ``sample_rate`` trains on a deterministic ``hash_sample`` of the
    corpus (the standard IVF practice — centroids need a sketch, not the
    population; the sample is engine-stable so the oracle can reproduce
    it)."""
    from glad_tiles_pipeline_spark.operators.docs import hash_sample

    base = corpus.filter(_vec_ok(vec_col, dim))
    if sample_rate is not None:
        base = hash_sample(base, sample_rate, id_col=id_col)
    vecs = base.select(F.col(id_col), as_double(vec_col).alias("__v"))
    cents = seed_centroids(base, dim, n_cells, id_col, vec_col)
    for _ in range(n_iters):
        q = F.floor(F.col("x") * F.lit(_IVF_SCALE)).cast("long")
        rows = (
            vecs.withColumn(
                "cell", ivf_cells_udf(cents, 1)(F.col("__v")).getItem(0)
            )
            .select("cell", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum(q).alias("s"), F.count("*").alias("cnt"))
            .collect()
        )
        acc: dict[int, list] = {}
        for r in rows:
            acc.setdefault(int(r["cell"]), [0.0] * dim)[int(r["pos"])] = (
                float(r["s"]) / int(r["cnt"]) / _IVF_SCALE
            )
        cents = [(cid, acc.get(cid, list(v))) for cid, v in cents]
    return cents


def build_ivf_index(
    corpus: DataFrame,
    out_path: str,
    centroids: list,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus with its IVF cell as a PARTITION column
    (``cell=<cid>/`` directories).  An ANN scan then prunes whole cells at
    the file-listing level — Spark's Hive-style partition pruning is the
    manifest-level pruning for this layout, so a probe of ``nprobe`` of
    ``n_cells`` cells physically reads ~nprobe/n_cells of the corpus
    (IO-gated by tests/test_similarity_recall.py)."""
    (
        corpus.filter(_vec_ok(vec_col, dim))
        .withColumn(
            "cell", ivf_cells_udf(centroids, 1)(as_double(vec_col)).getItem(0)
        )
        .write.partitionBy("cell")
        .parquet(out_path)
    )


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: list,
    dim: int,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over a persisted cell-partitioned index: the query
    batch's probe cells are collected (|Q|·nprobe ids — metadata-scale)
    and the scan is BUILT from only those ``cell=`` directories — the
    same structural pruning move as the lake's manifest planner, so the
    plan physically references ~nprobe/n_cells of the corpus (IO gate on
    ``inputFiles()``); ranking is identical to ``ivf_topk`` (same
    centroids ⇒ same output, asserted in tests)."""
    from pyspark.sql import Window

    q = queries.filter(_vec_ok(vec_col, dim)).select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("__qv")
    )
    probe = q.select(
        "query_id",
        "__qv",
        F.explode(ivf_cells_udf(centroids, nprobe)(F.col("__qv"))).alias("cell"),
    )
    probe_cells = sorted(
        r[0] for r in probe.select("cell").distinct().collect()
    )
    # a probed cell can be EMPTY (no corpus vector assigned) — intersect
    # with the cells that physically exist; an object-store deployment
    # takes this listing from its catalog/manifest instead
    import os

    existing = {
        int(e.split("=")[1])
        for e in os.listdir(index_path)
        if e.startswith("cell=")
    }
    cell_dirs = [
        f"{index_path}/cell={c}" for c in probe_cells if c in existing
    ]
    c = (
        spark.read.option("basePath", index_path)
        .parquet(*cell_dirs)
        .select(
            F.col(id_col).alias("neighbor_id"),
            as_double(vec_col).alias("__cv"),
            "cell",
        )
    )
    scored = (
        c.join(F.broadcast(probe), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_udf()(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """Approximate top-k via IVF-Flat (inverted-file index): the corpus is
    partitioned into ``n_cells`` Voronoi cells around deterministic
    centroids (the embeddings of the ``n_cells`` lowest ids — a seeded
    coarse quantizer both engines can reproduce; production would plug
    k-means centroids into the same ``ivf_cells_udf``), each corpus vector
    lands in its nearest cell, and a query scans only its ``nprobe``
    nearest cells.  Exact cosine ranks the candidates, so the output is a
    deterministic function of the cell geometry — fully SQL-expressible,
    unlike the hash-seeded LSH path.  Same output schema as
    ``ann_bruteforce_topk``; recall@k measured in
    tests/test_similarity_recall.py (0.92 at the fixture operating point,
    scanning ~nprobe/n_cells of the corpus).

    100 TB shape: assignment is one matmul per Arrow batch (no shuffle);
    candidates come from ONE equi-join on cell id with the small probe
    side broadcast; the corpus never fans out (1 cell per vector, vs
    n_bands rows per vector in the LSH variant).  Persisted as a cell
    column, the same join prunes cells at the manifest level (S22)."""
    from pyspark.sql import Window

    # malformed rows (NULL embedding / wrong dimensionality / zero norm)
    # are filtered up front, like the LSH path: the assignment UDF needs
    # rectangular Arrow batches, a NULL can never be anyone's neighbor, and
    # a zero-norm vector has no defined cosine cell (cosine_udf yields NULL
    # for it downstream anyway)
    corpus = corpus.filter(_vec_ok(vec_col, dim))
    queries = queries.filter(_vec_ok(vec_col, dim))
    # K rows — metadata-scale, like the LSH plane cache.  ``centroids``
    # plugs trained (train_ivf_centroids) or externally persisted cells
    # into the same plan; default stays the deterministic id-ordered seeds.
    cents = centroids or seed_centroids(corpus, dim, n_cells, id_col, vec_col)
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("__cv")
    )
    c = c.withColumn(
        "cell", ivf_cells_udf(cents, 1)(F.col("__cv")).getItem(0)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("__qv")
    )
    probe = q.select(
        "query_id",
        "__qv",
        F.explode(ivf_cells_udf(cents, nprobe)(F.col("__qv"))).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(probe), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_udf()(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def lsh_banded_pairs(
    corpus: DataFrame,
    dim: int,
    n_bands: int = 16,
    rows_per_band: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate (id_a, id_b) pairs from BANDED random-hyperplane LSH:
    ``n_bands`` independent bucket keys per vector (each the sign pattern of
    ``rows_per_band`` hyperplanes), candidates = union of per-band equi-joins
    on (band, bucket), distinct.  Never an all-pairs join: the plan is one
    explode (n_bands slim rows per vector: id + two ints) and one shuffled
    equi-join.  P(pair missed) = (1 - p^r)^B with p = 1 - θ/π — at
    near-dup thresholds each extra band multiplies the miss rate by <0.6."""
    vecs = fan_out(
        corpus.filter(
            F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
        )
    ).select(F.col(id_col), as_double(vec_col).alias("__v"))
    buckets = banded_buckets_udf(dim, n_bands, rows_per_band, seed)
    banded = vecs.select(
        F.col(id_col), F.posexplode(buckets(F.col("__v"))).alias("band", "bucket")
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def embedding_neardup(
    corpus: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_bands: int = 16,
    rows_per_band: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold):
    banded-LSH candidates (``lsh_banded_pairs``) → exact cosine verify on
    candidates only.  This is the 100 TB shape — candidate volume tracks the
    true near-dup density, never O(N²); the plan contains no cartesian.

    Approximate in principle (banded LSH can miss a pair); the band count is
    sized so the measured miss rate is zero on the test corpora, asserted by
    tests/test_similarity_recall.py against ``embedding_neardup_exact``.  At
    production near-dup thresholds (≥0.9 → θ ≤ 26°, p ≥ 0.85) the same band
    budget gives a far larger safety margin AND far smaller buckets."""
    pairs = lsh_banded_pairs(
        corpus, dim, n_bands, rows_per_band, id_col=id_col, vec_col=vec_col
    )
    va = corpus.select(F.col(id_col).alias("id_a"), as_double(vec_col).alias("__va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), as_double(vec_col).alias("__vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("sim", cosine_udf()(F.col("__va"), F.col("__vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )


def embedding_neardup_exact(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs O(N²) twin — ground truth for the recall harness and
    small corpora only; the scale path is ``embedding_neardup``."""
    a = fan_out(corpus).select(
        F.col(id_col).alias("id_a"), as_double(vec_col).alias("__va")
    )
    b = corpus.select(F.col(id_col).alias("id_b"), as_double(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine_udf()(F.col("__va"), F.col("__vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )
