"""Document deduplication family over the ``documents`` table — the
training-data-pipeline operators (exact, MinHash+LSH, SimHash, n-gram
Jaccard).  All pure Spark column expressions / DataFrame ops; no UDFs.

Scale notes:
  * exact dedup — one hash-groupBy; partial agg makes it skew-tolerant.
  * MinHash+LSH — shingle → K minhashes in ONE pass over the exploded
    shingles (K aggregates, map-side combined), band → bucket self-join on
    (band, hash): candidate pairs ∝ true near-dups, never O(N²).
  * SimHash — 32-bit signature from per-token hash bits, computed with
    array expressions per row (no explode, no shuffle until the final
    bucket-group).
  * n-gram Jaccard — exact verification on a bounded candidate set
    (blocking key), the verify step LSH candidates feed into.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS = r"\s+"


def _tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), WS)


def _shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct) as array<string>."""
    toks = _tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def normalized_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), WS, " ")


_FAN_OUT_PARTS_CACHE: dict[tuple, int] = {}


def fan_out(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Repartition ahead of compute-heavy per-row work (shingling, K-hash
    signatures).  A text corpus compresses ~10× in parquet, so scan splits
    sized for IO leave the CPU-bound explode running on a handful of tasks
    (measured: the sf0.1 documents table is ONE split — the whole minhash
    signature stage ran on 1 of 32 cores).  The shuffled payload is the raw
    rows (cheap relative to the downstream expansion); skip when the input
    is already wide enough.

    The width probe (``df.rdd.getNumPartitions``) forces a DataFrame→RDD
    plan translation, so its result is memoized — repeated calls on the
    same scan (every query in a suite run) pay it once.  The memo key is
    (plan semantic hash, leaf file listing with per-file size+mtime): the
    semantic hash alone canonicalizes a re-scan of the same PATH to the
    same key even after the path's file set was rewritten — or overwritten
    in place under the same names — which would revive a stale width.  The
    memo is bounded (cleared past 256 entries): a re-probe beats stale
    growth in long-lived services.
    All call sites hand fan_out a scan-rooted frame, where the split count
    is fixed at planning time (AQE only re-plans *shuffle* reads), so the
    probe never mis-reads an adaptive partition count."""
    import os

    parts = parts or df.sparkSession.sparkContext.defaultParallelism

    def _stat(uri: str) -> tuple:
        # paths alone can't detect an in-place rewrite under the same
        # names; fold in (size, mtime) when the file is locally statable
        p = uri[len("file:"):] if uri.startswith("file:") else uri
        try:
            st = os.stat(p)
            return (uri, st.st_size, int(st.st_mtime_ns))
        except OSError:
            return (uri, -1, -1)

    key = (df.semanticHash(), hash(tuple(sorted(map(_stat, df.inputFiles())))))
    width = _FAN_OUT_PARTS_CACHE.get(key)
    if width is None:
        if len(_FAN_OUT_PARTS_CACHE) >= 256:  # bound: re-probe beats stale growth
            _FAN_OUT_PARTS_CACHE.clear()
        width = df.rdd.getNumPartitions()
        _FAN_OUT_PARTS_CACHE[key] = width
    if width >= parts:
        return df
    return df.repartition(parts)


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized text: one row per distinct content, keeping
    the smallest id; reports group size.  sha256 fingerprint (not xxhash64)
    so the DuckDB oracle can reproduce it bit-for-bit."""
    fp = F.sha2(normalized_text(F.col(text_col)), 256)
    return (
        docs.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """K independent minhashes per doc: explode distinct shingles once,
    aggregate K mins in one pass (map-side combine → skew-immune)."""
    exploded = fan_out(docs).select(
        F.col(id_col), F.explode(_shingles(F.col(text_col), shingle_n)).alias("sh")
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}") for i in range(n_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_bands(
    sigs: DataFrame,
    n_hashes: int,
    n_bands: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Band a minhash-signature frame (id, h0..h{K-1}) into slim
    (id, band, band_hash) rows — ONE explode, pure expressions.  Shared by
    the full-corpus LSH self-join and the incremental batch-vs-index join
    (operators/incremental.py) so both produce bit-identical band keys:
    the equivalence contract between them rests on this helper being the
    single spelling of the banding."""
    rows_per_band = n_hashes // n_bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("band_hash"),
        )
        for b in range(n_bands)
    ]
    return (
        sigs.select(F.col(id_col), F.explode(F.array(*band_structs)).alias("bb"))
        .select(F.col(id_col), F.col("bb.band").alias("band"),
                F.col("bb.band_hash").alias("band_hash"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH candidate pairs: band the signature (rows=n_hashes/n_bands),
    bucket-join docs sharing any band hash.  Returns (id_a, id_b) distinct,
    id_a < id_b."""
    sigs = minhash_signatures(docs, n_hashes, shingle_n, id_col, text_col)
    # ONE pass over the signatures: bands come out of an explode instead of
    # an n_bands-way union (which would re-run the shingle explode + K-min
    # aggregation per band — measured 10 full scans without it).  The
    # self-join's two sides contain the identical aggregate subtree, so
    # Spark's exchange reuse (ReusedExchange, verified in the plan by
    # tests/test_plan_shapes.py) executes the expensive explode+K-min ONCE
    # and serves both sides from the same shuffle output — same effect as
    # the round-1 persist() but with no storage-memory leak to unpersist.
    banded = minhash_bands(sigs, n_hashes, n_bands, id_col)
    left = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact shingle-set Jaccard over candidate (id_a, id_b) pairs."""
    sh = fan_out(docs).select(
        F.col(id_col), _shingles(F.col(text_col), shingle_n).alias("sh")
    )
    out = (
        candidates.join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def minhash_neardup(docs: DataFrame, threshold: float = 0.8, **kw) -> DataFrame:
    """Full MinHash pipeline: LSH candidates → exact Jaccard verify."""
    cands = minhash_lsh_pairs(docs, **kw)
    return jaccard_pairs(docs, cands, threshold=threshold)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-data decontamination: flag corpus documents sharing
    ``min_hits``+ distinct word ``n``-gram shingles with any benchmark
    (eval-set) document — the standard n-gram-overlap contamination check
    run before training.  Returns (doc_id, bench_id, n_hits, overlap)
    where overlap = |shared shingles| / |corpus doc's shingles|; feed the
    distinct doc_ids to a left-anti join to produce the clean corpus.

    100 TB shape: the benchmark side is eval-set-sized (thousands of docs
    vs billions) → exploded shingles BROADCAST; the corpus side explodes
    to slim (id, n_sh, shingle) rows and never shuffles — the only wide op
    is the per-(doc, bench) count aggregation over join SURVIVORS, which
    is output-sized (contamination is rare), not corpus-sized.  No UDF;
    everything is one equi-join plus a hash aggregate.  The corpus side is
    fanned out first (X2): text parquet under-splits by IO size, and the
    shingle explode is exactly the CPU-heavy per-row expansion the width
    probe exists for."""
    c = fan_out(corpus).select(
        F.col(id_col).alias("doc_id"), _shingles(F.col(text_col), n).alias("sh")
    ).select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    b = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(_shingles(F.col(text_col), n)).alias("shingle"),
    )
    return (
        c.join(F.broadcast(b), "shingle")
        .groupBy("doc_id", "bench_id", "n_sh")
        .agg(F.count("*").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
        .select(
            "doc_id",
            "bench_id",
            F.col("n_hits").cast("int").alias("n_hits"),
            F.round(F.col("n_hits") / F.col("n_sh"), 6).alias("overlap"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum quota sample: the ``k`` docs with the
    lowest sha256(id) per stratum — a seedless, engine-independent shuffle
    order (both Spark and the SQL oracle compute the identical hex), so
    the sample is stable across reruns, partitionings, and engines: the
    property a training-mix builder needs for reproducible data recipes.

    100 TB shape: one window per stratum key — partial top-k pushes below
    the exchange (rank ≤ k lets Spark's WindowGroupLimit prune each map
    partition to k rows before the shuffle), so the wide stage moves
    O(strata × k), not the corpus."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        F.sha2(F.col(id_col).cast("string"), 256), F.col(id_col)
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def hash_sample(
    docs: DataFrame, rate: float, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample: keep a row iff the first 8
    hex digits of sha256(id), read as a uint32 fraction, fall below
    ``rate``.  Unlike ``DataFrame.sample`` this is a pure column predicate
    — reproducible across engines/partitionings, pushable into the scan,
    and stable under re-runs (the contract consistent train/eval splits
    need).  No shuffle at all."""
    frac = F.conv(F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 8),
                  16, 10).cast("double") / F.lit(float(2**32))
    return docs.filter(frac < rate)


def length_banded_pairs(
    docs: DataFrame,
    band_width: int = 16,
    id_col: str = "doc_id",
    len_col: str = "n_chars",
) -> DataFrame:
    """Candidate (id_a, id_b) pairs whose lengths differ by ≤ band_width/2,
    via TWO length grids of cell width ``band_width`` offset by half a cell:
    any two lengths within band_width/2 of each other share a cell in at
    least one grid (1-D pigeonhole), so recall over that length window is
    1.0 and the join is a pure equi-join on (grid, cell) — never a range or
    theta join.  Each doc emits exactly 2 slim rows (id, grid, cell)."""
    half = band_width // 2
    cells = F.array(
        F.struct(F.lit(0).alias("g"),
                 F.floor(F.col(len_col) / band_width).alias("cell")),
        F.struct(F.lit(1).alias("g"),
                 F.floor((F.col(len_col) + half) / band_width).alias("cell")),
    )
    keyed = docs.select(F.col(id_col), F.explode(cells).alias("gc")).select(
        F.col(id_col), F.col("gc.g").alias("g"), F.col("gc.cell").alias("cell")
    )
    a = keyed.select(F.col(id_col).alias("id_a"), "g", "cell")
    b = keyed.select(F.col(id_col).alias("id_b"), "g", "cell")
    return (
        a.join(b, ["g", "cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_blocked(
    docs: DataFrame,
    threshold: float = 0.5,
    band_width: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """n-gram Jaccard near-dup with a length-band blocking key — the
    SQL-expressible variant the DuckDB oracle verifies exactly (same double
    grid + same jaccard in SQL).

    Blocking on length is the classic size filter for set-similarity joins:
    near-identical documents have near-identical lengths (jaccard ≥ t bounds
    the shingle-set size ratio to ≥ t).  The length window caught here is
    ± band_width/2 chars — a bounded-recall heuristic tuned for the
    edit-jitter regime; the principled any-length path is MinHash LSH
    (``minhash_neardup``).  Within-block work is quadratic, so block sizes
    must stay bounded (tests/test_similarity_recall.py gates this); a corpus spike at
    one exact length degrades to that block's square — use LSH there."""
    pairs = length_banded_pairs(docs, band_width, id_col=id_col)
    return jaccard_pairs(
        docs, pairs, threshold=threshold, id_col=id_col, text_col=text_col
    )


def simhash32(col: Column, token_hash: str = "xxhash64") -> Column:
    """32-bit SimHash of the token list, as one bigint — per-row expression
    math, zero shuffles, SINGLE PASS: hash each token once (``transform``),
    fold the hashes into a 32-slot ±1 count vector with one ``aggregate``
    (count_i = Σ_tokens (bit_i(hash) ? +1 : -1)), then pack sign bits
    (bit i of the signature = count_i > 0).

    ``token_hash`` picks the per-token hash: ``"xxhash64"`` (default, the
    fast JVM intrinsic) or ``"sha256"`` — the low 32 bits of
    ``conv(substr(sha2(tok, 256), 1, 8), 16, 10)``, an expression DuckDB
    reproduces verbatim (``CAST('0x' || substr(sha256(tok), 1, 8) AS
    BIGINT)``), making the whole signature — and therefore the near-dup
    pair set — fully oracle-checkable instead of rows-only.  Both are
    per-token JVM expressions; sha256 costs ~2× on the token hash but
    identical shuffle/fold structure.

    The round-2 shape ran 32 independent ``aggregate`` passes — 32 token-
    list traversals and 32 xxhash64 evaluations per token per row, the most
    expensive per-row expression in the repo at 100 TB.  This version hashes
    each token exactly once and traverses the list once; shift amounts are
    lambda-bound columns, so the shifts go through ``F.call_function``
    (the PySpark ``shiftright``/``shiftleft`` wrappers only take Python-int
    amounts)."""
    if token_hash == "xxhash64":
        tok_h = lambda t: F.xxhash64(t)  # noqa: E731
    elif token_hash == "sha256":
        tok_h = lambda t: F.conv(  # noqa: E731
            F.substring(F.sha2(t, 256), 1, 8), 16, 10
        ).cast("long")
    else:
        raise ValueError(f"unknown token_hash {token_hash!r}")
    idx = F.sequence(F.lit(0), F.lit(31))
    hashes = F.transform(_tokens(col), tok_h)
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 32),
        lambda acc, h: F.zip_with(
            acc,
            idx,
            lambda a, i: a
            + F.when(
                F.call_function("shiftright", h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            counts,
            idx,
            lambda c, i: F.when(
                c > 0, F.call_function("shiftleft", F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def simhash_bands(
    sigs: DataFrame,
    max_hamming: int,
    id_col: str = "doc_id",
    sig_col: str = "sig",
) -> DataFrame:
    """Pigeonhole bands of a 32-bit SimHash signature frame: the 32 bits
    split into ``max_hamming + 1`` disjoint bands, one slim (id, sig, band,
    band_bits) row per band.  Shared single spelling for the full-corpus
    self-join and the incremental batch-vs-index join, like
    ``minhash_bands``."""
    n_bands = max_hamming + 1
    width = (32 + n_bands - 1) // n_bands  # ceil: bands cover all 32 bits
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col(sig_col), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("band_bits"),
        )
        for b in range(n_bands)
    ]
    return sigs.select(
        F.col(id_col), F.col(sig_col).alias("sig"),
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select(
        F.col(id_col), F.col("sig"),
        F.col("bb.band").alias("band"), F.col("bb.band_bits").alias("band_bits"),
    )


def simhash_neardup(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup: docs whose 32-bit signatures differ in ≤ max_hamming
    bits — EXACT for the radius, via pigeonhole multi-band blocking.

    The 32 signature bits are split into ``max_hamming + 1`` disjoint bands;
    a pair differing in ≤ max_hamming bits must agree exactly on at least
    one band (pigeonhole), so candidates = union of per-band equi-joins and
    recall is 1.0 by construction (the round-1 single-block variant silently
    missed any pair whose differing bits touched the block).  The Hamming
    verify is bit_count(xor) on the full signatures, carried through the
    band join (8 B/row).  Each band is an equi-join on a ~32/(h+1)-bit key:
    shuffle-friendly, never all-pairs; the explode costs (h+1)× rows of
    (id, sig, band, band_bits) — slim columns only."""
    sigs = fan_out(docs).select(
        F.col(id_col), simhash32(F.col(text_col), token_hash).alias("sig")
    )
    banded = simhash_bands(sigs, max_hamming, id_col=id_col)
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band", "band_bits"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band", "band_bits"
    )
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
