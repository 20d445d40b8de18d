"""Chunking operator: expression twin == UDTF twin (V6), geometry
invariants, and the Arrow mandate on the UDTF plan."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.chunking import (
    chunk_documents,
    chunk_documents_udtf,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_expression_and_udtf_twins_agree(spark, docs):
    a = chunk_documents(docs, chunk_tokens=24, overlap=8)
    b = chunk_documents_udtf(docs, chunk_tokens=24, overlap=8)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_edge_cases_match(spark):
    """NULL / empty / whitespace-only / single-token / exactly-one-window
    docs (NULL canonicalizes to '' on BOTH twins)."""
    edge = spark.createDataFrame(
        [(0, None),
         (1, ""), (2, "   "), (3, "solo"), (4, " ".join(f"t{i}" for i in range(24))),
         (5, " ".join(f"t{i}" for i in range(25)))],
        "doc_id long, text string",
    )
    a = chunk_documents(edge, chunk_tokens=24, overlap=8)
    b = chunk_documents_udtf(edge, chunk_tokens=24, overlap=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    rows = {r.doc_id: r for r in a.groupBy("doc_id").count().collect()}
    assert rows[0]["count"] == 1 and rows[1]["count"] == 1 and rows[3]["count"] == 1
    null_row = a.filter(F.col("doc_id") == 0).collect()[0]
    assert (null_row.chunk_idx, null_row.n_tokens, null_row.chunk_text) == (0, 1, "")
    assert rows[4]["count"] == 1  # exactly one full window
    assert rows[5]["count"] == 2  # one token spills into a second window


def test_chunk_geometry(spark, docs):
    """Every token index is covered; consecutive chunks overlap by exactly
    `overlap` except possibly the short final window; chunk_idx dense."""
    out = chunk_documents(docs, chunk_tokens=24, overlap=8)
    tok_counts = out.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
        F.sum("n_tokens").alias("sum_chunk_tokens"),
    )
    bad_dense = tok_counts.filter(
        F.col("max_idx") != F.col("n_chunks") - 1
    ).count()
    assert bad_dense == 0
    # total source tokens per doc: chunks cover all tokens, overlap 8 per
    # adjacent pair => sum_chunk_tokens == n_tokens + 8 * (n_chunks - 1)
    src = docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n_tokens_doc"),
    )
    j = tok_counts.join(src, "doc_id")
    bad_cover = j.filter(
        F.col("sum_chunk_tokens")
        != F.col("n_tokens_doc") + 8 * (F.col("n_chunks") - 1)
    ).count()
    assert bad_cover == 0


def test_udtf_plans_arrow_not_pickle(spark, docs):
    """The V5 ban extends to UDTFs: the lateral join must evaluate through
    the Arrow UDTF path, never row-at-a-time BatchEvalPythonUDTF."""
    plan = (
        chunk_documents_udtf(docs, chunk_tokens=24, overlap=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPythonUDTF" in plan, plan
    assert "BatchEvalPythonUDTF" not in plan, plan


def test_expression_twin_has_no_python_stage(spark, docs):
    """The 100 TB path is pure JVM: no Arrow/pickle Python evaluation may
    appear in the expression chunker's plan (the UDTF twin is the
    deliberate Python surface)."""
    plan = (
        chunk_documents(docs, chunk_tokens=24, overlap=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan, plan  # Batch- and Arrow- both


def test_chunk_geometry_property(spark):
    """Hypothesis: for arbitrary (chunk_tokens, overlap, doc length) the
    geometry invariants hold — dense chunk_idx, full token coverage with
    exactly `overlap` duplication between adjacent windows, and every
    window except the last is full-size."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        chunk=st.integers(min_value=2, max_value=40),
        ov_frac=st.floats(min_value=0.0, max_value=0.9),
        n_toks=st.integers(min_value=0, max_value=200),
    )
    def check(chunk, ov_frac, n_toks):
        ov = min(int(chunk * ov_frac), chunk - 1)
        text = " ".join(f"w{i}" for i in range(n_toks))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, chunk_tokens=chunk, overlap=ov).collect(),
            key=lambda r: r.chunk_idx,
        )
        n = max(n_toks, 1)  # empty text tokenizes to ['']
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        assert sum(r.n_tokens for r in rows) == n + ov * (len(rows) - 1)
        assert all(r.n_tokens == chunk for r in rows[:-1])
        assert 1 <= rows[-1].n_tokens <= chunk

    check()


def test_pack_chunks_invariants(spark, docs):
    """Greedy packing: bins never exceed capacity (except a single
    oversized chunk), bin ids are dense and non-decreasing in chunk order,
    and every chunk is assigned exactly once."""
    from glad_tiles_pipeline_spark.operators.chunking import pack_chunks

    chunks = chunk_documents(docs, chunk_tokens=24, overlap=8)
    packed = pack_chunks(chunks, capacity=64)
    assert packed.count() == chunks.count()

    fills = packed.groupBy("doc_id", "bin_idx").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("n_chunks")
    )
    oversized = fills.filter((F.col("fill") > 64) & (F.col("n_chunks") > 1))
    assert oversized.count() == 0
    # dense bins 0..max per doc
    bad = (
        fills.groupBy("doc_id")
        .agg(F.countDistinct("bin_idx").alias("n"), F.max("bin_idx").alias("mx"))
        .filter(F.col("n") != F.col("mx") + 1)
    )
    assert bad.count() == 0
    # monotone: bin_idx never decreases along chunk order
    w_prev = F.lag("bin_idx").over(
        Window.partitionBy("doc_id").orderBy("chunk_idx")
    )
    dec = packed.withColumn("prev", w_prev).filter(
        F.col("prev").isNotNull() & (F.col("bin_idx") < F.col("prev"))
    )
    assert dec.count() == 0


def test_invalid_overlap_rejected(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=16, overlap=16)
    with pytest.raises(ValueError):
        chunk_documents_udtf(docs, chunk_tokens=16, overlap=-1)


def test_pack_global_shares_bins_across_docs(spark, docs):
    """Cross-document packing: short docs share bins within a shard, bins
    never cross shards, and per-shard bin fills respect capacity."""
    from glad_tiles_pipeline_spark.operators.chunking import (
        pack_chunks_global,
    )

    chunks = chunk_documents(docs, chunk_tokens=24, overlap=8).withColumn(
        "shard", (F.col("doc_id") % 4).cast("int")
    )
    packed = pack_chunks_global(chunks, capacity=64)
    # at least one bin holds chunks from more than one document
    multi = (
        packed.groupBy("shard", "bin_idx")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
    )
    assert multi.count() > 0
    # no bin exceeds capacity
    over = (
        packed.groupBy("shard", "bin_idx")
        .agg(F.sum("n_tokens").alias("fill"))
        .filter(F.col("fill") > 64)
    )
    assert over.count() == 0
    # every chunk appears exactly once
    assert packed.count() == chunks.count()


def test_pack_global_accepts_string_keys(spark, docs):
    """The docstring promises shard/lang/corpus-slice keys — the output
    schema must mirror the input key's type, not assume int."""
    from glad_tiles_pipeline_spark.operators.chunking import (
        pack_chunks_global,
    )

    chunks = chunk_documents(docs, chunk_tokens=24, overlap=8).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "py").otherwise("go")
    )
    packed = pack_chunks_global(chunks, capacity=64, key_col="lang")
    assert dict(packed.dtypes)["lang"] == "string"
    assert packed.count() == chunks.count()
    assert packed.select("lang").distinct().count() == 2


def test_pack_stream_equals_batch(spark, tmp_path):
    """The stateful-stream twin: micro-batch boundaries respecting global
    (doc_id, chunk_idx) order reproduce the batch pack bit-for-bit — the
    (next_bin, fill) state carries open bins across micro-batches."""
    import time

    from glad_tiles_pipeline_spark.operators.chunking import (
        pack_chunks_global,
    )
    from glad_tiles_pipeline_spark.streaming.stateful import (
        pack_chunks_stream,
    )

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(
                    F.lit(1),
                    (F.pmod(F.col("id"), 7) * 13 + 5).cast("int"),
                ),
                lambda i: F.concat(F.lit("tok"), i.cast("string")),
            ),
        ).alias("text"),
    )
    chunks = chunk_documents(docs, chunk_tokens=24, overlap=8).withColumn(
        "shard", (F.col("doc_id") % 3).cast("int")
    ).select("shard", "doc_id", "chunk_idx", "n_tokens")

    feed_dir = str(tmp_path / "chunk_feed")
    for lo, hi in [(0, 9), (10, 19), (20, 29)]:
        (
            chunks.filter(F.col("doc_id").between(lo, hi))
            .orderBy("doc_id", "chunk_idx")
            .coalesce(1)
            .write.mode("append")
            .parquet(feed_dir)
        )
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    stream = (
        spark.readStream.schema(chunks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    q = (
        pack_chunks_stream(stream, capacity=64)
        .writeStream.format("memory")
        .queryName("pack_stream_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("pack_stream_sink")
    want = pack_chunks_global(chunks, capacity=64)
    assert got.count() == chunks.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the fixture genuinely exercises cross-batch state: some bin holds
    # chunks from documents that arrived in different micro-batches
    spans = (
        got.groupBy("shard", "bin_idx")
        .agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        )
        .filter((F.col("lo") <= 9) & (F.col("hi") >= 10))
    )
    assert spans.count() > 0


def test_greedy_bins_property_matches_per_chunk_scan():
    """_greedy_bins (bin-wise searchsorted over prefix sums) must equal the
    straightforward per-chunk greedy scan for any sizes and carried state —
    including oversized chunks, zero-size chunks, and empty input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from glad_tiles_pipeline_spark.operators.chunking import _greedy_bins

    def reference(sizes, capacity, b, fill):
        bins = []
        for t in sizes:
            t = int(t)
            if fill > 0 and fill + t > capacity:
                b, fill = b + 1, 0
            fill += t
            bins.append(b)
        return bins, b, fill

    @settings(max_examples=300, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=0, max_value=130), max_size=60),
        capacity=st.integers(min_value=1, max_value=100),
        start_bin=st.integers(min_value=0, max_value=5),
        start_fill=st.integers(min_value=0, max_value=100),
    )
    def check(sizes, capacity, start_bin, start_fill):
        got_bins, got_b, got_fill = _greedy_bins(
            sizes, capacity, start_bin=start_bin, start_fill=start_fill
        )
        want_bins, want_b, want_fill = reference(
            sizes, capacity, start_bin, start_fill
        )
        assert list(got_bins) == want_bins
        if sizes:  # carried state only meaningful when something was packed
            assert (got_b, got_fill) == (want_b, want_fill)

    check()
