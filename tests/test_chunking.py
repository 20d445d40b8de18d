"""Chunking operator: expression twin == UDTF twin (V6), geometry
invariants, and the Arrow mandate on the UDTF plan."""

from __future__ import annotations

import pytest
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


def test_invalid_overlap_rejected(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=16, overlap=16)
    with pytest.raises(ValueError):
        chunk_documents_udtf(docs, chunk_tokens=16, overlap=-1)
