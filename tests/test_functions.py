"""F1/V1 invariants: sha2 == hashlib pandas UDF; pandas normalizer == JVM
CASE expression == oracle kernel; no row-at-a-time udf anywhere (SURVEY §5.7)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.functions.hashing import content_sha, sha256_pandas_udf
from glad_tiles_pipeline_spark.functions.text import (
    normalize_lang,
    normalize_lang_expr,
    normalize_lang_series,
    normalize_lang_sql,
)
from glad_tiles_pipeline_spark.sources.generator import change_log


def test_sha2_matches_hashlib(spark):
    df = change_log(spark, 2000).filter(F.col("content").isNotNull())
    mism = df.filter(
        content_sha("content") != sha256_pandas_udf(F.col("content"))
    ).count()
    assert mism == 0


def test_lang_normalizer_consistency(spark):
    df = change_log(spark, 2000)
    mism = df.filter(
        normalize_lang(F.col("lang")) != normalize_lang_expr("lang")
    ).count()
    assert mism == 0
    # pandas kernel directly
    s = pd.Series(["Python", " py ", "PY", "golang", "JS ", "C++", "weird"])
    out = normalize_lang_series(s).tolist()
    assert out == ["python", "python", "python", "go", "javascript", "cpp", "weird"]


def test_lang_normalizer_idempotent():
    """normalize(normalize(x)) == normalize(x) — the merge path relies on
    this to re-normalize post-dedup without corrupting already-normalized
    live rows (operators/merge.py _finalize_winners)."""
    s = pd.Series(
        ["Python", " py ", "golang", "JS", "C++", "weird", None, "rust", "rs"]
    )
    once = normalize_lang_series(s)
    twice = normalize_lang_series(once)
    assert once.fillna("∅").tolist() == twice.fillna("∅").tolist()


def test_lang_normalizer_iter_matches_scalar(spark):
    """V2 ≡ V1: the iterator pandas UDF returns exactly the scalar UDF's
    answer (amortized init must not change semantics)."""
    from glad_tiles_pipeline_spark.functions.text import normalize_lang_iter

    df = change_log(spark, 2000)
    mism = df.filter(
        normalize_lang_iter(F.col("lang")) != normalize_lang(F.col("lang"))
    ).count()
    assert mism == 0


def test_lang_normalizer_sql_twin(spark):
    import duckdb

    df = change_log(spark, 1000).select("lang").toPandas()
    con = duckdb.connect()
    con.register("t", df)
    got = con.sql(f"SELECT {normalize_lang_sql('lang')} AS l FROM t").df()["l"]
    want = normalize_lang_series(df["lang"]).reset_index(drop=True)
    assert (got == want).all()


def test_no_rowwise_udf_registered():
    """V5 ban: the engine source never calls pyspark row-at-a-time udf()."""
    import ast
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "glad_tiles_pipeline_spark"
    offenders = []
    for p in root.rglob("*.py"):
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.Call):
                fn = node.func
                name = fn.attr if isinstance(fn, ast.Attribute) else getattr(fn, "id", "")
                if name == "udf":
                    offenders.append(f"{p}:{node.lineno}")
    assert offenders == []
