"""V1 — vectorized language normalization (SURVEY.md §2.10 V1) plus the
text-analysis function family for the documents pipeline (token counting,
quality scoring, language-ID heuristic, fingerprinting).

Everything here is either a pure Spark column expression (JVM, codegen) or a
pandas/Arrow-vectorized kernel — never a row-at-a-time Python udf
(BASELINE.json input_hint).  The pandas kernel ``normalize_lang_series`` is
shared verbatim by the Arrow UDF and the replay oracle, so engine and oracle
cannot drift.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Canonicalization map applied AFTER lower+trim.  Keys cover the denormalized
# spellings the generator emits (generator.LANG_VARIANTS) plus common aliases.
LANG_ALIASES: dict[str, str] = {
    "py": "python",
    "python3": "python",
    "golang": "go",
    "rs": "rust",
    "js": "javascript",
    "c++": "cpp",
    "c plus plus": "cpp",
}


def normalize_lang_series(s: pd.Series) -> pd.Series:
    """Shared vectorized kernel: lower, strip, alias-map.  Pure pandas ops —
    no Python-level loop."""
    low = s.str.lower().str.strip()
    return low.map(LANG_ALIASES).fillna(low)


normalize_lang = F.pandas_udf(normalize_lang_series, StringType())
normalize_lang.__doc__ = "Arrow-vectorized lang normalizer (V1)."


def _normalize_lang_iter(batches):
    """Iterator-of-Series kernel (V2): per-partition init (the alias table,
    here a dict copy standing in for a model/table load) is paid ONCE per
    Python worker, then amortized over every Arrow batch the worker sees —
    the surface for UDFs with expensive setup."""
    alias_table = dict(LANG_ALIASES)  # per-partition init, once
    for s in batches:
        low = s.str.lower().str.strip()
        yield low.map(alias_table).fillna(low)


# Typed via the Iterator[pd.Series] -> Iterator[pd.Series] pandas_udf variant.
from collections.abc import Iterator  # noqa: E402


def _normalize_lang_iter_typed(
    batches: Iterator[pd.Series],
) -> Iterator[pd.Series]:
    yield from _normalize_lang_iter(batches)


normalize_lang_iter = F.pandas_udf(_normalize_lang_iter_typed, StringType())
normalize_lang_iter.__doc__ = (
    "Iterator pandas UDF lang normalizer (V2) — same semantics as "
    "normalize_lang, amortized per-partition init."
)


def normalize_lang_expr(col: str | Column = "lang") -> Column:
    """JVM-native equivalent of ``normalize_lang`` as a CASE expression.

    Same semantics, zero Python-worker hop — this is what the 100 TB hot
    path uses; the pandas UDF exists to satisfy/demonstrate the vectorized-
    UDF surface and as a cross-check in tests.  Also the template for the
    DuckDB oracle SQL.
    """
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(F.trim(c))
    expr = low
    for alias, canon in LANG_ALIASES.items():
        expr = F.when(low == alias, F.lit(canon)).otherwise(expr)
    return expr


def normalize_lang_sql(col: str = "lang") -> str:
    """ANSI-SQL twin of ``normalize_lang_expr`` for the DuckDB oracle."""
    low = f"lower(trim({col}))"
    cases = " ".join(
        f"WHEN {low} = '{alias}' THEN '{canon}'" for alias, canon in LANG_ALIASES.items()
    )
    return f"CASE {cases} ELSE {low} END"


# ---------------------------------------------------------------------------
# Text analysis over the documents table (training-data pipeline functions).
# All pure column expressions → whole-stage codegen, pushdown-friendly.
# ---------------------------------------------------------------------------

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]

# BPE-ish tokenizer regex: words, numbers, or single non-space symbols.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+")).cast("long")


def bpe_ish_token_count(col: str | Column = "text") -> Column:
    """Token count under the BPE-ish regex (words / numbers / symbols)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")


def quality_score(col: str | Column = "text") -> Column:
    """Heuristic document quality in [0,1]: length, punctuation ratio,
    stopword ratio — the standard pretraining-corpus filters, as one
    codegen'd expression."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    words = F.split(F.lower(F.trim(c)), r"\s+")
    n_words = F.size(words).cast("double")
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(*STOPWORDS))
    ).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double")
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(stop_hits / F.greatest(n_words, F.lit(1.0)) * 5.0, F.lit(1.0))
    punct_penalty = F.least(punct / F.greatest(n_chars, F.lit(1.0)) * 10.0, F.lit(1.0))
    return F.round(
        (len_score * 0.4 + stop_score * 0.4 + (F.lit(1.0) - punct_penalty) * 0.2), 6
    )


def lang_id_heuristic(col: str | Column = "text") -> Column:
    """Tiny n-gram/stopword language-ID: scores English-function-word hits vs
    a couple of non-English markers.  A placeholder for a real LID model, but
    the plumbing (pure column expr, no UDF) is the production shape."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    words = F.split(c, r"\s+")

    def hits(markers: list[str]) -> Column:
        return F.size(F.filter(words, lambda w: w.isin(*markers))).cast("double")

    en = hits(["the", "and", "of", "is", "to"])
    de = hits(["der", "die", "und", "ist", "das"])
    es = hits(["el", "la", "los", "es", "que"])
    return (
        F.when((en >= de) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= es) & (de > 0), F.lit("de"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def fingerprint64(col: str | Column = "text") -> Column:
    """Document fingerprint: xxhash64 of the whitespace-normalized text —
    a rolling-hash-style exact-dup fingerprint, JVM-native."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))
