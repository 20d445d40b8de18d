"""Replay oracle — the golden single-process applier (SURVEY.md §5.2).

Deliberately dumb and obviously correct: a Python dict keyed by (repo, path),
events applied strictly in (commit_seq, offset) order.  The engine's final
lake-table state must equal this under the per-row sha256(content) invariant
(BASELINE.json input_hint: "per-row invariant vs the reference: content
sha256 equality").

Used only at test scale (≤10^5 events); the engine never calls it.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

FINAL_COLUMNS = ["repo", "path", "commit", "lang", "content", "content_sha"]


def _sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def replay_oracle(
    events: pd.DataFrame,
    normalize_lang: bool = True,
) -> pd.DataFrame:
    """Replay a change log (pandas frame with the FIXTURES.md §2.1 columns)
    and return the final table state as pandas, one row per live key.

    Ordering: events sorted by (commit_seq, offset) — identical to the
    engine's LWW total order.  op 'I'/'U' upsert; 'D' deletes (delete of an
    absent key is a no-op).
    """
    from glad_tiles_pipeline_spark.functions.text import normalize_lang_series

    state: dict[tuple[str, str], dict] = {}
    ordered = events.sort_values(["commit_seq", "offset"], kind="mergesort")
    for row in ordered.itertuples(index=False):
        key = (row.repo, row.path)
        if row.op == "D":
            state.pop(key, None)
        else:
            state[key] = {
                "repo": row.repo,
                "path": row.path,
                "commit": row.commit,
                "lang": row.lang,
                "content": row.content,
            }
    if not state:
        return pd.DataFrame(columns=FINAL_COLUMNS)
    out = pd.DataFrame(list(state.values()))
    if normalize_lang:
        out["lang"] = normalize_lang_series(out["lang"])
    out["content_sha"] = out["content"].map(
        lambda c: _sha256_hex(c) if isinstance(c, str) else None
    )
    return out[FINAL_COLUMNS].reset_index(drop=True)


def oracle_state_df(
    spark: SparkSession, events_df: DataFrame, normalize_lang: bool = True
) -> DataFrame:
    """Collect a (small, test-scale) event DataFrame, replay it in-process,
    and return the golden final state as a Spark DataFrame for exceptAll
    comparison against the engine's table (U3, SURVEY.md §2.7)."""
    pdf = events_df.select(
        "offset", "commit_seq", "commit", "op", "repo", "path", "lang", "content"
    ).toPandas()
    final = replay_oracle(pdf, normalize_lang=normalize_lang)
    from glad_tiles_pipeline_spark.plans.lake import FINAL_SCHEMA

    return spark.createDataFrame(final, schema=FINAL_SCHEMA)
