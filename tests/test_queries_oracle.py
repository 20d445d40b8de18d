"""Mimic the driver's correctness gate locally: run every queries() entry at
sf0.001 and compare against oracle_sql() via DuckDB — row count, column
names, and order-insensitive value equality (__spark_entry__.py contract).

Coverage deliberately EXCEEDS the driver's: the driver registry is capped at
50 entries (its CORRECTNESS file truncates there), so the demoted
EXTRA_QUERIES/EXTRA_ORACLES spellings are verified here with the same
comparison."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from glad_tiles_pipeline_spark.queries import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES,
    QUERIES,
)

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
ALL_ORACLES = {**ORACLES, **EXTRA_ORACLES}

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows — the same
    order-insensitive comparison shape the driver uses."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_norm_cell)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


ORACLE_KEYS = sorted(ALL_ORACLES.keys())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_all_queries_have_impl():
    missing = [k for k in ORACLE_KEYS if k not in ALL_QUERIES]
    assert missing == []
    # the driver contract itself must stay internally consistent too
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_vs_oracle(spark, duck, name):
    q = ALL_QUERIES[name]
    sql = ALL_ORACLES[name]
    got = _canon(q(spark, SF_DIR).toPandas())
    want = _canon(duck.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    neq = (got != want).any(axis=1)
    if neq.any():
        idx = neq.idxmax()
        raise AssertionError(
            f"{name}: first mismatch row {idx}:\nspark={got.iloc[idx].to_dict()}\n"
            f"duck ={want.iloc[idx].to_dict()}"
        )


def test_no_rows_only_queries_remain():
    """Round 4 promoted the last rows-only entries (dedup_minhash_lsh,
    dedup_simhash, ann_lsh_topk) to full oracles: every driver query must
    now have an oracle_sql() entry."""
    assert set(entry_mod.oracle_sql()) == set(entry_mod.queries())


def test_driver_registry_capped_at_50():
    """The driver records CORRECTNESS rows for at most ~50 queries (round 2:
    56 registered → the last 6 got none).  Keep the submitted registry at
    exactly 50 so every key lands a row; everything demoted must still be
    locally verified (present in EXTRA_* and covered above)."""
    assert len(entry_mod.queries()) == 50
    assert set(EXTRA_QUERIES) & set(QUERIES) == set()
    assert set(EXTRA_ORACLES) <= set(EXTRA_QUERIES)
