"""Rehearse the driver's correctness gate at its own scale (sf0.01).

Runs every registered query (the 50-entry driver registry AND the EXTRA
spellings) against its DuckDB oracle with the driver's comparison: row
count, sorted column names, and order-insensitive value equality after
cell canonicalization.  Prints one status line per query and a summary.

Usage:  python scripts/rehearse_gate.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from glad_tiles_pipeline_spark.queries import (  # noqa: E402
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES,
    QUERIES,
)
from glad_tiles_pipeline_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_norm_cell)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    all_q = {**QUERIES, **EXTRA_QUERIES}
    all_o = {**ORACLES, **EXTRA_ORACLES}
    failed, no_oracle = [], []
    for name in sorted(all_q):
        t0 = time.time()
        try:
            got = _canon(all_q[name](spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark raised {e!r}")
            continue
        if name not in all_o:
            no_oracle.append(name)
            print(f"ROWS  {name}: {len(got)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        want = _canon(con.sql(all_o[name]).df())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = ok_rows and ok_cols and got.equals(want)
        tag = "ok  " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if tag == "FAIL":
            failed.append(name)
        print(
            f"{tag}  {name}: rows={len(got)}/{len(want)} cols={ok_cols} "
            f"vals={ok_vals} [{time.time()-t0:.1f}s]"
        )
    print(
        f"\n{len(all_q) - len(failed) - len(no_oracle)} exact, "
        f"{len(no_oracle)} rows-only, {len(failed)} failed of {len(all_q)}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
