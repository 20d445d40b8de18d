#!/usr/bin/env python
"""Benchmark harness — prints exactly ONE JSON line.

Headline metric (BASELINE.json): change-events/sec applied end-to-end
(changelog tail → LWW dedup → fenced MERGE → manifest commit) on a
deterministic synthetic change log, with final-state sha256 integrity.

Also times the headline analytic queries from ``__spark_entry__.queries()``
at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Round-5 hygiene (VERDICT r4 "Next #6"): every timed item runs
``SPARK_GRAFT_BENCH_RUNS`` times (default 3, interleaved across CDC
variants) and the artifact reports the MEDIAN plus [min, max] spread —
one noisy sandbox scheduler tick no longer moves a headline number.

Env knobs:
  SPARK_GRAFT_SF_DIR    parquet dir for the query suite (default sf0.1)
  SPARK_GRAFT_CPUS      local[] parallelism (default 32)
  SPARK_GRAFT_BENCH_EVENTS  CDC log size for the e2e ingest (default 2_000_000)
  SPARK_GRAFT_BENCH_RUNS    repetitions per timed item (default 3)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

# Queries representative of each operator family (SURVEY.md §2); the full
# 50-query driver matrix (+ the EXTRA_QUERIES spellings, 29 as of round 5)
# is correctness-checked by the driver / local DuckDB harness, not timed
# here.  The two round-2 perf-weak items (embedding near-dup verify, binned
# range join) are timed explicitly so regressions show up in the artifact;
# round 4 added IVF ANN + decontamination; round 5 adds the trained-IVF
# variant and keeps BOTH simhash spellings visible (the sha256 spelling is
# the oracle-checkable driver row; xxhash64 is the production fast path —
# their delta is a deliberate, measured line item).  Round 5 also times the
# incremental (batch-vs-persisted-index) dedup spellings: their first run
# pays the one-time index build (cached per sf_dir), so with ≥3 runs the
# reported median is the steady-state probe cost — the number that matters
# for a per-batch ingest pipeline.
HEADLINE_QUERIES = [
    "flagship_cdc_enrich",
    "lww_dedup_window",
    "lww_dedup_argmax",
    "join_skew_salted",
    "join_sortmerge_revenue",
    "join_range_binned",
    "agg_pricing_summary",
    "window_rank_top3",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_fast",
    "dedup_embedding_cosine",
    "dedup_minhash_incremental",
    "dedup_embedding_incremental",
    "merge_into_upsert",
    "text_search_terms",
    "text_search_bm25",
    "text_quality_score",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_trained",
    "decontaminate_ngram",
]


def _bench_only_queries():
    """Timed-but-not-registered spellings: the xxhash64 fast-path SimHash
    twin of the sha256 oracle-checkable driver query (same plan shape,
    cheaper token hash; correctness carried by the driver row — this one
    exists so the sha256-oracle cost stays a visible line item)."""
    from glad_tiles_pipeline_spark.operators.docs import simhash_neardup

    def dedup_simhash_fast(spark, sf_dir):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return simhash_neardup(docs, max_hamming=3, token_hash="xxhash64")

    return {"dedup_simhash_fast": dedup_simhash_fast}


def _summ(samples: list[float]) -> dict:
    return {
        "sec": round(statistics.median(samples), 3),
        "spread": [round(min(samples), 3), round(max(samples), 3)],
        "runs": len(samples),
    }


def bench_cdc_ingest(spark, n_events: int, workdir: str, reps: int) -> dict:
    """End-to-end: generate log → write parquet → batched fenced MERGE ingest.

    Generation+write is excluded from the timed window (the engine tails an
    existing log); ingest covers read → dedup → merge → commit, all batches.
    All merge modes are timed: copy-on-write (read-optimal), merge-on-read +
    final compaction (write-optimal, the 10^10-event path), and mor_dv
    (positional deletes: write-time arbitration, resolution-free reads).
    Repetitions are INTERLEAVED across variants so slow machine phases hit
    every variant equally; per-variant numbers are medians.
    """
    from glad_tiles_pipeline_spark.operators.merge import compact
    from glad_tiles_pipeline_spark.plans.lake import LakeTable
    from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
    from glad_tiles_pipeline_spark.sources.generator import change_log

    log_dir = os.path.join(workdir, "changelog")
    change_log(spark, n_events).write.mode("overwrite").parquet(log_dir)

    out: dict = {"events": n_events}
    batch_size = max(n_events // 4, 1)
    # (label, merge_mode, use_arrow_udfs): the headline is the spec-mandated
    # Arrow-UDF surface; `mor_codegen` times the provably-equivalent JVM
    # expression twin so the cost of the Python exchange stays visible.
    # `mor_scd2` times the SAME mor ingest with the SCD2 history hook
    # attached (operators/scd2.py) — the per-batch price of maintaining a
    # full version history beside the table, kept a visible line item
    # (history writes every event, not just winners, plus the timeline
    # re-window; measured ~1.8x mor at 500k events when added).
    variants = [
        ("cow", "cow", True),
        ("mor", "mor", True),
        ("mor_codegen", "mor", False),
        ("mor_dv", "mor_dv", True),
        ("mor_scd2", "mor", True),
    ]
    samples: dict[str, list[float]] = {label: [] for label, _, _ in variants}
    applied: dict[str, int] = {}
    batches: dict[str, int] = {}
    for rep in range(reps):
        for label, mode, arrow in variants:
            lake_dir = os.path.join(workdir, f"lake_{label}_{rep}")
            table = LakeTable.create(lake_dir, n_buckets=32)
            hook = None
            if label == "mor_scd2":
                from pyspark.sql import types as T

                from glad_tiles_pipeline_spark.operators.scd2 import (
                    create_scd2_history,
                    scd2_hook,
                )

                hist = create_scd2_history(
                    os.path.join(workdir, f"hist_{rep}"),
                    [(n, T.StringType()) for n in ("commit", "lang",
                                                   "content")],
                    n_buckets=32,
                )
                hook = scd2_hook(spark, hist, ["commit", "lang", "content"])
            t0 = time.monotonic()
            results = ingest_changelog(
                spark, table, log_dir, batch_size=batch_size,
                merge_mode=mode, use_arrow_udfs=arrow, post_apply=hook,
            )
            if mode in ("mor", "mor_dv"):
                compact(spark, table)
            samples[label].append(time.monotonic() - t0)
            batches[label] = len(results)
            applied[label] = sum(
                r.get("metrics", {}).get("winners", 0) for r in results
            )
            shutil.rmtree(lake_dir, ignore_errors=True)
            if label == "mor_scd2":
                shutil.rmtree(os.path.join(workdir, f"hist_{rep}"),
                              ignore_errors=True)
    for label in samples:
        s = _summ(samples[label])
        out[label] = {
            **s,
            "events_per_sec": round(n_events / s["sec"], 1),
            "batches": batches[label],
            "rows_applied": applied[label],
        }
    out["sec"] = out["mor"]["sec"]
    out["events_per_sec"] = out["mor"]["events_per_sec"]
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_events = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "2000000"))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from glad_tiles_pipeline_spark.queries import EXTRA_QUERIES, QUERIES
    from glad_tiles_pipeline_spark.session import get_spark

    all_queries = {**QUERIES, **EXTRA_QUERIES, **_bench_only_queries()}

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/Arrow path once so the first timed query isn't paying init.
    spark.range(1000).selectExpr("sum(id)").collect()

    # tmpfs scratch when available: the CDC e2e measures the engine, not
    # this sandbox's noisy virtual disk (see BENCH/BASELINE.md methodology)
    scratch_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="bench_cdc_", dir=scratch_root)
    try:
        cdc = bench_cdc_ingest(spark, n_events, workdir, reps)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    qsamples: dict[str, list[float]] = {n: [] for n in HEADLINE_QUERIES}
    for _rep in range(reps):  # interleaved: machine drift hits all equally
        for name in HEADLINE_QUERIES:
            fn = all_queries[name]
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            qsamples[name].append(time.monotonic() - t0)
    query_secs = {n: _summ(s)["sec"] for n, s in qsamples.items()}
    query_spread = {n: _summ(s)["spread"] for n, s in qsamples.items()}

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "cdc_e2e_ingest_sec",
        "value": cdc["sec"],
        "unit": "sec",
        "queries": query_secs,
        "queries_spread": query_spread,
        "runs_per_item": reps,
        "sf": sf_val,
        "cdc": cdc,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
