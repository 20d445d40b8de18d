#!/usr/bin/env python
"""Scaling-efficiency protocol (BASELINE.json north_rule: throughput scaling
efficiency ≥0.8 from N to 4N executors).

No multi-node cluster exists in this sandbox, so "N vs 4N executors" is
evidenced as two CPU-pinned local parallelism levels on the same machine
and the SAME pre-generated changelog:

  * ``taskset -c 0-(N-1)   local[N]``   — emulates the N-core cluster
  * ``taskset -c 0-(4N-1)  local[4N]``  — emulates the 4N-core cluster

Methodology notes (each one is load-bearing):
  * The table layout (n_buckets) and shuffle partitioning are FIXED across
    levels — they are properties of the table / job, not of cluster size,
    exactly as on a real cluster.
  * CPU pinning matters: an unpinned ``local[8]`` on a 32-core box borrows
    idle cores for GC/IO/Python workers, inflating small-N throughput and
    understating efficiency.
  * The working set (log, table, shuffle dirs) lives on tmpfs by default:
    this sandbox is one VM with one noisy virtual disk, while a real
    cluster's disk bandwidth scales with N.  tmpfs isolates the CPU-scaling
    signal.  Pass ``--workdir`` to measure on disk instead.
  * Ingest-only is timed (log generation excluded); fresh JVM per run;
    median of ``--runs`` runs per level, levels interleaved so machine
    drift hits both equally.

    efficiency = throughput(local[4N]) / (4 × throughput(local[N]))

Usage:  python scripts/scale_bench.py [--events 8000000] [--runs 3]
        [--levels 8,32] [--mode mor] [--workdir /dev/shm/scale_bench]
Prints one JSON line (the protocol summary) on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BUCKETS = 32
SHUFFLE_PARTITIONS = 32


def worker(args: argparse.Namespace) -> None:
    """One timed ingest in this (fresh, CPU-pinned) process; prints JSON."""
    import time

    from glad_tiles_pipeline_spark.operators.merge import compact
    from glad_tiles_pipeline_spark.plans.lake import LakeTable
    from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
    from glad_tiles_pipeline_spark.session import get_spark

    cores = args.cores
    spark = get_spark(
        app_name=f"scale-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={"spark.local.dir": os.path.join(args.workdir, "sparktmp")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    table_dir = tempfile.mkdtemp(prefix=f"tbl_{cores}_", dir=args.workdir)
    shutil.rmtree(table_dir)
    table = LakeTable.create(table_dir, n_buckets=N_BUCKETS)
    n_events = args.events
    t0 = time.monotonic()
    ingest_changelog(
        spark,
        table,
        args.log,
        batch_size=max(n_events // 4, 1),
        merge_mode=args.mode,
    )
    if args.mode in ("mor", "mor_dv"):
        compact(spark, table)
    sec = time.monotonic() - t0
    print(json.dumps({"cores": cores, "sec": round(sec, 3),
                      "events_per_sec": round(n_events / sec, 1)}))
    shutil.rmtree(table_dir, ignore_errors=True)


def generate_log(log_dir: str, n_events: int, content_repeat: int) -> None:
    """Fixed-partitioning generation so every level reads identical input."""
    from glad_tiles_pipeline_spark.session import get_spark
    from glad_tiles_pipeline_spark.sources.generator import change_log

    spark = get_spark(app_name="scale-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    change_log(
        spark, n_events, partitions=128, content_repeat=content_repeat
    ).write.mode("overwrite").parquet(log_dir)
    spark.stop()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--events", type=int, default=8_000_000)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--levels", default="8,32")
    p.add_argument("--mode", default="mor", choices=["cow", "mor", "mor_dv"])
    p.add_argument("--content-repeat", type=int, default=16,
                   help="~64B body lines per synthetic file (16 ≈ 1 KB)")
    p.add_argument("--workdir", default="/dev/shm/scale_bench",
                   help="working set location (tmpfs by default, see module doc)")
    p.add_argument("--log", default=None, help="reuse an existing changelog dir")
    p.add_argument("--no-pin", action="store_true",
                   help="skip taskset CPU pinning")
    p.add_argument("--worker", action="store_true")
    p.add_argument("--cores", type=int, default=8)
    args = p.parse_args()

    if args.worker:
        worker(args)
        return

    os.makedirs(args.workdir, exist_ok=True)
    levels = [int(x) for x in args.levels.split(",")]
    log_dir = args.log or os.path.join(args.workdir, "changelog")
    if not os.path.isdir(log_dir):
        generate_log(log_dir, args.events, args.content_repeat)

    have_taskset = shutil.which("taskset") is not None and not args.no_pin
    per_level: dict[int, list[dict]] = {n: [] for n in levels}
    for _run in range(args.runs):
        for cores in levels:  # interleave levels so drift hits both equally
            cmd = []
            if have_taskset:
                cmd += ["taskset", "-c", f"0-{cores - 1}"]
            cmd += [sys.executable, os.path.abspath(__file__), "--worker",
                    "--cores", str(cores), "--events", str(args.events),
                    "--mode", args.mode, "--log", log_dir,
                    "--workdir", args.workdir]
            out = subprocess.run(
                cmd, capture_output=True, text=True, cwd=REPO, timeout=3600
            )
            if out.returncode != 0:
                sys.stderr.write(out.stderr[-2000:])
                raise SystemExit(1)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            per_level[cores].append(json.loads(line))

    summary: dict = {
        "events": args.events,
        "mode": args.mode,
        "content_repeat": args.content_repeat,
        "n_buckets": N_BUCKETS,
        "shuffle_partitions": SHUFFLE_PARTITIONS,
        "cpu_pinned": have_taskset,
        "levels": {},
    }
    for cores in levels:
        secs = [r["sec"] for r in per_level[cores]]
        med = statistics.median(secs)
        summary["levels"][str(cores)] = {
            "runs_sec": secs,
            "median_sec": med,
            "events_per_sec": round(args.events / med, 1),
        }
    if len(levels) == 2:
        lo, hi = sorted(levels)
        tput_lo = summary["levels"][str(lo)]["events_per_sec"]
        tput_hi = summary["levels"][str(hi)]["events_per_sec"]
        summary["scaling_efficiency"] = round(
            tput_hi / ((hi / lo) * tput_lo), 3
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
