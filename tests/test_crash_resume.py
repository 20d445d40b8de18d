"""Literal kill -9 crash-safety test (SURVEY.md §5.4, BASELINE.json
"replay resumes exactly where it stopped").

A child ingest process is SIGKILLed at the worst possible moment — after a
batch's data files are fully written but BEFORE its manifest publish (the
commit protocol writes data first, so this is the widest crash window).  A
fresh process then resumes from the checkpoint manifest; the final table
state must equal the single-process replay oracle row-for-row under the
content-sha256 invariant, and the crashed attempt's data files must remain
unreferenced orphans until vacuum collects them.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import os, signal, sys

    workdir, crash_at = sys.argv[1], sys.argv[2]
    from glad_tiles_pipeline_spark.session import get_spark
    from glad_tiles_pipeline_spark.plans.lake import LakeTable
    from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
    from glad_tiles_pipeline_spark.sources.generator import change_log

    spark = get_spark("crash-child", master="local[2]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    log_dir = os.path.join(workdir, "changelog")
    if not os.path.exists(log_dir):
        change_log(spark, 4000).write.parquet(log_dir)
    root = os.path.join(workdir, "lake")
    if os.path.exists(os.path.join(root, "manifests")):
        table = LakeTable(root)
    else:
        table = LakeTable.create(root, n_buckets=8)

    if crash_at != "none":
        target = int(crash_at)
        orig_publish = table._publish
        def killing_publish(manifest):
            # data files for this batch are already on disk; die before the
            # snapshot becomes visible
            if manifest["batch_id"].startswith("b") and manifest[
                "snapshot_id"
            ] == target:
                os.kill(os.getpid(), signal.SIGKILL)
            return orig_publish(manifest)
        table._publish = killing_publish

    ingest_changelog(spark, table, log_dir, batch_size=1000, merge_mode="cow")
    print("INGEST_DONE", table.current_snapshot_id())
    """
)


def _run_child(workdir: str, crash_at: str) -> subprocess.CompletedProcess:
    script = os.path.join(workdir, "child.py")
    if not os.path.exists(script):
        with open(script, "w") as f:
            f.write(CHILD)
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, script, workdir, crash_at],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=420,
    )


def test_sigkill_mid_commit_then_resume(spark, tmp_path):
    workdir = str(tmp_path)

    # 1. crash at snapshot 3 (mid-run): the process dies with data files
    #    written and no manifest for that batch
    crashed = _run_child(workdir, "3")
    assert crashed.returncode == -signal.SIGKILL, crashed.stderr[-2000:]

    from glad_tiles_pipeline_spark.plans.lake import LakeTable

    table = LakeTable(os.path.join(workdir, "lake"))
    assert table.current_snapshot_id() == 2  # the target snapshot never published

    # the crashed attempt's files exist on disk but no manifest references them
    data_root = os.path.join(table.root, "data")
    on_disk = set()
    for dp, _dn, fns in os.walk(data_root):
        for fn in fns:
            if fn.endswith(".parquet"):
                on_disk.add(os.path.relpath(os.path.join(dp, fn), table.root))
    referenced = {
        f["path"]
        for sid in range(0, table.current_snapshot_id() + 1)
        for f in table.manifest(sid)["files"]
    }
    orphans = on_disk - referenced
    assert orphans, "expected orphan data files from the killed commit"

    # 2. resume in a FRESH process: picks up at last_committed_offset + 1
    resumed = _run_child(workdir, "none")
    assert resumed.returncode == 0, resumed.stderr[-2000:]
    assert "INGEST_DONE" in resumed.stdout

    # 3. final state == replay oracle (content-sha256 row equality)
    from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df

    events = spark.read.parquet(os.path.join(workdir, "changelog")).filter(
        F.col("control").isNull()
    )
    want = oracle_state_df(spark, events)
    got = table.scan(spark).select(*want.columns)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert table.last_committed_offset() == 3999

    # 4. vacuum collects the orphans once they age past the grace window
    referenced_now = {
        f["path"]
        for sid in range(0, table.current_snapshot_id() + 1)
        for f in table.manifest(sid)["files"]
    }
    res = table.vacuum(keep_last=10**6, orphan_grace_seconds=0.0)
    assert res["removed_files"] >= len(orphans - referenced_now)
    still = set()
    for dp, _dn, fns in os.walk(data_root):
        for fn in fns:
            if fn.endswith(".parquet"):
                still.add(os.path.relpath(os.path.join(dp, fn), table.root))
    assert still == referenced_now
