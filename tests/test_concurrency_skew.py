"""Hot-monorepo skew e2e and two-process commit races (SURVEY.md §4.2, §5.6)."""

from __future__ import annotations

import json
import subprocess
import sys

from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log


def _assert_equals_oracle(spark, table, events):
    got = table.scan(spark)
    want = oracle_state_df(spark, events)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_hot_monorepo_skew_e2e(spark, tmp_path):
    """One repo receives the overwhelming majority of events (zipf_s=8 over
    5 repos); both merge modes still match the oracle — the argmax dedup
    and the path-keyed sub-splits keep the hot key from serializing."""
    d = str(tmp_path / "log")
    ev = change_log(spark, 8000, n_repos=5, paths_per_repo=50, zipf_s=8.0)
    ev.write.parquet(d)
    from pyspark.sql import functions as F

    top_share = (
        ev.groupBy("repo").count().orderBy(F.desc("count")).first()["count"] / 8000
    )
    assert top_share > 0.5  # genuinely skewed input

    for mode in ("cow", "mor"):
        table = LakeTable.create(str(tmp_path / f"t_{mode}"), n_buckets=8)
        ingest_changelog(spark, table, d, batch_size=2000, merge_mode=mode)
        _assert_equals_oracle(spark, table, ev)


RACE_WORKER = r"""
import sys
sys.path.insert(0, "/root/repo")
from glad_tiles_pipeline_spark.session import get_spark
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
log, tdir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
spark = get_spark(app_name=f"race-{tag}", master="local[2]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
res = ingest_changelog(spark, LakeTable(tdir), log, batch_size=1000)
print("APPLIED", len([r for r in res if not r.get("skipped")]))
"""


def test_two_process_commit_race(spark, tmp_path):
    """Two independent writer processes tail the same log into the same
    table concurrently.  Snapshot-ID fencing guarantees each batch commits
    exactly once (losers re-plan); the final state equals the oracle."""
    d = str(tmp_path / "log")
    change_log(spark, 4000).write.parquet(d)
    tdir = str(tmp_path / "t")
    LakeTable.create(tdir, n_buckets=4)

    script = str(tmp_path / "race_worker.py")
    with open(script, "w") as f:
        f.write(RACE_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, script, d, tdir, str(i)],
            cwd="/root/repo",
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    table = LakeTable(tdir)
    # every offset window committed exactly once across both writers
    seen = {}
    for sid in range(1, table.current_snapshot_id() + 1):
        m = table.manifest(sid)
        assert m["batch_id"] not in seen, f"duplicate commit {m['batch_id']}"
        seen[m["batch_id"]] = sid
    assert table.last_committed_offset() == 3999
    _assert_equals_oracle(spark, table, spark.read.parquet(d))
    json.dumps(outs)  # keep outs referenced for debugging on failure
