"""North-rule launch mode: the engine runs via spark-submit --py-files with
the package imported from the zip (BASELINE.json north_rule), and a second
invocation is an idempotent no-op."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spark_submit = shutil.which("spark-submit") or os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


@pytest.mark.skipif(
    not os.path.exists(spark_submit), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_ingest(tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py"), zip_path],
        check=True,
        capture_output=True,
    )

    def run():
        # cwd OUTSIDE the repo → the package can only come from --py-files
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        out = subprocess.run(
            [
                spark_submit,
                "--master", "local[4]",
                "--py-files", zip_path,
                os.path.join(REPO, "scripts", "ingest.py"),
                "--changelog", str(tmp_path / "log"),
                "--table", str(tmp_path / "table"),
                "--create",
                "--n-buckets", "4",
                "--generate-events", "3000",
                "--batch-size", "1000",
                "--shuffle-partitions", "8",
            ],
            cwd=str(tmp_path),
            env=env,
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    first = run()
    assert first["batches_applied"] == 3
    assert first["events_read"] == 3000
    assert first["last_committed_offset"] == 2999

    second = run()  # same log regenerated deterministically → pure replay
    assert second["batches_applied"] == 0
    assert second["snapshot_id"] == first["snapshot_id"]


def test_cli_expect_and_matview(tmp_path):
    """CLI composition of the round-5 third wave: CHECK constraints
    (--expect/--quarantine-dir) and a materialized view (--matview/
    --matview-agg) maintained from the same constrained ingest."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "ingest.py"),
            "--changelog", str(tmp_path / "log"),
            "--table", str(tmp_path / "table"),
            "--create", "--n-buckets", "4",
            "--generate-events", "2000",
            "--batch-size", "1000",
            "--master", "local[4]",
            "--shuffle-partitions", "8",
            "--expect", "no_lucky_paths=path NOT LIKE '%7.py'",
            "--quarantine-dir", str(tmp_path / "q"),
            "--matview", str(tmp_path / "mv"),
            "--matview-agg", "n_paths=count(*)",
            "--matview-agg", "total_chars=sum(length(content))",
            "--scd2", str(tmp_path / "hist"),
            "--fast-count",
            "--audit",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["quarantined"] > 0
    assert summary["events_read"] + summary["quarantined"] == 2000
    # --fast-count reports the exact live row count in the summary
    assert summary["fast_count"] > 0
    # --audit covers the derived sinks configured this run, not just main
    assert summary["audit"]["ok"]
    assert set(summary["audit"]["derived"]) == {
        "materialized view", "scd2 history",
    }
    assert all(d["ok"] for d in summary["audit"]["derived"].values())
    # the view and the SCD2 history landed beside the table
    assert os.path.exists(os.path.join(str(tmp_path / "mv"), "manifests"))
    assert os.path.exists(os.path.join(str(tmp_path / "hist"), "manifests"))


def test_cli_stream_mode_named_source(tmp_path):
    """--source now reaches the stream bridge as its offset channel: two
    sequential stream-mode invocations with different sources into one
    table both land (namespaced fencing ids), and combining --source with
    a derived sink stays refused."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO

    def run(extra, check=True):
        out = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "scripts", "ingest.py"),
                "--table", str(tmp_path / "table"),
                "--n-buckets", "4",
                "--batch-size", "1000",
                "--master", "local[4]",
                "--shuffle-partitions", "8",
                "--mode", "stream",
            ] + extra,
            cwd=str(tmp_path),
            env=env,
            capture_output=True,
            text=True,
            timeout=300,
        )
        if check:
            assert out.returncode == 0, out.stderr[-3000:]
        return out

    run(["--changelog", str(tmp_path / "log_a"), "--create",
         "--generate-events", "1500", "--source", "A",
         "--checkpoint", str(tmp_path / "ck_a")])
    run(["--changelog", str(tmp_path / "log_b"),
         "--generate-events", "1500", "--source", "B",
         "--checkpoint", str(tmp_path / "ck_b")])

    import sys as _sys
    _sys.path.insert(0, REPO)
    from glad_tiles_pipeline_spark.plans.lake import LakeTable

    table = LakeTable(str(tmp_path / "table"))
    assert table.last_committed_offset("A") == 1499
    assert table.last_committed_offset("B") == 1499
    assert table.batch_committed("src-A-s0-1499") is not None
    assert table.batch_committed("src-B-s0-1499") is not None

    out = run(["--changelog", str(tmp_path / "log_a"), "--source", "A",
               "--signature-index", str(tmp_path / "sig"),
               "--checkpoint", str(tmp_path / "ck_a")], check=False)
    assert out.returncode != 0
    assert "--source cannot be combined with derived sinks" in (
        out.stderr + out.stdout
    )
