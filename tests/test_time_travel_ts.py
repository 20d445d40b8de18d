"""Timestamp time travel (`scan(as_of=)` / `snapshot_as_of`) — Iceberg
`FOR TIMESTAMP AS OF` parity over the manifest `committed_at` clock."""

from __future__ import annotations

import time

import pytest

from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("asof")
    from pyspark.sql import functions as F

    full = change_log(spark, 3000)
    log1, log2 = str(base / "log1"), str(base / "log2")
    full.filter(F.col("offset") < 2000).write.parquet(log1)
    full.write.parquet(log2)  # second ingest resumes at the offset HWM
    table = LakeTable.create(str(base / "t"), n_buckets=4)
    ingest_changelog(spark, table, log1, batch_size=1000)
    mid_sid = table.current_snapshot_id()
    time.sleep(1.2)  # committed_at has 1 s granularity
    t_mid = time.time()
    time.sleep(1.2)
    ingest_changelog(spark, table, log2, batch_size=1000)
    assert table.current_snapshot_id() > mid_sid
    return {"table": table, "mid_sid": mid_sid, "t_mid": t_mid}


def test_as_of_between_batches_reads_the_earlier_state(spark, env):
    table, mid = env["table"], env["mid_sid"]
    assert table.snapshot_as_of(env["t_mid"]) == mid
    got = table.scan(spark, as_of=env["t_mid"])
    want = table.scan(spark, snapshot_id=mid)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() < table.scan(spark).count()


def test_as_of_now_is_current_and_iso_accepted(spark, env):
    table = env["table"]
    now = time.time() + 1
    assert table.snapshot_as_of(now) == table.current_snapshot_id()
    iso = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(now))
    assert table.snapshot_as_of(iso) == table.current_snapshot_id()


def test_as_of_parses_non_canonical_iso(spark, env):
    """Epoch comparison, not lexicographic: '+00:00' and fractional-second
    forms would sort AFTER the canonical '...Z' strings and silently pick
    an older snapshot."""
    table, mid = env["table"], env["mid_sid"]
    iso_offset = time.strftime("%Y-%m-%dT%H:%M:%S+00:00",
                               time.gmtime(env["t_mid"]))
    assert table.snapshot_as_of(iso_offset) == mid
    frac = time.strftime("%Y-%m-%dT%H:%M:%S.500Z", time.gmtime(env["t_mid"]))
    assert table.snapshot_as_of(frac) == mid
    with pytest.raises(ValueError, match="unparseable"):
        table.snapshot_as_of("yesterday-ish")


def test_as_of_before_create_refuses(spark, env):
    with pytest.raises(ValueError, match="no snapshot committed"):
        env["table"].snapshot_as_of(0.0)


def test_as_of_excludes_other_selectors(spark, env):
    with pytest.raises(ValueError, match="exactly one"):
        env["table"].scan(spark, snapshot_id=1, as_of=time.time())
