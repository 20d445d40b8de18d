"""ManifestIO seam: the manifest log must do ALL its metadata IO through the
injected backend (so an object-store impl can replace the local one), and
incremental() must reject malformed windows up front."""

from __future__ import annotations

import pytest

from glad_tiles_pipeline_spark.plans.lake import LakeTable, LocalManifestIO
from glad_tiles_pipeline_spark.sources.generator import change_log
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog


class CountingIO(LocalManifestIO):
    """Delegates to the local backend, recording every call by method."""

    def __init__(self):
        self.calls: dict[str, int] = {}

    def _rec(self, name):
        self.calls[name] = self.calls.get(name, 0) + 1

    def read_text(self, path):
        self._rec("read_text")
        return super().read_text(path)

    def put_if_absent(self, path, data):
        self._rec("put_if_absent")
        return super().put_if_absent(path, data)

    def put_atomic(self, path, data):
        self._rec("put_atomic")
        return super().put_atomic(path, data)

    def delete(self, path):
        self._rec("delete")
        return super().delete(path)

    def list_names(self, path):
        self._rec("list_names")
        return super().list_names(path)


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    work = tmp_path_factory.mktemp("io_seam")
    log = str(work / "log")
    change_log(spark, 4000).write.parquet(log)
    io = CountingIO()
    table = LakeTable.create(str(work / "table"), n_buckets=4, io=io)
    ingest_changelog(spark, table, log, batch_size=1500, merge_mode="mor")
    return table, io

def test_all_metadata_io_goes_through_seam(spark, ingested):
    table, io = ingested
    # every manifest publish and batch marker is a CAS through the seam
    assert io.calls.get("put_if_absent", 0) >= 4  # v0..v3 + markers
    assert io.calls.get("read_text", 0) > 0
    assert io.calls.get("put_atomic", 0) >= 1  # indexed_through advances
    # and reads on a seam-injected handle still work end-to-end
    assert table.scan(spark).count() > 0


def test_vacuum_deletes_through_seam(spark, ingested):
    table, io = ingested
    from glad_tiles_pipeline_spark.operators.merge import compact

    compact(spark, table)
    before = io.calls.get("delete", 0)
    res = table.vacuum(keep_last=1, orphan_grace_seconds=0.0)
    assert res["removed_files"] > 0
    assert io.calls.get("delete", 0) - before == res["removed_files"]


def test_in_memory_backend_runs_full_lifecycle(spark, tmp_path):
    """The seam-completeness proof: with ALL metadata in a dict (the
    catalog half of an S3 deployment), ingest → scan → rollback →
    re-ingest → vacuum work end-to-end and NO metadata file ever touches
    disk.  Any direct os.* metadata access in LakeTable would either
    crash (manifest missing on disk) or fail the no-files assertion."""
    import os

    from glad_tiles_pipeline_spark.plans.lake import InMemoryManifestIO
    from glad_tiles_pipeline_spark.plans.oracle import oracle_state_df
    from glad_tiles_pipeline_spark.operators.merge import compact

    work = tmp_path / "mem"
    log = str(work / "log")
    change_log(spark, 4000).write.parquet(log)
    root = str(work / "table")
    io = InMemoryManifestIO(root)
    table = LakeTable.create(root, n_buckets=4, io=io)
    ingest_changelog(spark, table, log, batch_size=1500, merge_mode="mor")

    assert not os.path.exists(os.path.join(root, "manifests")), (
        "metadata leaked to disk — some LakeTable path bypassed ManifestIO"
    )
    got = table.scan(spark)
    want = oracle_state_df(spark, spark.read.parquet(log))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # rollback + healing re-ingest through the same in-memory catalog
    table.rollback(1)
    res = ingest_changelog(spark, table, log, batch_size=1500, merge_mode="mor")
    assert len([r for r in res if not r.get("skipped")]) == 2
    got = table.scan(spark)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # compaction + vacuum: data-file ops delegate to the filesystem
    compact(spark, table)
    removed = table.vacuum(keep_last=1, orphan_grace_seconds=0.0)
    assert removed["removed_files"] > 0
    assert table.files(spark).count() > 0
    assert not os.path.exists(os.path.join(root, "vacuum.json"))


def test_incremental_rejects_malformed_windows(spark, ingested):
    table, _ = ingested
    cur = table.current_snapshot_id()
    with pytest.raises(ValueError, match="invalid incremental window"):
        table.incremental(spark, from_snapshot=3, to_snapshot=1)
    with pytest.raises(ValueError, match="invalid incremental window"):
        table.incremental(spark, from_snapshot=cur + 5)
    with pytest.raises(ValueError, match="invalid incremental window"):
        table.incremental(spark, from_snapshot=0, to_snapshot=cur + 1)
    with pytest.raises(ValueError, match="invalid incremental window"):
        table.incremental(spark, from_snapshot=-1, to_snapshot=cur)


def test_inmemory_cas_rejects_same_object_retry(tmp_path):
    """put_if_absent must be a membership CAS, not an identity test: a retry
    handing back the SAME string object (a real failure mode — callers keep
    the serialized manifest and retry on timeout) must lose, or two commits
    could both believe they published the same snapshot."""
    from glad_tiles_pipeline_spark.plans.lake import InMemoryManifestIO

    io = InMemoryManifestIO(str(tmp_path))
    path = str(tmp_path / "manifests" / "v1.json")
    data = "payload"
    assert io.put_if_absent(path, data) is True
    assert io.put_if_absent(path, data) is False        # same object
    assert io.put_if_absent(path, "pay" + "load") is False  # equal string
    assert io.read_text(path) == "payload"
