"""batch_committed must stay O(1) per lookup over long ingest runs — round 1
walked every manifest per call (O(snapshots²) driver JSON reads over a run).
The index is derivable state: markers re-created from manifests on demand,
so losing the eager marker write (crash between publish and index) or the
whole index directory costs one suffix walk, never correctness."""

from __future__ import annotations

import os
import shutil

import pytest

from glad_tiles_pipeline_spark.plans.lake import LakeTable


@pytest.fixture()
def table(tmp_path):
    t = LakeTable.create(str(tmp_path / "lake"), n_buckets=4)
    for i in range(30):
        t.commit(
            batch_id=f"b{i}",
            expected_parent=t.current_snapshot_id(),
            replaced_buckets=set(),
            new_files=[],
            offsets={"lo": i, "hi": i},
            lineage={},
            metrics={},
        )
    return t


def _count_manifest_reads(table, fn):
    reads = 0
    orig = table.manifest

    def counting(snapshot_id=None):
        nonlocal reads
        reads += 1
        return orig(snapshot_id)

    table.manifest = counting
    try:
        fn()
    finally:
        table.manifest = orig
    return reads


def test_lookup_hits_are_constant_time(table):
    assert table.batch_committed("b7") == 8  # snapshot 0 is __create__
    # warm index: a hit must read ZERO manifests, a miss at most the
    # yet-unindexed suffix (empty here)
    reads = _count_manifest_reads(table, lambda: table.batch_committed("b3"))
    assert reads == 0, f"marker hit read {reads} manifests"
    reads = _count_manifest_reads(table, lambda: table.batch_committed("nope"))
    assert reads == 0, f"warm miss read {reads} manifests"


def test_index_is_derivable_after_loss(table):
    table.batch_committed("b0")  # build index
    shutil.rmtree(os.path.join(table.root, "manifests", "batch-index"))
    os.unlink(os.path.join(table.root, "manifests", "indexed_through.json"))
    assert table.batch_committed("b12") == 13
    assert table.batch_committed("missing") is None


def test_crash_between_publish_and_marker_is_repaired(table, monkeypatch):
    """A commit that dies after _publish but before its marker write must
    still be detected as committed (the suffix walk re-derives markers)."""
    monkeypatch.setattr(table, "_write_batch_marker", lambda *a, **k: None)
    monkeypatch.setattr(table, "_advance_indexed_through", lambda *a, **k: None)
    table.commit(
        batch_id="crashy",
        expected_parent=table.current_snapshot_id(),
        replaced_buckets=set(),
        new_files=[],
        offsets={"lo": 0, "hi": 0},
        lineage={},
        metrics={},
    )
    monkeypatch.undo()
    assert not os.path.exists(table._batch_marker_path("crashy"))
    sid = table.batch_committed("crashy")
    assert sid == table.current_snapshot_id()
    # replay of the crashed batch is a no-op (idempotence preserved)
    again = table.commit(
        batch_id="crashy",
        expected_parent=table.current_snapshot_id(),
        replaced_buckets=set(),
        new_files=[],
        offsets={"lo": 0, "hi": 0},
        lineage={},
        metrics={},
    )
    assert again == sid


def test_flat_read_cost_over_long_run(tmp_path):
    """Total manifest reads over N commits must grow linearly (amortized
    O(1) per commit), not quadratically."""
    t = LakeTable.create(str(tmp_path / "lake2"), n_buckets=4)
    total = 0
    orig = t.manifest

    def counting(snapshot_id=None):
        nonlocal total
        total += 1
        return orig(snapshot_id)

    t.manifest = counting
    n = 60
    for i in range(n):
        # the commit protocol's own idempotence probe runs inside commit()
        t.commit(
            batch_id=f"r{i}",
            expected_parent=t.current_snapshot_id(),
            replaced_buckets=set(),
            new_files=[],
            offsets={"lo": i, "hi": i},
            lineage={},
            metrics={},
        )
    t.manifest = orig
    # round-1 behavior was Θ(n²/2) ≈ 1800 reads here; allow a generous
    # linear budget (suffix walk + parent manifest reads per commit)
    assert total <= 6 * n, f"manifest reads {total} not linear in commits"
