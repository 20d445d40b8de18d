"""Property tests for changelog retention (sources/changelog.py) — the
marker invariant that the read guards depend on.

The guard's soundness rests on ONE claim: after any sequence of prunes,
every offset STRICTLY ABOVE the marker is still fully present in the
surviving files.  These tests drive `prune_changelog` over randomized
file layouts (overlapping ranges, unordered writes, repeated prunes with
arbitrary horizons) and check that claim directly — pyarrow-only, no
SparkSession, so hypothesis can afford many examples.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glad_tiles_pipeline_spark.sources.changelog import (
    PRUNE_MARKER,
    prune_changelog,
    prune_horizon,
)


class _Consumer:
    """Stub consumer: just a resume point (what prune actually reads)."""

    def __init__(self, hi: int):
        self._hi = hi

    def last_committed_offset(self, source=None):
        return self._hi


def _write_log(d: str, files: "list[list[int]]") -> None:
    os.makedirs(d)
    for i, offsets in enumerate(files):
        pq.write_table(
            pa.table({"offset": pa.array(offsets, type=pa.int64())}),
            os.path.join(d, f"part-{i:04d}.parquet"),
        )


def _surviving_offsets(d: str) -> set:
    out = set()
    for name in os.listdir(d):
        if name.endswith(".parquet"):
            out.update(
                pq.read_table(os.path.join(d, name))
                .column("offset").to_pylist()
            )
    return out


# a log: global offsets 0..n-1 partitioned into files ARBITRARILY (the
# contract promises unique offsets, not that files hold contiguous or
# disjoint ranges)
@st.composite
def _layouts(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    n_files = draw(st.integers(min_value=1, max_value=6))
    assignment = draw(
        st.lists(st.integers(min_value=0, max_value=n_files - 1),
                 min_size=n, max_size=n)
    )
    files = [[] for _ in range(n_files)]
    for off, f in enumerate(assignment):
        files[f].append(off)
    return n, [f for f in files if f]


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(layout=_layouts(), horizons=st.lists(
    st.integers(min_value=-1, max_value=120), min_size=1, max_size=4))
def test_offsets_above_marker_always_survive(tmp_path_factory, layout,
                                             horizons):
    n, files = layout
    d = str(tmp_path_factory.mktemp("proplog") / "log")
    _write_log(d, files)

    prev_marker = -1
    for h in horizons:
        prune_changelog(d, consumers=[_Consumer(h)])
        marker = prune_horizon(d)
        # monotone, never beyond the consumer's resume point, and never
        # claims more than the log ever held
        assert marker >= prev_marker
        assert marker <= max(h, prev_marker)
        assert marker < n
        prev_marker = marker
        # THE invariant: everything strictly above the marker survives
        survivors = _surviving_offsets(d)
        assert {o for o in range(n) if o > marker} <= survivors
        # the newest file always survives (end-of-stream marker)
        assert (n - 1) in survivors


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(layout=_layouts())
def test_prune_to_tail_keeps_exactly_the_newest_file(tmp_path_factory,
                                                     layout):
    n, files = layout
    d = str(tmp_path_factory.mktemp("proplog") / "log")
    _write_log(d, files)
    res = prune_changelog(d, below_offset=n - 1)
    remaining = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(remaining) == 1
    assert res["pruned_files"] == len(files) - 1
    # and a repeat prune is a no-op that can't move the marker
    m = prune_horizon(d)
    res2 = prune_changelog(d, below_offset=n - 1)
    assert res2["pruned_files"] == 0
    assert prune_horizon(d) == m


def test_statless_files_are_never_deleted(tmp_path):
    """A file whose footer can't prove its range is kept and counted —
    never guessed about."""
    d = str(tmp_path / "log")
    _write_log(d, [[0, 1, 2], [3, 4, 5]])
    # a parquet file with no offset column at all (worst case)
    pq.write_table(pa.table({"other": [1, 2]}),
                   os.path.join(d, "part-weird.parquet"))
    res = prune_changelog(d, below_offset=10)
    assert res["kept_statless"] == 1
    assert os.path.exists(os.path.join(d, "part-weird.parquet"))


def test_marker_file_shape(tmp_path):
    d = str(tmp_path / "log")
    _write_log(d, [[0, 1], [2, 3]])
    prune_changelog(d, below_offset=3)
    payload = json.loads(open(os.path.join(d, PRUNE_MARKER)).read())
    assert set(payload) == {"below_offset"}
    # underscore prefix: invisible to parquet directory readers
    assert PRUNE_MARKER.startswith("_")
