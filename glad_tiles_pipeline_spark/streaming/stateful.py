"""T5 — custom stateful streaming operator (SURVEY.md §2.9).

``repo_activity_state``: per-repo running ingest telemetry maintained as
managed streaming state with ``applyInPandasWithState`` — the PySpark
surface for operators whose state must outlive a micro-batch (running
totals, session carry-over, cross-batch watermarks).  Arrow-batched
grouped-map: the callback sees whole pandas frames per key, never per-row
Python dispatch (BASELINE.json input_hint).

Emitted per repo per micro-batch (update mode):
  total_events   events seen for the repo since stream start (running)
  batch_events   events in this micro-batch
  max_commit_seq highest commit order seen (running) — a consumer can
                 detect out-of-order regressions per repo
  batches_seen   micro-batches that touched the repo

State is one compact tuple per repo — bounded by repo cardinality, not
event volume; a production deployment adds a state TTL via
``GroupStateTimeout.ProcessingTimeTimeout`` for retired repos.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_events", T.LongType()),
        T.StructField("max_commit_seq", T.LongType()),
        T.StructField("batches_seen", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("batch_events", T.LongType()),
        T.StructField("max_commit_seq", T.LongType()),
        T.StructField("batches_seen", T.LongType()),
    ]
)


def _update_repo_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (repo,) = key
    batch_events = 0
    batch_max_seq = -1
    for pdf in pdfs:
        batch_events += len(pdf)
        if len(pdf):
            batch_max_seq = max(batch_max_seq, int(pdf["commit_seq"].max()))
    if state.exists:
        total, max_seq, batches = state.get
    else:
        total, max_seq, batches = 0, -1, 0
    total += batch_events
    max_seq = max(max_seq, batch_max_seq)
    batches += 1
    state.update((total, max_seq, batches))
    yield pd.DataFrame(
        [
            {
                "repo": repo,
                "total_events": total,
                "batch_events": batch_events,
                "max_commit_seq": max_seq,
                "batches_seen": batches,
            }
        ]
    )


def repo_activity_state(events: DataFrame) -> DataFrame:
    """Running per-repo activity over a streaming change log.  ``events``
    must be a streaming DataFrame with (repo, commit_seq)."""
    return (
        events.select("repo", "commit_seq")
        .groupBy("repo")
        .applyInPandasWithState(
            _update_repo_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 twin: transformWithStateInPandas.  Same telemetry, the successor
# API — typed state handles (ValueState/ListState/MapState), timers, TTL —
# instead of one opaque state tuple.  Requires the RocksDB state store
# provider (see repo_activity_state_tws).  Kept alongside the
# applyInPandasWithState form so both §2.9 T5 surfaces stay exercised.
# ---------------------------------------------------------------------------

def _make_repo_activity_processor():
    """Factory (deferred import: StatefulProcessor only exists on Spark 4)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RepoActivityProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "activity",
                "total_events long, max_commit_seq long, batches_seen long",
            )

        def handleInputRows(self, key, rows, timerValues):
            (repo,) = key
            batch_events = 0
            batch_max_seq = -1
            for pdf in rows:
                batch_events += len(pdf)
                if len(pdf):
                    batch_max_seq = max(
                        batch_max_seq, int(pdf["commit_seq"].max())
                    )
            if self._state.exists():
                total, max_seq, batches = self._state.get()
            else:
                total, max_seq, batches = 0, -1, 0
            total += batch_events
            max_seq = max(max_seq, batch_max_seq)
            batches += 1
            self._state.update((total, max_seq, batches))
            yield pd.DataFrame(
                [
                    {
                        "repo": repo,
                        "total_events": total,
                        "batch_events": batch_events,
                        "max_commit_seq": max_seq,
                        "batches_seen": batches,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return RepoActivityProcessor()


def repo_activity_state_tws(events: DataFrame) -> DataFrame:
    """T5 on the Spark 4 ``transformWithStateInPandas`` surface — same
    answer as ``repo_activity_state`` (tests assert equality batch by
    batch).  The stream's session must run the RocksDB state store:

        spark.sql.streaming.stateStore.providerClass =
          org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    """
    return (
        events.select("repo", "commit_seq")
        .groupBy("repo")
        .transformWithStateInPandas(
            statefulProcessor=_make_repo_activity_processor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# T5' applied to the training-data pipeline: CROSS-document sequence packing
# as a stateful stream.  The batch twin (operators/chunking.py::
# pack_chunks_global) packs each shard's chunk stream in one scan; here the
# same greedy scan is split across micro-batches, with (next bin, open-bin
# fill, rows packed so far) carried as managed state per shard — the state
# is three integers per key no matter how many chunks flow through, so
# cluster state is O(shards), never O(stream).
#
# Determinism contract (what the equality test pins down): chunks are packed
# in (doc_id, chunk_idx) order WITHIN each micro-batch, and across batches
# in arrival order — so a stream whose micro-batch boundaries respect the
# global (doc_id, chunk_idx) order (a backfill replaying sorted files, the
# common shape) reproduces the batch twin bit-for-bit.
# ---------------------------------------------------------------------------

PACK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_bin", T.LongType()),
        T.StructField("fill", T.LongType()),
    ]
)

PACK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("bin_idx", T.IntegerType()),
    ]
)


def _make_pack_updater(capacity: int):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from glad_tiles_pipeline_spark.operators.chunking import _greedy_bins

        (shard,) = key
        b, fill = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["doc_id", "chunk_idx"])
            bins, b, fill = _greedy_bins(
                pdf["n_tokens"].to_numpy(), capacity,
                start_bin=b, start_fill=fill,
            )
            out = pdf[["doc_id", "chunk_idx", "n_tokens"]].copy()
            out.insert(0, "shard", shard)
            out["bin_idx"] = bins
            yield out
        state.update((int(b), int(fill)))

    return _update


def pack_chunks_stream(
    chunks: DataFrame, capacity: int = 64, key_col: str = "shard"
) -> DataFrame:
    """Streaming cross-document packing: ``chunks`` is a streaming frame
    with (shard, doc_id, chunk_idx, n_tokens); bins continue across
    micro-batches per shard.  Append mode — each chunk's bin assignment is
    final the moment it is emitted (the greedy scan never revisits)."""
    return (
        chunks.select(key_col, "doc_id", "chunk_idx", "n_tokens")
        .groupBy(key_col)
        .applyInPandasWithState(
            _make_pack_updater(capacity),
            outputStructType=PACK_OUTPUT_SCHEMA,
            stateStructType=PACK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
