"""S17 — the change feed as a first-class Spark data source (Python
DataSource API, Spark 4): ``spark.read.format("cdc_gen")`` /
``spark.readStream.format("cdc_gen")`` produce the deterministic CDC event
stream directly — no files on disk — with the same schema as the S6
generator (FIXTURES.md §2.1).

Why this exists next to S6: ``change_log`` (pure JVM column expressions) is
the 10^10-row bench path and stays so.  This source covers the surfaces S6
cannot:

  * a STREAMING generator — an offset-tracked micro-batch feed for driving
    the T6 ingest loop live without pre-writing files (the batch and stream
    readers emit byte-identical rows for the same offsets, so replay after
    a crash regenerates exactly what was lost);
  * the integration seam a real deployment plugs a queue/CDC connector
    into: the reader contract here (plan offset ranges → vectorized Arrow
    batches per partition) is exactly what a Kafka/binlog Python source
    implements.

Determinism: every field of event ``i`` is a pure function of
``(seed, i)`` via splitmix64 — vectorized in numpy, identical across
partitioning choices, executors, and replays.  The event *semantics* match
S6 (Zipf-hot repos, 60/30/10 I/U/D mix, ~10% late events, denormalized
lang spellings, content NULL on deletes); the hash stream differs
(splitmix64 here vs xxhash64 columns there), so the two generators yield
different — equally valid — logs.  The replay oracle is generator-
agnostic, so correctness checks work unchanged.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

CHANGELOG_SCHEMA = (
    "offset long, commit_seq long, commit string, op string, repo string, "
    "path string, lang string, content string, ts timestamp, "
    "schema_ver int, control string"
)

_EPOCH_2024 = 1_704_067_200

_LANGS = [
    "Python", "python", " py ", "PY", "Python3",
    "Java", "JAVA", " java",
    "Go", "GO", "golang",
    "Rust", "RUST", "rs",
    "JavaScript", "js", "JS ",
    "C++", "cpp", "CPP",
]


def _mix(seed: int, tag: str, offsets):
    """splitmix64 over (seed ^ tag-hash) + offset — one independent
    deterministic uint64 stream per tag, vectorized."""
    import numpy as np

    tag_h = int.from_bytes(tag.encode().ljust(8, b"\0")[:8], "little")
    base = (seed * 0x9E3779B97F4A7C15 ^ tag_h) & 0xFFFFFFFFFFFFFFFF
    z = (np.uint64(base)
         + offsets.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _gen_rows(offsets, seed: int, n_repos: int, paths_per_repo: int):
    """Vectorized event generation for an offset array → dict of columns
    (numpy / python lists).  Mirrors S6's event semantics."""
    import numpy as np

    off = offsets.astype(np.int64)
    u = (_mix(seed, "repo", off) % np.uint64(1_000_000)).astype(np.float64) / 1e6
    repo_idx = np.floor(n_repos * u ** 3.0).astype(np.int64)
    path_idx = (_mix(seed, "path", off) % np.uint64(paths_per_repo)).astype(np.int64)
    op_r = (_mix(seed, "op", off) % np.uint64(10)).astype(np.int64)
    op = np.where(op_r < 6, "I", np.where(op_r < 9, "U", "D"))
    late = (_mix(seed, "late", off) % np.uint64(10)) == 0
    lag = (_mix(seed, "lag", off) % np.uint64(5000)).astype(np.int64) + 1
    commit_seq = np.where(late, np.maximum(off - lag, 0), off)
    lang_i = (_mix(seed, "lang", off) % np.uint64(len(_LANGS))).astype(np.int64)

    repo = [f"repo-{r:03d}" for r in repo_idx]
    path = [f"src/dir{p % 20:02d}/file{p:04d}.py" for p in path_idx]
    content = [
        None if o == "D"
        else f'def handler_{p}():\n    return "{r}/{pa}@c{c:012d}"\n'
        for o, p, r, pa, c in zip(op, path_idx, repo, path, commit_seq)
    ]
    return {
        "offset": off,
        "commit_seq": commit_seq,
        "commit": [f"c{c:012d}" for c in commit_seq],
        "op": op.tolist(),
        "repo": repo,
        "path": path,
        "lang": [_LANGS[i] for i in lang_i],
        "content": content,
        "ts_us": (off + _EPOCH_2024) * 1_000_000,
    }


def _arrow_batch(offsets, seed: int, n_repos: int, paths_per_repo: int):
    import pyarrow as pa

    c = _gen_rows(offsets, seed, n_repos, paths_per_repo)
    n = len(c["offset"])
    return pa.record_batch(
        [
            pa.array(c["offset"], pa.int64()),
            pa.array(c["commit_seq"], pa.int64()),
            pa.array(c["commit"], pa.string()),
            pa.array(c["op"], pa.string()),
            pa.array(c["repo"], pa.string()),
            pa.array(c["path"], pa.string()),
            pa.array(c["lang"], pa.string()),
            pa.array(c["content"], pa.string()),
            pa.array(c["ts_us"], pa.timestamp("us", tz="UTC")),
            pa.array([1] * n, pa.int32()),
            pa.array([None] * n, pa.string()),
        ],
        names=[
            "offset", "commit_seq", "commit", "op", "repo", "path",
            "lang", "content", "ts", "schema_ver", "control",
        ],
    )


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class CdcGenBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_events = int(options.get("n_events", 10_000))
        self.seed = int(options.get("seed", 42))
        self.n_repos = int(options.get("n_repos", 100))
        self.paths_per_repo = int(options.get("paths_per_repo", 1000))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self):
        if self.n_events <= 0:  # empty source, parity with the stream twin
            return [_Range(0, 0)]
        step = -(-self.n_events // self.num_partitions)  # ceil
        return [
            _Range(lo, min(lo + step, self.n_events))
            for lo in range(0, self.n_events, step)
        ]

    def read(self, partition: _Range):
        import numpy as np

        # vectorized: one Arrow batch per ~64k offsets, zero per-row Python
        for lo in range(partition.lo, partition.hi, 65536):
            hi = min(lo + 65536, partition.hi)
            yield _arrow_batch(
                np.arange(lo, hi), self.seed, self.n_repos, self.paths_per_repo
            )


class CdcGenStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batch feed: each ``read`` advances by at most
    ``rows_per_batch`` events until ``n_events`` is exhausted, then idles.
    Replay (``readBetweenOffsets``) regenerates deterministically — the
    exactly-once story needs no buffering."""

    def __init__(self, options):
        self.n_events = int(options.get("n_events", 10_000))
        self.seed = int(options.get("seed", 42))
        self.n_repos = int(options.get("n_repos", 100))
        self.paths_per_repo = int(options.get("paths_per_repo", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 2000))

    def initialOffset(self):
        return {"offset": 0}

    def _rows(self, lo: int, hi: int):
        # materialized list (the simple-reader harness pickles the rows for
        # its replay cache — a generator can't pickle); callers hand back
        # iter(list), which satisfies both the iterator protocol and pickle
        import datetime as dt

        import numpy as np

        c = _gen_rows(np.arange(lo, hi), self.seed, self.n_repos,
                      self.paths_per_repo)
        utc = dt.timezone.utc
        return [
            (
                int(c["offset"][i]), int(c["commit_seq"][i]), c["commit"][i],
                c["op"][i], c["repo"][i], c["path"][i], c["lang"][i],
                c["content"][i],
                dt.datetime.fromtimestamp(c["ts_us"][i] / 1e6, tz=utc),
                1, None,
            )
            for i in range(hi - lo)
        ]

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = min(lo + self.rows_per_batch, self.n_events)
        return iter(self._rows(lo, hi)), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["offset"]), int(end["offset"])))


class CdcGenDataSource(DataSource):
    """``spark.dataSource.register(CdcGenDataSource)`` then
    ``spark.read.format("cdc_gen").option("n_events", N).load()`` (batch)
    or ``spark.readStream.format("cdc_gen")...`` (stream)."""

    @classmethod
    def name(cls):
        return "cdc_gen"

    def schema(self):
        return CHANGELOG_SCHEMA

    def reader(self, schema):
        return CdcGenBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return CdcGenStreamReader(self.options)
