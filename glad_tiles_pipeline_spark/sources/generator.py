"""S6 — deterministic synthetic change-event log (SURVEY.md §2.1 S6, FIXTURES.md §2.1).

The log is generated with PURE SPARK COLUMN EXPRESSIONS over ``spark.range``:
no Python RNG, no UDFs.  Consequences that matter at 10^10-event scale
(BASELINE.json metric):

  * Any executor count / partitioning yields bit-identical data — the
    generator IS the dataset, there is nothing to ship or shuffle.
  * Generation parallelizes linearly: ``spark.range(n, numPartitions=p)``
    plans one narrow stage, whole-stage-codegen end to end.
  * The same expressions run unchanged at 10^4 (unit tests) and 10^10
    (north-scale) — only ``n_events`` changes.

Event semantics (FIXTURES.md §2.1):
  - key = (repo, path); repo is Zipf-skewed (hot monorepos, BASELINE.json
    north_star "salted repartition plus AQE skew-join hints for hot
    monorepos"); path uniform within repo.
  - op mix I/U/D = 60/30/10.
  - commit_seq == offset for ~90% of events; ~10% are LATE events carrying a
    commit_seq lower than their offset (out-of-order arrival) — exercises
    commit-ordered LWW (winner = max (commit_seq, offset) per key).
  - content is a deterministic function of (repo, path, commit_seq); NULL on
    deletes.  lang arrives denormalized ('Python', ' py ', 'PY', …) to
    exercise the vectorized normalizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Denormalized language spellings, grouped by canonical lang. Generator picks
# one spelling deterministically per event; the normalizer must map every
# spelling in a group to the group's canonical form.
LANG_VARIANTS: list[tuple[str, str]] = [
    ("python", "Python"),
    ("python", "python"),
    ("python", " py "),
    ("python", "PY"),
    ("python", "Python3"),
    ("java", "Java"),
    ("java", "JAVA"),
    ("java", " java"),
    ("go", "Go"),
    ("go", "GO"),
    ("go", "golang"),
    ("rust", "Rust"),
    ("rust", "RUST"),
    ("rust", "rs"),
    ("javascript", "JavaScript"),
    ("javascript", "js"),
    ("javascript", "JS "),
    ("cpp", "C++"),
    ("cpp", "cpp"),
    ("cpp", "CPP"),
]

EPOCH_2024 = 1_704_067_200  # 2024-01-01T00:00:00Z


def _h(seed: int, tag: str, *cols) -> F.Column:
    """Deterministic 64-bit hash stream, one independent stream per tag."""
    return F.xxhash64(F.lit(seed), F.lit(tag), *cols)


def change_log(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 1000,
    seed: int = 42,
    zipf_s: float = 3.0,
    late_denom: int = 10,
    late_max_lag: int = 5000,
    partitions: int | None = None,
    content_repeat: int = 1,
) -> DataFrame:
    """Deterministic change log of ``n_events`` rows, schema FIXTURES.md §2.1.

    ``zipf_s`` controls repo skew: repo_idx = floor(n_repos * u^zipf_s) for
    u ~ U[0,1), so with s=3, R=100 the hottest repo receives ~21% of all
    events — a realistic hot monorepo.
    ``late_denom``: 1/late_denom of events are late (commit_seq < offset).
    ``content_repeat``: body lines per file (~64 B each) — 16 gives ~1 KB
    source files, the realistic weight for ingest benchmarks; 1 keeps unit
    tests fast.  Deterministic either way (pure column expressions).
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    df = spark.range(0, n_events, 1, partitions).withColumnRenamed("id", "offset")

    u = (F.pmod(_h(seed, "repo", F.col("offset")), F.lit(1_000_000)).cast("double")
         / F.lit(1_000_000.0))
    repo_idx = F.floor(F.lit(float(n_repos)) * F.pow(u, F.lit(zipf_s))).cast("int")
    path_idx = F.pmod(_h(seed, "path", F.col("offset")), F.lit(paths_per_repo)).cast("int")

    op_r = F.pmod(_h(seed, "op", F.col("offset")), F.lit(10))
    op = F.when(op_r < 6, F.lit("I")).when(op_r < 9, F.lit("U")).otherwise(F.lit("D"))

    is_late = F.pmod(_h(seed, "late", F.col("offset")), F.lit(late_denom)) == 0
    lag = F.pmod(_h(seed, "lag", F.col("offset")), F.lit(late_max_lag)) + 1
    commit_seq = F.when(
        is_late, F.greatest(F.col("offset") - lag, F.lit(0))
    ).otherwise(F.col("offset"))

    lang_arr = F.array(*[F.lit(v) for _, v in LANG_VARIANTS])
    lang = F.element_at(
        lang_arr, (F.pmod(_h(seed, "lang", F.col("offset")), F.lit(len(LANG_VARIANTS))) + 1).cast("int")
    )

    df = (
        df.withColumn("commit_seq", commit_seq)
        .withColumn("commit", F.format_string("c%012d", F.col("commit_seq")))
        .withColumn("op", op)
        .withColumn("repo", F.format_string("repo-%03d", repo_idx))
        .withColumn(
            "path",
            F.format_string("src/dir%02d/file%04d.py", path_idx % 20, path_idx),
        )
        .withColumn("lang", lang)
        .withColumn(
            "content",
            F.when(
                F.col("op") == "D", F.lit(None).cast("string")
            ).otherwise(
                F.concat(
                    F.format_string(
                        'def handler_%d():\n    return "%s/%s@c%012d"\n',
                        path_idx,
                        F.col("repo"),
                        F.col("path"),
                        F.col("commit_seq"),
                    ),
                    F.repeat(
                        F.format_string(
                            "    # body %s/%s line padded to ~64 bytes xx\n",
                            F.col("repo"),
                            F.col("path"),
                        ),
                        content_repeat - 1,
                    ),
                )
            ),
        )
        .withColumn("ts", F.timestamp_seconds(F.lit(EPOCH_2024) + F.col("offset")))
        .withColumn("schema_ver", F.lit(1))
        .withColumn("control", F.lit(None).cast("string"))
    )
    return df.select(
        "offset", "commit_seq", "commit", "op", "repo", "path",
        "lang", "content", "ts", "schema_ver", "control",
    )


def inject_controls(log: DataFrame, controls: dict[int, str]) -> DataFrame:
    """Embed schema-evolution control events into a change log at the given
    offsets (BASELINE.json north_star: "schema evolution ... applied via
    schema updates before each MERGE batch" — the ops ride the SAME stream
    as data events).

    ``controls`` maps offset → JSON op payload (lake.evolve ops, e.g.
    ``{"op": "add_column", "name": "size_bytes", "type": "bigint"}``).
    The event at that offset becomes a pure control row (its data payload
    is nulled; the merge path routes on ``control IS NOT NULL``).
    """
    pairs: list[F.Column] = []
    for off, payload in controls.items():
        pairs += [F.lit(int(off)), F.lit(payload)]
    cmap = F.create_map(*pairs)
    is_ctrl = cmap[F.col("offset")].isNotNull()
    out = log.withColumn("control", cmap[F.col("offset")])
    for c in ("op", "repo", "path", "lang", "content", "commit"):
        out = out.withColumn(
            c, F.when(is_ctrl, F.lit(None).cast("string")).otherwise(F.col(c))
        )
    return out
