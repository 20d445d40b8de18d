"""File-level column-stats pruning (S22): writers record per-file
``_commit_seq``/``_offset`` min/max in the manifest (footer-only read, zero
data IO); offset/commit_seq-windowed scans drop non-intersecting files
without opening them on resolution-free snapshots, and stay row-exact on
every snapshot.

IO gate: ``df.inputFiles()`` — the scan is built from explicit manifest
paths, so the pruned plan physically references only matching files.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.operators.dedup import lww_dedup
from glad_tiles_pipeline_spark.operators.merge import apply_batch, compact
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log

KEY = ["repo", "path"]
WINDOW = (1000, 1999)  # exactly the second of four 1000-event batches


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stats")
    log = str(base / "log")
    events = change_log(spark, 4000)
    events.write.parquet(log)
    cow = LakeTable.create(str(base / "cow"), n_buckets=4)
    ingest_changelog(spark, cow, log, batch_size=1000, merge_mode="cow")
    mor = LakeTable.create(str(base / "mor"), n_buckets=4)
    ingest_changelog(spark, mor, log, batch_size=1000, merge_mode="mor")
    return {"cow": cow, "mor": mor, "events": events}


def _expected(spark, table, lo, hi):
    """Reference spelling: resolve the FULL snapshot, then window the
    winner's offset — what scan(offset_range=...) must always equal."""
    raw = table.scan(spark, include_system=True)
    resolved = lww_dedup(
        raw, key=KEY, strategy="argmax", order=["_commit_seq", "_offset"]
    )
    return (
        resolved.filter(F.col("_offset").between(lo, hi))
        .filter(~F.col("_deleted"))
        .select("repo", "path", "commit", "lang", "content", "content_sha")
    )


def test_writers_record_stats(spark, tables):
    for t in (tables["cow"], tables["mor"]):
        files = t.files(spark).collect()
        assert all(f["offset_lo"] is not None for f in files)
        assert all(f["commit_seq_hi"] is not None for f in files)
        assert all(f["offset_lo"] <= f["offset_hi"] for f in files)


def test_cow_window_scan_prunes_files_and_stays_exact(spark, tables):
    cow = tables["cow"]
    total = len(cow.manifest(None)["files"])
    got = cow.scan(spark, offset_range=WINDOW)
    read = {p.split("/")[-1] for p in got.inputFiles()}
    # IO gate: strictly fewer files than the snapshot holds, and every one
    # intersects the window per the manifest stats
    assert 0 < len(read) < total
    by_name = {
        f["path"].split("/")[-1]: f for f in cow.manifest(None)["files"]
    }
    for name in read:
        s = by_name[name]["stats"]["_offset"]
        assert s[1] >= WINDOW[0] and s[0] <= WINDOW[1]
    exp = _expected(spark, cow, *WINDOW)
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0
    assert got.count() > 0


def test_mor_window_scan_exact_without_pruning(spark, tables):
    """Unresolved deltas: pruning is off (it could crown a pruned key's
    older version) but the windowed result is still exact."""
    mor = tables["mor"]
    total = len(mor.manifest(None)["files"])
    got = mor.scan(spark, offset_range=WINDOW)
    assert len(set(got.inputFiles())) == total  # reads everything
    exp = _expected(spark, mor, *WINDOW)
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_raw_window_read_on_delta_snapshot_prunes_sharply(spark, tables):
    """include_system reads are row-local, so pruning is sound even with
    unresolved deltas — and per-batch delta files make it sharp: a one-batch
    offset window opens ~1/4 of the mor table's files.  (Must run BEFORE
    the compaction test below, which collapses the shared table's deltas.)"""
    mor = tables["mor"]
    total = len(mor.manifest(None)["files"])
    got = mor.scan(spark, include_system=True, offset_range=WINDOW)
    read = set(got.inputFiles())
    assert 0 < len(read) <= total // 2
    # row-exactness: same rows as an unpruned raw read filtered row-wise
    raw = mor.scan(spark, include_system=True).filter(
        F.col("_offset").between(*WINDOW)
    )
    assert got.exceptAll(raw).count() == 0 and raw.exceptAll(got).count() == 0


def test_compaction_enables_pruning_with_same_answer(spark, tables):
    mor = tables["mor"]
    before = mor.scan(spark, offset_range=WINDOW)
    exp = _expected(spark, mor, *WINDOW)
    compact(spark, mor)
    after = mor.scan(spark, offset_range=WINDOW)
    # same rows, fewer files opened
    assert after.exceptAll(exp).count() == 0 and exp.exceptAll(after).count() == 0
    assert len(set(after.inputFiles())) < len(set(before.inputFiles()))


def test_empty_window_reads_zero_files(spark, tables):
    cow = tables["cow"]
    got = cow.scan(spark, offset_range=(50_000, 60_000))
    assert got.count() == 0
    assert got.inputFiles() == []


def test_commit_seq_range_and_include_system(spark, tables):
    cow = tables["cow"]
    got = cow.scan(
        spark, include_system=True, commit_seq_range=(0, 999)
    )
    assert got.filter(F.col("_commit_seq") > 999).count() == 0
    assert got.count() > 0


def test_repo_pruning_fires_on_delta_snapshot_and_stays_exact(spark, tmp_path):
    """Repo predicates are KEY predicates — every version of a key shares
    its repo — so unlike offset/commit_seq windows the file-level pruning
    must fire even while LWW resolution is pending (delta files live).
    Two repo-disjoint MoR batches model the common CDC shape (a push
    touches one repo): a single-repo scan must read only the first batch's
    files and still equal the filter-after-full-resolve reference."""
    table = LakeTable.create(str(tmp_path / "repos"), n_buckets=4)
    events = change_log(spark, 800)
    b1 = events.withColumn("repo", F.concat(F.lit("aaa-"), F.col("repo")))
    b2 = (
        events.withColumn("repo", F.concat(F.lit("zzz-"), F.col("repo")))
        .withColumn("offset", F.col("offset") + 800)
        .withColumn("commit_seq", F.col("commit_seq") + 800)
    )
    apply_batch(spark, table, b1, "r1", merge_mode="mor")
    apply_batch(spark, table, b2, "r2", merge_mode="mor")
    m = table.manifest(None)
    assert any(f.get("delta") for f in m["files"]), "fixture must be delta-pending"
    total = len(m["files"])

    wanted = ["aaa-repo-000", "aaa-repo-001"]
    got = table.scan(spark, repos=wanted)
    read = {p.split("/")[-1] for p in got.inputFiles()}
    assert 0 < len(read) < total, "repo pruning must drop the zzz batch"
    by_name = {f["path"].split("/")[-1]: f for f in m["files"]}
    for name in read:
        s = by_name[name]["stats"]["repo"]
        assert s[0] <= max(wanted) and s[1] >= min(wanted)

    ref = table.scan(spark).filter(F.col("repo").isin(wanted))
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0
    assert got.count() > 0


def test_repo_scan_empty_set_and_stats_surfaced(spark, tables):
    cow = tables["cow"]
    assert cow.scan(spark, repos=[]).count() == 0
    files = cow.files(spark).collect()
    assert all(
        f["repo_lo"] is not None and f["repo_lo"] <= f["repo_hi"] for f in files
    )


def test_clustered_compaction_narrows_repo_pruning(spark, tmp_path):
    """cluster_by_key compaction (Iceberg sort-order rewrite) range-sorts
    winners by (bucket, repo, path) and caps rows per file, so per-file
    repo ranges become narrow — a single-repo scan then opens a small
    fraction of files even though the INGEST batches interleaved repos
    (where batch-clustered stats can't prune).  Equality is checked
    against the unclustered state."""
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    log = str(tmp_path / "log")
    change_log(spark, 4000).write.parquet(log)
    ingest_changelog(spark, table, log, batch_size=1000, merge_mode="mor")
    before = table.scan(spark)
    n_repos = before.select("repo").distinct().count()

    res = compact(spark, table, cluster_by_key=True, target_file_rows=100)
    assert not res["skipped"]
    after_files = table.manifest(None)["files"]
    assert len(after_files) > 8, "target_file_rows must split bucket files"

    after = table.scan(spark)
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0

    one = before.select("repo").first()["repo"]
    pruned = table.scan(spark, repos=[one])
    opened = len(pruned.inputFiles())
    # each repo's keys hash across ALL buckets, so the clustering floor is
    # one file per bucket (+1 boundary file per bucket at worst); anything
    # near that floor — and well under half the table — proves the
    # per-bucket repo ranges are narrow.  (Unclustered batches leave every
    # file spanning the full repo range → all files open.)
    n_buckets = 4
    assert opened <= 2 * n_buckets + 2, (opened, len(after_files), n_repos)
    assert opened < len(after_files) // 2, (opened, len(after_files))
    ref = after.filter(F.col("repo") == one)
    assert pruned.exceptAll(ref).count() == 0
    assert ref.exceptAll(pruned).count() == 0

    # sorted-within-file claim: each file's rows are (repo, path)-sorted
    import pyarrow.parquet as pq
    import os as _os

    f0 = next(f for f in after_files if f["rows"] > 1)
    t0 = pq.read_table(_os.path.join(table.root, f0["path"]),
                       columns=["repo", "path"]).to_pandas()
    assert list(t0.itertuples(index=False)) == sorted(
        t0.itertuples(index=False)
    )


def test_point_lookup_prunes_to_one_bucket_and_stays_exact(spark, tmp_path):
    """lookup(repo, path): exact-bucket pruning (pure key function, via the
    engine's own xxhash64 expression) + repo/path stats pruning.  On a
    key-clustered layout the lookup must open ≲2 files of the whole table;
    on a delta-pending MoR table it must still be row-exact (key predicates
    commute with LWW resolution)."""
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    log = str(tmp_path / "log")
    change_log(spark, 4000).write.parquet(log)
    ingest_changelog(spark, table, log, batch_size=1000, merge_mode="mor")

    full = table.scan(spark)
    k = full.select("repo", "path").first()
    ref = full.filter((F.col("repo") == k["repo"]) & (F.col("path") == k["path"]))

    # delta-pending: exact, and already bucket-pruned to 1/4 of files
    got = table.lookup(spark, k["repo"], k["path"])
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0
    n_total = len(table.manifest(None)["files"])
    assert len(got.inputFiles()) <= n_total // 4 + 1

    # clustered layout: ~one file opened
    compact(spark, table, cluster_by_key=True, target_file_rows=100)
    got = table.lookup(spark, k["repo"], k["path"])
    assert got.count() == 1
    assert len(got.inputFiles()) <= 2, got.inputFiles()
    assert got.first()["content"] == ref.first()["content"]

    # absent key → empty, not an error
    assert table.lookup(spark, "no-such-repo", "nope").count() == 0
    with pytest.raises(ValueError, match="not both"):
        table.scan(spark, key=("a", "b"), repos=["a"])


def test_repo_scan_composes_with_offset_window(spark, tables):
    cow = tables["cow"]
    one_repo = cow.scan(spark).select("repo").first()["repo"]
    got = cow.scan(spark, repos=[one_repo], offset_range=WINDOW)
    exp = _expected(spark, cow, *WINDOW).filter(F.col("repo") == one_repo)
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0
