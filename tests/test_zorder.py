"""Z-order clustered compaction (`compact(zorder_by=...)`) — Delta
OPTIMIZE ZORDER BY parity.

Contract: after a Morton-curve rewrite over (repo, _offset), BOTH
per-file stat ranges are narrow, so a combined repo × offset-window scan
prunes multiplicatively — strictly fewer files than the single-dimension
key-clustered rewrite of the SAME log — while staying row-exact.  Plus
unit coverage of the curve expressions themselves."""

from __future__ import annotations

from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.functions.zorder import (
    interleave_bits,
    numeric_rank,
    string_boundaries,
    string_rank,
)
from glad_tiles_pipeline_spark.operators.merge import compact
from glad_tiles_pipeline_spark.plans.lake import LakeTable
from glad_tiles_pipeline_spark.plans.planner import ingest_changelog
from glad_tiles_pipeline_spark.sources.generator import change_log


def _morton(a: int, b: int, bits: int = 6) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_bits_matches_reference(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 63) for b in (0, 2, 33, 63)], ["a", "b"]
    )
    got = df.select(
        "a", "b", interleave_bits(F.col("a"), F.col("b")).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton(r["a"], r["b"]), (r["a"], r["b"])


def test_rank_expressions(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    ranks = df.select(numeric_rank(F.col("x"), 0, 99).alias("r")).collect()
    vals = [r["r"] for r in ranks]
    assert min(vals) == 0 and max(vals) == 63
    assert vals == sorted(vals)  # monotone

    sdf = spark.createDataFrame([(f"k{i:03d}",) for i in range(40)], ["s"])
    bounds = string_boundaries(sdf, "s", bits=3)  # <= 7 boundaries
    assert 0 < len(bounds) <= 7 and bounds == sorted(bounds)
    sranks = sdf.select(
        "s", string_rank(F.col("s"), bounds, bits=3).alias("r")
    ).orderBy("s").collect()
    rs = [r["r"] for r in sranks]
    scale = max(8 // (len(bounds) + 1), 1)
    assert rs == sorted(rs) and rs[0] == 0 and rs[-1] == len(bounds) * scale


def test_zorder_beats_key_clustering_on_combined_predicate(spark, tmp_path):
    """The headline gate: the same log compacted both ways; a combined
    (one repo) × (offset window) scan opens strictly fewer files on the
    z-ordered layout, and both stay row-exact."""
    log = str(tmp_path / "log")
    # low skew so every repo's keys spread across the whole offset range —
    # the layout where one-dimensional clustering can't narrow offsets.
    # Enough rows/files that the curve has per-file resolution on BOTH
    # dims: with f files per bucket the z box is ~1/f of the (repo x
    # offset) plane, and the two-dim win needs f >> repo-domain size
    change_log(spark, 12000, n_repos=8, zipf_s=1.0).write.parquet(log)

    tables = {}
    for name, kw in [
        ("zo", {"zorder_by": ("repo", "_offset")}),
        ("kc", {"cluster_by_key": True}),
    ]:
        t = LakeTable.create(str(tmp_path / name), n_buckets=4)
        ingest_changelog(spark, t, log, batch_size=3000, merge_mode="mor")
        res = compact(spark, t, target_file_rows=50, **kw)
        assert not res["skipped"]
        tables[name] = t

    zo, kc = tables["zo"], tables["kc"]
    full = zo.scan(spark)
    # the two layouts hold identical logical state
    assert full.exceptAll(kc.scan(spark)).count() == 0
    assert kc.scan(spark).exceptAll(full).count() == 0

    repo = full.select("repo").orderBy("repo").first()["repo"]
    offs = full.join(
        zo.scan(spark, include_system=True).select("repo", "path", "_offset"),
        ["repo", "path"],
    ).agg(F.min("_offset"), F.max("_offset")).collect()[0]
    lo, hi = int(offs[0]), int(offs[1])
    window = (lo + (hi - lo) * 45 // 100, lo + (hi - lo) * 55 // 100)

    got_z = zo.scan(spark, repos=[repo], offset_range=window)
    got_k = kc.scan(spark, repos=[repo], offset_range=window)
    opened_z = len(got_z.inputFiles())
    opened_k = len(got_k.inputFiles())
    assert opened_z < opened_k, (opened_z, opened_k)

    # exactness on both layouts vs the definitional reference
    ref = (
        zo.scan(spark, include_system=True)
        .filter(~F.col("_deleted"))
        .filter(F.col("repo") == repo)
        .filter(F.col("_offset").between(*window))
        .select(*got_z.columns)
    )
    for got in (got_z, got_k):
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0


def test_zorder_excludes_cluster_by_key(spark, tmp_path):
    import pytest

    t = LakeTable.create(str(tmp_path / "t"), n_buckets=2)
    with pytest.raises(ValueError, match="not both"):
        compact(spark, t, cluster_by_key=True, zorder_by=("repo", "_offset"))
