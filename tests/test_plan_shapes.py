"""Physical-plan regression gates (SURVEY.md §4.1): the optimizations the
engine depends on must be visible in the executed plan, not assumed.

If one of these breaks, a future change silently reintroduced an extra
shuffle / full scan / row-Python stage; at 100 TB these are the plan
properties that decide whether the job finishes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.functions.hashing import bucket_col
from glad_tiles_pipeline_spark.operators.dedup import lww_dedup_argmax
from glad_tiles_pipeline_spark.operators.merge import plan_partition_ids
from glad_tiles_pipeline_spark.queries import EXTRA_QUERIES, QUERIES
from glad_tiles_pipeline_spark.sources.changelog import read_changelog_batch
from glad_tiles_pipeline_spark.sources.generator import change_log

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plan") / "log")
    change_log(spark, 2000).write.parquet(d)
    return d


def test_offset_window_predicate_reaches_parquet(spark, log_dir):
    df = read_changelog_batch(spark, log_dir, 500, 1000)
    plan = _plan(df)
    assert "PushedFilters" in plan and "offset" in plan.split("PushedFilters")[1][:200]


def test_changelog_scan_prunes_columns(spark, log_dir):
    df = read_changelog_batch(spark, log_dir, None, None).select("offset", "repo")
    scan_line = [l for l in _plan(df).splitlines() if "ReadSchema" in l][0]
    assert "content" not in scan_line  # 1 KB payload never read


def test_merge_write_plan_has_single_exchange(spark, log_dir):
    """The stats-planned repartition is the ONLY shuffle between the raw
    events and the bucketed write: the dedup group-by reuses it."""
    events = read_changelog_batch(spark, log_dir, None, None).filter(
        F.col("control").isNull()
    )
    src, _ = plan_partition_ids(
        events.withColumn("__bucket", bucket_col(8)),
        {b: 1 for b in range(8)},
        32,
    )
    winners = lww_dedup_argmax(
        src.repartition(8, F.col("__pid")),
        key=["__pid", "__bucket", "repo", "path"],
    )
    plan = _plan(winners.withColumn("content_sha", F.sha2(F.col("content"), 256)))
    n_exchanges = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exchanges == 1, plan


def test_cow_merge_plan_has_single_exchange(spark, log_dir, tmp_path):
    """CoW reshape gate: raw events + live rows resolve in ONE combined
    stats-planned shuffle — round 1 moved event content through two
    (batch-winners shuffle, then live∪winners shuffle)."""
    from glad_tiles_pipeline_spark.operators import merge as merge_mod
    from glad_tiles_pipeline_spark.plans.lake import LakeTable

    from pyspark.sql.readwriter import DataFrameWriter

    table = LakeTable.create(str(tmp_path / "lake"), n_buckets=8)
    events = read_changelog_batch(spark, log_dir, None, None)
    captured: list = []
    orig_parquet = DataFrameWriter.parquet

    def spy_parquet(self, *a, **k):
        captured.append(self._df)
        return orig_parquet(self, *a, **k)

    DataFrameWriter.parquet = spy_parquet
    try:
        merge_mod.apply_batch(
            spark, table, events, "b-plan", offsets={"lo": 0, "hi": 10**9},
            merge_mode="cow",
        )
    finally:
        DataFrameWriter.parquet = orig_parquet
    assert captured, "apply_batch wrote nothing"
    plan = _plan(captured[0])
    n_exchanges = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exchanges == 1, plan


def test_flagship_uses_broadcast_join(spark):
    plan = _plan(QUERIES["flagship_cdc_enrich"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_dim_joins_broadcast_not_shuffle(spark):
    plan = _plan(QUERIES["join_broadcast_dims"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_no_row_python_udf_anywhere(spark):
    """V5 ban (BASELINE.json: no per-row Python): every Python stage in
    every registered query plan must be Arrow-vectorized — BatchEvalPython
    (row-at-a-time pickle) must never appear."""
    offenders = []
    for name, fn in {**QUERIES, **EXTRA_QUERIES}.items():
        try:
            plan = _plan(fn(spark, SF))
        except Exception:  # pragma: no cover - plan-only probe
            continue
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert offenders == []


def test_decontaminate_broadcasts_benchmark(spark):
    """X9: the eval-set side must broadcast (no corpus-wide shuffle join)
    and the whole plan must stay UDF-free."""
    plan = _plan(EXTRA_QUERIES["decontaminate_ngram"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_stratified_sample_prunes_topk_before_shuffle(spark):
    """X10a: rank ≤ k must engage WindowGroupLimit so each map partition
    ships at most k rows per stratum into the window exchange."""
    plan = _plan(EXTRA_QUERIES["sample_stratified_quota"](spark, SF))
    assert "WindowGroupLimit" in plan, plan


def test_hash_sample_is_scan_plus_filter_only(spark):
    """X10b: the Bernoulli split is one pushable predicate — no Exchange
    anywhere in the plan."""
    plan = _plan(EXTRA_QUERIES["sample_hash_bernoulli"](spark, SF))
    assert "Exchange" not in plan, plan


def test_shuffle_hash_hint_plans_shj(spark):
    """J3: the SHUFFLE_HASH hint must actually produce a ShuffledHashJoin
    (not SMJ) — hard plan evidence now that the query itself is demoted to
    EXTRA_QUERIES (driver registry cap)."""
    plan = _plan(EXTRA_QUERIES["join_shuffle_hash"](spark, SF))
    assert "ShuffledHashJoin" in plan, plan


def test_minhash_self_join_reuses_exchange(spark):
    """The LSH band self-join's two sides share the identical shingle-
    explode + K-min aggregate subtree; Spark must serve both from ONE
    execution via ReusedExchange (replaces round 1's leaked persist())."""
    # a docs relation cached by another test module would swap the scan for
    # InMemoryTableScan and change the reuse shape — gate the uncached plan
    spark.catalog.clearCache()
    df = QUERIES["dedup_minhash_lsh"](spark, SF)
    df.collect()  # AQE finalizes reuse at execution
    plan = _plan(df)
    assert "ReusedExchange" in plan, plan


@pytest.mark.parametrize(
    "name", ["dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
             "dedup_embedding_cosine", "ann_lsh_topk"]
)
def test_neardup_plans_have_no_cartesian(spark, name):
    """Every near-dup/ANN operator must plan as blocked equi-joins — an
    all-pairs CartesianProduct is the 100 TB failure mode."""
    plan = _plan(QUERIES[name](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_binned_range_join_plans_equi_join(spark):
    """J8 scale path: the binned range join must plan as a shuffled
    equi-join on the bin — never BroadcastNestedLoop/Cartesian — and agree
    with the theta-join answer (including the left-outer variant)."""
    from glad_tiles_pipeline_spark.operators.rangejoin import binned_range_join

    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "value")
    reg = spark.read.parquet(f"{SF}/region.parquet").select(
        "r_name",
        (F.col("r_regionkey") * 50).cast("double").alias("lo"),
        ((F.col("r_regionkey") + 1) * 50).cast("double").alias("hi"),
    )
    binned = binned_range_join(ev, reg, "value", "lo", "hi", bin_width=25.0)
    plan = _plan(binned)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    theta = ev.join(
        reg, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    cols = ["event_id", "r_name"]
    assert binned.select(*cols).exceptAll(theta.select(*cols)).count() == 0
    assert theta.select(*cols).exceptAll(binned.select(*cols)).count() == 0
    # left variant: every point survives exactly max(1, n_matches) times
    left = binned_range_join(ev, reg, "value", "lo", "hi", 25.0, how="left")
    assert left.select("event_id").distinct().count() == ev.count()
    unmatched = left.filter(F.col("r_name").isNull()).count()
    assert unmatched == ev.join(
        theta.select("event_id").distinct(), "event_id", "left_anti"
    ).count()
    # regression (code review): a MATCHED point carrying NULL in a non-key
    # column must not also re-appear as an unmatched null row
    pts = spark.createDataFrame(
        [(7, 100.0, None), (8, 9999.0, "t")], "id long, value double, tag string"
    )
    lj = binned_range_join(pts, reg, "value", "lo", "hi", 25.0, how="left")
    rows = {(r.id, r.r_name) for r in lj.collect()}
    assert rows == {(7, "ASIA"), (8, None)}, rows


def test_aqe_splits_skewed_join_partition(spark):
    """§4.1 evidence: AQE's skew-join really fires — a join keyed on one
    hot value (10⁵ rows on a single key next to 1-row keys) must show
    skew-split sort-merge partitions in the final adaptive plan.  The skew
    thresholds are lowered to test scale and restored after."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # hot key must be DATA-DERIVED: a literal key constant-folds the
        # join into a cartesian+filter and no shuffle exists to split.
        left = spark.range(110_000).select(
            F.when(F.col("id") < 100_000, F.lit(7))
            .otherwise(F.col("id") % 50)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(60).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        # terminal join (no downstream agg: AQE declines to skew-split when
        # a downstream operator would need the join's hash partitioning)
        j = left.join(right.hint("MERGE"), "k")
        assert len(j.collect()) == 110_000  # finalize the adaptive plan
        plan = _plan(j)
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Spark-native bucketing (§4: 'bucketing for co-located joins'): two
    tables bucketed+sorted on the join key must sort-merge join with ZERO
    Exchange — the co-location contract a 100 TB fact-fact join relies on.
    (The lake table implements its own bucketing; this gates the catalog
    variant for plain warehouse tables.  Uses the session's default
    spark-warehouse dir — gitignored — since warehouse.dir is static.)"""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("orders_b"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("lineitem_b"))
    try:
        j = (
            spark.table("lineitem_b")
            .hint("MERGE")  # force SMJ (tables are tiny enough to broadcast)
            .join(
                spark.table("orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        j.collect()  # finalize AQE
        plan = _plan(j)
        join_part = plan.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, plan
        # and the answer matches the unbucketed join
        plain = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus").agg(F.count("*").alias("n"))
        )
        assert j.exceptAll(plain).count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_lww_argmax_has_partial_aggregation(spark):
    """Skew immunity: the argmax dedup must plan partial (map-side)
    aggregation before the shuffle."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(
        lww_dedup_argmax(ev, key=["user_id", "event_type"], order=["ts", "event_id"])
    )
    # struct-max aggregates plan as SortAggregate (immutable agg buffer),
    # but the load-bearing property is the same: a partial_max BEFORE the
    # exchange, so a hot key is reduced to ≤1 row per map task pre-shuffle
    pre_exchange = plan.split("Exchange")[-1]
    assert "partial_max" in pre_exchange
