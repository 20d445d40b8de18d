"""Driver-contract query library (SURVEY.md §2 → __spark_entry__.py).

Each ``q_*`` function takes (spark, sf_dir) and returns a DataFrame; each has
a matching ANSI-SQL oracle in ``ORACLES`` runnable by DuckDB on the same
parquet tables.  Conventions for exact cross-engine equality:

  * money/quantity aggregates: cast to DECIMAL(18,2) BEFORE summing (exact,
    order-independent), round, then cast to double — bitwise-stable on both
    engines, immune to float summation order;
  * float expressions (cosine, ratios): computed elementwise in double in
    the same sequence on both engines, rounded to 6 decimals;
  * fingerprints that the oracle must reproduce use sha256, not xxhash64;
  * every computed column is aliased identically in Spark and SQL (the
    driver hashes columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from glad_tiles_pipeline_spark.functions.text import (
    STOPWORDS,
    TOKEN_REGEX,
    bpe_ish_token_count,
    lang_id_heuristic,
    normalize_lang,
    normalize_lang_sql,
    quality_score,
    token_count,
)
from glad_tiles_pipeline_spark.operators.asof import asof_join
from glad_tiles_pipeline_spark.operators.dedup import (
    lww_dedup_argmax,
    lww_dedup_semijoin,
    lww_dedup_window,
)
from glad_tiles_pipeline_spark.operators.docs import (
    decontaminate,
    dedup_exact,
    hash_sample,
    minhash_neardup,
    ngram_jaccard_blocked,
    normalized_text,
    simhash_neardup,
    stratified_sample,
)
from glad_tiles_pipeline_spark.operators.multimodal import (
    decode_stub_features,
    to_media_table,
)
from glad_tiles_pipeline_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_lsh_topk,
    ivf_topk,
    embedding_neardup,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


D182 = "decimal(18,2)"
EVENT_KEY = ["user_id", "event_type"]
EVENT_ORDER = ["ts", "event_id"]
EVENT_COLS = ["user_id", "event_type", "event_id", "ts", "value"]

LWW_SQL = """
SELECT user_id, event_type, event_id, ts, value FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
"""


# ---------------------------------------------------------------------- CDC
def q_lww_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return lww_dedup_window(ev, key=EVENT_KEY, order=EVENT_ORDER).select(*EVENT_COLS)


def q_lww_argmax(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return lww_dedup_argmax(ev, key=EVENT_KEY, order=EVENT_ORDER).select(*EVENT_COLS)


def q_lww_semijoin(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return lww_dedup_semijoin(ev, key=EVENT_KEY, order=EVENT_ORDER).select(*EVENT_COLS)


def q_flagship(spark, sf_dir):
    """EP-A flagship: LWW dedup → broadcast-join documents → Arrow lang
    normalize → sha256 → per-lang aggregate."""
    ev = _t(spark, sf_dir, "events")
    docs = _t(spark, sf_dir, "documents")
    latest = lww_dedup_argmax(ev, key=EVENT_KEY, order=EVENT_ORDER)
    joined = latest.join(
        F.broadcast(docs), latest["user_id"] == docs["doc_id"], "inner"
    )
    return (
        joined.withColumn("lang_n", normalize_lang(F.col("lang")))
        .withColumn("text_sha", F.sha2(F.col("text"), 256))
        .groupBy(F.col("lang_n").alias("lang"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("text_sha").alias("n_docs"),
            F.round(F.sum(F.col("value").cast(D182)), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )


FLAGSHIP_SQL = f"""
WITH latest AS ({LWW_SQL.replace('user_id, event_type, event_id, ts, value', '*')})
SELECT {normalize_lang_sql('d.lang')} AS lang,
       count(*) AS n_events,
       count(DISTINCT l.user_id) AS n_users,
       count(DISTINCT sha256(d.text)) AS n_docs,
       CAST(round(sum(CAST(l.value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM latest l JOIN documents d ON d.doc_id = l.user_id
GROUP BY 1
"""


# ------------------------------------------------------------------ windows
def q_window_rank(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_custkey", "c_acctbal", "rnk")
    )


def q_window_lag(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value", 1).over(w), 6).alias("delta"),
    )


def q_window_running_sum(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast(D182)).over(w), 2)
        .cast("double")
        .alias("running_value"),
    )


def q_window_rank_family(spark, sf_dir):
    """W2: rank / dense_rank / ntile in one pass.  rank+dense_rank are
    ordered by a coarse (tie-prone) value so the gap/no-gap semantics are
    actually exercised; ntile is ordered by a unique total order so the
    bucket assignment is deterministic on both engines."""
    cust = _t(spark, sf_dir, "customer")
    coarse = F.round(F.col("c_acctbal"), -2)
    w_ties = Window.partitionBy("c_mktsegment").orderBy(F.desc(coarse))
    w_total = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rnk", F.rank().over(w_ties))
        .withColumn("drnk", F.dense_rank().over(w_ties))
        .withColumn("quartile", F.ntile(4).over(w_total))
        .filter(F.col("rnk") <= 10)
        .select("c_mktsegment", "c_custkey", "rnk", "drnk", "quartile")
    )


def q_sort_limit_offset(spark, sf_dir):
    """O3: global sort + offset paging — rows 11–20 of customers by balance.
    Deterministic because the sort key ends in the unique custkey."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal")
        .offset(10)
        .limit(10)
    )


# --------------------------------------------------------------- aggregates
def q_agg_pricing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast(D182)  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_base"),
            F.round(
                F.sum(dec("l_extendedprice") * (F.lit(1).cast(D182) - dec("l_discount"))),
                2,
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("n_rows"),
        )
    )


def q_agg_distinct(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def q_agg_approx_distinct(spark, sf_dir):
    """A3: approx_count_distinct (HLL++) — the cheap-cardinality primitive
    the §4.2 salt-factor heuristic reads.  The sketch is engine-specific, so
    the checkable contract is the TOLERANCE, not the raw estimate: the query
    emits the exact count plus a boolean asserting the HLL estimate landed
    within 5%; the oracle asserts the same contract (exact count + TRUE).
    A drifting sketch fails the value-hash."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.approx_count_distinct("user_id", 0.01).alias("__approx"),
        )
        .select(
            "event_type",
            "n_users",
            (
                F.abs(F.col("__approx") - F.col("n_users"))
                <= F.greatest(F.col("n_users") * 0.05, F.lit(1.0))
            ).alias("approx_within_5pct"),
        )
    )


def q_agg_cube(spark, sf_dir):
    """A5: CUBE over (o_orderstatus, o_orderpriority) — all four grouping
    sets in one pass (the rollup twin covers the hierarchical case)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast(D182)), 2)
        .cast("double")
        .alias("sum_price"),
    )


def q_agg_percentiles(spark, sf_dir):
    """A-family breadth: EXACT percentiles (Spark `percentile` with linear
    interpolation == DuckDB `quantile_cont`), rounded to 4dp for float-
    order stability."""
    cust = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90"),
        F.count("*").alias("n"),
    )


def q_agg_rollup(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    j = cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"]).join(
        F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]
    )
    return j.rollup("r_name", "n_name").agg(F.count("*").alias("n_customers"))


def q_agg_collect(spark, sf_dir):
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    return (
        nat.join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_list("n_name"))).alias("nations")
        )
    )


# -------------------------------------------------------------------- joins
def q_join_dims(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast(D182)), 2)
            .cast("double")
            .alias("sum_acctbal"),
        )
    )


def q_join_revenue(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast(D182)  # noqa: E731
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.round(
                F.sum(dec("l_extendedprice") * (F.lit(1).cast(D182) - dec("l_discount"))),
                2,
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_join_semi(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def q_join_anti(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"), F.min("c_custkey").alias("min_custkey"))
    )


def q_join_outer_histogram(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


def q_join_range(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    reg = _t(spark, sf_dir, "region")
    cond = (F.col("value") >= F.col("r_regionkey") * 50) & (
        F.col("value") < (F.col("r_regionkey") + 1) * 50
    )
    return (
        ev.join(F.broadcast(reg), cond, "inner")
        .groupBy("r_name")
        .agg(F.count("*").alias("n_events"))
    )


def q_join_range_binned(spark, sf_dir):
    """J8 at scale: the same range join as join_range_value_buckets, planned
    as a bin equi-join (operators/rangejoin.py) instead of a broadcast
    nested loop — identical answer, shuffle-join plan (gated: no BNL)."""
    from glad_tiles_pipeline_spark.operators.rangejoin import binned_range_join

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    reg = _t(spark, sf_dir, "region").select(
        "r_name",
        (F.col("r_regionkey") * 50).cast("double").alias("lo"),
        ((F.col("r_regionkey") + 1) * 50).cast("double").alias("hi"),
    )
    return (
        binned_range_join(ev, reg, "value", "lo", "hi", bin_width=25.0)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_events"))
    )


def q_join_asof(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return asof_join(
        ev,
        orders,
        on=["user_id"],
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
        right_order="o_orderkey",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")


def q_join_salted(spark, sf_dir):
    """Skew-salted large join (J7): same answer as the plain join, with the
    build side exploded over R salt replicas and the probe side salted."""
    R = 8
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(R - 1))))
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "__salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(R)).cast("int")
    )
    dec = lambda c: F.col(c).cast(D182)  # noqa: E731
    return (
        li.join(orders, (li["l_orderkey"] == orders["o_orderkey"]) & (li["__salt"] == orders["__salt"]))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_price"),
            F.count("*").alias("n_items"),
        )
    )


def q_join_shuffle_hash(spark, sf_dir):
    """J3: shuffled-hash join — planner-forced via the SHUFFLE_HASH hint.
    Same answer as a sort-merge plan; the hint trades the per-partition sort
    for an in-memory hash build, the right call when one side is mid-size
    (too big to broadcast, small enough to hash per partition)."""
    orders = _t(spark, sf_dir, "orders").hint("SHUFFLE_HASH")
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast(D182)  # noqa: E731
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_price"),
            F.count("*").alias("n_items"),
        )
    )


def q_join_cross(spark, sf_dir):
    """J10: explicit cross join (nested loop) — every (region, nation) pair,
    scored by whether the nation belongs to the region.  dim × dim only; a
    cross join is never the scale path, it exists as the building block the
    salt fan-out / small-domain enumeration patterns reduce to."""
    reg = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = _t(spark, sf_dir, "nation").select("n_regionkey", "n_name")
    return (
        reg.crossJoin(nat)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1).otherwise(0)
            ).alias("n_members"),
        )
    )


def q_join_right_outer(spark, sf_dir):
    """J6 (right outer): orders RIGHT JOIN customer — customers without
    orders survive with zero counts (the right-null side exercised)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "right")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


def q_join_full_outer(spark, sf_dir):
    """J6 (full outer): per-nation customer counts FULL OUTER per-nation
    supplier counts — each side filtered to a different key range so both
    null sides of the join are actually exercised."""
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 13)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") >= 12)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


# ------------------------------------------------------------------ set ops
def q_setop_except(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    return f.exceptAll(o)


def q_setop_intersect(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    return cust.intersect(supp)


def q_union_by_name(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    lo = ev.filter(F.col("value") < 100).select("event_id", "event_type", "value")
    hi = ev.filter(F.col("value") >= 100).select("value", "event_type", "event_id")
    return (
        lo.unionByName(hi)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast(D182)), 2).cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------- functions
def q_fn_json(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k_mod", F.pmod(k, F.lit(10)))
        .groupBy("k_mod")
        .agg(F.count("*").alias("n"))
    )


def q_fn_from_json(spark, sf_dir):
    """F8 (from_json): parse the props JSON column into a typed struct with
    an explicit schema — the schema-evo control-event decode path uses the
    same primitive (operators/merge.py)."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k int"))
    return (
        parsed.groupBy(F.pmod(F.col("p.k"), F.lit(7)).alias("k_mod7"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("p.k").cast("long")).alias("sum_k"),
        )
    )


def q_fn_json_roundtrip(spark, sf_dir):
    """F8 tail primitives in one query: ``json_tuple`` extracts from the
    props JSON, ``to_json`` re-serializes a typed struct, and
    ``schema_of_json`` (literal-input schema inference) rides along as a
    constant column.  Grouping on the round-tripped JSON string makes any
    serialization drift (key order, spacing, null handling) fail the
    value-hash against DuckDB's ``to_json(struct_pack(...))``."""
    ev = _t(spark, sf_dir, "events")
    extracted = ev.select(
        F.json_tuple(F.col("props"), "k").alias("k_str"), "event_type"
    )
    # ignoreNullFields=false: Spark's default OMITS null fields while
    # DuckDB's to_json renders "k":null — a malformed/absent props.k would
    # otherwise silently diverge the group keys between the two engines
    rebuilt = F.to_json(
        F.struct(
            F.col("k_str").cast("int").alias("k"),
            F.col("event_type").alias("et"),
        ),
        {"ignoreNullFields": "false"},
    )
    return (
        extracted.groupBy(rebuilt.alias("rebuilt"))
        .agg(F.count("*").alias("n"))
        .withColumn("props_schema", F.schema_of_json(F.lit('{"k": 1}')))
    )


def q_fn_lang_norm_iter(spark, sf_dir):
    """V2: iterator pandas UDF variant of fn_lang_normalize — identical
    answer, per-partition-amortized init (functions/text.py)."""
    from glad_tiles_pipeline_spark.functions.text import normalize_lang_iter

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("lang_n", normalize_lang_iter(F.col("lang")))
        .groupBy(F.col("lang_n").alias("lang"))
        .agg(F.count("*").alias("n_docs"))
    )


def q_fn_map_props(spark, sf_dir):
    """F7 breadth: map construction/access as first-class columns —
    ``create_map`` ×2, ``map_concat``, ``element_at``, ``map_keys``.  The
    oracle reproduces the VALUES the map ops must yield (same contract
    style as agg_approx_distinct): any drift in map semantics changes the
    grouped counts."""
    ev = _t(spark, sf_dir, "events")
    m = F.map_concat(
        F.create_map(F.lit("et"), F.col("event_type")),
        F.create_map(
            F.lit("sign"),
            F.when(F.col("value") >= 100, F.lit("hi")).otherwise(F.lit("lo")),
        ),
    )
    return (
        ev.select(
            F.element_at(m, "et").alias("et"),
            F.element_at(m, "sign").alias("sign"),
            F.size(F.map_keys(m)).alias("n_keys"),
        )
        .groupBy("et", "sign", "n_keys")
        .agg(F.count("*").alias("n"))
    )


def q_agg_pivot_status(spark, sf_dir):
    """A-family breadth: PIVOT — per-priority order counts spread across
    status columns (explicit value list keeps the output schema static, the
    production-safe form: an unlisted pivot scans twice to discover
    values)."""
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


def q_agg_unpivot_status(spark, sf_dir):
    """A-family breadth: UNPIVOT (melt) — the pivot query's wide output
    folded back to long form, dropping empty cells.  Exercises
    ``DataFrame.unpivot`` (Spark 3.4+); the oracle is the plain long-form
    aggregate it must reconstruct."""
    wide = q_agg_pivot_status(spark, sf_dir)
    return (
        wide.unpivot(
            "o_orderpriority", ["n_f", "n_o", "n_p"], "status_col", "n_orders"
        )
        .filter(F.col("n_orders") > 0)
        .select(
            "o_orderpriority",
            F.upper(F.substring("status_col", 3, 1)).alias("o_orderstatus"),
            "n_orders",
        )
    )


def q_fn_dates(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )


def q_fn_sha(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha"))


def q_fn_lang_norm(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("lang_n", normalize_lang(F.col("lang")))
        .groupBy(F.col("lang_n").alias("lang"))
        .agg(F.count("*").alias("n_docs"))
    )


def q_stream_tumbling(spark, sf_dir):
    """Batch-equivalent of the T2 tumbling-window streaming aggregate."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )


def q_stream_sliding(spark, sf_dir):
    """T2 (sliding): 2-hour windows sliding by 1 hour — every event lands in
    exactly two windows.  Batch twin of the streaming aggregate; the oracle
    reproduces the window assignment with an explicit 2-way fan-out."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )


def q_session_windows(spark, sf_dir):
    """T3: per-user session windows (30-min inactivity gap).  Session start
    is the min event ts in the session — the oracle reproduces it with a
    gaps-and-islands window SQL."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


_CSV_FIXTURE_CACHE: dict[str, str] = {}


def _csv_nation_fixture(spark, sf_dir) -> str:
    """Write the nation dim to CSV exactly once per (process, sf_dir) and
    clean it up at exit — keeps the write side effect out of the repeatedly
    timed/verified query path (it's a fixture, not part of the query)."""
    import atexit
    import shutil
    import tempfile

    if sf_dir not in _CSV_FIXTURE_CACHE:
        csv_dir = tempfile.mkdtemp(prefix="csv_nation_")
        _t(spark, sf_dir, "nation").coalesce(1).write.mode("overwrite").option(
            "header", True
        ).csv(csv_dir)
        _CSV_FIXTURE_CACHE[sf_dir] = csv_dir
        atexit.register(shutil.rmtree, csv_dir, ignore_errors=True)
    return _CSV_FIXTURE_CACHE[sf_dir]


def q_csv_roundtrip(spark, sf_dir):
    """S5: CSV source parity — snapshot the nation dim to CSV (once, as a
    fixture), read it back with an explicit schema (header, quoted strings),
    aggregate per region.  The oracle runs the same aggregate on the parquet
    twin, so any CSV quoting/typing drift fails the value-hash."""
    csv_dir = _csv_nation_fixture(spark, sf_dir)
    back = (
        spark.read.option("header", True)
        .schema("n_nationkey int, n_name string, n_regionkey int, n_comment string")
        .csv(csv_dir)
    )
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.min("n_name").alias("first_nation"),
    )


def q_grouped_pandas_agg(spark, sf_dir):
    """A7: custom per-group aggregate through the Arrow grouped-map surface
    (applyInPandas) — median customer balance per nation.  Vectorized
    pandas per group, never per-row Python."""
    import pandas as pd

    cust = _t(spark, sf_dir, "customer")

    def median_bal(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "c_nationkey": int(pdf["c_nationkey"].iloc[0]),
                    "n_customers": len(pdf),
                    "median_acctbal": float(
                        pdf["c_acctbal"].quantile(0.5, interpolation="lower")
                    ),
                }
            ]
        )

    return cust.select("c_nationkey", "c_acctbal").groupBy("c_nationkey").applyInPandas(
        median_bal,
        "c_nationkey int, n_customers bigint, median_acctbal double",
    )


# ----------------------------------------------------------- text analytics
def q_text_tokens(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_tokens_bpe"),
    )


def q_text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


def q_text_langid(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id_heuristic("text").alias("lang_pred"))


def q_text_chunks(spark, sf_dir):
    """Training-data chunking: overlapping 24-token windows, stride 16 —
    pure column expressions (operators/chunking.py), DuckDB-reproducible
    (same window math over list slices)."""
    from glad_tiles_pipeline_spark.operators.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=24, overlap=8)


def q_text_pack(spark, sf_dir):
    """Sequence packing over the chunk stream: greedy token-budget bins of
    capacity 64 per document (operators/chunking.py::pack_chunks, an
    applyInPandas grouped map).  The oracle recomputes the same greedy scan
    with a recursive CTE — fully independent implementations."""
    from glad_tiles_pipeline_spark.operators.chunking import (
        chunk_documents,
        pack_chunks,
    )

    docs = _t(spark, sf_dir, "documents")
    return pack_chunks(
        chunk_documents(docs, chunk_tokens=24, overlap=8), capacity=64
    )


def q_text_pack_global(spark, sf_dir):
    """CROSS-document packing (X7'): one continuous greedy bin stream per
    shard (doc_id % 4), chunks in (doc_id, chunk_idx) order — short
    documents share bins.  The oracle recomputes the scan with a per-shard
    row_number + recursive CTE; the streaming twin
    (streaming/stateful.py::pack_chunks_stream) is equality-tested in
    tests/test_chunking.py."""
    from glad_tiles_pipeline_spark.operators.chunking import (
        chunk_documents,
        pack_chunks_global,
    )

    docs = _t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=24, overlap=8).withColumn(
        "shard", (F.col("doc_id") % 4).cast("int")
    )
    return pack_chunks_global(chunks, capacity=64)


def q_text_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.sha2(normalized_text(F.col("text")), 256).alias("fingerprint")
    )


# -------------------------------------------------------------------- dedup
def q_dedup_exact(spark, sf_dir):
    return dedup_exact(_t(spark, sf_dir, "documents"))


def q_dedup_ngram(spark, sf_dir):
    return ngram_jaccard_blocked(
        _t(spark, sf_dir, "documents"), threshold=0.5, band_width=32
    )


def q_decontaminate(spark, sf_dir):
    """Training-data decontamination (X9): docs sharing ≥2 distinct 3-gram
    shingles with the held-out 'benchmark' slice (every 101st doc).  The
    benchmark side is broadcast; the corpus explodes to slim rows and
    never shuffles pre-join."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 0)
    corpus = docs.filter(F.col("doc_id") % 101 != 0)
    return decontaminate(corpus, bench, n=3, min_hits=2)


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-lang quota sample (X10): 20 lowest-sha256(id) docs
    per lang — engine-independent, reproducible training-mix sampling."""
    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", k=20).select(
        "doc_id", "lang", "n_chars"
    )


def q_sample_hash(spark, sf_dir):
    """Deterministic Bernoulli(0.1) split via a sha256 threshold predicate
    (X10): a pure column filter — no shuffle, no RNG state."""
    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, 0.1).select("doc_id", "lang")


def q_dedup_minhash(spark, sf_dir):
    """24 minhashes / 8 bands of 3: the (r=3, b=8) S-curve threshold
    (1/b)^(1/r) = 0.5 matches the query threshold exactly — near-certain
    recall above it (pairs at j=0.9 miss with p ≈ 3e-5) and steeply decaying
    candidate volume below it.  Pair recall measured 1.0 on the fixtures
    (tests/test_similarity_recall.py asserts the floor); the round-1
    (r=4, b=4) config measured 0.96 — banding is the recall knob.

    Oracle: the exact all-pairs Jaccard twin.  The output is post-exact-
    verify (LSH only proposes candidates; Jaccard decides), so whenever
    candidate recall is 1.0 — measured and equality-asserted at the driver
    operating point by tests/test_similarity_recall.py::
    test_minhash_equals_exact_at_driver_sf — the result is independent of
    the xxhash64 LSH internals and DuckDB reproduces it exactly."""
    return minhash_neardup(
        _t(spark, sf_dir, "documents"), threshold=0.5, n_hashes=24, n_bands=8
    )


def q_dedup_simhash(spark, sf_dir):
    """Radius 3 covers every planted near-dup in the fixtures (their
    signatures sit at hamming 0-3); recall within the radius is 1.0 by
    construction (pigeonhole banding, operators/docs.py).

    Uses the sha256 token-hash spelling: the signature is then a pure
    function of the text that DuckDB recomputes bit-for-bit (CAST('0x' ||
    substr(sha256(tok),1,8) AS BIGINT) == conv(substr(sha2(tok,256),1,8),
    16,10)), so the driver row is fully oracle-checked instead of
    rows-only.  xxhash64 stays the default fast path of simhash32 for
    production pipelines that don't need an external re-computation."""
    return simhash_neardup(
        _t(spark, sf_dir, "documents"), max_hamming=3, token_hash="sha256"
    )


_SIG_INDEX_CACHE: dict[str, object] = {}


def _sig_index_for(spark, sf_dir):
    """Signature index over corpus ∖ batch (doc_id % 7 != 3), built once
    per sf_dir through the real MERGE path and compacted — the persisted
    state an ingest pipeline would already have when the batch arrives.
    Cached across the two incremental queries (and bench reruns)."""
    idx = _SIG_INDEX_CACHE.get(sf_dir)
    if idx is None:
        import tempfile

        from glad_tiles_pipeline_spark.operators.incremental import (
            create_signature_index,
            update_signature_index,
        )
        from glad_tiles_pipeline_spark.operators.merge import compact

        docs = _t(spark, sf_dir, "documents")
        base = docs.filter(F.col("doc_id") % 7 != 3)
        root = tempfile.mkdtemp(prefix="sig_index_")
        idx = create_signature_index(root + "/index", n_buckets=8)
        update_signature_index(spark, idx, base, "sig-base", 0)
        compact(spark, idx, batch_id="sig-compact")
        _SIG_INDEX_CACHE[sf_dir] = idx
    return idx


def q_dedup_minhash_incremental(spark, sf_dir):
    """Incremental batch-vs-index near-dup: docs with doc_id % 7 == 3 play
    the incoming batch, everything else is pre-indexed signatures
    (operators/incremental.py — only the batch is shingled; the corpus
    side reads integer signature columns and probes a broadcast of the
    banded batch).  Oracle: the exact all-pairs Jaccard twin restricted to
    pairs touching the batch — valid for the same recall-1.0 reason as
    ``dedup_minhash_lsh``, plus the bit-exact equivalence to the full
    recompute asserted by tests/test_incremental_dedup.py."""
    from glad_tiles_pipeline_spark.operators.incremental import (
        incremental_minhash_neardup,
        index_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 7 == 3)
    sigs = index_signatures(spark, _sig_index_for(spark, sf_dir))
    return incremental_minhash_neardup(docs, batch, sigs, threshold=0.5)


def q_dedup_simhash_incremental(spark, sf_dir):
    """Incremental SimHash near-dup against the same persisted index — no
    corpus text read at all (verify is bit math on stored signatures).
    sha256 token-hash spelling so DuckDB recomputes both sides'
    signatures bit-for-bit; restricted to pairs touching the batch."""
    from glad_tiles_pipeline_spark.operators.incremental import (
        incremental_simhash_neardup,
        index_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 7 == 3)
    sigs = index_signatures(spark, _sig_index_for(spark, sf_dir))
    return incremental_simhash_neardup(batch, sigs)


_EMB_INDEX_CACHE: dict[str, object] = {}


def _emb_index_for(spark, sf_dir):
    """Embedding-bucket index over corpus ∖ batch (vec_id % 7 != 3), built
    once per sf_dir through the real MERGE path and compacted — the
    persisted state the incremental embedding dedup probes.  Cached like
    ``_sig_index_for``."""
    idx = _EMB_INDEX_CACHE.get(sf_dir)
    if idx is None:
        import tempfile

        from glad_tiles_pipeline_spark.operators.incremental import (
            create_embedding_index,
            update_embedding_index,
        )
        from glad_tiles_pipeline_spark.operators.merge import compact

        emb = _t(spark, sf_dir, "embeddings")
        base = emb.filter(F.col("vec_id") % 7 != 3)
        root = tempfile.mkdtemp(prefix="emb_index_")
        idx = create_embedding_index(root + "/index", n_buckets=8)
        update_embedding_index(spark, idx, base, "emb-base", 0)
        compact(spark, idx, batch_id="emb-compact")
        _EMB_INDEX_CACHE[sf_dir] = idx
    return idx


def q_dedup_embedding_incremental(spark, sf_dir):
    """Incremental embedding near-dup against the persisted bucket index
    (operators/incremental.py): vectors with vec_id % 7 == 3 play the
    incoming batch; the index side probes a broadcast of the banded batch
    with pure expressions over its stored bucket columns — no Python and
    no vector reads on the corpus-sized side; exact-cosine verify touches
    corpus vectors only for candidate ids.  Oracle: the exact all-pairs
    cosine twin restricted to pairs touching the batch — valid because the
    candidate set equals the full recompute's batch-touching candidates by
    construction (stored buckets ARE the shared kernel's output) and
    measured recall at this operating point is 1.0
    (tests/test_similarity_recall.py)."""
    from glad_tiles_pipeline_spark.operators.incremental import (
        incremental_embedding_neardup,
        index_embedding_buckets,
    )

    emb = _t(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 7 == 3)
    bk = index_embedding_buckets(spark, _emb_index_for(spark, sf_dir))
    return incremental_embedding_neardup(emb, batch, bk, threshold=0.45)


_TOK_INDEX_CACHE: dict[str, object] = {}


def _tok_index_for(spark, sf_dir):
    """Inverted token index over the documents corpus, built through the
    real MERGE path in three generations — base, late adds, then a
    re-ingest that CHANGES token sets plus deletes — and key-clustered so
    term reads are stats-pruned.  The interesting state for the oracle:
    stale postings exist physically and must lose the version check."""
    idx = _TOK_INDEX_CACHE.get(sf_dir)
    if idx is None:
        import tempfile

        from glad_tiles_pipeline_spark.operators.merge import compact
        from glad_tiles_pipeline_spark.operators.textindex import (
            create_token_index,
            update_token_index,
        )

        docs = _t(spark, sf_dir, "documents")
        root = tempfile.mkdtemp(prefix="tok_index_")
        idx = create_token_index(root + "/index", n_buckets=8)
        update_token_index(
            spark, idx, docs.filter(F.col("doc_id") % 7 != 3), "tok-b1", 1)
        update_token_index(
            spark, idx, docs.filter(F.col("doc_id") % 7 == 3), "tok-b2", 2)
        reingest = docs.filter(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 13 != 5)
        ).withColumn("text", F.concat(F.col("text"), F.lit(" spark extra")))
        update_token_index(
            spark, idx, reingest, "tok-b3", 3,
            deletes=docs.filter(F.col("doc_id") % 13 == 5).select("doc_id"))
        compact(spark, idx, batch_id="tok-compact", cluster_by_key=True)
        _TOK_INDEX_CACHE[sf_dir] = idx
    return idx


def q_text_search_terms(spark, sf_dir):
    """Term search over the incrementally-maintained inverted index
    (operators/textindex.py): posting lists persisted as a lake table,
    term reads pruned by the key-1 file stats, liveness decided by the
    per-doc version sentinel (re-ingested docs retire their dropped
    terms; deleted docs drop out entirely).  Oracle: DuckDB re-tokenizes
    the LIVE corpus (same regex) and recomputes the posting lists — the
    definitional answer the index must reproduce through its three
    generations of updates."""
    from glad_tiles_pipeline_spark.operators.textindex import search_terms

    return search_terms(
        spark, _tok_index_for(spark, sf_dir), ["merge", "spark", "vector"]
    )


def q_text_search_bm25(spark, sf_dir):
    """BM25-ranked retrieval over the same incrementally-maintained
    inverted index (operators/textindex.py::search_ranked): every
    ranking input lives IN the index (tf per posting, doc length on the
    version sentinel, N/avgdl one slim sentinel agg, df an output-sized
    agg over the query's own postings) — ranking costs the boolean
    search plus zero corpus IO.  Deterministic across engines: score
    rounded to 6 decimals, ties break by doc_id.  Oracle: DuckDB
    recomputes the full BM25 formula (k1=1.2, b=0.75) from the live
    corpus text."""
    from glad_tiles_pipeline_spark.operators.textindex import search_ranked

    return search_ranked(
        spark, _tok_index_for(spark, sf_dir), ["merge", "spark", "vector"],
        k=25,
    )


def q_merge_into_upsert(spark, sf_dir):
    """Declarative MERGE INTO (operators/merge_into.py) compiled onto the
    exactly-once CDC apply path: documents with doc_id % 3 != 0 seed a
    lake table; the even-doc_id half merges in with a conditional UPDATE
    (langid replaced, n_chars accumulates t+s), a conditional DELETE
    (n_chars % 7 = 0 — evaluated before UPDATE, Delta clause order), and
    a conditional INSERT (n_chars % 5 <> 2).  Returns the table's final
    resolved state; the oracle recomputes the same MERGE as pure SQL over
    the same inputs.  The payload column is named ``langid`` (not the CDC
    schema's ``lang``) so the engine's lang normalization stays out of
    the comparison — this query checks MERGE semantics, not text fns."""
    import tempfile

    from pyspark.sql import types as T

    from glad_tiles_pipeline_spark.operators.merge import apply_batch
    from glad_tiles_pipeline_spark.operators.merge_into import merge_into
    from glad_tiles_pipeline_spark.plans.lake import LakeTable

    docs = _t(spark, sf_dir, "documents")
    schema = T.StructType([
        T.StructField("corpus", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("langid", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    root = tempfile.mkdtemp(prefix="merge_into_")
    table = LakeTable.create(root + "/t", schema=schema, n_buckets=8)
    seed = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("offset"),
        F.lit(1).cast("long").alias("commit_seq"),
        F.lit("U").alias("op"),
        F.lit("docs").alias("repo"),
        F.format_string("%012d", F.col("doc_id")).alias("path"),
        F.col("lang").alias("langid"),
        F.col("n_chars"),
        F.lit(None).cast("string").alias("control"),
    )
    apply_batch(spark, table, seed, "seed", use_arrow_udfs=False)
    src = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.lit("docs").alias("corpus"),
        F.format_string("%012d", F.col("doc_id")).alias("doc_id"),
        F.col("lang").alias("langid"),
        F.col("n_chars"),
    )
    merge_into(
        spark, table, src, "m1",
        when_matched_update={"langid": "s.langid",
                             "n_chars": "t.n_chars + s.n_chars"},
        matched_condition="s.n_chars % 3 <> 1",
        when_matched_delete=True,
        delete_condition="s.n_chars % 7 = 0",
        when_not_matched_insert={"langid": "s.langid",
                                 "n_chars": "s.n_chars"},
        insert_condition="s.n_chars % 5 <> 2",
        merge_mode="mor",
        use_arrow_udfs=False,
    )
    return table.scan(spark).select("corpus", "doc_id", "langid", "n_chars")


def q_rowops_update_delete(spark, sf_dir):
    """Predicate row-level ops (operators/rowops.py, S30) compiled onto
    the exactly-once CDC apply path: documents seed a lake table, then
    ``UPDATE ... SET langid = concat('u-', langid), n_chars = n_chars*2+1
    WHERE n_chars % 5 = 2`` and ``DELETE WHERE n_chars % 7 = 3`` run in
    sequence — the delete predicate sees post-update values, which is the
    ordering the oracle recomputes declaratively.  No join anywhere: each
    op is one predicate-filtered live read emitting O(matched) events.
    Payload columns are named ``langid`` (not the CDC schema's ``lang``)
    so lang normalization stays out of the comparison."""
    import tempfile

    from pyspark.sql import types as T

    from glad_tiles_pipeline_spark.operators.merge import apply_batch
    from glad_tiles_pipeline_spark.operators.rowops import (
        delete_where,
        update_where,
    )
    from glad_tiles_pipeline_spark.plans.lake import LakeTable

    docs = _t(spark, sf_dir, "documents")
    schema = T.StructType([
        T.StructField("corpus", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("langid", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    root = tempfile.mkdtemp(prefix="rowops_")
    table = LakeTable.create(root + "/t", schema=schema, n_buckets=8)
    seed = docs.select(
        F.col("doc_id").alias("offset"),
        F.lit(1).cast("long").alias("commit_seq"),
        F.lit("U").alias("op"),
        F.lit("docs").alias("repo"),
        F.format_string("%012d", F.col("doc_id")).alias("path"),
        F.col("lang").alias("langid"),
        F.col("n_chars"),
        F.lit(None).cast("string").alias("control"),
    )
    apply_batch(spark, table, seed, "seed", use_arrow_udfs=False)
    update_where(
        spark, table,
        {"langid": "concat('u-', langid)", "n_chars": "n_chars * 2 + 1"},
        "n_chars % 5 = 2", "u1",
        merge_mode="mor", use_arrow_udfs=False,
    )
    delete_where(
        spark, table, "n_chars % 7 = 3", "d1",
        merge_mode="mor", use_arrow_udfs=False,
    )
    return table.scan(spark).select("corpus", "doc_id", "langid", "n_chars")


def q_matview_repo_stats(spark, sf_dir):
    """Incrementally-maintained materialized aggregate view
    (operators/matview.py, X13): per-group (repo) aggregates served from a
    lake table refreshed by PRUNED GROUP RECOMPUTE through the same
    post_apply seam as the signature/token indexes — each batch recomputes
    only the groups it touched, from a key-1 stats-pruned scan.  Three
    generations exercise the interesting states: a seed, a re-ingest that
    changes content plus deletes, and a delete-everything batch that must
    TOMBSTONE its group out of the view.  Oracle: DuckDB recomputes the
    aggregates from the final live corpus state — the definitional GROUP
    BY the view must equal.  Payload columns are named ``langid``/``body``
    (not the CDC schema's ``lang``/``content``) so the engine's lang
    normalization and sha derivation stay out of the comparison."""
    import tempfile

    from pyspark.sql import types as T

    from glad_tiles_pipeline_spark.operators.matview import (
        create_matview,
        matview_hook,
        read_matview,
    )
    from glad_tiles_pipeline_spark.operators.merge import apply_batch
    from glad_tiles_pipeline_spark.plans.lake import LakeTable

    docs = _t(spark, sf_dir, "documents")
    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("langid", T.StringType()),
        T.StructField("body", T.StringType()),
    ])
    root = tempfile.mkdtemp(prefix="matview_")
    table = LakeTable.create(root + "/t", schema=schema, n_buckets=8)
    view = create_matview(
        root + "/mv",
        [("n_paths", T.LongType()), ("total_chars", T.LongType()),
         ("n_langs", T.LongType())],
        n_buckets=4,
    )
    aggs = {
        "n_paths": F.count("*"),
        "total_chars": F.sum(F.length("body")),
        "n_langs": F.countDistinct("langid"),
    }
    hook = matview_hook(spark, table, view, aggs)

    def _ev(df, seq, op, off_base, body_col):
        return df.select(
            (F.lit(off_base) + F.col("doc_id")).cast("long").alias("offset"),
            F.lit(seq).cast("long").alias("commit_seq"),
            F.lit(op).alias("op"),
            F.concat(F.lit("r"), (F.col("doc_id") % 7).cast("string")).alias(
                "repo"
            ),
            F.format_string("%012d", F.col("doc_id")).alias("path"),
            F.col("lang").alias("langid"),
            body_col.alias("body"),
            F.lit(None).cast("string").alias("control"),
        )

    gens = [
        # seed: every document
        _ev(docs, 1, "U", 0, F.col("text")),
        # re-ingest %10==0 (content changes) + delete %13==5 — disjoint
        # sets, so no same-seq LWW tie
        _ev(
            docs.filter((F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 13 != 5)),
            2, "U", 10**9, F.concat(F.col("text"), F.lit(" extra")),
        ).unionByName(
            _ev(docs.filter(F.col("doc_id") % 13 == 5), 2, "D", 10**9,
                F.lit(None).cast("string"))
        ),
        # kill group r3 entirely: the view must tombstone it
        _ev(docs.filter(F.col("doc_id") % 7 == 3), 3, "D", 2 * 10**9,
            F.lit(None).cast("string")),
    ]
    for i, ev in enumerate(gens):
        hi = ev.agg(F.max("offset")).collect()[0][0]
        offsets = {"lo": i * 10**9, "hi": hi}
        apply_batch(spark, table, ev, f"mv-gen{i}", offsets=offsets,
                    use_arrow_udfs=False)
        hook(ev, f"gen{i}", offsets)
    return (
        read_matview(spark, view)
        .select("grp", "n_paths", "total_chars", "n_langs")
        .orderBy("grp")
    )


def q_scd2_history(spark, sf_dir):
    """SCD Type 2 history materialization (operators/scd2.py, X15 — DLT
    ``APPLY CHANGES ... STORED AS SCD TYPE 2`` parity): every key keeps
    every version with its validity window in LWW ``(seq, off)`` order,
    maintained incrementally by pruned timeline recompute through the
    same post_apply seam as the other derived tables.  Three generations
    applied THROUGH the real history table exercise the hard cases: a
    seed, a later batch with re-ingests + deletes, then a LATE batch
    (seq 3 arriving after seq 5) whose versions must slot mid-timeline —
    closing the seed's windows and being closed by the already-stored
    seq-5 versions.  Oracle: DuckDB recomputes the definitional
    ``lead() OVER (PARTITION BY key ORDER BY seq, off)`` from the same
    event set.  Payload columns are named ``langid``/``body`` so the
    engine's lang normalization stays out of the comparison (the
    normalization-coupled spelling is pytest-verified in
    tests/test_scd2.py)."""
    import tempfile

    from pyspark.sql import types as T

    from glad_tiles_pipeline_spark.operators.scd2 import (
        create_scd2_history,
        read_scd2,
        refresh_scd2,
    )

    docs = _t(spark, sf_dir, "documents")
    payload = ["langid", "body"]
    root = tempfile.mkdtemp(prefix="scd2_")
    history = create_scd2_history(
        root + "/h",
        [("langid", T.StringType()), ("body", T.StringType())],
        n_buckets=8,
    )

    def _ev(df, seq, op, off_base, body_col):
        return df.select(
            (F.lit(off_base) + F.col("doc_id")).cast("long").alias("offset"),
            F.lit(seq).cast("long").alias("commit_seq"),
            F.lit(op).alias("op"),
            F.lit("docs").alias("repo"),
            F.format_string("%012d", F.col("doc_id")).alias("path"),
            F.col("lang").alias("langid"),
            body_col.alias("body"),
            F.lit(None).cast("string").alias("control"),
        )

    gens = [
        # seed: every document at seq 1
        _ev(docs, 1, "U", 0, F.col("text")),
        # seq 5: re-ingest %10==0 with new content, delete %13==5 (the
        # overlap — %10==0 AND %13==5 — gets BOTH, U then D by offset)
        _ev(docs.filter(F.col("doc_id") % 10 == 0), 5, "U", 10**9,
            F.concat(F.col("text"), F.lit(" v5"))).unionByName(
            _ev(docs.filter(F.col("doc_id") % 13 == 5), 5, "D",
                15 * 10**8, F.lit(None).cast("string"))
        ),
        # LATE batch: seq 3 arrives after seq 5 — its versions must split
        # the stored windows in place (%17==2 keys gain a mid-timeline
        # version even when untouched at seq 5)
        _ev(docs.filter(F.col("doc_id") % 10 == 0), 3, "U", 2 * 10**9,
            F.concat(F.col("text"), F.lit(" v3"))).unionByName(
            _ev(docs.filter(F.col("doc_id") % 17 == 2), 3, "U",
                25 * 10**8, F.concat(F.col("text"), F.lit(" x3")))
        ),
    ]
    for i, ev in enumerate(gens):
        refresh_scd2(spark, history, ev, payload, f"scd2-gen{i}",
                     offsets={"lo": i * 10**9, "hi": (i + 1) * 10**9 - 1})
    return (
        read_scd2(spark, history)
        .select("rpath", "v_seq", "v_off", "langid", "body",
                "valid_to_seq", "valid_to_off", "is_current")
        .orderBy("rpath", "v_seq", "v_off")
    )


def q_scd2_as_of(spark, sf_dir):
    """Point-in-time read from the SCD2 history alone
    (operators/scd2.py::scd2_as_of): the version of every key visible at
    LWW instant (seq=4) — AFTER the late seq-3 arrivals, BEFORE the seq-5
    re-ingests and deletes — answered by window containment over the
    stored validity columns, no log replay and no snapshot.  The history
    is built in ONE refresh here (multi-batch maintenance is covered by
    ``scd2_history`` and tests/test_scd2.py); the oracle recomputes the
    same windows and the same containment filter declaratively."""
    import tempfile

    from pyspark.sql import types as T

    from glad_tiles_pipeline_spark.operators.scd2 import (
        create_scd2_history,
        refresh_scd2,
        scd2_as_of,
    )

    docs = _t(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="scd2asof_")
    history = create_scd2_history(
        root + "/h",
        [("langid", T.StringType()), ("body", T.StringType())],
        n_buckets=8,
    )

    def _ev(df, seq, op, off_base, body_col):
        return df.select(
            (F.lit(off_base) + F.col("doc_id")).cast("long").alias("offset"),
            F.lit(seq).cast("long").alias("commit_seq"),
            F.lit(op).alias("op"),
            F.lit("docs").alias("repo"),
            F.format_string("%012d", F.col("doc_id")).alias("path"),
            F.col("lang").alias("langid"),
            body_col.alias("body"),
            F.lit(None).cast("string").alias("control"),
        )

    ev = (
        _ev(docs, 1, "U", 0, F.col("text"))
        .unionByName(_ev(docs.filter(F.col("doc_id") % 10 == 0), 5, "U",
                         10**9, F.concat(F.col("text"), F.lit(" v5"))))
        .unionByName(_ev(docs.filter(F.col("doc_id") % 13 == 5), 5, "D",
                         15 * 10**8, F.lit(None).cast("string")))
        .unionByName(_ev(docs.filter(F.col("doc_id") % 10 == 0), 3, "U",
                         2 * 10**9, F.concat(F.col("text"), F.lit(" v3"))))
    )
    refresh_scd2(spark, history, ev, ["langid", "body"], "all",
                 offsets={"lo": 0, "hi": 3 * 10**9})
    return (
        scd2_as_of(spark, history, 4)
        .select("rpath", "v_seq", "v_off", "langid", "body")
        .orderBy("rpath")
    )


def q_constraints_quarantine(spark, sf_dir):
    """Declarative CHECK constraints (operators/constraints.py, X14 — the
    DLT-expectation parity surface): events violating any named predicate
    are diverted to a replay-safe quarantine instead of poisoning the
    MERGE.  This query runs the SPLIT itself (the SQL-expressible core —
    the ingest/stream integration and replay-overwrite contract are
    pytest-verified in tests/test_constraints.py) and returns the
    violators with the sorted list of every constraint each one failed.
    NULL predicate results pass (SQL CHECK) and a delete's NULL content
    must not trip the length check — both exercised by the fixture."""
    from glad_tiles_pipeline_spark.operators.constraints import (
        split_by_constraints,
    )

    docs = _t(spark, sf_dir, "documents")
    events = docs.select(
        F.col("doc_id").cast("long").alias("offset"),
        F.when(F.col("doc_id") % 10 == 0, "D").otherwise("U").alias("op"),
        F.lit("docs").alias("repo"),
        F.format_string("%012d", F.col("doc_id")).alias("path"),
        F.when(F.col("doc_id") % 10 != 0, F.col("text")).alias("content"),
        F.lit(None).cast("string").alias("control"),
    )
    constraints = {
        "short_enough": "length(content) <= 306",
        "no_lucky_docs": "offset % 13 <> 5",
        "delete_has_no_content": "op <> 'D' OR content IS NULL",
    }
    _, bad = split_by_constraints(events, constraints)
    return bad.select(
        "offset", "op",
        F.concat_ws(",", F.col("violations")).alias("violations"),
    ).orderBy("offset")


def q_dedup_embedding(spark, sf_dir):
    """Banded-LSH candidates + exact-cosine verify; threshold 0.45 sits just
    inside the fixtures' similarity range (14 pairs at sf0.01) so the oracle
    row is non-vacuous.  Recall at this radius is measured 1.0 and asserted
    by tests/test_similarity_recall.py."""
    return embedding_neardup(
        _t(spark, sf_dir, "embeddings"), threshold=0.45, dim=64, n_bands=16
    )


# --------------------------------------------------------------- similarity
def q_ann_bruteforce(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_bruteforce_topk(emb, queries, k=5)


def q_ann_lsh(spark, sf_dir):
    """Oracle: the brute-force twin (_ANN_SQL).  The LSH stage only
    proposes candidates; ranking is exact cosine, so whenever recall@k is
    1.0 — measured and equality-asserted at the driver operating point by
    tests/test_similarity_recall.py::test_ann_lsh_equals_bruteforce_at_driver_sf
    — the top-k output is independent of the hash internals and DuckDB's
    brute-force reproduces it exactly."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_lsh_topk(emb, queries, dim=64, k=5, n_bands=16, rows_per_band=2)


def q_ann_ivf(spark, sf_dir):
    """IVF-Flat partition-pruned ANN: deterministic centroids (lowest 16
    ids) make the whole index SQL-expressible, so the oracle recomputes the
    SAME approximate algorithm (not brute force) — assignment, probe, and
    ranking all checked.  Recall@5 vs brute force is 0.92 at this operating
    point, measured in tests/test_similarity_recall.py."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries, dim=64, k=5, n_cells=16, nprobe=4)


def q_ann_ivf_trained(spark, sf_dir):
    """IVF-Flat with TRAINED centroids: 2 deterministic Lloyd's iterations
    (fixed-point integer sums make the distributed mean engine- and
    partitioning-independent) from the id-ordered seeds, then the same
    partition-pruned search.  The oracle recomputes the entire training
    loop in SQL (_IVF_TRAINED_SQL), so assignment, probe, and ranking are
    checked against the trained geometry — the k-means seam the untrained
    ``ann_ivf_topk`` docstring promised, closed."""
    from glad_tiles_pipeline_spark.operators.similarity import train_ivf_centroids

    emb = _t(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, dim=64, n_cells=16, n_iters=2)
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(
        emb, queries, dim=64, k=5, n_cells=16, nprobe=4, centroids=cents
    )


# --------------------------------------------------------------- multimodal
def q_multimodal_decode(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return decode_stub_features(to_media_table(docs))


def q_multimodal_frames(spark, sf_dir):
    """Video-style frame sampling: explode each payload into 4 byte-range
    'frames' (the fan-out shape real frame extraction takes); stub slices
    are deterministic so DuckDB reproduces them exactly."""
    from glad_tiles_pipeline_spark.operators.multimodal import frame_sample

    docs = _t(spark, sf_dir, "documents")
    return frame_sample(to_media_table(docs), n_frames=4)


# ===========================================================================
# DuckDB oracle SQL — one entry per query above (SURVEY.md §5.1).  Every
# driver query has a full oracle as of round 4: the LSH-family outputs are
# post-exact-verify with measured-and-asserted recall 1.0 at the driver
# operating point, so their exact twins are valid oracles, and dedup_simhash
# uses the sha256 token-hash spelling DuckDB recomputes bit-for-bit.
# ===========================================================================

_QUALITY_SQL = r"""
SELECT doc_id, round(
  least(len(text)/500.0, 1.0) * 0.4 +
  least(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        w -> w IN ('the','a','and','of','to','in','is','it','for','on')))::DOUBLE
        / greatest(len(string_split_regex(lower(trim(text)), '\s+'))::DOUBLE, 1.0) * 5.0,
        1.0) * 0.4 +
  (1.0 - least(len(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
               / greatest(len(text)::DOUBLE, 1.0) * 10.0, 1.0)) * 0.2,
  6) AS quality
FROM documents
"""

_LANGID_SQL = r"""
SELECT doc_id, CASE
  WHEN en >= de AND en >= es AND en > 0 THEN 'en'
  WHEN de >= es AND de > 0 THEN 'de'
  WHEN es > 0 THEN 'es'
  ELSE 'unknown' END AS lang_pred
FROM (
  SELECT doc_id,
    len(list_filter(words, x -> x IN ('the','and','of','is','to')))::DOUBLE AS en,
    len(list_filter(words, x -> x IN ('der','die','und','ist','das')))::DOUBLE AS de,
    len(list_filter(words, x -> x IN ('el','la','los','es','que')))::DOUBLE AS es
  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS words FROM documents)
)
"""

# Exact twin of q_decontaminate: same shingle definition as _NGRAM_SQL,
# same benchmark split (doc_id % 101), same min-hits HAVING.
_DECON_SQL = r"""
WITH s AS (
  SELECT doc_id,
    list_distinct(list_transform(
      range(1, greatest(len(toks) - 2, 1) + 1),
      i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents)
),
c AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle
      FROM s WHERE doc_id % 101 <> 0),
b AS (SELECT doc_id AS bench_id, unnest(sh) AS shingle
      FROM s WHERE doc_id % 101 = 0)
SELECT c.doc_id, b.bench_id, CAST(count(*) AS INT) AS n_hits,
       round(count(*)::DOUBLE / c.n_sh, 6) AS overlap
FROM c JOIN b USING (shingle)
GROUP BY c.doc_id, b.bench_id, c.n_sh
HAVING count(*) >= 2
"""

_STRAT_SAMPLE_SQL = r"""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
             ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents)
WHERE rk <= 20
"""

_HASH_SAMPLE_SQL = r"""
SELECT doc_id, lang FROM documents
WHERE CAST(concat('0x', substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))
           AS UBIGINT)::DOUBLE / 4294967296.0 < 0.1
"""

_NGRAM_SQL = r"""
WITH s AS (
  SELECT doc_id, n_chars,
    list_distinct(list_transform(
      range(1, greatest(len(toks) - 2, 1) + 1),
      i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, n_chars,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents)
),
k AS (  -- two shifted length grids of width 32 (operators/docs.py)
  SELECT doc_id, 0 AS g, CAST(floor(n_chars / 32) AS BIGINT) AS cell FROM s
  UNION ALL
  SELECT doc_id, 1 AS g, CAST(floor((n_chars + 16) / 32) AS BIGINT) AS cell FROM s
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM k a JOIN k b ON a.g = b.g AND a.cell = b.cell AND a.doc_id < b.doc_id
)
SELECT * FROM (
  SELECT c.id_a, c.id_b,
         round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
               / len(list_distinct(sa.sh || sb.sh))::DOUBLE, 6) AS jaccard
  FROM cand c JOIN s sa ON sa.doc_id = c.id_a
              JOIN s sb ON sb.doc_id = c.id_b
) WHERE jaccard >= 0.5
"""

# Exact all-pairs twin for dedup_minhash_lsh: the Spark output is post-
# exact-Jaccard-verify, and candidate recall is 1.0 at the driver operating
# point (equality-asserted in tests/test_similarity_recall.py), so all-pairs
# Jaccard over the same 3-token shingles IS its exact oracle.
_MINHASH_SQL = r"""
WITH s AS (
  SELECT doc_id,
    list_distinct(list_transform(
      range(1, greatest(len(toks) - 2, 1) + 1),
      i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents)
)
SELECT * FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(a.sh || b.sh))::DOUBLE, 6) AS jaccard
  FROM s a JOIN s b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.5
"""

# Bit-for-bit sha256-token SimHash twin (operators/docs.py::simhash32 with
# token_hash='sha256'): per-token hash = low 32 bits of the sha256 hex
# prefix, count_i = Σ(bit_i ? +1 : -1), sig bit i set iff count_i > 0;
# pairs at hamming ≤ 3 over the full 32-bit signatures.
_SIMHASH_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
  FROM documents WHERE text IS NOT NULL
),
h AS (
  SELECT doc_id, CAST(('0x' || substr(sha256(t), 1, 8)) AS BIGINT) AS hv
  FROM tok
),
bits AS (
  SELECT doc_id, i,
         sum(CASE WHEN (hv >> CAST(i AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
  FROM h, range(0, 32) r(i) GROUP BY doc_id, i
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN cnt > 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                  ELSE 0 END) AS sig
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.sig, b.sig)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""

_COS = ("list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))")

_EMB_NEARDUP_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT id_a, id_b, round(sim0, 6) AS sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_COS.format(a='a.v', b='b.v')} AS sim0
  FROM e a JOIN e b ON a.vec_id < b.vec_id
) WHERE sim0 >= 0.45
"""

_ANN_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS.format(a='q.v', b='c.v')} AS sim0
  FROM e q, e c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
SELECT query_id, neighbor_id, round(sim0, 6) AS sim, CAST(rnk AS INT) AS "rank"
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim0 DESC, neighbor_id) AS rnk
      FROM scored)
WHERE rnk <= 5
"""

def _lloyd_iter_sql(prev: str, nxt: str) -> str:
    """One deterministic Lloyd's iteration as SQL CTEs: assign by cosine
    (ties by cid asc, matching the numpy lexsort), then per-(cell, dim)
    FIXED-POINT integer sums (floor(x·2^20) — exact: float32→double is
    lossless and power-of-two scaling never rounds), mean = (s/cnt)/2^20
    in double.  Integer sums are associative, so the centroid doubles are
    bit-identical to train_ivf_centroids regardless of engine or
    partitioning (operators/similarity.py)."""
    return f"""
a_{nxt} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_COS.format(a='e.v', b='c.cv')} DESC, c.cid) AS rn
    FROM e, {prev} c) WHERE rn = 1),
s_{nxt} AS (
  SELECT a.cid, r.i,
         sum(CAST(floor(e.v[CAST(r.i AS INT) + 1] * 1048576.0) AS BIGINT)) AS s,
         count(*) AS cnt
  FROM a_{nxt} a JOIN e USING (vec_id), range(0, 64) r(i)
  GROUP BY a.cid, r.i),
{nxt} AS (
  SELECT cid, list(CAST(s AS DOUBLE) / cnt / 1048576.0 ORDER BY i) AS cv
  FROM s_{nxt} GROUP BY cid
  UNION ALL
  SELECT cid, cv FROM {prev}
  WHERE cid NOT IN (SELECT cid FROM s_{nxt}))"""


# Trained-IVF twin: DuckDB recomputes the seeds, BOTH Lloyd's iterations,
# the final assignment, probe, and exact-cosine ranking — the oracle covers
# the training loop itself, not just the search.
_IVF_TRAINED_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           WHERE embedding IS NOT NULL AND len(embedding) = 64
             AND list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])) > 0),
cent0 AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 16),
{_lloyd_iter_sql('cent0', 'cent1')},
{_lloyd_iter_sql('cent1', 'cent2')},
assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_COS.format(a='e.v', b='c.cv')} DESC, c.cid) AS rn
    FROM e, cent2 c) WHERE rn = 1),
probe AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_COS.format(a='e.v', b='c.cv')} DESC, c.cid) AS rn
    FROM e, cent2 c WHERE e.vec_id < 10) WHERE rn <= 4),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_COS.format(a='q.v', b='c.v')} AS sim0
  FROM probe p JOIN assign a USING (cid)
  JOIN e q ON q.vec_id = p.query_id
  JOIN e c ON c.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id)
SELECT query_id, neighbor_id, round(sim0, 6) AS sim, CAST(rnk AS INT) AS "rank"
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim0 DESC, neighbor_id) AS rnk
      FROM scored)
WHERE rnk <= 5
"""

# Full algorithm twin of ivf_topk (n_cells=16, nprobe=4): deterministic
# centroids = the 16 lowest vec_ids, so DuckDB recomputes assignment,
# probe, and exact-cosine ranking — the oracle checks the APPROXIMATE
# output itself, not a brute-force stand-in.
_IVF_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 16),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, cent.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_COS.format(a='e.v', b='cent.cv')} DESC, cent.cid) AS rn
    FROM e, cent) WHERE rn = 1),
probe AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT e.vec_id, cent.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_COS.format(a='e.v', b='cent.cv')} DESC, cent.cid) AS rn
    FROM e, cent WHERE e.vec_id < 10) WHERE rn <= 4),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_COS.format(a='q.v', b='c.v')} AS sim0
  FROM probe p JOIN assign a USING (cid)
  JOIN e q ON q.vec_id = p.query_id
  JOIN e c ON c.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id)
SELECT query_id, neighbor_id, round(sim0, 6) AS sim, CAST(rnk AS INT) AS "rank"
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim0 DESC, neighbor_id) AS rnk
      FROM scored)
WHERE rnk <= 5
"""

from glad_tiles_pipeline_spark.functions.text import normalize_lang_sql as _nls  # noqa: E402

# Shared by text_chunk_windows and (as the input CTE) text_pack_greedy.
# coalesce: NULL text canonicalizes to '' (both chunking twins do the same).
_CHUNK_SQL = r"""
        WITH t AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS toks,
                 greatest(len(string_split_regex(lower(trim(coalesce(text, ''))), '\s+')), 1) AS n
          FROM documents),
        w AS (
          SELECT doc_id, toks,
                 CAST(unnest(range(0, greatest(
                     CAST(ceil((n - 24) / 16.0) AS INT) + 1, 1))) AS INT)
                   AS chunk_idx
          FROM t)
        SELECT doc_id, chunk_idx,
               len(toks[chunk_idx * 16 + 1 : chunk_idx * 16 + 24]) AS n_tokens,
               array_to_string(toks[chunk_idx * 16 + 1 : chunk_idx * 16 + 24], ' ')
                 AS chunk_text
        FROM w"""

_ALL_ORACLES: dict[str, str] = {
    "lww_dedup_window": LWW_SQL,
    "lww_dedup_argmax": LWW_SQL,
    "lww_dedup_semijoin": LWW_SQL,
    "flagship_cdc_enrich": FLAGSHIP_SQL,
    "window_rank_top3": """
        SELECT n_name, c_custkey, c_acctbal, CAST(rnk AS INT) AS rnk FROM (
          SELECT n.n_name, c.c_custkey, c.c_acctbal,
                 row_number() OVER (PARTITION BY n.n_name
                                    ORDER BY c.c_acctbal DESC, c.c_custkey) AS rnk
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        ) WHERE rnk <= 3""",
    "window_lag_delta": """
        SELECT event_id, user_id,
               round(value - lag(value) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id), 6) AS delta
        FROM events""",
    "window_running_sum": """
        SELECT event_id, user_id,
               CAST(round(sum(CAST(value AS DECIMAL(18,2))) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
               AS running_value
        FROM events""",
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
    "agg_distinct_users": """
        SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        FROM events GROUP BY event_type""",
    "agg_percentiles": """
        SELECT c_mktsegment,
               round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
               round(quantile_cont(c_acctbal, 0.9), 4) AS p90,
               count(*) AS n
        FROM customer GROUP BY c_mktsegment""",
    "agg_rollup_region_nation": """
        SELECT r.r_name, n.n_name, count(*) AS n_customers
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP(r.r_name, n.n_name)""",
    "agg_collect_nations": """
        SELECT r.r_name,
               array_to_string(list_sort(list(n.n_name)), '|') AS nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name""",
    "join_broadcast_dims": """
        SELECT r.r_name, count(*) AS n_customers,
               CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name""",
    "join_sortmerge_revenue": """
        SELECT o.o_orderstatus,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderstatus""",
    "join_semi_with_orders": """
        SELECT c_mktsegment, count(*) AS n_customers FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment""",
    "join_anti_without_orders": """
        SELECT c_mktsegment, count(*) AS n_customers, min(c_custkey) AS min_custkey
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment""",
    "join_outer_order_histogram": """
        SELECT n_orders, count(*) AS n_customers FROM (
          SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey)
        GROUP BY n_orders""",
    "join_range_value_buckets": """
        SELECT r.r_name, count(*) AS n_events
        FROM events e JOIN region r
          ON e.value >= r.r_regionkey * 50 AND e.value < (r.r_regionkey + 1) * 50
        GROUP BY r.r_name""",
    "join_range_binned": """
        SELECT r.r_name, count(*) AS n_events
        FROM events e JOIN region r
          ON e.value >= r.r_regionkey * 50 AND e.value < (r.r_regionkey + 1) * 50
        GROUP BY r.r_name""",
    "join_asof_latest_order": """
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
        FROM events e LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        QUALIFY row_number() OVER (
          PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST) = 1""",
    "join_skew_salted": """
        SELECT o.o_orderpriority,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
               count(*) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority""",
    "join_shuffle_hash": """
        SELECT o.o_orderpriority,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
               count(*) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority""",
    "join_cross_pairs": """
        SELECT r.r_name, count(*) AS n_pairs,
               CAST(sum(CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END) AS BIGINT) AS n_members
        FROM region r CROSS JOIN nation n
        GROUP BY r.r_name""",
    "join_right_outer_counts": """
        SELECT c.c_mktsegment, count(o.o_orderkey) AS n_orders,
               count(DISTINCT c.c_custkey) AS n_customers
        FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment""",
    "join_full_outer_counts": """
        SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
               COALESCE(c.n_customers, 0) AS n_customers,
               COALESCE(s.n_suppliers, 0) AS n_suppliers
        FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers
              FROM customer WHERE c_nationkey < 13 GROUP BY 1) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
              FROM supplier WHERE s_nationkey >= 12 GROUP BY 1) s
        USING (nationkey)""",
    "window_rank_family": """
        SELECT c_mktsegment, c_custkey, CAST(rnk AS INT) AS rnk,
               CAST(drnk AS INT) AS drnk, CAST(quartile AS INT) AS quartile
        FROM (
          SELECT c_mktsegment, c_custkey,
                 rank() OVER (PARTITION BY c_mktsegment
                              ORDER BY round(c_acctbal, -2) DESC) AS rnk,
                 dense_rank() OVER (PARTITION BY c_mktsegment
                                    ORDER BY round(c_acctbal, -2) DESC) AS drnk,
                 ntile(4) OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS quartile
          FROM customer
        ) WHERE rnk <= 10""",
    "sort_limit_offset": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        ORDER BY c_acctbal DESC, c_custkey LIMIT 10 OFFSET 10""",
    "agg_approx_distinct": """
        SELECT event_type, count(DISTINCT user_id) AS n_users,
               TRUE AS approx_within_5pct
        FROM events GROUP BY event_type""",
    "agg_cube_status_priority": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "fn_from_json_props": """
        -- ((k % 7) + 7) % 7 == Spark's pmod: DuckDB % preserves sign, so the
        -- two sides must agree even if the fixture ever emits negative k
        SELECT ((CAST(json_extract_string(props, '$.k') AS INTEGER) % 7) + 7) % 7
                 AS k_mod7,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY 1""",
    "fn_json_roundtrip": """
        SELECT rebuilt, count(*) AS n, 'STRUCT<k: BIGINT>' AS props_schema
        FROM (
          SELECT to_json(struct_pack(
                   k := CAST(json_extract_string(props, '$.k') AS INTEGER),
                   et := event_type))::VARCHAR AS rebuilt
          FROM events)
        GROUP BY rebuilt""",
    "setop_except_custkeys": """
        SELECT o_custkey FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
        EXCEPT
        SELECT o_custkey FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')""",
    "setop_intersect_nations": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier""",
    "union_by_name_counts": """
        SELECT event_type, count(*) AS n,
               CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type""",
    "fn_json_extract": """
        -- pmod-equivalent, same reasoning as fn_from_json_props (ADVICE r2)
        SELECT ((CAST(json_extract_string(props, '$.k') AS INTEGER) % 10) + 10) % 10
                 AS k_mod,
               count(*) AS n
        FROM events GROUP BY 1""",
    "fn_date_trunc": """
        SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
        FROM events GROUP BY 1, 2""",
    "fn_map_props": """
        SELECT event_type AS et,
               CASE WHEN value >= 100 THEN 'hi' ELSE 'lo' END AS sign,
               2 AS n_keys, count(*) AS n
        FROM events GROUP BY 1, 2, 3""",
    "agg_pivot_status": """
        SELECT o_orderpriority,
               count(*) FILTER (o_orderstatus = 'F') AS n_f,
               count(*) FILTER (o_orderstatus = 'O') AS n_o,
               count(*) FILTER (o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY 1""",
    "agg_unpivot_status": """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n_orders
        FROM orders GROUP BY 1, 2""",
    "text_chunk_windows": _CHUNK_SQL,
    "text_pack_greedy": f"""
        WITH RECURSIVE chunks AS ({_CHUNK_SQL}),
        pack AS (
          SELECT doc_id, chunk_idx, n_tokens, 0 AS bin_idx,
                 n_tokens AS fill
          FROM chunks WHERE chunk_idx = 0
          UNION ALL
          SELECT c.doc_id, c.chunk_idx, c.n_tokens,
                 CASE WHEN p.fill + c.n_tokens > 64
                      THEN p.bin_idx + 1 ELSE p.bin_idx END,
                 CASE WHEN p.fill + c.n_tokens > 64
                      THEN c.n_tokens ELSE p.fill + c.n_tokens END
          FROM chunks c
          JOIN pack p ON c.doc_id = p.doc_id AND c.chunk_idx = p.chunk_idx + 1
        )
        SELECT doc_id, chunk_idx, n_tokens, CAST(bin_idx AS INT) AS bin_idx
        FROM pack""",
    "text_pack_global": f"""
        WITH RECURSIVE chunks AS ({_CHUNK_SQL}),
        seq AS (
          SELECT CAST(doc_id % 4 AS INT) AS shard, doc_id, chunk_idx,
                 n_tokens,
                 row_number() OVER (PARTITION BY doc_id % 4
                                    ORDER BY doc_id, chunk_idx) AS rn
          FROM chunks),
        pack AS (
          SELECT shard, doc_id, chunk_idx, n_tokens, rn,
                 0 AS bin_idx, n_tokens AS fill
          FROM seq WHERE rn = 1
          UNION ALL
          SELECT s.shard, s.doc_id, s.chunk_idx, s.n_tokens, s.rn,
                 CASE WHEN p.fill + s.n_tokens > 64
                      THEN p.bin_idx + 1 ELSE p.bin_idx END,
                 CASE WHEN p.fill + s.n_tokens > 64
                      THEN s.n_tokens ELSE p.fill + s.n_tokens END
          FROM seq s
          JOIN pack p ON s.shard = p.shard AND s.rn = p.rn + 1
        )
        SELECT shard, doc_id, chunk_idx, n_tokens,
               CAST(bin_idx AS INT) AS bin_idx
        FROM pack""",
    "fn_sha256_docs": "SELECT doc_id, sha256(text) AS text_sha FROM documents",
    "fn_lang_normalize": f"""
        SELECT {_nls('lang')} AS lang, count(*) AS n_docs
        FROM documents GROUP BY 1""",
    "fn_lang_normalize_iter": f"""
        SELECT {_nls('lang')} AS lang, count(*) AS n_docs
        FROM documents GROUP BY 1""",
    "stream_tumbling_counts": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
               count(*) AS n
        FROM events GROUP BY 1, 2""",
    "stream_sliding_counts": """
        -- each event belongs to the two 2h windows starting at
        -- bucket(ts)-1h and bucket(ts): fan out explicitly
        SELECT time_bucket(INTERVAL '1 hour', ts)
                 - CAST(k AS INT) * INTERVAL '1 hour' AS win_start,
               event_type, count(*) AS n
        FROM events, range(0, 2) r(k)
        GROUP BY 1, 2""",
    "stream_session_windows": """
        WITH gaps AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS brk
            FROM events),
        sess AS (
            SELECT user_id, ts,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM gaps)
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM sess GROUP BY user_id, sid""",
    "source_csv_roundtrip": """
        SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_nation
        FROM nation GROUP BY n_regionkey""",
    "agg_grouped_pandas": """
        SELECT c_nationkey, count(*) AS n_customers,
               quantile_disc(c_acctbal, 0.5) AS median_acctbal
        FROM customer GROUP BY c_nationkey""",
    "text_token_counts": r"""
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens_bpe
        FROM documents""",
    "text_quality_score": _QUALITY_SQL,
    "text_lang_id": _LANGID_SQL,
    "text_fingerprint": r"""
        SELECT doc_id,
               sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        FROM documents""",
    "dedup_exact": r"""
        SELECT sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1""",
    "dedup_ngram_jaccard": _NGRAM_SQL,
    "dedup_minhash_lsh": _MINHASH_SQL,
    "dedup_simhash": _SIMHASH_SQL,
    # incremental twins: the same exact recomputes, restricted to pairs
    # touching the batch (doc_id % 7 == 3) — the equivalence the persisted
    # signature index must reproduce (tests/test_incremental_dedup.py)
    "dedup_minhash_incremental": (
        f"SELECT * FROM ({_MINHASH_SQL}) WHERE id_a % 7 = 3 OR id_b % 7 = 3"
    ),
    "dedup_simhash_incremental": (
        f"SELECT * FROM ({_SIMHASH_SQL}) WHERE id_a % 7 = 3 OR id_b % 7 = 3"
    ),
    # definitional recompute of the inverted-index search: tokenize the
    # LIVE corpus (post re-ingest of %10==0 docs with ' spark extra'
    # appended, post delete of %13==5 docs) with the same [a-z0-9]+ class
    "text_search_terms": """
        WITH live AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 10 = 0 THEN text || ' spark extra'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 13 <> 5),
        toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
            FROM live)
        SELECT term, doc_id, count(*) AS tf
        FROM toks WHERE term IN ('merge', 'spark', 'vector')
        GROUP BY term, doc_id""",
    # full BM25 recompute from the live corpus (same live/tokenize CTEs as
    # text_search_terms; k1=1.2, b=0.75; score rounded to 6, ties by doc_id)
    "text_search_bm25": """
        WITH live AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 10 = 0 THEN text || ' spark extra'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 13 <> 5),
        toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
            FROM live),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM toks
            WHERE term IN ('merge', 'spark', 'vector') GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        w AS (
            SELECT tf.doc_id, tf.tf,
                   ln((n - df + 0.5) / (df + 0.5) + 1.0)
                   * tf * (1.2 + 1.0)
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS w
            FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
            CROSS JOIN stats),
        ds AS (
            SELECT doc_id, round(sum(w), 6) AS score,
                   CAST(sum(tf) AS BIGINT) AS total_tf
            FROM w GROUP BY 1)
        SELECT doc_id, score, total_tf FROM ds
        ORDER BY score DESC, doc_id LIMIT 25""",
    # definitional recompute of the CHECK-constraint split: violators =
    # rows where any predicate is FALSE (NULL passes — note deletes carry
    # NULL content, so length() is NULL there and short_enough passes);
    # each violator lists every failed constraint, sorted by name
    "constraints_quarantine": """
        WITH ev AS (
            SELECT CAST(doc_id AS BIGINT) AS "offset",
                   CASE WHEN doc_id % 10 = 0 THEN 'D' ELSE 'U' END AS op,
                   CASE WHEN doc_id % 10 <> 0 THEN text END AS content
            FROM documents),
        flagged AS (
            SELECT "offset", op,
                   list_aggregate(list_filter([
                       CASE WHEN NOT coalesce(op <> 'D' OR content IS NULL,
                                              TRUE)
                            THEN 'delete_has_no_content' END,
                       CASE WHEN NOT coalesce("offset" % 13 <> 5, TRUE)
                            THEN 'no_lucky_docs' END,
                       CASE WHEN NOT coalesce(length(content) <= 306, TRUE)
                            THEN 'short_enough' END
                   ], x -> x IS NOT NULL), 'string_agg', ',') AS violations
            FROM ev)
        SELECT "offset", op, violations FROM flagged
        WHERE violations IS NOT NULL AND violations <> ''
        ORDER BY "offset" """,
    # definitional recompute of the materialized view: the final live
    # corpus state (post re-ingest of %10==0 docs with ' extra' appended,
    # post delete of %13==5 docs and of the whole %7==3 group) aggregated
    # by group — the view maintained by pruned group recompute must equal
    # this full GROUP BY, including the ABSENCE of the tombstoned group
    "matview_repo_stats": """
        WITH live AS (
            SELECT 'r' || CAST(doc_id % 7 AS VARCHAR) AS grp,
                   lang AS langid,
                   text || CASE WHEN doc_id % 10 = 0 THEN ' extra'
                                ELSE '' END AS body
            FROM documents
            WHERE doc_id % 13 <> 5 AND doc_id % 7 <> 3)
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n_paths,
               CAST(sum(length(body)) AS BIGINT) AS total_chars,
               CAST(count(DISTINCT langid) AS BIGINT) AS n_langs
        FROM live GROUP BY grp ORDER BY grp""",
    # definitional SCD2 recompute: the same five event generations (seed,
    # seq-5 re-ingest + delete, LATE seq-3 arrivals) windowed by
    # lead() OVER (PARTITION BY key ORDER BY seq, off) — delete markers
    # close windows but never appear as versions
    "scd2_history": """
        WITH ev AS (
            SELECT CAST(doc_id AS BIGINT) AS v_off,
                   CAST(1 AS BIGINT) AS v_seq, 'U' AS op,
                   lpad(CAST(doc_id AS VARCHAR), 12, '0') AS rpath,
                   lang AS langid, text AS body
            FROM documents
            UNION ALL
            SELECT CAST(1000000000 + doc_id AS BIGINT), 5, 'U',
                   lpad(CAST(doc_id AS VARCHAR), 12, '0'),
                   lang, text || ' v5'
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT CAST(1500000000 + doc_id AS BIGINT), 5, 'D',
                   lpad(CAST(doc_id AS VARCHAR), 12, '0'),
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM documents WHERE doc_id % 13 = 5
            UNION ALL
            SELECT CAST(2000000000 + doc_id AS BIGINT), 3, 'U',
                   lpad(CAST(doc_id AS VARCHAR), 12, '0'),
                   lang, text || ' v3'
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT CAST(2500000000 + doc_id AS BIGINT), 3, 'U',
                   lpad(CAST(doc_id AS VARCHAR), 12, '0'),
                   lang, text || ' x3'
            FROM documents WHERE doc_id % 17 = 2),
        win AS (
            SELECT *,
                   lead(v_seq) OVER w AS valid_to_seq,
                   lead(v_off) OVER w AS valid_to_off,
                   (lead(v_seq) OVER w IS NULL AND op <> 'D') AS is_current
            FROM ev WINDOW w AS (PARTITION BY rpath ORDER BY v_seq, v_off))
        SELECT rpath, v_seq, v_off, langid, body,
               valid_to_seq, valid_to_off, is_current
        FROM win WHERE op <> 'D'
        ORDER BY rpath, v_seq, v_off""",
    # point-in-time containment at instant seq=4: the latest version at or
    # before 4, not closed at or before 4 (no events carry seq 4, so the
    # off component of the instant cannot discriminate)
    "scd2_as_of": """
        WITH ev AS (
            SELECT CAST(doc_id AS BIGINT) AS v_off,
                   CAST(1 AS BIGINT) AS v_seq, 'U' AS op,
                   lpad(CAST(doc_id AS VARCHAR), 12, '0') AS rpath,
                   lang AS langid, text AS body
            FROM documents
            UNION ALL
            SELECT CAST(1000000000 + doc_id AS BIGINT), 5, 'U',
                   lpad(CAST(doc_id AS VARCHAR), 12, '0'),
                   lang, text || ' v5'
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT CAST(1500000000 + doc_id AS BIGINT), 5, 'D',
                   lpad(CAST(doc_id AS VARCHAR), 12, '0'),
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM documents WHERE doc_id % 13 = 5
            UNION ALL
            SELECT CAST(2000000000 + doc_id AS BIGINT), 3, 'U',
                   lpad(CAST(doc_id AS VARCHAR), 12, '0'),
                   lang, text || ' v3'
            FROM documents WHERE doc_id % 10 = 0),
        win AS (
            SELECT *, lead(v_seq) OVER w AS valid_to_seq
            FROM ev WINDOW w AS (PARTITION BY rpath ORDER BY v_seq, v_off))
        SELECT rpath, v_seq, v_off, langid, body
        FROM win
        WHERE op <> 'D' AND v_seq <= 4
          AND (valid_to_seq IS NULL OR valid_to_seq > 4)
        ORDER BY rpath""",
    # the same MERGE recomputed declaratively: matched rows delete when
    # n_chars % 7 = 0 (clause precedence), update when % 3 <> 1 (else
    # untouched), source-only rows insert when % 5 <> 2
    "merge_into_upsert": """
        WITH tgt AS (
            SELECT 'docs' AS corpus,
                   lpad(CAST(doc_id AS VARCHAR), 12, '0') AS doc_id,
                   lang AS langid, n_chars
            FROM documents WHERE doc_id % 3 <> 0),
        src AS (
            SELECT 'docs' AS corpus,
                   lpad(CAST(doc_id AS VARCHAR), 12, '0') AS doc_id,
                   lang AS langid, n_chars
            FROM documents WHERE doc_id % 2 = 0)
        SELECT t.corpus, t.doc_id,
               CASE WHEN s.doc_id IS NOT NULL AND s.n_chars % 3 <> 1
                    THEN s.langid ELSE t.langid END AS langid,
               CASE WHEN s.doc_id IS NOT NULL AND s.n_chars % 3 <> 1
                    THEN t.n_chars + s.n_chars ELSE t.n_chars END AS n_chars
        FROM tgt t LEFT JOIN src s USING (corpus, doc_id)
        WHERE s.doc_id IS NULL OR s.n_chars % 7 <> 0
        UNION ALL
        SELECT s.corpus, s.doc_id, s.langid, s.n_chars
        FROM src s LEFT JOIN tgt t USING (corpus, doc_id)
        WHERE t.doc_id IS NULL AND s.n_chars % 5 <> 2""",
    # the same UPDATE-then-DELETE recomputed declaratively: the delete
    # predicate applies to POST-update values (ops ran in that order)
    "rowops_update_delete": """
        WITH seed AS (
            SELECT 'docs' AS corpus,
                   lpad(CAST(doc_id AS VARCHAR), 12, '0') AS doc_id,
                   lang AS langid, n_chars
            FROM documents),
        upd AS (
            SELECT corpus, doc_id,
                   CASE WHEN n_chars % 5 = 2
                        THEN concat('u-', langid) ELSE langid END AS langid,
                   CASE WHEN n_chars % 5 = 2
                        THEN n_chars * 2 + 1 ELSE n_chars END AS n_chars
            FROM seed)
        SELECT corpus, doc_id, langid, n_chars
        FROM upd WHERE n_chars % 7 <> 3""",
    "dedup_embedding_cosine": _EMB_NEARDUP_SQL,
    "dedup_embedding_incremental": (
        f"SELECT * FROM ({_EMB_NEARDUP_SQL}) WHERE id_a % 7 = 3 OR id_b % 7 = 3"
    ),
    "ann_bruteforce_topk": _ANN_SQL,
    # ann_lsh_topk ranks LSH candidates by EXACT cosine; recall@k is 1.0 at
    # the driver operating point (equality-asserted in
    # tests/test_similarity_recall.py), so the brute-force twin is its oracle
    "ann_lsh_topk": _ANN_SQL,
    "ann_ivf_topk": _IVF_SQL,
    "ann_ivf_trained": _IVF_TRAINED_SQL,
    "decontaminate_ngram": _DECON_SQL,
    "sample_stratified_quota": _STRAT_SAMPLE_SQL,
    "sample_hash_bernoulli": _HASH_SAMPLE_SQL,
    "multimodal_decode_stub": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS fake_width,
               CAST(ascii(substr(text, 1, 1)) % 480 + 1 AS INTEGER) AS fake_height,
               octet_length(encode(text)) * 2654435761 % 1000003 AS checksum_mod
        FROM documents""",
    "multimodal_frame_sample": """
        SELECT doc_id, CAST(i AS INT) AS frame_idx,
               substr(text,
                      CAST(floor(i * (octet_length(encode(text)) / 4.0)) AS INT) + 1,
                      16) AS frame_bytes
        FROM documents, range(0, 4) r(i)""",
}

# ---------------------------------------------------------------------------
# Driver-facing registry.  The driver's CORRECTNESS check records rows for at
# most ~50 queries (round 2 measured a hard truncation at entry 50 with 56
# registered — the tail 6 got no row at all), so the registry is capped at
# EXACTLY 50 entries chosen to cover every SURVEY.md §2 operator once, with
# the round-2-starved entries (dedup_simhash, dedup_embedding_cosine, ann_*,
# multimodal_*) ordered near the front.  Redundant spellings and
# near-duplicate join variants live in EXTRA_QUERIES: identical local
# verification (tests/test_queries_oracle.py parametrizes over BOTH dicts),
# just not submitted to the driver.
# ---------------------------------------------------------------------------

QUERIES = {
    # flagship + the entries that must land driver rows this round
    "flagship_cdc_enrich": q_flagship,
    "lww_dedup_argmax": q_lww_argmax,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding,
    "ann_bruteforce_topk": q_ann_bruteforce,
    "ann_lsh_topk": q_ann_lsh,
    "multimodal_decode_stub": q_multimodal_decode,
    "multimodal_frame_sample": q_multimodal_frames,
    "fn_json_roundtrip": q_fn_json_roundtrip,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash,
    "dedup_ngram_jaccard": q_dedup_ngram,
    # windows / ordering
    "window_lag_delta": q_window_lag,
    "window_running_sum": q_window_running_sum,
    "window_rank_family": q_window_rank_family,
    "sort_limit_offset": q_sort_limit_offset,
    # aggregates
    "agg_pricing_summary": q_agg_pricing,
    "agg_distinct_users": q_agg_distinct,
    "agg_approx_distinct": q_agg_approx_distinct,
    "agg_rollup_region_nation": q_agg_rollup,
    "agg_cube_status_priority": q_agg_cube,
    "agg_collect_nations": q_agg_collect,
    "agg_grouped_pandas": q_grouped_pandas_agg,
    # joins
    "join_broadcast_dims": q_join_dims,
    "join_sortmerge_revenue": q_join_revenue,
    "join_semi_with_orders": q_join_semi,
    "join_anti_without_orders": q_join_anti,
    "join_outer_order_histogram": q_join_outer_histogram,
    "join_full_outer_counts": q_join_full_outer,
    "join_range_binned": q_join_range_binned,
    "join_asof_latest_order": q_join_asof,
    "join_skew_salted": q_join_salted,
    "join_cross_pairs": q_join_cross,
    # set ops
    "setop_except_custkeys": q_setop_except,
    "setop_intersect_nations": q_setop_intersect,
    "union_by_name_counts": q_union_by_name,
    # functions
    "fn_json_extract": q_fn_json,
    "fn_from_json_props": q_fn_from_json,
    "fn_date_trunc": q_fn_dates,
    "fn_sha256_docs": q_fn_sha,
    "fn_lang_normalize": q_fn_lang_norm,
    "fn_lang_normalize_iter": q_fn_lang_norm_iter,
    # streaming twins
    "stream_tumbling_counts": q_stream_tumbling,
    "stream_sliding_counts": q_stream_sliding,
    "stream_session_windows": q_session_windows,
    # sources / text
    "source_csv_roundtrip": q_csv_roundtrip,
    "text_token_counts": q_text_tokens,
    "text_quality_score": q_text_quality,
    "text_lang_id": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
}

# Demoted spellings/variants: same local oracle gate, not driver-submitted.
EXTRA_QUERIES = {
    "lww_dedup_window": q_lww_window,
    "lww_dedup_semijoin": q_lww_semijoin,
    "window_rank_top3": q_window_rank,
    "agg_percentiles": q_agg_percentiles,
    "join_range_value_buckets": q_join_range,
    "join_right_outer_counts": q_join_right_outer,
    "join_shuffle_hash": q_join_shuffle_hash,
    # breadth beyond the 50-cap (F7 maps, A-family pivot, chunking) —
    # local-only, same DuckDB comparison
    "fn_map_props": q_fn_map_props,
    "agg_pivot_status": q_agg_pivot_status,
    "agg_unpivot_status": q_agg_unpivot_status,
    "text_chunk_windows": q_text_chunks,
    "text_pack_greedy": q_text_pack,
    "text_pack_global": q_text_pack_global,
    "ann_ivf_topk": q_ann_ivf,
    "ann_ivf_trained": q_ann_ivf_trained,
    "decontaminate_ngram": q_decontaminate,
    "dedup_minhash_incremental": q_dedup_minhash_incremental,
    "dedup_simhash_incremental": q_dedup_simhash_incremental,
    "dedup_embedding_incremental": q_dedup_embedding_incremental,
    "merge_into_upsert": q_merge_into_upsert,
    "rowops_update_delete": q_rowops_update_delete,
    "matview_repo_stats": q_matview_repo_stats,
    "scd2_history": q_scd2_history,
    "scd2_as_of": q_scd2_as_of,
    "constraints_quarantine": q_constraints_quarantine,
    "text_search_terms": q_text_search_terms,
    "text_search_bm25": q_text_search_bm25,
    "sample_stratified_quota": q_sample_stratified,
    "sample_hash_bernoulli": q_sample_hash,
}

assert len(QUERIES) == 50, f"driver registry must stay at 50, got {len(QUERIES)}"
assert not (set(QUERIES) & set(EXTRA_QUERIES))

ORACLES: dict[str, str] = {
    k: _ALL_ORACLES[k] for k in QUERIES if k in _ALL_ORACLES
}
EXTRA_ORACLES: dict[str, str] = {
    k: _ALL_ORACLES[k] for k in EXTRA_QUERIES if k in _ALL_ORACLES
}
assert set(_ALL_ORACLES) == set(ORACLES) | set(EXTRA_ORACLES), (
    "every oracle key must map to a registered query"
)
