"""Scale-design proofs on physical plans: bucketed joins are shuffle-free,
salted joins are result-identical to plain joins, broadcast dims never
shuffle the fact side. These are the 100 TB claims in README §Scale —
asserted against `.explain` output, not just prose."""

import shutil

import pytest
from pyspark.sql import functions as F

from gmall_flink_230422_spark.io import load_table, write_bucketed
from gmall_flink_230422_spark.operators.joins import lookup_join, salted_join

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture()
def no_broadcast(spark):
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_is_shuffle_free(spark, no_broadcast):
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    try:
        write_bucketed(li.select("l_orderkey", "l_quantity"), "t_li_b", ["l_orderkey"], 8)
        write_bucketed(o.select("o_orderkey", "o_totalprice"), "t_o_b", ["o_orderkey"], 8)
        joined = spark.table("t_li_b").join(
            spark.table("t_o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = plan_of(joined)
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        # and it still computes the right thing
        plain = li.select("l_orderkey", "l_quantity").join(
            o.select("o_orderkey", "o_totalprice"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_o_b")
        shutil.rmtree("spark-warehouse/t_li_b", ignore_errors=True)
        shutil.rmtree("spark-warehouse/t_o_b", ignore_errors=True)


def test_unbucketed_join_shuffles_both_sides(spark, no_broadcast):
    """Control for the bucketed test: same join without bucketing shows the
    two Exchanges the bucket layout removes."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    plan = plan_of(li.join(o, F.col("l_orderkey") == F.col("o_orderkey")))
    assert plan.count("Exchange") >= 2


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, "l_orderkey", n_salts=4)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_lookup_join_broadcasts_dim(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    s = load_table(spark, SF_DIR, "supplier")
    plan = plan_of(lookup_join(li, s, li["l_suppkey"] == s["s_suppkey"]))
    assert "BroadcastHashJoin" in plan
    # the fact side must not hash-shuffle for the join
    assert "Exchange hashpartitioning" not in plan


# plan invariants for headline queries: shuffle budget and broadcast
# expectations — the PLANS.md claims, asserted so they can't regress
PLAN_BUDGET = {
    # name: (max_exchanges, min_broadcast_joins)
    "q1_pricing_summary": (1, 0),
    "q5_local_supplier": (1, 4),
    "q6_forecast_revenue": (1, 0),
    "q9_product_profit": (1, 3),
    "a1_tumble_keyed": (1, 0),
    "t3_daily_uv": (2, 0),  # window partition + daily count agg (PLANS.md)
    "e_sliding_window": (1, 0),
    "j4_double_alias_join": (1, 4),
}


def test_headline_plan_budgets(spark):
    from gmall_flink_230422_spark.plans import registry

    import re

    specs = registry()
    sf = "/root/testdata/sf0.001"
    for name, (max_ex, min_bc) in PLAN_BUDGET.items():
        plan = plan_of(specs[name].fn(spark, sf))
        # count numbered plan nodes ("(4) Exchange"), not every mention —
        # formatted explain lists each node twice (tree + detail section)
        n_ex = len(re.findall(r"\(\d+\) Exchange\b", plan))
        n_bc = len(re.findall(r"\(\d+\) BroadcastHashJoin\b", plan))
        assert n_ex <= max_ex, f"{name}: {n_ex} shuffles (budget {max_ex})\n{plan}"
        assert n_bc >= min_bc, f"{name}: {n_bc} broadcast joins (need {min_bc})\n{plan}"


def test_scans_prune_columns(spark):
    """Column pruning reaches the parquet scan: q6 must read only the four
    needed lineitem columns, never the full 11-column schema."""
    from gmall_flink_230422_spark.plans import registry

    plan = plan_of(registry()["q6_forecast_revenue"].fn(spark, "/root/testdata/sf0.001"))
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m, plan
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert set(cols) <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
    assert "PushedFilters: [" in plan and "IsNotNull(l_shipdate)" in plan


def test_salted_join_rejects_right_and_full(spark):
    """The right side is exploded n_salts x, so right/full/semi/anti would
    duplicate unmatched right rows — must refuse, not corrupt (ADVICE r1)."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(li, o, "l_orderkey", how=how)


def test_tokenizer_is_arrow_batched(spark):
    """U1/U2 tokenizer must run as an Arrow-batched pandas_udf
    (ArrowEvalPython), never a row-at-a-time Python UDF (BatchEvalPython) —
    the 100 TB hot-path requirement from VERDICT r1 §wrong-2."""
    from gmall_flink_230422_spark.functions.tokenize import split_words

    doc = load_table(spark, SF_DIR, "documents").select("text")
    plan = plan_of(doc.select(F.explode(split_words(F.col("text"))).alias("w")))
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # SQL-registered form takes the same path
    from gmall_flink_230422_spark.functions.tokenize import register_split_udtf

    register_split_udtf(spark)
    doc.createOrReplaceTempView("t_tok_docs")
    plan_sql = plan_of(
        spark.sql("SELECT explode(split_words(text)) AS w FROM t_tok_docs")
    )
    assert "ArrowEvalPython" in plan_sql, plan_sql
    assert "BatchEvalPython" not in plan_sql, plan_sql


def test_q15_has_no_single_partition_exchange(spark):
    """q15 argmax must be scalar-max + broadcast filter, not a global rank
    window: no SinglePartition exchange anywhere in the plan (VERDICT r1
    §wrong-3). (The 1-row max aggregate's own final agg is fine — it
    operates on pre-aggregated supplier rows and broadcasts.)"""
    from gmall_flink_230422_spark.plans import registry

    plan = plan_of(registry()["q15_top_supplier"].fn(spark, SF_DIR))
    assert "Window" not in plan, plan


def test_asof_join_semantics(spark):
    """Inclusive tie, latest-wins, and no-match-null behavior of asof_join."""
    import datetime as dt

    from gmall_flink_230422_spark.operators.joins import asof_join

    t = lambda s: dt.datetime(2024, 1, s)
    left = spark.createDataFrame(
        [(1, t(5), "e1"), (1, t(10), "e2"), (2, t(3), "e3"), (3, t(9), "e4")],
        ["k", "ts", "eid"],
    )
    right = spark.createDataFrame(
        [(1, t(5), 100.0), (1, t(7), 200.0), (2, t(4), 300.0)],
        ["k", "rts", "price"],
    )
    out = {r["eid"]: r["price"] for r in
           asof_join(left, right, ["k"], "ts", "rts", ["price"]).collect()}
    assert out == {
        "e1": 100.0,   # tie (rts == ts) is inclusive
        "e2": 200.0,   # latest at-or-before wins
        "e3": None,    # right row is in the future -> null
        "e4": None,    # key with no right rows at all
    }


def test_range_join_is_equi_not_nested_loop(spark):
    """The binned range join must plan as a hash/sort-merge/broadcast-hash
    join on the bin key — never the O(n*m) nested-loop a bare range
    predicate produces."""
    from gmall_flink_230422_spark.plans import registry

    plan = plan_of(registry()["e_range_join"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_range_join_matches_theta_join(spark):
    """Binned result == naive theta-join result (pair multiset identical)."""
    from gmall_flink_230422_spark.operators.joins import range_join

    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    iv = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("value") > 150)
        .select(
            F.col("event_id").alias("wid"),
            F.col("ts").alias("ws"),
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("we"),
        )
    )
    binned = {
        (r["event_id"], r["wid"])
        for r in range_join(ev, iv, "ts", "ws", "we", 600).collect()
    }
    naive = {
        (r["event_id"], r["wid"])
        for r in ev.join(
            iv, (F.col("ts") >= F.col("ws")) & (F.col("ts") <= F.col("we"))
        ).collect()
    }
    assert binned == naive and len(binned) > 0


def test_hll_accuracy_in_dense_regime(spark):
    """Raw HLL (m=256) within 10% of exact when n >> m (standard error
    1.04/sqrt(256) = 6.5%)."""
    from gmall_flink_230422_spark.operators import sketches

    df = spark.range(20000).select(F.col("id").cast("string").alias("v"))
    b = sketches.hll_buckets(df.withColumn("g", F.lit(1)), F.col("v"), ["g"])
    est = sketches.hll_estimate(b, ["g"]).first()["hll_est"]
    assert abs(est - 20000) / 20000 < 0.10, est


def test_cms_never_underestimates(spark):
    """CMS point estimates are >= exact counts for every probed term."""
    from gmall_flink_230422_spark.operators import sketches

    df = spark.range(5000).select(
        F.concat(F.lit("t"), (F.col("id") % 100).cast("string")).alias("term")
    )
    sketch = sketches.cms_table(df, F.col("term"))
    exact = df.groupBy("term").agg(F.count(F.lit(1)).alias("exact_ct"))
    probed = sketches.cms_lookup(sketch, exact, "term").collect()
    assert len(probed) == 100
    assert all(r["cms_est"] >= r["exact_ct"] for r in probed)


def test_bloom_prune_is_lossless_and_selective(spark):
    """bloom_prune keeps every true match (join result identical to the
    un-pruned join) while actually dropping most non-matching rows."""
    from gmall_flink_230422_spark.operators import sketches

    s = load_table(spark, SF_DIR, "supplier").filter(F.col("s_nationkey") == 3)
    dim = s.select("s_suppkey")
    words = sketches.bloom_build(dim, F.col("s_suppkey"))
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    pruned = sketches.bloom_prune(li, F.col("l_suppkey"), words)

    full_n = li.count()
    pruned_n = pruned.count()
    assert pruned_n < full_n * 0.5, (pruned_n, full_n)  # actually prunes

    exact = {tuple(r) for r in li.join(dim, li["l_suppkey"] == dim["s_suppkey"]).collect()}
    via_bloom = {tuple(r) for r in pruned.join(dim, pruned["l_suppkey"] == dim["s_suppkey"]).collect()}
    assert exact == via_bloom and len(exact) > 0


def test_asof_join_reuses_partitioning(spark):
    """The final per-key aggregate after asof_join must reuse the asof
    shuffle's hash partitioning: 2 Exchanges total (right-side pre-dedup +
    the union window), never a third for the groupBy."""
    import re

    from gmall_flink_230422_spark.plans import registry

    plan = plan_of(registry()["e_asof_join"].fn(spark, SF_DIR))
    n_ex = sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\s*\(\d+\)\s*Exchange", line)
    )
    assert n_ex <= 2, plan


def test_window_suite_single_exchange(spark):
    """All twelve window functions in e_window_functions share ONE
    hash-partition Exchange on o_custkey (same-partitioning Window nodes
    collapse onto one shuffle; extra sort orders are in-partition sorts)."""
    import re

    from gmall_flink_230422_spark.plans import registry

    plan = plan_of(registry()["e_window_functions"].fn(spark, SF_DIR))
    n_ex = sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\s*\(\d+\)\s*Exchange", line)
    )
    assert n_ex == 1, plan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style dt-partitioned layout + partition pruning: a dt-filtered
    read must plan PartitionFilters (pruned at listing time, before any IO)
    and touch only the matching partition directories — the other half of
    the 100 TB scan story next to columnar pushdown (time-partitioned fact
    tables are the norm for event data)."""
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_dt")
    ev.write.partitionBy("dt").mode("overwrite").parquet(out)
    days = sorted(
        str(r["dt"]) for r in spark.read.parquet(out).select("dt").distinct().collect()
    )
    assert len(days) > 2
    pick = days[1]
    q = spark.read.parquet(out).filter(F.col("dt") == F.lit(pick)).select("event_id", "value")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "dt" in plan.split("PartitionFilters")[1][:120]
    # the authoritative check: only one partition's rows are read
    expected = spark.read.parquet(out).filter(F.col("dt") == pick).count()
    exact = load_table(spark, SF_DIR, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    ).filter(F.col("dt") == pick).count()
    assert expected == exact


def test_epoch_shuffle_uses_window_group_limit(spark):
    """The global top-100 permutation prefix must plan a distributed
    partial top-k (TakeOrderedAndProject, or WindowGroupLimit on older
    planners) — never a full global sort of the corpus."""
    from gmall_flink_230422_spark.plans.llm import q_epoch_shuffle

    plan = (
        q_epoch_shuffle(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_zorder_key_interleave_and_tile_bound(spark):
    from gmall_flink_230422_spark.io import zorder_key
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(u, t) for u in (0, 1, 5, 255) for t in (0, 2, 17, 255)], ["u", "t"]
    )
    out = df.select(
        "u", "t", zorder_key([F.col("u"), F.col("t")], bits=8).alias("z")
    ).collect()
    for r in out:
        # independent reference interleave
        z = sum((((r["u"] >> b) & 1) << (2 * b)) + (((r["t"] >> b) & 1) << (2 * b + 1))
                for b in range(8))
        assert r["z"] == z
        # top-8-bit tile is exactly the 16x16 cell (u>>4, t>>4) interleaved
        tile = r["z"] >> 8
        u_hi = sum(((r["u"] >> (4 + b)) & 1) << (2 * b) for b in range(4))
        t_hi = sum(((r["t"] >> (4 + b)) & 1) << (2 * b + 1) for b in range(4))
        assert tile == u_hi + t_hi


def test_distributed_cumsum_matches_local_prefix_sum(spark):
    """distributed_cumsum (r4: the no-single-partition replacement for
    Window.orderBy running sums) must equal a locally computed prefix sum
    over the global ordering, including duplicate-heavy keys, and its plan
    must not contain a data-proportional SinglePartition exchange."""
    import sys
    from pathlib import Path

    from pyspark.sql import functions as F

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from audit_plans import single_partition_audit

    from gmall_flink_230422_spark.operators.windows import distributed_cumsum

    rows = [((i * 37) % 11, 1 + (i % 5)) for i in range(500)]  # many ties
    df = spark.createDataFrame(rows, "k int, v int")
    hist = df.groupBy("k").agg(F.sum("v").alias("cnt"))
    out = distributed_cumsum(hist, ["k"], "cnt", "cum", num_partitions=7)
    got = {r["k"]: r["cum"] for r in out.collect()}

    local = {}
    acc = 0
    for k, cnt in sorted(
        ((r["k"], r["cnt"]) for r in hist.collect()), key=lambda t: t[0]
    ):
        acc += cnt
        local[k] = acc
    assert got == local

    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    _, sp_other = single_partition_audit(plan)
    assert not sp_other


def test_mmr_rerank_auto_sizes_probe_partitions(spark):
    """mmr_rerank's greedy-loop candidate frame must not default to a
    single partition at large |Q|: the auto-sizer follows the documented
    k_candidates*|Q|/1e6 rule, and the physical plan of the default path
    carries the sized Coalesce (r6 verdict: constant coalesce(1) was a
    single-partition bottleneck for 10^6-query callers)."""
    from gmall_flink_230422_spark.operators.similarity import (
        mmr_probe_partitions,
        mmr_rerank,
    )

    # the sizing rule itself
    assert mmr_probe_partitions(3, 16) == 1           # bench-sized: tiny
    assert mmr_probe_partitions(62_500, 16) == 1      # exactly 1e6 rows
    assert mmr_probe_partitions(62_501, 16) == 2      # first row past it
    assert mmr_probe_partitions(1_000_000, 16) == 16  # the verdict's case

    # the default path threads the size into the candidate frame: with a
    # declared |Q| above the threshold, >1 partition even on tiny data
    from gmall_flink_230422_spark.operators.similarity import mmr_candidates

    rows = [(i, [float(i % 7), 1.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 2)
    # coalesce can only REDUCE partitions: on tiny data AQE collapses the
    # window shuffle to 1 first, hiding the sizing — pin AQE off so the
    # shuffle keeps its fan-out and the coalesce target is observable
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        cand = mmr_candidates(df, q, k_candidates=4, n_queries=500_000)
        assert cand.rdd.getNumPartitions() == 2
        # and the un-hinted default still sizes from the counted |Q|
        cand_small = mmr_candidates(df, q, k_candidates=4)
        assert cand_small.rdd.getNumPartitions() == 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    out_small = mmr_rerank(df, q, k_candidates=4, k_select=2)
    assert out_small.count() > 0
