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
