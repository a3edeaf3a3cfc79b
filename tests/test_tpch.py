"""TPC-H suite sanity at sf0.001: every tpch/tpch_ext query builds a plan
and returns a stable schema; spot-check values the tiny SF pins down. Full
value parity vs DuckDB is tools/check_oracle.py's job (driver t2 gate)."""

import pytest
from pyspark.sql import functions as F

from gmall_flink_230422_spark.plans import registry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    return registry()


def test_all_tpch_queries_run(spark, specs):
    tpch = {n: s for n, s in specs.items() if "tpch" in s.tags}
    assert len(tpch) >= 18
    for name, spec in tpch.items():
        df = spec.fn(spark, SF_DIR)
        rows = df.collect()
        assert df.columns, name
        # empty is legal for highly selective filters at sf0.001, but the
        # suite as a whole must produce data — checked below per-query for
        # the ones the tiny SF can't starve
        if name in ("q1_pricing_summary", "q6_forecast_revenue", "q13_cust_distribution"):
            assert rows, f"{name} empty at sf0.001"


def test_q1_group_count(spark, specs):
    # 3 returnflags × 2 linestatuses max; sf0.001 hits all populated combos
    rows = specs["q1_pricing_summary"].fn(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 6
    for r in rows:
        assert r["sum_qty"] > 0 and r["count_order"] > 0


def test_q13_distribution_totals(spark, specs):
    # the distribution's weighted sum must equal the customer count
    rows = specs["q13_cust_distribution"].fn(spark, SF_DIR).collect()
    from gmall_flink_230422_spark.io import load_table

    n_cust = load_table(spark, SF_DIR, "customer").count()
    assert sum(r["custdist"] for r in rows) == n_cust


def test_q15_ties_kept(spark, specs):
    # rank-based argmax: every returned supplier carries the max revenue
    rows = specs["q15_top_supplier"].fn(spark, SF_DIR).collect()
    assert rows
    top = max(r["total_revenue"] for r in rows)
    assert all(r["total_revenue"] == top for r in rows)


def test_q18_threshold(spark, specs):
    rows = specs["q18_large_volume"].fn(spark, SF_DIR).collect()
    assert all(r["sum_qty"] > 300 for r in rows)
