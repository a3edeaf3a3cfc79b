"""TPC-H-style benchmark queries on the synthetic star schema — the bench
headliners (BASELINE.md §B: bench ≤ 2× baseline at sf0.1) and extra
aggregation/join coverage beyond the reference's operator surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from . import QuerySpec


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary: the canonical partial/final hash-agg
    stress (one scan, one shuffle of 4 groups)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            # precision discipline: round AT the data's decimal grid (qty/
            # price g=2, price*(1-disc) g=4) so both engines land computed
            # sums back on the true grid; charge (g=6) rounds at 2 because
            # accumulated ulp error at 1e8 magnitudes exceeds the 1e-6 grid.
            # Off-grid ratios (avgs) floor-truncate over the rounded sums.
            (F.floor(F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1)) * 10000) / 10000).alias("avg_qty"),
            (F.floor(F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1)) * 10000) / 10000).alias("avg_price"),
            (F.floor(F.round(F.sum("l_discount"), 4) / F.count(F.lit(1)) * 1000000) / 1000000).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       floor(round(sum(l_quantity), 2) / count(*) * 10000) / 10000 AS avg_qty,
       floor(round(sum(l_extendedprice), 2) / count(*) * 10000) / 10000 AS avg_price,
       floor(round(sum(l_discount), 4) / count(*) * 1000000) / 1000000 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders(spark, sf_dir):
    """TPC-H Q3-style shipping-priority top-10: join + agg + deterministic
    rank-limit (revenue DESC, o_orderkey tiebreak)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    joined = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(
            (F.col("o_orderdate") < F.lit("1995-03-15"))
            & (F.col("l_shipdate") > F.lit("1995-03-15"))
        )
    )
    rev = joined.groupBy("o_orderkey", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )
    # orderBy+limit → TakeOrderedAndProject: per-partition top-k, no
    # single-partition global Window
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_orderpriority", "revenue")
    )


ORACLE_Q3 = """
WITH rev AS (
  SELECT o_orderkey, o_orderpriority,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
    AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
  GROUP BY o_orderkey, o_orderpriority
)
SELECT o_orderkey, o_orderpriority, revenue
FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS rk FROM rev)
WHERE rk <= 10
"""


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-style: 6-way join where customer and supplier share a nation
    — the deepest join chain in the suite; dims broadcast, facts shuffle once."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    df = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, (li["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return df.groupBy("r_name", "n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


ORACLE_Q5 = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


SPECS = [
    QuerySpec("q1_pricing_summary", q_pricing_summary, ORACLE_Q1, tags=("tpch", "bench")),
    QuerySpec("q3_top_orders", q_top_orders, ORACLE_Q3, tags=("tpch", "bench")),
    QuerySpec("q5_local_supplier", q_local_supplier_volume, ORACLE_Q5, tags=("tpch", "bench")),
]
