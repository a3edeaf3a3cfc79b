"""Extended TPC-H-style suite on the synthetic star schema.

Breadth beyond the three headliners in ``tpch.py``: exists/anti subqueries,
ratio metrics, distributions, correlated-threshold filters, top-k reports.
The synthetic schema has no partsupp / commit-receipt dates / phone /
container columns, so Q2/Q11/Q20/Q21 are unreachable and several queries
are adapted to the available columns (noted per query).

Cross-engine determinism rules (see README + plans/tpch.py):
- double aggregates round AT the data's decimal grid (price g=2, price*
  (1-disc) g=4) identically on both sides — grid-rounding absorbs ulp noise;
  off-grid ratios floor-truncate over rounded operands;
- ratios are computed from ROUNDED sums then floor-truncated, so both
  engines divide bit-identical operands;
- ``avg`` over integer-valued doubles (l_quantity) is written ``sum/count``
  on both sides — integer sums are exact, so the threshold is bit-stable
  regardless of summation order;
- DuckDB ``sum(int)``/case-sums are cast to BIGINT; dates emitted as
  strings; years cast to BIGINT.

Scale notes: every query is one fact-table scan with filters/projection
pushed to parquet; nation/region are always broadcast; customer/supplier/
part joins are left to AQE (broadcast at bench SF, shuffle-hash beyond);
top-k uses TakeOrderedAndProject via row_number-over-limit, never a global
sort of the fact table.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table
from . import QuerySpec


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q4 — order priority checking (adapted: EXISTS predicate is "some line
# shipped >30 days after the order date" since l_commitdate/l_receiptdate
# don't exist). Semi join ≙ EXISTS; Catalyst plans it as a broadcast/shuffle
# semi join with the date predicate evaluated join-side.
# --------------------------------------------------------------------------


def q_order_priority(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan-filter-agg, zero joins. The
# pushdown stress: all three predicates must reach the parquet reader.
# --------------------------------------------------------------------------


def q_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue")
    )


ORACLE_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q7 — volume shipping between nation pairs: the double-dimension join
# (supplier nation AND customer nation on the same fact row). Both nation
# joins broadcast; one shuffle for the 3-column group.
# --------------------------------------------------------------------------

_Q7_NATIONS = ("NATION_1", "NATION_2", "NATION_3", "NATION_4")


def q_volume_shipping(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*_Q7_NATIONS))
    n1 = F.broadcast(
        n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    df = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n1, s["s_nationkey"] == F.col("n1_key"))
        .join(n2, c["c_nationkey"] == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return df.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
    ).agg(F.round(F.sum(_revenue()), 4).alias("volume"))


ORACLE_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
  AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Q8 — market share of one supplier-nation inside one customer-region for a
# product type, per year. The ratio is floor(round/round) so both engines
# divide identical doubles.
# --------------------------------------------------------------------------


def q_market_share(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nation = F.broadcast(
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select("n_nationkey")
    )
    supp_nation = F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    df = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(cust_nation, c["c_nationkey"] == cust_nation["n_nationkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(supp_nation, s["s_nationkey"] == F.col("sn_key"))
    )
    by_year = df.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year")).agg(
        F.round(F.sum(F.when(F.col("supp_nation") == "NATION_5", _revenue()).otherwise(F.lit(0.0))), 4).alias("_nat"),
        F.round(F.sum(_revenue()), 4).alias("_all"),
    )
    return by_year.select(
        "o_year",
        (F.floor(F.col("_nat") / F.col("_all") * 1000000) / 1000000).alias("mkt_share"),
    )


ORACLE_Q8 = """
WITH flat AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON l_partkey = p_partkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       floor(round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END), 4)
             / round(sum(volume), 4) * 1000000) / 1000000 AS mkt_share
FROM flat
GROUP BY o_year
"""


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year (adapted: no partsupp, so
# supply cost is modeled as 10% of p_retailprice per unit).
# --------------------------------------------------------------------------


def q_product_profit(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey", "p_retailprice"
    )
    n = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    profit = _revenue() - F.col("p_retailprice") * 0.1 * F.col("l_quantity")
    df = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
    )
    return df.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(F.round(F.sum(profit), 4).alias("sum_profit"))


ORACLE_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity), 4) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'STANDARD'
GROUP BY n_name, year(o_orderdate)
"""


# --------------------------------------------------------------------------
# Q10 — returned-item reporting: top 20 customers by lost revenue in a
# quarter. row_number (deterministic c_custkey tiebreak) → limit, planned
# as TakeOrderedAndProject, no global sort. Revenue is floor-truncated (not
# rounded): round() diverges across engines at .xx5 renderings, truncation
# only at exact 0.01 multiples, which the discount arithmetic never hits.
# --------------------------------------------------------------------------


def q_returned_items(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    df = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
    )
    rev = df.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.round(F.sum(_revenue()), 4).alias("revenue")
    )
    # orderBy+limit → TakeOrderedAndProject: per-partition top-k, no
    # single-partition global Window
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
    )


ORACLE_Q10 = """
WITH rev AS (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
SELECT c_custkey, c_name, c_acctbal, n_name, revenue
FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rk FROM rev)
WHERE rk <= 20
"""


# --------------------------------------------------------------------------
# Q12 — shipping priority classes (adapted: grouped by l_linestatus since
# l_shipmode doesn't exist). Conditional case-sums, single shuffle.
# --------------------------------------------------------------------------


def q_priority_shipping(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution: left outer join with a join-side
# predicate (NOT a post-filter — that's the Q13 trap), two aggregations.
# --------------------------------------------------------------------------


def q_customer_distribution(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# Q14 — promotion effect: percent-of-revenue ratio for one month.
# --------------------------------------------------------------------------


def q_promo_effect(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    agg = li.join(p, li["l_partkey"] == p["p_partkey"]).agg(
        F.round(F.sum(F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))), 4).alias("_promo"),
        F.round(F.sum(_revenue()), 4).alias("_all"),
    )
    return agg.select(
        (F.floor(F.col("_promo") / F.col("_all") * 1000000) / 10000).alias("promo_revenue_pct")
    )


ORACLE_Q14 = """
SELECT floor(round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 4)
             / round(sum(l_extendedprice * (1 - l_discount)), 4) * 1000000) / 10000 AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


# --------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue: aggregate-then-argmax with
# ties kept (rank over rounded revenue ≙ `= max(...)` on both engines).
# --------------------------------------------------------------------------


def q_top_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_revenue()), 4).alias("total_revenue")
    )
    # Scalar max + broadcast equi-join keeps ties (= rank()==1) WITHOUT the
    # single-partition Exchange a global Window.orderBy would force: at scale
    # every supplier row would funnel through one task. The 1-row max side
    # broadcasts; rev is computed once and reused (self-referencing subquery,
    # same shape as ORACLE_Q15's `= (SELECT max(...))`).
    max_rev = rev.agg(F.max("total_revenue").alias("_max_rev"))
    top = rev.join(
        F.broadcast(max_rev), rev["total_revenue"] == max_rev["_max_rev"]
    ).drop("_max_rev")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(F.broadcast(s), top["supplier_no"] == s["s_suppkey"]).select(
        "s_suppkey", "s_name", "total_revenue"
    )


ORACLE_Q15 = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# --------------------------------------------------------------------------
# Q16 — supplier count by part attributes (adapted: supplier relation comes
# from lineitem facts, no partsupp). count(distinct) forces the two-phase
# distinct-agg plan.
# --------------------------------------------------------------------------

_Q16_SIZES = (1, 5, 9, 14, 19, 23, 36, 45)


def q_parts_supplier_cnt(spark, sf_dir):
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11") & F.col("p_size").isin(*_Q16_SIZES)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#11' AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated per-part average threshold.
# The per-part avg is written sum/count (exact over integer-valued doubles →
# bit-stable threshold on both engines). Plan: one agg on partkey + one
# shuffle join on partkey — co-partitioned, no extra exchange.
# --------------------------------------------------------------------------


def q_small_qty_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li_b = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresh = li_b.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.sum("l_quantity") / F.count(F.lit(1)) * 0.2).alias("qty_thresh")
    )
    return (
        li_b.join(thresh, li_b["l_partkey"] == thresh["t_partkey"])
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg((F.floor(F.round(F.sum("l_extendedprice"), 2) / 7.0 * 100) / 100).alias("avg_yearly"))
    )


ORACLE_Q17 = """
SELECT floor(round(sum(l_extendedprice), 2) / 7.0 * 100) / 100 AS avg_yearly
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l.l_quantity < (
    SELECT sum(l2.l_quantity) / count(*) * 0.2
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


# --------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING on an exact integer-valued sum, then
# a top-100 report. The having-filter runs on the aggregated (small) side
# before the customer join.
# --------------------------------------------------------------------------


def q_large_volume_customer(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    df = (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
    )
    return (
        df.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


ORACLE_Q18 = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (
  SELECT c_name, c_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         o_totalprice, sum_qty,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM big
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
)
WHERE rk <= 100
"""


# --------------------------------------------------------------------------
# Q19 — discounted revenue: disjunctive multi-attribute predicate (adapted:
# no shipmode/container legs). The OR of brand/size/qty conjunctions is
# evaluated post-join; the partkey equi-join itself stays hash-joinable.
# --------------------------------------------------------------------------


def q_discounted_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )


ORACLE_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# Q22 — idle high-balance customers (adapted: grouped by nation, no phone
# country codes; "idle" = no orders since 1999 since the dense synthetic
# data gives every customer some order). Scalar-subquery threshold + anti
# join; the threshold is a broadcast single-row cross join, the anti join
# is Spark's left_anti.
# --------------------------------------------------------------------------


def q_idle_customers(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
        .select("o_custkey")
    )
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("bal_thresh")
    )
    rich = c.crossJoin(F.broadcast(thresh)).filter(F.col("c_acctbal") > F.col("bal_thresh"))
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.groupBy(F.col("c_nationkey").cast("bigint").alias("c_nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


ORACLE_Q22 = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# Q20 — heavy promo suppliers (adapted: no partsupp, so "stock" is the
# shipped quantity). Supplier totals vs 1.5× the cross-supplier average:
# integer-valued sums are exact, so the correlated threshold is bit-stable.
# --------------------------------------------------------------------------


def q_promo_suppliers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    per_supp = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )
    thresh = per_supp.agg(
        (F.sum("total_qty") / F.count(F.lit(1)) * 1.5).alias("qty_thresh")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        per_supp.crossJoin(F.broadcast(thresh))
        .filter(F.col("total_qty") > F.col("qty_thresh"))
        .join(s, per_supp["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"), "total_qty")
    )


ORACLE_Q20 = """
WITH per_supp AS (
  SELECT l_suppkey, sum(l_quantity) AS total_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_name AS nation, total_qty
FROM per_supp
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE total_qty > (SELECT sum(total_qty) / count(*) * 1.5 FROM per_supp)
"""


# --------------------------------------------------------------------------
# Q2 — min-cost supplier (adapted: no partsupp, so "cost" is the supplier's
# average unit price observed in lineitem). Ratio is off-grid → floor-
# truncated over grid-rounded sums; argmin keeps ties via rank over the
# truncated value (identical on both engines).
# --------------------------------------------------------------------------


def q_min_cost_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10).select(
        "p_partkey", "p_brand", "p_size"
    )
    unit = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_partkey", "p_brand", "l_suppkey")
        .agg(
            (
                F.floor(
                    F.round(F.sum("l_extendedprice"), 2)
                    / F.sum("l_quantity") * 10000
                ) / 10000
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("unit_cost"), F.col("l_suppkey"))
    best = unit.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        best.join(s, best["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .select(
            "p_partkey", "p_brand", "s_name",
            F.col("n_name").alias("nation"), "unit_cost",
        )
    )


ORACLE_Q2 = """
WITH unit AS (
  SELECT p_partkey, p_brand, l_suppkey,
         floor(round(sum(l_extendedprice), 2) / sum(l_quantity) * 10000) / 10000 AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_size < 10
  GROUP BY p_partkey, p_brand, l_suppkey
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY p_partkey ORDER BY unit_cost, l_suppkey) AS rk
    FROM unit
  ) WHERE rk = 1
)
SELECT p_partkey, p_brand, s_name, n_name AS nation, unit_cost
FROM best
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
"""


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted: "late" = shipped >60
# days after the order date, since commit/receipt dates don't exist). A
# supplier is charged for a multi-supplier order iff it is the ONLY late
# one — the exists/not-exists pair collapses to per-order flag sums, all
# exact integer arithmetic.
# --------------------------------------------------------------------------


def q_late_suppliers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    flags = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
                ).otherwise(0)
            ).alias("late")
        )
    )
    per_order = flags.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    sole_late = (
        flags.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1) & (F.col("late") == 1))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "numwait")
    )


ORACLE_Q21 = """
WITH flags AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
),
per_order AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
  FROM flags GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM flags
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_late = 1 AND late = 1
GROUP BY s_suppkey, s_name
"""


SPECS = [
    QuerySpec("q4_order_priority", q_order_priority, ORACLE_Q4, tags=("tpch",)),
    QuerySpec("q2_min_cost_supplier", q_min_cost_supplier, ORACLE_Q2, tags=("tpch",)),
    QuerySpec("q20_promo_suppliers", q_promo_suppliers, ORACLE_Q20, tags=("tpch",)),
    QuerySpec("q21_late_suppliers", q_late_suppliers, ORACLE_Q21, tags=("tpch",)),
    QuerySpec("q6_forecast_revenue", q_forecast_revenue, ORACLE_Q6, tags=("tpch", "bench")),
    QuerySpec("q7_volume_shipping", q_volume_shipping, ORACLE_Q7, tags=("tpch",)),
    QuerySpec("q8_market_share", q_market_share, ORACLE_Q8, tags=("tpch",)),
    QuerySpec("q9_product_profit", q_product_profit, ORACLE_Q9, tags=("tpch", "bench")),
    QuerySpec("q10_returned_items", q_returned_items, ORACLE_Q10, tags=("tpch",)),
    QuerySpec("q12_priority_shipping", q_priority_shipping, ORACLE_Q12, tags=("tpch",)),
    QuerySpec("q13_cust_distribution", q_customer_distribution, ORACLE_Q13, tags=("tpch",)),
    QuerySpec("q14_promo_effect", q_promo_effect, ORACLE_Q14, tags=("tpch",)),
    QuerySpec("q15_top_supplier", q_top_supplier, ORACLE_Q15, tags=("tpch",)),
    QuerySpec("q16_parts_supplier", q_parts_supplier_cnt, ORACLE_Q16, tags=("tpch",)),
    QuerySpec("q17_small_qty", q_small_qty_revenue, ORACLE_Q17, tags=("tpch",)),
    QuerySpec("q18_large_volume", q_large_volume_customer, ORACLE_Q18, tags=("tpch",)),
    QuerySpec("q19_discounted_revenue", q_discounted_revenue, ORACLE_Q19, tags=("tpch",)),
    QuerySpec("q22_idle_customers", q_idle_customers, ORACLE_Q22, tags=("tpch",)),
]
