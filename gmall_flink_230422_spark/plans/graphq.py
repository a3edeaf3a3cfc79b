"""Graph-analytics extension queries: PageRank quality prior and degree
profiling over the customer↔supplier trade graph.

The graph is derived from the TPC-H-ish fixtures: an undirected edge for
every distinct (customer, supplier) pair that traded (orders ⋈ lineitem),
node ids prefixed ``c:`` / ``s:`` so the two key spaces cannot collide.
This is the bipartite interaction-graph shape a crawl pipeline uses for
link-authority weighting (operators/graph.py docstring); connected
components over the same kind of edge list live in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..operators import graph
from . import QuerySpec

_EDGES_CTE = """e0 AS (
  SELECT DISTINCT 'c:' || o_custkey::VARCHAR AS src,
         's:' || l_suppkey::VARCHAR AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)"""


def _trade_edges(spark, sf_dir):
    """Distinct undirected c:↔s: edge list from orders ⋈ lineitem.

    The pair-distinct happens on the directed frame (one shuffle); the
    reverse direction is projection-only (graph.undirected) because the
    prefixed src/dst domains are disjoint — no second distinct needed.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return graph.undirected(e0)


# r11 optimization (guide §2.3 — narrower shuffle keys): the trade-graph
# node ids are "c:<custkey>" / "s:<suppkey>" strings; 2k / 2k+1 is an exact
# BIJECTIVE integer encoding of that domain (no hash, no collision risk),
# so the three PageRank iterations shuffle/aggregate 8-byte bigints instead
# of variable-width strings, and the decode projection reproduces the
# original strings bit-for-bit for the oracle. Measured at sf0.1 together
# with the edge-side pre-partition in operators/graph.py: warm 1.55 →
# 1.24 s, identical output checksums.
_NODE_ENC = (
    "CASE WHEN substring({c}, 1, 2) = 'c:' "
    "THEN 2 * CAST(substring({c}, 3) AS BIGINT) "
    "ELSE 2 * CAST(substring({c}, 3) AS BIGINT) + 1 END"
)
_NODE_DEC = (
    "CASE WHEN {c} % 2 = 0 THEN concat('c:', CAST({c} div 2 AS STRING)) "
    "ELSE concat('s:', CAST(({c} - 1) div 2 AS STRING)) END"
)


def _encode_nodes(edges):
    return edges.select(
        F.expr(_NODE_ENC.format(c="src")).alias("src"),
        F.expr(_NODE_ENC.format(c="dst")).alias("dst"),
    )


def q_pagerank(spark, sf_dir):
    """3-iteration integer-grid PageRank over the trade graph — the
    link-authority prior for quality-weighted sampling. One hash shuffle
    per iteration; every arithmetic step is BIGINT so the unrolled DuckDB
    CTE oracle matches bit-for-bit (operators/graph.py). Iterations run
    on the bijective integer node encoding (_NODE_ENC above) and the
    result decodes back to the public string ids."""
    edges = _encode_nodes(_trade_edges(spark, sf_dir)).cache()
    r = graph.pagerank(edges, iterations=3)
    return r.select(F.expr(_NODE_DEC.format(c="node")).alias("node"), "rank_micro")


ORACLE_PAGERANK = graph.pagerank_oracle_sql(_EDGES_CTE, iterations=3)


def q_degree_hist(spark, sf_dir):
    """Degree histogram of the trade graph (how many nodes have degree k,
    split by node class) — the skew gauge you read BEFORE running an
    iterative graph algorithm at scale: a heavy-tailed histogram says the
    contribution shuffle needs salting on the hot nodes. Two hash
    aggregates, no window."""
    edges = _trade_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy(F.substring("src", 1, 1).alias("node_class"), "degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


ORACLE_DEGREE_HIST = f"""
WITH {_EDGES_CTE},
deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY 1)
SELECT substr(src, 1, 1) AS node_class, degree::BIGINT AS degree,
       count(*)::BIGINT AS n_nodes
FROM deg GROUP BY 1, 2
"""


SPECS = [
    QuerySpec("x_pagerank", q_pagerank, ORACLE_PAGERANK,
              doc="3-iteration integer-grid PageRank over the customer↔supplier trade graph",
              tags=("llm", "graph", "scale")),
    QuerySpec("x_degree_hist", q_degree_hist, ORACLE_DEGREE_HIST,
              doc="trade-graph degree histogram by node class — iterative-algorithm skew gauge",
              tags=("llm", "graph", "stats")),
]


def q_ppr(spark, sf_dir):
    """Personalized PageRank from nation-1 customers: restart mass lives
    only on the seed set, so rank measures trade-graph PROXIMITY to those
    customers (the related-supplier / recommendation signal) rather than
    global authority. Non-zero ranks only — at scale the reachable
    frontier, not the node universe. Same one-shuffle-per-iteration shape
    and bit-exact unrolled-CTE oracle as x_pagerank."""
    from ..io import load_table as _lt

    edges = _encode_nodes(_trade_edges(spark, sf_dir)).cache()
    cust = _lt(spark, sf_dir, "customer")
    # seeds are customers: the integer encoding of "c:<k>" is 2k directly
    seeds = cust.filter(F.col("c_nationkey") == 1).select(
        (F.lit(2) * F.col("c_custkey").cast("bigint")).alias("node")
    )
    r = graph.pagerank(edges, iterations=3, seeds=seeds)
    return r.filter(F.col("rank_micro") > 0).select(
        F.expr(_NODE_DEC.format(c="node")).alias("node"), "rank_micro"
    )


_PPR_CTE = _EDGES_CTE + """,
seeds AS (
  SELECT 'c:' || c_custkey::VARCHAR AS node FROM customer WHERE c_nationkey = 1
)"""

ORACLE_PPR = graph.pagerank_oracle_sql(_PPR_CTE, iterations=3, seeded=True) + \
    "\nWHERE rank_micro > 0"

SPECS.append(
    QuerySpec("x_ppr", q_ppr, ORACLE_PPR,
              doc="personalized PageRank from nation-1 customers — trade-graph proximity signal",
              tags=("llm", "graph", "scale"))
)
