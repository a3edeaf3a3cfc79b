"""Graph operators (operators/graph.py) + retrieval index + containment +
winsorize — hand-sized semantic checks complementing the DuckDB oracle
parity the registry queries get (x_pagerank, x_degree_hist,
x_inverted_index, x_index_intersect, x_containment, e_winsorize)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_230422_spark.operators import dedup, graph, retrieval


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_symmetric_pair_equal_ranks(spark):
    # two nodes, one undirected edge: perfectly symmetric -> equal ranks,
    # and the damped fixed point at rank 1.0 (each sends its whole rank)
    e = graph.undirected(_edges(spark, [("a", "b")]))
    rows = {r["node"]: r["rank_micro"] for r in graph.pagerank(e, iterations=3).collect()}
    assert rows["a"] == rows["b"]
    # base 0.15 + 0.85 * 1.0 = 1.0 exactly on the integer grid
    assert rows["a"] == 1_000_000


def test_pagerank_hub_outranks_leaves(spark):
    # star: hub h connected to 3 leaves (undirected). Hub absorbs 3 full
    # contributions, leaves get 1/3 each -> hub rank strictly higher.
    e = graph.undirected(_edges(spark, [("h", "l1"), ("h", "l2"), ("h", "l3")]))
    rows = {r["node"]: r["rank_micro"] for r in graph.pagerank(e, iterations=2).collect()}
    assert rows["h"] > rows["l1"]
    assert rows["l1"] == rows["l2"] == rows["l3"]


def test_pagerank_dangling_node_decays(spark):
    # directed chain a -> b: b never sends anything back; a ends at the
    # pure base term once its initial mass has flowed out.
    ranks = {r["node"]: r["rank_micro"]
             for r in graph.pagerank(_edges(spark, [("a", "b")]), iterations=3).collect()}
    assert ranks["a"] == 150_000 + (85 * 0) // 100
    assert ranks["b"] > ranks["a"]


def test_inverted_index_postings_capped_and_sorted(spark):
    docs = spark.createDataFrame(
        [(i, "common unique%d" % i) for i in range(12)], "doc_id long, text string"
    )
    out = retrieval.inverted_index(docs, top_terms=5, postings_cap=8).collect()
    by_term = {r["term"]: r for r in out}
    assert by_term["common"]["df"] == 12
    assert by_term["common"]["postings"] == list(range(8))  # capped, sorted


def test_conjunctive_query_intersects(spark):
    # df ranks: t1 (4 docs), t2 (3), t3 (2) -> picks ranks 2,3 = t2,t3;
    # only doc 1 holds both
    docs = spark.createDataFrame(
        [(0, "t1 t2"), (1, "t1 t2 t3"), (2, "t1 t3x t2"), (3, "t1 t3")],
        "doc_id long, text string",
    )
    got = sorted(r["doc_id"] for r in retrieval.conjunctive_topdf_query(docs, ranks=(2, 3)).collect())
    assert got == [1]


def test_containment_catches_subset_jaccard_misses(spark):
    # short doc fully contained in a long doc: containment from the short
    # side is 1.0 while Jaccard is small
    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(20))
    docs = spark.createDataFrame([(1, short), (2, long_)], "doc_id long, text string")
    sh = dedup.shingles(docs)
    pairs = dedup.containment_pairs(sh, threshold=0.9).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert p["cont_a"] == 1.0  # doc 1 (smaller id) fully inside doc 2
    assert p["cont_b"] < 0.2
    jac = dedup.jaccard_pairs(sh, threshold=0.0).collect()[0]["jaccard"]
    assert jac < 0.2  # Jaccard alone would never flag this pair


def test_winsorize_invariants(spark):
    from gmall_flink_230422_spark.plans.analytics import q_winsorize

    for r in q_winsorize(spark, "/root/testdata/sf0.001").collect():
        assert r["p05"] <= r["p95"]
        assert r["p05"] <= r["winsor_mean"] <= r["p95"]
        assert r["n_orders"] > 0


def test_ppr_isolated_seed_keeps_restart_mass(spark):
    """ADVICE r3: a seed with no edges must surface as an isolated node at
    the pure restart rank (base_micro), not silently vanish from the
    personalized PageRank output."""
    e = graph.undirected(_edges(spark, [("a", "b")]))
    seeds = spark.createDataFrame([("z",), ("a",)], "node string")
    rows = {r["node"]: r["rank_micro"]
            for r in graph.pagerank(e, iterations=3, seeds=seeds).collect()}
    assert "z" in rows
    assert rows["z"] == 150_000  # base term only: no in-edges, no decay
    assert rows["a"] > rows["z"]


def test_pagerank_checkpoint_bounds_plan_depth(spark):
    """checkpoint_every truncates iterative lineage: at iterations=10 the
    checkpointed plan must be MUCH shallower than the uncheckpointed one
    (a LogicalRDD scan replaces the 8-iterations-deep join tree), and the
    ranks must be identical."""
    e = graph.undirected(_edges(spark, [("a", "b"), ("b", "c"), ("c", "d")]))
    e = e.cache()
    free = graph.pagerank(e, iterations=10)
    ckpt = graph.pagerank(e, iterations=10, checkpoint_every=3)
    depth_free = free._jdf.queryExecution().analyzed().treeString().count("\n")
    depth_ckpt = ckpt._jdf.queryExecution().analyzed().treeString().count("\n")
    assert depth_ckpt < depth_free / 2
    assert sorted(map(tuple, ckpt.collect())) == sorted(map(tuple, free.collect()))
