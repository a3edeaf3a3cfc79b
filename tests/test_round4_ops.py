"""Round-4 operator additions vs naive Python references: triangle
counting (degree-ordered orientation), stupid-backoff trigram scoring,
curriculum phase budgeting, soft-dedup reweighting, dyadic EWMA. These are
the hand-sized semantic checks complementing the DuckDB oracle parity the
registry queries get (x_triangle_count, x_backoff_lm, x_curriculum_order,
x_soft_dedup, e_ewma)."""

from __future__ import annotations

import datetime as dt
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gmall_flink_230422_spark.operators import dedup, graph, text

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


# ---------------------------------------------------------------- triangles
def _brute_triangles(pairs):
    """node -> triangle count, by enumerating all 3-subsets of neighbors."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = dict.fromkeys(adj, 0)
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            tri[u] += 1
            tri[v] += 1
            tri[w] += 1
    deg = {n: len(ns) for n, ns in adj.items()}
    return deg, tri


@SLOW
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=25
    )
)
def test_triangle_count_matches_bruteforce(spark, pairs):
    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    e = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["node"]: r for r in graph.triangle_count(e).collect()}
    deg, tri = _brute_triangles(pairs)
    assert set(got) == set(deg)
    for n in deg:
        assert got[n]["degree"] == deg[n]
        assert got[n]["n_triangles"] == tri[n]
        want_lcc = (
            (2 * tri[n] * 1_000_000) // (deg[n] * (deg[n] - 1)) if deg[n] >= 2 else 0
        )
        assert got[n]["lcc_micro"] == want_lcc


def test_triangle_clique_has_full_clustering(spark):
    # K4: every node sits in C(3,2)=3 triangles, lcc = 1.0 exactly.
    e = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b], "src long, dst long"
    )
    rows = graph.triangle_count(e).collect()
    assert all(r["n_triangles"] == 3 and r["lcc_micro"] == 1_000_000 for r in rows)


# ---------------------------------------------------------------- backoff LM
def _brute_backoff(train_toks, held_docs):
    """doc_id -> (n, ssum) under stupid backoff on integer 1e-6 grid."""
    c1, c2, c3 = {}, {}, {}
    n_train = 0
    for toks in train_toks:
        n_train += len(toks)
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            c3[(a, b, c)] = c3.get((a, b, c), 0) + 1
    out = {}
    for doc_id, toks in held_docs:
        scores = []
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            if (a, b, c) in c3:
                s = (1_000_000 * c3[(a, b, c)]) // c2[(a, b)]
            elif (b, c) in c2:
                s = (400_000 * c2[(b, c)]) // c1[b]
            else:
                s = (160_000 * c1.get(c, 0)) // n_train
            scores.append(s)
        if scores:
            out[doc_id] = (len(scores), sum(scores))
    return out


def test_backoff_lm_branches_match_python(spark):
    # Construct a corpus where every backoff branch fires on the held-out
    # docs, then force the split by choosing doc ids empirically: instead
    # of relying on hash buckets we call the operator with
    # heldout_buckets=1000 inverted — simpler: score with the operator's
    # own split and mirror the same split in the reference.
    import gmall_flink_230422_spark.functions.hashing as hs

    docs = [
        (i, t)
        for i, t in enumerate(
            [
                "a b c a b c a b d",
                "b c d e f g",
                "a b c x y z",
                "q r s t u v w",
                "a b c a b e",
                "m n o p q r",
                "x y z zz x y",
                "c a b c a b",
                "e f g h i j",
                "zz yy xx a b c",
            ]
        )
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_trigrams"], r["sum_score_micro"], r["avg_score_micro"])
        for r in text.backoff_trigram_score(df, heldout_buckets=500).collect()
    }
    # mirror the md5 split in Python
    import hashlib

    def bucket(i):
        return int(hashlib.md5(f"lmsplit:{i}".encode()).hexdigest()[:15], 16) % 1000

    held = [(i, t.split()) for i, t in docs if bucket(i) < 500]
    train = [t.split() for i, t in docs if bucket(i) >= 500]
    want = _brute_backoff(train, held)
    assert set(out) == set(want)
    for d, (n, ssum) in want.items():
        assert out[d] == (n, ssum, ssum // n)
    assert out  # split produced at least one held-out doc


# ---------------------------------------------------------------- curriculum
def test_curriculum_phases_budget_and_order(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 40))) for i in range(60)],
        "doc_id long, text string",
    )
    rows = text.curriculum_phases(docs).collect()
    assert len(rows) == 60
    by_phase = {}
    for r in rows:
        by_phase.setdefault(r["phase"], []).append(r)
    total = sum(r["n_tokens"] for r in rows)
    warm = sum(r["n_tokens"] for r in by_phase.get("warmup", []))
    # phase boundaries land on logit-grid bucket edges: warmup may only
    # exceed 20% by less than one bucket's mass (its last bucket crossed).
    if by_phase.get("warmup"):
        min_warm_bucket = min(
            sum(x["n_tokens"] for x in by_phase["warmup"] if x["logit_milli"] == lg)
            for lg in {x["logit_milli"] for x in by_phase["warmup"]}
        )
        assert warm * 100 <= total * 20 + min_warm_bucket * 100
    # difficulty ordering: every warmup logit >= every main logit >= anneal
    lo = lambda ph: [r["logit_milli"] for r in by_phase.get(ph, [])]
    if lo("warmup") and lo("main"):
        assert min(lo("warmup")) >= max(lo("main"))
    if lo("main") and lo("anneal"):
        assert min(lo("main")) >= max(lo("anneal"))
    # same logit -> same phase (grid semantic)
    seen = {}
    for r in rows:
        assert seen.setdefault(r["logit_milli"], r["phase"]) == r["phase"]


# ---------------------------------------------------------------- soft dedup
def test_soft_dedup_weight_mass(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id long"
    )
    members = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (5, 5), (6, 5)], "doc_id long, cluster_id long"
    )
    out = {r["doc_id"]: r for r in dedup.soft_dedup_weights(docs, members).collect()}
    assert len(out) == 8
    # cluster of 3: each weight 333333; cluster of 2: 500000; singletons 1e6
    for d in (0, 1, 2):
        assert out[d]["cluster_size"] == 3 and out[d]["weight_micro"] == 333_333
    for d in (5, 6):
        assert out[d]["cluster_size"] == 2 and out[d]["weight_micro"] == 500_000
    for d in (3, 4, 7):
        assert out[d]["cluster_size"] == 1 and out[d]["weight_micro"] == 1_000_000
    # cluster mass never exceeds 1.0 and is within one ulp-per-member of it
    for size, members_ids in ((3, (0, 1, 2)), (2, (5, 6))):
        mass = sum(out[d]["weight_micro"] for d in members_ids)
        assert 1_000_000 - size < mass <= 1_000_000


# ---------------------------------------------------------------- EWMA
@SLOW
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50_000)),
        min_size=1,
        max_size=30,
    )
)
def test_ewma_matches_python_loop(spark, vals):
    from gmall_flink_230422_spark.plans.analytics import q_ewma  # noqa: F401

    # build an events-shaped frame and run the same dyadic kernel in Python
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=i), int(u), cents / 100.0, "e", "{}")
        for i, (u, cents) in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double, event_type string, props string"
    )
    df.createOrReplaceTempView("_ewma_events")

    class _SF:
        pass

    # call the plan fn against a shim loader by monkey-patching load_table
    import gmall_flink_230422_spark.plans.analytics as A

    orig = A.load_table
    A.load_table = lambda spark, sf_dir, name: df
    try:
        got = {r["event_id"]: r for r in q_ewma(spark, "unused").collect()}
    finally:
        A.load_table = orig

    per_user = {}
    for i, (u, cents) in enumerate(vals):
        per_user.setdefault(u, []).append((i, cents))
    for u, seq in per_user.items():
        hist = []
        for i, cents in seq:
            hist.append(cents)
            k = min(len(hist), 8)
            wsum = sum(
                hist[-1 - j] * (1 << (7 - j)) for j in range(k)
            )
            mass = 256 - (1 << (8 - k))
            assert got[i]["ewma_cents"] == wsum // mass
            assert got[i]["n_in_frame"] == k
            assert got[i]["v_cents"] == cents


def test_ewma_stream_truncates_negative(spark, tmp_path):
    """r4 ADVICE: ewma_stream scored with Python // (floor), while the
    batch e_ewma window and its DuckDB oracle truncate toward zero (Spark
    DIV / DuckDB //) — divergent by 1 on any negative weighted sum. Drive
    the streaming kernel over negative v_cents and pin it to the
    truncation kernel the batch window computes."""
    from gmall_flink_230422_spark.sources.files import stream_parquet
    from gmall_flink_230422_spark.streaming.stateful import ewma_stream

    cents = [-101, -57, 42, -999, 13, -1]
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, i, t0 + dt.timedelta(seconds=i), c) for i, c in enumerate(cents)
    ]
    schema = "user_id long, event_id long, ts timestamp, v_cents long"
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    out = ewma_stream(
        stream_parquet(spark, src, spark.read.parquet(src).schema),
        key="user_id",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_neg_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["event_id"]: r["ewma_cents"]
        for r in spark.sql("SELECT * FROM ewma_neg_sink").collect()
    }

    hist: list[int] = []
    for i, c in enumerate(cents):
        hist.append(c)
        k = min(len(hist), 8)
        wsum = sum(hist[-1 - j] * (1 << (7 - j)) for j in range(k))
        mass = 256 - (1 << (8 - k))
        want = -((-wsum) // mass) if wsum < 0 else wsum // mass
        assert got[i] == want, (i, got[i], want)
    # the floor kernel MUST disagree somewhere, or this test is vacuous
    assert any(
        (
            sum(cents[max(0, i + 1 - 8) : i + 1][::-1][j] * (1 << (7 - j))
                for j in range(min(i + 1, 8)))
        ) % (256 - (1 << (8 - min(i + 1, 8)))) != 0
        and sum(cents[max(0, i + 1 - 8) : i + 1][::-1][j] * (1 << (7 - j))
                for j in range(min(i + 1, 8))) < 0
        for i in range(len(cents))
    )
