"""Property-based tests (hypothesis): operators vs naive Python reference
implementations on generated data — SURVEY §5's missing-in-reference test
depth. Example counts are kept small because each example round-trips
through Spark."""

import datetime as dt
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gmall_flink_230422_spark.functions.hashing import portable_hash64
from gmall_flink_230422_spark.operators import dedup
from gmall_flink_230422_spark.operators import similarity as similarity_mod
from gmall_flink_230422_spark.operators.stateful import detect_bounces, latest_by_key
from gmall_flink_230422_spark.streaming.joins import session_agg

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

T0 = dt.datetime(2024, 1, 1)


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5), st.text("ab", max_size=3)),
        min_size=1,
        max_size=30,
    )
)
def test_latest_by_key_matches_fold(spark, rows):
    """Changelog compaction == dict fold in (key, seq, uniq-tiebreak) order."""
    data = [(k, s, i, v) for i, (k, s, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["k", "seq", "uniq", "v"])
    got = {
        r["k"]: (r["seq"], r["uniq"], r["v"])
        for r in latest_by_key(df, ["k"], [F.col("seq"), F.col("uniq")]).collect()
    }
    want = {}
    for k, s, i, v in data:
        if k not in want or (s, i) > want[k][:2]:
            want[k] = (s, i, v)
    assert got == want


@SLOW
@given(
    deltas=st.lists(st.integers(0, 40), min_size=1, max_size=20),
    gap=st.integers(5, 15),
)
def test_session_agg_matches_python_sessionizer(spark, deltas, gap):
    """Session windows: same (start, end, count) sets as a linear scan with
    the gap rule end = last_event + gap."""
    ts, acc = [], 0
    for d in deltas:
        acc += d
        ts.append(T0 + dt.timedelta(seconds=acc))
    df = spark.createDataFrame([(1, t) for t in ts], ["k", "ts"])
    got = {
        (r["session_start"], r["session_end"], r["ct"])
        for r in session_agg(
            df, "ts", f"{gap} seconds", ["k"], [F.count(F.lit(1)).alias("ct")]
        ).collect()
    }
    want = set()
    uniq = sorted(set(ts))
    start, prev, n = uniq[0], uniq[0], 0
    counts = {t: ts.count(t) for t in uniq}
    for t in uniq:
        if (t - prev).total_seconds() > gap:
            want.add((int(start.timestamp()), int(prev.timestamp()) + gap, n))
            start, n = t, 0
        n += counts[t]
        prev = t
    want.add((int(start.timestamp()), int(prev.timestamp()) + gap, n))
    assert got == want


@SLOW
@given(
    texts=st.lists(st.text("abc d", min_size=0, max_size=12), min_size=1, max_size=12)
)
def test_exact_dedup_partition_property(spark, texts):
    """Dedup groups partition the corpus: counts sum to N, canonicals are
    group minima, distinct normalized texts == number of groups."""
    data = list(enumerate(texts))
    df = spark.createDataFrame(data, ["doc_id", "text"])
    rows = dedup.exact_dedup_groups(df).collect()
    assert sum(r["n_docs"] for r in rows) == len(data)
    norm = {}
    for i, t in data:
        norm.setdefault(t.strip().lower(), []).append(i)
    assert len(rows) == len(norm)
    assert {r["canonical_id"] for r in rows} == {min(v) for v in norm.values()}


@SLOW
@given(s=st.text(min_size=0, max_size=20))
def test_portable_hash_matches_python_md5(spark, s):
    """The Spark conv/substr/md5 construction == python int(md5[:15], 16)."""
    df = spark.createDataFrame([(s,)], ["x"])
    got = df.select(portable_hash64(F.col("x")).alias("h")).collect()[0]["h"]
    want = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert got == want


@SLOW
@given(
    deltas=st.lists(st.integers(1, 30), min_size=1, max_size=15),
    gap=st.integers(5, 15),
)
def test_bounce_detection_matches_simulation(spark, deltas, gap):
    """Batch bounce predicate == linear per-key simulation: an entry (gap
    from predecessor) is a bounce iff its successor is absent within the
    gap or is itself an entry."""
    ts, acc = [], 0
    for d in deltas:
        acc += d
        ts.append(T0 + dt.timedelta(seconds=acc))
    df = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(ts)], ["k", "ts", "eid"]
    )
    got = {
        r["eid"]
        for r in detect_bounces(df, "k", "ts", gap, ["eid"]).collect()
        if r["is_bounce"]
    }
    want = set()
    for i, t in enumerate(ts):
        is_entry = i == 0 or (t - ts[i - 1]).total_seconds() > gap
        if not is_entry:
            continue
        if i + 1 == len(ts):
            want.add(i)
        else:
            nxt = ts[i + 1]
            if (nxt - t).total_seconds() > gap:
                want.add(i)
    assert got == want


@SLOW
@given(
    lefts=st.lists(st.integers(0, 50), min_size=1, max_size=15),
    rights=st.lists(st.integers(0, 50), min_size=0, max_size=10),
    forward=st.booleans(),
)
def test_asof_join_matches_linear_scan(spark, lefts, rights, forward):
    """Both as-of directions == the obvious per-row linear scan (latest
    right <= left, or first right >= left), including tie timestamps."""
    from gmall_flink_230422_spark.operators.joins import asof_join

    rights = sorted(set(rights))
    l_df = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(lefts)], ["k", "lts", "lid"]
    )
    r_df = spark.createDataFrame(
        [(1, t, t * 10) for t in rights], "k long, rts long, pay long"
    )
    got = {
        r["lid"]: r["pay"]
        for r in asof_join(
            l_df, r_df, ["k"], "lts", "rts", ["pay"],
            direction="forward" if forward else "backward",
        ).collect()
    }
    for i, t in enumerate(lefts):
        if forward:
            cand = [r for r in rights if r >= t]
            want = min(cand) * 10 if cand else None
        else:
            cand = [r for r in rights if r <= t]
            want = max(cand) * 10 if cand else None
        assert got[i] == want, (t, rights, forward)


@SLOW
@given(
    texts=st.lists(st.text("ab ", min_size=0, max_size=12), min_size=1, max_size=8),
    size=st.integers(1, 4),
)
def test_chunk_dedup_conserves_chunks(spark, texts, size):
    """kept + dup == total per doc; corpus-wide kept == number of DISTINCT
    chunk strings; and a chunk's first (doc, chunk_id) owner is kept."""
    from gmall_flink_230422_spark.operators import text as topo

    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = topo.chunk_dedup(docs, size=size).collect()
    # python reference chunking
    all_chunks = []
    for did, t in enumerate(texts):
        toks = [w for w in t.lower().strip().split() if w]
        for c in range(0, len(toks), size):
            all_chunks.append((did, " ".join(toks[c : c + size])))
    per_doc_total = {}
    for did, _ in all_chunks:
        per_doc_total[did] = per_doc_total.get(did, 0) + 1
    assert {r["doc_id"]: r["n_chunks"] for r in out} == per_doc_total
    for r in out:
        assert r["kept_chunks"] + r["dup_chunks"] == r["n_chunks"]
    assert sum(r["kept_chunks"] for r in out) == len({c for _, c in all_chunks})


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20), st.text("xy", min_size=1, max_size=2)),
        min_size=1, max_size=15,
    )
)
def test_changelog_retract_reconstructs_state(spark, rows):
    """Replaying the retract stream into a dict (apply +I/+U, check -U
    retracts the standing value) ends at exactly latest-per-key state."""
    from gmall_flink_230422_spark.operators.stateful import changelog_to_retract

    data = [(k, s, i, v) for i, (k, s, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["k", "seq", "uniq", "v"])
    stream = changelog_to_retract(
        df, ["k"], [F.col("seq"), F.col("uniq")], ["v"]
    ).collect()
    state: dict = {}
    for r in sorted(stream, key=lambda r: (r["k"], r["version"], r["row_kind"] != "-U")):
        if r["row_kind"] == "-U":
            assert state[r["k"]] == r["v"], "retraction must name the standing value"
        else:
            state[r["k"]] = r["v"]
    want = {}
    for k, s, i, v in data:
        if k not in want or (s, i) > want[k][:2]:
            want[k] = (s, i, v)
    assert state == {k: v for k, (s, i, v) in want.items()}


@SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
    ),
)
def test_pagerank_matches_python_fold(spark, edges):
    """Integer-grid PageRank == a dict-based Python reference running the
    identical integer recurrence on the same (deduped, undirected) edges."""
    from gmall_flink_230422_spark.operators import graph

    und = sorted({(f"n{a}", f"n{b}") for a, b in edges} | {(f"n{b}", f"n{a}") for a, b in edges})
    df = spark.createDataFrame(und, "src string, dst string")
    got = {r["node"]: r["rank_micro"] for r in graph.pagerank(df, iterations=3).collect()}

    nodes = sorted({s for s, _ in und} | {d for _, d in und})
    out = {}
    for s, d in und:
        out.setdefault(s, []).append(d)
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        contrib = {n: 0 for n in nodes}
        for s, ds in out.items():
            c = rank[s] // len(ds)
            for d in ds:
                contrib[d] += c
        rank = {n: 150_000 + (85 * contrib[n]) // 100 for n in nodes}
    assert got == rank


@SLOW
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=5, max_size=40), min_size=2, max_size=8
    ),
)
def test_containment_dominates_jaccard(spark, texts):
    """For every pair: max(cont_a, cont_b) >= jaccard (containment divides by
    one set, jaccard by the union), and containment <= 1."""
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    sh = dedup.shingles(docs)
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup.jaccard_pairs(sh, threshold=0.0).collect()}
    cont = {(r["doc_a"], r["doc_b"]): (r["cont_a"], r["cont_b"])
            for r in dedup.containment_pairs(sh, threshold=0.0).collect()}
    assert set(jac) == set(cont)
    for pair, j in jac.items():
        ca, cb = cont[pair]
        assert max(ca, cb) >= j
        assert ca <= 1.0 and cb <= 1.0


@SLOW
@given(
    vals=st.lists(st.integers(0, 10_000), min_size=1, max_size=40),
)
def test_winsorize_thresholds_match_nearest_rank(spark, vals):
    """e_winsorize's histogram rank selection == sorting and indexing at
    ceil(p*n) in plain Python; the clamped mean sits inside [p05, p95]."""
    import gmall_flink_230422_spark.plans.analytics as an

    rows = [(f"P{i % 2}", v / 100.0) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "o_orderpriority string, o_totalprice double")
    an_load = an.load_table
    try:
        an.load_table = lambda spark, sf, name: df
        out = {r["o_orderpriority"]: r for r in an.q_winsorize(spark, "unused").collect()}
    finally:
        an.load_table = an_load

    groups: dict[str, list[int]] = {}
    for i, v in enumerate(vals):
        groups.setdefault(f"P{i % 2}", []).append(v)
    for g, cents in groups.items():
        cents.sort()
        n = len(cents)
        lo = cents[-(-n * 1 // 20) - 1]   # ceil(0.05n)-th value, 1-indexed
        hi = cents[-(-n * 19 // 20) - 1]  # ceil(0.95n)-th
        r = out[g]
        assert r["p05"] == lo / 100.0
        assert r["p95"] == hi / 100.0
        assert r["p05"] <= r["winsor_mean"] <= r["p95"]


def test_weighted_sample_ln_floor_parity(spark):
    """ADVICE r3 pin: x_weighted_sample's oracle parity rests on
    floor(-ln(u)*1e8) agreeing between JVM Math.log (Spark) and libm ln
    (DuckDB) — neither guaranteed correctly rounded. u lives on the fixed
    (m+1)/1000001 grid, m in [0, 1e6), so the ONLY places a sub-ulp ln
    difference could flip the floor are grid points where -ln(u)*1e8 sits
    within ~5e-7 (the double error budget at 1e9 magnitude) of an integer.
    Enumerate every point within 1e-5 of a boundary — a 20x safety margin —
    and assert both engines produce identical floors on exactly those."""
    import math

    import duckdb

    danger = []
    for m in range(1_000_000):
        x = -math.log((m + 1) / 1_000_001.0) * 1e8
        fr = x - math.floor(x)
        if fr < 1e-5 or fr > 1 - 1e-5:
            danger.append(m)
    assert danger, "u grid unexpectedly has no near-boundary points"

    sdf = spark.createDataFrame([(m,) for m in danger], "m bigint")
    spark_floors = {
        r["m"]: r["f"]
        for r in sdf.select(
            "m",
            F.floor(-F.log((F.col("m") + 1) / F.lit(1_000_001.0)) * 1e8)
            .cast("bigint")
            .alias("f"),
        ).collect()
    }
    con = duckdb.connect()
    duck_floors = dict(
        con.execute(
            "SELECT m, floor(-ln((m + 1) / 1000001.0) * 1e8)::BIGINT"
            " FROM (SELECT unnest(?::BIGINT[]) AS m)",
            [danger],
        ).fetchall()
    )
    assert spark_floors == duck_floors


@SLOW
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=24),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(2, 4),
)
def test_duplicated_spans_matches_brute_force(spark, docs, k):
    """duplicated_spans == a brute-force Python reimplementation: mark
    every position whose k-gram occurs >= 2 times corpus-wide (positions
    kept per occurrence, within-doc repeats included), merge overlapping
    or adjacent covered ranges, compare the exact span set. A tiny
    4-letter token alphabet forces heavy collisions so duplication,
    self-repeats, and merges all occur."""
    from gmall_flink_230422_spark.operators.dedup import duplicated_spans

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in duplicated_spans(df, k=k).collect()
    }

    from collections import Counter

    grams = Counter()
    per_doc: dict[int, list[int]] = {}
    for i, toks in enumerate(docs):
        for p in range(len(toks) - k + 1):
            grams[tuple(toks[p : p + k])] += 1
    for i, toks in enumerate(docs):
        per_doc[i] = [
            p + 1  # 1-based
            for p in range(len(toks) - k + 1)
            if grams[tuple(toks[p : p + k])] >= 2
        ]
    want = set()
    for i, ps in per_doc.items():
        span: list[int] | None = None
        end = -1
        for p in ps:
            if span is None or p > end + 1:
                if span is not None:
                    want.add((i, span[0], end, len(span)))
                span = [p]
            else:
                span.append(p)
            end = max(end, p + k - 1)
        if span is not None:
            want.add((i, span[0], end, len(span)))
    assert got == want


@SLOW
@given(
    vecs=st.lists(
        st.lists(st.integers(-4, 4), min_size=3, max_size=3),
        min_size=2,
        max_size=8,
        unique_by=tuple,
    ),
    k_select=st.integers(1, 3),
)
def test_mmr_rerank_matches_brute_force(spark, vecs, k_select):
    """mmr_rerank == a direct Python reimplementation of greedy MMR on the
    same floor(cos*1e4) integer grid: candidates = all non-query vectors
    (k_candidates >= n), rank 1 = max relevance, then argmax of
    2*rel - max_sim_to_selected with (score desc, id) tiebreak. Small
    integer grids make ties common — exactly the cases where a tiebreak
    bug or grid mismatch would diverge."""
    import math

    # skip all-zero vectors (cosine undefined); query is vec id 0
    vecs = [v for v in vecs if any(x != 0 for x in v)]
    if len(vecs) < 2:
        return
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    k_sel = min(k_select, len(vecs) - 1)
    got = {
        (r["sel_rank"], r["vec_id"], r["mmr_score"])
        for r in similarity_mod.mmr_rerank(
            df, q, k_candidates=len(vecs), k_select=k_sel
        ).collect()
    }

    def fcos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return math.floor(dot / (na * nb) * 10000)

    qv = vecs[0]
    cands = {i: fcos([float(x) for x in v], [float(x) for x in qv])
             for i, v in enumerate(vecs) if i != 0}
    want = set()
    selected: list[int] = []
    for rank in range(1, k_sel + 1):
        best = None
        for i, rel in cands.items():
            if i in selected:
                continue
            if rank == 1:
                score = 2 * rel
            else:
                score = 2 * rel - max(
                    fcos([float(x) for x in vecs[i]], [float(x) for x in vecs[s]])
                    for s in selected
                )
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, score)
        want.add((rank, best[1], best[2]))
        selected.append(best[1])
    assert got == want


@SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=40,
    )
)
def test_kcore_peel_matches_local_on_random_graphs(spark, edges):
    """The distributed synchronized 2-core peel (the x_kcore_peel round
    body: degree filter + two semi-joins per round) must match a plain
    Python peel on random graphs, per round — including graphs with
    isolated edges, chains, and self-loop-free multi-edges (dedup'd to a
    simple a<b edge set, as the query does)."""
    from pyspark.sql import functions as F

    simple = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    if not simple:
        return
    e_df = spark.createDataFrame(simple, "a long, b long").localCheckpoint()
    e_py = set(simple)
    for _ in range(3):
        # local peel
        deg: dict = {}
        for a, b in e_py:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, c in deg.items() if c >= 2}
        e_py = {(a, b) for a, b in e_py if a in keep and b in keep}
        # distributed peel (the q_kcore_peel round body)
        d = (
            e_df.select(F.col("a").alias("n"))
            .unionByName(e_df.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("ct"))
        )
        k = d.filter(F.col("ct") >= 2).select("n")
        e_df = (
            e_df.join(k.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(k.withColumnRenamed("n", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        got = {(r["a"], r["b"]) for r in e_df.collect()}
        assert got == e_py
