"""Round-7 operators: hand-sized semantic checks complementing the DuckDB
oracle parity the registry queries get (x_kcore_peel, x_zipf_fit,
e_spearman, e_welch_t2, x_mrr_labels, s_stream_bottomk,
x_split_leakage)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from gmall_flink_230422_spark.plans import registry

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return registry()[name].fn(spark, SF).collect()


def test_kcore_peel_monotone_and_converged(spark):
    """Peel rounds can only shrink the graph, and a round that removes
    nothing is a fixed point — every later round must equal it."""
    rows = sorted(_rows(spark, "x_kcore_peel"), key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [0, 1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["n_edges"] <= a["n_edges"]
        if (a["n_nodes"], a["n_edges"]) == (b["n_nodes"], b["n_edges"]) and a["round"] > 0:
            # fixed point: all later rounds identical
            later = [r for r in rows if r["round"] >= a["round"]]
            assert len({(r["n_nodes"], r["n_edges"]) for r in later}) == 1
            break


def test_kcore_peel_hand_graph():
    """Driver-free semantics pin: a triangle + a pendant path peels to the
    triangle in one round (the pendant chain burns off end-first)."""
    # triangle 1-2-3 plus path 3-4-5
    edges = {(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)}
    e = set(edges)
    for _ in range(4):
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, c in deg.items() if c >= 2}
        e = {(a, b) for a, b in e if a in keep and b in keep}
    assert e == {(1, 2), (1, 3), (2, 3)}


def test_zipf_ilog2_is_exact_bit_length(spark):
    """length(bin(x)) - 1 == floor(log2(x)) exactly, including powers of
    two where IEEE log2 could round either way."""
    vals = [1, 2, 3, 4, 7, 8, 9, 1023, 1024, 1025, (1 << 40) - 1, 1 << 40]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r["x"]: r["k"]
        for r in df.select("x", (F.length(F.bin(F.col("x"))) - 1).alias("k")).collect()
    }
    for v in vals:
        assert got[v] == v.bit_length() - 1 == math.floor(math.log2(v))


def test_spearman_matches_local(spark):
    """e_spearman == plain-Python Spearman over the same per-customer
    aggregates with the same unique tiebreak."""
    o = spark.read.parquet(f"{SF}/orders.parquet")
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("c"),
        )
        .collect()
    )
    rx = {r["o_custkey"]: i + 1 for i, r in enumerate(sorted(per, key=lambda r: (r["n"], r["o_custkey"])))}
    ry = {r["o_custkey"]: i + 1 for i, r in enumerate(sorted(per, key=lambda r: (r["c"], r["o_custkey"])))}
    n = len(per)
    sd2 = sum((rx[k] - ry[k]) ** 2 for k in rx)
    # Spark DIV truncates toward zero; mirror that (Python // floors)
    num = 1000000 * (n * (n * n - 1) - 6 * sd2)
    den = n * (n * n - 1)
    expect = (abs(num) // den) * (1 if num >= 0 else -1)
    row = _rows(spark, "e_spearman")[0]
    assert row["n_customers"] == n
    assert row["sum_d2"] == sd2
    assert row["rho_micro"] == expect


def test_welch_t2_matches_local(spark):
    """e_welch_t2 == the same Welch statistic computed locally from exact
    cent moments."""
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    a = [round(r["value"] * 100) for r in ev if r["event_type"] == "click"]
    b = [round(r["value"] * 100) for r in ev if r["event_type"] == "view"]
    na, nb = len(a), len(b)
    sa, sb = sum(a), sum(b)
    ssa, ssb = sum(x * x for x in a), sum(x * x for x in b)
    va = (na * ssa - sa * sa) / (na * (na - 1))
    vb = (nb * ssb - sb * sb) / (nb * (nb - 1))
    t2 = (sa / na - sb / nb) ** 2 / (va / na + vb / nb)
    row = _rows(spark, "e_welch_t2")[0]
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["mean_a_cents"] == (abs(sa) // na) * (1 if sa >= 0 else -1)
    assert row["t2_micro"] == math.floor(1000000.0 * t2)


def test_mrr_rr_consistency(spark):
    """rr_micro must equal 1e6 // first_rel_rank, and hits@10 can never
    exceed 10 or imply a first hit later than rank 10."""
    for r in _rows(spark, "x_mrr_labels"):
        if r["first_rel_rank"] is not None:
            assert r["rr_micro"] == 1000000 // r["first_rel_rank"]
            if r["hits_at_10"] > 0:
                assert r["first_rel_rank"] <= 10
        assert 0 <= r["hits_at_10"] <= 10


def test_bottomk_is_batch_invariant(spark):
    """The per-bucket hash-min sample equals the direct batch argmin
    computed locally — the invariance the streaming min-merge relies on."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "user_id").collect()

    def h(eid):
        return int(hashlib.md5(f"bk:{eid}".encode()).hexdigest()[:15], 16)

    best = {}
    for r in ev:
        b = h(r["event_id"]) % 32
        key = (h(r["event_id"]), r["event_id"], r["user_id"])
        if b not in best or key < best[b]:
            best[b] = key
    got = {r["bucket"]: (r["min_hash"], r["event_id"], r["user_id"]) for r in _rows(spark, "s_stream_bottomk")}
    assert got == {b: v for b, v in best.items()}


def test_split_leakage_counts_add_up(spark):
    """cross + train + held pairs partition the pair set, and contaminated
    held docs are bounded by both cross pairs and the held population."""
    r = _rows(spark, "x_split_leakage")[0]
    assert r["n_pairs"] == r["n_cross_pairs"] + r["n_train_pairs"] + r["n_held_pairs"]
    assert r["n_held_contaminated"] <= r["n_cross_pairs"]
    assert r["n_held_contaminated"] <= r["n_held_docs"]


def test_frame_dedup_bounds(spark):
    """Distinct frames can never exceed total frames; dup_rate on [0, 1)."""
    for r in _rows(spark, "x_frame_dedup"):
        assert 0 < r["n_distinct_frames"] <= r["n_frames"]
        assert 0.0 <= r["dup_rate"] < 1.0


def test_dim_trunc_recall_bounds(spark):
    for r in _rows(spark, "x_dim_trunc_recall"):
        assert r["n_truth"] == 10
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall_at_10"] - r["n_hits"] / 10.0) < 1e-9


def test_detector_agreement_set_identities(spark):
    r = _rows(spark, "x_detector_agreement")[0]
    assert r["n_both"] <= min(r["n_minhash"], r["n_simhash"])
    assert r["n_union"] == r["n_minhash"] + r["n_simhash"] - r["n_both"]
    for c in ("set_jaccard", "containment_in_minhash", "containment_in_simhash"):
        assert 0.0 <= r[c] <= 1.0


def test_source_mirror_total_equals_leakage_pairs(spark):
    """Two independent rollups of the same verified pair set must count the
    same pairs: Σ source-pair counts == x_split_leakage's n_pairs."""
    mirror_total = sum(r["n_pairs"] for r in _rows(spark, "x_source_mirror"))
    leak = _rows(spark, "x_split_leakage")[0]
    assert mirror_total == leak["n_pairs"]


def test_code_detect_matches_local(spark):
    import re

    docs = {r["doc_id"]: r["text"] for r in spark.read.parquet(f"{SF}/documents.parquet").limit(50).collect()}
    got = {r["doc_id"]: r for r in _rows(spark, "x_code_detect")}
    for did, text in docs.items():
        n = len(text)
        sym = len(re.findall(r"[;{}()\[\]=<>]", text))
        dig = len(re.findall(r"[0-9]", text))
        assert got[did]["sym_milli"] == (1000 * sym) // max(n, 1)
        assert got[did]["digit_milli"] == (1000 * dig) // max(n, 1)
        assert got[did]["is_code"] == int(got[did]["sym_milli"] >= 50)


def test_ann_prefilter_bounds(spark):
    for r in _rows(spark, "x_ann_prefilter"):
        assert 1 <= r["n_pre"] <= 10
        assert 0 <= r["n_post_hits"] <= r["n_pre"]
        assert 0.0 <= r["post_coverage"] <= 1.0


def test_rrf_score_consistency(spark):
    rows = _rows(spark, "x_rrf_fusion")
    assert len(rows) <= 20
    prev = None
    for r in rows:
        expect = 0
        if r["lex_rank"] is not None:
            expect += 1000000 // (60 + r["lex_rank"])
        if r["sem_rank"] is not None:
            expect += 1000000 // (60 + r["sem_rank"])
        assert r["rrf_micro"] == expect
        if prev is not None:
            assert r["rrf_micro"] <= prev
        prev = r["rrf_micro"]


def test_ohlc_invariants_and_one_day_mirror(spark):
    rows = _rows(spark, "e_ohlc")
    assert rows
    for r in rows:
        assert r["low_cents"] <= min(r["open_cents"], r["close_cents"])
        assert r["high_cents"] >= max(r["open_cents"], r["close_cents"])
    ev = [
        (r["ts"], r["event_id"], round(r["value"] * 100))
        for r in spark.read.parquet(f"{SF}/events.parquet").collect()
        if r["event_type"] == "purchase"
    ]
    day = rows[0]["dt"]
    todays = sorted((t, e, c) for t, e, c in ev if t.date() == day)
    assert rows[0]["open_cents"] == todays[0][2]
    assert rows[0]["close_cents"] == todays[-1][2]
    assert rows[0]["n_trades"] == len(todays)


def test_autocorr_matches_local(spark):
    import math

    o = spark.read.parquet(f"{SF}/orders.parquet").collect()
    daily = {}
    for r in o:
        daily[r["o_orderdate"]] = daily.get(r["o_orderdate"], 0) + round(r["o_totalprice"] * 100)
    dollars = {d: (abs(c) // 100) * (1 if c >= 0 else -1) for d, c in daily.items()}
    import datetime

    pairs = [
        (dollars[d], dollars[d - datetime.timedelta(days=1)])
        for d in dollars
        if d - datetime.timedelta(days=1) in dollars
    ]
    n = len(pairs)
    sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs); syy = sum(y * y for _, y in pairs)
    num = float(n) * float(sxy) - float(sx) * float(sy)
    dx = float(n) * float(sxx) - float(sx) * float(sx)
    dy = float(n) * float(syy) - float(sy) * float(sy)
    expect = math.floor(1000000.0 * num / (math.sqrt(dx) * math.sqrt(dy)))
    row = _rows(spark, "e_autocorr")[0]
    assert row["n_pairs"] == n
    assert row["autocorr_micro"] == expect


def test_random_projection_packed_equals_legacy(spark):
    """The exchange-free packed-dirs projection must be bit-identical to
    the legacy (r, j, sign)-frame aggregate path, and its broadcast side
    must contain no Exchange at all."""
    from gmall_flink_230422_spark.operators import similarity as sim

    e = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    legacy = sim.random_projection(e, sim.random_projection_signs(spark, n_dirs=4))
    packed = sim.random_projection(e, packed=sim.packed_projection_dirs(spark, n_dirs=4))
    l = {(r["vec_id"], r["r"]): r["proj_milli"] for r in legacy.collect()}
    p = {(r["vec_id"], r["r"]): r["proj_milli"] for r in packed.collect()}
    assert l == p
    dirs = sim.packed_projection_dirs(spark, n_dirs=4)
    plan = dirs._sc._jvm.PythonSQLUtils.explainString(
        dirs._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan


def test_length_strata_partition_of_pairs(spark):
    """Stratified counts must re-partition the unstratified totals: Σ
    per-stratum n_true/n_cand/n_tp equal the x_dedup_f1 scalars."""
    strata = _rows(spark, "x_length_strata_lsh")
    f1 = _rows(spark, "x_dedup_f1")[0]
    assert sum(r["n_true"] for r in strata) == f1["n_true_pairs"]
    assert sum(r["n_cand"] for r in strata) == f1["n_candidate_pairs"]
    assert sum(r["n_tp"] for r in strata) == f1["n_tp"]


def test_dow_divergence_bounds(spark):
    for r in _rows(spark, "e_dow_divergence"):
        assert 0 <= r["tv_ppm"] <= 1000000
        assert r["chi2_ppm"] >= 0


def test_stream_ohlc_equals_batch(spark):
    batch = {r["dt"]: tuple(r) for r in _rows(spark, "e_ohlc")}
    stream = {r["dt"]: tuple(r) for r in _rows(spark, "s_stream_ohlc")}
    assert batch == stream


def test_new_vs_returning_identities(spark):
    """n_active partitions into new + returning; total new across all days
    equals the distinct user population (every user is new exactly once)."""
    rows = _rows(spark, "e_new_vs_returning")
    users = spark.read.parquet(f"{SF}/events.parquet").select("user_id").distinct().count()
    assert all(r["n_active"] == r["n_new"] + r["n_returning"] for r in rows)
    assert sum(r["n_new"] for r in rows) == users


def test_stream_new_users_equals_batch(spark):
    batch = {r["dt"]: tuple(r) for r in _rows(spark, "e_new_vs_returning")}
    stream = {r["dt"]: tuple(r) for r in _rows(spark, "s_stream_new_users")}
    assert batch == stream


def test_vocab_overlap_bounds(spark):
    for r in _rows(spark, "x_vocab_overlap_sources"):
        assert 0 < r["n_inter"] <= min(r["va"], r["vb"])
        assert 0.0 <= r["vocab_jaccard"] <= r["containment_smaller"] <= 1.0
