"""Unit tests for the training-data pipeline operators added in round 2:
contamination check, repetition filter, PII redaction, sequence packing,
stratified sampling — handcrafted corpora with by-hand expected values."""

from pyspark.sql import functions as F

from gmall_flink_230422_spark.operators import dedup, text


def _df(spark, rows, cols=("doc_id", "text")):
    return spark.createDataFrame(rows, list(cols))


# ---------------------------------------------------------------- contamination
def test_contamination_scores(spark):
    train = _df(spark, [
        (1, "a b c d e"),            # shingles: "a b c","b c d","c d e"
        (2, "x y z w"),              # shingles: "x y z","y z w"
        (3, "a b"),                  # < 3 tokens: no shingles, absent
    ])
    ev = _df(spark, [(100, "a b c d")])  # eval shingles: "a b c","b c d"
    out = {r["doc_id"]: r for r in dedup.contamination_scores(train, ev).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_shingles"] == 3 and out[1]["n_overlap"] == 2
    assert abs(out[1]["contamination"] - 0.6666) < 1e-9  # floor(2/3*1e4)/1e4
    assert out[2]["n_overlap"] == 0 and out[2]["contamination"] == 0.0


def test_contamination_is_broadcast_and_single_shuffle(spark):
    train = _df(spark, [(1, "a b c d e")])
    ev = _df(spark, [(100, "a b c d")])
    plan = dedup.contamination_scores(train, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------- repetition
def test_repetition_features(spark):
    out = {r["doc_id"]: r for r in text.repetition_features(_df(spark, [
        (1, "spam spam spam spam"),       # all one word
        (2, "one two three four five"),   # all distinct
    ])).collect()}
    r1 = out[1]
    assert r1["n_words"] == 4
    assert r1["dup_word_frac"] == 0.75          # 1 - 1/4
    assert r1["top_word_frac"] == 1.0
    assert r1["top_bigram_frac"] == 1.0         # "spam spam" is every bigram
    assert r1["keep"] is False
    r2 = out[2]
    assert r2["dup_word_frac"] == 0.0 and r2["top_word_frac"] == 0.2
    assert r2["top_bigram_frac"] == 0.25
    # fails keep only on the top_word threshold (5 distinct words -> 0.2 > 0.12)
    assert r2["keep"] is False


def test_repetition_single_token_doc(spark):
    # no bigrams: top_bigram_frac coalesces to 0.0, no crash
    row = text.repetition_features(_df(spark, [(1, "hello")])).collect()[0]
    assert row["n_words"] == 1 and row["top_bigram_frac"] == 0.0


# ---------------------------------------------------------------- PII redaction
def test_pii_redact_counts_and_chain(spark):
    out = {r["doc_id"]: r for r in text.pii_redact(_df(spark, [
        (1, "mail me at bob@example.com or alice@test.org thanks"),
        (2, "call 555-1234 from 10.0.0.1 now"),
        (3, "nothing sensitive here"),
    ])).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_pii"] == 2
    assert "bob@example.com" not in out[1]["redacted"]
    assert out[1]["redacted"].count("<EMAIL>") == 2
    assert out[2]["n_phone"] == 1 and out[2]["n_ipv4"] == 1
    assert out[2]["redacted"] == "call <PHONE> from <IP> now"
    assert out[3]["n_pii"] == 0 and out[3]["redacted"] == "nothing sensitive here"


# ---------------------------------------------------------------- packing
def test_pack_sequences_budget_and_determinism(spark):
    docs = _df(spark, [(i, "w " * 10) for i in range(40)])  # 10-token docs (trailing space drops)
    out = text.pack_sequences(docs, budget=25, n_groups=4)
    rows = out.collect()
    assert len(rows) == 40
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r["pack_group"], []).append(r)
    for grp_rows in by_group.values():
        grp_rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in grp_rows:
            assert r["seq_idx"] == cum // 25 and r["seq_offset"] == cum % 25
            cum += r["n_tokens"]
    # deterministic across invocations
    again = {(r["doc_id"], r["seq_idx"], r["seq_offset"])
             for r in text.pack_sequences(docs, budget=25, n_groups=4).collect()}
    assert again == {(r["doc_id"], r["seq_idx"], r["seq_offset"]) for r in rows}


# ---------------------------------------------------------------- sampling
def test_stratified_sample_rates_and_weights(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)], ["doc_id", "lang"]
    )
    out = text.stratified_sample(docs, {"en": 1.0, "zh": 0.25}, strata_col="lang")
    rows = out.collect()
    en = [r for r in rows if r["lang"] == "en"]
    zh = [r for r in rows if r["lang"] == "zh"]
    assert len(en) == 1000                      # rate 1.0 keeps everything
    assert 150 < len(zh) < 350                  # rate 0.25 of 1000, hash-binomial
    assert all(r["weight"] == 1.0 for r in en)
    assert all(r["weight"] == 4.0 for r in zh)
    # deterministic: same ids survive on re-run
    again = {r["doc_id"] for r in
             text.stratified_sample(docs, {"en": 1.0, "zh": 0.25}).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_stratified_sample_is_shuffle_free(spark):
    docs = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    plan = text.stratified_sample(docs, {"en": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_explode_frames_slicing(spark):
    from gmall_flink_230422_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "a" * 70), (2, "b" * 32), (3, "c"), (4, "")], ["doc_id", "text"]
    )
    frames = multimodal.explode_frames(multimodal.to_media_table(docs), frame_bytes=32)
    rows = {(r["doc_id"], r["frame_idx"]): r for r in frames.collect()}
    # 70 bytes -> 3 frames (32, 32, 6); 32 -> 1; 1 -> 1; empty -> none
    assert {k[0] for k in rows} == {1, 2, 3}
    assert [rows[(1, i)]["frame_len"] for i in range(3)] == [32, 32, 6]
    assert len(bytes(rows[(1, 2)]["frame"])) == 6
    assert rows[(2, 0)]["frame_len"] == 32 and (2, 1) not in rows
    assert rows[(3, 0)]["frame_len"] == 1


# ---------------------------------------------------------- relevance scoring
def test_tfidf_top_terms_hand_checked(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r["doc_id"], r["token"]): r
        for r in text.tfidf_top_terms(docs, k=2).collect()
    }
    import math

    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    exp_apple = math.floor(2 * math.log(3.0) * 10000) / 10000
    assert rows[(1, "apple")]["tfidf"] == exp_apple
    assert rows[(1, "apple")]["tf"] == 2 and rows[(1, "apple")]["df"] == 1
    # doc 3: cherry tf=3, in 2 of 3 docs -> 3*ln(1.5)
    assert rows[(3, "cherry")]["tfidf"] == math.floor(
        3 * math.log(3.0 / 2.0) * 10000
    ) / 10000


def test_bm25_rank_orders_by_relevance(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join"),
            (2, "spark join window extra words here"),
            (3, "nothing relevant at all"),
        ],
        ["doc_id", "text"],
    )
    rows = text.bm25_rank(docs, ("spark", "join"), k=3).collect()
    assert [r["doc_id"] for r in rows][:2] == [1, 2]  # tf-heavy short doc wins
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[3]["bm25"] == 0.0  # no query terms -> zero score
    assert by_id[1]["tf_0"] == 3 and by_id[1]["tf_1"] == 1


def test_chunk_dedup_first_occurrence_wins(spark):
    shared = " ".join(f"w{i}" for i in range(32))
    uniq_a = " ".join(f"a{i}" for i in range(32))
    uniq_b = " ".join(f"b{i}" for i in range(8))  # short tail chunk
    docs = spark.createDataFrame(
        [(1, f"{shared} {uniq_a}"), (2, f"{shared} {uniq_b}"), (3, shared)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.chunk_dedup(docs, size=32).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["kept_chunks"] == 2
    assert out[2]["n_chunks"] == 2 and out[2]["dup_chunks"] == 1  # shared chunk
    assert out[3]["n_chunks"] == 1 and out[3]["kept_chunks"] == 0


def test_bpe_train_learns_expected_merges(spark):
    # corpus engineered so merges are unambiguous: "ab" dominates, then
    # "ab"+"c" (chained onto the first merge's output symbol)
    docs = spark.createDataFrame(
        [(1, "abc abc abc ab"), (2, "abc ab xy")], ["doc_id", "text"]
    )
    rows = text.bpe_train_merges(docs, n_merges=2).collect()
    assert [(r["step"], r["p1"], r["p2"]) for r in rows] == [
        (1, "a", "b"),
        (2, "ab", "c"),
    ]
    # step-1 count: every word contains exactly one 'a b' pair; freqs 4+2
    assert rows[0]["pair_count"] == 6


def test_mixture_sample_rate_caps_at_one(spark):
    # stratum far below its uniform share keeps EVERYTHING (rate 1.0);
    # the over-represented one is downsampled toward the target
    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        ["doc_id", "source"],
    )
    out = {r["source"]: r for r in
           text.mixture_sample_summary(docs, budget_num=1, budget_den=2).collect()}
    # budget 500, uniform target 250/stratum; small has 100 -> rate 1.0
    assert out["small"]["rate"] == 1.0
    assert out["small"]["n_kept"] == 100
    # big: threshold = 500*10000 div (2*900) = 2777 -> rate 0.2777
    assert out["big"]["rate"] == 0.2777
    assert 150 < out["big"]["n_kept"] < 350  # hash-binomial around 250


def test_gap_fill_emits_zero_slots(spark, tmp_path):
    import datetime as dt
    from gmall_flink_230422_spark.plans.analytics import q_gap_fill

    # events at hour 0 and hour 3 -> slots 1 and 2 must appear with ct=0
    rows = [(1, dt.datetime(2024, 1, 1, 0, 30), 7, "view", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 3, 10), 7, "view", 1.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = str(tmp_path / "sf")
    df.write.parquet(out + "/events.parquet")
    got = {(r["event_type"], r["slot"]): r["ct"] for r in q_gap_fill(spark, out).collect()}
    base = int(dt.datetime(2024, 1, 1).timestamp())
    assert got == {("view", base): 1, ("view", base + 3600): 0,
                   ("view", base + 7200): 0, ("view", base + 10800): 1}


# --------------------------------------------------------- quality classifier
def test_quality_classifier_grid_and_bands(spark):
    docs = _df(spark, [
        (1, "the cat sat on the mat"),   # 6 toks, 5 distinct, 2 stopword hits
        (2, "word word word word"),      # ttr 250, no stopwords
        (3, ""),                         # empty: all feature terms zero
    ])
    out = {r["doc_id"]: r for r in text.quality_classifier(docs).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 6 and r1["ttr_milli"] == 833  # floor(1000*5/6)
    assert r1["stop_milli"] == 333  # floor(1000*2/6)
    assert r1["logit_milli"] == -1100 + 60 + 2 * 333 + 833
    assert r1["keep"] is True and r1["quality_band"] == "high"  # 459 >= 200
    r2 = out[2]
    assert r2["ttr_milli"] == 250 and r2["stop_milli"] == 0
    assert r2["logit_milli"] == -1100 + 40 + 250  # -810: boilerplate rejected
    r3 = out[3]
    assert r3["n_tokens"] == 0 and r3["logit_milli"] == -1100
    assert r3["quality_band"] == "reject"


# ------------------------------------------------------- duplicated-ngram rate
def test_dup_ngram_rate_counts(spark):
    shared = "a b c d e f g h"            # exactly one 8-gram, shared by 1 and 2
    docs = _df(spark, [
        (1, shared + " unique1 tail1"),   # 3 8-grams, 1 duplicated
        (2, shared),                      # 1 8-gram, duplicated
        (3, "q r s t u v w x y"),         # 2 8-grams, none duplicated
        (4, "too short"),                 # <8 tokens: absent
    ])
    out = {r["doc_id"]: r for r in dedup.dup_ngram_stats(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_shingles"] == 3 and out[1]["n_dup"] == 1
    assert out[1]["dup_rate_milli"] == 333 and out[1]["drop_doc"] is True
    assert out[2]["n_shingles"] == 1 and out[2]["n_dup"] == 1
    assert out[2]["dup_rate_milli"] == 1000 and out[2]["drop_doc"] is True
    assert out[3]["n_dup"] == 0 and out[3]["drop_doc"] is False


def test_boilerplate_prefixes_flags_shared_openings(spark):
    from gmall_flink_230422_spark.operators.text import boilerplate_prefixes

    rows = [
        (0, "breaking news today something happened", "siteA"),
        (1, "Breaking News today another story", "siteA"),   # same normalized prefix
        (2, "breaking news elsewhere", "siteB"),             # same prefix, other source
        (3, "totally original opening here", "siteA"),
        (4, "", "siteA"),                                    # empty doc -> empty prefix
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = boilerplate_prefixes(df, n_tokens=2, min_docs=2)
    got = {(r["doc_id"], r["prefix"], r["n_docs"]) for r in out.collect()}
    # only siteA's shared "breaking news" prefix fires; siteB's single doc
    # and the unique/empty openings do not
    assert got == {(0, "breaking news", 2), (1, "breaking news", 2)}


def test_reservoir_sample_exact_k_and_determinism(spark):
    from gmall_flink_230422_spark.operators.text import reservoir_sample

    rows = [(i, "en" if i < 30 else "fr") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = reservoir_sample(df, k=5, keys=("lang",)).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # exactly k per key; n_docs carries the true group size
    assert len(by_lang["en"]) == 5 and all(r["n_docs"] == 30 for r in by_lang["en"])
    assert len(by_lang["fr"]) == 5 and all(r["n_docs"] == 10 for r in by_lang["fr"])
    # deterministic: same sample on re-run
    again = {(r["lang"], r["doc_id"]) for r in reservoir_sample(df, k=5, keys=("lang",)).collect()}
    assert again == {(r["lang"], r["doc_id"]) for r in out}
    # k larger than the group -> whole group, no fabricated rows
    tiny = reservoir_sample(df.filter("doc_id >= 30"), k=99, keys=("lang",))
    assert tiny.count() == 10
