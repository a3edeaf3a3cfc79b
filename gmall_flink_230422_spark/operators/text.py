"""Text-analysis operators (LLM-pipeline extension): language ID, quality
scoring, token counting, fingerprinting. All pure Column expressions
(JVM-side, codegen) so they run at scan speed and are oracle-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text
from ..functions.tokenize import whitespace_tokens

# tiny deterministic stopword lists per language for the n-gram/stopword
# language-ID heuristic (the classic "most stopword hits wins" rule)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "un"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "不"),
}

_EN_STOP = LANG_STOPWORDS["en"]


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(text))


def approx_bpe_token_count(text: Column) -> Column:
    """BPE-ish token estimate: ceil(chars/4) per whitespace token, the common
    chars/4 heuristic applied piecewise (deterministic, no tokenizer dep)."""
    return F.aggregate(
        whitespace_tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )


def stopword_hits(tokens: Column, stopwords: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*stopwords)))


def detect_language(text: Column) -> Column:
    """Stopword-vote language ID: the language whose stopword list scores the
    most token hits wins; ties and zero-hit rows → 'und'. Deterministic by
    fixed evaluation order."""
    toks = whitespace_tokens(normalize_text(text))
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_STOPWORDS):  # fixed order => deterministic ties
        score = stopword_hits(toks, LANG_STOPWORDS[lang])
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score:
    n_tokens, mean token length, stopword ratio, alnum ratio. Score is the
    standard heuristic blend (each term clipped to [0,1])."""
    text = F.col(text_col)
    toks = whitespace_tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    alnum_chars = F.length(F.regexp_replace(text, "[^a-zA-Z0-9]", ""))
    stop_ratio = F.when(
        n_tokens > 0, stopword_hits(toks, _EN_STOP) / n_tokens
    ).otherwise(F.lit(0.0))
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
        / n_tokens,
    ).otherwise(F.lit(0.0))
    alnum_ratio = F.when(n_chars > 0, alnum_chars / n_chars).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.25
        + F.least(mean_tok_len / F.lit(8.0), F.lit(1.0)) * 0.25
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.25
        + alnum_ratio * 0.25
    )
    # floor-truncated (not rounded): the inputs are exact integer ratios, so
    # both engines hold bit-identical doubles and truncate identically;
    # round() diverges at .xxxx5 decimal renderings (seen at sf0.1)
    def trunc4(c):
        return F.floor(c * 10000) / 10000

    return docs.select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        trunc4(mean_tok_len).alias("mean_tok_len"),
        trunc4(stop_ratio).alias("stopword_ratio"),
        trunc4(alnum_ratio).alias("alnum_ratio"),
        trunc4(score).alias("quality_score"),
    )


def quality_logit_milli(toks: Column) -> Column:
    """The frozen-weight quality-classifier logit (integer milli-grid) as a
    pure expression over an already-computed token-array column — the
    single implementation behind :func:`quality_classifier` and the
    fold-into-one-projection consumers (x_select_pipeline). keep is
    ``quality_logit_milli(toks) >= 0``."""
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_hits = stopword_hits(toks, _EN_STOP)
    ttr_milli = F.when(
        n_tokens > 0, F.floor(F.lit(1000) * n_distinct / n_tokens)
    ).otherwise(F.lit(0)).cast("bigint")
    stop_milli = F.when(
        n_tokens > 0, F.floor(F.lit(1000) * stop_hits / n_tokens)
    ).otherwise(F.lit(0)).cast("bigint")
    len_term = (F.lit(10) * F.least(n_tokens, F.lit(100))).cast("bigint")
    return (F.lit(-1100) + len_term + F.lit(2) * stop_milli + ttr_milli).cast(
        "bigint"
    )


def quality_classifier(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Model-based quality filter: a fixed-weight linear classifier over
    engineered integer features (the fasttext-style quality-classifier stage
    of web-corpus pipelines, e.g. CCNet/LLaMA data prep — here with a frozen,
    published weight vector instead of a trained binary blob).

    Everything stays on an integer milli-grid so the score is bit-exact
    cross-engine and the decision boundary has no float ambiguity:

      ttr_milli   = floor(1000 * distinct_tokens / n_tokens)   (type-token ratio)
      stop_milli  = floor(1000 * stopword_hits / n_tokens)
      len_term    = 10 * least(n_tokens, 100)                  (saturating length)
      logit_milli = -1100 + len_term + 2 * stop_milli + ttr_milli

    keep = logit_milli >= 0; quality_band buckets the logit for routing
    (reject / low / mid / high). Pure projection + per-doc array ops: no
    shuffle, whole-stage codegen end-to-end — at 100 TB this is a map-only
    pass over the corpus scan.
    """
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_hits = stopword_hits(toks, _EN_STOP)
    ttr_milli = F.when(
        n_tokens > 0, F.floor(F.lit(1000) * n_distinct / n_tokens)
    ).otherwise(F.lit(0)).cast("bigint")
    stop_milli = F.when(
        n_tokens > 0, F.floor(F.lit(1000) * stop_hits / n_tokens)
    ).otherwise(F.lit(0)).cast("bigint")
    len_term = (F.lit(10) * F.least(n_tokens, F.lit(100))).cast("bigint")
    logit = (F.lit(-1100) + len_term + F.lit(2) * stop_milli + ttr_milli).cast("bigint")
    band = (
        F.when(logit < 0, F.lit("reject"))
        .when(logit < 100, F.lit("low"))
        .when(logit < 200, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    return docs.select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        ttr_milli.alias("ttr_milli"),
        stop_milli.alias("stop_milli"),
        logit.alias("logit_milli"),
        (logit >= 0).alias("keep"),
        band.alias("quality_band"),
    )


def rolling_fingerprint(text: Column, window: int = 8) -> Column:
    """Document fingerprint: md5 over normalized text (winnowing-style rolling
    fingerprints reduce to content-defined sampling of shingle hashes; the
    whole-doc md5 is the degenerate, portable form used for exact identity)."""
    return F.md5(normalize_text(text))


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by portable id-hash bucket.

    The standard large-corpus split: bucket = md5(salt:id) mod 1000; bucket
    ranges map to splits by the cumulative fractions. Stable under corpus
    growth (a doc's split never changes when other docs are added), engine-
    portable (same md5 construction as every checked hash here), and
    shuffle-free — a pure projection.
    """
    from ..functions.hashing import portable_hash64
    from pyspark.sql import functions as F

    assert abs(sum(fractions) - 1.0) < 1e-9 and len(fractions) == len(names)
    bucket = F.pmod(
        portable_hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        F.lit(1000),
    )
    bounds, acc = [], 0.0
    for frac in fractions[:-1]:
        acc += frac
        bounds.append(int(round(acc * 1000)))
    # ascending when-chain: first matching cumulative bound wins
    expr = None
    for name, b in zip(names[:-1], bounds):
        cond = bucket < b
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return docs.select(F.col(id_col), bucket.alias("bucket"), expr.alias("split"))


def _top_run(arr: Column) -> Column:
    """Max element frequency of an array = longest equal-run over its sorted
    form: one linear ``aggregate`` fold in codegen (the Column-API twin of
    the SQL-template fold inside :func:`repetition_features`)."""
    def merge(acc: Column, x: Column) -> Column:
        run_new = (
            F.when(
                acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1
            )
            .otherwise(F.lit(1))
            .cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run_new.alias("run"),
            F.greatest(acc["best"], run_new).alias("best"),
        )

    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        merge,
        lambda acc: acc["best"],
    )


def _word_bigrams(toks: Column) -> Column:
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_keep(toks: Column) -> Column:
    """The composite repetition-filter verdict of :func:`repetition_features`
    as one pure expression over an already-computed token-array column —
    for consumers that fold several map-only quality stages into a single
    corpus projection (x_select_pipeline). Callers must exclude zero-token
    docs first (``size(toks) >= 1``), matching repetition_features' output
    domain. Formula identical to repetition_features; both are pinned by
    the same oracles."""
    n_words = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long")
    )
    bgs = _word_bigrams(toks)
    n_bg = F.size(bgs).cast("bigint")

    def trunc4(c: Column) -> Column:
        return F.floor(c * 10000) / 10000

    dup_frac = trunc4((n_words - n_distinct) / n_words)
    top_word = trunc4(_top_run(toks) / n_words)
    top_bg = F.when(n_bg > 0, trunc4(_top_run(bgs) / n_bg)).otherwise(F.lit(0.0))
    mean_len = trunc4(chars / n_words)
    return (
        (dup_frac <= F.lit(0.8))
        & (top_word <= F.lit(0.12))
        & (top_bg <= F.lit(0.08))
        & mean_len.between(F.lit(3.0), F.lit(10.0))
    )


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al. 2021
    §A1.1 adapted to word granularity — the fixture corpus is single-line):

    - ``dup_word_frac``   — fraction of word occurrences beyond each word's
      first (1 - distinct/total): catches boilerplate/keyword-stuffed docs
    - ``top_word_frac``   — most frequent word's share of all words
    - ``top_bigram_frac`` — most frequent word-bigram's share of all bigrams
    - ``mean_word_len``   — degenerate-token guard
    - ``keep``            — the composite repetition filter verdict

    Shape (r11 optimization, guide §2.4 "remove shuffles outright"): every
    signal is a PER-DOCUMENT statistic, so nothing needs to leave the row —
    the old explode→count→re-aggregate→join shape (two word/bigram explode
    chains, four hash aggregates, one doc_id exchange) is replaced by pure
    array expressions: top-word / top-bigram occurrence counts are a
    linear ``aggregate`` fold over the SORTED token/bigram array (max run
    length of a sorted multiset == max frequency), char totals a fold over
    token lengths. Zero shuffles, zero explode fan-out, whole-stage
    codegen end-to-end — a map-only pass over the corpus scan at any
    scale. Docs with no tokens are filtered exactly as the old explode
    produced no rows for them (and as the oracle's ``unnest`` does).
    Measured at sf0.1 (interleaved min-of-8, same session): operator warm
    0.78 → 0.48 s with bit-identical output; the curation capstones
    consuming the keep-list (curate_funnel/corpus, select_pipeline) drop
    the whole explode/agg sub-chain from their plans (their end-to-end
    warm deltas sit inside session noise locally — the win is the removed
    shuffle/fan-out, which is what matters at scale).
    """
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    # max frequency over a sorted array = longest equal-run: one linear
    # codegen fold, no explode/groupBy
    top_run = (
        "aggregate(array_sort({arr}), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L), "
        "(acc, x) -> named_struct("
        "'prev', x, "
        "'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L), "
        "'best', greatest(acc.best, "
        "IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L))), "
        "acc -> acc.best)"
    )
    bigram_arr = F.expr(
        "CASE WHEN size(_toks) >= 2 THEN transform(sequence(1, size(_toks) - 1), "
        "i -> concat_ws(' ', element_at(_toks, i), element_at(_toks, i + 1))) "
        "ELSE array() END"
    )
    base = (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .filter(F.size("_toks") >= 1)
        .select(
            F.col(id_col),
            F.size("_toks").cast("bigint").alias("n_words"),
            F.size(F.array_distinct("_toks")).cast("bigint").alias("_n_distinct"),
            F.expr(
                "aggregate(_toks, 0L, (a, x) -> a + CAST(length(x) AS BIGINT))"
            ).alias("_chars"),
            F.expr(top_run.format(arr="_toks")).alias("_top_word"),
            bigram_arr.alias("_bgs"),
        )
        .select(
            "*",
            F.size("_bgs").cast("bigint").alias("_n_bg"),
            F.expr(top_run.format(arr="_bgs")).alias("_top_bg"),
        )
    )

    def trunc4(c: Column) -> Column:
        # exact-integer operands => bit-identical doubles in both engines;
        # floor-truncate per the repo-wide off-grid-ratio rule
        return F.floor(c * 10000) / 10000

    dup_frac = trunc4((F.col("n_words") - F.col("_n_distinct")) / F.col("n_words"))
    top_word = trunc4(F.col("_top_word") / F.col("n_words"))
    top_bg = F.when(
        F.col("_n_bg") > 0, trunc4(F.col("_top_bg") / F.col("_n_bg"))
    ).otherwise(F.lit(0.0))
    mean_len = trunc4(F.col("_chars") / F.col("n_words"))
    return base.select(
        F.col(id_col),
        F.col("n_words").cast("bigint").alias("n_words"),
        dup_frac.alias("dup_word_frac"),
        top_word.alias("top_word_frac"),
        top_bg.alias("top_bigram_frac"),
        mean_len.alias("mean_word_len"),
        (
            (dup_frac <= F.lit(0.8))
            & (top_word <= F.lit(0.12))
            & (top_bg <= F.lit(0.08))
            & mean_len.between(F.lit(3.0), F.lit(10.0))
        ).alias("keep"),
    )


# PII patterns written in the common Java-regex/RE2 subset (no lookarounds,
# ASCII classes only) so Spark and the DuckDB oracle match identically.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("phone", r"\b555-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrub for training data: count and redact email / phone / IPv4
    patterns. Counts are taken on the ORIGINAL text (each pattern
    independently); redaction chains the patterns in declaration order.

    All JVM-side ``regexp_count`` / ``regexp_replace`` — per-row regex at
    scan speed inside codegen, no Python round-trip, embarrassingly
    parallel at any scale. Replacement tokens are digit-free so chained
    redactions can't cascade into each other.
    """
    cols = [F.col(id_col)]
    for name, pat, _ in PII_PATTERNS:
        cols.append(F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(f"n_{name}"))
    red = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    cols.append(red.alias("redacted"))
    out = docs.select(*cols)
    total = sum((F.col(f"n_{n}") for n, _, _ in PII_PATTERNS[1:]), F.col(f"n_{PII_PATTERNS[0][0]}"))
    return out.withColumn("n_pii", total)


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_groups: int = 32,
) -> DataFrame:
    """Greedy sequential token packing: assign documents to fixed
    ``budget``-token training sequences (context windows).

    Two-level layout so it scales: documents are deterministically
    hash-bucketed into ``n_groups`` independent pack groups, then packed
    WITHIN each group in doc-id order by a running token sum — the window
    is partitioned by group, never the single-partition global-sort
    antipattern, and groups pack in parallel (at 100 TB raise n_groups to
    O(cores×executors); determinism is unaffected). A document that
    straddles a boundary belongs to the sequence where it starts; the
    downstream chunker splits the overflow.

    Returns (id, pack_group, n_tokens, seq_idx, seq_offset) — enough for a
    writer to co-locate a sequence's documents (partitionBy(pack_group,
    seq_idx)) without ever concatenating text through the driver.
    """
    from pyspark.sql import Window

    from ..functions.hashing import portable_hash64

    grp = F.pmod(
        portable_hash64(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))),
        F.lit(n_groups),
    )
    base = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        grp.cast("int").alias("pack_group"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "pack_group",
        "n_tokens",
        F.floor(cum / budget).cast("bigint").alias("seq_idx"),
        (cum % budget).cast("bigint").alias("seq_offset"),
    )


def chunk_documents(
    docs: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    ``size``-token chunks every ``stride`` tokens (overlap = size − stride),
    the standard pre-training/RAG windowing step.

    Pure array expressions — tokenize, ``sequence`` of chunk starts,
    ``explode``, ``slice`` — so chunking runs at scan speed with ZERO
    shuffles and no Python; at 100 TB it pipelines into whatever the next
    stage partitions by. Empty documents produce no chunks (both engines).

    Output: (doc_id, chunk_id, n_tokens, chunk_text), chunk_id = start/stride.
    """
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    base = docs.select(F.col(id_col), toks.alias("_toks")).filter(
        F.size("_toks") > 0
    )
    starts = F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(stride))
    chunks = base.select(id_col, "_toks", F.explode(starts).alias("_start"))
    return chunks.select(
        F.col(id_col),
        (F.col("_start") / stride).cast("bigint").alias("chunk_id"),
        F.least(F.lit(size), F.size("_toks") - F.col("_start"))
        .cast("bigint")
        .alias("n_tokens"),
        F.array_join(F.slice("_toks", F.col("_start") + 1, F.lit(size)), " ").alias(
            "chunk_text"
        ),
    )


def chunk_dedup(
    docs: DataFrame,
    size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Passage-level exact dedup: split each document into disjoint
    ``size``-token chunks (:func:`chunk_documents` with stride == size, the
    paragraph-dedup analog for flat text) and keep the first corpus-wide
    occurrence of every distinct chunk — first = lowest (doc_id, chunk_id),
    the same canonical-winner rule as exact doc dedup (dedup.py).

    Scale shape: chunking is shuffle-free array expressions; the winner
    election is ONE window shuffle keyed by the 60-bit portable chunk hash
    (8-byte key, not the chunk string; an md5 collision merely merges two
    chunks' dedup groups — the usual, accepted MinHash/LSH-style tolerance),
    then a per-doc re-aggregation keyed by doc_id. No self-join, no
    collect.

    Output per doc: n_chunks, kept_chunks (this doc owns the canonical
    copy), dup_chunks (earlier doc already had an identical chunk).
    """
    from ..functions.hashing import portable_hash64
    from pyspark.sql import Window

    chunks = chunk_documents(docs, size=size, stride=size, id_col=id_col, text_col=text_col)
    h = portable_hash64(F.col("chunk_text"))
    w = Window.partitionBy(h).orderBy(id_col, "chunk_id")
    flagged = chunks.withColumn("_rk", F.row_number().over(w))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("_rk") == 1).cast("bigint")).alias("kept_chunks"),
            F.sum((F.col("_rk") > 1).cast("bigint")).alias("dup_chunks"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` terms by TF-IDF (the classic corpus-relevance
    salience score; score = tf · ln(N/df)).

    Scale shape: explode → (doc, token) count is one partial/final hash agg;
    document frequency comes from a window over the tf table keyed by token
    (no vocab join to plan or broadcast — at 100 TB the vocab alone can be
    billions of keys); corpus size N is a scalar aggregate broadcast via
    crossJoin, never collected-and-relitted. The final per-doc top-k is a
    row_number window keyed by doc_id. Three narrow shuffles total, all on
    natural keys, all JVM-side.

    Float parity (README §Correctness): the score is floor-truncated on a
    1e-4 grid over exact-integer operands, and ranking orders by the FLOORED
    score (tie-break token) so both engines rank identical values.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.explode(whitespace_tokens(normalize_text(F.col(text_col)))).alias("token"),
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    df_w = Window.partitionBy("token")
    n = docs.select(F.countDistinct(id_col).alias("_n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(df_w))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.floor(F.col("tf") * F.log(F.col("_n_docs") / F.col("df")) * 10000) / 10000,
        )
    )
    rk_w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("_rk", F.row_number().over(rk_w))
        .filter(F.col("_rk") <= k)
        .select(id_col, "token", "tf", "df", "tfidf")
    )


def bm25_rank(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 relevance ranking of the corpus against a fixed query-term set
    (Robertson/Sparck-Jones idf: ln(1 + (N − df + ½)/(df + ½))) — the
    retrieval scorer behind search-based data curation.

    Scale shape: per-term tf and doc length come straight from the token
    array (``filter``/``size`` — zero shuffles, scan-speed); the corpus
    stats (N, avgdl, per-term df) are ONE tiny scalar aggregate broadcast
    back via crossJoin; the top-k is a TakeOrderedAndProject, not a global
    sort. Nothing shuffles the corpus itself.

    Float parity: contributions are summed in fixed textual order
    (term₁ + term₂ + …) from exact-integer tf/df/dl, and the emitted score
    is floor-truncated on a 1e-4 grid; ranking uses the floored score with
    doc-id tie-break.
    """
    tokenized = docs.select(
        F.col(id_col),
        whitespace_tokens(normalize_text(F.col(text_col))).alias("_toks"),
    )
    def _eq(term: str):
        # one-arg closure: a two-param lambda would be read by PySpark as the
        # (element, index) form and bind the index column to the default arg
        return lambda t: t == F.lit(term)

    base = tokenized.select(
        id_col,
        F.size("_toks").alias("dl"),
        *[
            F.size(F.filter(F.col("_toks"), _eq(term))).alias(f"_tf_{i}")
            for i, term in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_dl_sum"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("bigint")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("_dl_sum") / F.col("_n")
    contrib = None
    for i in range(len(terms)):
        idf = F.log(
            1.0 + (F.col("_n") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5)
        )
        tf = F.col(f"_tf_{i}")
        c = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * F.col("dl") / avgdl))
        contrib = c if contrib is None else contrib + c
    score = F.floor(contrib * 10000) / 10000
    return (
        scored.select(
            id_col,
            "dl",
            *[F.col(f"_tf_{i}").alias(f"tf_{i}") for i in range(len(terms))],
            score.alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), id_col)
        .limit(k)
    )


def lm_crossentropy_components(
    docs: DataFrame,
    model_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Generalized bigram-LM scoring: train the add-one-smoothed model on
    ``model_docs``, score ``docs``. The cross-corpus form behind both the
    self-scored perplexity filter (`lm_surprisal_score`) and DSIR-style
    importance resampling (score the raw pool under a target-domain model).

    Unseen bigrams/unigrams smooth through the same add-one formula via
    LEFT joins + coalesce: P = (c2+1)/(c1+V) with c2=c1=0 when absent —
    which degrades exactly to the self-scored inner-join form when
    ``model_docs is docs`` (every scored bigram is then in the model).

    Output: (id_col, n_bigrams, ssum) with ssum the INTEGER sum of floored
    milli-nat surprisals — order-independent and bit-exact cross-engine
    (see `lm_surprisal_score` for the parity rationale). Scale shape
    unchanged: two hash aggregates for the model, natural-key joins for
    scoring, V as a broadcast scalar.

    Tokenize-once contract (r9 verdict item 5): a frame that already
    carries a ``_toks`` array column is used as-is — callers scoring the
    same corpus under several models (DSIR) tokenize ONCE into a cached
    frame and pass it as ``docs``/``model_docs``, collapsing the text-scan
    repeat (6 → 1 for x_dsir_resample).
    """
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    if "_toks" in docs.columns:
        base = docs.select(id_col, "_toks").filter(F.size("_toks") >= 2)
    else:
        base = docs.select(F.col(id_col), toks.alias("_toks")).filter(
            F.size("_toks") >= 2
        )
    pairs = base.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.expr("slice(_toks, 1, size(_toks) - 1)").alias("w1"),
                F.expr("slice(_toks, 2, size(_toks) - 1)").alias("w2"),
            )
        ).alias("_bg"),
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))

    uni, bg = lm_bigram_model(model_docs, text_col)
    return _lm_score_pairs(pairs, uni, bg, id_col)


def lm_bigram_model(
    model_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """The bigram-LM MODEL as two count tables — ``uni`` (tok, c1) and
    ``bg`` (w1, w2, c2) — the persistable standing artifact of LM scoring
    (r11: plans/r11.ensure_lm_model writes exactly these two frames as
    companion parquet datasets; vocabulary size V is derived from ``uni``
    at score time, so the artifact carries no extra scalar sidecar).
    Respects the tokenize-once ``_toks`` contract of
    :func:`lm_crossentropy_components`."""
    m_toks = whitespace_tokens(normalize_text(F.col(text_col)))
    if "_toks" in model_docs.columns:
        m_base = model_docs.select("_toks")
    else:
        m_base = model_docs.select(m_toks.alias("_toks"))
    m_pairs = m_base.filter(F.size("_toks") >= 2).select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(_toks, 1, size(_toks) - 1)").alias("w1"),
                F.expr("slice(_toks, 2, size(_toks) - 1)").alias("w2"),
            )
        ).alias("_bg")
    ).select(F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    m_flat = m_base.select(F.explode("_toks").alias("tok"))
    uni = m_flat.groupBy("tok").agg(F.count(F.lit(1)).alias("c1")).cache()
    bg = m_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    return uni, bg


def lm_score_with_model(
    docs: DataFrame,
    uni: DataFrame,
    bg: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score ``docs`` against an ALREADY-BUILT bigram model (the two
    :func:`lm_bigram_model` count tables, typically read back from a
    persisted artifact): same joins, smoothing, and integer milli-nat
    arithmetic as :func:`lm_crossentropy_components`, so scoring through
    storage is bit-exact vs scoring in-session."""
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    if "_toks" in docs.columns:
        base = docs.select(id_col, "_toks").filter(F.size("_toks") >= 2)
    else:
        base = docs.select(F.col(id_col), toks.alias("_toks")).filter(
            F.size("_toks") >= 2
        )
    pairs = base.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.expr("slice(_toks, 1, size(_toks) - 1)").alias("w1"),
                F.expr("slice(_toks, 2, size(_toks) - 1)").alias("w2"),
            )
        ).alias("_bg"),
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    return _lm_score_pairs(pairs, uni, bg, id_col)


def _lm_score_pairs(
    pairs: DataFrame, uni: DataFrame, bg: DataFrame, id_col: str
) -> DataFrame:
    v = uni.agg(F.count(F.lit(1)).alias("_v"))

    scored = (
        pairs.join(bg, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("tok", "w1"), "w1", "left")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "_s",
            F.floor(
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("_v"))
                )
                * 1000
            ).cast("bigint"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("_s").alias("ssum")
    )


def lm_surprisal_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram-language-model quality score (the CCNet/KenLM-style
    perplexity-proxy filter): train add-one-smoothed bigram probabilities on
    the corpus itself, score each document by its mean token surprisal
    −ln P(w₂|w₁) — high = unnatural text, the classic crawl-quality signal.

    Scale shape: bigrams come from the token array (``arrays_zip`` of two
    slices — zero shuffle until the count); the model is two hash aggregates
    (bigram + unigram counts) joined back to the bigram stream on their
    natural keys, vocab size V is a broadcast scalar. This is the standard
    distributed LM-scoring join shape: nothing collects, the model tables
    shuffle once each.

    EXACT cross-engine parity: each bigram's surprisal is floored to an
    integer milli-nat (identical doubles from identical integer operands),
    so the per-doc aggregate is an INTEGER sum — order-independent, unlike
    a float sum — and the mean is one integer division emitted on a 1e-4
    grid. Output: (doc_id, n_bigrams, avg_surprisal).

    The self-scored special case of `lm_crossentropy_components` (model =
    corpus, so the smoothing left-joins degrade to inner joins).
    """
    comp = lm_crossentropy_components(docs, docs, id_col, text_col)
    return comp.select(
        id_col,
        "n_bigrams",
        (F.expr("(ssum * 10) div n_bigrams") / F.lit(10000.0)).alias("avg_surprisal"),
    )


def mixture_sample_summary(
    docs: DataFrame,
    budget_num: int = 2,
    budget_den: int = 5,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Target-mixture rebalancing (the data-mixing step of a training run):
    given a total budget (``budget_num/budget_den`` of the corpus) and a
    UNIFORM target share per stratum, derive each stratum's keep-rate from
    its observed count — over-represented domains get downsampled toward
    the target, under-represented ones keep everything (rate caps at 1) —
    then sample with the same salted-hash threshold as
    :func:`stratified_sample` (deterministic, layout-independent).

    All rate arithmetic is INTEGER (thresholds on a 1/10000 grid derived
    by integer division from exact counts), so the decision boundary is
    exact in any engine. The stratum stats are a tiny broadcast join; the
    corpus itself is touched by one projection+filter and one aggregate.

    Returns the per-stratum audit summary (n_total, n_kept, rate) — the
    mixing report a pipeline operator actually reviews.
    """
    from ..functions.hashing import portable_hash64

    counts = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    stats = counts.agg(
        F.sum("_n").alias("_total"), F.count(F.lit(1)).alias("_k")
    )
    thr = (
        counts.crossJoin(F.broadcast(stats))
        .withColumn("_budget", F.expr(f"(_total * {budget_num}) div {budget_den}"))
        .withColumn(
            "_thr",
            F.least(F.lit(10000).cast("bigint"), F.expr("(_budget * 10000) div (_k * _n)")),
        )
        .select(strata_col, "_n", "_thr")
    )
    bucket = F.pmod(
        portable_hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        F.lit(10000),
    )
    flagged = docs.select(F.col(id_col), F.col(strata_col)).join(
        F.broadcast(thr), strata_col
    )
    return (
        flagged.withColumn("_kept", (bucket < F.col("_thr")).cast("bigint"))
        .groupBy(strata_col)
        .agg(
            F.max("_n").alias("n_total"),
            F.sum("_kept").alias("n_kept"),
            (F.max("_thr") / F.lit(10000.0)).alias("rate"),
        )
    )


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """BPE tokenizer training (the merge-learning loop of byte-pair
    encoding) expressed as DataFrame ops: reduce the corpus to its
    word-frequency table ONCE, then per iteration count adjacent symbol
    pairs weighted by word frequency, take the argmax pair (ties broken
    lexicographically), and fold the merge through every word's symbol
    sequence greedily left-to-right.

    Scale shape: after the one corpus-wide word-count shuffle the loop runs
    entirely on the VOCABULARY table (distinct words × freq — orders of
    magnitude smaller than the corpus; this is how production BPE trainers
    scale). Pair counting is a narrow (a, b)-keyed aggregate per iteration;
    the only driver transfer is the single argmax row per merge (the same
    bounded-scalar pattern as the IVF centroid build). The merge fold is a
    JVM higher-order ``aggregate`` — no Python in the loop.

    Returns the learned merge table: (step, p1, p2, pair_count).
    """
    merges, _ = _bpe_train(docs, n_merges, text_col)
    return docs.sparkSession.createDataFrame(
        merges, "step int, p1 string, p2 string, pair_count bigint"
    )


def _bpe_train(docs: DataFrame, n_merges: int, text_col: str = "text"):
    """Shared BPE training loop: returns (merges, encoded_vocab) where
    ``merges`` is the bounded [(step, p1, p2, ct)] model artifact and
    ``encoded_vocab`` is the (word, freq, sym) frame AFTER all folds — the
    already-encoded vocabulary the apply stage joins against (training
    necessarily produces it, so apply pays no second fold)."""
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    words = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        # the corpus-wide word-count shuffle feeds every merge step's
        # argmax action: cache so the corpus is scanned once, not
        # n_merges times (the loop itself re-folds only the vocab table)
        .cache()
    )
    rep = words.select("word", "freq", F.split("word", "").alias("sym"))
    merges = []
    for step in range(1, n_merges + 1):
        pairs = rep.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(sym, 1, size(sym) - 1)").alias("a"),
                    F.expr("slice(sym, 2, size(sym) - 1)").alias("b"),
                )
            ).alias("_p"),
        ).select("freq", F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("ct"))
            .orderBy(F.col("ct").desc(), "a", "b")
            .first()
        )
        p1, p2, ct = top["a"], top["b"], top["ct"]
        merges.append((step, p1, p2, ct))

        def _fold(p1: str = p1, p2: str = p2):
            # two-arg lambda required by the higher-order function; pair
            # literals bound via the factory's defaults
            return lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(p1))
                & (x == F.lit(p2)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(p1 + p2))),
            ).otherwise(F.concat(acc, F.array(x)))

        rep = rep.withColumn(
            "sym",
            F.aggregate(F.col("sym"), F.array().cast("array<string>"), _fold()),
        )
    return merges, rep


def bpe_encoded_length(
    docs: DataFrame,
    n_merges: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer APPLY at corpus scale — the production-hot stage: encode
    every document with the merges :func:`bpe_train_merges` learns and
    report per-document symbol counts (raw chars vs post-merge), i.e. the
    compression the tokenizer actually achieves per doc.

    Scale shape: the merge fold runs ONCE PER DISTINCT WORD — training
    already folds the vocabulary table, so apply reuses that encoded vocab
    and only JOINS it back to the exploded corpus token stream on the word
    key (Heaps-law vocab ≪ corpus tokens), then one per-doc aggregate.
    Never a per-corpus-token fold, never Python. The merge list itself is
    the bounded model artifact (one argmax row per step — the IVF-centroid
    pattern).
    """
    _, vocab = _bpe_train(docs, n_merges, text_col)
    return bpe_encoded_length_with_vocab(docs, vocab, id_col, text_col)


def bpe_encoded_length_with_vocab(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The apply half of :func:`bpe_encoded_length` against an ALREADY
    trained encoded vocabulary (word, freq, sym) — callers that train once
    and encode many corpora (or run train+apply as separate queries over
    one snapshot) reuse the vocab instead of re-paying the merge-argmax
    actions."""
    enc = vocab.select(
        "word",
        F.length("word").cast("bigint").alias("n_raw"),
        F.size("sym").cast("bigint").alias("n_sym"),
    )
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    corpus = docs.select(F.col(id_col), F.explode(toks).alias("word"))
    return (
        corpus.join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_raw").alias("n_sym_raw"),
            F.sum("n_sym").alias("n_sym_enc"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    scale: int = 256,
    salt: str = "wsample",
) -> DataFrame:
    """Per-row weighted sampling: keep a document with probability
    min(1, weight/scale), deterministically — the quality-weighted
    upsampling/downsampling primitive (e.g. keep long documents, thin
    boilerplate) complementing the per-stratum :func:`stratified_sample`.

    Decision is pure integer arithmetic: salted id-hash bucket in [0,10000)
    vs threshold ``min(10000, weight·10000 div scale)`` — no float at the
    boundary, engine-portable, stable under corpus growth and re-runs.
    Map-side projection+filter: zero shuffles.
    """
    from ..functions.hashing import portable_hash64

    bucket = F.pmod(
        portable_hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        F.lit(10000),
    )
    thr = F.least(
        F.lit(10000).cast("bigint"),
        F.expr(f"({weight_col} * 10000) div {scale}").cast("bigint"),
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(weight_col),
            bucket.cast("bigint").alias("bucket"),
            thr.alias("keep_thr"),
        )
        .filter(F.col("bucket") < F.col("keep_thr"))
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic hash-stratified sampling — the domain-mixing primitive
    of a training-data pipeline (e.g. downsample low-quality crawl, upweight
    books): keep a document iff its salted id-hash bucket falls under the
    stratum's rate, and emit the inverse-rate ``weight`` so downstream
    mixture accounting stays unbiased.

    Rates compile to an integer-threshold CASE expression (exact — no float
    equality at the decision boundary), and the whole operator is a map-side
    projection+filter: zero shuffles, reproducible under corpus growth and
    re-runs (unlike ``df.sample``, whose seed is partition-layout
    dependent).
    """
    from functools import reduce

    from ..functions.hashing import portable_hash64

    bucket = F.pmod(
        portable_hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        F.lit(10000),
    )
    thr = reduce(
        lambda acc, kv: F.when(F.col(strata_col) == kv[0], F.lit(int(round(kv[1] * 10000)))).otherwise(acc),
        rates.items(),
        F.lit(int(round(default_rate * 10000))),
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(strata_col),
            bucket.cast("bigint").alias("bucket"),
            thr.cast("bigint").alias("_thr"),
        )
        .filter(F.col("bucket") < F.col("_thr"))
        .withColumn("weight", F.floor((F.lit(10000.0) / F.col("_thr")) * 10000) / 10000)
        .drop("_thr")
    )


def feature_hash_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    salt: str = "fh",
) -> DataFrame:
    """Feature hashing (the "hashing trick", Weinberger et al. 2009): embed
    each document as a sparse integer vector WITHOUT building a vocabulary —
    bucket = portable_hash(salt:token) mod n_buckets, sign = ±1 from the next
    hash bit, weight[bucket] += sign per occurrence.

    Output is the sparse long form (doc_id, bucket, weight int) — exactly
    what a downstream distributed learner or similarity join consumes, and
    integer-exact cross-engine. Scale: tokenize→explode→one hash aggregate;
    no vocab table, no broadcast, no second pass — the property that makes
    feature hashing the standard at corpus scale where a vocab build would
    itself be a 100 TB shuffle. Empty docs vanish (no tokens → no rows).
    """
    from ..functions.hashing import portable_hash64

    tok = F.explode(whitespace_tokens(normalize_text(F.col(text_col)))).alias("tok")
    h = portable_hash64(F.concat(F.lit(f"{salt}:"), F.col("tok")))
    # two independent hashes (Weinberger's ξ): bucket from one, sign from the
    # other — avoids bit-extraction on a 60-bit value (double division would
    # lose mantissa precision) and keeps both expressions oracle-portable
    hs = portable_hash64(F.concat(F.lit(f"{salt}s:"), F.col("tok")))
    bucket = F.pmod(h, F.lit(n_buckets)).cast("int")
    sign = F.when(F.pmod(hs, F.lit(2)) == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        docs.select(F.col(id_col), tok)
        .select(F.col(id_col), bucket.alias("bucket"), sign.alias("_s"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("_s").cast("bigint").alias("weight"))
    )


def boilerplate_prefixes(
    docs: DataFrame,
    n_tokens: int = 2,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Boilerplate-prefix detection: flag documents whose normalized prefix
    appears in >= min_docs documents (INCLUDING this one) from the same
    source — min_docs=2 means "shared with at least one other doc",
    matching the HAVING count(*) >= min_docs aggregate below — the
    header/banner-removal signal a web-crawl curation pass runs per domain
    (CCNet strips repeated leading lines the same way; here the unit is the
    normalized n-token prefix since the fixture corpus is single-line).

    Scale shape: one hash aggregate keyed (source, prefix) to count sharers,
    then an inner join back on the same key — both sides partition on the
    identical composite key so AQE plans a single co-partitioned exchange;
    no window, no collect, and the counts side is output-filtered (n_docs >=
    min_docs) before the join so only boilerplate keys shuffle back.

    Output: (doc_id, source, prefix, n_docs) for flagged docs only.
    """
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    pref = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.concat_ws(" ", F.slice(toks, 1, n_tokens)).alias("prefix"),
    )
    counts = (
        pref.groupBy(group_col, "prefix")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return pref.join(counts, [group_col, "prefix"]).select(
        id_col, group_col, "prefix", "n_docs"
    )


def reservoir_sample(
    docs: DataFrame,
    k: int = 20,
    keys: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
    salt: str = "rs",
) -> DataFrame:
    """Deterministic per-key reservoir sample: exactly min(k, group size)
    rows per key, uniform without replacement under the portable-hash
    ordering — the "inspect 20 random docs per language" primitive, and the
    derandomized equivalent of a distributed reservoir (hash order IS a
    random permutation, fixed by the salt, so re-runs and engines agree).

    Inclusion weight rides along as (n_docs, k) so downstream estimators
    can reweight without a float division here. One keyed window — the same
    single-shuffle shape as any top-k — plus a window count; no collect, no
    per-key skew issue beyond the window itself (k rows survive per key).
    """
    from pyspark.sql import Window

    from ..functions.hashing import portable_hash64

    h = portable_hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    kcols = [F.col(c) for c in keys]
    w = Window.partitionBy(*kcols).orderBy(h.asc(), F.col(id_col))
    wn = Window.partitionBy(*kcols)
    return (
        docs.select(*kcols, F.col(id_col))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(wn))
        .filter(F.col("rk") <= k)
        .select(*keys, id_col, "rk", "n_docs", F.lit(k).alias("k"))
    )


def backoff_trigram_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    heldout_buckets: int = 100,
    salt: str = "lmsplit",
) -> DataFrame:
    """Stupid-Backoff trigram LM scoring of a HELD-OUT split (Brants et al.
    2007, "Large Language Models in Machine Translation" — the
    count-based backoff score Google used at web scale precisely because it
    needs no normalization and distributes as plain count joins):

        S(w3|w1w2) = c3(w1w2w3)/c2(w1w2)            if the trigram was seen
                   = 0.4 * c2(w2w3)/c1(w2)          else if the bigram was
                   = 0.4^2 * c1(w3)/N               else (0 for OOV)

    The model trains on the ~90% hash-split complement and scores the ~10%
    held-out docs (same portable md5 bucket construction as
    :func:`hash_split`), so the backoff branches actually fire — scoring a
    corpus with its own counts never leaves the first branch. This is the
    held-out-perplexity eval shape of a data pipeline's LM-quality gate,
    complementing :func:`lm_surprisal_score` (self-scored bigram surprisal).

    EXACT parity: scores live on an integer 1e-6 grid — branch ratios are
    (1e6*c3) div c2, (4e5*c2) div c1, (16e4*c1) div N — so the per-doc sum
    is an order-independent BIGINT sum and the mean one integer division.

    Scale shape: trigram/bigram streams come from array slices zipped
    in-place (zero shuffle before the count aggregates); the three model
    tables are hash aggregates joined back to the held-out trigram stream
    on their natural keys — the standard distributed LM-scoring join chain.
    Only the ~10% held-out stream is re-shuffled per join; N is a broadcast
    scalar. Nothing collects; no Python touches a row.

    The tokenized ``base`` frame is deliberately NOT cached (scan repeat
    7 = 3 n-gram orders × 2 join sides + N): the r9 A/B at sf0.1 (hot
    session, best-of-3) measured cache-base warm 1.06 s / cold 1.39 s vs
    no-cache warm 1.09 s / cold 1.02 s — a tie on warm, a loss on cold,
    because the n-gram explodes dominate and re-tokenizing from the
    pruned parquet scan is cheap next to them. At 100 TB a corpus-sized
    token-array cache is also the wrong memory trade; the no-cache form
    is the keeper (BENCHNOTES.md r9).

    Output: (doc_id, n_trigrams, sum_score_micro, avg_score_micro), one row
    per held-out doc with ≥3 tokens.
    """
    from ..functions.hashing import portable_hash64

    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    bucket = F.pmod(
        portable_hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        F.lit(1000),
    )
    base = docs.select(
        F.col(id_col), toks.alias("_toks"), (bucket < heldout_buckets).alias("_held")
    )
    train = base.filter(~F.col("_held"))
    held = base.filter(F.col("_held"))

    def _grams(df: DataFrame, n: int) -> DataFrame:
        sz = F.size("_toks")
        cols = [F.slice("_toks", i + 1, sz - (n - 1)).alias(f"w{i + 1}") for i in range(n)]
        t = (
            df.filter(sz >= n)
            .select(F.col(id_col), F.explode(F.arrays_zip(*cols)).alias("_g"))
        )
        return t.select(
            id_col, *[F.col(f"_g.w{i + 1}").alias(f"w{i + 1}") for i in range(n)]
        )

    # r12 (guide §1.2 don't recompute, §5 cache the derived small frame):
    # c2 and c1 each feed TWO join sides of the backoff chain, so the
    # uncached form compiled each model aggregate twice — two extra full
    # corpus explode→aggregate passes per action (scan-repeat 7). The
    # model COUNT tables (≪ corpus, the right thing to cache at any
    # scale — they are the LM artifact a production run persists) are
    # cached instead; n_train = Σ c1 replaces its own corpus scan (the
    # sum of per-token counts IS the train token total, exactly).
    # Scan-repeat 7 → 4; the r9 A/B that rejected caching the TOKENIZED
    # CORPUS frame (corpus-sized memory for a tie) still holds and is a
    # different trade from caching the model tables.
    c3 = _grams(train, 3).groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c3"))
    c2 = (
        _grams(train, 2)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .cache()
    )
    c1 = (
        train.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
        .cache()
    )
    n_train = c1.agg(F.sum("c1").alias("n_train"))

    ht = _grams(held, 3)
    scored = (
        ht.join(c3, ["w1", "w2", "w3"], "left")
        .join(c2.withColumnRenamed("c2", "c2_ctx"), ["w1", "w2"], "left")
        .join(
            c2.select(
                F.col("w1").alias("b1"), F.col("w2").alias("b2"),
                F.col("c2").alias("c2_bg"),
            ),
            (F.col("w2") == F.col("b1")) & (F.col("w3") == F.col("b2")),
            "left",
        )
        .join(c1.select(F.col("w").alias("w2"), F.col("c1").alias("c1_w2")), "w2", "left")
        .join(c1.select(F.col("w").alias("w3"), F.col("c1").alias("c1_w3")), "w3", "left")
        .crossJoin(F.broadcast(n_train))
    )
    score = (
        F.when(F.col("c3").isNotNull(), F.expr("CAST((1000000 * c3) DIV c2_ctx AS BIGINT)"))
        .when(F.col("c2_bg").isNotNull(), F.expr("CAST((400000 * c2_bg) DIV c1_w2 AS BIGINT)"))
        .otherwise(F.expr("CAST((160000 * coalesce(c1_w3, 0)) DIV n_train AS BIGINT)"))
    )
    return (
        scored.select(F.col(id_col), score.alias("_s"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("_s").alias("sum_score_micro"),
        )
        .select(
            id_col,
            "n_trigrams",
            "sum_score_micro",
            F.expr("CAST(sum_score_micro DIV n_trigrams AS BIGINT)").alias(
                "avg_score_micro"
            ),
        )
    )


def curriculum_phases(
    docs: DataFrame,
    warmup_pct: int = 20,
    anneal_pct: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum data ordering: assign each document to a training phase
    (warmup / main / anneal) by cumulative TOKEN budget over a quality
    ordering — cleanest docs (highest classifier logit) fill the warmup
    budget, the tail of hardest docs lands in anneal. The phase column is
    what a curriculum dataloader shards on (easy-to-hard scheduling,
    Bengio et al. 2009, as practiced in LLM data pipelines).

    Scale design: the corpus is NEVER globally sorted. Difficulty is the
    integer milli-grid logit of :func:`quality_classifier`, so the
    cumulative-token sweep runs over the tiny per-logit histogram (bounded
    by the grid, a few thousand rows regardless of corpus size) via
    ``distributed_cumsum``, and phases broadcast-join back to the corpus by
    logit bucket — the same grid-histogram trick as the selection capstone
    (plans/llm.py select_pipeline). Phase boundaries therefore land on
    difficulty-grid bucket edges: every doc with the same logit gets the
    same phase — a deterministic, engine-exact semantic (no hash
    tie-breaking inside a bucket).

    Output: (doc_id, logit_milli, n_tokens, phase).
    """
    from .windows import distributed_cumsum

    feats = quality_classifier(docs, id_col, text_col).select(
        id_col, "n_tokens", "logit_milli"
    )
    hist = feats.groupBy("logit_milli").agg(F.sum("n_tokens").alias("_bt"))
    cum = distributed_cumsum(
        hist.withColumn("_neg", -F.col("logit_milli")), ["_neg"], "_bt", out_col="_ct"
    )
    tot = hist.agg(F.sum("_bt").alias("_t"))
    main_pct = 100 - anneal_pct
    ph = cum.crossJoin(F.broadcast(tot)).select(
        "logit_milli",
        F.when(F.expr(f"_ct * 100 <= _t * {warmup_pct}"), F.lit("warmup"))
        .when(F.expr(f"_ct * 100 <= _t * {main_pct}"), F.lit("main"))
        .otherwise(F.lit("anneal"))
        .alias("phase"),
    )
    return feats.join(F.broadcast(ph), "logit_milli").select(
        id_col, "logit_milli", "n_tokens", "phase"
    )
