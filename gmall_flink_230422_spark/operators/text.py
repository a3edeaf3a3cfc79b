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
