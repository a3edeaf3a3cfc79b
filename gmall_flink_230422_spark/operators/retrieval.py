"""Sparse-retrieval operators (LLM-pipeline extension): BM25 scoring and
PMI collocation mining over the ``documents`` table.

These are the lexical half of a training-data pipeline: BM25 powers
decontamination-by-retrieval and quality filtering against a reference set;
PMI collocations feed tokenizer/vocab construction. Both are pure DataFrame
compositions — tokenize at scan, one narrow aggregate per statistic, scalar
corpus stats carried via a broadcast 1-row join (never ``collect``).

Scale design: per-term statistics for a *query* term set are a handful of
rows (broadcast); per-doc term frequencies are filtered to the query terms
BEFORE the aggregate, so the shuffled data is O(matching docs × terms), not
O(corpus tokens). Float parity with the DuckDB oracle follows the repo rule:
every per-term partial score is floor-truncated to an integer 1e-4 grid and
summed as exact integers — summation order can never move the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import whitespace_tokens
from .dedup import normalize_text

# BM25 constants (Robertson k1/b defaults, fixed for oracle parity)
K1 = 1.2
B = 0.75


def doc_term_freqs(docs: DataFrame, terms: tuple[str, ...],
                   id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, dl, term, tf) for the given term set only.

    The per-token explode is filtered to the query terms *before* the
    aggregate, so the shuffle carries only matching (doc, term) pairs.
    ``dl`` (total token count) rides along as a plain column — it is
    constant per doc, so it survives the groupBy as ``first``-free key.
    """
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    exploded = docs.select(
        F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(*terms))
    return exploded.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def bm25_topk(docs: DataFrame, terms: tuple[str, ...], k: int = 20,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BM25 top-k retrieval for a fixed bag-of-words query.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/Σdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (Lucene's non-negative
    form). Corpus scalars N and Σdl come from one tiny aggregate broadcast
    to the scorers; df per query term is a ≤|terms|-row broadcast.

    Parity: each term's partial score is floored onto the 1e-4 grid as a
    BIGINT and the per-doc sum runs over those integers, so Spark's
    unordered aggregation cannot diverge from the oracle by a ulp.
    Output: (doc_id, score) — top ``k`` by score desc, doc_id asc.
    """
    tfs = doc_term_freqs(docs, terms, id_col, text_col)
    # corpus scalars over ALL docs (not just matches): N docs, Σ dl
    toks_all = docs.select(
        F.size(whitespace_tokens(normalize_text(F.col(text_col)))).alias("dl")
    )
    stats = toks_all.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    dfs = tfs.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    scored = (
        tfs.join(F.broadcast(dfs), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "rel_dl",
            (F.col("dl") * F.col("n_docs")).cast("double") / F.col("sum_dl"),
        )
        .withColumn(
            "part_e4",
            F.floor(
                F.col("idf")
                * (
                    (F.col("tf") * F.lit(K1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(K1)
                        * (F.lit(1.0 - B) + F.lit(B) * F.col("rel_dl"))
                    )
                )
                * F.lit(10000.0)
            ).cast("bigint"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg((F.sum("part_e4") / F.lit(10000.0)).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_oracle_sql(terms: tuple[str, ...], k: int, toks_expr: str) -> str:
    """DuckDB oracle for :func:`bm25_topk` — the same expression tree,
    floor-per-term on the 1e-4 integer grid before the per-doc sum."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH dls AS (
  SELECT doc_id, len({toks_expr}) AS dl FROM documents
),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dls),
tfs AS (
  SELECT t.doc_id, d.dl, t.term, count(*) AS tf
  FROM (SELECT doc_id, unnest({toks_expr}) AS term FROM documents) t
  JOIN dls d ON t.doc_id = d.doc_id
  WHERE t.term IN ({in_list})
  GROUP BY 1, 2, 3
),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tfs GROUP BY 1),
parts AS (
  SELECT tfs.doc_id,
         floor(
           ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * ((tfs.tf * {K1 + 1.0}) /
              (tfs.tf + {K1} * ({1.0 - B} + {B} * ((tfs.dl * s.n_docs) * 1.0 / s.sum_dl))))
           * 10000.0
         )::BIGINT AS part_e4
  FROM tfs JOIN dfs ON tfs.term = dfs.term CROSS JOIN stats s
)
SELECT doc_id, sum(part_e4) / 10000.0 AS score
FROM parts GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT {k}
"""


def pmi_bigrams(docs: DataFrame, min_count: int = 5, k: int = 100,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k collocations by pointwise mutual information.

    PMI(a,b) = ln( c_ab · Nu² / (Nb · c_a · c_b) ) over positional unigram
    counts ``c_*`` (Nu = total unigrams, Nb = total bigrams). All counts are
    exact integers; the only float op is the final ln over one
    double-division chain mirrored verbatim in the oracle, then
    floor-truncated to 4 dp.

    The bigram array is built per-row with higher-order array functions —
    zero shuffle until the count aggregates. Unigram/bigram total counts are
    1-row aggregates broadcast into the scorer.
    """
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    toked = docs.select(F.col(id_col), toks.alias("toks"))
    uni = (
        toked.select(F.explode("toks").alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    )
    bigram_arr = F.expr(
        "filter(transform(toks, (t, i) -> "
        "IF(i < size(toks) - 1, concat(t, ' ', element_at(toks, i + 2)), NULL)"
        "), x -> x IS NOT NULL)"
    )
    bi = (
        toked.select(F.explode(bigram_arr).alias("bigram"))
        .groupBy("bigram").agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    totals = (
        toked.agg(
            F.sum(F.size("toks")).alias("nu"),
            F.sum(F.greatest(F.size("toks") - 1, F.lit(0))).alias("nb"),
        )
    )
    parts = F.split(F.col("bigram"), " ")
    scored = (
        bi.withColumn("tok_a", parts.getItem(0))
        .withColumn("tok_b", parts.getItem(1))
        .join(F.broadcast(uni.selectExpr("tok AS tok_a", "c AS c_a")), "tok_a")
        .join(F.broadcast(uni.selectExpr("tok AS tok_b", "c AS c_b")), "tok_b")
        .join(F.broadcast(totals))
        .select(
            "bigram",
            F.col("c_ab"),
            (
                F.floor(
                    F.log(
                        (F.col("c_ab").cast("double")
                         * F.col("nu").cast("double")
                         * F.col("nu").cast("double"))
                        / (F.col("nb").cast("double")
                           * F.col("c_a").cast("double")
                           * F.col("c_b").cast("double"))
                    )
                    * F.lit(10000.0)
                )
                / F.lit(10000.0)
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), F.col("bigram")).limit(k)


def pmi_oracle_sql(min_count: int, k: int, toks_expr: str) -> str:
    """DuckDB oracle for :func:`pmi_bigrams` (lead-window bigrams)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks_expr}) AS tok,
         generate_subscripts({toks_expr}, 1) AS pos
  FROM documents
),
uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
big AS (
  SELECT tok || ' ' || lead(tok) OVER w AS bigram,
         tok AS tok_a, lead(tok) OVER w AS tok_b
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(tok) OVER w IS NOT NULL
),
bi AS (
  SELECT bigram, tok_a, tok_b, count(*) AS c_ab FROM big GROUP BY 1, 2, 3
  HAVING count(*) >= {min_count}
),
totals AS (
  SELECT sum(len({toks_expr})) AS nu,
         sum(greatest(len({toks_expr}) - 1, 0)) AS nb
  FROM documents
)
SELECT bi.bigram, bi.c_ab,
       floor(ln((bi.c_ab::DOUBLE * t.nu::DOUBLE * t.nu::DOUBLE)
                / (t.nb::DOUBLE * a.c::DOUBLE * b.c::DOUBLE)) * 10000.0) / 10000.0 AS pmi
FROM bi
JOIN uni a ON bi.tok_a = a.tok
JOIN uni b ON bi.tok_b = b.tok
CROSS JOIN totals t
ORDER BY pmi DESC, bi.bigram LIMIT {k}
"""


def inverted_index(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", top_terms: int = 20,
                   postings_cap: int = 8) -> DataFrame:
    """Inverted-index build: (term, df, postings) for the ``top_terms``
    highest-df terms, postings capped to the ``postings_cap`` lowest doc ids.

    The index behind decontamination-by-retrieval and corpus search. Scale
    shape: the per-(doc, term) distinct and the df aggregate are plain hash
    shuffles on term; the postings ARRAY is bounded BEFORE collection — a
    row_number-over-term window (Spark compiles the rn≤cap filter to
    WindowGroupLimit, a per-partition top-k that never sorts whole posting
    lists) feeds collect_list, so no executor ever materializes an unbounded
    list for a stop-word term. Full postings at 100 TB would stay exploded
    as (term, doc_id) rows — the capped array form here is the index-summary
    artifact.
    """
    from pyspark.sql import Window

    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    dt = docs.select(F.col(id_col), F.explode(toks).alias("term")).distinct()
    dfs = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("term").orderBy(id_col)
    capped = (
        dt.select("term", id_col, F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= postings_cap)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list(id_col)).alias("postings"))
    )
    return (
        dfs.join(capped, "term")
        .orderBy(F.col("df").desc(), "term")
        .limit(top_terms)
    )


def conjunctive_topdf_query(docs: DataFrame, ranks: tuple[int, ...] = (2, 3),
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Conjunctive (AND) retrieval via posting intersection, with the query
    terms picked data-dependently: the terms at df ranks ``ranks`` (df desc,
    term asc — deterministic in both engines, no fixture-term hardcoding).

    The picked-term table is a ≤|ranks|-row broadcast; the intersection is
    one semi-ish equi-join plus a per-doc count — the AND of posting lists
    without ever materializing them. The df-rank is a distributed
    TakeOrderedAndProject of the top-``max(ranks)`` terms (r4: replaces
    the global row_number window over the whole vocabulary, whose Sort
    was a single-partition exchange — the one the r3 audit flagged);
    ranks within that ≤max(ranks)-row cached frame come from a broadcast
    ordering self-join, not a window.
    """
    toks = whitespace_tokens(normalize_text(F.col(text_col)))
    dt = docs.select(F.col(id_col), F.explode(toks).alias("term")).distinct()
    dfs = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    top = dfs.orderBy(F.col("df").desc(), "term").limit(max(ranks)).cache()
    t2 = top.select(F.col("df").alias("df2"), F.col("term").alias("term2"))
    pick = (
        top.join(
            F.broadcast(t2),
            (F.col("df2") > F.col("df"))
            | ((F.col("df2") == F.col("df")) & (F.col("term2") <= F.col("term"))),
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("rk"))
        .filter(F.col("rk").isin(*ranks))
        .select("term")
    )
    return (
        dt.join(F.broadcast(pick), "term")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_terms"))
        .filter(F.col("n_terms") == len(ranks))
        .select(id_col)
    )
