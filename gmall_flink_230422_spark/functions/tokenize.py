"""Tokenization (reference UDTF surface).

Reference: ``SplitFunction`` UDTF (R/app/func/SplitFunction.java:11-22) wraps
the IK Chinese analyzer (R/utils/KeyWordUtil.java:12-28, smart=false
max-word mode) and is consumed as ``LATERAL TABLE(SplitFunction(item))``
(R/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:134-141).

IK is a dictionary tokenizer we can't ship; the deterministic replacement:
  - latin/digit runs are tokens (lowercased)
  - CJK runs emit all bigrams (plus the single char for length-1 runs),
    approximating IK max-word mode
Documented as a semantic approximation (SURVEY.md §2.7 U2). For
oracle-checked queries we use plain whitespace ``split`` (expressible in
both engines); this full tokenizer backs the UDF/UDTF surface and unit tests.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_RUN = re.compile(r"[A-Za-z0-9]+|[一-鿿]+")


def tokenize_text(text: str | None) -> list[str]:
    """Pure-python tokenizer: latin/digit runs + CJK bigrams."""
    if not text:
        return []
    out: list[str] = []
    for run in _RUN.findall(text):
        if run[0].isascii():
            out.append(run.lower())
        elif len(run) == 1:
            out.append(run)
        else:
            out.extend(run[i : i + 2] for i in range(len(run) - 1))
    return out


@F.pandas_udf(ArrayType(StringType()))
def _tokenize_series(texts: pd.Series) -> pd.Series:
    """Arrow-batched tokenizer: one Python call per ~10k-row batch instead of
    one per row. At 100 TB this is the difference between a per-row
    Python round-trip (BatchEvalPython) and vectorized Arrow transfer
    (ArrowEvalPython) — the regex itself is unchanged."""
    return texts.apply(lambda t: tokenize_text(t) if isinstance(t, str) else [])


def register_split_udtf(spark: SparkSession, name: str = "split_words") -> None:
    """Register the UDTF analog: SQL ``explode(split_words(col))`` replaces
    Flink's ``LATERAL TABLE(SplitFunction(col))``. Registered as a pandas_udf
    so the SQL path is Arrow-batched too."""
    spark.udf.register(name, _tokenize_series)


def split_words(col: Column) -> Column:
    """DataFrame-side tokenizer column (array<string>), Arrow-batched."""
    return _tokenize_series(col)


def whitespace_tokens(col: Column) -> Column:
    """Oracle-portable tokenizer: non-empty whitespace-separated tokens."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))
