"""Tokenizer, hashing, datetime helpers."""

import duckdb
from pyspark.sql import functions as F

from gmall_flink_230422_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)
from gmall_flink_230422_spark.functions.tokenize import (
    tokenize_text,
    whitespace_tokens,
)


def test_tokenizer_latin_runs():
    assert tokenize_text("Hello, World! 42x") == ["hello", "world", "42x"]


def test_tokenizer_cjk_bigrams():
    # IK max-word approximation: CJK runs → bigrams (U2, KeyWordUtil.java)
    assert tokenize_text("小米手机") == ["小米", "米手", "手机"]
    assert tokenize_text("茶") == ["茶"]
    assert tokenize_text("apple苹果5G") == ["apple", "苹果", "5g"]


def test_tokenizer_empty():
    assert tokenize_text("") == []
    assert tokenize_text(None) == []
    assert tokenize_text("  ,;  ") == []


def test_whitespace_tokens(spark):
    out = spark.createDataFrame([("a  b c",), ("",)], ["t"]).select(
        whitespace_tokens(F.col("t")).alias("toks")
    ).collect()
    assert out[0]["toks"] == ["a", "b", "c"]
    assert out[1]["toks"] == []


def test_portable_hash_matches_duckdb(spark):
    """The md5-derived 60-bit hash must be identical in Spark and DuckDB —
    the foundation of every oracle-checked MinHash/SimHash query."""
    vals = ["abc", "the quick fox", "小米", ""]
    sdf = spark.createDataFrame([(v,) for v in vals], ["s"])
    spark_hashes = [r[0] for r in sdf.select(portable_hash64(F.col("s"))).collect()]
    con = duckdb.connect()
    duck_hashes = [
        con.sql(f"SELECT {portable_hash64_sql('?')}", params=[v]).fetchone()[0]
        for v in vals
    ]
    assert spark_hashes == duck_hashes
