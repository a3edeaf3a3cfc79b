"""Portable deterministic hashing.

The oracle harness compares Spark results against DuckDB, so every hash used
in a checked query must produce identical values in both engines. Native
hashes differ (Spark xxhash64 vs DuckDB hash), so we derive a 60-bit integer
from md5 hex — md5 is bit-identical everywhere.

Spark :  conv(substr(md5(x), 1, 15), 16, 10)::bigint
DuckDB:  ('0x' || substr(md5(x), 1, 15))::bigint

Both helpers below emit the *same* hash for the same input string, which is
what makes MinHash/SimHash signatures oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column) -> Column:
    """60-bit non-negative integer hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def fast_hash60(col: Column) -> Column:
    """60-bit non-negative hash via Spark's codegen'd xxhash64 — an order of
    magnitude cheaper than the md5 path and type-direct (no string cast).
    NOT cross-engine portable: use only where the hash is result-invisible
    (e.g. Bloom pruning, where false positives merely prune less and the
    exact join downstream fixes everything)."""
    return F.pmod(F.xxhash64(col), F.lit(1 << 60))


def portable_hash64_sql(expr: str) -> str:
    """Same hash as :func:`portable_hash64`, as a DuckDB SQL expression."""
    return f"(('0x' || substr(md5({expr}), 1, 15)))::BIGINT"


def portable_hash64_spark_sql(expr: str) -> str:
    """Same hash, as a Spark SQL expression string."""
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
