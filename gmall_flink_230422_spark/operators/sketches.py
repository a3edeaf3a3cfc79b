"""Deterministic distributed sketches: HyperLogLog and count-min.

Sketches are THE fixed-state answer to "count/estimate over 100 TB without
holding 100 TB of state": both sketches here reduce map-side to a few KB per
group (HLL: m=256 bucket maxima; CMS: a d×w counter grid), merge
associatively in Spark's partial/final hash aggregate, and never shuffle raw
values — only (bucket, max) / (row, col, count) cells.

Unlike library HLLs (Spark's approx_count_distinct, DuckDB's approx_*),
every bit here is DETERMINISTIC and engine-portable: the hash is the
portable md5-derived 60-bit int (functions.hashing), rho/bucket arithmetic
is integer-exact, and the final HLL estimate is ONE double division of
exact integers — so the DuckDB oracle reproduces the estimate bit-for-bit
and the driver's value-hash comparison passes. That is the point: an
*auditable* sketch, not merely an approximate one.

HLL spec (raw estimator, documented deviations from the Flajolet paper):
- h = portable 60-bit hash; bucket = h % m (m = 256); rest = h div m.
- rho = 1 + (trailing zeros of rest), capped at 53 when rest == 0
  (52 usable rest bits). Trailing — not leading — zeros: identical
  geometric distribution, and exactly computable in both engines as
  log2(rest & -rest), a power of two whose log2 is exact in IEEE double.
- estimate = alpha_m * m^2 / sum_j 2^(-M_j). We evaluate the sum as the
  exact BIGINT  num = sum_j 2^(53 - M_j)  (each term ≤ 2^53, ≤ m terms →
  no overflow, no float rounding, order-independent), then do a single
  double division  EST_NUMERATOR / num. No small-range (linear counting)
  correction — ln() is libm-dependent and would break cross-engine
  determinism; below n ≈ 2.5m the raw estimate is biased high and we
  document that instead (tests assert accuracy only in the n >> m regime).

CMS spec: d=4 rows, w=1024 columns, universal family
  col_i = ((1 + i*A) * (h % p) + 7 + i*B) % p % w
over the same portable hash (constants shared with the MinHash family,
dedup.py:79-81). Point estimate = min over rows — always >= true count.

Reference parity: the reference has no sketches (SURVEY §2 U3: no UDAF) —
this is part of the large-scale extension surface, where exact
countDistinct over 100 TB would shuffle every value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import fast_hash60, portable_hash64, portable_hash64_sql
from .dedup import MINHASH_A_STEP, MINHASH_B_STEP, MINHASH_P

HLL_M = 256
HLL_RHO_CAP = 53  # 60-bit hash - 8 bucket bits = 52 rest bits; rest==0 -> 53
# alpha_m * m^2 * 2^53 precomputed in IEEE double; repr() round-trips, so the
# same literal parses to the same double in Spark and DuckDB.
HLL_EST_NUMERATOR = repr(
    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 9007199254740992.0
)

CMS_D = 4
CMS_W = 1024


def hll_buckets(
    df: DataFrame, value: Column, group_cols: list[str], m: int = HLL_M
) -> DataFrame:
    """Per-group HLL register state: (group..., _bucket, _max_rho).

    This is the mergeable sketch — at most ``m`` rows per group survive the
    (map-side-combined) aggregate regardless of input size, which is the
    whole scale story: a 100 TB scan reduces to KBs of state per group.
    """
    prepared = (
        df.withColumn("_h", portable_hash64(value))
        .withColumn("_bucket", F.expr(f"_h % {m}"))
        .withColumn("_rest", F.expr(f"_h div {m}"))
        .withColumn(
            "_rho",
            F.expr(
                f"CASE WHEN _rest = 0 THEN {HLL_RHO_CAP} "
                "ELSE 1 + CAST(log2(_rest & (-_rest)) AS INT) END"
            ),
        )
    )
    return prepared.groupBy(*group_cols, "_bucket").agg(
        F.max("_rho").alias("_max_rho")
    )


def hll_estimate(
    bucketed: DataFrame, group_cols: list[str], m: int = HLL_M
) -> DataFrame:
    """Fold register state into the raw HLL estimate (column ``hll_est``).

    The harmonic sum is kept integer-exact (see module docstring) so the
    one double division is bit-reproducible across engines.
    """
    return (
        bucketed.groupBy(*group_cols)
        .agg(
            F.expr("SUM(shiftleft(1L, 53 - _max_rho))").alias("_num_hit"),
            F.count(F.lit(1)).alias("_hit"),
        )
        .select(
            *group_cols,
            F.expr(
                f"CAST({HLL_EST_NUMERATOR} AS DOUBLE) / "
                f"CAST(_num_hit + ({m} - _hit) * shiftleft(1L, 53) AS DOUBLE)"
            ).alias("hll_est"),
        )
    )


def hll_rho_sql(hash_expr: str, m: int = HLL_M) -> str:
    """DuckDB SQL for (bucket, rho) of a prehashed 60-bit int expression."""
    rest = f"({hash_expr} // {m})"
    return (
        f"{hash_expr} % {m} AS _bucket, "
        f"CASE WHEN {rest} = 0 THEN {HLL_RHO_CAP} "
        f"ELSE 1 + CAST(log2({rest} & (-{rest})) AS INT) END AS _rho"
    )


def hll_estimate_sql(m: int = HLL_M) -> str:
    """DuckDB SQL folding grouped (_bucket, max _rho AS _max_rho) registers —
    identical arithmetic to :func:`hll_estimate`."""
    return (
        f"CAST({HLL_EST_NUMERATOR} AS DOUBLE) / "
        f"CAST(SUM(1::BIGINT << (53 - _max_rho)) + "
        f"({m} - COUNT(*)) * (1::BIGINT << 53) AS DOUBLE)"
    )


def cms_col_sql(row: str, base: str, w: int = CMS_W) -> str:
    """Column index of hash ``base`` in CMS row ``row`` — same universal
    family as MinHash (identical text valid in Spark SQL and DuckDB)."""
    return (
        f"(((1 + {row} * {MINHASH_A_STEP}) * {base} + 7 + {row} * {MINHASH_B_STEP})"
        f" % {MINHASH_P}) % {w}"
    )


def cms_table(
    df: DataFrame, term: Column, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Build the count-min grid: (cms_row, cms_col, cms_count).

    d×w bounded state (16 K cells) no matter the input size; the explode is
    by ``d`` (constant), and the single aggregate map-side-combines, so the
    shuffle carries at most d×w rows per upstream partition.
    """
    base = F.pmod(portable_hash64(term), F.lit(MINHASH_P))
    return (
        df.select(base.alias("_hb"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("cms_row"), "_hb"
        )
        .withColumn("cms_col", F.expr(cms_col_sql("cms_row", "_hb", w)))
        .groupBy("cms_row", "cms_col")
        .agg(F.count(F.lit(1)).alias("cms_count"))
    )


def cms_lookup(
    sketch: DataFrame, terms: DataFrame, term_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Point-estimate each term: min over the d cells it hashes to.

    ``terms`` is small (a query/monitoring set) — the join broadcasts it
    against the bounded sketch; never touches the raw data again.
    """
    probes = (
        terms.withColumn(
            "_hb", F.pmod(portable_hash64(F.col(term_col)), F.lit(MINHASH_P))
        )
        .select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("cms_row")
        )
        .withColumn("cms_col", F.expr(cms_col_sql("cms_row", "_hb", w)))
        .drop("_hb")
    )
    return (
        probes.join(sketch, ["cms_row", "cms_col"])
        .groupBy(*[c for c in terms.columns])
        .agg(F.min("cms_count").alias("cms_est"))
    )


BLOOM_M_BITS = 65_536
BLOOM_K = 4


def bloom_build(
    keys: DataFrame, key: Column, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> list[int]:
    """Build a Bloom-filter bitset from a key column; returns the dense
    word array (``m_bits / 64`` longs — 8 KB at the default size).

    The build is fully distributed: per key, k positions from the same
    universal family over the codegen'd ``fast_hash60`` (the bitset is
    result-invisible — false positives only prune less — so the expensive
    cross-engine-portable hash buys nothing here); positions fold into (word, mask) cells and a single
    ``bit_or`` aggregate (map-side combined) produces at most 1024 rows.
    Only that bounded bitset is collected — same contract as the broadcast
    config table (apps.py): driver state is O(m_bits), never O(keys).

    Why not Spark's runtime bloom (spark.sql.optimizer.runtime.bloomFilter)?
    It only injects into equi-joins it can see through; this one is an
    explicit, reusable bitset you can apply to ANY fact scan — including
    streaming micro-batches and pre-shuffle pruning the optimizer can't
    prove — and it's deterministic/portable for the oracle story.
    """
    base = F.pmod(fast_hash60(key), F.lit(MINHASH_P))
    cells = (
        keys.select(base.alias("_hb"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_s"), "_hb"
        )
        .withColumn("_pos", F.expr(cms_col_sql("_s", "_hb", m_bits)))
        .select(
            F.expr("_pos div 64").alias("_word"),
            F.expr("shiftleft(1L, CAST(_pos % 64 AS INT))").alias("_mask"),
        )
        .groupBy("_word")
        .agg(F.expr("bit_or(_mask)").alias("_bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for row in cells:
        words[row["_word"]] = row["_bits"]
    return words


def bloom_prune(
    df: DataFrame,
    key: Column,
    words: list[int],
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Drop rows whose key is definitely not in the bloomed set.

    The bitset rides into every task as an array literal (one 8 KB
    broadcast-equivalent), so the probe is a pure projection-time
    expression — zero joins, zero shuffles, applied at the scan. False
    positives pass through (pruning less, never changing results); the
    exact join downstream stays correct. This is the 100 TB pre-shuffle
    guard: prune the fact table to ~matching rows BEFORE paying the
    Exchange.
    """
    arr = F.array(*[F.lit(w) for w in words])
    probed = df.withColumn(
        "_bh", F.pmod(fast_hash60(key), F.lit(MINHASH_P))
    ).withColumn("_bloom_arr", arr)
    cond = None
    for s in range(k):
        pos = f"(({cms_col_sql(str(s), '_bh', m_bits)}))"
        hit = F.expr(
            f"(element_at(_bloom_arr, CAST({pos} div 64 AS INT) + 1) & "
            f"shiftleft(1L, CAST({pos} % 64 AS INT))) != 0"
        )
        cond = hit if cond is None else (cond & hit)
    return probed.filter(cond).drop("_bh", "_bloom_arr")


__all__ = [
    "BLOOM_M_BITS",
    "BLOOM_K",
    "bloom_build",
    "bloom_prune",
    "HLL_M",
    "HLL_RHO_CAP",
    "HLL_EST_NUMERATOR",
    "CMS_D",
    "CMS_W",
    "hll_buckets",
    "hll_estimate",
    "hll_rho_sql",
    "hll_estimate_sql",
    "cms_col_sql",
    "cms_table",
    "cms_lookup",
]
