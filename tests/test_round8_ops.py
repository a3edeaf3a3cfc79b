"""Round-8 fixes and operators: regression tests for the r7 advisor
findings (random_projection length-mismatch NULLs, mmr_rerank generic-id /
NULL-similarity kernel, memo eviction) plus hand-sized semantic checks for
the new r8 operators."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from gmall_flink_230422_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def test_random_projection_dim_mismatch_overlap(spark):
    """r7 advisor (medium): a vector shorter or longer than the sign-matrix
    dim must project over the OVERLAP (the legacy join-on-j partial sums),
    never silently NULL via zip_with null-padding."""
    packed = sim.packed_projection_dirs(spark, n_dirs=2, dim=4)
    # the packed frame is 1 row: [{r, sv: [s0..s3]}, ...] — read the signs
    dirs = packed.collect()[0]["_dirs"]
    signs = {d["r"]: list(d["sv"]) for d in dirs}
    corpus = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 2.0]),              # shorter than dim
            Row(vec_id=2, embedding=[1.0, 1.0, 1.0, 1.0]),    # exact
            Row(vec_id=3, embedding=[1.0, 0.0, 0.0, 0.0, 5.0]),  # longer
        ]
    )
    out = {
        (r["vec_id"], r["r"]): r["proj_milli"]
        for r in sim.random_projection(corpus, packed=packed).collect()
    }
    assert len(out) == 6 and None not in out.values()
    for r in (0, 1):
        sv = signs[r]
        assert out[(1, r)] == sv[0] * 1000 + sv[1] * 2000
        assert out[(2, r)] == sum(s * 1000 for s in sv)
        assert out[(3, r)] == sv[0] * 1000  # dims 4.. ignored (overlap)


def test_mmr_rerank_string_ids(spark):
    """r7 advisor (low): id_col is generic — string ids must survive the
    grouped-map kernel (the former int() coercion raised ValueError)."""
    rows = [
        Row(vec_id=f"d{i}", embedding=[float(i % 3 + 1), float((i * 7) % 5 + 1)])
        for i in range(8)
    ]
    corpus = spark.createDataFrame(rows)
    query = spark.createDataFrame(rows[:1])
    out = sim.mmr_rerank(corpus, query, k_candidates=4, k_select=3).collect()
    assert len(out) == 3
    assert {type(r["vec_id"]) for r in out} == {str}
    assert [r["sel_rank"] for r in sorted(out, key=lambda r: r["sel_rank"])] == [1, 2, 3]


def test_mmr_rerank_null_rel_excluded(spark):
    """A zero-norm candidate (cosine → NULL rel) must be skipped by the
    kernel — the pure-DataFrame loop propagated NULLs so NULL never won a
    comparison; the kernel must not crash and must not select it."""
    corpus = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.9, 0.1]),
            Row(vec_id=3, embedding=[0.0, 0.0]),  # zero norm → NULL rel/sim
            Row(vec_id=4, embedding=[0.5, 0.5]),
        ]
    )
    query = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 0.0])])
    out = sim.mmr_rerank(corpus, query, k_candidates=4, k_select=4).collect()
    picked = {r["vec_id"] for r in out}
    assert 3 not in picked
    assert picked == {2, 4}


def test_memo_evicts_stale_app_ids():
    """r7 advisor (low): memo entries from stopped SparkContexts are
    evicted on insert, not pinned for the process lifetime."""
    from gmall_flink_230422_spark.plans.llm import _evict_stale

    memo = {("app-old", "sf"): "dead", ("app-new", "sf"): "live"}
    _evict_stale(memo, "app-new")
    assert memo == {("app-new", "sf"): "live"}
