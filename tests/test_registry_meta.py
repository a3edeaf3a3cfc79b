"""Registry/bench/probe wiring invariants — static (no SparkSession):
every name the bench and scale probe reference must exist in the registry,
and every registry query must carry an oracle (the repo's correctness
contract: rows-only checks are reserved for genuinely non-SQL ops, of
which there are currently none)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _registry():
    from gmall_flink_230422_spark.plans import registry

    return registry()


def test_bench_headline_names_exist():
    import bench

    reg = _registry()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headliners"


def test_bench_canary_names_pinned():
    """The canary set is the cross-round session-speed anchor (r9 verdict
    item 2): members must exist in the registry AND in HEADLINE, and the
    set must not silently change (that would break anchor comparability —
    BENCHNOTES r10/r11 methodology). r11 added three pinned MID-WEIGHT
    canaries (r10 verdict item 3: sub-0.5 s canaries under-corrected
    heavy-tail session pressure); the light-10 subtotal is still emitted
    as the r10 anchor bridge."""
    import bench

    reg = _registry()
    assert [n for n in bench.CANARY_ALL if n not in reg] == []
    assert [n for n in bench.CANARY_ALL if n not in bench.HEADLINE] == []
    assert bench.CANARY == [
        "q1_pricing_summary",
        "q6_forecast_revenue",
        "a1_tumble_keyed",
        "t3_daily_uv",
        "u1_keyword_count",
        "x_cosine_topk",
        "e_hll_distinct",
        "x_vocab_topk",
        "e_gini",
        "e_theil",
    ], "canary membership changed — document in BENCHNOTES and update this pin"
    assert bench.CANARY_MID == [
        "x_curate_corpus",
        "x_pq_ann",
        "x_contam_13gram",
    ], "mid-weight canary membership changed — document in BENCHNOTES and update this pin"
    assert bench.CANARY_ALL == bench.CANARY + bench.CANARY_MID


def test_scale_probe_names_exist():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import scale_probe

    reg = _registry()
    missing = [n for n in scale_probe.QUERIES if n not in reg]
    assert not missing, missing
    missing_sf1 = [n for n in scale_probe.HEAVY_SF1 if n not in reg]
    assert not missing_sf1, missing_sf1


def test_every_query_has_oracle():
    reg = _registry()
    no_oracle = [n for n, s in reg.items() if s.oracle is None]
    assert not no_oracle, no_oracle


def test_registry_superset_of_r5_names():
    """The driver samples the same 50 names round over round; name removal
    would silently drop its evidence base (r5 verdict item 5)."""
    reg = set(_registry())
    r5 = json.load(open(Path(__file__).resolve().parent.parent / "CORRECTNESS_r05.json"))
    missing = sorted(set(r5) - reg)
    assert not missing, missing


def test_registry_superset_of_r6_names():
    """r6 shipped 287 queries, all green in the committed full-registry
    sweep (CORRECTNESS_local_r06.json); the registry must stay an exact
    superset so no later round silently drops an evidenced query (r6
    verdict item 5 extends the r5 pin to the full name list)."""
    reg = set(_registry())
    r6 = json.load(
        open(Path(__file__).resolve().parent.parent / "CORRECTNESS_local_r06.json")
    )
    assert len(r6) >= 287
    missing = sorted(set(r6) - reg)
    assert not missing, missing


def test_registry_superset_of_r7_names():
    """r7 shipped 312 queries, all green at all four committed sweep tiers
    (CORRECTNESS_local_r07{,_sf0001,_sf01,_vanilla}.json); the registry
    must stay an exact superset so no later round silently drops an
    evidenced query (r7 verdict item 5 extends the pin streak)."""
    reg = set(_registry())
    r7 = json.load(
        open(Path(__file__).resolve().parent.parent / "CORRECTNESS_local_r07.json")
    )
    assert len(r7) >= 312
    missing = sorted(set(r7) - reg)
    assert not missing, missing


def test_registry_superset_of_r8_names():
    """r8 shipped 349 queries, all green in the committed full-registry
    sweeps (CORRECTNESS_local_r08*.json); keep the exact-superset streak."""
    reg = set(_registry())
    r8 = json.load(
        open(Path(__file__).resolve().parent.parent / "CORRECTNESS_local_r08.json")
    )
    assert len(r8) >= 349
    missing = sorted(set(r8) - reg)
    assert not missing, missing


def test_registry_superset_of_r9_names():
    """r9 shipped 373 queries (r8's 349 + 24), all green in the committed
    full-registry sweeps (CORRECTNESS_local_r09*.json); keep the
    exact-superset streak. (r9 verdict item 8: the pin previously said 369
    because the last 4 queries landed after the pin was written — the
    committed sweep file has 373 entries, so pin the real number.)"""
    reg = set(_registry())
    r9 = json.load(
        open(Path(__file__).resolve().parent.parent / "CORRECTNESS_local_r09.json")
    )
    assert len(r9) >= 373
    missing = sorted(set(r9) - reg)
    assert not missing, missing


def test_registry_superset_of_r10_names():
    """r10 shipped 377 queries (r9's 373 + the 4 persisted-index ANN
    queries), all green across four committed sweep tiers
    (CORRECTNESS_local_r10*.json); keep the exact-superset streak."""
    reg = set(_registry())
    r10 = json.load(
        open(Path(__file__).resolve().parent.parent / "CORRECTNESS_local_r10.json")
    )
    assert len(r10) >= 377
    missing = sorted(set(r10) - reg)
    assert not missing, missing


def test_make_evidence_name_set_gate():
    """r9 verdict item 1: tools/make_evidence.py must FAIL when any
    committed sweep's name set differs from the live registry's — this
    is the mechanism that prevents the r7/r8/r9 'evidence covers N-4
    queries' split-brain. Prove the gate trips on a synthetic mismatch
    and passes on a faithful copy."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from make_evidence import check_name_sets

    reg_names = set(_registry())
    ok, msgs = check_name_sets({"fake_sweep.json": reg_names}, reg_names)
    assert ok, msgs
    ok, msgs = check_name_sets(
        {"fake_sweep.json": reg_names - {sorted(reg_names)[0]}}, reg_names
    )
    assert not ok
    assert "fake_sweep.json" in " ".join(msgs)
    ok, msgs = check_name_sets(
        {"fake_sweep.json": reg_names | {"zz_not_in_registry"}}, reg_names
    )
    assert not ok
