"""tools/bench_compare.py arithmetic — the drift-corrected cross-round
protocol must be mechanically recomputable (r9 verdict item 2)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from bench_compare import _load_min, compare


def _art(queries, anchor=None):
    a = {"queries": queries}
    if anchor is not None:
        a["canary"] = {"anchor_s": anchor}
    return a


def test_corrected_ratio_cancels_uniform_drift():
    old = _art({"a": 1.0, "b": 2.0, "x_only_old": 9.0}, anchor=1.0)
    # new session uniformly 1.5x slower, code unchanged
    new = _art({"a": 1.5, "b": 3.0, "x_only_new": 7.0}, anchor=1.5)
    r = compare(old, new)
    assert r["n_common"] == 2
    assert r["raw_ratio"] == 1.5
    assert r["anchor_ratio"] == 1.5
    assert r["corrected_ratio"] == 1.0
    assert r["per_query_ratio_median"] == 1.5


def test_corrected_null_without_anchor():
    r = compare(_art({"a": 1.0}), _art({"a": 2.0}, anchor=1.0))
    assert r["raw_ratio"] == 2.0
    assert r["corrected_ratio"] is None


def test_min_fold_anchor_normalized(tmp_path):
    """r10 review: folding must not pair a slow-session time with a
    fast-session anchor — runs are rescaled to the fastest session before
    the min."""
    p1 = tmp_path / "r1.json"
    p2 = tmp_path / "r2.json"
    json.dump(_art({"a": 2.0, "b": 1.0}, anchor=2.0), open(p1, "w"))
    json.dump(_art({"a": 1.0, "b": 3.0}, anchor=1.5), open(p2, "w"))
    folded = _load_min([str(p1), str(p2)])
    # run1 rescaled by 1.5/2.0=0.75 -> a:1.5 b:0.75; run2 kept -> a:1.0 b:3.0
    assert folded["queries"] == {"a": 1.0, "b": 0.75}
    assert folded["canary"]["anchor_s"] == 1.5


def test_min_fold_plain_without_anchors(tmp_path):
    p1 = tmp_path / "r1.json"
    p2 = tmp_path / "r2.json"
    json.dump(_art({"a": 2.0, "b": 1.0}), open(p1, "w"))
    json.dump(_art({"a": 1.0, "b": 3.0}, anchor=1.5), open(p2, "w"))
    folded = _load_min([str(p1), str(p2)])
    assert folded["queries"] == {"a": 1.0, "b": 1.0}
    assert "canary" not in folded  # mixed-anchor fold must not claim one
