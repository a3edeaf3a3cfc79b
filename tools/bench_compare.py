"""Drift-corrected cross-round bench comparison (r9 verdict item 2).

    python tools/bench_compare.py OLD.json NEW.json [--min OLD2.json ...]

Reads two BENCH_local-shaped artifacts and prints:
- common-set warm sums and the RAW ratio new/old,
- per-query ratio quartiles (uniform shift across untouched queries is
  the session-drift signature),
- the canary anchors when both artifacts carry them (bench.py writes
  `canary.anchor_s` since r10) and the CORRECTED ratio
  raw_ratio / (anchor_new / anchor_old),
- with ``--min``, extra artifacts per side are folded in by per-query
  MIN before comparing (the interleaved-sessions protocol).

Everything here is arithmetic over committed artifacts — any judge can
re-run it; nothing is measured.
"""

from __future__ import annotations

import argparse
import json


def _load_min(paths: list[str]) -> dict:
    """Fold multiple runs into one artifact by per-query MIN (warm).

    Anchor-aware (r10 review finding): independently min-folding queries
    and the anchor can pair a slow-session measurement with a fast-session
    anchor, corrupting corrected_ratio. When EVERY run carries an anchor,
    each run's times are first drift-normalized to the fastest session's
    speed (q * anchor_min / anchor_run) and the fold's anchor is
    anchor_min — every folded number then shares one session basis.
    Anchor-less runs (pre-r10 artifacts) fold by plain min, and the fold
    carries no anchor (corrected_ratio stays null, visibly)."""
    arts = [json.load(open(p)) for p in paths]
    anchors = [a.get("canary", {}).get("anchor_s") for a in arts]
    out = dict(arts[0])
    if all(a is not None for a in anchors):
        a_min = min(anchors)
        q: dict[str, float] = {}
        for art, a_run in zip(arts, anchors):
            scale = a_min / a_run
            for k, v in art["queries"].items():
                nv = v * scale
                q[k] = min(q.get(k, nv), nv)
        out["queries"] = q
        out["canary"] = dict(out.get("canary", {}), anchor_s=a_min)
    else:
        q = dict(arts[0]["queries"])
        for a in arts[1:]:
            for k, v in a["queries"].items():
                q[k] = min(q.get(k, v), v)
        out["queries"] = q
        out.pop("canary", None)
    return out


def compare(old: dict, new: dict) -> dict:
    common = sorted(set(old["queries"]) & set(new["queries"]))
    s_old = sum(old["queries"][n] for n in common)
    s_new = sum(new["queries"][n] for n in common)
    raw = s_new / s_old if s_old else float("nan")
    ratios = sorted(
        new["queries"][n] / old["queries"][n]
        for n in common
        if old["queries"][n] > 0
    )
    q = lambda p: ratios[int(p * (len(ratios) - 1))] if ratios else None
    a_old = old.get("canary", {}).get("anchor_s")
    a_new = new.get("canary", {}).get("anchor_s")
    corrected = raw / (a_new / a_old) if (a_old and a_new) else None
    return {
        "n_common": len(common),
        "common_sum_old_s": round(s_old, 3),
        "common_sum_new_s": round(s_new, 3),
        "raw_ratio": round(raw, 3),
        "per_query_ratio_p25": round(q(0.25), 3) if ratios else None,
        "per_query_ratio_median": round(q(0.5), 3) if ratios else None,
        "per_query_ratio_p75": round(q(0.75), 3) if ratios else None,
        "anchor_old_s": a_old,
        "anchor_new_s": a_new,
        "anchor_ratio": round(a_new / a_old, 3) if (a_old and a_new) else None,
        "corrected_ratio": round(corrected, 3) if corrected else None,
        "note": "corrected_ratio = raw_ratio / anchor_ratio; anchors are "
        "bench.py's canary medians (absent before r10 — corrected_ratio "
        "null means at least one side predates the protocol)",
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--old-min", nargs="*", default=[], help="extra OLD-side runs folded by per-query MIN")
    ap.add_argument("--new-min", nargs="*", default=[], help="extra NEW-side runs folded by per-query MIN")
    a = ap.parse_args()
    old = _load_min([a.old] + a.old_min)
    new = _load_min([a.new] + a.new_min)
    print(json.dumps(compare(old, new), indent=1))


if __name__ == "__main__":
    main()
