"""One-command evidence regeneration (r8 verdict item 8): run every
per-round evidence stage SEQUENTIALLY in the canonical order and refuse
to finish while any evidence artifact sits untracked in git.

    python tools/make_evidence.py --round 9            # full pipeline
    python tools/make_evidence.py --round 9 --skip-scaling --skip-bench

Stages (each a fresh subprocess so every stage imports the registry at
its own process start — interleaving registry edits with a running
pipeline yields artifacts disagreeing on the query count; see
.claude/skills/verify/SKILL.md):

1. oracle sweeps: sf0.01 (driver parity tier), sf0.001, sf0.1, and the
   bare-vanilla-session tier → CORRECTNESS_local_r{N}{,_sf0001,_sf01,
   _vanilla}.json
2. plan audit → PLANS.md (full registry; exits the pipeline on
   invariant violations)
3. scale probe → SCALING.md
4. bench → BENCH_local_latest.json

The final gate re-runs `git status --porcelain` over the evidence
globs: any untracked/modified artifact fails the run with the file list
— turning the r7/r8 "evidence never committed" slip from discipline
into mechanism. The gate INTENTIONALLY does not `git add` for you: the
builder should review the diff, but cannot silently skip it.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

EVIDENCE_GLOBS = [
    "CORRECTNESS_local_*.json",
    "BENCH_local_*.json",
    "BENCH_r*.json",
    "CORRECTNESS_r*.json",
    "PLANS.md",
    "SCALING.md",
    "SCALING_SF1.md",
    "BENCHNOTES.md",
]


def check_name_sets(
    sweeps: dict[str, set[str]], registry_names: set[str]
) -> tuple[bool, list[str]]:
    """r9 verdict item 1: every sweep must cover EXACTLY the live registry —
    this round two committed sweeps were at 373 names and two at 369 and
    the old untracked-file gate never noticed. Pure function so the gate
    itself is unit-testable (tests/test_registry_meta.py)."""
    msgs: list[str] = []
    for fname, names in sorted(sweeps.items()):
        missing = sorted(registry_names - names)
        extra = sorted(names - registry_names)
        if missing:
            msgs.append(f"{fname}: registry queries absent from sweep: {missing[:8]}"
                        f"{' …' if len(missing) > 8 else ''} ({len(missing)} total)")
        if extra:
            msgs.append(f"{fname}: sweep names not in registry: {extra[:8]}"
                        f"{' …' if len(extra) > 8 else ''} ({len(extra)} total)")
    return (not msgs, msgs)


def run(label: str, cmd: list[str]) -> None:
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        print(f"FAILED at stage: {label} (exit {r.returncode})", file=sys.stderr)
        sys.exit(r.returncode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True, help="round number N for CORRECTNESS_local_r{N}* names")
    ap.add_argument("--skip-sweeps", action="store_true")
    ap.add_argument("--skip-plans", action="store_true")
    ap.add_argument("--skip-scaling", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    a = ap.parse_args()
    py = sys.executable
    rn = f"r{a.round:02d}"

    if not a.skip_sweeps:
        run("sweep sf0.01", [py, "tools/check_oracle.py", "--json", f"CORRECTNESS_local_{rn}.json"])
        run("sweep sf0.001", [py, "tools/check_oracle.py", "--sf", "/root/testdata/sf0.001",
                              "--json", f"CORRECTNESS_local_{rn}_sf0001.json"])
        run("sweep sf0.1", [py, "tools/check_oracle.py", "--sf", "/root/testdata/sf0.1",
                            "--json", f"CORRECTNESS_local_{rn}_sf01.json"])
        run("sweep vanilla", [py, "tools/check_oracle.py", "--vanilla",
                              "--json", f"CORRECTNESS_local_{rn}_vanilla.json"])
    # ---- the sweep-vs-registry name-set gate (r9 verdict item 1), run
    # IMMEDIATELY after the sweep stage (r10 review: placing it after the
    # ~30-min audit/probe/bench stages meant a --skip-sweeps resume with
    # stale sweeps burned the whole pipeline before the free check fired)
    import json as _json

    sys.path.insert(0, str(REPO))
    from gmall_flink_230422_spark.plans import registry as _registry

    reg_names = set(_registry())
    sweeps: dict[str, set[str]] = {}
    for suffix in ("", "_sf0001", "_sf01", "_vanilla"):
        p = REPO / f"CORRECTNESS_local_{rn}{suffix}.json"
        if p.exists():
            sweeps[p.name] = set(_json.load(open(p)))
        else:
            print(f"NAME-SET GATE: missing sweep file {p.name}", file=sys.stderr)
            sys.exit(1)
    ok, msgs = check_name_sets(sweeps, reg_names)
    if not ok:
        print("\nNAME-SET GATE: sweep name sets disagree with the live registry "
              f"({len(reg_names)} queries) — re-run the sweeps:", file=sys.stderr)
        for m in msgs:
            print("  " + m, file=sys.stderr)
        sys.exit(1)
    print(f"name-set gate: all {len(sweeps)} sweeps cover exactly the "
          f"{len(reg_names)}-query registry")

    if not a.skip_plans:
        run("plan audit", [py, "tools/audit_plans.py", "--check"])
    if not a.skip_scaling:
        run("scale probe", [py, "tools/scale_probe.py"])
    if not a.skip_bench:
        run("bench", [py, "bench.py"])

    # ---- the untracked-evidence gate
    status = subprocess.run(
        ["git", "status", "--porcelain", "--"] + EVIDENCE_GLOBS,
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    if status:
        print("\nEVIDENCE GATE: uncommitted evidence artifacts — commit them before the round closes:")
        print(status)
        sys.exit(1)
    print("\nevidence pipeline complete; all artifacts tracked and clean")


if __name__ == "__main__":
    main()
