#!/usr/bin/env python
"""Artifact hygiene check — run at ROUND START and before round close.

Round 7 lesson: BENCH_r07.json was unparseable ("parsed": null — the
single-line JSON outgrew the driver's tail capture) and nobody noticed
until judging. This check makes a broken driver artifact fail loudly
inside the round:

* the latest ``BENCH_r{N}.json`` must carry a recoverable headline —
  either the driver parsed it (``parsed`` non-null) or the tail's last
  line is itself valid JSON with a non-null ``value``;
* the latest ``CORRECTNESS_r{N}.json`` must have zero ``err`` rows and
  every row green (rows/schema/hash match);
* ``TIMING_AUDIT.json`` (VERDICT r9 #8) must exist, parse, cover the
  live registry (within the skip list + a small error allowance), and
  carry no single-entry outlier over the plan-collapse threshold —
  the machine-checkable form of the round-9 long-tail audit.

Exit 0 = clean; exit 1 = findings printed to stdout. Known-bad rounds
already adjudicated by a judge can be waived with ``--waive N``
(e.g. round 7's two findings are in VERDICT.md; waiving keeps the
check useful for the CURRENT round without rewriting history).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def latest(pattern: str) -> tuple[int, Path] | None:
    best: tuple[int, Path] | None = None
    for p in ROOT.glob(pattern):
        m = re.search(r"_r(\d+)\.json$", p.name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    return best


def check_bench(n: int, path: Path) -> list[str]:
    doc = json.loads(path.read_text())
    if doc.get("parsed") is not None:
        return []
    # recoverable? the tail's last line should be bench.py's compact JSON
    tail = doc.get("tail") or ""
    for line in reversed([ln for ln in tail.splitlines() if ln.strip()]):
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if obj.get("value") is not None:
            return []
        return [f"{path.name}: parsed null and tail JSON has null value ({obj})"]
    return [f"{path.name}: parsed is null and no JSON line survives in tail"]


def check_correctness(n: int, path: Path) -> list[str]:
    doc = json.loads(path.read_text())
    bad = []
    for name, row in doc.items():
        if not isinstance(row, dict):
            continue
        if row.get("err"):
            excerpt = " / ".join(str(row["err"]).splitlines())[:120]
            bad.append(f"{path.name}: {name} err: {excerpt}")
        elif not (
            row.get("rows_match")
            and row.get("schema_match", True)
            and row.get("hash_match", True)
        ):
            bad.append(f"{path.name}: {name} red (rows/schema/hash mismatch)")
    return bad


TIMING_FLAG_S = 6.0  # round-9 collapse fixes landed at 2.2s; 6s at
# sf0.1 local[32] is the "a narrow chain fell to one task" smell line

#: measured-heavy entries (SCALE.md twelfth probe: post-fix, same-boot
#: min-of-3 — NOT collapses; the heavy pass is the algorithm itself).
#: Each carries its own regression ceiling ≈ 1.5x the r9 measurement,
#: wide enough for the documented ±25% between-boot ambient shift.
TIMING_CEILINGS_S = {
    "x_incremental_dedup": 12.0,  # r9: 7.9s (two-sided shingle verify)
    "x_lsh_recall_eval": 10.0,    # r9: 6.7s (exact top-k baseline arm)
    "pipeline_obo_ontology": 9.0,  # r14: 3.2s quiet / 7.1s in-audit at
    # ambient load ~3, isolated min-of-6 5.06s (BENCH_NOTES r14) — the
    # driver-side OBO stanza parse is the most load-sensitive shape;
    # adjudicated epoch, not a plan change
}


def check_timing(path: Path) -> list[str]:
    if not path.exists():
        return [f"{path.name}: missing — run scripts/timing_audit.py"]
    try:
        doc = json.loads(path.read_text())
    except ValueError as e:
        return [f"{path.name}: unparseable ({e})"]
    entries = doc.get("entries") or {}
    reg = doc.get("registry_size") or 0
    covered = len(entries) + len(doc.get("skipped") or [])
    bad = []
    if reg and covered < reg - 3:  # small allowance for transient errs
        bad.append(
            f"{path.name}: covers {covered}/{reg} registry entries — stale "
            "or too many ERR rows; rerun scripts/timing_audit.py"
        )
    for name, t in sorted(entries.items(), key=lambda kv: -kv[1]):
        limit = TIMING_CEILINGS_S.get(name, TIMING_FLAG_S)
        if t > limit:
            bad.append(
                f"{path.name}: {name} min-wall {t:.1f}s > {limit}s "
                "— possible plan collapse or regression "
                "(see SCALE.md twelfth probe)"
            )
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--waive",
        type=int,
        action="append",
        default=[],
        help="round number whose known-bad artifacts a judge already adjudicated",
    )
    args = ap.parse_args()

    findings: list[str] = []
    for pattern, checker in (
        ("BENCH_r*.json", check_bench),
        ("CORRECTNESS_r*.json", check_correctness),
    ):
        hit = latest(pattern)
        if hit is None:
            findings.append(f"no {pattern} artifact found")
            continue
        n, path = hit
        if n in args.waive:
            print(f"waived: {path.name} (round {n} adjudicated)")
            continue
        findings.extend(checker(n, path))

    findings.extend(check_timing(ROOT / "TIMING_AUDIT.json"))

    if findings:
        print("ARTIFACT HYGIENE FINDINGS:")
        for f in findings:
            print(f"  - {f}")
        return 1
    print("artifacts clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
