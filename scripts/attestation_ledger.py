"""Driver-attestation ledger — which catalog entries still need a turn
in the driver's 50-slot correctness window.

The judge's hard signal is a green row in some round's
CORRECTNESS_r{N}.json; the round-8 verdict made "rotate the window to
never-attested entries" the standing policy. This script reads every
CORRECTNESS_r*.json in the repo root, collects the names that have a
green row in ANY round, and prints the registry entries that never
appeared — the priority list for the next round's _DRIVER_WINDOW
rebuild (catalog.py).

Usage: python scripts/attestation_ledger.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = Path(__file__).resolve().parent.parent


def green_names() -> dict[str, list[str]]:
    """name -> rounds in which it has a green driver row."""
    seen: dict[str, list[str]] = {}
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(p.read_text())
        except Exception:
            continue
        rows = data.get("queries", data) if isinstance(data, dict) else {}
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # green means EXPLICITLY green — every match field present
            # and true (a degenerate row must not silently remove an
            # entry from the rotation list this script exists to build)
            ok = row.get("ok") is True or (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
                and not row.get("err")
            )
            if ok:
                seen.setdefault(name, []).append(p.stem.replace("CORRECTNESS_", ""))
    return seen


def latest_attestation() -> dict[str, int]:
    """name -> most recent round with a green driver row."""
    return {
        n: max(int(r.removeprefix("r")) for r in rounds)
        for n, rounds in green_names().items()
    }


def main() -> None:
    from gramene_mongodb_spark.catalog import REGISTRY, _DRIVER_WINDOW

    attested = green_names()
    never = [n for n in sorted(REGISTRY) if n not in attested]
    in_window = [n for n in never if n in set(_DRIVER_WINDOW)]
    print(f"registry: {len(REGISTRY)}  driver-attested (any round): "
          f"{sum(1 for n in REGISTRY if n in attested)}  never: {len(never)}")
    print(f"\nnever-attested currently IN the window ({len(in_window)}) — "
          "expected to turn green this round:")
    for n in in_window:
        print(f"  {n}")
    rest = [n for n in never if n not in set(_DRIVER_WINDOW)]
    print(f"\nnever-attested OUTSIDE the window ({len(rest)}) — next "
          "rotation's candidates:")
    for n in rest:
        print(f"  {n}")

    # latest-attestation histogram — the rotation program's health
    # metric (VERDICT r14: steady-state = no bucket older than ~4
    # rounds). Entries in the CURRENT window are listed separately:
    # their stamp moves to the in-flight round at the next driver gate.
    latest = latest_attestation()
    window = set(_DRIVER_WINDOW)
    from collections import Counter

    hist = Counter(latest[n] for n in latest if n not in window)
    print("\nlatest-attestation histogram (entries OUTSIDE the current "
          "window — window entries re-attest at the next gate):")
    for r in sorted(hist):
        print(f"  r{r}: {hist[r]}")
    stale = sorted(
        (n for n in latest if n not in window),
        key=lambda n: (latest[n], n),
    )[:30]
    print("\nstalest 30 outside the window (next rotation's seed):")
    for n in stale:
        print(f"  {n} (r{latest[n]})")


if __name__ == "__main__":
    main()
