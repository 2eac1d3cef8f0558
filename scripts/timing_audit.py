"""Per-entry timing audit — the long-tail complement to bench.py.

bench.py times the curated headline; entries OUTSIDE it had never been
timed until round 9, which is how six plan-collapse bugs (single-task
execution of compute-heavy narrow chains — see SCALE.md twelfth probe)
hid behind green correctness gates. This audits EVERY catalog entry at
a given SF with min-of-N timing into a noop sink and prints the
slowest, so a collapsed plan shows up as an outlier long before a
cluster bill does.

Usage: python scripts/timing_audit.py [sf_dir] [min_seconds] [runs]
Defaults: /root/testdata/sf0.1, flag > 2.5s, 3 runs (min taken).

Emits ``TIMING_AUDIT.json`` at the repo root (VERDICT r9 #8): the full
per-entry min-of-N table plus run metadata, so the long-tail
plan-collapse class stays machine-checkable round over round instead of
living in SCALE.md prose. ``scripts/check_artifacts.py`` verifies the
artifact parses, covers the registry, and carries no extreme outlier.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    flag_s = float(sys.argv[2]) if len(sys.argv) > 2 else 2.5
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from gramene_mongodb_spark.catalog import REGISTRY
    from gramene_mongodb_spark.session import get_spark

    spark = get_spark("timing-audit")
    skip = {"x_stream_agg_merge", "x_stream_exactly_once"}  # live streams
    rows: list[tuple[float, str]] = []
    for name in sorted(REGISTRY):
        if name in skip:
            continue
        best = float("inf")
        for _ in range(runs):
            try:
                t0 = time.time()
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            except Exception as e:  # keep the min of any CLEAN runs —
                # a transient flake on run 3 must not discard runs 1-2
                print(f"ERR {name}: {str(e)[:100]}")
        if best != float("inf"):
            rows.append((best, name))
    rows.sort(reverse=True)
    total = sum(t for t, _ in rows)
    print(f"\n{len(rows)} entries, total min-wall {total:.1f}s at {sf_dir}")
    print(f"entries over {flag_s}s:")
    for t, name in rows:
        if t > flag_s:
            print(f"  {t:6.2f}  {name}")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "TIMING_AUDIT.json")
    with open(out, "w") as fh:
        json.dump(
            {
                "sf_dir": sf_dir,
                "runs": runs,
                "registry_size": len(REGISTRY),
                "skipped": sorted(skip),
                "total_min_wall_s": round(total, 2),
                "entries": {n: round(t, 3) for t, n in rows},
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
