"""ATTESTED_HASHES.json maintenance — the result-fingerprint baseline
behind the rotation guard (VERDICT r12 ask #7).

The guard's question is: "did any entry's RESULT change since the tree
its last driver attestation ran on?" — if yes, the old green is stale
and the entry must be in the current driver window. File-level git
paths over-flag (a docstring edit in documents.py is not a semantic
change to 10 entries); the honest signal is the entry's canonical
result fingerprint at the driver's gate scale (sf0.01), the exact form
the driver hashes (tests/oracle.spark_value_hash).

Baseline file: ATTESTED_HASHES.json at the repo root —
``{entry: {value_hash, round, tree}}`` where ``round`` is the round
whose driver gate attested (or will attest) that hash and ``tree``
identifies the git tree it was computed from.

Modes:

``--bootstrap REV [ROUND]``
    One-off: check REV out into a throwaway git worktree, run every
    entry there at sf0.01, and write the baseline. Used once at round
    13 with the round-12-end commit — before that no per-entry result
    fingerprints were recorded. (Approximation, documented: entries
    last attested before r12 get their r12-end fingerprint; every
    earlier round's full-registry parity sweep was green at both SFs,
    so their results matched their oracles continuously through r12.)

``--refresh ROUND``
    Per-round rotation step: copy the freshly-swept ``value_hash`` of
    every CURRENT _DRIVER_WINDOW entry from PARITY_SF001.json into the
    baseline with the given round stamp — these are the hashes the
    driver is about to attest on this tree. Run AFTER rotating the
    window and AFTER regenerating PARITY_SF001.json on the same tree.

The guard itself lives in tests/test_oracle_parity.py
(test_changed_entries_are_windowed).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BASELINE = ROOT / "ATTESTED_HASHES.json"

#: self-contained sweep executed INSIDE the historical worktree (its
#: own package tree on sys.path). The canonicalization is a verbatim
#: twin of tests/oracle._canon/_norm_cell + spark_value_hash — any
#: drift here would poison the baseline, so keep them in lockstep.
_RUNNER = r'''
import hashlib, json, math, os, sys

def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            v = 0.0
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v) if v is not None else "\x00NULL"

def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out

def value_hash(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    c, canon = _canon(cols, rows)
    h = hashlib.sha256()
    h.update(("\x01".join(c)).encode())
    for r in canon:
        h.update(b"\x02")
        h.update(("\x01".join(r)).encode())
    return h.hexdigest()

sf_dir = sys.argv[1]
out_path = sys.argv[2]
import __spark_entry__ as E
from pyspark.sql import SparkSession
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .appName("attested-hash-sweep").getOrCreate())
hashes = {}
for name, fn in sorted(E.queries().items()):
    try:
        hashes[name] = value_hash(fn(spark, sf_dir))
    except Exception as exc:
        hashes[name] = f"ERROR:{type(exc).__name__}"
spark.stop()
json.dump(hashes, open(out_path, "w"), indent=0, sort_keys=True)
print(f"hashed {len(hashes)} entries")
'''


def bootstrap(rev: str, round_no: int, sf_dir: str) -> None:
    with tempfile.TemporaryDirectory(prefix="attested_boot_") as td:
        wt = os.path.join(td, "tree")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, rev],
            cwd=ROOT, check=True,
        )
        try:
            runner = os.path.join(td, "runner.py")
            out = os.path.join(td, "hashes.json")
            Path(runner).write_text(_RUNNER)
            subprocess.run(
                [sys.executable, runner, sf_dir, out],
                cwd=wt, check=True,
                env={**os.environ, "PYTHONPATH": wt},
            )
            hashes = json.loads(Path(out).read_text())
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt], cwd=ROOT, check=False
            )
    baseline = {
        name: {"value_hash": h, "round": round_no, "tree": rev}
        for name, h in hashes.items()
        if not str(h).startswith("ERROR:")
    }
    errors = {n: h for n, h in hashes.items() if str(h).startswith("ERROR:")}
    if errors:
        print(f"WARNING: {len(errors)} entries errored at {rev}: {sorted(errors)}")
    BASELINE.write_text(json.dumps(baseline, indent=1, sort_keys=True) + "\n")
    print(f"wrote {BASELINE.name}: {len(baseline)} entries @ {rev} (round {round_no})")


def refresh(round_no: int, parity_path: str) -> None:
    sys.path.insert(0, str(ROOT))
    from gramene_mongodb_spark.catalog import _DRIVER_WINDOW

    parity = json.loads(Path(parity_path).read_text())["queries"]
    baseline = json.loads(BASELINE.read_text()) if BASELINE.exists() else {}
    missing = [n for n in _DRIVER_WINDOW if "value_hash" not in parity.get(n, {})]
    if missing:
        raise SystemExit(
            f"parity artifact lacks value_hash for windowed entries {missing} "
            "— regenerate it with scripts/parity.py first"
        )
    for name in _DRIVER_WINDOW:
        baseline[name] = {
            "value_hash": parity[name]["value_hash"],
            "round": round_no,
            "tree": "HEAD",
        }
        if "oracle_hash" in parity[name]:
            baseline[name]["oracle_hash"] = parity[name]["oracle_hash"]
    BASELINE.write_text(json.dumps(baseline, indent=1, sort_keys=True) + "\n")
    print(f"refreshed {len(_DRIVER_WINDOW)} windowed entries to round {round_no}")


def main() -> None:
    args = sys.argv[1:]
    if args[:1] == ["--bootstrap"] and len(args) >= 2:
        rev = args[1]
        round_no = int(args[2]) if len(args) > 2 else 12
        sf_dir = args[3] if len(args) > 3 else "/root/testdata/sf0.01"
        bootstrap(rev, round_no, sf_dir)
    elif args[:1] == ["--refresh"] and len(args) >= 2:
        parity = args[2] if len(args) > 2 else str(ROOT / "PARITY_SF001.json")
        refresh(int(args[1]), parity)
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    main()
