"""Driver-artifact hygiene — the round-7 lesson as executable checks.

Two process defects reached judging undetected that round: a truncated
BENCH artifact (``"parsed": null``) and a red CORRECTNESS row. These
tests keep ``scripts/check_artifacts.py`` honest and pin bench.py's
driver-survivable output contract.
"""

from __future__ import annotations

import importlib.util
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "check_artifacts", ROOT / "scripts" / "check_artifacts.py"
)
check_artifacts = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check_artifacts)

# Rounds whose broken artifacts a judge already adjudicated in
# VERDICT.md (round 7: BENCH truncation + k3k4 canon error). Every
# LATER round must come up clean or this suite goes red inside the
# round, not at judging.
ADJUDICATED = [7]


def test_latest_driver_artifacts_are_clean():
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "check_artifacts.py")]
        + [a for n in ADJUDICATED for a in ("--waive", str(n))],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout


def test_check_flags_round7_shapes(tmp_path):
    """The checker must catch BOTH round-7 defect shapes: a clipped
    bench tail with no recoverable JSON, and an ``err`` correctness
    row — and accept the healthy forms."""
    # clipped tail, no JSON line → finding
    bad_bench = tmp_path / "BENCH_r90.json"
    bad_bench.write_text(json.dumps({"parsed": None, "tail": '1.2, "q2": 0.4}}'}))
    assert check_artifacts.check_bench(90, bad_bench)

    # compact last line with a non-null value → clean even when the
    # driver itself failed to parse (recoverable headline)
    ok_bench = tmp_path / "BENCH_r91.json"
    ok_bench.write_text(
        json.dumps(
            {
                "parsed": None,
                "tail": '# noise\n{"metric": "m", "value": 41.2, "sf": 0.1}\n',
            }
        )
    )
    assert not check_artifacts.check_bench(91, ok_bench)

    bad_corr = tmp_path / "CORRECTNESS_r90.json"
    bad_corr.write_text(
        json.dumps(
            {
                "good": {"rows_match": True, "schema_match": True, "hash_match": True},
                "broken": {"rows_match": None, "err": "TypeError: unhashable"},
            }
        )
    )
    flagged = check_artifacts.check_correctness(90, bad_corr)
    assert len(flagged) == 1 and "broken" in flagged[0]


def test_bench_stdout_contract_is_compact():
    """bench.py's printed line must stay a few hundred bytes (no
    per-query dict) so the driver's tail capture can never clip the
    headline again; detail belongs in the BENCH_DETAIL file."""
    src = (ROOT / "bench.py").read_text()
    # the compact dict printed to stdout must not embed the timings dict
    compact_block = src.split("compact = {", 1)[1].split("}", 1)[0]
    assert '"queries"' not in compact_block
    assert "detail_file" in compact_block
    # and the full detail must be written to a file before printing
    assert "SPARK_GRAFT_BENCH_DETAIL" in src


def test_check_flags_timing_shapes(tmp_path):
    """check_timing must catch the three TIMING_AUDIT defect shapes —
    missing artifact, stale registry coverage, over-ceiling entry —
    and accept the healthy form (including a measured-heavy entry
    under its own documented ceiling)."""
    p = tmp_path / "TIMING_AUDIT.json"
    assert check_artifacts.check_timing(p)  # missing

    def write(doc):
        p.write_text(json.dumps(doc))

    healthy = {
        "registry_size": 4,
        "skipped": ["s1"],
        "entries": {"a": 1.0, "b": 2.0, "x_lsh_recall_eval": 8.0},
    }
    write(healthy)
    assert check_artifacts.check_timing(p) == []

    write({**healthy, "registry_size": 10})  # covers 4/10 -> stale
    assert any("stale" in f or "covers" in f for f in check_artifacts.check_timing(p))

    write({**healthy, "entries": {**healthy["entries"], "a": 7.5}})
    assert any("a min-wall 7.5" in f for f in check_artifacts.check_timing(p))

    # the per-entry ceiling: 8.0 is fine (above the default flag line),
    # 11.0 breaches the documented regression ceiling
    write({**healthy, "entries": {**healthy["entries"], "x_lsh_recall_eval": 11.0}})
    assert any("x_lsh_recall_eval" in f for f in check_artifacts.check_timing(p))
