"""Rebalance the property-suite test shards by MEASURED duration.

VERDICT r11 "What's wrong" #2: the nodeid-hash thirds of
tests/test_properties.py are even in item count but uneven in wall
time — the 5-way suite wall equalled its slowest shard. This script
reads per-test durations from pytest ``--durations=0`` logs and
bin-packs the items into N shards (longest-processing-time greedy: sort
descending, assign each to the currently-lightest shard — within 4/3 of
optimal), writing ``tests/property_shards.json`` which
tests/conftest.py consults before falling back to the hash rule for
tests added after the rebalance.

Usage:
    PYTEST_SHARD=0/3 pytest tests/test_properties.py -q --durations=0 > d0.log
    PYTEST_SHARD=1/3 pytest tests/test_properties.py -q --durations=0 > d1.log
    PYTEST_SHARD=2/3 pytest tests/test_properties.py -q --durations=0 > d2.log
    python scripts/rebalance_shards.py d0.log d1.log d2.log

(The three hash-sharded logs together cover the full suite; any set of
logs whose union covers it works.)
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "tests" / "property_shards.json"
# 4 thirds→quarters at round 14: the property suite's total call time
# (~37 min measured under the 5-way contention it actually runs in)
# outgrew a 3-way split's ~9-minute wall target; 4 shards predict
# ~9:15 each (6 pytest processes total — still fine on 32 CPUs)
N_SHARDS = 4

#: pytest --durations line: "12.34s call tests/test_x.py::test_y[case]"
_LINE = re.compile(r"^\s*(\d+(?:\.\d+)?)s\s+call\s+(\S+)\s*$")


def main(logs: list[str]) -> None:
    durations: dict[str, float] = {}
    for log in logs:
        for line in open(log, errors="replace"):
            m = _LINE.match(line)
            if m:
                secs, nodeid = float(m.group(1)), m.group(2)
                durations[nodeid] = max(durations.get(nodeid, 0.0), secs)
    items = [(s, nid) for nid, s in durations.items()
             if nid.startswith("tests/test_properties.py")]
    if not items:
        raise SystemExit("no test_properties durations found in the logs")
    items.sort(reverse=True)
    loads = [0.0] * N_SHARDS
    assignment: dict[str, int] = {}
    for secs, nid in items:
        shard = min(range(N_SHARDS), key=loads.__getitem__)
        assignment[nid] = shard
        loads[shard] += secs
    payload = {
        "n_shards": N_SHARDS,
        "generated_from": [str(p) for p in logs],
        "shard_seconds_predicted": [round(x, 1) for x in loads],
        "assignment": assignment,
    }
    OUT.write_text(json.dumps(payload, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT}: {len(assignment)} items; "
          f"predicted shard walls {payload['shard_seconds_predicted']}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/tmp/dur_shard_2.log", "/tmp/dur_shard_3.log",
                          "/tmp/dur_shard_4.log"])
