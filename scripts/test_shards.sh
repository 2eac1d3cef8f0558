#!/usr/bin/env bash
# Six-way parallel test run (VERDICT r10 ask #8: the full suite hit
# ~26 min single-process; pytest-xdist is not in this sandbox, so this
# is plain pytest processes, each with its OWN Spark JVM — 6 x local[8]
# on the 32-CPU box).
#
# Measured breakdown (round 11): Hypothesis property suite ≈ 18 min
# single-process (the pacing item), oracle-parity + plan sweeps 6:40,
# the unit/integration files 7:35. Split: the property suite is
# SPLIT via PYTEST_SHARD (tests/conftest.py). Round 12: the thirds
# are assigned by MEASURED-duration bin-pack (tests/property_shards.json,
# scripts/rebalance_shards.py) instead of nodeid hash — the hash split
# measured 10:43/7:10/9:18 walls; the bin-pack measured 8:02/7:32/8:56
# (tests new since the rebalance fall back to the hash rule).
# Round 13: re-packed from a fresh --durations=0 run after the suite
# grew (r12 walls had crept to 10:22/9:44/10:42); the new assignment
# measured 6:37/7:10/7:21 (predicted 7:19/7:19/7:20). Round 14: walls
# crept again (11:40-13:07 measured, tripwire x1.7) — re-packed AND
# widened to four property quarters; predicted ~9:11 each.
# Round 15: Hypothesis fast/full PROFILES (tests/conftest.py). Default
# runs use the fast profile (10 examples/property) to hold shard walls
# at the ~9-min target; each round's CLOSING BATTERY must run
#   SPARK_GRAFT_HYP_PROFILE=full scripts/test_shards.sh
# (25 examples — the budget the shard pack's predictions and the
# conftest tripwire are calibrated against; the tripwire enforces
# drift only under the full profile). Re-packs
# (scripts/rebalance_shards.py) must consume full-profile logs.
#
# Usage: scripts/test_shards.sh   (exits non-zero if any shard fails)
set -u
cd "$(dirname "$0")/.."

SWEEPS="tests/test_oracle_parity.py tests/test_plan_sweep.py"
PROPS="tests/test_properties.py"
REST=$(ls tests/test_*.py | grep -v -E 'oracle_parity|plan_sweep|properties' | tr '\n' ' ')

echo "[shards] 1: catalog sweeps   2-5: property quarters   6: $(echo "$REST" | wc -w) unit files"

# property shards run with --durations=0 so every run leaves logs a
# scripts/rebalance_shards.py re-pack can consume directly, and the
# conftest [shard-tripwire] (measured-vs-packed drift >25%) has data.
# Round 14: property thirds → QUARTERS — the suite's measured call
# time (~37 min under this script's own contention) outgrew a 3-way
# split's ~9-minute wall target; 4 quarters predict ~9:15 each.
python -m pytest $SWEEPS -q >/tmp/test_shard_1.log 2>&1 &
P1=$!
PYTEST_SHARD=0/4 python -m pytest $PROPS -q --durations=0 >/tmp/test_shard_2.log 2>&1 &
P2=$!
PYTEST_SHARD=1/4 python -m pytest $PROPS -q --durations=0 >/tmp/test_shard_3.log 2>&1 &
P3=$!
PYTEST_SHARD=2/4 python -m pytest $PROPS -q --durations=0 >/tmp/test_shard_4.log 2>&1 &
P4=$!
PYTEST_SHARD=3/4 python -m pytest $PROPS -q --durations=0 >/tmp/test_shard_5.log 2>&1 &
P5=$!
python -m pytest $REST -q >/tmp/test_shard_6.log 2>&1 &
P6=$!

RC=0
for i in 1 2 3 4 5 6; do
  eval "wait \$P$i"; R=$?
  echo "--- shard $i tail ---"; tail -n 1 "/tmp/test_shard_$i.log"
  grep -h '\[shard-tripwire\]' "/tmp/test_shard_$i.log" || true
  [ $R -ne 0 ] && RC=1
done
if [ $RC -ne 0 ]; then
  echo "[shards] FAILED — full logs: /tmp/test_shard_{1,2,3,4,5,6}.log"
  exit 1
fi
echo "[shards] OK"
