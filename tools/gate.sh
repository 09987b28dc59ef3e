#!/usr/bin/env bash
# Full local gate: compile, tests, correctness at sf0.001 + sf0.01 (the
# driver's t1/t2 scales), and the sf0.1 bench. Run from the repo root.
# Any failing step aborts. ~6 minutes total.
#
# GATE_SWEEP_SF01=1 additionally sweeps every oracle at sf0.1 (VERDICT r06
# #2: stream_session's round-1 divergence only showed at sf0.1, so run the
# full three-scale sweep at least once per round and commit the log).
set -euo pipefail

cd "$(dirname "$0")/.."

echo "=== compile ==="
sbt -batch compile

echo "=== tests ==="
sbt -batch test

SCALES="0.001 0.01"
if [[ "${GATE_SWEEP_SF01:-0}" == "1" ]]; then SCALES="$SCALES 0.1"; fi
for SF in $SCALES; do
  OUT="/tmp/gate_verify_sf${SF}"
  echo "=== verify + preflight sf${SF} ==="
  rm -rf "$OUT"
  sbt -batch "runMain graft.Verify /root/testdata/sf${SF} ${OUT}"
  python3 tools/preflight.py "/root/testdata/sf${SF}" "$OUT"
done

echo "=== bench sf0.1 ==="
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" | grep -o '{"metric".*}' | tee /tmp/gate_bench.json

echo "=== gate green ==="
