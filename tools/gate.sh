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

# Self-stamped header (VERDICT r13 #6): the archived PREFLIGHT_r{N}.log
# headers were hand-written, which let the stamped HEAD drift from the
# HEAD the gate actually ran at. Emit it mechanically, including whether
# the working tree was dirty — an archiver redirecting this script's
# output gets a trustworthy provenance line for free.
#
# Mechanical archiving (ADVICE r14): the round-14 convention — redirect
# to a temp path, mv over PREFLIGHT_r{N}.log afterwards — lived only in a
# comment, so a direct redirect into the tracked log could still truncate
# it at launch and trip the dirty-detector into a false 'UNCOMMITTED
# TRACKED CHANGES' header. Now the script enforces it: pass
# GATE_LOG=PREFLIGHT_r{N}.log and the run tees itself to a mktemp, moving
# it into place only at exit (any exit — success or failure — so a red
# gate still archives its transcript).
if [[ -n "${GATE_LOG:-}" && -z "${GATE_LOG_ACTIVE:-}" ]]; then
  tmplog=$(mktemp /tmp/gate_log.XXXXXX)
  # trap, not a straight-line mv: 'any exit' must include signal exits
  # (Ctrl-C on a wedged sbt, TERM from a supervisor) or the transcript
  # strands in /tmp and the tracked log goes stale (review r15). The -f
  # guard makes EXIT-after-INT idempotent.
  finish() { [ -f "$tmplog" ] && mv "$tmplog" "$GATE_LOG" && \
    echo "gate transcript archived to $GATE_LOG"; }
  trap finish EXIT INT TERM
  set +e
  GATE_LOG_ACTIVE=1 "$0" "$@" 2>&1 | tee "$tmplog"
  gate_rc=${PIPESTATUS[0]}
  set -e
  exit "$gate_rc"
fi
DIRTY=$(git status --porcelain | grep -vc '^?? \|^ M BENCH_DETAILS.json$' || true)
LOAD_AT_LAUNCH=$(cut -d' ' -f1 /proc/loadavg)
echo "=== gate run $(date -u +%Y-%m-%dT%H:%MZ), HEAD $(git rev-parse --short HEAD)$([ "$DIRTY" -gt 0 ] && echo ' + UNCOMMITTED TRACKED CHANGES' || true), sweep_sf01=${GATE_SWEEP_SF01:-0}, loadavg_1m=${LOAD_AT_LAUNCH} ==="

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

# Bench launch load gate (VERDICT r17 #5): the gate-run bench numbers
# feed the committed regression series and the round narrative, yet were
# un-load-gated — two r17 gate runs carried a uniform ~1.25x box-load
# factor that had to be divided out after the fact. Apply the same
# discipline bench_quote.sh has had since r12: the 1-min loadavg at the
# bench step must be <= GRAFT_BENCH_MAX_LAUNCH_LOAD (default 1.5). The
# earlier compile/test/verify stages are allowed to have heated the box,
# so poll up to GRAFT_GATE_LOAD_WAIT seconds (default 300) for the load
# to settle before refusing — a refusal is a RED gate, not a silent
# tainted number.
echo "=== bench sf0.1 ==="
MAX_LOAD="${GRAFT_BENCH_MAX_LAUNCH_LOAD:-1.5}"
WAIT_S="${GRAFT_GATE_LOAD_WAIT:-300}"
waited=0
while :; do
  BENCH_LOAD=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(awk -v l="$BENCH_LOAD" -v m="$MAX_LOAD" 'BEGIN{print (l<=m)?1:0}')
  [[ "$ok" == "1" ]] && break
  if (( waited >= WAIT_S )); then
    echo "GATE BLOCKED: bench launch loadavg ${BENCH_LOAD} > ${MAX_LOAD}" \
         "after waiting ${waited}s — rerun when the box is idle" \
         "(override threshold with GRAFT_BENCH_MAX_LAUNCH_LOAD)"
    exit 1
  fi
  echo "bench load gate: loadavg ${BENCH_LOAD} > ${MAX_LOAD}, settling (${waited}s/${WAIT_S}s)"
  sleep 15; waited=$((waited + 15))
done
echo "bench launch loadavg_1m=${BENCH_LOAD} (gate <= ${MAX_LOAD})"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" | grep -o '{"metric".*}' | tee /tmp/gate_bench.json

# Per-query regression gate (VERDICT r10 #3): scan this run's map against
# the newest committed BENCH_SEQ archive (override with GATE_REGRESS_BASE,
# e.g. to force the PREVIOUS round's file after this round's first quote
# exists). A flag BLOCKS the gate until BASELINE.md carries a disposal
# note containing the literal token `disposal(<query>)` with the evidence
# (solo-confirm or root-cause) — prose-only disposals no longer count.
echo "=== per-query regression scan ==="
BASE_MAP="${GATE_REGRESS_BASE:-$(ls BENCH_SEQ_r*.json 2>/dev/null | sort -V | tail -1)}"
if [[ -z "$BASE_MAP" ]]; then
  echo "no BENCH_SEQ archive yet — scan skipped"
else
  set +e
  SCAN=$(python3 tools/bench_regress.py "$BASE_MAP" BENCH_DETAILS.json 2>&1)
  scan_rc=$?
  set -e
  echo "$SCAN"
  if [[ $scan_rc -ne 0 ]]; then
    flags=$(echo "$SCAN" | awk '/^FLAG /{print $2}' | tr -d ':')
    if [[ -z "$flags" ]]; then
      echo "GATE BLOCKED: bench_regress.py errored (no FLAG lines, rc=$scan_rc)"
      exit 1
    fi
    # Round-scoped token matching (round 17): the first r17 gate showed a
    # STALE token passing the literal grep — disposal(text_pack_bins)
    # written in round 11 for a different movement satisfied a round-17
    # flag. A disposal is evidence about THIS round's scan, so when the
    # round number is derivable from GATE_LOG (PREFLIGHT_r{N}.log), only
    # tokens at or after BASELINE.md's first "## Round {N}" header count;
    # otherwise fall back to the whole file (manual un-logged runs).
    ROUND_N=$(echo "${GATE_LOG:-}" | sed -n 's/^PREFLIGHT_r0*\([0-9]*\)\.log$/\1/p')
    if [[ -n "$ROUND_N" ]] && grep -q "^## Round ${ROUND_N} " BASELINE.md; then
      DISPOSAL_SCOPE=$(sed -n "/^## Round ${ROUND_N} /,\$p" BASELINE.md)
      scope_desc="BASELINE.md's Round ${ROUND_N} sections"
    else
      DISPOSAL_SCOPE=$(cat BASELINE.md)
      scope_desc="BASELINE.md"
    fi
    undisposed=""
    for q in $flags; do
      echo "$DISPOSAL_SCOPE" | grep -qF "disposal($q)" || undisposed="$undisposed $q"
    done
    if [[ -n "$undisposed" ]]; then
      echo "GATE BLOCKED: flagged queries without a 'disposal(<query>)' note" \
           "in ${scope_desc}:$undisposed"
      echo "Solo-confirm or root-cause each, append the evidence to" \
           "BASELINE.md including the literal token 'disposal(<query>)'," \
           "then re-run the gate."
      exit 1
    fi
    echo "all flags carry disposal notes in ${scope_desc} — accepted"
  fi
fi

echo "=== gate green ==="
