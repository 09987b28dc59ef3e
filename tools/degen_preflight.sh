#!/usr/bin/env bash
# Round-9 degenerate-fixture ORACLE parity sweep (VERDICT r08 item 1).
#
# DegenerateSweepSpec proves every query SURVIVES the three adversarial
# table sets (tiny / empty / NULL-laden); this script proves the survivors
# AGREE with the DuckDB oracle there — the guard paths (try_element_at,
# nullif-div, zero-range quantizer, ...) actually fire on these inputs,
# so this is the first time the cross-engine compare executes them.
#
# Expected divergences (documented, Aggregates.scala "KNOWN ENGINE-DEFINED
# DIVERGENCE"): on the EMPTY set only, rollup/cube/grouping_sets — the SQL
# standard emits the () grand-total row over an empty relation, Spark's
# Expand+Aggregate emits zero rows. Anything else failing is a regression.
#
# Usage: tools/degen_preflight.sh [baseDir] [logFile]
# Writes the full transcript to the log; exit 1 on any UNEXPECTED failure.
set -u
BASE="${1:-target/degen}"
LOG="${2:-DEGENERATE_PREFLIGHT_r09.log}"

expected_for() {
  case "$1" in
    empty) printf '%s\n' agg_rollup agg_cube agg_grouping_sets ;;
  esac
}

{
  echo "== degenerate oracle parity sweep, $(date -u +%Y-%m-%dT%H:%M:%SZ), HEAD $(git rev-parse --short HEAD) =="
  sbt -batch "Test/runMain graft.DegenGen $BASE" 2>&1 | grep "\[degen\]"
} | tee "$LOG"

rc=0
for s in tiny empty nulls; do
  {
    echo
    echo "== set: $s =="
    # sbt runs are sequential on purpose — the build lock serializes them.
    sbt -batch "runMain graft.Verify $BASE/$s $BASE/out_$s" 2>&1 \
      | grep "\[verify\]"
  } | tee -a "$LOG"
  out=$(python3 tools/preflight.py "$BASE/$s" "$BASE/out_$s" 2>&1)
  printf '%s\n' "$out" >> "$LOG"
  printf '%s\n' "$out" | grep -v "^PASS"   # console: failures + tally only
  unexpected=$(printf '%s\n' "$out" | grep "^FAIL" | cut -d: -f1 | cut -d' ' -f2 \
    | grep -vxF -f <(expected_for "$s"; echo __none__) || true)
  if [ -n "$unexpected" ]; then
    echo "UNEXPECTED failures in set $s: $unexpected" | tee -a "$LOG"
    rc=1
  else
    n_exp=$(echo "$out" | grep -c "^FAIL" || true)
    echo "set $s: all failures expected ($n_exp documented divergences)" | tee -a "$LOG"
  fi
done

echo | tee -a "$LOG"
echo "== sweep done, rc=$rc (log: $LOG) ==" | tee -a "$LOG"
exit $rc
