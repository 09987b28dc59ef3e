#!/usr/bin/env bash
# Degenerate-fixture ORACLE parity sweep (VERDICT r08 item 1; hardened
# round 10 per ADVICE r09).
#
# DegenerateSweepSpec proves every query SURVIVES the adversarial table
# sets in DegenTables.sets; this script proves the survivors
# AGREE with the DuckDB oracle there — the guard paths (try_element_at,
# nullif-div, zero-range quantizer, ...) actually fire on these inputs,
# so this is the first time the cross-engine compare executes them.
#
# Expected divergences (documented, Aggregates.scala "KNOWN ENGINE-DEFINED
# DIVERGENCE"): on the EMPTY set only, rollup/cube/grouping_sets — the SQL
# standard emits the () grand-total row over an empty relation, Spark's
# Expand+Aggregate emits zero rows. Anything else failing is a regression.
#
# False-green hardening (ADVICE r09): the original gate only counted
# '^FAIL' lines, so an sbt crash, a preflight.py traceback, or a stale
# out_$s dir produced zero FAILs and the set was reported green without
# having compared anything. Now every sbt exit status is checked (a crash
# over a stale out dir would otherwise compare old results), and each
# set must produce preflight.py's final "N pass, M fail, K declared"
# tally with n_pass > 0 and n_pass + n_fail == declared — a sweep that
# did not actually compare the full registry cannot pass.
#
# Usage: tools/degen_preflight.sh [baseDir] [logFile]
# Writes the full transcript to the log; exit 1 on any UNEXPECTED failure
# OR any crashed/incomplete stage.
set -u -o pipefail
BASE="${1:-target/degen}"
# Default log is date+time-stamped (ADVICE r12, tightened r13): a
# hardcoded round number silently overwrote the archived prior-round
# transcript, and a date-only default interleaved two unlabeled same-day
# runs into one muddled transcript (tee -a). The seconds component gives
# each defaulted run its own self-contained file. Pass the r{N} name
# explicitly to archive.
LOG="${2:-DEGENERATE_PREFLIGHT_$(date -u +%Y%m%dT%H%M%SZ).log}"
TOOLS_DIR="$(dirname "$0")"

# Queries whose Verify-stage THROW is itself the expected behavior on a
# set (execution-stage loud postures, vs expected_for's compare-stage
# divergences). The list lives in tools/degen_extremes_loud.txt — the ONE
# source of truth, read verbatim here and by DegenerateSweepSpec, which
# asserts file == DegenTables.extremesLoudQueries (no regex-scraping of
# this script, ADVICE r12).
expected_loud_for() {
  case "$1" in
    extremes) tr -d '\r' < "$TOOLS_DIR/degen_extremes_loud.txt" ;;
    *) : ;;
  esac
}

expected_for() {
  case "$1" in
    # Spark's Expand+Aggregate emits ZERO rows for ROLLUP/CUBE/GROUPING
    # SETS over an empty relation; the SQL standard (and DuckDB) still
    # emit the () grand-total row. Documented at the three QueryDefs
    # (Aggregates.scala, "KNOWN ENGINE-DEFINED DIVERGENCE" block above
    # agg_rollup) and canaried by DegenerateSweepSpec's empty-tables test,
    # which fails with a de-list instruction here if a future Spark adopts
    # the standard row (VERDICT r19 #3 audit: both existed since round 14,
    # commit 10433a8 — this pointer closes the triangle).
    empty) printf '%s\n' agg_rollup agg_cube agg_grouping_sets ;;
    # Spark levenshtein counts code points, DuckDB's counts UTF-8 bytes —
    # engine-defined, documented at the fn_levenshtein QueryDef; ASCII
    # fixtures coincide, only the multibyte set diverges.
    unicode) printf '%s\n' fn_levenshtein ;;
    # Round-11 posture: the loud-throw queries (degen_extremes_loud.txt)
    # feed a ±1e30 column into an aggregation-INPUT decimal cast, which
    # intentionally keeps the loud ANSI throw on BOTH engines (Spark
    # NUMERIC_VALUE_OUT_OF_RANGE, DuckDB Conversion Error). Every other
    # query must round to NULL at its final try_cast site and AGREE with
    # the oracle.
    # …plus fn_format: Java %f renders a >2^53 double via its shortest
    # decimal representation, C printf via the exact binary expansion —
    # engine-defined, documented at the fn_format QueryDef.
    extremes) expected_loud_for extremes; printf '%s\n' fn_format ;;
    # control: ZERO expected divergences since round 19 — fn_regexp's end
    # anchor is now `\z` on both engines (no final-line-terminator
    # exception in Java OR RE2), closing the `$`-anchor seam that was this
    # set's one forgiveness for four rounds (VERDICT r18 #4).
  esac
}

rc=0

# Per-set runtime budget, seconds (VERDICT r14 #6): the sweep grew from 7
# to 11 sets in round 14 and gate wall-time grew with it. Each set costs
# one sbt Verify pass (~90 s incl. sbt startup) plus the DuckDB compare
# (~20-40 s); 240 s is ~1.7x that ceiling. Exceeding prints a loud
# OVER-BUDGET line (a growth notice for the next round, NOT a failure —
# box load legitimately stretches sbt). The sweep-total line at the
# bottom is the number README's Artifacts table quotes.
SET_BUDGET=240
sweep_t0=$(date +%s)
set_runtime_line() { # $1 = set name, $2 = set start epoch-seconds
  local dt=$(( $(date +%s) - $2 ))
  local over=""
  [ "$dt" -gt "$SET_BUDGET" ] && over=" OVER BUDGET — investigate before adding sets"
  echo "set $1: runtime ${dt}s (budget ${SET_BUDGET}s)$over" | tee -a "$LOG"
}

{
  echo "== degenerate oracle parity sweep, $(date -u +%Y-%m-%dT%H:%M:%SZ), HEAD $(git rev-parse --short HEAD) =="
  sbt -batch "Test/runMain graft.DegenGen $BASE" 2>&1 | grep "\[degen\]"
} | tee "$LOG"
gen_rc=$?
if [ "$gen_rc" -ne 0 ]; then
  echo "DegenGen FAILED (pipeline rc=$gen_rc) — aborting, nothing was compared" | tee -a "$LOG"
  echo "== sweep ABORTED, rc=1 (log: $LOG) ==" | tee -a "$LOG"
  exit 1
fi

# ONE list drives both the loop and the sweep-total line (review r15: a
# hardcoded "11 sets" in the summary would silently falsify when a set is
# added). Must match DegenTables.sets' keys.
SETS="tiny empty nulls unicode extremes skew ties constant long calendar control"
for s in $SETS; do
  {
    echo
    echo "== set: $s =="
  } | tee -a "$LOG"
  set_t0=$(date +%s)
  # sbt runs are sequential on purpose — the build lock serializes them.
  # A failed Verify over a STALE out_$s dir from a prior run would let
  # preflight.py green-light old results, so the exit status gates the set.
  # Verify exits nonzero on ANY failed query (round-12 hardening, ADVICE
  # r11 #3) unless the failure is declared expected — the extremes set's
  # seven loud-posture queries throw by design, so declare exactly those;
  # an eighth failure still fails the set, and the manifest check below
  # asserts each declared-loud query DID throw (ADVICE r12: declaring a
  # name only forgives its failure; it does not prove the throw happened).
  loud=$(expected_loud_for "$s" | paste -sd, -)
  SPARK_GRAFT_VERIFY_EXPECT_FAIL="$loud" \
    sbt -batch "runMain graft.Verify $BASE/$s $BASE/out_$s" 2>&1 \
    | grep "\[verify\]" | tee -a "$LOG"
  verify_rc=$?
  if [ "$verify_rc" -ne 0 ]; then
    echo "set $s: Verify FAILED (pipeline rc=$verify_rc) — set NOT compared" | tee -a "$LOG"
    rc=1
    set_runtime_line "$s" "$set_t0"
    continue
  fi
  # Loud-posture enforcement (ADVICE r12): every declared-loud query must
  # appear in verify_manifest.json's "failed" list — that list records the
  # queries that actually THREW at the Verify stage. A loud query that
  # stopped throwing on Spark would previously stay green here (its name
  # was merely forgiven) even though the ANSI-overflow posture regressed.
  manifest="$BASE/out_$s/verify_manifest.json"
  # Parse the manifest's "failed" ARRAY, not a whole-file grep (ADVICE
  # r13): the grep was sound only while failed names were the manifest's
  # sole quoted query names — a future names-bearing field (a written/
  # passed list) would have made the check silently vacuous.
  for qn in $(expected_loud_for "$s"); do
    if ! python3 -c 'import json,sys; sys.exit(0 if sys.argv[2] in json.load(open(sys.argv[1]))["failed"] else 1)' "$manifest" "$qn"; then
      echo "set $s: declared-loud query $qn did NOT throw at Verify stage (absent from $manifest failed list)" | tee -a "$LOG"
      rc=1
    fi
  done
  out=$(python3 tools/preflight.py "$BASE/$s" "$BASE/out_$s" 2>&1)
  py_rc=$?
  printf '%s\n' "$out" >> "$LOG"
  printf '%s\n' "$out" | grep -v "^PASS"   # console: failures + tally only
  # The tally line is the proof the compare ran to completion — a
  # traceback (py_rc=1, same as an expected-FAIL exit) never prints it.
  tally=$(printf '%s\n' "$out" | grep -E "^[0-9]+ pass, [0-9]+ fail, [0-9]+ declared" | tail -1)
  if [ -z "$tally" ] || [ "$py_rc" -gt 1 ]; then
    echo "set $s: preflight.py did not complete (rc=$py_rc, no tally) — set NOT compared" | tee -a "$LOG"
    rc=1
    set_runtime_line "$s" "$set_t0"
    continue
  fi
  n_pass=$(echo "$tally" | awk '{print $1}')
  n_fail=$(echo "$tally" | awk '{print $3}')
  n_decl=$(echo "$tally" | awk '{print $5}')
  if [ "$n_pass" -eq 0 ] || [ $((n_pass + n_fail)) -ne "$n_decl" ]; then
    echo "set $s: incomplete compare ($n_pass pass + $n_fail fail != $n_decl declared, or zero passes)" | tee -a "$LOG"
    rc=1
    set_runtime_line "$s" "$set_t0"
    continue
  fi
  unexpected=$(printf '%s\n' "$out" | grep "^FAIL" | cut -d: -f1 | cut -d' ' -f2 \
    | grep -vxF -f <(expected_for "$s"; echo __none__) || true)
  if [ -n "$unexpected" ]; then
    echo "UNEXPECTED failures in set $s: $unexpected" | tee -a "$LOG"
    rc=1
  else
    echo "set $s: $n_pass/$n_decl pass, all $n_fail failures expected (documented divergences)" | tee -a "$LOG"
  fi
  set_runtime_line "$s" "$set_t0"
done

echo | tee -a "$LOG"
echo "== sweep wall $(( $(date +%s) - sweep_t0 ))s over $(echo $SETS | wc -w) sets (per-set budget ${SET_BUDGET}s) ==" | tee -a "$LOG"
echo "== sweep done, rc=$rc (log: $LOG) ==" | tee -a "$LOG"
exit $rc
