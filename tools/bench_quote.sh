#!/usr/bin/env bash
# Archive-verbatim gate-quote runner (round-10 convention, VERDICT r09 #1).
#
# BENCH_DETAILS.json is per-run scratch — every Bench invocation
# overwrites it, so a quoted run's per-query map is lost unless archived
# immediately. This script runs one full Bench pass (sf0.1, local[32])
# and appends the run's complete record — seq_wall, walls, loadavg
# before/after, failed list, and BOTH full per-query maps — to the
# committed BENCH_SEQ_r{N}.json, stamped with the HEAD sha. Totals still
# get quoted by hand in BASELINE.md with commentary; this file is the
# machine-readable per-query series that round-over-round regression
# scans diff against.
#
# LOADAVG GATE (VERDICT r12 #6): round 12 burned a full gate run on a
# mid-window external tenant (r12_run1, 122.7 s vs the 64.7 s clean rerun)
# and disposed it manually in BASELINE.md. That protocol is now code:
#  - at launch, 1-min loadavg must be <= GRAFT_BENCH_MAX_LAUNCH_LOAD
#    (default 1.5 — clean archived runs launched at 0.04-0.43);
#  - a background sampler records the max 1-min loadavg every 5 s during
#    the run; Bench's own local[32] work peaks this box at ~3-5 (archived
#    loadavg_after series), so a max above GRAFT_BENCH_MAX_RUN_LOAD
#    (default 10.0) means an external tenant shared the window.
# Either trip REFUSES to archive the run and appends a machine-readable
# refusal record (reason + observed load) to BENCH_SEQ_r{N}.json instead,
# exit 2. Clean runs archive their sampled max as max_load_1m so future
# disposals can cite it. The gate only applies to runs THIS script
# launches — archiving a pre-existing details file (control-run mode,
# 3rd arg) skips it, since the window being judged already passed.
#
# CONTROL RUNS TOO (VERDICT r10 #2): the round-10 A/B control was archived
# summary-only because its per-query map lived in a throwaway worktree's
# scratch — pass that worktree's BENCH_DETAILS.json as the 3rd arg (skips
# the Bench run here, archives the given file verbatim) with an explicit
# run label as the 4th, and the control's full seq_queries lands in the
# committed archive like every head run's.
#
# Usage: tools/bench_quote.sh <round> [note] [details_json [run_label]]
#   e.g. tools/bench_quote.sh 11 "run 2, 4 min settle"
#        tools/bench_quote.sh 11 "r10 code rebuilt on today's box" \
#            /tmp/wt_r10/BENCH_DETAILS.json r10_code_control
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:?usage: bench_quote.sh <round> [note] [details_json [run_label]]}"
NOTE="${2:-}"
DETAILS="${3:-}"
RUN_LABEL="${4:-}"
MAX_LAUNCH_LOAD="${GRAFT_BENCH_MAX_LAUNCH_LOAD:-1.5}"
MAX_RUN_LOAD="${GRAFT_BENCH_MAX_RUN_LOAD:-10.0}"
MAX_LOAD_SEEN=""

refuse() { # reason observed threshold
  python3 - "$N" "$NOTE" "$(git rev-parse --short HEAD)" "$1" "$2" "$3" <<'EOF'
import json, os, sys
n, note, head, reason, observed, threshold = sys.argv[1:7]
path = f"BENCH_SEQ_r{n}.json"
doc = json.load(open(path)) if os.path.exists(path) else {
    "_comment": "Gate-quote archive (round-10 convention): full "
    "sequential-pass per-query maps of every gate-quote run, committed so "
    "round-over-round per-query comparison does not depend on the "
    "overwritable BENCH_DETAILS.json scratch. Compare seq<->seq only; "
    "conc_queries include FAIR-scheduler contention. sf0.1, local[32].",
    "runs": []}
doc.setdefault("refusals", []).append({
    "head": head, "note": note, "reason": reason,
    "load_1m": float(observed), "threshold": float(threshold)})
json.dump(doc, open(path, "w"), indent=1)
print(f"[bench_quote] REFUSED to archive ({reason}: load {observed} > "
      f"{threshold}); refusal recorded in {path}")
EOF
  exit 2
}

if [ -z "$DETAILS" ]; then
  LOAD_AT_LAUNCH=$(cut -d' ' -f1 /proc/loadavg)
  if awk "BEGIN{exit !($LOAD_AT_LAUNCH > $MAX_LAUNCH_LOAD)}"; then
    refuse "launch-load" "$LOAD_AT_LAUNCH" "$MAX_LAUNCH_LOAD"
  fi
  MON_FILE=$(mktemp)
  ( while :; do cut -d' ' -f1 /proc/loadavg; sleep 5; done >> "$MON_FILE" ) &
  MON_PID=$!
  trap 'kill "$MON_PID" 2>/dev/null || true' EXIT
  set +e
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.Bench"
  BENCH_RC=$?
  set -e
  kill "$MON_PID" 2>/dev/null || true
  trap - EXIT
  [ "$BENCH_RC" -ne 0 ] && { echo "[bench_quote] Bench failed (rc=$BENCH_RC) — nothing archived"; exit "$BENCH_RC"; }
  MAX_LOAD_SEEN=$(sort -g "$MON_FILE" | tail -1)
  rm -f "$MON_FILE"
  if [ -n "$MAX_LOAD_SEEN" ] && awk "BEGIN{exit !($MAX_LOAD_SEEN > $MAX_RUN_LOAD)}"; then
    refuse "midrun-load" "$MAX_LOAD_SEEN" "$MAX_RUN_LOAD"
  fi
  DETAILS="BENCH_DETAILS.json"
fi

python3 - "$N" "$NOTE" "$(git rev-parse --short HEAD)" "$DETAILS" "$RUN_LABEL" "$MAX_LOAD_SEEN" <<'EOF'
import json, os, sys
n, note, head, details, run_label, max_load = sys.argv[1:7]
d = json.load(open(details))
if "seq_queries" not in d:
    sys.exit(f"{details} has no seq_queries map — refusing to archive a "
             "summary-only record (the round-10 control gap this script "
             "exists to close)")
path = f"BENCH_SEQ_r{n}.json"
if os.path.exists(path):
    doc = json.load(open(path))
else:
    doc = {"_comment": "Gate-quote archive (round-10 convention): full "
           "sequential-pass per-query maps of every gate-quote run, "
           "committed so round-over-round per-query comparison does not "
           "depend on the overwritable BENCH_DETAILS.json scratch. "
           "Compare seq<->seq only; conc_queries include FAIR-scheduler "
           "contention. sf0.1, local[32].",
           "runs": []}
run = {"run": run_label or f"r{n}_run{len(doc['runs']) + 1}",
       "head": head,
       "note": note,
       "seq_wall": d["seq_wall"], "wall": d["wall"],
       "threads": d.get("threads"),
       "loadavg_before": d.get("loadavg_before"),
       "loadavg_after": d.get("loadavg_after"),
       "max_load_1m": float(max_load) if max_load else None,
       "failed": d.get("failed"),
       "seq_queries": d["seq_queries"],
       "conc_queries": d.get("conc_queries")}
doc["runs"].append(run)
json.dump(doc, open(path, "w"), indent=1)
status = "FAILED QUERIES PRESENT" if d.get("failed") else "ok"
print(f"[bench_quote] appended {run['run']} (head {head}, "
      f"seq_wall {d['seq_wall']}s, max_load_1m {max_load or 'n/a'}, "
      f"{status}) to {path}")
EOF
