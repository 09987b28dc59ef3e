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

if [ -z "$DETAILS" ]; then
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.Bench"
  DETAILS="BENCH_DETAILS.json"
fi

python3 - "$N" "$NOTE" "$(git rev-parse --short HEAD)" "$DETAILS" "$RUN_LABEL" <<'EOF'
import json, os, sys
n, note, head, details, run_label = sys.argv[1:6]
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
       "failed": d.get("failed"),
       "seq_queries": d["seq_queries"],
       "conc_queries": d.get("conc_queries")}
doc["runs"].append(run)
json.dump(doc, open(path, "w"), indent=1)
status = "FAILED QUERIES PRESENT" if d.get("failed") else "ok"
print(f"[bench_quote] appended {run['run']} (head {head}, "
      f"seq_wall {d['seq_wall']}s, {status}) to {path}")
EOF
