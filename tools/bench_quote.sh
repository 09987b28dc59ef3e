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
# Usage: tools/bench_quote.sh <round> [note]
#   e.g. tools/bench_quote.sh 11 "run 2, 4 min settle"
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:?usage: bench_quote.sh <round> [note]}"
NOTE="${2:-}"

SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench"

python3 - "$N" "$NOTE" "$(git rev-parse --short HEAD)" <<'EOF'
import json, os, sys
n, note, head = sys.argv[1], sys.argv[2], sys.argv[3]
d = json.load(open("BENCH_DETAILS.json"))
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
run = {"run": f"r{n}_run{len(doc['runs']) + 1}",
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
