#!/usr/bin/env bash
# Round-18 scaling re-measures: the five changed-body ops (VERDICT r17
# #1/#2) at the standard x8/x64/x128 decades, plus the directive-#3
# third-decade probe (x256) for the dedup family tail. Serial sbt
# invocations (build lock); scratch corpora are deleted at the end so the
# page-cache damage to later bench quotes is bounded (r17 lesson).
set -euo pipefail
cd "$(dirname "$0")/.."

run() { echo "=== $* ==="; sbt -batch "Test/runMain $*"; }

run graft.EventsScalingBench /root/testdata/sf0.1 1,8,64,128 ts_active_concurrency
run graft.RelationalScalingBench /root/testdata/sf0.1 1,8,64,128 agg_spearman
run graft.RelationalScalingBench /root/testdata/sf0.1 1,8,64,128 win_first_nth part:p_partkey
run graft.LlmScalingBench /root/testdata/sf0.1 1,8,64,128 dedup_simhash,dedup_simhash_pairs
run graft.LlmScalingBench /root/testdata/sf0.1 1,128,256 dedup_components,dedup_jaccard_pairs,dedup_containment_pairs

echo "=== cleaning scratch corpora ==="
rm -rf target/events_scaling target/relational_scaling* target/llm_scaling* target/documents_scaling*
echo "=== r18 scaling done ==="
