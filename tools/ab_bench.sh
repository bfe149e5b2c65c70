#!/bin/bash
# A/B bench for the r13->r14 ns_* regression cluster (VERDICT r14 #2).
# Runs the 8 flagged queries on the r13 codebase (worktree) and the
# current HEAD back-to-back, interleaved A-B-B-A to cancel host drift,
# min-of-5 passes inside each run. Usage: ab_bench.sh <out.log>
set -u
OUT=${1:-/tmp/ab_bench.log}
CLUSTER="ns_scan_plan,ns_list_v2_page,ns_key_versions,ns_common_prefixes,q_approx_distinct,dd_cluster_sizes,ns_acl_effective,ns_fso_du"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_PASSES=5
export SPARK_GRAFT_BENCH_ONLY=$CLUSTER
run() { # $1 = dir, $2 = tag
  local detail="/tmp/ab_${2}.json"
  ( cd "$1" && SPARK_GRAFT_BENCH_DETAIL="$detail" \
      sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' ) \
    | sed "s/^/[$2] /" >> "$OUT"
}
: > "$OUT"
echo "[ab] order A(r13) B(r14) B(r14) A(r13)" >> "$OUT"
run /tmp/graft_r13 r13_run1
run /root/repo   r14_run1
run /root/repo   r14_run2
run /tmp/graft_r13 r13_run2
echo "[ab] done" >> "$OUT"
