#!/bin/bash
# Round-13 chain 2 (post-IVF-compaction): test -> full Verify sf0.01 + compare
# -> ScaleSmoke -> Bench sf0.1. PlanDump unchanged since chain 1.
set -x
cd /root/repo
echo "=== STEP test ===" && sbt -batch test > /tmp/r13b_test.log 2>&1 || { echo "CHAIN FAIL test"; exit 1; }
echo "=== STEP verify ===" && rm -rf /tmp/verify13b && sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify13b" > /tmp/r13b_verify.log 2>&1 || { echo "CHAIN FAIL verify"; exit 1; }
python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify13b > /tmp/r13b_compare.log 2>&1 || { echo "CHAIN FAIL compare"; exit 1; }
echo "=== STEP scalesmoke ===" && sbt -batch "runMain graft.ScaleSmoke" > /tmp/r13b_scale.log 2>&1 || { echo "CHAIN FAIL scalesmoke"; exit 1; }
echo "=== STEP bench ===" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r13b_bench.log 2>&1 || { echo "CHAIN FAIL bench"; exit 1; }
echo "CHAIN DONE"
