#!/bin/bash
# Round-16 validation chain (serialized: sbt locks target).
set -x
cd /root/repo
echo "=== STEP test ===" && sbt -batch test > /tmp/r16_test.log 2>&1 || { echo "CHAIN FAIL test"; exit 1; }
echo "=== STEP verify ===" && rm -rf /tmp/verify16 && sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify16" > /tmp/r16_verify.log 2>&1 || { echo "CHAIN FAIL verify"; exit 1; }
python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify16 > /tmp/r16_compare.log 2>&1 || { echo "CHAIN FAIL compare"; exit 1; }
echo "=== STEP plandump ===" && sbt -batch "runMain graft.PlanDump" > /tmp/r16_plandump.log 2>&1 || { echo "CHAIN FAIL plandump"; exit 1; }
echo "=== STEP bench ===" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r16_bench.log 2>&1 || { echo "CHAIN FAIL bench"; exit 1; }
echo "CHAIN DONE"
