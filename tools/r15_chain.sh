#!/bin/bash
# Round-15 validation chain (serialized: sbt locks target).
set -x
cd /root/repo
echo "=== STEP test ===" && sbt -batch test > /tmp/r15_test.log 2>&1 || { echo "CHAIN FAIL test"; exit 1; }
echo "=== STEP verify ===" && rm -rf /tmp/verify15 && sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify15" > /tmp/r15_verify.log 2>&1 || { echo "CHAIN FAIL verify"; exit 1; }
python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify15 > /tmp/r15_compare.log 2>&1 || { echo "CHAIN FAIL compare"; exit 1; }
echo "=== STEP plandump ===" && sbt -batch "runMain graft.PlanDump" > /tmp/r15_plandump.log 2>&1 || { echo "CHAIN FAIL plandump"; exit 1; }
echo "=== STEP scalesmoke ===" && sbt -batch "runMain graft.ScaleSmoke" > /tmp/r15_scale.log 2>&1 || { echo "CHAIN FAIL scalesmoke"; exit 1; }
echo "=== STEP bench ===" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r15_bench.log 2>&1 || { echo "CHAIN FAIL bench"; exit 1; }
echo "CHAIN DONE"
