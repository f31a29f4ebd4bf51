#!/bin/bash
# Round-3 recovery queue (session 5): queue7's 90-min gate expired during an
# unusually long worker outage. Same stages, patient gate (570 s probes, 4 h
# deadline). Run from a jax-free shell.
set -u
cd /root/repo
bash scripts/tpu_gate2.sh 14400 || exit 1
python -u scripts/round3_strict_only.py > /tmp/r3strict.log 2>&1
echo "queue8: strict exited rc=$?"
bash scripts/tpu_gate2.sh 7200 || exit 1
python -u scripts/round3_final_push.py > /tmp/r3push.log 2>&1
echo "queue8: push exited rc=$?"
bash scripts/tpu_gate2.sh 7200 || exit 1
python -u bench.py > /tmp/bench_r3.log 2>&1
echo "queue8: bench exited rc=$?"
bash scripts/tpu_gate2.sh 7200 || exit 1
python -u scripts/round3_classification.py > /tmp/r3cls.log 2>&1
echo "queue8: classification exited rc=$?"
