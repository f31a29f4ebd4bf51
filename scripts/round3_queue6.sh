#!/bin/bash
# Round-3 reordered queue (session 4): wait for the in-flight transfer
# campaign (strict rerun), then run the final regression push FIRST (headline
# artifact), then the classification campaign, then the screening bench.
# Run from a jax-free shell:  bash scripts/round3_queue6.sh CAMPAIGN_PID
set -u
cpid=${1:-0}
cd /root/repo
if (( cpid > 0 )); then
  echo "queue6: waiting for transfer campaign pid $cpid"
  while kill -0 "$cpid" 2>/dev/null; do sleep 30; done
  echo "queue6: transfer campaign exited"
fi
bash scripts/tpu_gate.sh 3600 || exit 1
python -u scripts/round3_final_push.py > /tmp/r3push.log 2>&1
echo "queue6: push exited rc=$?"
bash scripts/tpu_gate.sh 3600 || exit 1
python -u scripts/round3_classification.py > /tmp/r3cls.log 2>&1
echo "queue6: classification exited rc=$?"
bash scripts/tpu_gate.sh 3600 || exit 1
python -u bench.py > /tmp/bench_r3.log 2>&1
echo "queue6: bench exited rc=$?"
