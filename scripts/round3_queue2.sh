#!/bin/bash
# Round-3 relaunch queue (session 3): wait for the in-flight followup PID,
# then gate -> transfer campaign -> gate -> classification campaign.
# Run from a jax-free shell:  bash scripts/round3_queue2.sh FOLLOWUP_PID
set -u
fpid=${1:-0}
cd /root/repo
if (( fpid > 0 )); then
  echo "queue2: waiting for followup pid $fpid"
  while kill -0 "$fpid" 2>/dev/null; do sleep 30; done
  echo "queue2: followup exited"
fi
bash scripts/tpu_gate.sh 3600 || exit 1
python -u scripts/round3_transfer_campaign.py > /tmp/r3tc2.log 2>&1
echo "queue2: transfer campaign exited rc=$?"
bash scripts/tpu_gate.sh 3600 || exit 1
python -u scripts/round3_classification.py > /tmp/r3cls.log 2>&1
echo "queue2: classification campaign exited rc=$?"
