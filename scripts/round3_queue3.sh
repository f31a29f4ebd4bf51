#!/bin/bash
# Waits for the transfer+classification queue (round3_queue2.sh) to exit,
# then runs the final regression push (kernel_n_folds + nn_split_mix).
# Usage: bash scripts/round3_queue3.sh QUEUE2_PID
set -u
qpid=${1:-0}
cd /root/repo
if (( qpid > 0 )); then
  echo "queue3: waiting for queue2 pid $qpid"
  while kill -0 "$qpid" 2>/dev/null; do sleep 60; done
  echo "queue3: queue2 exited"
fi
bash scripts/tpu_gate.sh 3600 || exit 1
python -u scripts/round3_final_push.py > /tmp/r3push.log 2>&1
echo "queue3: push exited rc=$?"
