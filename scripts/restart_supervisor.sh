#!/bin/bash
# One-shot queue stage: replace the RUNNING supervisor with a fresh process
# so it picks up the failed-stage-starvation fix (commit 0437655) without
# losing the queue. Safe at a stage boundary only — which is exactly where
# a stage command runs.
#
# Sequence: this stage exits 0 immediately (supervisor records 'done' in
# ms); a detached helper kills the old supervisor 8 s later — inside the
# next stage's TPU gate, which never completes in <8 s, so no stage process
# is ever orphaned — then spawns the new supervisor, which skips every
# 'done'/'failed' stage in the ledger and continues the queue as the single
# tunnel owner. MARK guards a re-pick if the kill ever beat the ledger
# write (sub-ms race): the second pick is a no-op that records 'done'.
set -u
cd /root/repo
MARK=results/queue_logs/.sup_restarted_r5
if [ -f "$MARK" ]; then
  echo "supervisor already restarted; no-op"
  exit 0
fi
touch "$MARK"
SUP_PID=$(python -c "import json; print(json.load(open('results/queue_logs/heartbeat.txt'))['pid'])")
echo "scheduling restart of supervisor pid=$SUP_PID"
setsid nohup bash -c "
  sleep 8
  kill $SUP_PID 2>/dev/null
  sleep 4
  cd /root/repo
  nohup python -u scripts/queue_supervisor.py >> results/queue_logs/supervisor.log 2>&1 &
" >/dev/null 2>&1 &
exit 0
