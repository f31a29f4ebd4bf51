#!/bin/bash
# Round-3 queue 13: split-seed variance runs, chained AFTER queue11 drains
# (waits for queue11's PID to die OR its ALL-DONE marker). One TPU process at
# a time — same discipline as the earlier queues. Stage markers in
# /tmp/queue13.log (the caller redirects stdout there).
set -u
cd /root/repo

Q11PID=$(cat /tmp/queue11.pid 2>/dev/null || echo "")
while [ -n "$Q11PID" ] && kill -0 "$Q11PID" 2>/dev/null \
      && ! grep -q "ALL STAGES DONE" /tmp/queue11.log 2>/dev/null; do
  sleep 60
done
echo "queue13: queue11 drained, starting"

done_stage() {
  grep -hq "$1 exited rc=0" /tmp/queue13.log 2>/dev/null
}

run_stage() {  # name, log, cmd...
  local name=$1 logf=$2; shift 2
  if done_stage "$name"; then echo "queue13: $name already done, skipping"; return 0; fi
  bash scripts/tpu_gate2.sh 7200 || { echo "queue13: gate failed before $name"; return 1; }
  "$@" > "$logf" 2>&1
  echo "queue13: $name exited rc=$?"
}

run_stage seed43 /tmp/r3seed43.log python -u scripts/round3_split_seeds.py 43
run_stage seed44 /tmp/r3seed44.log python -u scripts/round3_split_seeds.py 44
echo "queue13: ALL STAGES DONE"
