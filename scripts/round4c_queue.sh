#!/bin/bash
# Round-4c TPU queue: runs AFTER round4b_queue.sh completes.
#   fvprobe — vmapped forest-search probe (worker health + wall-clock)
# (swapped with the 3x-MLM estimate: the probe is cheaper and informs the
# default of the matmul forest engine; the MLM estimate is the most
# speculative lever and runs last, in round4d)
set -u
cd /root/repo

PREV_LOG=/tmp/queue_r4b.log
LOG=/tmp/queue_r4c.log

for _ in $(seq 1 2880); do
  if grep -q "r4b: ALL STAGES DONE" "$PREV_LOG" 2>/dev/null; then break; fi
  if ! kill -0 "$(cat /tmp/queue_r4b.pid 2>/dev/null)" 2>/dev/null; then
    echo "r4c: r4b queue process gone without DONE marker; proceeding"
    break
  fi
  sleep 30
done
if ! grep -q "r4b: ALL STAGES DONE" "$PREV_LOG" 2>/dev/null \
    && kill -0 "$(cat /tmp/queue_r4b.pid 2>/dev/null)" 2>/dev/null; then
  echo "r4c: round4b queue still running after wait cap; ABORTING (no tunnel sharing)"
  exit 1
fi

done_stage() {
  grep -hq "r4c: $1 exited rc=0" "$LOG" 2>/dev/null
}

run_stage() {  # name, logfile, cmd...
  local name=$1 logf=$2; shift 2
  if done_stage "$name"; then echo "r4c: $name already done, skipping"; return 0; fi
  bash scripts/tpu_gate2.sh 7200 || { echo "r4c: gate failed before $name"; return 1; }
  "$@" > "$logf" 2>&1
  local rc=$?
  echo "r4c: $name exited rc=$rc"
  if [ $rc -ne 0 ]; then
    sleep 240
    bash scripts/tpu_gate2.sh 7200 || { echo "r4c: gate failed before $name retry"; return 1; }
    "$@" >> "$logf" 2>&1
    rc=$?
    echo "r4c: $name retry exited rc=$rc"
    [ $rc -eq 0 ] && echo "r4c: $name exited rc=0"
  fi
  return $rc
}

run_stage fvprobe /tmp/r4fvprobe.log python -u scripts/round4_forest_vmap_probe.py
echo "r4c: ALL STAGES DONE"
