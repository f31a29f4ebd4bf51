#!/bin/bash
# Round-4d TPU queue: runs AFTER round4c_queue.sh completes.
#   mlm — 3x-corpus MLM estimate for the SMILES leg (VERDICT item 10)
set -u
cd /root/repo

PREV_LOG=/tmp/queue_r4c.log
LOG=/tmp/queue_r4d.log

for _ in $(seq 1 2880); do
  if grep -q "r4c: ALL STAGES DONE" "$PREV_LOG" 2>/dev/null; then break; fi
  if ! kill -0 "$(cat /tmp/queue_r4c.pid 2>/dev/null)" 2>/dev/null; then
    echo "r4d: r4c queue process gone without DONE marker; proceeding"
    break
  fi
  sleep 30
done
if ! grep -q "r4c: ALL STAGES DONE" "$PREV_LOG" 2>/dev/null \
    && kill -0 "$(cat /tmp/queue_r4c.pid 2>/dev/null)" 2>/dev/null; then
  echo "r4d: round4c queue still running after wait cap; ABORTING (no tunnel sharing)"
  exit 1
fi

done_stage() {
  grep -hq "r4d: $1 exited rc=0" "$LOG" 2>/dev/null
}

run_stage() {  # name, logfile, cmd...
  local name=$1 logf=$2; shift 2
  if done_stage "$name"; then echo "r4d: $name already done, skipping"; return 0; fi
  bash scripts/tpu_gate2.sh 7200 || { echo "r4d: gate failed before $name"; return 1; }
  "$@" > "$logf" 2>&1
  local rc=$?
  echo "r4d: $name exited rc=$rc"
  if [ $rc -ne 0 ]; then
    sleep 240
    bash scripts/tpu_gate2.sh 7200 || { echo "r4d: gate failed before $name retry"; return 1; }
    "$@" >> "$logf" 2>&1
    rc=$?
    echo "r4d: $name retry exited rc=$rc"
    [ $rc -eq 0 ] && echo "r4d: $name exited rc=0"
  fi
  return $rc
}

run_stage mlm /tmp/r4mlm.log python -u scripts/round4_mlm_scale.py
echo "r4d: ALL STAGES DONE"
