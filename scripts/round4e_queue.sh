#!/bin/bash
# Round-4e TPU queue: runs AFTER round4d_queue.sh completes.
#   seed44 — second honest split-seed run (deferred from the main queue so
#            the higher-priority compat/bench/4b/4c/4d stages run first)
set -u
cd /root/repo

PREV_LOG=/tmp/queue_r4d.log
LOG=/tmp/queue_r4e.log

for _ in $(seq 1 2880); do
  if grep -q "r4d: ALL STAGES DONE" "$PREV_LOG" 2>/dev/null; then break; fi
  if ! kill -0 "$(cat /tmp/queue_r4d.pid 2>/dev/null)" 2>/dev/null; then
    echo "r4e: r4d queue process gone without DONE marker; proceeding"
    break
  fi
  sleep 30
done
if ! grep -q "r4d: ALL STAGES DONE" "$PREV_LOG" 2>/dev/null \
    && kill -0 "$(cat /tmp/queue_r4d.pid 2>/dev/null)" 2>/dev/null; then
  echo "r4e: round4d queue still running after wait cap; ABORTING (no tunnel sharing)"
  exit 1
fi

done_stage() {
  grep -hq "r4e: $1 exited rc=0" "$LOG" 2>/dev/null
}

run_stage() {  # name, logfile, cmd...
  local name=$1 logf=$2; shift 2
  if done_stage "$name"; then echo "r4e: $name already done, skipping"; return 0; fi
  bash scripts/tpu_gate2.sh 7200 || { echo "r4e: gate failed before $name"; return 1; }
  "$@" > "$logf" 2>&1
  local rc=$?
  echo "r4e: $name exited rc=$rc"
  if [ $rc -ne 0 ]; then
    sleep 240
    bash scripts/tpu_gate2.sh 7200 || { echo "r4e: gate failed before $name retry"; return 1; }
    "$@" >> "$logf" 2>&1
    rc=$?
    echo "r4e: $name retry exited rc=$rc"
    [ $rc -eq 0 ] && echo "r4e: $name exited rc=0"
  fi
  return $rc
}

run_stage seed44 /tmp/r4seed44.log python -u scripts/round3_split_seeds.py 44
echo "r4e: ALL STAGES DONE"
