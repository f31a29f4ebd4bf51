#!/bin/bash
# Round-4b TPU queue: runs AFTER round4_queue.sh completes (waits for its
# "ALL STAGES DONE" marker). One stage at a time — single tunnel discipline.
#
#   graphbl  — tuned A1 baseline on graph descriptors    (VERDICT item 6)
#   seed44   — third honest split seed                   (VERDICT item 2)
#   retune   — MACCS tuned rerun, repeated-CV selection  (VERDICT item 7)
#   curves   — morgan/rdkit learning curves              (VERDICT item 5)
#
# Ordered by value-per-hour if the round ends mid-chain: graphbl is cheap and
# closes the last partial §2 component; seed44 completes the >=3-split
# footing for the honest headline; retune/curves are claim-hygiene and
# artifact completeness.
set -u
cd /root/repo

MAIN_LOG=/tmp/queue_r4.log
LOG=/tmp/queue_r4b.log

# wait for the main queue to finish so we never share the tunnel; abort
# rather than fall through if it is somehow still alive at the cap
for _ in $(seq 1 2880); do
  if grep -q "r4queue: ALL STAGES DONE" "$MAIN_LOG" 2>/dev/null; then break; fi
  if ! kill -0 "$(cat /tmp/queue_r4.pid 2>/dev/null)" 2>/dev/null; then
    echo "r4b: main queue process gone without DONE marker; proceeding"
    break
  fi
  sleep 30
done
if ! grep -q "r4queue: ALL STAGES DONE" "$MAIN_LOG" 2>/dev/null \
    && kill -0 "$(cat /tmp/queue_r4.pid 2>/dev/null)" 2>/dev/null; then
  echo "r4b: main queue still running after wait cap; ABORTING (no tunnel sharing)"
  exit 1
fi

done_stage() {
  grep -hq "r4b: $1 exited rc=0" "$LOG" 2>/dev/null
}

run_stage() {  # name, logfile, cmd...
  local name=$1 logf=$2; shift 2
  if done_stage "$name"; then echo "r4b: $name already done, skipping"; return 0; fi
  bash scripts/tpu_gate2.sh 7200 || { echo "r4b: gate failed before $name"; return 1; }
  "$@" > "$logf" 2>&1
  local rc=$?
  echo "r4b: $name exited rc=$rc"
  if [ $rc -ne 0 ]; then
    sleep 240
    bash scripts/tpu_gate2.sh 7200 || { echo "r4b: gate failed before $name retry"; return 1; }
    "$@" >> "$logf" 2>&1
    rc=$?
    echo "r4b: $name retry exited rc=$rc"
    [ $rc -eq 0 ] && echo "r4b: $name exited rc=0"
  fi
  return $rc
}

run_stage graphbl /tmp/r4graphbl.log python -u scripts/round4_graph_baseline.py
run_stage seed44  /tmp/r4seed44.log  python -u scripts/round3_split_seeds.py 44
run_stage retune  /tmp/r4retune.log  python -u scripts/round4_retune_maccs.py
run_stage curves  /tmp/r4curves.log  python -u scripts/round4_curves.py
echo "r4b: ALL STAGES DONE"
