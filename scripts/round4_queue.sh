#!/bin/bash
# Round-4 TPU queue: one stage at a time (single tunnel process discipline).
# Stage markers live in the log this script's stdout is redirected to
# (/tmp/queue_r4.log); rerunning the script skips completed stages.
#
#   boot    — rebuild wiped .bench_cache prerequisites (idempotent)
#   strict  — full-13-leg strict rerun            (VERDICT item 1)
#   seed43/44 — honest push at other split seeds  (VERDICT item 2)
#   compat  — full-13-leg compat rerun            (VERDICT item 3)
#   bench3  — 3x bench variance capture           (VERDICT item 4)
set -u
cd /root/repo

LOG=/tmp/queue_r4.log

done_stage() {
  grep -hq "r4queue: $1 exited rc=0" "$LOG" 2>/dev/null
}

run_stage() {  # name, logfile, cmd...
  local name=$1 logf=$2; shift 2
  if done_stage "$name"; then echo "r4queue: $name already done, skipping"; return 0; fi
  bash scripts/tpu_gate2.sh 7200 || { echo "r4queue: gate failed before $name"; return 1; }
  "$@" > "$logf" 2>&1
  local rc=$?
  echo "r4queue: $name exited rc=$rc"
  if [ $rc -ne 0 ]; then
    # one retry after a worker-recovery wait (observed crash pattern ~3 min)
    sleep 240
    bash scripts/tpu_gate2.sh 7200 || { echo "r4queue: gate failed before $name retry"; return 1; }
    "$@" >> "$logf" 2>&1
    rc=$?
    echo "r4queue: $name retry exited rc=$rc"
    [ $rc -eq 0 ] && echo "r4queue: $name exited rc=0"
  fi
  return $rc
}

run_stage boot   /tmp/r4boot.log   python -u scripts/round3_bootstrap.py
run_stage strict /tmp/r4strict.log python -u scripts/round4_strict.py
run_stage seed43 /tmp/r4seed43.log python -u scripts/round3_split_seeds.py 43
run_stage seed44 /tmp/r4seed44.log python -u scripts/round3_split_seeds.py 44
run_stage compat /tmp/r4compat.log python -u scripts/round4_compat.py
run_stage bench3 /tmp/r4bench3.log python -u scripts/round4_bench_variance.py 3
echo "r4queue: ALL STAGES DONE"
