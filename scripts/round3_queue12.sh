#!/bin/bash
# Retry queue: runs after round3_queue11.sh finishes and re-runs any stage
# that never logged "exited rc=0" (e.g. the push run killed by a mid-run TPU
# worker crash). Markers are shared across /tmp/queue11.log + /tmp/queue12.log.
set -u
cd /root/repo

done_stage() {
  grep -hq "$1 exited rc=0" /tmp/queue11.log /tmp/queue12.log 2>/dev/null
}

run_stage() {  # name, log, cmd...
  local name=$1 logf=$2; shift 2
  if done_stage "$name"; then echo "queue12: $name already done, skipping"; return 0; fi
  bash scripts/tpu_gate2.sh 14400 || { echo "queue12: gate failed before $name"; return 1; }
  "$@" >> "$logf" 2>&1
  echo "queue12: $name exited rc=$?"
}

run_stage push /tmp/r3push.log python -u scripts/round3_final_push.py
run_stage classification /tmp/r3cls.log python -u scripts/round3_classification.py
run_stage bench /tmp/bench_r3.log python -u bench.py
run_stage strict /tmp/r3strict.log python -u scripts/round3_strict_only.py
run_stage chunk_probe /tmp/r3chunk.log python -u scripts/bench_chunk_probe.py
# second retry round for anything a worker crash killed above
run_stage push /tmp/r3push.log python -u scripts/round3_final_push.py
run_stage classification /tmp/r3cls.log python -u scripts/round3_classification.py
run_stage bench /tmp/bench_r3.log python -u bench.py
run_stage strict /tmp/r3strict.log python -u scripts/round3_strict_only.py
run_stage chunk_probe /tmp/r3chunk.log python -u scripts/bench_chunk_probe.py
echo "queue12: ALL STAGES DONE"
