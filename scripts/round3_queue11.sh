#!/bin/bash
# Round-3 queue, post-restart flavor: the container restart wiped
# /tmp and .bench_cache, so stage 0 rebuilds prerequisites
# (scripts/round3_bootstrap.py), then the four pending round-3 stages run in
# headline-first order. Stage markers live in /tmp/queue11.log (written by
# the caller redirecting this script's stdout there); completed stages are
# skipped on re-run.
set -u
cd /root/repo

done_stage() {
  grep -hq "$1 exited rc=0" /tmp/queue11.log 2>/dev/null
}

run_stage() {  # name, log, cmd...
  local name=$1 logf=$2; shift 2
  if done_stage "$name"; then echo "queue11: $name already done, skipping"; return 0; fi
  bash scripts/tpu_gate2.sh 7200 || { echo "queue11: gate failed before $name"; return 1; }
  "$@" > "$logf" 2>&1
  echo "queue11: $name exited rc=$?"
}

until bash scripts/tpu_gate2.sh 21600; do
  echo "queue11: gate window expired, re-arming"
done

run_stage bootstrap /tmp/r3boot.log python -u scripts/round3_bootstrap.py
run_stage push /tmp/r3push.log python -u scripts/round3_final_push.py
run_stage classification /tmp/r3cls.log python -u scripts/round3_classification.py
run_stage bench /tmp/bench_r3.log python -u bench.py
run_stage strict /tmp/r3strict.log python -u scripts/round3_strict_only.py
run_stage chunk_probe /tmp/r3chunk.log python -u scripts/bench_chunk_probe.py
echo "queue11: ALL STAGES DONE"
