#!/bin/bash
# Round-3 queue (session 5, reordered): the worker outage has eaten ~2.5 h,
# so the order now front-loads the highest-value artifacts —
#   1. final honest push (headline R2 + per-seed meta diagnostics)
#   2. classification campaign (tuned all-10-models x 3 fps; VERDICT item #3)
#   3. bench validation (driver reruns it at round end; catch breakage early)
#   4. strict rerun with kernel/transfer legs (a good strict artifact is
#      already committed, this only enriches it)
# Patient gate (570 s probes). Run from a jax-free shell.
set -u
cd /root/repo
bash scripts/tpu_gate2.sh 21600 || exit 1
python -u scripts/round3_final_push.py > /tmp/r3push.log 2>&1
echo "queue9: push exited rc=$?"
bash scripts/tpu_gate2.sh 7200 || exit 1
python -u scripts/round3_classification.py > /tmp/r3cls.log 2>&1
echo "queue9: classification exited rc=$?"
bash scripts/tpu_gate2.sh 7200 || exit 1
python -u bench.py > /tmp/bench_r3.log 2>&1
echo "queue9: bench exited rc=$?"
bash scripts/tpu_gate2.sh 7200 || exit 1
python -u scripts/round3_strict_only.py > /tmp/r3strict.log 2>&1
echo "queue9: strict exited rc=$?"
