#!/bin/bash
# Round-3 recovery queue (session 4): the transfer campaign wedged mid-strict
# (fold 4/10 tree legs, 95 min no output, zero client CPU). Order: gate ->
# strict-only rerun -> final regression push -> bench (3x featurizer) ->
# classification campaign. Run from a jax-free shell.
set -u
cd /root/repo
bash scripts/tpu_gate.sh 5400 || exit 1
python -u scripts/round3_strict_only.py > /tmp/r3strict.log 2>&1
echo "queue7: strict exited rc=$?"
bash scripts/tpu_gate.sh 5400 || exit 1
python -u scripts/round3_final_push.py > /tmp/r3push.log 2>&1
echo "queue7: push exited rc=$?"
bash scripts/tpu_gate.sh 5400 || exit 1
python -u bench.py > /tmp/bench_r3.log 2>&1
echo "queue7: bench exited rc=$?"
bash scripts/tpu_gate.sh 5400 || exit 1
python -u scripts/round3_classification.py > /tmp/r3cls.log 2>&1
echo "queue7: classification exited rc=$?"
