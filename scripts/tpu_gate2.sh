#!/bin/bash
# Patient TPU health gate for long worker outages: 570 s per probe (first op
# after a worker recovery can take minutes — a 180 s timeout can kill a probe
# that was about to succeed), default 4 h deadline.
# Usage: bash scripts/tpu_gate2.sh [deadline_s]
deadline=${1:-14400}
start=$(date +%s)
while true; do
  out=$(timeout 570 python -u -c "import jax, jax.numpy as jnp; assert float(jnp.ones((64,64)).sum())==4096.0; print('HEALTHY')" 2>&1 | tail -1)
  if [[ "$out" == HEALTHY ]]; then
    echo "tpu_gate2: healthy after $(( $(date +%s) - start ))s"
    exit 0
  fi
  now=$(date +%s)
  if (( now - start > deadline )); then
    echo "tpu_gate2: FAILED after $(( now - start ))s (last: $out)"
    exit 1
  fi
  echo "tpu_gate2: not healthy yet (+$(( now - start ))s): ${out:0:120}"
  sleep 90
done
