#!/bin/bash
# TPU health gate: serial subprocess probes from a jax-free shell (this shell
# never registers with the axon pool, so probes don't compete with a parent
# claim). Exits 0 when a probe completes the first op; exits 1 after the
# deadline (default 45 min). Usage: bash scripts/tpu_gate.sh [deadline_s]
deadline=${1:-2700}
start=$(date +%s)
while true; do
  out=$(timeout 180 python -u -c "import jax, jax.numpy as jnp; assert float(jnp.ones((64,64)).sum())==4096.0; print('HEALTHY')" 2>&1 | tail -1)
  if [[ "$out" == HEALTHY ]]; then
    echo "tpu_gate: healthy after $(( $(date +%s) - start ))s"
    exit 0
  fi
  now=$(date +%s)
  if (( now - start > deadline )); then
    echo "tpu_gate: FAILED after $(( now - start ))s (last: $out)"
    exit 1
  fi
  echo "tpu_gate: not healthy yet (+$(( now - start ))s): ${out:0:120}"
  sleep 45
done
