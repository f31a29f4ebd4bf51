#!/bin/bash
# Round-3 queue, relaunch flavor: same four stages as round3_queue9.sh but
# (a) the first gate re-arms in an endless loop, so a TPU recovery at any
#     hour fires the queue without a human in the loop, and
# (b) stages already completed by an earlier queue run are skipped (markers
#     are the "<stage> exited rc=0" echo lines in the queue logs).
set -u
cd /root/repo

done_stage() {
  grep -hq "$1 exited rc=0" /tmp/queue9.log /tmp/queue10.log 2>/dev/null
}

until bash scripts/tpu_gate2.sh 21600; do
  echo "queue10: gate window expired, re-arming"
done

if done_stage push; then echo "queue10: push already done, skipping"; else
  python -u scripts/round3_final_push.py > /tmp/r3push.log 2>&1
  echo "queue10: push exited rc=$?"
fi

bash scripts/tpu_gate2.sh 7200 || exit 1
if done_stage classification; then echo "queue10: classification already done, skipping"; else
  python -u scripts/round3_classification.py > /tmp/r3cls.log 2>&1
  echo "queue10: classification exited rc=$?"
fi

bash scripts/tpu_gate2.sh 7200 || exit 1
if done_stage bench; then echo "queue10: bench already done, skipping"; else
  python -u bench.py > /tmp/bench_r3.log 2>&1
  echo "queue10: bench exited rc=$?"
fi

bash scripts/tpu_gate2.sh 7200 || exit 1
if done_stage strict; then echo "queue10: strict already done, skipping"; else
  python -u scripts/round3_strict_only.py > /tmp/r3strict.log 2>&1
  echo "queue10: strict exited rc=$?"
fi

bash scripts/tpu_gate2.sh 7200 || exit 1
if done_stage chunk_probe; then echo "queue10: chunk_probe already done, skipping"; else
  python -u scripts/bench_chunk_probe.py > /tmp/r3chunk.log 2>&1
  echo "queue10: chunk_probe exited rc=$?"
fi
