"""MFU-vs-batched-axis-width probe (VERDICT r4 weak #8 / item 8).

The bench's MFU probe has sat at ~2.7% across rounds with the accepted
explanation "tiny-model regime". The repo's own utilization thesis says the
lever is widening the batched axes (folds × seeds × trials in one program).
This sweeps the vmapped fold axis of the flagship multimodal train step
(bench._train_mfu_probe) until HBM or compile time objects, and records the
MFU curve — one committed artifact replacing the standing shrug.

Writes results/MFU_PROBE.json.

Gate first: bash scripts/tpu_gate2.sh 7200 && python -u scripts/round5_mfu_probe.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

T0 = time.time()


def log(msg):
    print(f"[r5mfu +{time.time()-T0:6.0f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp

assert float(jnp.ones((64, 64)).sum()) == 4096.0
log(f"TPU healthy: {jax.devices()}")

import bench

curve = []
for folds in (10, 20, 40, 80, 160):
    t0 = time.time()
    try:
        r = bench._train_mfu_probe(folds=folds)
    except Exception as e:  # noqa: BLE001 — OOM/compile blowup ends the sweep
        log(f"folds={folds}: FAILED {type(e).__name__}: {str(e)[:200]}")
        curve.append({"folds": folds, "error": f"{type(e).__name__}: "
                      f"{str(e)[:300]}"})
        break
    r["folds"] = folds
    r["probe_wall_s"] = round(time.time() - t0, 1)
    curve.append(r)
    log(f"folds={folds}: step={r['train_step_s']*1e3:.1f}ms "
        f"mfu={r['train_mfu_vs_bf16_peak']:.4f} "
        f"({r['probe_wall_s']}s incl compile)")

ok_pts = [c for c in curve if "train_mfu_vs_bf16_peak" in c]
out = {
    "curve": curve,
    "baseline_folds10_mfu": next(
        (c["train_mfu_vs_bf16_peak"] for c in ok_pts if c["folds"] == 10),
        None),
    "best_mfu": max((c["train_mfu_vs_bf16_peak"] for c in ok_pts),
                    default=None),
    "best_folds": max(ok_pts, default=None,
                      key=lambda c: c["train_mfu_vs_bf16_peak"]),
    "note": "vmapped fold-axis sweep of the flagship multimodal train step "
            "(bench._train_mfu_probe); MFU = XLA cost-analysis FLOPs / step "
            "time / v5e bf16 peak",
}
with open("/root/repo/results/MFU_PROBE.json", "w") as f:
    json.dump(out, f, indent=1)
log(f"DONE best_mfu={out['best_mfu']}")
