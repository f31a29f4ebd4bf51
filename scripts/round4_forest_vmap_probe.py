"""TPU probe for the vmapped (trial × fold) forest search
(batched_search._forest_cv_vmapped, scatter-free 'matmul' histogram engine).

Validates the two things the NOTE in _forest_cv documents as platform risks
before the default can flip on:
  1. worker health — the historical cumulative-scatter fault corrupts the
     TPU worker so the NEXT program crashes; the matmul engine has zero
     scatters, but that's a theory until exercised at real sizes. After the
     vmapped run this probe runs fresh transfers + another program and a
     sequential-engine fit to prove the worker survived.
  2. wall-clock — the matmul engine spends O(B·nodes)× more FLOPs; it only
     wins if lane-batching + single-launch amortization beat 250 sequential
     launched fits over the tunnel. Measured on the real retune search
     shapes (PCA30 SMOTETomek matrix, the 3 static groups of the zoo).

Writes results/FOREST_VMAP_PROBE.json. Flip batched_search.FOREST_VMAP's
default only on ok=true + speedup.

Gate first: bash scripts/tpu_gate2.sh 7200 && python -u scripts/round4_forest_vmap_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(msg):
    print(f"[r4fv +{time.time()-T0:7.0f}s] {msg}", flush=True)


# Crash-aware retry state: a vmapped-fit worker crash is itself the probe's
# finding (worker health is risk #1 in the header). Attempt 1 runs the
# default lane block; after a crash the next attempt (fresh process via the
# queue supervisor) tries a small block; a second crash writes the final
# negative artifact so the stage LANDS instead of failing rc=1 three times.
STATE_PATH = "/root/repo/results/FVPROBE_STATE.json"
RESULT_PATH = "/root/repo/results/FOREST_VMAP_PROBE.json"
state = {"crashes": []}
if os.path.exists(STATE_PATH):
    with open(STATE_PATH) as f:
        state = json.load(f)
LANE_BLOCKS = [60, 12]
lane_block = LANE_BLOCKS[min(len(state["crashes"]), len(LANE_BLOCKS) - 1)]


def record_crash(err, out):
    state["crashes"].append({"lane_block": lane_block, "error": str(err)[:500],
                             "elapsed_s": time.time() - T0})
    with open(STATE_PATH, "w") as f:
        json.dump(state, f, indent=1)
    if len(state["crashes"]) >= 2:
        out.update({
            "ok": False,
            "reason": "TPU worker crashed during the vmapped fit at lane "
                      f"blocks {[c['lane_block'] for c in state['crashes']]} "
                      "— the vmapped (trial x fold) forest axis is not safe "
                      "on this platform even with the scatter-free matmul "
                      "engine; BBBP_FOREST_VMAP stays default-off",
            "crashes": state["crashes"],
        })
        with open(RESULT_PATH, "w") as f:
            json.dump(out, f, indent=1)
        log(f"DONE ok=False (worker crashed {len(state['crashes'])}x; "
            "negative artifact written)")
        sys.exit(0)
    log(f"worker crashed at lane_block={lane_block}; state recorded, "
        "exiting 1 for a fresh-process retry at a smaller block")
    sys.exit(1)


import jax
import jax.numpy as jnp

assert float(jnp.ones((64, 64)).sum()) == 4096.0
log(f"TPU healthy: {jax.devices()}")

from bbbp_tpu.chem.featurize import fingerprints
from bbbp_tpu.data import load_b3db_classification
from bbbp_tpu.ops import PCA, StandardScaler
from bbbp_tpu.ops.resample import smote_tomek
from bbbp_tpu.train.batched_search import _forest_cv, _forest_cv_vmapped
from bbbp_tpu.train.search import stratified_kfold_indices

# the retune run's actual search matrix: maccs -> scale -> PCA30 -> SMOTETomek
data = load_b3db_classification()
fp = fingerprints(data.smiles, kind="maccs", workers=1)
x = fp.features[fp.ok_mask]
y = data.labels[fp.ok_mask]
x = np.asarray(StandardScaler().fit_transform(x))
x = np.asarray(PCA(30).fit_transform(x))
xr, yr = smote_tomek(x, y, seed=42)
rng = np.random.default_rng(42)
perm = rng.permutation(len(yr))
tr = perm[int(len(yr) * 0.2):]
x_tr, y_tr = xr[tr], yr[tr]
log(f"search matrix {x_tr.shape}")

folds = stratified_kfold_indices(y_tr, 3, 42)
# 9 trials per static group — the zoo's three forest statics (gb/xgb share)
rng = np.random.default_rng(0)
params = []
for _ in range(9):
    params.append({"n_estimators": 300, "max_depth": 6,
                   "learning_rate": float(10 ** rng.uniform(-1.7, -0.5)),
                   "subsample": float(rng.uniform(0.6, 1.0))})
for _ in range(9):
    params.append({"rf": True, "n_estimators": 300, "max_depth": 10,
                   "colsample": float(rng.uniform(0.3, 1.0)),
                   "reg_lambda": 1e-6})
for _ in range(9):
    params.append({"oblivious": True, "n_estimators": 300, "max_depth": 6,
                   "learning_rate": float(10 ** rng.uniform(-1.7, -0.5)),
                   "reg_lambda": float(10 ** rng.uniform(-0.3, 1.0))})

out = {"n": int(x_tr.shape[0]), "F": int(x_tr.shape[1]),
       "trials": len(params), "folds": len(folds),
       "lane_block": lane_block, "prior_crashes": state["crashes"]}

import bbbp_tpu.train.batched_search as _bs
_bs.FOREST_VMAP_LANE_BLOCK = lane_block

t0 = time.time()
try:
    a_v, _, _ = _forest_cv_vmapped(x_tr, y_tr, folds, params, classify=True,
                                   verbose=True)
    jax.block_until_ready(jnp.zeros(()))
except jax.errors.JaxRuntimeError as e:
    record_crash(e, out)
out["vmapped_s_cold"] = time.time() - t0
log(f"vmapped cold: {out['vmapped_s_cold']:.1f}s best acc={a_v.max():.4f}")

# worker health: fresh transfers + a new program + a scatter-engine fit
assert float(jnp.ones((256, 256)).sum()) == 65536.0
assert float(jnp.linalg.norm(jnp.eye(128))) > 0
t0 = time.time()
try:
    a_v2, _, _ = _forest_cv_vmapped(x_tr, y_tr, folds, params, classify=True)
    jax.block_until_ready(jnp.zeros(()))
except jax.errors.JaxRuntimeError as e:
    record_crash(e, out)
out["vmapped_s_warm"] = time.time() - t0
log(f"vmapped warm: {out['vmapped_s_warm']:.1f}s (worker survived)")

t0 = time.time()
a_s, _, _ = _forest_cv(x_tr, y_tr, folds, params, classify=True,
                       verbose=False)
out["sequential_s"] = time.time() - t0
log(f"sequential: {out['sequential_s']:.1f}s best acc={a_s.max():.4f}")

out["max_abs_acc_diff"] = float(np.abs(a_v - a_s).max())
out["speedup_warm"] = out["sequential_s"] / max(out["vmapped_s_warm"], 1e-9)
out["ok"] = bool(out["max_abs_acc_diff"] < 0.03)
with open("/root/repo/results/FOREST_VMAP_PROBE.json", "w") as f:
    json.dump(out, f, indent=1)
log(f"DONE ok={out['ok']} speedup_warm={out['speedup_warm']:.1f}x "
    f"acc_diff={out['max_abs_acc_diff']:.4f}")
