"""Device-path decomposition probe for the screening pipeline (VERDICT r4
weak #4 / item 5: wall/featurize = 1.65 vs the ≤1.15 overlap target; device_s
5.2 of 6.5 s wall — per-chunk dispatch/transfer over the tunnel dominates).

Measures, on the bench feedstock (200k real B3DB molecules):
  1. pure featurize  — C++ packed fingerprints, no device work at all;
  2. pure device     — all chunks pre-featurized in RAM, then the
     transfer+dispatch+fetch loop alone (the floor the pipeline must hide);
  3. full screen()   — dispatch_workers × chunk_size grid, wall / featurize
     / device per cell (the round-5 multi-dispatcher path).

The done criterion: some cell reaches wall ≤ 1.15 × max(pure_featurize,
pure_device); otherwise the artifact documents the tunnel RPC floor.

Writes results/DEVPATH_PROBE.json.

Gate first: bash scripts/tpu_gate2.sh 7200 && python -u scripts/round5_devpath_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()
CACHE = "/root/repo/.bench_cache"
N_MOLS = int(os.environ.get("PROBE_N_MOLS", "200000"))


def log(msg):
    print(f"[r5dp +{time.time()-T0:6.0f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp

assert float(jnp.ones((64, 64)).sum()) == 4096.0
log(f"TPU healthy: {jax.devices()}")

import bench
from bbbp_tpu.native import bindings as nb
from bbbp_tpu.pipelines.screen import (ScreeningModel,
                                       _make_packed_device_fn, screen)

if not nb.available():
    from bbbp_tpu.native.build import build

    build(verbose=False)

model = ScreeningModel.load(os.path.join(CACHE, "screening_model.pkl"))
smiles = bench._real_feedstock(N_MOLS)
out = {"n_molecules": N_MOLS}

# ---- 1. pure featurize ------------------------------------------------------
t0 = time.time()
CH = 16384
packed_chunks = []
for s in range(0, N_MOLS, CH):
    feats, _bad = nb.fingerprints_packed(smiles[s: s + CH], model.fp_kind,
                                         model.n_bits)
    packed_chunks.append(feats)
pure_feat = time.time() - t0
out["pure_featurize_s"] = round(pure_feat, 3)
log(f"pure featurize: {pure_feat:.2f}s ({N_MOLS/pure_feat:.0f} mol/s)")

# pad the tail chunk once so every dispatch reuses ONE executable
if packed_chunks[-1].shape[0] < CH:
    tail = packed_chunks[-1]
    packed_chunks[-1] = np.concatenate(
        [tail, np.zeros((CH - tail.shape[0],) + tail.shape[1:], tail.dtype)])

# ---- 2. pure device (transfer + dispatch + fetch, featurize-free) ----------
run = _make_packed_device_fn(model)
# warmup / compile
np.asarray(run(jnp.asarray(packed_chunks[0])))
for trial in range(2):
    t0 = time.time()
    futs = [run(jnp.asarray(c)) for c in packed_chunks]
    probas = [np.asarray(f) for f in futs]
    pure_dev = time.time() - t0
    log(f"pure device trial {trial}: {pure_dev:.2f}s "
        f"({len(packed_chunks)} chunks, "
        f"{pure_dev/len(packed_chunks)*1e3:.0f} ms/chunk)")
out["pure_device_s"] = round(pure_dev, 3)
out["pure_device_ms_per_chunk"] = round(pure_dev / len(packed_chunks) * 1e3, 1)

# ---- 3. full pipeline grid --------------------------------------------------
grid = []
for chunk in (16384, 32768):
    # warmup compile at this chunk size
    warm = [(s, "w") for s in smiles[:chunk]]
    screen(model, iter(warm), out_csv=None, chunk_size=chunk)
    for workers in (1, 2, 3, 4):
        stream = ((s, f"M{i:09d}") for i, s in enumerate(smiles))
        st = screen(model, stream, out_csv=None, chunk_size=chunk,
                    dispatch_workers=workers)
        cell = {"chunk_size": chunk, "dispatch_workers": workers,
                "wall_s": round(st.wall_s, 3),
                "featurize_s": round(st.featurize_s, 3),
                "device_s": round(st.device_s, 3),
                "mol_per_s": round(st.mol_per_s, 0),
                "wall_over_featurize": round(
                    st.wall_s / max(st.featurize_s, 1e-9), 3)}
        grid.append(cell)
        log(f"chunk={chunk} disp={workers}: wall={st.wall_s:.2f}s "
            f"feat={st.featurize_s:.2f}s dev={st.device_s:.2f}s "
            f"({st.mol_per_s:.0f} mol/s)")
out["grid"] = grid

best = min(grid, key=lambda c: c["wall_s"])
floor = max(pure_feat, pure_dev)
out["best_cell"] = best
out["overlap_floor_s"] = round(floor, 3)
out["best_wall_over_floor"] = round(best["wall_s"] / floor, 3)
out["target_met"] = bool(best["wall_s"] <= 1.15 * floor)
with open("/root/repo/results/DEVPATH_PROBE.json", "w") as f:
    json.dump(out, f, indent=1)
log(f"DONE best={best} wall/floor={out['best_wall_over_floor']} "
    f"target_met={out['target_met']}")
