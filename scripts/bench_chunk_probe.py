"""Probe screening chunk sizes on the live tunnel (run after bench.py).

With the round-3 featurizer at ~43k mol/s single-thread, the device path's
per-chunk dispatch cost is co-dominant in end-to-end screening; this measures
mol/s at several chunk sizes with the cached screening model so the bench
default (bench.py BENCH_CHUNK) can be set from data instead of guessed.
Each chunk size compiles one executable (same-shape chunks reuse it).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N_MOLS = int(os.environ.get("PROBE_N_MOLS", "100000"))
CHUNKS = [int(c) for c in os.environ.get(
    "PROBE_CHUNKS", "16384,32768,65536").split(",")]

import jax
import jax.numpy as jnp

assert float(jnp.ones((64, 64)).sum()) == 4096.0
print(f"TPU healthy: {jax.devices()}", flush=True)

from bbbp_tpu.pipelines.screen import ScreeningModel, screen
from bbbp_tpu.data import load_b3db_classification

model = ScreeningModel.load("/root/repo/.bench_cache/screening_model.pkl")
smis = [s for s in load_b3db_classification().smiles if len(s) >= 8]
smiles = [smis[i % len(smis)] for i in range(N_MOLS)]

rows = []
for chunk in CHUNKS:
    warm = [(s, "w") for s in smiles[:chunk]]
    screen(model, iter(warm), out_csv=None, chunk_size=chunk)  # compile
    stream = ((s, f"P{i:08d}") for i, s in enumerate(smiles))
    t0 = time.time()
    stats = screen(model, stream, out_csv=None, chunk_size=chunk)
    rows.append({"chunk": chunk, "mol_per_s": round(stats.mol_per_s, 1),
                 "featurize_s": round(stats.featurize_s, 2),
                 "device_s": round(stats.device_s, 2),
                 "wall_s": round(time.time() - t0, 2)})
    print(json.dumps(rows[-1]), flush=True)

with open("/root/repo/results/CHUNK_PROBE.json", "w") as f:
    json.dump({"n_mols": N_MOLS, "rows": rows}, f, indent=1)
print("CHUNK PROBE DONE", flush=True)
