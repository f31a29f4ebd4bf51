"""Screening scaling study (VERDICT r2 item #5): measure — don't assert —
how throughput scales with host featurizer threads and with device shards.

Axes:
  A. C++ featurizer threads 1/2/4 on the REAL host (this image has nproc
     cores; the table shows what thread scaling actually buys here).
  B. Device path on an 8-shard CPU-sim mesh vs 1 device (run separately
     under JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
     with --mesh), isolating the molecule-axis shard_map scaling from host
     featurization.

Writes results/SCREEN_SCALING.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def real_smiles(n):
    from bbbp_tpu.data import load_b3db_classification

    smis = [s for s in load_b3db_classification().smiles if len(s) >= 8]
    return [smis[i % len(smis)] for i in range(n)]


def featurizer_thread_axis(smiles, threads_list=(1, 2, 4)):
    from bbbp_tpu.native import bindings as nb

    rows = []
    for t in threads_list:
        t0 = time.time()
        feats, bad = nb.fingerprints_packed(smiles, "morgan", threads=t)
        dt = time.time() - t0
        rows.append({"threads": t, "wall_s": round(dt, 2),
                     "mol_per_s": round(len(smiles) / dt, 1)})
        print(f"threads={t}: {len(smiles)/dt:,.0f} mol/s "
              f"({dt:.1f}s)", flush=True)
    return rows


def mesh_device_axis(n_mols):
    """Device-only inference throughput, 1 device vs the full mesh, on
    synthetic packed fingerprints (isolates the shard_map molecule-axis
    scaling from host featurization)."""
    # the image's sitecustomize pins the axon TPU backend in EVERY python
    # process — a shell-level JAX_PLATFORMS=cpu is overridden at import, so
    # force the simulated-CPU mesh the same way tests/conftest.py does
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", "mesh axis must run CPU-sim"

    from bbbp_tpu.pipelines.screen import ScreeningModel, _make_packed_device_fn

    model = ScreeningModel.load("/root/repo/.bench_cache/screening_model.pkl")
    rng = np.random.default_rng(0)
    chunk = 16384
    packed = rng.integers(0, 2**32, size=(chunk, model.n_bits // 32),
                          dtype=np.uint32)
    rows = []
    for label, mesh in (("1dev", None), (f"{len(jax.devices())}dev", "mesh")):
        if mesh == "mesh":
            from jax.sharding import Mesh

            mesh = Mesh(np.array(jax.devices()), ("data",))
        run = _make_packed_device_fn(model, mesh)
        run(packed)                                   # compile
        t0 = time.time()
        reps = max(1, n_mols // chunk)
        for _ in range(reps):
            out = run(packed)
        jax.block_until_ready(out)
        dt = time.time() - t0
        rows.append({"config": label, "mol_per_s": round(reps * chunk / dt, 1),
                     "wall_s": round(dt, 3)})
        print(f"{label}: {reps*chunk/dt:,.0f} mol/s device-only", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-mols", type=int, default=100_000)
    ap.add_argument("--mesh", action="store_true",
                    help="measure the device mesh axis (run under the "
                         "CPU-sim 8-device env)")
    args = ap.parse_args()

    out_path = "/root/repo/results/SCREEN_SCALING.json"
    state = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            state = json.load(f)
    state["nproc"] = os.cpu_count()
    if args.mesh:
        state["device_mesh_axis"] = mesh_device_axis(args.n_mols)
        state["device_mesh_note"] = (
            "CPU-sim 8-device mesh; isolates shard_map molecule-axis "
            "scaling. Single-chip axon tunnel cannot host a real multi-chip "
            "mesh, and with nproc=1 the 8 virtual devices timeshare one "
            "core — equal 1dev/8dev throughput shows the shard_map wrapper "
            "adds no overhead; it cannot show parallel speedup on this "
            "host.")
    else:
        smiles = real_smiles(args.n_mols)
        state["featurizer_thread_axis"] = featurizer_thread_axis(smiles)
        state["featurizer_note"] = (
            f"host has nproc={os.cpu_count()} core(s); thread scaling is "
            "bounded by physical cores, measured not asserted")
    with open(out_path, "w") as f:
        json.dump(state, f, indent=1)
    print(json.dumps(state, indent=1))


if __name__ == "__main__":
    main()
