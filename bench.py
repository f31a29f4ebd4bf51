"""Benchmark: end-to-end ZINC virtual-screening throughput on TPU.

Measures molecules/sec/chip through the full screening path — host C++
featurization (SMILES → Morgan bits) overlapped with on-device
scaler→PCA→forest inference — the reference's virtualscreening.py flow
(SURVEY.md §3.5) at production scale.

Feedstock is REAL drug-like molecules: the 8.8k B3DB SMILES (classification +
regression sets) shuffled and cycled to the requested count, so the
host-featurization cost reflects production molecular complexity rather than
short synthetic fragments (round-1 ADVICE). The default screening model is
trained once and cached under .bench_cache/ (delete to retrain).

Also reports device utilization: the screening device-path busy fraction and
an MFU probe of one batched-folds training epoch of the flagship multimodal
regressor (XLA cost_analysis FLOPs ÷ step time ÷ bf16 peak).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Detail lines go to stderr; a full breakdown is written to results/BENCH_DETAIL.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
V5E_BF16_PEAK = 197e12   # TPU v5e per-chip peak bf16 FLOP/s


def _supervise() -> int:
    """Run the bench in a child process and retry on failure.

    The axon TPU worker occasionally crashes/restarts mid-run (observed
    ~monthly-rate per hour on this tunnel); a crash surfaces as a
    JaxRuntimeError in whatever process holds the runtime handle and can wedge
    that process's JAX state. Re-execing keeps each attempt hermetic: the
    screening model is already cached after the first attempt, so a retry
    costs seconds, and the driver still gets its ONE JSON metric line on
    stdout as long as any attempt succeeds.
    """
    env = dict(os.environ, BENCH_CHILD="1")
    last_out = ""
    for attempt in range(3):
        if attempt:
            # wait for the worker to come back (historically ~3 min), probing
            # health in a throwaway subprocess so a wedged probe can't hang us
            for _ in range(10):
                try:
                    probe = subprocess.run(
                        [sys.executable, "-c",
                         "import jax, jax.numpy as jnp;"
                         "assert float(jnp.ones((8, 8)).sum()) == 64.0"],
                        capture_output=True, timeout=600)
                    if probe.returncode == 0:
                        break
                except subprocess.TimeoutExpired:
                    pass
                time.sleep(90)
        try:
            p = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE, timeout=3600)
        except subprocess.TimeoutExpired:
            print(f"# bench attempt {attempt + 1} timed out", file=sys.stderr)
            continue
        last_out = p.stdout.decode(errors="replace")
        if p.returncode == 0 and '"metric"' in last_out:
            sys.stdout.write(last_out)
            return 0
        print(f"# bench attempt {attempt + 1} failed rc={p.returncode}",
              file=sys.stderr)
    sys.stdout.write(last_out)
    return 1


def _ensure_native() -> None:
    from bbbp_tpu.native import bindings as nb

    if not nb.available():
        from bbbp_tpu.native.build import build

        build(verbose=False)


def _cached_model(workers):
    from bbbp_tpu.pipelines.screen import ScreeningModel, train_default_model

    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, "screening_model.pkl")
    if os.path.exists(path):
        try:
            return ScreeningModel.load(path), 0.0
        except Exception:
            pass
    t0 = time.time()
    model = train_default_model(workers=workers)
    model.save(path)
    return model, time.time() - t0


def _real_feedstock(n: int, seed: int = 7):
    """Real B3DB molecules, shuffled and cycled to n."""
    import random

    from bbbp_tpu.data import load_b3db_classification, load_b3db_regression

    smiles = list(load_b3db_classification().smiles)
    smiles += list(load_b3db_regression().smiles)
    rng = random.Random(seed)
    rng.shuffle(smiles)
    out = []
    while len(out) < n:
        out.extend(smiles[: n - len(out)])
    return out


def _train_mfu_probe(folds: int = 10, batch: int = 32):
    """One batched-folds training epoch of the flagship model on bench-sized
    shapes: report step time, XLA-estimated FLOPs, and MFU. ``folds`` is the
    vmapped batched axis — scripts/round5_mfu_probe.py sweeps it to test the
    repo's utilization thesis (MFU grows with batched-axis width)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from bbbp_tpu.models.transformer_cnn import MultiModalRegressor

    fp_dim, side = 191, 128
    model = MultiModalRegressor(fp_dim=fp_dim, n_layers=4)
    tx = optax.adamw(3e-4)
    rng = jax.random.PRNGKey(0)

    def init_one(key):
        v = model.init({"params": key, "dropout": key},
                       jnp.ones((2, fp_dim)), jnp.ones((2, side, side, 3)),
                       train=True)
        return v["params"], v.get("batch_stats", {}), tx.init(v["params"])

    params, bs, opt = jax.jit(jax.vmap(init_one))(
        jax.random.split(rng, folds))

    def loss_fn(p, b, fp, img, y, key):
        variables = {"params": p}
        if b:
            variables["batch_stats"] = b
            pred, upd = model.apply(variables, fp, img, train=True,
                                    rngs={"dropout": key},
                                    mutable=["batch_stats"])
            return jnp.mean((pred - y) ** 2), upd["batch_stats"]
        pred = model.apply(variables, fp, img, train=True,
                           rngs={"dropout": key})
        return jnp.mean((pred - y) ** 2), b

    def fold_step(p, b, o, fp, img, y, key):
        (l, nb), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, b, fp, img, y, key)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), nb, o, l

    step = jax.jit(jax.vmap(fold_step))
    fp = jnp.ones((folds, batch, fp_dim), jnp.float32)
    img = jnp.ones((folds, batch, side, side, 3), jnp.bfloat16)
    y = jnp.zeros((folds, batch), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), folds)

    lowered = step.lower(params, bs, opt, fp, img, y, keys)
    compiled = lowered.compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")
    # timed steps
    params, bs, opt, l = step(params, bs, opt, fp, img, y, keys)
    jax.block_until_ready(l)
    n_steps = 20
    t0 = time.time()
    for _ in range(n_steps):
        params, bs, opt, l = step(params, bs, opt, fp, img, y, keys)
    jax.block_until_ready(l)
    dt = (time.time() - t0) / n_steps
    mfu = flops / dt / V5E_BF16_PEAK if flops == flops else float("nan")
    return {"train_step_s": dt, "train_step_flops": flops,
            "train_mfu_vs_bf16_peak": mfu,
            "train_folds_batched": folds, "train_batch_per_fold": batch}


def main() -> None:
    if os.environ.get("BENCH_CHILD") != "1":
        sys.exit(_supervise())
    n_mols = int(os.environ.get("BENCH_N_MOLS", "200000"))
    _ensure_native()

    import jax

    from bbbp_tpu.pipelines.screen import ScreenBackendError, screen

    n_chips = len(jax.devices())
    model, train_s = _cached_model(workers=None)
    smiles = _real_feedstock(n_mols)

    # multi-chip hosts shard the molecule axis over a 'data' mesh so the
    # per-chip division below reflects devices actually used (single-chip
    # tunnel: mesh=None, n_chips=1 — same behavior as before)
    mesh = None
    if n_chips > 1:
        import numpy as _np
        from jax.sharding import Mesh

        mesh = Mesh(_np.array(jax.devices()), ("data",))

    # warmup at the SAME chunk size: one compiled executable serves every chunk
    # with the 3x C++ featurizer (~49k mol/s) the device path's per-chunk
    # dispatch cost is co-dominant. Config precedence: BENCH_CHUNK /
    # BENCH_DISPATCHERS env > the committed device-path probe's best cell
    # (results/DEVPATH_PROBE.json, measured on this hardware by
    # scripts/round5_devpath_probe.py) > proven defaults.
    best_cell = {}
    try:
        with open("results/DEVPATH_PROBE.json") as f:
            best_cell = json.load(f).get("best_cell", {})
    except (OSError, ValueError):
        pass
    chunk = int(os.environ.get("BENCH_CHUNK",
                               best_cell.get("chunk_size", 16384)))
    n_disp = int(os.environ.get("BENCH_DISPATCHERS",
                                best_cell.get("dispatch_workers", 2)))
    warm = [(s, "w") for s in smiles[:chunk]]
    screen(model, iter(warm), out_csv=None, chunk_size=chunk, mesh=mesh,
           dispatch_workers=n_disp)

    def _timed_screen():
        return screen(model, ((s, f"B3DB{i:09d}") for i, s in
                              enumerate(smiles)),
                      out_csv=None, chunk_size=chunk, mesh=mesh,
                      dispatch_workers=n_disp)

    try:
        stats = _timed_screen()
    except ScreenBackendError as e:
        # the TPU worker died under the run (BENCH_r04 attempt 1 pattern:
        # FAILED_PRECONDITION in the drain). Probe the backend in-process;
        # if it answers, one in-process retry is enough, otherwise exit
        # with a distinct rc so the parent's re-exec retry starts
        # immediately instead of burning the full timeout.
        print(f"# backend died at chunk {e.chunk_index}; probing...",
              file=sys.stderr)
        try:
            import jax.numpy as jnp

            assert float(jnp.ones((8, 8)).sum()) == 64.0
        except Exception:
            print("# backend unreachable in-process; exiting rc=3 for fast "
                  "parent retry", file=sys.stderr)
            sys.exit(3)
        print("# backend healthy again; in-process retry", file=sys.stderr)
        stats = _timed_screen()
    per_chip = stats.mol_per_s / max(n_chips, 1)
    baseline = 1_000_000.0 / 3600.0 / 8.0  # 34.72 mol/s/chip on v5e-8

    mfu = {}
    if os.environ.get("BENCH_SKIP_MFU") != "1":   # CPU smoke runs skip it
        try:
            mfu = _train_mfu_probe()
        except Exception as e:  # noqa: BLE001 — probe must not sink the bench
            print(f"# mfu probe failed: {e}", file=sys.stderr)

    detail = {
        "molecules_per_s_per_chip": per_chip,
        "n_molecules": stats.n_molecules,
        "wall_s": stats.wall_s,
        "featurize_s": stats.featurize_s,
        "device_s": stats.device_s,
        "screen_device_busy_fraction": stats.device_s / max(stats.wall_s, 1e-9),
        # overlap quality: 1.0 = device path fully hidden behind featurize
        "screen_wall_over_featurize": stats.wall_s / max(stats.featurize_s,
                                                         1e-9),
        "model_train_s_first_run": train_s,
        "n_invalid": stats.n_invalid,
        "feedstock": "B3DB real molecules cycled",
        "chunk_size": chunk,
        "dispatch_workers": n_disp,
        **mfu,
    }
    try:
        os.makedirs("results", exist_ok=True)
        with open("results/BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass

    print(json.dumps({
        "metric": "zinc_molecules_per_sec_per_chip_end_to_end_screening",
        "value": round(per_chip, 1),
        "unit": "molecules/s/chip",
        "vs_baseline": round(per_chip / baseline, 2),
    }))
    print(f"# n={stats.n_molecules} wall={stats.wall_s:.1f}s "
          f"featurize={stats.featurize_s:.1f}s device={stats.device_s:.1f}s "
          f"train={train_s:.1f}s chips={n_chips} invalid={stats.n_invalid} "
          f"mfu={mfu.get('train_mfu_vs_bf16_peak', float('nan')):.3f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
