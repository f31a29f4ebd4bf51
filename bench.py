"""Benchmark: end-to-end ZINC virtual-screening throughput on TPU.

Measures molecules/sec/chip through the full screening path — host C++
featurization (SMILES → Morgan bits) overlapped with on-device
scaler→PCA→forest inference — the reference's virtualscreening.py flow
(SURVEY.md §3.5) at production scale.

Baseline: the BASELINE.json north star, ≥1M molecules/hour on a v5e-8
= 34.72 mol/s/chip. vs_baseline = measured mol/s/chip ÷ 34.72.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _ensure_native() -> None:
    from bbbp_tpu.native import bindings as nb

    if not nb.available():
        from bbbp_tpu.native.build import build

        build(verbose=False)


def main() -> None:
    n_mols = int(os.environ.get("BENCH_N_MOLS", "200000"))
    _ensure_native()

    import jax

    from bbbp_tpu.data.zinc import synthetic_smiles
    from bbbp_tpu.pipelines.screen import screen, train_default_model

    n_chips = len(jax.devices())

    t0 = time.time()
    model = train_default_model(workers=None)
    train_s = time.time() - t0

    smiles = synthetic_smiles(n_mols, seed=7)
    stream = ((s, f"SYN{i:09d}") for i, s in enumerate(smiles))

    # warmup at the SAME chunk size: one compiled executable serves every chunk
    chunk = 16384
    warm = [(s, "w") for s in smiles[:chunk]]
    screen(model, iter(warm), out_csv=None, chunk_size=chunk)

    stats = screen(model, stream, out_csv=None, chunk_size=chunk)
    per_chip = stats.mol_per_s / max(n_chips, 1)
    baseline = 1_000_000.0 / 3600.0 / 8.0  # 34.72 mol/s/chip on v5e-8

    print(json.dumps({
        "metric": "zinc_molecules_per_sec_per_chip_end_to_end_screening",
        "value": round(per_chip, 1),
        "unit": "molecules/s/chip",
        "vs_baseline": round(per_chip / baseline, 2),
    }))
    print(f"# n={stats.n_molecules} wall={stats.wall_s:.1f}s "
          f"featurize={stats.featurize_s:.1f}s device={stats.device_s:.1f}s "
          f"train={train_s:.1f}s chips={n_chips} invalid={stats.n_invalid}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
