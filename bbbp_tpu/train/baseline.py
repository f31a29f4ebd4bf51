"""Baseline 8-model comparison pipeline (family A1-A3).

Reference: ``Models/model.py:26-466`` ``morgan_train_model`` — Scale → PCA(100)
→ split → (GridSearchCV) KNN/LR/SVC/BernoulliNB/DT/RF/GB/MLP → learning curves
→ per-model metrics + bar chart → per-model persistence → best model by
Acc+AUC+BalAcc. Clones: model_maccs.py / model_rdkit.py (fp kind), the
Descriptors copies (A3).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import time
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from bbbp_tpu.chem.featurize import fingerprints
from bbbp_tpu.data import load_b3db_classification
from bbbp_tpu.ops import PCA, StandardScaler, metrics
from bbbp_tpu.train.classification import default_zoo
from bbbp_tpu.train.learning_curve import learning_curve, save_learning_scores_csv


@dataclass
class BaselineConfig:
    fp_kind: str = "morgan"
    pca_dim: int = 100
    test_size: float = 0.2
    with_learning_curves: bool = True
    models: Tuple[str, ...] = ("knn", "logreg", "svc", "bnb", "dt", "rf",
                               "gb", "mlp")
    seed: int = 42
    workers: Optional[int] = None
    out_dir: Optional[str] = None
    limit: Optional[int] = None


def run_baseline(cfg: BaselineConfig = BaselineConfig(),
                 verbose: bool = True) -> Dict[str, Dict[str, float]]:
    t0 = time.time()
    data = load_b3db_classification()
    smiles, y = data.smiles, data.labels
    if cfg.limit:
        smiles, y = smiles[: cfg.limit], y[: cfg.limit]
    fp = fingerprints(smiles, kind=cfg.fp_kind, workers=cfg.workers)
    x = fp.features[fp.ok_mask]
    y = y[fp.ok_mask]
    x = np.asarray(StandardScaler().fit_transform(x))
    x = np.asarray(PCA(min(cfg.pca_dim, *x.shape)).fit_transform(x))
    rng = np.random.default_rng(cfg.seed)
    perm = rng.permutation(len(y))
    n_test = int(len(y) * cfg.test_size)
    te, tr = perm[:n_test], perm[n_test:]

    zoo = default_zoo(cfg.seed)
    report: Dict[str, Dict[str, float]] = {}
    if cfg.out_dir:
        os.makedirs(cfg.out_dir, exist_ok=True)
    for name in cfg.models:
        if name not in zoo:
            continue
        if verbose:
            print(f"[baseline] {name}...")
        est = zoo[name]()
        est.fit(x[tr], y[tr])
        proba = est.predict_proba(x[te])[:, 1]
        report[name] = metrics.classification_report(
            y[te], (proba > 0.5).astype(int), proba)
        if cfg.out_dir:
            with open(os.path.join(cfg.out_dir, f"{name}_model.pkl"), "wb") as f:
                pickle.dump(est, f)
            if cfg.with_learning_curves:
                sizes, trs, vas = learning_curve(
                    zoo[name], x[tr], y[tr], cv=3,
                    train_sizes=(0.2, 0.5, 1.0), seed=cfg.seed)
                save_learning_scores_csv(
                    os.path.join(cfg.out_dir, f"{name}_learning_scores.csv"),
                    sizes, trs, vas)
                from bbbp_tpu.reporting.plots import learning_curve_plot

                learning_curve_plot(sizes, trs, vas, os.path.join(
                    cfg.out_dir, f"{name}_learning_curve.png"))
    # best model by Acc + AUC + BalancedAcc (reference model.py:440-466)
    def score(r):
        return r["accuracy"] + r["roc_auc"] + r["balanced_accuracy"]

    best = max(report, key=lambda m: score(report[m]))
    report["_best"] = {"model": best, "score": score(report[best])}  # type: ignore
    if cfg.out_dir:
        from bbbp_tpu.reporting.metrics_io import write_metrics_csv
        from bbbp_tpu.reporting.plots import performance_bar_plot

        clean = {k: v for k, v in report.items() if not k.startswith("_")}
        write_metrics_csv(os.path.join(cfg.out_dir,
                                       f"model_performance_metrics_{cfg.fp_kind}.csv"),
                          clean)
        performance_bar_plot(clean, os.path.join(cfg.out_dir,
                                                 f"performance_{cfg.fp_kind}.png"))
    if verbose:
        for m, r in report.items():
            if m.startswith("_"):
                continue
            print(f"[baseline] {m:8s} acc={r['accuracy']:.4f} auc={r['roc_auc']:.4f}")
        print(f"[baseline] best={best} wall={time.time()-t0:.0f}s")
    return report


def main():
    ap = argparse.ArgumentParser(description="Baseline 8-model comparison (A1)")
    ap.add_argument("--fp-kind", default="morgan", choices=["morgan", "maccs", "rdkit"])
    ap.add_argument("--out-dir", default="baseline_output")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--no-curves", action="store_true")
    args = ap.parse_args()
    rep = run_baseline(BaselineConfig(fp_kind=args.fp_kind, out_dir=args.out_dir,
                                      with_learning_curves=not args.no_curves,
                                      limit=args.limit))
    print(json.dumps(rep, indent=2))


if __name__ == "__main__":
    main()
