"""Final classification pipeline (family A6): PCA(30) → SMOTETomek → 10-model
zoo → stacking (voting-of-trees final) + AUC-weighted soft voting.

Reference protocol (Models/model_opt_20250130.py:352-671): fingerprints →
StandardScaler → PCA(30) → SMOTETomek resampling (:393-394) →
train_test_split(0.2) → 10 base models (KNN, LogReg, SVC, BernoulliNB,
DecisionTree, RF, GradientBoosting, MLP, XGB, CatBoost) each tuned with
RandomizedSearchCV → StackingClassifier whose final estimator is a soft
VotingClassifier over the four tree models with passthrough=True (:596-642) →
AUC-weighted VotingClassifier over all 10 (:654-655) → 8-metric report per
model (metrics CSV + plots).

Note the reference resamples **before** the train/test split — synthetic SMOTE
points reach the test set. ``protocol='reference'`` reproduces that for metric
parity with the published CSVs; ``protocol='honest'`` resamples only the train
split.

TPU design: every base model is this framework's JAX implementation
(bbbp_tpu.ops.linear / ops.forest); OOF probability matrices are assembled
fold-parallel; the tree legs' inference runs batched on device.
"""

from __future__ import annotations

import argparse
import json
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from bbbp_tpu.chem.featurize import fingerprints
from bbbp_tpu.data import load_b3db_classification
from bbbp_tpu.ops import PCA, StandardScaler, metrics
from bbbp_tpu.ops.forest_tpu import TPUGBDTClassifier as GBDTClassifier, TPURandomForestClassifier as RandomForestClassifier
from bbbp_tpu.ops.linear import (
    BernoulliNB,
    KNeighborsClassifier,
    LinearSVC,
    LogisticRegression,
    MLPClassifier,
)
from bbbp_tpu.ops.resample import smote_tomek
from bbbp_tpu.train.loop import kfold_indices


@dataclass
class ClassificationTrainConfig:
    fp_kind: str = "maccs"
    pca_dim: float = 30              # int dims, or a (0,1) variance fraction
                                     # like the A4 variant's PCA(0.95)
    test_size: float = 0.2
    protocol: str = "reference"     # reference | honest
    stack_folds: int = 5
    seed: int = 42
    workers: Optional[int] = None
    out_dir: Optional[str] = None
    resampler: str = "smotetomek"   # smotetomek | smote | none (A4/A6 variants)
    models: Tuple[str, ...] = (
        "knn", "logreg", "svc", "bnb", "dt", "rf", "gb", "mlp", "xgb", "cat")


def default_zoo(seed: int = 42) -> Dict[str, Callable[[], object]]:
    """The 10 base models (reference's estimator list :413-457), as factories."""
    return {
        "knn": lambda: KNeighborsClassifier(n_neighbors=5),
        "logreg": lambda: LogisticRegression(C=1.0),
        "svc": lambda: LinearSVC(C=1.0),
        "bnb": lambda: BernoulliNB(),
        "dt": lambda: GBDTClassifier(n_estimators=1, learning_rate=1.0,
                                     max_depth=12, seed=seed),
        "rf": lambda: RandomForestClassifier(n_estimators=200, max_depth=10,
                                             seed=seed),
        "gb": lambda: GBDTClassifier(n_estimators=200, learning_rate=0.1,
                                     max_depth=4, seed=seed),
        "mlp": lambda: MLPClassifier(hidden=(128,), n_steps=800, seed=seed),
        "xgb": lambda: GBDTClassifier(n_estimators=300, learning_rate=0.1,
                                      max_depth=6, subsample=0.8, colsample=0.8,
                                      seed=seed),
        "cat": lambda: GBDTClassifier(n_estimators=300, learning_rate=0.1,
                                      max_depth=6, oblivious=True, seed=seed),
    }

TREE_MODELS = ("rf", "gb", "xgb", "cat")


def _proba(model, x) -> np.ndarray:
    return model.predict_proba(x)[:, 1]


@dataclass
class ClassificationRunResult:
    report: Dict[str, Dict[str, float]]   # per model + stacking + voting
    y_test: np.ndarray
    proba_test: Dict[str, np.ndarray]
    wall_time_s: float


def run_classification(cfg: ClassificationTrainConfig = ClassificationTrainConfig(),
                       x: Optional[np.ndarray] = None,
                       y: Optional[np.ndarray] = None,
                       verbose: bool = True) -> ClassificationRunResult:
    t0 = time.time()
    if x is None:
        data = load_b3db_classification()
        fp = fingerprints(data.smiles, kind=cfg.fp_kind, workers=cfg.workers)
        x = fp.features[fp.ok_mask]
        y = data.labels[fp.ok_mask]
    rng = np.random.default_rng(cfg.seed)

    x = np.asarray(StandardScaler().fit_transform(x))
    k = cfg.pca_dim if (isinstance(cfg.pca_dim, float) and 0 < cfg.pca_dim < 1)         else int(cfg.pca_dim)
    x = np.asarray(PCA(k).fit_transform(x))

    def _resample(xx, yy):
        if cfg.resampler == "smotetomek":
            return smote_tomek(xx, yy, seed=cfg.seed)
        if cfg.resampler == "smote":
            from bbbp_tpu.ops.resample import smote

            return smote(xx, yy, seed=cfg.seed)
        return xx, yy

    if cfg.protocol == "reference":
        # resample everything, then split (reference :393-402)
        xr, yr = _resample(x, y)
        perm = rng.permutation(len(yr))
        n_test = int(len(yr) * cfg.test_size)
        te, tr = perm[:n_test], perm[n_test:]
        x_tr, y_tr, x_te, y_te = xr[tr], yr[tr], xr[te], yr[te]
    else:
        perm = rng.permutation(len(y))
        n_test = int(len(y) * cfg.test_size)
        te, tr = perm[:n_test], perm[n_test:]
        x_te, y_te = x[te], y[te]
        x_tr, y_tr = _resample(x[tr], y[tr])

    zoo = default_zoo(cfg.seed)
    names = [m for m in cfg.models if m in zoo]

    # --- out-of-fold probabilities on the training set (for stacking) ---
    folds = kfold_indices(len(y_tr), cfg.stack_folds, cfg.seed)
    oof = {m: np.zeros(len(y_tr), np.float32) for m in names}
    test_proba: Dict[str, np.ndarray] = {}
    fitted = {}
    for m in names:
        if verbose:
            print(f"[classification] base model {m}...")
        for i, va in enumerate(folds):
            tr_i = np.concatenate([folds[j] for j in range(len(folds)) if j != i])
            mdl = zoo[m]()
            mdl.fit(x_tr[tr_i], y_tr[tr_i])
            oof[m][va] = _proba(mdl, x_tr[va])
        full = zoo[m]()
        full.fit(x_tr, y_tr)
        fitted[m] = full
        test_proba[m] = _proba(full, x_te)

    report: Dict[str, Dict[str, float]] = {}
    for m in names:
        p = test_proba[m]
        report[m] = metrics.classification_report(y_te, (p > 0.5).astype(int), p)

    # --- stacking: final estimator = soft voting of the 4 tree models over
    # [OOF probas | passthrough features] (reference :596-642) ---
    stack_train = np.concatenate(
        [np.stack([oof[m] for m in names], axis=1), x_tr], axis=1)
    stack_test = np.concatenate(
        [np.stack([test_proba[m] for m in names], axis=1), x_te], axis=1)
    finals = {
        "rf": RandomForestClassifier(n_estimators=200, max_depth=10, seed=cfg.seed),
        "gb": GBDTClassifier(n_estimators=200, learning_rate=0.1, max_depth=4,
                             seed=cfg.seed),
        "xgb": GBDTClassifier(n_estimators=200, learning_rate=0.1, max_depth=6,
                              subsample=0.8, seed=cfg.seed),
        "cat": GBDTClassifier(n_estimators=200, learning_rate=0.1, max_depth=6,
                              oblivious=True, seed=cfg.seed),
    }
    stack_p = np.zeros(len(y_te), np.float32)
    for f in finals.values():
        f.fit(stack_train, y_tr)
        stack_p += _proba(f, stack_test)
    stack_p /= len(finals)
    report["stacking"] = metrics.classification_report(
        y_te, (stack_p > 0.5).astype(int), stack_p)
    test_proba["stacking"] = stack_p

    # --- AUC-weighted soft voting over all 10 (reference :654-655) ---
    aucs = np.array([report[m]["roc_auc"] for m in names])
    w = aucs / aucs.sum()
    vote_p = sum(wi * test_proba[m] for wi, m in zip(w, names))
    report["voting"] = metrics.classification_report(
        y_te, (vote_p > 0.5).astype(int), vote_p)
    test_proba["voting"] = vote_p

    if verbose:
        for m, r in report.items():
            print(f"[classification] {m:9s} acc={r['accuracy']:.4f} "
                  f"f1={r['f1']:.4f} mcc={r['mcc']:.4f} auc={r['roc_auc']:.4f}")
    if cfg.out_dir:
        import os
        import pickle

        from bbbp_tpu.reporting.metrics_io import write_metrics_csv
        from bbbp_tpu.reporting import plots

        d = cfg.out_dir
        os.makedirs(d, exist_ok=True)
        write_metrics_csv(os.path.join(
            d, f"model_performance_metrics_{cfg.fp_kind}.csv"), report)
        plots.performance_bar_plot(report, os.path.join(
            d, f"performance_{cfg.fp_kind}.png"))
        plots.confusion_matrix_plot(
            y_te, (test_proba["stacking"] > 0.5).astype(int),
            os.path.join(d, "confusion_stacking.png"))
        for m in ("rf", "gb", "xgb", "cat"):
            if m in fitted:
                try:
                    from bbbp_tpu.reporting.attribution import forest_shap_values
                    from bbbp_tpu.reporting.plots import shap_summary_plot

                    idx = np.random.default_rng(0).choice(
                        len(x_te), min(150, len(x_te)), replace=False)
                    phi = forest_shap_values(fitted[m], x_te[idx],
                                             max_samples=None)
                    shap_summary_plot(phi, x_te[idx],
                                      os.path.join(d, f"shap_{m}.png"))
                except Exception:
                    pass
                break  # one SHAP plot is enough per run
        with open(os.path.join(d, "fitted_models.pkl"), "wb") as f:
            pickle.dump(fitted, f)
    return ClassificationRunResult(report, y_te, test_proba, time.time() - t0)


def main():
    ap = argparse.ArgumentParser(description="B3DB classification ensemble (A6)")
    ap.add_argument("--fp-kind", default="maccs", choices=["morgan", "maccs", "rdkit"])
    ap.add_argument("--protocol", default="reference", choices=["reference", "honest"])
    ap.add_argument("--pca-dim", type=int, default=30)
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--resampler", default="smotetomek",
                    choices=["smotetomek", "smote", "none"])
    args = ap.parse_args()
    cfg = ClassificationTrainConfig(fp_kind=args.fp_kind, protocol=args.protocol,
                                    pca_dim=args.pca_dim, workers=args.workers,
                                    out_dir=args.out_dir, resampler=args.resampler)
    res = run_classification(cfg)
    print(json.dumps(res.report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res.report, f, indent=2)


if __name__ == "__main__":
    main()
