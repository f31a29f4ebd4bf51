"""Final regression pipeline (family B7): 10-fold CV of the multimodal NN +
three forest surrogates, OOF stacking with a linear meta-learner.

Reference protocol (Models/multi_input_data_regression_opt_transformer_cnn_20250113.py:130-415):
per fold train the Transformer+CNN net (50 epochs), RF(300, d30),
XGBoost(300, lr .01, d30, hist) and CatBoost(300, lr .01, d10); write each
model's test-fold predictions into OOF arrays; fit
StackingRegressor(final=LinearRegression) on the [N, 4] OOF matrix; report
MSE/R² of the stacked prediction over the whole OOF set.

TPU redesign: the NN trains all folds at once (bbbp_tpu.train.loop); the three
tree legs use the tensorized forest engine (RF / GBDT / oblivious-GBDT as the
XGB / CatBoost surrogates) with TPU inference; the meta-learner is the JAX
closed-form LinearRegression.
"""

from __future__ import annotations

import argparse
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from bbbp_tpu.models.transformer_cnn import MultiModalRegressor
from bbbp_tpu.ops import metrics
from bbbp_tpu.ops.forest_tpu import TPUGBDTRegressor as GBDTRegressor, TPURandomForestRegressor as RandomForestRegressor
from bbbp_tpu.ops.linear import LinearRegression, Ridge
from bbbp_tpu.pipelines.preprocess import PreprocessConfig, ProcessedData, preprocess_regression
from bbbp_tpu.train.loop import train_multimodal_cv, kfold_indices


@dataclass
class RegressionTrainConfig:
    fp_kind: str = "maccs"
    n_folds: int = 10
    epochs: int = 50
    batch_size: int = 32
    lr: float = 3e-4
    n_layers: int = 4
    fusion: str = "multihead"
    fp_tokens: int = 1
    nn_input: str = "norm"       # norm | pca — B8's PCA-compressed variant
    nn_seeds: int = 3            # deep-ensemble width on the batched fold axis
    snapshot_from: Optional[int] = 30   # SWA-style epoch snapshot averaging
    seed: int = 42
    # forest legs (reference hyperparameters :262-391, re-tuned for the engine)
    rf_trees: int = 300
    rf_depth: int = 10
    gbdt_trees: int = 300
    gbdt_lr: float = 0.03
    gbdt_depth: int = 6
    cat_trees: int = 300
    cat_lr: float = 0.03
    cat_depth: int = 6
    meta: str = "linear"          # linear | ridge
    extra_legs: bool = True       # + kNN and ridge OOF legs (B9-style pool)
    out_dir: Optional[str] = None  # write plots/CSVs/model artifacts here
    image_size: int = 128
    compat_batch: Optional[int] = None
    workers: Optional[int] = None


@dataclass
class RegressionRunResult:
    oof: Dict[str, np.ndarray]
    stacked_pred: np.ndarray
    y: np.ndarray
    report: Dict[str, Dict[str, float]]
    wall_time_s: float


def _tree_features(d: ProcessedData) -> np.ndarray:
    """Tree-leg feature matrix. The reference feeds trees hstack(fp, flat 49k
    image) (:263); here: physchem descriptors + normalized fp + aux-fp PCA +
    image PCA (ablation: descriptors alone reach R²≈0.58; enriched set beats
    any fingerprint-only combination).

    Wide fingerprints (Morgan/path 2048) are PCA-compressed to 256 for the
    tree legs: >2.1k-wide histogram jobs have tripped TPU-worker faults on
    the tunnel, and the ablations show wide raw bits underperform compressed
    ones for trees anyway."""
    x = d.tree_features()
    if d.fp_norm.shape[1] > 1024:
        from bbbp_tpu.ops import PCA

        fp_c = np.asarray(PCA(256).fit_transform(d.fp_norm))
        blocks = [fp_c, d.fp_pca, d.img_pca]
        if d.desc_norm is not None:
            blocks.insert(0, d.desc_norm)
        if d.aux_fp_pca is not None:
            blocks.append(d.aux_fp_pca)
        x = np.concatenate(blocks, axis=1).astype(np.float32)
    return x


def run_regression(cfg: RegressionTrainConfig = RegressionTrainConfig(),
                   data: Optional[ProcessedData] = None,
                   verbose: bool = True) -> RegressionRunResult:
    t0 = time.time()
    if data is None:
        data = preprocess_regression(PreprocessConfig(
            fp_kind=cfg.fp_kind, image_size=cfg.image_size,
            compat_batch=cfg.compat_batch, workers=cfg.workers, seed=cfg.seed))
    n = len(data.y)
    y = data.y
    img = data.img_norm.reshape(n, cfg.image_size, cfg.image_size, 3)

    nn_fp = (np.concatenate([data.fp_pca, data.img_pca], axis=1).astype(np.float32)
             if cfg.nn_input == "pca" else data.nn_fp_features())
    model = MultiModalRegressor(
        fp_dim=nn_fp.shape[1], n_layers=cfg.n_layers,
        fusion=cfg.fusion, fp_tokens=cfg.fp_tokens)
    if verbose:
        print(f"[regression] N={n} fp={nn_fp.shape} training NN "
              f"({cfg.n_folds} folds x {cfg.epochs} epochs, all folds batched)...")
    # seed replicas run sequentially (fold axis alone already fills the chip;
    # the jit is compile-cached across replicas) and OOF-average — identical
    # folds via split_seed
    nn_res = None
    oof_acc = None
    for r in range(max(1, cfg.nn_seeds)):
        res_r = train_multimodal_cv(
            model, nn_fp, img, y, n_folds=cfg.n_folds, epochs=cfg.epochs,
            batch_size=cfg.batch_size, lr=cfg.lr, seed=cfg.seed + 1000 * r,
            split_seed=cfg.seed, snapshot_from=cfg.snapshot_from,
            log_every=(10 if verbose and r == 0 else 0))
        oof_acc = res_r.oof_pred if oof_acc is None else oof_acc + res_r.oof_pred
        nn_res = res_r
    nn_res.oof_pred = oof_acc / max(1, cfg.nn_seeds)

    folds = nn_res.fold_test_idx
    xt = _tree_features(data)
    leg_names = ["nn", "rf", "gbdt", "cat"]
    if cfg.extra_legs:
        leg_names += ["knn", "ridge"]
    oof = {m: np.zeros(n, np.float32) for m in leg_names}
    oof["nn"] = nn_res.oof_pred
    from bbbp_tpu.ops.linear import KNeighborsRegressor
    for i, te in enumerate(folds):
        tr = np.concatenate([folds[j] for j in range(len(folds)) if j != i])
        if verbose:
            print(f"[regression] fold {i+1}/{len(folds)} tree legs...")
        rf = RandomForestRegressor(n_estimators=cfg.rf_trees,
                                   max_depth=cfg.rf_depth,
                                   seed=cfg.seed + i).fit(xt[tr], y[tr])
        oof["rf"][te] = rf.predict(xt[te])
        gb = GBDTRegressor(n_estimators=cfg.gbdt_trees, learning_rate=cfg.gbdt_lr,
                           max_depth=cfg.gbdt_depth, subsample=0.8,
                           seed=cfg.seed + i).fit(xt[tr], y[tr])
        oof["gbdt"][te] = gb.predict(xt[te])
        cat = GBDTRegressor(n_estimators=cfg.cat_trees, learning_rate=cfg.cat_lr,
                            max_depth=cfg.cat_depth, oblivious=True,
                            subsample=0.8, seed=cfg.seed + i).fit(xt[tr], y[tr])
        oof["cat"][te] = cat.predict(xt[te])
        if cfg.extra_legs:
            oof["knn"][te] = KNeighborsRegressor(10).fit(xt[tr], y[tr]).predict(xt[te])
            oof["ridge"][te] = Ridge(10.0).fit(xt[tr], y[tr]).predict(xt[te])

    stack_x = np.stack([oof[k] for k in leg_names], axis=1)
    meta = Ridge(1.0) if cfg.meta == "ridge" else LinearRegression()
    meta.fit(stack_x, y)
    stacked = meta.predict(stack_x)

    report = {k: metrics.regression_report(y, v) for k, v in oof.items()}
    report["stacked"] = metrics.regression_report(y, stacked)
    if verbose:
        for k, r in report.items():
            print(f"[regression] {k:8s} R2={r['r2']:.4f} MSE={r['mse']:.4f}")
    if cfg.out_dir:
        _write_artifacts(cfg, data, nn_res, oof, stacked, y, report)
    return RegressionRunResult(oof, stacked, y, report, time.time() - t0)


def _write_artifacts(cfg, data, nn_res, oof, stacked, y, report):
    """The reference's artifact set (SURVEY §2.8 S2): metrics CSV, loss curves,
    pred-vs-actual scatter with metrics in the filename, distribution plot,
    NN checkpoint, stacking meta weights."""
    import os
    import pickle

    from bbbp_tpu.reporting.metrics_io import write_metrics_csv
    from bbbp_tpu.reporting import plots
    from bbbp_tpu.utils.checkpoint import save_checkpoint

    d = cfg.out_dir
    os.makedirs(d, exist_ok=True)
    write_metrics_csv(os.path.join(d, "regression_metrics.csv"), report)
    plots.loss_curve_plot(nn_res.train_losses, os.path.join(d, "nn_loss_curves.png"))
    r2, mse = report["stacked"]["r2"], report["stacked"]["mse"]
    plots.pred_vs_actual_plot(
        y, stacked,
        os.path.join(d, f"stacked_predict_r2_{r2:.4f}_MSE_{mse:.4f}.png"),
        r2=r2, mse=mse)
    plots.distribution_plot(y, stacked, os.path.join(d, "prediction_distribution.png"))
    with open(os.path.join(d, "oof_predictions.pkl"), "wb") as f:
        pickle.dump({"y": y, **oof, "stacked": stacked}, f)
    save_checkpoint(os.path.join(d, "nn_checkpoint"),
                    {"params": nn_res.params, "batch_stats": nn_res.batch_stats})


def main():
    ap = argparse.ArgumentParser(description="B3DB multimodal regression (B7)")
    ap.add_argument("--fp-kind", default="maccs", choices=["morgan", "maccs", "rdkit"])
    ap.add_argument("--folds", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--fusion", default="multihead",
                    choices=["multihead", "gate", "crossmodal"])
    ap.add_argument("--meta", default="linear", choices=["linear", "ridge"])
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--out", default=None, help="write metrics JSON here")
    ap.add_argument("--out-dir", default=None, help="write plots/models here")
    args = ap.parse_args()
    cfg = RegressionTrainConfig(fp_kind=args.fp_kind, n_folds=args.folds,
                                epochs=args.epochs, lr=args.lr,
                                fusion=args.fusion, meta=args.meta,
                                out_dir=args.out_dir, workers=args.workers)
    res = run_regression(cfg)
    print(json.dumps({k: v for k, v in res.report.items()}, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res.report, f, indent=2)


if __name__ == "__main__":
    main()
