"""Classical-model zoo as pure JAX: the non-tree base models of the reference's
10-model classification ensemble and the linear meta-learners.

Reference models replaced (Models/model_opt_20250130.py:413-457 and
Models/model.py:136-199): KNeighborsClassifier, LogisticRegression,
SVC(linear, probability=True), BernoulliNB/GaussianNB, MLPClassifier;
plus LinearRegression/Ridge used as stacking meta-learners
(Models/multi_input_data_regression_opt_transformer_cnn_20250113.py:394-403).

Everything trains with closed-form solves or jit-compiled full-batch
iterations — ideal for the post-PCA 30-100 dim features; all estimators expose
sklearn-style fit/predict/predict_proba so the ensemble layer composes them
uniformly, and all are vmap-able over a hyperparameter/fold axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np



class _ParamsMixin:
    """sklearn-style get_params/set_params from __init__ kwargs (for the
    search module)."""

    _param_names: tuple = ()

    def get_params(self, deep: bool = True):
        return {k: getattr(self, k) for k in self._param_names}

    def set_params(self, **p):
        for k, v in p.items():
            setattr(self, k, v)
        return self


def _as_f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Linear / ridge regression (closed form)
# ---------------------------------------------------------------------------

class LinearRegression(_ParamsMixin):
    """OLS via regularized normal equations (ridge with alpha→0)."""

    _param_names = ("alpha", "fit_intercept")

    def __init__(self, alpha: float = 1e-6, fit_intercept: bool = True):
        self.alpha = alpha
        self.fit_intercept = fit_intercept
        self.coef_: Optional[jnp.ndarray] = None
        self.intercept_: float = 0.0

    def fit(self, x, y) -> "LinearRegression":
        x, y = _as_f32(x), _as_f32(y)
        if self.fit_intercept:
            xm, ym = x.mean(0), y.mean()
            xc, yc = x - xm, y - ym
        else:
            xm, ym = jnp.zeros(x.shape[1]), 0.0
            xc, yc = x, y
        d = x.shape[1]
        a = xc.T @ xc + self.alpha * jnp.eye(d)
        b = xc.T @ yc
        self.coef_ = jax.scipy.linalg.solve(a, b, assume_a="pos")
        self.intercept_ = float(ym - xm @ self.coef_)
        return self

    def predict(self, x) -> np.ndarray:
        return np.asarray(_as_f32(x) @ self.coef_ + self.intercept_)


class Ridge(LinearRegression):
    """Ridge(alpha=1.0) — the B8 stacking meta-learner
    (reference: ..._transformer_cnn_opt.py:173-176)."""

    def __init__(self, alpha: float = 1.0, fit_intercept: bool = True):
        super().__init__(alpha=alpha, fit_intercept=fit_intercept)


class RidgeCV(LinearRegression):
    """Ridge with the alpha chosen by efficient leave-one-out CV.

    For each candidate alpha the LOO residuals come from the hat-matrix
    shortcut r_i = (y_i - yhat_i) / (1 - h_ii) via one eigendecomposition of
    the centered Gram — no refits. Used as a stacking meta-learner where the
    handful of OOF legs makes LOO exact and cheap (beyond-parity upgrade of
    the reference's plain LinearRegression meta, ..._20250113.py:394-403)."""

    _param_names = ("alphas", "fit_intercept")

    def __init__(self, alphas=(1e-4, 1e-3, 1e-2, 1e-1, 1.0, 10.0, 100.0),
                 fit_intercept: bool = True):
        super().__init__(alpha=1e-6, fit_intercept=fit_intercept)
        self.alphas = tuple(alphas)
        self.alpha_: Optional[float] = None

    def fit(self, x, y) -> "RidgeCV":
        x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
        if self.fit_intercept:
            xm, ym = x.mean(0), y.mean()
            xc, yc = x - xm, y - ym
        else:
            xc, yc = x, y
        # eigendecompose X^T X once; h_ii(alpha) and residuals per alpha
        # follow from the rotated design u = Xc @ V
        g = xc.T @ xc
        evals, vecs = np.linalg.eigh(g)
        u = xc @ vecs                                   # [n, d]
        uty = u.T @ yc                                  # [d]
        best, best_err = self.alphas[0], np.inf
        for a in self.alphas:
            w_rot = uty / (evals + a)
            yhat = u @ w_rot
            h = np.einsum("nd,d,nd->n", u, 1.0 / (evals + a), u)
            denom = np.clip(1.0 - h, 1e-6, None)
            if self.fit_intercept:          # intercept adds 1/n leverage
                denom = np.clip(denom - 1.0 / len(yc), 1e-6, None)
            err = float(np.mean(((yc - yhat) / denom) ** 2))
            if err < best_err:
                best, best_err = a, err
        self.alpha_ = float(best)
        self.alpha = float(best)
        return super().fit(x, y)


class NonNegativeLinearRegression(_ParamsMixin):
    """Least squares with non-negative coefficients (+ free intercept) —
    classic stabilizer for stacking over correlated OOF legs (Breiman 1996):
    a weak or divergent leg gets weight 0 instead of a compensating negative
    weight. Solved by projected gradient with the exact Lipschitz step; the
    problem is [N, n_legs]-sized so this is microseconds."""

    _param_names = ("n_iter",)

    def __init__(self, n_iter: int = 2000):
        self.n_iter = n_iter
        self.coef_: Optional[np.ndarray] = None
        self.intercept_: float = 0.0

    def fit(self, x, y) -> "NonNegativeLinearRegression":
        x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
        xm, ym = x.mean(0), y.mean()
        xc, yc = x - xm, y - ym
        g = xc.T @ xc
        b = xc.T @ yc
        lip = float(np.linalg.eigvalsh(g)[-1]) + 1e-12
        w = np.maximum(np.linalg.solve(g + 1e-8 * np.eye(len(b)), b), 0.0)
        for _ in range(self.n_iter):
            w = np.maximum(w - (g @ w - b) / lip, 0.0)
        self.coef_ = w.astype(np.float32)
        self.intercept_ = float(ym - xm @ w)
        return self

    def predict(self, x) -> np.ndarray:
        return np.asarray(np.asarray(x, np.float32) @ self.coef_
                          + self.intercept_)


# ---------------------------------------------------------------------------
# Logistic regression (Newton / IRLS, jit)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(3,))
def _logreg_newton(x, y, l2, n_iter):
    n, d = x.shape
    xb = jnp.concatenate([x, jnp.ones((n, 1))], axis=1)
    w = jnp.zeros(d + 1)
    reg = l2 * jnp.concatenate([jnp.ones(d), jnp.zeros(1)])

    def step(w, _):
        z = xb @ w
        p = jax.nn.sigmoid(z)
        g = xb.T @ (p - y) + reg * w
        s = jnp.clip(p * (1 - p), 1e-6)
        hess = (xb * s[:, None]).T @ xb + jnp.diag(reg + 1e-6)
        dw = jax.scipy.linalg.solve(hess, g, assume_a="pos")
        return w - dw, None

    w, _ = jax.lax.scan(step, w, None, length=n_iter)
    return w


class LogisticRegression(_ParamsMixin):
    _param_names = ("C", "n_iter")

    def __init__(self, C: float = 1.0, n_iter: int = 25):
        self.C = C
        self.n_iter = n_iter
        self.w_: Optional[jnp.ndarray] = None

    def fit(self, x, y) -> "LogisticRegression":
        self.w_ = _logreg_newton(_as_f32(x), _as_f32(y), 1.0 / self.C, self.n_iter)
        return self

    def decision_function(self, x) -> np.ndarray:
        x = _as_f32(x)
        return np.asarray(x @ self.w_[:-1] + self.w_[-1])

    def predict_proba(self, x) -> np.ndarray:
        p = 1 / (1 + np.exp(-self.decision_function(x)))
        return np.stack([1 - p, p], axis=1)

    def predict(self, x) -> np.ndarray:
        return (self.decision_function(x) > 0).astype(np.int32)


# ---------------------------------------------------------------------------
# Linear SVM (squared hinge, full-batch Adam via lax.scan) + Platt scaling
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(3,))
def _svm_train(x, y_pm, c, n_steps):
    n, d = x.shape
    w0 = jnp.zeros(d + 1)

    def loss_fn(w):
        z = x @ w[:-1] + w[-1]
        margins = jnp.maximum(0.0, 1.0 - y_pm * z)
        return 0.5 * jnp.sum(w[:-1] ** 2) + c * jnp.sum(margins ** 2)

    lr = 0.05

    def step(carry, _):
        w, m, v, t = carry
        g = jax.grad(loss_fn)(w)
        t = t + 1
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mhat = m / (1 - 0.9 ** t)
        vhat = v / (1 - 0.999 ** t)
        w = w - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
        return (w, m, v, t), None

    (w, _, _, _), _ = jax.lax.scan(step, (w0, jnp.zeros(d + 1), jnp.zeros(d + 1), 0.0),
                                   None, length=n_steps)
    return w


class LinearSVC(_ParamsMixin):
    """Squared-hinge linear SVM with Platt-scaled probabilities — replaces
    SVC(kernel='linear', probability=True) (reference: Models/model_opt_20250130.py:430)."""

    _param_names = ("C", "n_steps")

    def __init__(self, C: float = 1.0, n_steps: int = 400):
        self.C = C
        self.n_steps = n_steps
        self.w_: Optional[jnp.ndarray] = None
        self._platt: Optional[LogisticRegression] = None

    def fit(self, x, y) -> "LinearSVC":
        x = _as_f32(x)
        y_pm = _as_f32(y) * 2 - 1
        self.w_ = _svm_train(x, y_pm, self.C / max(1, x.shape[0]), self.n_steps)
        z = np.asarray(x @ self.w_[:-1] + self.w_[-1]).reshape(-1, 1)
        self._platt = LogisticRegression(C=10.0).fit(z, np.asarray(y))
        return self

    def decision_function(self, x) -> np.ndarray:
        x = _as_f32(x)
        return np.asarray(x @ self.w_[:-1] + self.w_[-1])

    def predict(self, x) -> np.ndarray:
        return (self.decision_function(x) > 0).astype(np.int32)

    def predict_proba(self, x) -> np.ndarray:
        z = self.decision_function(x).reshape(-1, 1)
        return self._platt.predict_proba(z)


# ---------------------------------------------------------------------------
# Naive Bayes
# ---------------------------------------------------------------------------

class GaussianNB(_ParamsMixin):
    def fit(self, x, y) -> "GaussianNB":
        x = np.asarray(x, np.float32)
        y = np.asarray(y, np.int32)
        self.classes_ = np.unique(y)
        self.theta_ = np.stack([x[y == c].mean(0) for c in self.classes_])
        self.var_ = np.stack([x[y == c].var(0) + 1e-6 for c in self.classes_])
        self.prior_ = np.array([(y == c).mean() for c in self.classes_])
        return self

    def _joint(self, x) -> np.ndarray:
        x = np.asarray(x, np.float32)
        ll = -0.5 * (
            np.log(2 * np.pi * self.var_[None]) +
            (x[:, None, :] - self.theta_[None]) ** 2 / self.var_[None]
        ).sum(-1)
        return ll + np.log(self.prior_)[None]

    def predict_proba(self, x) -> np.ndarray:
        j = self._joint(x)
        j = j - j.max(1, keepdims=True)
        p = np.exp(j)
        return p / p.sum(1, keepdims=True)

    def predict(self, x) -> np.ndarray:
        return self.classes_[self._joint(x).argmax(1)]


class BernoulliNB(_ParamsMixin):
    """sklearn-style BernoulliNB with binarize=0.0 (reference: Models/model.py:139)."""

    _param_names = ("alpha", "binarize")

    def __init__(self, alpha: float = 1.0, binarize: float = 0.0):
        self.alpha = alpha
        self.binarize = binarize

    def fit(self, x, y) -> "BernoulliNB":
        xb = (np.asarray(x, np.float32) > self.binarize).astype(np.float32)
        y = np.asarray(y, np.int32)
        self.classes_ = np.unique(y)
        counts = np.stack([xb[y == c].sum(0) for c in self.classes_])
        n_c = np.array([(y == c).sum() for c in self.classes_], dtype=np.float32)
        self.feat_logp_ = np.log((counts + self.alpha) / (n_c[:, None] + 2 * self.alpha))
        self.feat_lognp_ = np.log(1 - np.exp(self.feat_logp_))
        self.prior_ = np.log(n_c / n_c.sum())
        return self

    def _joint(self, x) -> np.ndarray:
        xb = (np.asarray(x, np.float32) > self.binarize).astype(np.float32)
        return xb @ self.feat_logp_.T + (1 - xb) @ self.feat_lognp_.T + self.prior_[None]

    def predict_proba(self, x) -> np.ndarray:
        j = self._joint(x)
        j = j - j.max(1, keepdims=True)
        p = np.exp(j)
        return p / p.sum(1, keepdims=True)

    def predict(self, x) -> np.ndarray:
        return self.classes_[self._joint(x).argmax(1)]


# ---------------------------------------------------------------------------
# KNN (distance matmul + top_k on device)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(3,))
def _knn_neighbor_labels(train_x, train_y, x, k):
    d = (
        jnp.sum(x * x, 1, keepdims=True)
        - 2 * x @ train_x.T
        + jnp.sum(train_x * train_x, 1)[None]
    )
    _, idx = jax.lax.top_k(-d, k)
    return train_y[idx]  # [n, k]


class KNeighborsClassifier(_ParamsMixin):
    _param_names = ("n_neighbors",)

    def __init__(self, n_neighbors: int = 5):
        self.n_neighbors = n_neighbors

    def fit(self, x, y) -> "KNeighborsClassifier":
        self._x = _as_f32(x)
        self._y = jnp.asarray(np.asarray(y, np.int32))
        return self

    def predict_proba(self, x) -> np.ndarray:
        lbl = np.asarray(
            _knn_neighbor_labels(self._x, self._y, _as_f32(x), self.n_neighbors)
        )
        p1 = lbl.mean(1)
        return np.stack([1 - p1, p1], axis=1)

    def predict(self, x) -> np.ndarray:
        return (self.predict_proba(x)[:, 1] > 0.5).astype(np.int32)


class KNeighborsRegressor(KNeighborsClassifier):
    def fit(self, x, y):
        self._x = _as_f32(x)
        self._y = _as_f32(y)
        return self

    def predict(self, x) -> np.ndarray:
        lbl = np.asarray(
            _knn_neighbor_labels(self._x, self._y, _as_f32(x), self.n_neighbors)
        )
        return lbl.mean(1)


# ---------------------------------------------------------------------------
# Small MLP classifier/regressor (pure JAX, Adam via lax.scan)
# ---------------------------------------------------------------------------

def _init_mlp(key, dims):
    params = []
    for i in range(len(dims) - 1):
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (dims[i], dims[i + 1])) * jnp.sqrt(2.0 / dims[i])
        params.append((w, jnp.zeros(dims[i + 1])))
    return params


def _mlp_forward(params, x):
    for i, (w, b) in enumerate(params):
        x = x @ w + b
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x[:, 0]


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _mlp_train(x, y, seed, hidden, n_steps, classify, lr0=1e-3, l2=0.0):
    dims = (x.shape[1],) + hidden + (1,)
    params = _init_mlp(jax.random.PRNGKey(seed), dims)

    def loss_fn(params):
        z = _mlp_forward(params, x)
        reg = l2 * sum(jnp.sum(w ** 2) for w, _ in params)
        if classify:
            return jnp.mean(
                jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
            ) + reg
        return jnp.mean((z - y) ** 2) + reg

    opt_state = [(jnp.zeros_like(w), jnp.zeros_like(b)) for w, b in params]

    def step(carry, t):
        params, m, v = carry
        g = jax.grad(loss_fn)(params)
        new_p, new_m, new_v = [], [], []
        for (w, b), (gw, gb), (mw, mb), (vw, vb) in zip(params, g, m, v):
            mw = 0.9 * mw + 0.1 * gw
            mb = 0.9 * mb + 0.1 * gb
            vw = 0.999 * vw + 0.001 * gw ** 2
            vb = 0.999 * vb + 0.001 * gb ** 2
            tt = t + 1.0
            lr = lr0 * jnp.sqrt(1 - 0.999 ** tt) / (1 - 0.9 ** tt)
            new_p.append((w - lr * mw / (jnp.sqrt(vw) + 1e-8),
                          b - lr * mb / (jnp.sqrt(vb) + 1e-8)))
            new_m.append((mw, mb))
            new_v.append((vw, vb))
        return (new_p, new_m, new_v), None

    (params, _, _), _ = jax.lax.scan(
        step, (params, opt_state, [(jnp.zeros_like(w), jnp.zeros_like(b)) for w, b in params]),
        jnp.arange(n_steps, dtype=jnp.float32),
    )
    return params


class MLPClassifier(_ParamsMixin):
    """Small fully-batched MLP — replaces sklearn MLPClassifier
    (reference: Models/model_opt_20250130.py:444)."""

    _param_names = ("hidden", "n_steps", "seed", "lr", "l2")

    def __init__(self, hidden=(100,), n_steps: int = 500, seed: int = 0,
                 lr: float = 1e-3, l2: float = 0.0):
        self.hidden = tuple(hidden)
        self.n_steps = n_steps
        self.seed = seed
        self.lr = lr
        self.l2 = l2

    def fit(self, x, y) -> "MLPClassifier":
        self.params_ = _mlp_train(_as_f32(x), _as_f32(y), self.seed,
                                  self.hidden, self.n_steps, True,
                                  jnp.float32(self.lr), jnp.float32(self.l2))
        return self

    def decision_function(self, x) -> np.ndarray:
        return np.asarray(_mlp_forward(self.params_, _as_f32(x)))

    def predict_proba(self, x) -> np.ndarray:
        p = 1 / (1 + np.exp(-self.decision_function(x)))
        return np.stack([1 - p, p], axis=1)

    def predict(self, x) -> np.ndarray:
        return (self.decision_function(x) > 0).astype(np.int32)


class MLPRegressor(MLPClassifier):
    def fit(self, x, y) -> "MLPRegressor":
        self.params_ = _mlp_train(_as_f32(x), _as_f32(y), self.seed,
                                  self.hidden, self.n_steps, False,
                                  jnp.float32(self.lr), jnp.float32(self.l2))
        return self

    def predict(self, x) -> np.ndarray:
        return self.decision_function(x)
