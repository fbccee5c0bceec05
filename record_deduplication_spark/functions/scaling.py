"""Yeo-Johnson power transform: pure-numpy kernel + MLE lambda fit.

C3 analog — the reference scales clustering features with sklearn's
PowerTransformer(method="yeo-johnson") followed by StandardScaler
(/root/reference/src/core/clustering_engine.py:323-346). The transform
itself is a closed-form piecewise power expression, so the Spark side
applies it as a native whole-stage-codegen column expression
(operators/stats.yeo_johnson); only the per-column lambda MLE runs on
the driver over a bounded sample — same split as the reference, where
the lambda fit is also a single-node pass.

No sklearn/scipy in this environment, so the MLE is a deterministic
coarse-grid + golden-section search on the standard Yeo-Johnson profile
log-likelihood (the same objective sklearn optimizes with Brent):

    llf(lam) = -n/2 * log(var(psi(x, lam)))
               + (lam - 1) * sum(sign(x) * log1p(|x|))
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-9
_GOLDEN = (np.sqrt(5.0) - 1.0) / 2.0


def yeo_johnson(x: np.ndarray, lam: float) -> np.ndarray:
    """psi(x, lam): increasing in x, psi(0)=0, lam=1 is identity."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    pos = x >= 0
    if abs(lam) < _EPS:
        out[pos] = np.log1p(x[pos])
    else:
        out[pos] = (np.power(x[pos] + 1.0, lam) - 1.0) / lam
    if abs(lam - 2.0) < _EPS:
        out[~pos] = -np.log1p(-x[~pos])
    else:
        out[~pos] = -(np.power(1.0 - x[~pos], 2.0 - lam) - 1.0) / (2.0 - lam)
    return out


def _loglik(x: np.ndarray, lam: float) -> float:
    psi = yeo_johnson(x, lam)
    var = psi.var()
    if not np.isfinite(var) or var <= 0:
        return -np.inf
    n = x.shape[0]
    return float(-0.5 * n * np.log(var)
                 + (lam - 1.0) * np.sum(np.sign(x) * np.log1p(np.abs(x))))


def fit_lambda(x: np.ndarray, lo: float = -3.0, hi: float = 3.0,
               grid: int = 61, iters: int = 80) -> float:
    """MLE lambda: deterministic grid bracket + golden-section refine.

    Matches sklearn's optimum to ~1e-6 on well-conditioned data (the
    profile likelihood is unimodal in lam for fixed x). NaNs are the
    caller's problem — filter before fitting.
    """
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        raise ValueError("fit_lambda: empty sample")
    if np.ptp(x) == 0:  # constant column: any lam is an MLE; use identity
        return 1.0
    lams = np.linspace(lo, hi, grid)
    lls = np.array([_loglik(x, l) for l in lams])
    k = int(np.argmax(lls))
    a = lams[max(k - 1, 0)]
    b = lams[min(k + 1, grid - 1)]
    # golden-section maximize on [a, b]
    c = b - _GOLDEN * (b - a)
    d = a + _GOLDEN * (b - a)
    fc, fd = _loglik(x, c), _loglik(x, d)
    for _ in range(iters):
        if fc >= fd:
            b, d, fd = d, c, fc
            c = b - _GOLDEN * (b - a)
            fc = _loglik(x, c)
        else:
            a, c, fc = c, d, fd
            d = a + _GOLDEN * (b - a)
            fd = _loglik(x, d)
    return float((a + b) / 2.0)
