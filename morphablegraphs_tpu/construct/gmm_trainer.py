"""Full-covariance GMM training with EM + BIC model selection.

Replaces the reference's sklearn-backed `GMMTrainer`
(construction/motion_primitive/gmm_trainer.py:33-80): fit K = 1..max_k
mixtures, select minimum BIC, refit.  EM runs as a jitted lax.scan (E-step =
the batched log-prob kernel, M-step = weighted moments), k-means++ style
seeding on the host.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import gmm as gmm_ops

_REG_COVAR = 1e-6  # sklearn default regularization


def _kmeanspp_init(rng: np.random.Generator, x: np.ndarray, k: int) -> np.ndarray:
    n = x.shape[0]
    centers = [x[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(np.stack([np.sum((x - c) ** 2, axis=1) for c in centers]), axis=0)
        total = d2.sum()
        if total <= 1e-12:
            # all remaining points coincide with a center (duplicate rows /
            # k > distinct rows): d2/total would not sum to 1 and
            # rng.choice raises — fall back to uniform choice
            centers.append(x[rng.integers(n)])
            continue
        centers.append(x[rng.choice(n, p=d2 / total)])
    return np.stack(centers)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def _em(x: jax.Array, weights0, means0, covars0, n_iters: int = 100):
    """EM iterations (sklearn GaussianMixture full-covariance semantics)."""
    n, d = x.shape

    def step(carry, _):
        w, mu, cov = carry
        chol = jnp.linalg.cholesky(cov + _REG_COVAR * jnp.eye(d))
        eye = jnp.broadcast_to(jnp.eye(d), cov.shape)
        w_t = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
        prec_chol = jnp.swapaxes(w_t, -1, -2)
        g = gmm_ops.GMM(w, mu, chol, prec_chol)
        log_resp = (gmm_ops.log_prob_components(g, x)
                    + jnp.log(jnp.maximum(w, 1e-30)))  # [n, K]
        log_norm = jax.scipy.special.logsumexp(log_resp, axis=-1, keepdims=True)
        resp = jnp.exp(log_resp - log_norm)  # [n, K]
        nk = jnp.sum(resp, axis=0) + 10 * jnp.finfo(resp.dtype).eps
        new_w = nk / n
        new_mu = (resp.T @ x) / nk[:, None]
        diff = x[None, :, :] - new_mu[:, None, :]  # [K, n, d]
        weighted = diff * resp.T[:, :, None]
        new_cov = jnp.einsum("kne,knf->kef", weighted, diff,
                             precision=jax.lax.Precision.HIGHEST) / nk[:, None, None]
        new_cov = new_cov + _REG_COVAR * jnp.eye(d)
        ll = jnp.sum(log_norm)
        return (new_w, new_mu, new_cov), ll

    (w, mu, cov), lls = jax.lax.scan(step, (weights0, means0, covars0),
                                     None, length=n_iters)
    return w, mu, cov, lls[-1]


def fit_gmm(x: np.ndarray, k: int, seed: int = 0, n_iters: int = 100):
    """Fit one K-component mixture.  Returns (weights, means, covars, ll)."""
    x = np.asarray(x, np.float64)
    n, d = x.shape
    rng = np.random.default_rng(seed)
    means0 = _kmeanspp_init(rng, x, k)
    w0 = np.full(k, 1.0 / k)
    if n > 1:
        base_cov = np.cov(x.T).reshape(d, d)
    else:
        base_cov = np.eye(d)  # single sample: no empirical covariance
    base_cov = np.nan_to_num(base_cov, nan=0.0)
    cov0 = np.tile(base_cov + max(_REG_COVAR, 1e-3) * np.eye(d), (k, 1, 1))
    w, mu, cov, ll = _em(jnp.asarray(x, jnp.float32), jnp.asarray(w0, jnp.float32),
                         jnp.asarray(means0, jnp.float32),
                         jnp.asarray(cov0, jnp.float32), n_iters=n_iters)
    return (np.asarray(w, np.float64), np.asarray(mu, np.float64),
            np.asarray(cov, np.float64), float(ll))


def bic(ll: float, n: int, d: int, k: int) -> float:
    n_params = k * d + k * d * (d + 1) / 2 + (k - 1)
    return -2.0 * ll + n_params * np.log(n)


def train(x: np.ndarray, max_k: int = 40, seed: int = 0,
          score: str = "bic") -> dict:
    """BIC scan K=1..max_k, refit the winner (reference gmm_trainer.py:33-61).

    Returns the model-JSON fields {gmm_weights, gmm_means, gmm_covars}.
    """
    x = np.asarray(x, np.float64)
    n, d = x.shape
    max_k = max(1, min(max_k, n - 1 if n > 1 else 1))
    best = None
    for k in range(1, max_k + 1):
        w, mu, cov, ll = fit_gmm(x, k, seed=seed + k)
        b = bic(ll, n, d, k)
        if best is None or b < best[0]:
            best = (b, w, mu, cov)
    _, w, mu, cov = best
    return {"gmm_weights": w.tolist(), "gmm_means": mu.tolist(),
            "gmm_covars": cov.tolist()}
