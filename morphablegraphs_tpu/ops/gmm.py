"""Gaussian-mixture kernels: sampling, log-likelihood, scoring.

Replaces the re-hydrated sklearn `GaussianMixture` the reference builds from
model JSON (reference motion_model/motion_primitive.py:126-144, including its
`_compute_precision_cholesky` trick).  Parameters live in a pytree so a whole
graph's mixtures can be stacked/padded and the score of thousands of latent
candidates evaluates as one batched matmul chain.

Numerics match sklearn's full-covariance path to ~1e-6:
  log N_k(x) = -0.5 (D log 2pi + ||W_k^T (x - mu_k)||^2) + log|W_k|
with W_k the precision Cholesky factor; mixture log-prob via logsumexp.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_LOG_2PI = float(np.log(2.0 * np.pi))


class GMM(NamedTuple):
    """Full-covariance Gaussian mixture as a pytree.

    weights:   [K]        mixture weights (sum to 1; padded components get 0)
    means:     [K, D]
    cov_chol:  [K, D, D]  lower Cholesky of covariances (for sampling)
    prec_chol: [K, D, D]  Cholesky-style precision factor W with
                          Sigma^{-1} = W W^T  (sklearn's precisions_cholesky_)
    """

    weights: jax.Array
    means: jax.Array
    cov_chol: jax.Array
    prec_chol: jax.Array

    @property
    def n_components(self) -> int:
        return self.weights.shape[-1]

    @property
    def n_dims(self) -> int:
        return self.means.shape[-1]


def from_covars(weights, means, covars) -> GMM:
    """Build a GMM pytree from the model-JSON fields gmm_weights/means/covars
    (reference motion_primitive.py:135-144).

    Host-side (numpy, f64): runs at model-load time, not in the compute path,
    and eager jnp dispatch is slow on some backends.
    """
    weights = np.asarray(weights, np.float64)
    means = np.asarray(means, np.float64)
    covars = np.asarray(covars, np.float64)
    cov_chol = np.linalg.cholesky(covars)
    # sklearn's _compute_precision_cholesky: solve L W^T = I -> W = L^{-T}.
    d = means.shape[-1]
    eye = np.eye(d)
    prec_chol = np.stack([np.linalg.solve(l, eye).T for l in cov_chol])
    return GMM(jnp.asarray(weights, jnp.float32), jnp.asarray(means, jnp.float32),
               jnp.asarray(cov_chol, jnp.float32), jnp.asarray(prec_chol, jnp.float32))


def log_prob_components(gmm: GMM, x: jax.Array) -> jax.Array:
    """Per-component Gaussian log-density.  x: [..., D] -> [..., K]."""
    # y[..., k, :] = (x - mu_k) @ W_k
    diff = x[..., None, :] - gmm.means  # [..., K, D]
    # HIGHEST precision: this backend lowers default-precision contractions
    # to bf16 passes, which costs ~1e-2 in the Mahalanobis term.
    y = jnp.einsum("...kd,kde->...ke", diff, gmm.prec_chol,
                   precision=jax.lax.Precision.HIGHEST)
    maha = jnp.sum(y * y, axis=-1)  # [..., K]
    d = gmm.n_dims
    # log det W_k = sum log diag(W_k)
    log_det = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(gmm.prec_chol, axis1=-2, axis2=-1))), axis=-1)
    return -0.5 * (d * _LOG_2PI + maha) + log_det


@jax.jit
def log_prob(gmm: GMM, x: jax.Array) -> jax.Array:
    """Mixture log-density (sklearn score_samples). x: [..., D] -> [...]."""
    lp = log_prob_components(gmm, x)
    log_w = jnp.log(jnp.maximum(gmm.weights, 1e-30))
    return jax.scipy.special.logsumexp(lp + log_w, axis=-1)


@jax.jit
def score(gmm: GMM, x: jax.Array) -> jax.Array:
    """Mean log-likelihood over the leading axis (sklearn .score)."""
    return jnp.mean(log_prob(gmm, x), axis=-1)


@functools.partial(jax.jit, static_argnames=("n",))
def sample(key: jax.Array, gmm: GMM, n: int) -> jax.Array:
    """Draw n samples. Component choice is categorical on the weights; each
    draw is mu_k + L_k eps.  Uses explicit PRNG keys (no sklearn RandomState
    parity — distributional equivalence is what the tests assert, SURVEY §7)."""
    k_comp, k_norm = jax.random.split(key)
    comp = jax.random.categorical(k_comp, jnp.log(jnp.maximum(gmm.weights, 1e-30)), shape=(n,))
    eps = jax.random.normal(k_norm, (n, gmm.n_dims), dtype=gmm.means.dtype)
    chol = gmm.cov_chol[comp]  # [n, D, D]
    mu = gmm.means[comp]
    return mu + jnp.einsum("nde,ne->nd", chol, eps,
                           precision=jax.lax.Precision.HIGHEST)


def sample_one(key: jax.Array, gmm: GMM) -> jax.Array:
    return sample(key, gmm, 1)[0]
