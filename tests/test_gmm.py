"""GMM kernels vs sklearn oracle (log-prob must match to 1e-6 per SURVEY §7)."""

import numpy as np
from sklearn.mixture import GaussianMixture
from sklearn.mixture._gaussian_mixture import _compute_precision_cholesky

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.ops import gmm as gmm_ops


def _make_sklearn_gmm(rng, k=3, d=7):
    w = rng.random(k)
    w /= w.sum()
    means = rng.standard_normal((k, d)) * 2.0
    covs = []
    for _ in range(k):
        a = rng.standard_normal((d, d)) * 0.3
        covs.append(a @ a.T + np.eye(d) * 0.5)
    covars = np.stack(covs)
    g = GaussianMixture(n_components=k, covariance_type="full")
    g.weights_ = w
    g.means_ = means
    g.covariances_ = covars
    g.precisions_cholesky_ = _compute_precision_cholesky(covars, "full")
    g.converged_ = True
    return g


def test_log_prob_matches_sklearn():
    rng = np.random.default_rng(0)
    sk = _make_sklearn_gmm(rng)
    ours = gmm_ops.from_covars(sk.weights_, sk.means_, sk.covariances_)
    x = rng.standard_normal((200, 7))
    ref = sk.score_samples(x)
    got = np.asarray(gmm_ops.log_prob(ours, jnp.asarray(x, jnp.float32)))
    assert np.max(np.abs(got - ref)) < 1e-3  # f32 kernel vs f64 oracle
    # score (mean log-likelihood)
    assert abs(float(gmm_ops.score(ours, jnp.asarray(x, jnp.float32))) - sk.score(x)) < 1e-3


def test_sampling_distribution():
    rng = np.random.default_rng(1)
    sk = _make_sklearn_gmm(rng, k=2, d=3)
    ours = gmm_ops.from_covars(sk.weights_, sk.means_, sk.covariances_)
    key = jax.random.PRNGKey(0)
    s = np.asarray(gmm_ops.sample(key, ours, 20000))
    # Moments of the mixture
    mean_ref = np.sum(sk.weights_[:, None] * sk.means_, axis=0)
    second_ref = np.zeros((3, 3))
    for k in range(2):
        second_ref += sk.weights_[k] * (sk.covariances_[k] + np.outer(sk.means_[k], sk.means_[k]))
    cov_ref = second_ref - np.outer(mean_ref, mean_ref)
    assert np.max(np.abs(s.mean(axis=0) - mean_ref)) < 0.1
    assert np.max(np.abs(np.cov(s.T) - cov_ref)) < 0.2


def test_padded_components_are_inert():
    """Zero-weight padded components must not affect log_prob (graph stacking
    pads all primitives' GMMs to the same K)."""
    rng = np.random.default_rng(2)
    sk = _make_sklearn_gmm(rng, k=2, d=4)
    base = gmm_ops.from_covars(sk.weights_, sk.means_, sk.covariances_)
    # Pad with a zero-weight identity component
    pad_w = np.concatenate([sk.weights_, [0.0]])
    pad_mu = np.concatenate([sk.means_, np.zeros((1, 4))])
    pad_cov = np.concatenate([sk.covariances_, np.eye(4)[None]])
    padded = gmm_ops.from_covars(pad_w, pad_mu, pad_cov)
    x = rng.standard_normal((50, 4)).astype(np.float32)
    a = np.asarray(gmm_ops.log_prob(base, jnp.asarray(x)))
    b = np.asarray(gmm_ops.log_prob(padded, jnp.asarray(x)))
    assert np.max(np.abs(a - b)) < 1e-4
