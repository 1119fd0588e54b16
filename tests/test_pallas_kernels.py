"""Pallas kernel validation (interpret mode on CPU) vs the XLA oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.ops import pallas_kernels as pk


def test_crowd_back_project_matches_xla():
    rng = np.random.default_rng(0)
    c, k, n_basis, n_dim, t = 128, 7, 12, 19, 48
    d = n_basis * n_dim
    alphas = jnp.asarray(rng.standard_normal((c, k)), jnp.float32)
    eigen = jnp.asarray(rng.standard_normal((d, k)) * 0.3, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(d), jnp.float32)
    basis = jnp.asarray(rng.random((t, n_basis)), jnp.float32)
    ours = pk.crowd_back_project(alphas, eigen, mean, basis,
                                 interpret=True)
    ref = pk.crowd_back_project_xla(alphas, eigen, mean, basis)
    assert ours.shape == (c, t, n_dim)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-4)


def test_gmm_scores_matches_xla():
    from sklearn.mixture._gaussian_mixture import _compute_precision_cholesky
    rng = np.random.default_rng(1)
    n, d, k = 512, 7, 3
    w = rng.random(k)
    w /= w.sum()
    means = rng.standard_normal((k, d))
    covs = []
    for _ in range(k):
        a = rng.standard_normal((d, d)) * 0.3
        covs.append(a @ a.T + np.eye(d) * 0.5)
    prec = _compute_precision_cholesky(np.stack(covs), "full")
    x = rng.standard_normal((n, d)).astype(np.float32)
    ours = pk.gmm_scores(jnp.asarray(x), jnp.asarray(w, jnp.float32),
                         jnp.asarray(means, jnp.float32),
                         jnp.asarray(prec, jnp.float32),
                         block_n=128, interpret=True)
    ref = pk.gmm_scores_xla(jnp.asarray(x), jnp.asarray(w, jnp.float32),
                            jnp.asarray(means, jnp.float32),
                            jnp.asarray(prec, jnp.float32))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)
