"""B-spline kernel vs scipy.interpolate oracle (SURVEY.md §4 unit strategy)."""

import numpy as np
import pytest
import scipy.interpolate as si

import jax.numpy as jnp

from morphablegraphs_tpu.ops import bspline


def _random_spline(rng, n_basis=16, n_frames=100, n_channels=5):
    knots = bspline.clamped_knots(n_basis, n_frames)
    coeffs = rng.standard_normal((n_basis, n_channels))
    return knots, coeffs


def test_knots_match_reference_layout():
    knots = bspline.clamped_knots(16, 100)
    assert knots.shape == (20,)
    assert np.all(knots[:4] == 0)
    assert np.all(knots[-4:] == 99)
    assert np.allclose(knots[3:-3], np.linspace(0, 99, 14))


@pytest.mark.parametrize("n_basis,n_frames", [(8, 40), (16, 100), (32, 250)])
def test_eval_matches_scipy(n_basis, n_frames):
    rng = np.random.default_rng(0)
    knots, coeffs = _random_spline(rng, n_basis, n_frames)
    t = np.linspace(0, n_frames - 1, 301)
    ours = np.asarray(bspline.evaluate(jnp.asarray(coeffs, jnp.float32),
                                       jnp.asarray(knots, jnp.float32),
                                       jnp.asarray(t, jnp.float32)))
    ref = np.stack([si.splev(t, (knots, coeffs[:, c], 3)) for c in range(coeffs.shape[1])], axis=1)
    assert np.max(np.abs(ours - ref)) < 1e-3


def test_eval_endpoints_exact():
    rng = np.random.default_rng(1)
    knots, coeffs = _random_spline(rng)
    t = np.array([0.0, 99.0])
    ours = np.asarray(bspline.evaluate(jnp.asarray(coeffs, jnp.float32),
                                       jnp.asarray(knots, jnp.float32),
                                       jnp.asarray(t, jnp.float32)))
    # Clamped spline interpolates its first/last coefficients at the ends.
    assert np.allclose(ours[0], coeffs[0], atol=1e-4)
    assert np.allclose(ours[1], coeffs[-1], atol=1e-4)


def test_basis_partition_of_unity():
    knots = bspline.clamped_knots(16, 100)
    t = np.linspace(0, 99, 500)
    b = np.asarray(bspline.basis_matrix(jnp.asarray(knots, jnp.float32),
                                        jnp.asarray(t, jnp.float32)))
    assert np.allclose(b.sum(axis=1), 1.0, atol=1e-4)
    assert np.all(b >= -1e-6)


def test_fit_roundtrip():
    rng = np.random.default_rng(2)
    n_basis, n_frames = 12, 80
    knots = bspline.clamped_knots(n_basis, n_frames)
    coeffs = rng.standard_normal((n_basis, 4))
    t = np.arange(n_frames, dtype=np.float32)
    y = bspline.evaluate(jnp.asarray(coeffs, jnp.float32), jnp.asarray(knots, jnp.float32), jnp.asarray(t))
    fitted = bspline.fit_coeffs(y, jnp.asarray(knots, jnp.float32), jnp.asarray(t))
    assert np.max(np.abs(np.asarray(fitted) - coeffs)) < 1e-2
    y2 = bspline.evaluate(fitted, jnp.asarray(knots, jnp.float32), jnp.asarray(t))
    assert np.max(np.abs(np.asarray(y2 - y))) < 1e-4
