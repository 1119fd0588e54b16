"""Time-warp kernels: exp-sum construction + monotone inversion vs the
reference's scipy spline-fit inversion (motion_primitive.py:289-318)."""

import numpy as np
import scipy.interpolate as si

import jax.numpy as jnp

from morphablegraphs_tpu.ops import bspline, timewarp


def _reference_invert(canonical_time_function, n_canonical, speed=1.0):
    """Reimplementation of the reference inversion for oracle purposes
    (spline fit of t' vs t, sampled on linspace(1, t[-2], round(t[-2])))."""
    x_sample = np.arange(n_canonical)
    tck = si.splrep(canonical_time_function, x_sample, w=None, k=3)
    num = int(np.round(canonical_time_function[-2]) * (1.0 / speed))
    frames = np.linspace(1, canonical_time_function[-2], num)
    out = si.splev(frames, tck)
    out = np.insert(out, 0, 0)
    out = np.insert(out, len(out), n_canonical - 1)
    return out


def _make_warp(rng, n_canonical=60, k_t=3):
    n_basis_t = 8
    knots_t = bspline.clamped_knots(n_basis_t, n_canonical)
    mean_coeffs = rng.standard_normal(n_basis_t) * 0.05
    eigen_coeffs = rng.standard_normal((n_basis_t, k_t)) * 0.05
    t = np.arange(n_canonical, dtype=np.float32)
    basis = np.asarray(bspline.basis_matrix(jnp.asarray(knots_t, jnp.float32), jnp.asarray(t)))
    mean_t_d = basis @ mean_coeffs
    eigen_t_d = basis @ eigen_coeffs
    return mean_t_d, eigen_t_d


def test_canonical_time_function_monotone():
    rng = np.random.default_rng(0)
    mean_t_d, eigen_t_d = _make_warp(rng)
    gamma = rng.standard_normal(3) * 0.5
    t = np.asarray(timewarp.canonical_time_function(
        jnp.asarray(mean_t_d, jnp.float32), jnp.asarray(eigen_t_d, jnp.float32),
        jnp.asarray(gamma, jnp.float32)))
    assert np.all(np.diff(t) > 0)
    # t[0] = exp(w0) - 1 > -1 always (can be slightly negative, same as the
    # reference's construction; inversion only samples from t=1 onward).
    assert t[0] > -1.0


def test_inversion_matches_reference_sampling():
    rng = np.random.default_rng(1)
    n_canonical = 60
    mean_t_d, eigen_t_d = _make_warp(rng, n_canonical)
    for seed in range(5):
        gamma = np.random.default_rng(seed).standard_normal(3) * 0.3
        t_can = np.asarray(timewarp.canonical_time_function(
            jnp.asarray(mean_t_d, jnp.float32), jnp.asarray(eigen_t_d, jnp.float32),
            jnp.asarray(gamma, jnp.float32)), dtype=np.float64)
        ref = _reference_invert(t_can, n_canonical)
        ours, n_frames = timewarp.invert_time_function(
            jnp.asarray(t_can, jnp.float32), n_canonical, max_frames=256)
        n_frames = int(n_frames)
        assert n_frames == len(ref), (n_frames, len(ref))
        got = np.asarray(ours)[:n_frames]
        # Linear vs cubic inversion: must agree within the 1e-3-ish budget
        # SURVEY §7 allots to this substitution (frame indices in [0, 59]).
        assert np.max(np.abs(got - ref)) < 0.05
        # Clamped tail
        assert np.all(np.asarray(ours)[n_frames:] == n_canonical - 1)


def test_z_transform_inverts_expsum():
    """Training z-transform must be the exact inverse of the synthesis
    exp-sum: z_transform(cumsum(exp(w)) - 1) == w."""
    rng = np.random.default_rng(2)
    w = rng.standard_normal(50) * 0.3
    t = np.cumsum(np.exp(w)) - 1.0
    back = np.asarray(timewarp.z_transform(jnp.asarray(t, jnp.float32)))
    assert np.max(np.abs(back - w)) < 1e-4


def test_savgol_smooth_matches_scipy():
    """savgol_smooth / smooth_time_function_np vs scipy.signal.savgol_filter
    (the reference's _smooth_time_function, motion_primitive.py:320-333)."""
    from scipy.signal import savgol_filter
    rng = np.random.default_rng(3)
    tf = np.cumsum(rng.uniform(0.2, 1.5, size=97))
    ref = savgol_filter(tf, 15, 3)
    ours_np = timewarp.smooth_time_function_np(tf)
    assert np.abs(ours_np - ref).max() < 1e-9
    ours_jax = np.asarray(timewarp.savgol_smooth(jnp.asarray(tf)))
    assert np.abs(ours_jax - ref).max() < 1e-4
    # batched
    tfs = np.cumsum(rng.uniform(0.2, 1.5, size=(5, 61)), axis=-1)
    refb = savgol_filter(tfs, 15, 3, axis=-1)
    oursb = np.asarray(timewarp.savgol_smooth(jnp.asarray(tfs)))
    assert np.abs(oursb - refb).max() < 1e-4
    # shorter than the window: identity (scipy would raise)
    short = tf[:10]
    assert np.allclose(timewarp.smooth_time_function_np(short), short)
