"""Single-exemplar "static" motion primitive.

Replaces reference motion_model/static_motion_primitive.py:28-77: when only
one training motion exists, the model is that clip's B-spline coefficients
with an identity latent space (sampling always returns the clip) and an
optional fixed time function.

Loaded from model JSON carrying a `spatial_coeffs` key (the schema the
reference wrapper dispatches on, motion_primitive_wrapper.py:66-69).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax.numpy as jnp

from .primitive import MotionPrimitive
from ..ops import bspline, gmm as gmm_ops


def load_static_primitive_json(data: Dict[str, Any],
                               name: str = "") -> MotionPrimitive:
    """Build a MotionPrimitive pytree whose GMM is a delta-like distribution
    at the zero latent and whose mean holds the clip's coefficients, so the
    whole runtime (sampling, back-projection, graph stacking) works
    unchanged."""
    coeffs = np.asarray(data["spatial_coeffs"], np.float64)
    if coeffs.ndim == 1:
        n_basis = int(data["n_basis_spatial"])
        coeffs = coeffs.reshape(n_basis, -1)
    n_basis, n_dim = coeffs.shape
    knots = np.asarray(data.get("b_spline_knots_spatial",
                                bspline.clamped_knots(n_basis, int(data["n_canonical_frames"]))),
                       np.float64)
    n_canonical = int(data["n_canonical_frames"])

    d_s = n_basis * n_dim
    mean_s = coeffs.reshape(-1)
    eigen_s = np.zeros((d_s, 1))  # one inert latent dim
    # near-delta GMM at 0 so sample() reproduces the clip
    gmm = gmm_ops.from_covars([1.0], np.zeros((1, 1)), np.eye(1)[None] * 1e-8)

    mean_t_d = np.zeros(n_canonical)
    eigen_t_d = np.zeros((n_canonical, 0))
    if "time_function" in data and data["time_function"]:
        tf = np.asarray(data["time_function"], np.float64)
        # store as exp-sum log increments so back_project reproduces it
        shifted = tf + 1.0
        prev = np.concatenate([[0.0], shifted[:-1]])
        inc = np.maximum(shifted - prev, 1e-6)
        w = np.log(inc)
        if len(w) >= n_canonical:
            mean_t_d = w[:n_canonical]
        else:
            mean_t_d = np.concatenate([w, np.zeros(n_canonical - len(w))])

    return MotionPrimitive(
        eigen_s=jnp.asarray(eigen_s, jnp.float32),
        mean_s=jnp.asarray(mean_s, jnp.float32),
        knots_s=jnp.asarray(knots, jnp.float32),
        mean_t_d=jnp.asarray(mean_t_d, jnp.float32),
        eigen_t_d=jnp.asarray(eigen_t_d, jnp.float32),
        gmm=gmm,
        name=name or str(data.get("name", "")),
        n_basis=n_basis, n_dim=n_dim, n_canonical_frames=n_canonical,
        # has_time always: zero mean_t_d == identity exp-sum warp, whose
        # inversion samples the exact integer frame grid (the unwarped
        # linspace(0, F, F) path stretches by F/(F-1), a reference quirk
        # that would break exact clip reproduction)
        n_spatial=1, n_time=0, has_time=True,
        animated_joints=tuple(data.get("animated_joints", ())),
        keyframes=tuple(sorted((str(k), int(v))
                               for k, v in data.get("keyframes", {}).items())),
    )


def make_static_model_json(frames: np.ndarray, n_basis: int = 16,
                           name: str = "") -> dict:
    """Create static-primitive JSON from a single clip (reference
    db_interface static-primitive conversion :407)."""
    frames = np.asarray(frames, np.float64)
    t, d = frames.shape
    if t < 4:
        raise ValueError(
            f"static primitive needs >= 4 frames for a cubic B-spline fit "
            f"(got {t}); the reference's scipy splrep k=3 has the same "
            f"minimum")
    # a clip shorter than n_basis makes the fit underdetermined (non-square
    # triangular solve), so clamp to the clip length
    n_basis = min(n_basis, t)
    knots = bspline.clamped_knots(n_basis, t)
    ts = jnp.arange(t, dtype=jnp.float32)
    coeffs = np.asarray(bspline.fit_coeffs(
        jnp.asarray(frames, jnp.float32), jnp.asarray(knots, jnp.float32),
        ts))
    return {"name": name,
            "spatial_coeffs": coeffs.tolist(),
            "n_basis_spatial": n_basis,
            "b_spline_knots_spatial": knots.tolist(),
            "n_canonical_frames": t}
