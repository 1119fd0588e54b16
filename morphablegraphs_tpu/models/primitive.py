"""Motion primitive as a pytree: fPCA eigenbases + GMM + B-spline knots.

Replaces the reference's `MotionPrimitive` object (reference
motion_model/motion_primitive.py:41-381) and the schema dispatch of
`MotionPrimitiveModelWrapper` (motion_primitive_wrapper.py:43-140).  All
numerics are pure jittable functions over the pytree; loading is host-side.

Supported model JSON schemas (all produced by the reference's constructor,
motion_model_constructor.py:459-523):
  * legacy v1/v2: flat keys `eigen_vectors_spatial`, `mean_spatial_vector`,
    `b_spline_knots_spatial`, `eigen_vectors_time`/`_temporal_semantic`, ...
  * v3 / mgrd-style: `{sspm: {eigen, mean, n_coeffs, n_dims, knots, ...},
    tspm: {...}, gmm: {weights, means, covars}}`.

Design choices vs the reference:
  * `translation_maxima` is baked into the eigenvectors/mean at load time
    (same trick as the reference's `_pre_scale_root_translation`,
    motion_primitive_wrapper.py:157-177), so back-projection is exactly
    `reshape(E @ alpha + mu)` — one matmul on the MXU.
  * the temporal mean/eigensplines are discretized onto the canonical frame
    grid at load (reference does this per call, motion_primitive.py:258-302).
"""

from __future__ import annotations

import functools
import json
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import bspline, gmm as gmm_ops, timewarp


@struct.dataclass
class MotionPrimitive:
    # --- traced leaves ---
    eigen_s: jax.Array  # [D_s, k_s] spatial eigenvectors (pre-scaled)
    mean_s: jax.Array  # [D_s]
    knots_s: jax.Array  # [n_basis + 4]
    mean_t_d: jax.Array  # [F] temporal mean discretized at canonical frames
    eigen_t_d: jax.Array  # [F, k_t] temporal eigensplines discretized
    gmm: gmm_ops.GMM
    # --- static metadata ---
    name: str = struct.field(pytree_node=False, default="")
    n_basis: int = struct.field(pytree_node=False, default=0)
    n_dim: int = struct.field(pytree_node=False, default=0)
    n_canonical_frames: int = struct.field(pytree_node=False, default=0)
    n_spatial: int = struct.field(pytree_node=False, default=0)
    n_time: int = struct.field(pytree_node=False, default=0)
    has_time: bool = struct.field(pytree_node=False, default=False)
    animated_joints: tuple = struct.field(pytree_node=False, default=())
    keyframes: tuple = struct.field(pytree_node=False, default=())  # ((label, frame), ...)

    @property
    def n_latent(self) -> int:
        return self.n_spatial + self.n_time

    def keyframe_for_label(self, label: str) -> Optional[int]:
        for k, v in self.keyframes:
            if k == label:
                return int(v)
        return None


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def _bake_translation_scale(eigen: np.ndarray, mean: np.ndarray,
                            maxima: np.ndarray, n_basis: int, n_dim: int):
    """Multiply the 3 root-translation rows of every coefficient block by the
    per-axis maxima (reference motion_primitive.py:255 applied at load)."""
    eigen = eigen.copy()
    mean = mean.copy()
    for c in range(n_basis):
        for axis in range(3):
            row = c * n_dim + axis
            eigen[row, :] *= maxima[axis]
            mean[row] *= maxima[axis]
    return eigen, mean


def load_primitive_json(data: Dict[str, Any], name: str = "") -> MotionPrimitive:
    """Build the pytree from a parsed model JSON dict (any schema version)."""
    if "spatial_coeffs" in data:  # single-exemplar static primitive
        from .static_primitive import load_static_primitive_json
        return load_static_primitive_json(data, name)
    if "sspm" in data:  # v3 / mgrd-style
        sspm, tspm, gmm_d = data["sspm"], data["tspm"], data["gmm"]
        eigen_s = np.asarray(sspm["eigen"], np.float64).T  # stored [k, D]
        mean_s = np.asarray(sspm["mean"], np.float64)
        n_basis = int(sspm["n_coeffs"])
        n_dim = int(sspm["n_dims"])
        knots_s = np.asarray(sspm["knots"], np.float64)
        animated = tuple(sspm.get("animated_joints", ()))
        maxima = np.ones(3)
        n_canonical = int(round(max(knots_s))) + 1
        weights = gmm_d["weights"]
        means = gmm_d["means"]
        covars = gmm_d["covars"]
        t_eigen = np.asarray(tspm.get("eigen", []), np.float64)
        t_mean = np.asarray(tspm.get("mean", []), np.float64)
        t_knots = np.asarray(tspm.get("knots", []), np.float64)
    else:  # legacy v1/v2
        eigen_s = np.asarray(data["eigen_vectors_spatial"], np.float64).T
        mean_s = np.asarray(data["mean_spatial_vector"], np.float64)
        n_basis = int(data["n_basis_spatial"])
        n_dim = int(data["n_dim_spatial"])
        knots_s = np.asarray(data["b_spline_knots_spatial"], np.float64)
        animated = tuple(data.get("animated_joints", ()))
        maxima = np.asarray(data.get("translation_maxima", [1.0, 1.0, 1.0]), np.float64)
        n_canonical = int(data["n_canonical_frames"])
        weights = data["gmm_weights"]
        means = data["gmm_means"]
        covars = data["gmm_covars"]
        if "eigen_vectors_time" in data:  # v2 naming
            t_eigen = np.asarray(data["eigen_vectors_time"], np.float64)
            t_mean = np.asarray(data["mean_time_vector"], np.float64)
            t_knots = np.asarray(data["b_spline_knots_time"], np.float64)
        else:  # v1 naming
            t_eigen = np.asarray(data.get("eigen_vectors_temporal_semantic", []), np.float64)
            t_mean = np.asarray(data.get("mean_temporal_semantic_vector", []), np.float64)
            t_knots = np.asarray(data.get("b_spline_knots_temporal_semantic", []), np.float64)

    eigen_s, mean_s = _bake_translation_scale(eigen_s, mean_s, maxima, n_basis, n_dim)
    n_spatial = eigen_s.shape[1]

    has_time = t_eigen.size > 0
    if has_time:
        # t_eigen stored [n_basis_t, k_t]; discretize on the canonical grid.
        t_eigen = t_eigen.reshape(t_eigen.shape[0], -1)
        n_time = t_eigen.shape[1]
        basis_t = bspline.basis_matrix_np(t_knots, np.arange(n_canonical))
        mean_t_d = basis_t @ t_mean
        eigen_t_d = basis_t @ t_eigen
    else:
        n_time = 0
        mean_t_d = np.zeros(n_canonical)
        eigen_t_d = np.zeros((n_canonical, 0))

    keyframes = tuple(sorted((str(k), int(v)) for k, v in data.get("keyframes", {}).items()))

    return MotionPrimitive(
        eigen_s=jnp.asarray(eigen_s, jnp.float32),
        mean_s=jnp.asarray(mean_s, jnp.float32),
        knots_s=jnp.asarray(knots_s, jnp.float32),
        mean_t_d=jnp.asarray(mean_t_d, jnp.float32),
        eigen_t_d=jnp.asarray(eigen_t_d, jnp.float32),
        gmm=gmm_ops.from_covars(weights, means, covars),
        name=name or str(data.get("name", "")),
        n_basis=n_basis,
        n_dim=n_dim,
        n_canonical_frames=n_canonical,
        n_spatial=n_spatial,
        n_time=n_time,
        has_time=has_time,
        animated_joints=animated,
        keyframes=keyframes,
    )


def load_primitive(path: str) -> MotionPrimitive:
    """Load a `*_mm.json` model file (reference naming, motion_model/__init__.py)."""
    with open(path) as f:
        data = json.load(f)
    name = path.split("/")[-1].replace("_mm.json", "")
    return load_primitive_json(data, name)


# ---------------------------------------------------------------------------
# Back-projection (pure, jittable)
# ---------------------------------------------------------------------------

@jax.jit
def back_project_spatial(prim: MotionPrimitive, alpha: jax.Array) -> jax.Array:
    """alpha [k_s] -> B-spline coefficients [n_basis, n_dim].

    reference motion_primitive.py:236-256 (scale already baked at load)."""
    coeffs = jnp.matmul(prim.eigen_s, alpha,
                        precision=jax.lax.Precision.HIGHEST) + prim.mean_s
    return coeffs.reshape(prim.n_basis, prim.n_dim)


@functools.partial(jax.jit, static_argnames=("max_frames", "speed"))
def time_function(prim: MotionPrimitive, gamma: jax.Array, max_frames: int,
                  speed: float = 1.0):
    """gamma [k_t] -> (time_function [max_frames], n_frames).

    reference motion_primitive.py:268-318 via the interp-based inversion."""
    t_can = timewarp.canonical_time_function(prim.mean_t_d, prim.eigen_t_d, gamma)
    return timewarp.invert_time_function(t_can, prim.n_canonical_frames,
                                         max_frames, speed)


@functools.partial(jax.jit, static_argnames=("max_frames", "use_time", "speed"))
def back_project(prim: MotionPrimitive, s: jax.Array, max_frames: int,
                 use_time: bool = True, speed: float = 1.0):
    """Full back-projection: latent s = (alpha | gamma) -> quaternion frames.

    Returns (frames [max_frames, n_dim], n_frames int32, time_fn [max_frames]).
    Frames beyond n_frames repeat the final canonical pose (maskable).
    reference motion_primitive.py:206-234 + motion_spline.py:71-86, fused into
    basis-matrix construction + two matmuls.
    """
    alpha = s[: prim.n_spatial]
    coeffs = back_project_spatial(prim, alpha)
    if prim.has_time and use_time:
        gamma = s[prim.n_spatial: prim.n_spatial + prim.n_time]
        t_fn, n_frames = time_function(prim, gamma, max_frames, speed)
    else:
        t_fn, n_frames = timewarp.linear_time_function(
            prim.n_canonical_frames, max_frames, speed)
    frames = bspline.evaluate(coeffs, prim.knots_s, t_fn)
    return frames, n_frames, t_fn


@jax.jit
def evaluate_at(prim: MotionPrimitive, s: jax.Array, t: jax.Array) -> jax.Array:
    """Evaluate the sample's spatial spline at canonical times t [T] -> [T, n_dim]
    (reference motion_spline.py:89-92 `evaluate`)."""
    coeffs = back_project_spatial(prim, s[: prim.n_spatial])
    return bspline.evaluate(coeffs, prim.knots_s, t)


@functools.partial(jax.jit, static_argnames=("n",))
def sample_latent(key: jax.Array, prim: MotionPrimitive, n: int = 1) -> jax.Array:
    """Draw n latent vectors from the primitive's GMM
    (reference motion_primitive.py:182-189)."""
    return gmm_ops.sample(key, prim.gmm, n)


@functools.partial(jax.jit, static_argnames=("max_frames", "use_time", "speed"))
def sample_frames(key: jax.Array, prim: MotionPrimitive, max_frames: int,
                  use_time: bool = True, speed: float = 1.0):
    """GMM sample -> frames (reference motion_primitive.py:191-204)."""
    s = sample_latent(key, prim, 1)[0]
    return back_project(prim, s, max_frames, use_time, speed)
