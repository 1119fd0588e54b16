"""Functional PCA: spline fitting + PCA for spatial and temporal data.

Replaces reference construction/fpca/ (pca_functional_data.py:34-176,
fpca_spatial_data.py, fpca_time_semantic.py:69-228, utils.py:33-66):

  * per-sample per-channel cubic B-spline fit (scipy `splrep` loops in the
    reference) becomes one batched least-squares against the clamped basis
    matrix (`ops.bspline.fit_coeffs`), vmapped over samples;
  * PCA is an SVD on the centered coefficient matrix with the reference's
    variance-fraction cut (fraction=0.95 default).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import bspline, timewarp


@dataclasses.dataclass
class PCAResult:
    eigenvectors: np.ndarray  # [k, D] rows (reference storage layout)
    mean: np.ndarray  # [D]
    projections: np.ndarray  # [n_samples, k] low-dim coordinates
    explained: np.ndarray  # [k] variance ratios


def run_pca(data: np.ndarray, fraction: float = 0.95,
            n_components: Optional[int] = None) -> PCAResult:
    """Centered SVD PCA keeping `fraction` of variance (reference
    construction/fpca/utils.py:33-54)."""
    data = np.asarray(data, np.float64)
    mean = data.mean(axis=0)
    centered = data - mean
    u, s, vt = np.linalg.svd(centered, full_matrices=False)
    var = s ** 2
    ratios = var / max(var.sum(), 1e-12)
    if n_components is None:
        cum = np.cumsum(ratios)
        n_components = int(np.searchsorted(cum, fraction) + 1)
        n_components = min(n_components, len(s))
    eig = vt[:n_components]  # [k, D]
    proj = centered @ eig.T
    return PCAResult(eigenvectors=eig, mean=mean, projections=proj,
                     explained=ratios[:n_components])


def fit_functional_data(motions: np.ndarray, n_basis: int) -> np.ndarray:
    """Batched B-spline fit: motions [n_samples, T, D] -> coeffs
    [n_samples, n_basis, D] (reference FunctionalData
    convert_motions_to_functional_data via per-channel splrep)."""
    motions = np.asarray(motions, np.float32)
    n_samples, t, d = motions.shape
    knots = jnp.asarray(bspline.clamped_knots(n_basis, t), jnp.float32)
    ts = jnp.arange(t, dtype=jnp.float32)
    fit = jax.vmap(lambda y: bspline.fit_coeffs(y, knots, ts))
    return np.asarray(fit(jnp.asarray(motions)))


@dataclasses.dataclass
class SpatialFPCAData:
    eigenvectors: np.ndarray  # [k, n_basis * n_dim]
    mean: np.ndarray  # [n_basis * n_dim]
    parameters: np.ndarray  # [n_samples, k]
    n_basis: int
    n_dim: int
    scale_vec: list


def fpca_spatial(motions: np.ndarray, n_basis: int,
                 fraction: float = 0.95,
                 n_components: Optional[int] = None) -> SpatialFPCAData:
    """Spatial fPCA with root-translation normalization baked back in
    (reference run_spatial_dimension_reduction,
    motion_model_constructor.py:355-393 + construction/utils.py:114-147).

    motions: [n_samples, T, D] aligned quaternion frames.
    """
    motions = np.asarray(motions, np.float64)
    n_samples, t, d = motions.shape
    # normalize root translation to [-1, 1] (scale_vec)
    scale_vec = np.abs(motions[..., :3]).reshape(-1, 3).max(axis=0)
    scale_vec = np.where(scale_vec == 0, 1.0, scale_vec)
    scaled = motions.copy()
    scaled[..., :3] /= scale_vec
    # hemisphere-align quaternions against the first frame of the first
    # motion (reference align_quaternion_frames, construction/utils.py:162).
    # ONE flip per (sample, joint), decided at frame 0: the loader already
    # sign-fixed each clip sequentially, so flipping only a suffix of
    # frames (as a per-frame dot against the fixed ref would for joints
    # that rotate past 90 degrees mid-clip, e.g. turn primitives) would
    # reintroduce a q -> -q jump and make the spline fit ring around it.
    ref = scaled[0, 0]
    n_joints = (d - 3) // 4
    for j in range(n_joints):
        sl = slice(3 + 4 * j, 7 + 4 * j)
        dots0 = np.sum(scaled[:, 0, sl] * ref[sl], axis=-1)  # [n_samples]
        scaled[:, :, sl] = np.where((dots0 < 0)[:, None, None],
                                    -scaled[:, :, sl], scaled[:, :, sl])

    coeffs = fit_functional_data(scaled, n_basis)  # [n, n_basis, D]
    flat = coeffs.reshape(n_samples, n_basis * d)
    pca = run_pca(flat, fraction, n_components)

    # bake the scale back into eigenvectors + mean (reference
    # scale_root_translation_in_fpca_data) so exported models carry
    # translation_maxima == [1, 1, 1]
    eig = pca.eigenvectors.copy()
    mean = pca.mean.copy()
    for c in range(n_basis):
        for axis in range(3):
            col = c * d + axis
            eig[:, col] *= scale_vec[axis]
            mean[col] *= scale_vec[axis]
    return SpatialFPCAData(eigenvectors=eig, mean=mean,
                           parameters=pca.projections, n_basis=n_basis,
                           n_dim=d, scale_vec=[1.0, 1.0, 1.0])


@dataclasses.dataclass
class TemporalFPCAData:
    eigenvectors: np.ndarray  # [n_basis, k]
    mean: np.ndarray  # [n_basis]
    parameters: np.ndarray  # [n_samples, k]
    n_basis: int


def monotonic_indices(indices: np.ndarray, epsilon: float = 0.01) -> np.ndarray:
    """Enforce strict monotonicity with fixed endpoints (reference
    fpca_time_semantic.py:84-130).

    The reference's forward+backward epsilon passes can leave interior
    values below w[0] when a long constant run's tail gap is smaller than
    epsilon * run_length (the backward pass pushes them under the start) —
    a final check falls back to a linear ramp between the endpoints, which
    is always strictly monotone."""
    w = np.asarray(indices, np.float64).copy()
    for i in range(1, len(w) - 1):
        while w[i] <= w[i - 1]:
            w[i] += epsilon
    for i in range(len(w) - 2, 0, -1):
        if w[i] >= w[i + 1]:
            w[i] = w[i + 1] - epsilon
    if np.any(np.diff(w) <= 0):
        # linear-ramp fallback; when the warp's end is at or below its start
        # (w[-1] <= w[0], a degenerate input) a plain ramp to w[-1] would not
        # be strictly increasing — ramp to an epsilon-per-step ceiling instead
        hi = w[-1] if w[-1] > w[0] else w[0] + epsilon * (len(w) - 1)
        w = np.linspace(w[0], hi, len(w))
    return w


def fpca_temporal(warping_functions, n_basis: int = 8,
                  n_components: int = 3) -> TemporalFPCAData:
    """Temporal fPCA: warping functions -> z-transform -> spline fit -> PCA
    (reference FPCATimeSemantic.functional_pca, fpca_time_semantic.py:152-200).
    """
    curves = []
    t_len = max(len(w) for w in warping_functions)
    for w in warping_functions:
        w = monotonic_indices(np.asarray(w, np.float64))
        if len(w) != t_len:  # resample to common length
            w = np.interp(np.linspace(0, len(w) - 1, t_len),
                          np.arange(len(w)), w)
            w = monotonic_indices(w)
        z = np.asarray(timewarp.z_transform(jnp.asarray(w, jnp.float32)))
        curves.append(z)
    curves = np.stack(curves)  # [n, T]
    coeffs = fit_functional_data(curves[..., None], n_basis)[..., 0]  # [n, n_basis]
    n_components = min(n_components, len(curves) - 1) or 1
    pca = run_pca(coeffs, n_components=n_components)
    return TemporalFPCAData(eigenvectors=pca.eigenvectors.T, mean=pca.mean,
                            parameters=pca.projections, n_basis=n_basis)
