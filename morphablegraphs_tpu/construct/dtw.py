"""Dynamic time warping over transform-invariant point-cloud distance.

Replaces reference construction/dtw.py:28-198.  The O(N*M*J) pairwise
distance grid — the training hot loop (SURVEY.md §3.2) — is one batched
closed-form 2D registration in JAX (vectorized over all (i, j) frame pairs);
the O(N*M) DP and path backtracking run in numpy (sequentially dependent,
small, host-side).

The distance is Kovar-style: optimal rotation about Y + XZ translation
aligning cloud B onto cloud A, then RMS point distance (the semantics of
anim_utils `_transform_invariant_point_cloud_distance` used by the
reference).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def pair_distance(a: jax.Array, b: jax.Array, weights: jax.Array = None) -> jax.Array:
    """Transform-invariant distance between point clouds a, b: [..., J, 3].

    Closed-form optimal theta (rotation about Y) and XZ offset minimizing
    sum ||a_i - T(b_i)||^2 (Kovar et al. 2002 registration), then RMS
    distance.  Batched over leading axes.
    """
    j = a.shape[-2]
    if weights is None:
        w = jnp.full(a.shape[:-1], 1.0 / j, dtype=a.dtype)
    else:
        w = jnp.broadcast_to(weights / jnp.sum(weights), a.shape[:-1])
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    sw = jnp.sum(w, axis=-1)
    abar_x = jnp.sum(w * ax, -1)
    abar_z = jnp.sum(w * az, -1)
    bbar_x = jnp.sum(w * bx, -1)
    bbar_z = jnp.sum(w * bz, -1)
    num = jnp.sum(w * (ax * bz - bx * az), -1) - (abar_x * bbar_z - bbar_x * abar_z) / sw
    den = jnp.sum(w * (ax * bx + az * bz), -1) - (abar_x * bbar_x + abar_z * bbar_z) / sw
    theta = jnp.arctan2(num, den)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    x0 = (abar_x - bbar_x * ct - bbar_z * st) / sw
    z0 = (abar_z + bbar_x * st - bbar_z * ct) / sw
    # apply T to b: rotation about Y by theta + (x0, 0, z0)
    bx_t = ct[..., None] * bx + st[..., None] * bz + x0[..., None]
    bz_t = -st[..., None] * bx + ct[..., None] * bz + z0[..., None]
    d2 = (ax - bx_t) ** 2 + (ay - by) ** 2 + (az - bz_t) ** 2
    return jnp.sqrt(jnp.sum(w * d2, axis=-1))


@jax.jit
def distance_grid(x: jax.Array, y: jax.Array) -> jax.Array:
    """All-pairs distance grid: x [N, J, 3], y [M, J, 3] -> [N, M]
    (reference get_distgrid, dtw.py:34-53, minus the cumulative pass)."""
    return pair_distance(x[:, None], y[None, :])


def window_mask(n: int, m: int, window: str = "none",
                band: Optional[int] = None) -> np.ndarray:
    """Global path-constraint windows of the legacy DTW class (reference
    preprocessing/motion_dtw.py:213-260, which delegated to the GPL R `dtw`
    package; natively: True = cell allowed).

      * "none": no constraint;
      * "sakoechiba": |i - j| <= band (Sakoe & Chiba 1978);
      * "slantedband": band around the main diagonal scaled to the grid
        aspect, |j - i*m/n| <= band;
      * "itakura": the Itakura parallelogram (local slope between 1/2 and 2
        measured from both endpoints).
    """
    if window == "none":
        return np.ones((n, m), bool)
    i = np.arange(n)[:, None].astype(np.float64)
    j = np.arange(m)[None, :].astype(np.float64)
    if band is None:
        band = max(1, int(0.1 * max(n, m)))
    if window == "sakoechiba":
        return np.abs(i - j) <= band
    if window == "slantedband":
        return np.abs(j - i * (m - 1) / max(n - 1, 1)) <= band
    if window == "itakura":
        return ((j <= 2 * i + 1) & (i <= 2 * j + 1)
                & (m - 1 - j <= 2 * (n - 1 - i) + 1)
                & (n - 1 - i <= 2 * (m - 1 - j) + 1))
    raise ValueError(f"unknown DTW window: {window}")


def accumulate(grid: np.ndarray, window: str = "none",
               band: Optional[int] = None) -> np.ndarray:
    """Cumulative DP distances (reference get_distgrid second half), with
    optional global window constraints (cells outside the window = inf)."""
    s = np.asarray(grid, np.float64)
    n, m = s.shape
    if window != "none":
        s = np.where(window_mask(n, m, window, band), s, np.inf)
    d = np.zeros_like(s)
    d[0, 0] = s[0, 0]
    d[1:, 0] = np.cumsum(s[1:, 0]) + s[0, 0]
    d[0, 1:] = np.cumsum(s[0, 1:]) + s[0, 0]
    for i in range(1, n):
        row_prev = d[i - 1]
        row = d[i]
        for jj in range(1, m):
            row[jj] = min(row_prev[jj - 1], row_prev[jj], row[jj - 1]) + s[i, jj]
    return d


def find_path(d: np.ndarray) -> List[tuple]:
    """Backtrack the optimal warping path (reference find_path, dtw.py:56-75)."""
    n, m = d.shape
    xi, yi = n - 1, m - 1
    path = [(xi, yi)]
    while xi > 0 or yi > 0:
        if xi == 0:
            yi -= 1
        elif yi == 0:
            xi -= 1
        else:
            candidates = ((xi - 1, yi - 1), (xi - 1, yi), (xi, yi - 1))
            vals = [d[c] for c in candidates]
            xi, yi = candidates[int(np.argmin(vals))]
        path.insert(0, (xi, yi))
    return path


def run_dtw(x: np.ndarray, y: np.ndarray, window: str = "none",
            band: Optional[int] = None):
    """Full DTW: (path, cumulative grid).  x, y: [N/M, J, 3] point clouds."""
    grid = np.asarray(distance_grid(jnp.asarray(x, jnp.float32),
                                    jnp.asarray(y, jnp.float32)))
    d = accumulate(grid, window=window, band=band)
    return find_path(d), d


def get_warping_function(path) -> List[int]:
    """Path -> per-reference-frame source index (reference dtw.py:84-113:
    for each x row take the LAST matched y index)."""
    warping = {}
    for (xi, yi) in path:
        warping[xi] = yi  # later pairs overwrite -> last index per row
    return [warping[i] for i in range(max(warping) + 1)]


def warp_motion(frames: np.ndarray, warping_function) -> np.ndarray:
    return np.asarray([frames[idx] for idx in warping_function])


def find_optimal_dtw(point_clouds: Dict, mean_key=None) -> Dict:
    """DTW of every motion against a reference (reference
    find_optimal_dtw_async, dtw.py:175-197: when mean_key is given only that
    reference is tried; otherwise the reference minimizing total path cost
    wins).  Returns {key: path}."""
    keys = list(point_clouds.keys())
    ref_keys = [mean_key] if mean_key in point_clouds else keys
    best_key, best_cost, best_results = None, np.inf, None
    for rk in ref_keys:
        results = {}
        cost = 0.0
        for k in keys:
            path, d = run_dtw(point_clouds[rk], point_clouds[k])
            results[k] = path
            # total path cost IS the final accumulated-DP cell; summing the
            # cumulative grid along the path grows ~quadratically with path
            # length and penalizes long references superlinearly
            cost += float(d[-1, -1])
        if cost < best_cost:
            best_key, best_cost, best_results = rk, cost, results
    return best_results
