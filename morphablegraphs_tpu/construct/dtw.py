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


def _pad_clouds(point_clouds: Dict):
    """Stack ragged per-motion clouds [T_i, J, 3] into one padded array
    [K, T_max, J, 3] + true lengths (padding rows repeat the last frame so
    they produce finite distances; the DP only reads the valid block)."""
    keys = list(point_clouds.keys())
    lengths = [int(np.shape(point_clouds[k])[0]) for k in keys]
    t_max = max(lengths)
    j = np.shape(point_clouds[keys[0]])[1]
    arr = np.zeros((len(keys), t_max, j, 3), np.float32)
    for i, k in enumerate(keys):
        c = np.asarray(point_clouds[k], np.float32)
        arr[i, : len(c)] = c
        arr[i, len(c):] = c[-1]
    return keys, arr, np.asarray(lengths)


@jax.jit
def _pair_grids(clouds: jax.Array, a_idx: jax.Array,
                b_idx: jax.Array) -> jax.Array:
    """Distance grids for index pairs: clouds [K, T, J, 3] -> [P, T, T]."""
    return jax.vmap(lambda a, b: distance_grid(clouds[a], clouds[b]))(
        a_idx, b_idx)


def find_optimal_dtw(point_clouds: Dict, mean_key=None, mesh=None) -> Dict:
    """DTW of every motion against a reference (reference
    find_optimal_dtw_async, dtw.py:175-197: when mean_key is given only that
    reference is tried; otherwise the reference minimizing total path cost
    wins).  Returns {key: path}.

    All pairwise distance grids — the training hot loop the reference
    spreads over a ProcessPoolExecutor — compute in ONE padded device
    launch (K^2 ragged per-pair dispatches would also mean K^2 XLA
    compiles); only the tiny sequential DP runs per pair on the host.
    Pass a `jax.sharding.Mesh` to shard the pair axis across devices
    (clouds replicate, pairs split — zero collectives)."""
    keys = list(point_clouds.keys())
    ref_keys = [mean_key] if mean_key in point_clouds else keys
    keys_p, clouds, lengths = _pad_clouds(point_clouds)
    idx_of = {k: i for i, k in enumerate(keys_p)}
    pairs = [(idx_of[rk], idx_of[k]) for rk in ref_keys for k in keys]
    a_idx = np.asarray([p[0] for p in pairs], np.int32)
    b_idx = np.asarray([p[1] for p in pairs], np.int32)
    n_pairs = len(pairs)
    clouds_j = jnp.asarray(clouds)
    n_dev = mesh.devices.size if mesh is not None else 1
    # chunk the pair axis: one fixed shape (= one compile) regardless of
    # K^2, and grids stream back instead of materializing [K^2, T, T]
    chunk = max(n_dev, min(256 // max(n_dev, 1) * n_dev, n_pairs))
    chunk = ((chunk + n_dev - 1) // n_dev) * n_dev
    if mesh is not None and n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = NamedSharding(mesh, P(mesh.axis_names[0]))
        clouds_j = jax.device_put(clouds_j, NamedSharding(mesh, P()))
    else:
        dp = None
    grid_chunks = []
    for c0 in range(0, n_pairs, chunk):
        a_c = a_idx[c0: c0 + chunk]
        b_c = b_idx[c0: c0 + chunk]
        pad = chunk - len(a_c)
        if pad:
            a_c = np.concatenate([a_c, np.zeros(pad, np.int32)])
            b_c = np.concatenate([b_c, np.zeros(pad, np.int32)])
        a_j, b_j = jnp.asarray(a_c), jnp.asarray(b_c)
        if dp is not None:
            a_j, b_j = jax.device_put(a_j, dp), jax.device_put(b_j, dp)
        g = np.asarray(_pair_grids(clouds_j, a_j, b_j))
        grid_chunks.append(g[: chunk - pad])
    grids = np.concatenate(grid_chunks) if len(grid_chunks) > 1 \
        else grid_chunks[0]

    best_key, best_cost, best_results = None, np.inf, None
    p = 0
    for rk in ref_keys:
        results = {}
        cost = 0.0
        for k in keys:
            g = grids[p][: lengths[idx_of[rk]], : lengths[idx_of[k]]]
            p += 1
            d = accumulate(g)
            results[k] = find_path(d)
            # total path cost IS the final accumulated-DP cell; summing the
            # cumulative grid along the path grows ~quadratically with path
            # length and penalizes long references superlinearly
            cost += float(d[-1, -1])
        if cost < best_cost:
            best_key, best_cost, best_results = rk, cost, results
    return best_results
