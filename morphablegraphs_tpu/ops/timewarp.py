"""Temporal fPCA warping kernels.

The reference reconstructs a monotone time-warp t(t') from a temporal latent
vector gamma by the exp-sum construction, then *inverts* it with a scipy
spline fit and resamples (reference motion_model/motion_primitive.py:289-318).
The spline-fit inversion is hostile to jit; since t(t') is strictly monotone,
we invert with `jnp.interp` on the dense cumsum instead (mathematically the
same sampling up to interpolation order; validated <1e-3 in tests, the hard
part called out in SURVEY.md §7).

Variable output length (round(t[-2]) frames) is data-dependent, so jitted
callers get a fixed `max_frames` buffer plus a valid-frame count; indices past
the end clamp to the final canonical frame, which keeps downstream spline
evaluation well-defined and maskable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interp_cubic(xq: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Cubic Hermite interpolation with central-difference slopes on a
    monotone grid — a closer match to the reference's `splrep`-based
    inversion than linear interp (keeps the <1e-3 pose budget,
    BASELINE.md config 1).

    TPU-shaped: the interval index comes from a comparison-matrix sum and
    the 8 neighbour values from ONE one-hot matmul against statically
    shifted copies of the grid.  The obvious searchsorted + gather
    formulation lowers to binary-search gathers that dominate the whole
    crowd-synthesis step under vmap (~10x this op's cost).
    """
    n = x.shape[-1]
    cmp = x[None, :] <= xq[..., None]  # [Q, n]
    i = jnp.clip(jnp.sum(cmp, axis=-1) - 1, 0, n - 2)  # [Q]
    onehot = jax.nn.one_hot(i, n, dtype=x.dtype)  # [Q, n]
    # statically shifted grids with edge clamping (no gathers)
    x_p1 = jnp.concatenate([x[1:], x[-1:]])
    x_m1 = jnp.concatenate([x[:1], x[:-1]])
    x_p2 = jnp.concatenate([x[2:], x[-1:], x[-1:]])
    y_p1 = jnp.concatenate([y[1:], y[-1:]])
    y_m1 = jnp.concatenate([y[:1], y[:-1]])
    y_p2 = jnp.concatenate([y[2:], y[-1:], y[-1:]])
    table = jnp.stack([x, x_p1, y, y_p1, x_m1, x_p2, y_m1, y_p2], axis=1)
    vals = jnp.matmul(onehot, table, precision=jax.lax.Precision.HIGHEST)  # [Q, 8]
    x0, x1, y0, y1, xm, xp, ym, yp = (vals[..., j] for j in range(8))
    h = jnp.maximum(x1 - x0, 1e-8)
    t = jnp.clip((xq - x0) / h, 0.0, 1.0)
    # central-difference slopes (one-sided at the ends)
    m0 = (y1 - ym) / jnp.maximum(x1 - xm, 1e-8)
    m1 = (yp - y0) / jnp.maximum(xp - x0, 1e-8)
    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + t
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    return h00 * y0 + h10 * h * m0 + h01 * y1 + h11 * h * m1


def canonical_time_function(mean_t_d: jax.Array, eigen_t_d: jax.Array,
                            gamma: jax.Array) -> jax.Array:
    """t(t') = cumsum(exp(mean_t + T_discrete @ gamma)) - 1.

    mean_t_d: [F] temporal mean spline discretized at canonical frames.
    eigen_t_d: [F, k_t] temporal eigensplines discretized likewise.
    Returns [F] strictly increasing canonical time function with t[0] >= 0.

    Mirrors reference motion_primitive.py:289-302 (including the -1 shift that
    undoes the +1 applied during training's z-transform).
    """
    w = mean_t_d + eigen_t_d @ gamma
    return jnp.cumsum(jnp.exp(w)) - 1.0


def invert_time_function(t_canonical: jax.Array, n_canonical: int,
                         max_frames: int, speed: float = 1.0):
    """Invert t(t') -> t'(t) and sample on the output frame grid.

    Reference semantics (motion_primitive.py:304-318): the output has
    `round(t[-2]) * (1/speed)` interior frames sampled at
    linspace(1, t[-2], num), bracketed by an exact 0 first frame and an exact
    (n_canonical-1) last frame.

    Returns (time_function [max_frames], n_frames int32).  Entries at index
    >= n_frames are clamped to n_canonical - 1.
    """
    t_end = t_canonical[-2]
    # integer interior count, truncated like the reference's
    # int(round(t[-2]) * (1/speed)) — a fractional num mis-spaces
    # linspace(1, t_end, num) by up to a third of a canonical frame at
    # speed != 1
    num = jnp.floor(jnp.round(t_end) * (1.0 / speed))
    num = jnp.maximum(num, 1.0)
    # + leading 0 and trailing end frame; clamped to the buffer (strong time
    # stretches would otherwise report more frames than the buffer holds)
    n_frames = jnp.minimum((num + 2.0).astype(jnp.int32), max_frames)

    # Interior sample positions: linspace(1, t_end, num) realized on a fixed
    # grid of max_frames slots; slot i (1-based interior index i-1) maps to
    # 1 + (t_end - 1) * (i-1)/(num-1).
    i = jnp.arange(max_frames, dtype=t_canonical.dtype)
    denom = jnp.maximum(num - 1.0, 1.0)
    interior = 1.0 + (t_end - 1.0) * (i - 1.0) / denom
    # Invert by monotone cubic interpolation: x = t(t'), y = t' = 0..F-1.
    tprime = interp_cubic(interior, t_canonical,
                          jnp.arange(n_canonical, dtype=t_canonical.dtype))
    out = jnp.where(i == 0, 0.0, tprime)
    last = n_frames - 1
    out = jnp.where(i >= last, float(n_canonical - 1), out)
    return out, n_frames


def linear_time_function(n_canonical: int, max_frames: int, speed: float = 1.0):
    """Canonical (unwarped) timeline: linspace(0, F, F/speed) as in reference
    motion_primitive.py:233 when time parameters are unused (int() truncates
    there, so the count truncates here too)."""
    num = int(n_canonical * (1.0 / speed))
    i = jnp.arange(max_frames, dtype=jnp.float32)
    vals = i * (float(n_canonical) / max(num - 1, 1))
    vals = jnp.minimum(vals, float(n_canonical - 1))
    return vals, jnp.asarray(num, jnp.int32)


def canonical_time_function_masked(mean_t_d: jax.Array, eigen_t_d: jax.Array,
                                   gamma: jax.Array, n_canonical: jax.Array) -> jax.Array:
    """Masked variant for stacked graphs: arrays are padded to F_max and the
    true frame count is a traced scalar.  Increments beyond n_canonical are
    zeroed so the cumsum plateaus at the final value.

    For nodes without a temporal model, mean_t_d == 0 and gamma contributes
    nothing, giving exp(0)=1 unit increments -> the identity timeline.
    """
    f_max = mean_t_d.shape[-1]
    w = mean_t_d + eigen_t_d @ gamma
    mask = jnp.arange(f_max) < n_canonical
    inc = jnp.where(mask, jnp.exp(w), 0.0)
    return jnp.cumsum(inc) - 1.0


def invert_time_function_dynamic(t_canonical: jax.Array, n_canonical: jax.Array,
                                 max_frames: int, speed: float = 1.0):
    """Like invert_time_function but with a *traced* canonical frame count
    (stacked-graph scan path).  t_canonical is padded/flat past n_canonical.

    Returns (time_function [max_frames], n_frames int32); entries at index
    >= n_frames clamp to n_canonical - 1.
    """
    f_max = t_canonical.shape[-1]
    t_end = t_canonical[jnp.maximum(n_canonical - 2, 0)]
    # integer interior count, truncated (see invert_time_function)
    num = jnp.maximum(jnp.floor(jnp.round(t_end) * (1.0 / speed)), 1.0)
    n_frames = jnp.minimum((num + 2.0).astype(jnp.int32), max_frames)

    i = jnp.arange(max_frames, dtype=t_canonical.dtype)
    denom = jnp.maximum(num - 1.0, 1.0)
    interior = 1.0 + (t_end - 1.0) * (i - 1.0) / denom
    # y grid clamps at n_canonical-1 so the flat padded tail maps to the
    # final canonical frame.
    y = jnp.minimum(jnp.arange(f_max, dtype=t_canonical.dtype),
                    (n_canonical - 1).astype(t_canonical.dtype))
    tprime = interp_cubic(interior, t_canonical, y)
    out = jnp.where(i == 0, 0.0, tprime)
    last = n_frames - 1
    out = jnp.where(i >= last, (n_canonical - 1).astype(t_canonical.dtype), out)
    return out, n_frames


def z_transform(time_functions: jax.Array) -> jax.Array:
    """Training-side inverse of the exp-sum: w(t) = ln(t'(t) - t'(t-1)).

    Mirrors reference construction/fpca/fpca_time_semantic.py:69-82
    (z_t_transform): prepend the implicit -1 shift, diff, log.
    time_functions: [..., F] monotone warps -> [..., F] log-increment curves.
    """
    shifted = time_functions + 1.0
    prev = jnp.concatenate([jnp.zeros_like(shifted[..., :1]), shifted[..., :-1]], axis=-1)
    inc = jnp.maximum(shifted - prev, 1e-6)
    return jnp.log(inc)


# ---------------------------------------------------------------------------
# Savitzky-Golay time-function smoothing
# ---------------------------------------------------------------------------

import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=None)
def _savgol_matrices(window: int, polyorder: int):
    """Precompute the linear operator of a Savitzky-Golay filter with
    polynomial edge handling (scipy's mode='interp').

    Returns (kernel [window], head [half, window], tail [half, window]):
    interior outputs are a correlation with `kernel`; the first/last `half`
    outputs come from evaluating a least-squares polynomial fit of the
    first/last `window` samples (exactly scipy.signal.savgol_filter
    semantics, the oracle for the tests).
    """
    half = window // 2
    pos = _np.arange(-half, half + 1, dtype=_np.float64)
    proj = _np.linalg.pinv(_np.vander(pos, polyorder + 1, increasing=True))
    kernel = proj[0]
    pos_e = _np.arange(window, dtype=_np.float64)
    proj_e = _np.linalg.pinv(_np.vander(pos_e, polyorder + 1, increasing=True))
    head = _np.vander(_np.arange(half, dtype=_np.float64),
                      polyorder + 1, increasing=True) @ proj_e
    tail = _np.vander(_np.arange(window - half, window, dtype=_np.float64),
                      polyorder + 1, increasing=True) @ proj_e
    return kernel, head, tail


def savgol_smooth(y: jax.Array, window: int = 15, polyorder: int = 3) -> jax.Array:
    """Savitzky-Golay filter as one correlation + two small matmuls.

    jit/vmap-friendly replacement for the reference's
    `scipy.signal.savgol_filter(time_function, 15, 3)`
    (motion_model/motion_primitive.py:320-333 _smooth_time_function,
    gated by the `smooth_time_parameters` flag :284-285). y: [..., N].
    """
    n = y.shape[-1]
    if n < window:
        return y
    kernel, head, tail = _savgol_matrices(window, polyorder)
    kernel = jnp.asarray(kernel, y.dtype)
    head = jnp.asarray(head, y.dtype)
    tail = jnp.asarray(tail, y.dtype)
    half = window // 2

    def one(row):
        interior = jnp.correlate(row, kernel, mode="valid",
                                 precision=jax.lax.Precision.HIGHEST)
        hi = jnp.dot(head, row[:window], precision=jax.lax.Precision.HIGHEST)
        lo = jnp.dot(tail, row[-window:], precision=jax.lax.Precision.HIGHEST)
        return jnp.concatenate([hi, interior, lo])

    flat = y.reshape((-1, n))
    out = jax.vmap(one)(flat)
    return out.reshape(y.shape)


def smooth_time_function_np(time_function: "_np.ndarray",
                            window: int = 15, polyorder: int = 3):
    """Host-side variant for the per-step conversion path (the reference
    applies the filter on a host numpy array, motion_primitive.py:327)."""
    tf = _np.asarray(time_function, _np.float64)
    if tf.shape[-1] < window:
        return tf
    kernel, head, tail = _savgol_matrices(window, polyorder)
    interior = _np.correlate(tf, kernel, mode="valid")
    return _np.concatenate([head @ tf[:window], interior,
                            tail @ tf[-window:]])
