"""Batched cubic B-spline kernels.

The reference evaluates one scipy B-spline per pose channel in a Python loop
(reference motion_model/motion_spline.py:71-86 — "Hot Loop C" in SURVEY.md).
Here the same math is a single basis-matrix construction followed by one
matmul `frames = B(t) @ coeffs`, which XLA tiles straight onto the MXU and
which vmaps over thousands of characters.

Also provides the clamped-uniform knot generator matching the reference's
construction/utils.py:187-198 `get_cubic_b_spline_knots`, and a least-squares
spline *fit* (the construction-pipeline replacement for scipy `splrep`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEGREE = 3  # reference motion_model/__init__.py: B_SPLINE_DEGREE = 3


def clamped_knots(n_basis: int, n_frames: int) -> np.ndarray:
    """Clamped cubic knot vector over [0, n_frames-1] with n_basis coefficients.

    Matches reference construction/utils.py:187-198: 4 leading zeros, interior
    knots linspace(0, n_frames-1, n_basis-2), 4 trailing (n_frames-1).
    """
    knots = np.zeros(n_basis + DEGREE + 1)
    knots[DEGREE: -DEGREE] = np.linspace(0, n_frames - 1, n_basis - 2)
    knots[-DEGREE:] = n_frames - 1
    return knots


def basis_matrix(knots: jax.Array, t: jax.Array, degree: int = DEGREE) -> jax.Array:
    """Cox–de Boor basis matrix: B[i, j] = N_{j,degree}(t_i).

    Vectorized over both query points and basis functions (no per-channel
    loop).  Matches scipy.interpolate.splev on the closed domain
    [knots[0], knots[-1]]; queries are clamped into that domain.

    Args:
      knots: [n_basis + degree + 1] non-decreasing knot vector.
      t:     [...] query points (any batch shape).
    Returns:
      [..., n_basis] basis weights; a row sums to 1.
    """
    knots = jnp.asarray(knots)
    t = jnp.asarray(t)
    n_basis = knots.shape[0] - degree - 1
    tmax = knots[-1]
    # Clamp to the closed domain; the t == tmax endpoint is handled by
    # evaluating at tmax - eps on the last non-degenerate span, which for
    # clamped knots reproduces the limit value exactly in the recursion below
    # via the half-open indicator special case.
    tc = jnp.clip(t, knots[0], tmax)

    # Degree-0 indicators: N_{j,0} = 1 on [knots[j], knots[j+1}), except the
    # last non-empty span which is closed so the right endpoint is covered.
    left = knots[:-1]
    right = knots[1:]
    is_last_span = right >= tmax  # spans ending at the final knot
    ge_left = tc[..., None] >= left
    lt_right = tc[..., None] < right
    le_right = tc[..., None] <= right
    n0 = jnp.where(is_last_span, ge_left & le_right & (left < right),
                   ge_left & lt_right).astype(knots.dtype)

    n = n0
    for k in range(1, degree + 1):
        # N_{j,k}(t) = w1 * N_{j,k-1} + w2 * N_{j+1,k-1}
        d1 = knots[k:-1] - knots[: -k - 1]          # t_{j+k}   - t_j
        d2 = knots[k + 1:] - knots[1:-k]            # t_{j+k+1} - t_{j+1}
        w1 = jnp.where(d1 > 0, (tc[..., None] - knots[: -k - 1]) / jnp.where(d1 > 0, d1, 1.0), 0.0)
        w2 = jnp.where(d2 > 0, (knots[k + 1:] - tc[..., None]) / jnp.where(d2 > 0, d2, 1.0), 0.0)
        n = w1 * n[..., :-1] + w2 * n[..., 1:]
    return n[..., :n_basis]


def evaluate(coeffs: jax.Array, knots: jax.Array, t: jax.Array,
             degree: int = DEGREE) -> jax.Array:
    """Evaluate a multi-channel B-spline at query times.

    coeffs: [n_basis, n_channels]; t: [T] -> frames [T, n_channels].
    One matmul; equivalent to the reference's per-channel splev loop.
    """
    b = basis_matrix(knots, t, degree)
    # HIGHEST precision: on TPU the default matmul runs bf16 passes, which
    # blows the <1e-3 pose-error budget (BASELINE.md config 1).
    return jnp.matmul(b, coeffs, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("degree",))
def fit_coeffs(y: jax.Array, knots: jax.Array, t: jax.Array,
               degree: int = DEGREE) -> jax.Array:
    """Least-squares B-spline fit: solve min ||B(t) @ C - y||² for C.

    Replaces scipy `splrep` in the construction pipeline (reference
    construction/fpca/pca_functional_data.py:74-120) with a QR least-squares
    solve (NOT normal equations: the Gram matrix squares the basis condition
    number, costing ~1e-3 in f32 round-trips), exact when the basis has full
    column rank (n_samples >= n_basis).

    y: [T, n_channels] samples at times t: [T] -> coeffs [n_basis, n_channels]
    (the basis width comes from the knot vector).
    """
    b = basis_matrix(knots, t, degree)  # [T, n_basis]
    # QR instead of normal equations: the Gram matrix squares the basis
    # condition number, which costs ~1e-3 in f32 — too much for round-trips.
    q, r = jnp.linalg.qr(b)
    rhs = jnp.matmul(q.T, y, precision=jax.lax.Precision.HIGHEST)
    return jax.scipy.linalg.solve_triangular(r, rhs, lower=False)


def basis_matrix_np(knots: np.ndarray, t: np.ndarray,
                    degree: int = DEGREE) -> np.ndarray:
    """Pure-numpy twin of `basis_matrix` for host-side loaders.

    Eager per-op dispatch is pathologically slow on some backends (observed
    ~1s/op via the axon plugin), so anything outside jit uses this.
    """
    knots = np.asarray(knots, np.float64)
    t = np.asarray(t, np.float64)
    n_basis = knots.shape[0] - degree - 1
    tmax = knots[-1]
    tc = np.clip(t, knots[0], tmax)
    left, right = knots[:-1], knots[1:]
    is_last_span = right >= tmax
    ge_left = tc[..., None] >= left
    lt_right = tc[..., None] < right
    le_right = tc[..., None] <= right
    n = np.where(is_last_span, ge_left & le_right & (left < right),
                 ge_left & lt_right).astype(np.float64)
    for k in range(1, degree + 1):
        d1 = knots[k:-1] - knots[: -k - 1]
        d2 = knots[k + 1:] - knots[1:-k]
        w1 = np.where(d1 > 0, (tc[..., None] - knots[: -k - 1]) / np.where(d1 > 0, d1, 1.0), 0.0)
        w2 = np.where(d2 > 0, (knots[k + 1:] - tc[..., None]) / np.where(d2 > 0, d2, 1.0), 0.0)
        n = w1 * n[..., :-1] + w2 * n[..., 1:]
    return n[..., :n_basis]


def basis_matrix_canonical(knots: np.ndarray, n_frames: int,
                           degree: int = DEGREE) -> np.ndarray:
    """Host-side precompute of B at the canonical integer frame grid.

    Stored inside the primitive pytree so the canonical-time evaluation of
    the temporal mean/eigensplines (reference motion_primitive.py:258-302)
    is a constant-folded matmul at trace time.
    """
    return basis_matrix_np(knots, np.arange(n_frames), degree)
