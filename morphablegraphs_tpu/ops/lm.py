"""Fixed-iteration Levenberg-Marquardt with Marquardt scaling + trust region.

The TPU replacement for the reference's MINPACK `scipy.optimize.leastsq`
(reference motion_generator/optimization/least_squares.py): exact jacobians
via `jax.jacfwd`, a fixed iteration count (jit/scan-friendly), damped normal
equations with MINPACK-style diagonal (Marquardt) scaling, and an adaptive
trust-region clip on the step norm.

The diagonal scaling + clip are required, not cosmetic: the synthesis
residuals mix cm-scale positions with degree-scale angles through arccos,
where a plain lambda*I Gauss-Newton step overshoots by ~100x (measured on
the locomotion objective) and the optimizer stalls rejecting every step.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def chol_solve_unrolled(a: jax.Array, g: jax.Array) -> jax.Array:
    """Solve the small SPD system a @ x = g via a trace-time-unrolled
    Cholesky factorization + substitution.

    Replaces `jnp.linalg.solve` in the jitted LM loop: XLA's batched LU
    custom call on TPU imposes layout constraints that insert large
    transposition copies around every solve (measured 7.2 ms solve +
    ~10 ms copies per LM iteration for a [1024, 28, 28] batch inside the
    crowd walk, vs 1.7 ms for this unrolled form, which is pure vector ops
    and vectorizes cleanly under vmap).  a must be symmetric positive
    definite — in LM it is JtJ + lam * damp with a strictly positive
    damping diagonal.
    """
    n = a.shape[-1]
    c = jnp.zeros_like(a)
    for j in range(n):
        s = a[..., j, j] - jnp.sum(c[..., j, :j] ** 2, axis=-1)
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        col = (a[..., j + 1:, j] - jnp.einsum(
            "...ik,...k->...i", c[..., j + 1:, :j], c[..., j, :j])) \
            / d[..., None]
        c = c.at[..., j, j].set(d)
        c = c.at[..., j + 1:, j].set(col)
    y = jnp.zeros_like(g)
    for i in range(n):
        y = y.at[..., i].set(
            (g[..., i] - jnp.sum(c[..., i, :i] * y[..., :i], -1))
            / c[..., i, i])
    x = jnp.zeros_like(g)
    for i in reversed(range(n)):
        x = x.at[..., i].set(
            (y[..., i] - jnp.sum(c[..., i + 1:, i] * x[..., i + 1:], -1))
            / c[..., i, i])
    return x


# ---------------------------------------------------------------------------
# The solve under crowd vmap: one fused Pallas kernel instead of ~350 tiny ops
# ---------------------------------------------------------------------------
#
# Inside vmap(constrained_walk_full) the unrolled Cholesky's column loop
# lowers to hundreds of [C, <=k] HBM-bound ops per LM iteration — the class
# of small vector ops the roofline breakdown attributes most of the LM wall
# to.  custom_vmap swaps in ops/pallas_kernels.chol_solve_crowd (characters
# on the lane axis, every intermediate VMEM-resident) exactly when the solve
# is batched, leaving the single-character path untouched.
#
# DEFAULT ON since the 2026-08-20 on-TPU preflight measured the kernel at
# parity err 1.9e-06 and 1.38x the XLA unrolled solve (2.29 vs 3.16 ms for
# the [1024, k, k] crowd batch; benchmarks/results/
# BENCH_TPU_20260820T043858Z.json).  MG_LM_PALLAS_SOLVE=0 reverts to the
# vmapped unrolled solve, and bench.py's preflight still re-proves parity +
# re-records the A/B each TPU run (it can override to 0 when it measures a
# regression).  The decision is read at TRACE time; `pallas_solve_disabled()`
# forces it off for programs that must stay free of Mosaic ops
# (GSPMD-sharded crowds — no partitioning rule exists for Pallas custom
# calls).

_MIN_PALLAS_BATCH = 256  # below this the kernel's pad-to-1024 cost bites
_PALLAS_SOLVE_DISABLED = [False]


class pallas_solve_disabled:
    """Context manager: trace with the crowd solve kernel forced OFF."""

    def __enter__(self):
        self._prev = _PALLAS_SOLVE_DISABLED[0]
        _PALLAS_SOLVE_DISABLED[0] = True

    def __exit__(self, *exc):
        _PALLAS_SOLVE_DISABLED[0] = self._prev


def _chol_solve_batched(a: jax.Array, g: jax.Array) -> jax.Array:
    use_pallas = (os.environ.get("MG_LM_PALLAS_SOLVE", "1") == "1"
                  and not _PALLAS_SOLVE_DISABLED[0]
                  and a.ndim == 3
                  and a.shape[0] >= _MIN_PALLAS_BATCH
                  and jax.default_backend() == "tpu")
    if use_pallas:
        from . import pallas_kernels as pk
        return pk.chol_solve_crowd(a, g)
    fn = chol_solve_unrolled
    for _ in range(a.ndim - 2):
        fn = jax.vmap(fn)
    return fn(a, g)


@jax.custom_batching.custom_vmap
def chol_solve(a: jax.Array, g: jax.Array) -> jax.Array:
    """chol_solve_unrolled with a crowd-fused batching rule (see above)."""
    return chol_solve_unrolled(a, g)


@chol_solve.def_vmap
def _chol_solve_vmap(axis_size, in_batched, a, g):
    a_b, g_b = in_batched
    if not a_b:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    if not g_b:
        g = jnp.broadcast_to(g, (axis_size,) + g.shape)
    return _chol_solve_batched(a, g), True


# ---------------------------------------------------------------------------
# The whole LM step block under crowd vmap: one fused Pallas kernel
# ---------------------------------------------------------------------------
#
# One level up from the solve: JtJ/Jtr contraction + Marquardt damping +
# Cholesky + trust clip as a single kernel (pallas_kernels.lm_delta_crowd),
# removing the [C, k, k]-materializing matmuls and the diag/max/norm/clip
# op chain from the HBM stream.  OPT-IN via MG_LM_PALLAS_DELTA=1 until a
# TPU A/B is banked (repo convention: unmeasured perf toggles stay off);
# bench.py preflights it alongside the solve kernel.

_DAMP_FLOOR_REL = 1e-2  # must match lm_minimize's default


def _lm_delta_unbatched(j: jax.Array, r: jax.Array, lam: jax.Array,
                        radius: jax.Array) -> jax.Array:
    jtj = jnp.matmul(j.T, j, precision=jax.lax.Precision.HIGHEST)
    dg = jnp.diagonal(jtj)
    floor = jnp.maximum(_DAMP_FLOOR_REL * jnp.max(dg), 1e-6)
    damp = jnp.diag(jnp.maximum(dg, floor))
    g = jnp.matmul(j.T, r, precision=jax.lax.Precision.HIGHEST)
    delta = chol_solve(jtj + lam * damp, g)
    nrm = jnp.linalg.norm(delta)
    return delta * jnp.minimum(1.0, radius / jnp.maximum(nrm, 1e-10))


@jax.custom_batching.custom_vmap
def lm_delta(j: jax.Array, r: jax.Array, lam: jax.Array,
             radius: jax.Array) -> jax.Array:
    """Damped, trust-clipped LM step from residuals + jacobian (the
    lm_minimize step block), with a crowd-fused batching rule."""
    return _lm_delta_unbatched(j, r, lam, radius)


@lm_delta.def_vmap
def _lm_delta_vmap(axis_size, in_batched, j, r, lam, radius):
    args = []
    for b, a in zip(in_batched, (j, r, lam, radius)):
        args.append(a if b else jnp.broadcast_to(a, (axis_size,) + a.shape))
    j, r, lam, radius = args
    use_pallas = (os.environ.get("MG_LM_PALLAS_DELTA", "0") == "1"
                  and not _PALLAS_SOLVE_DISABLED[0]
                  and j.ndim == 3
                  and j.shape[0] >= _MIN_PALLAS_BATCH
                  and jax.default_backend() == "tpu")
    if use_pallas:
        from . import pallas_kernels as pk
        return pk.lm_delta_crowd(j, r, lam, radius,
                                 damp_floor_rel=_DAMP_FLOOR_REL), True
    return jax.vmap(_lm_delta_unbatched)(j, r, lam, radius), True


def lm_minimize(residual_fn, s0: jax.Array, n_iters: int,
                init_lambda: float = 1e-3, init_radius: float = 1.0,
                max_radius: float = 16.0, make_residual_fn=None,
                make_value_jac_fn=None, damp_floor_rel: float = 1e-2,
                lam_down: float = 0.1, lam_up: float = 10.0):
    """Minimize sum(residual_fn(s)^2) from s0 with n_iters LM iterations.

    Accept/reject per iteration: an improving step multiplies lambda by
    lam_down and doubles the trust radius; a rejected step multiplies
    lambda by lam_up and KEEPS the radius (lambda growth already shrinks
    the next step — also collapsing the radius was double-punishment that
    pinned the iterate after a few rejects: 17.4 cm converged vs 4.9 with
    radius kept, measured on the toy constrained step).  Returns (s_opt,
    final_sq_err).

    The default schedule is MINPACK-like: NEAR-ZERO initial damping with
    aggressive (0.1x) decay, so accepted steps are Gauss-Newton quality
    from the first iteration (the trust-region clip, not lambda, guards
    against overshoot).  The previous conservative schedule (lambda0=1,
    0.5x decay) never reached GN-quality steps within realistic budgets
    and converged centimeters short of MINPACK from distant starts —
    measured on the reference-scale constrained step: 5.20 cm converged
    vs scipy leastsq's 1.04 from the SAME start; this schedule reaches
    0.81 cm at 100 iterations with top-8 multi-start (old schedule: 2.38)
    and dominates at 5/20/100-iteration budgets on both the toy and the
    reference-scale problems (see test_lm_schedule_beats_oracle).

    make_residual_fn (optional): a factory s -> residual_fn called at the
    START of every iteration with the current iterate — the frozen-model
    (majorize-minimize) hook: expensive state that need not be
    differentiated (data correspondences, alignment transforms) is
    recomputed once per iteration inside the factory and captured as
    constants by the returned closure, so the jacobian tangents only flow
    through the cheap residual heads.  When given, `residual_fn` is ignored
    (pass None).

    make_value_jac_fn (optional): a factory s -> (r [R], J [R, L],
    value_fn) producing the residuals AND their jacobian at the current
    iterate in one fused pass, plus a value-only probe for accept/reject —
    the closed-form frozen hook (compiled.make_frozen_root_residuals_closed)
    that replaces `jax.linearize` + one tangent per latent dim entirely.
    Exactly one of the three function arguments must be given.
    """
    n_modes = sum(fn is not None
                  for fn in (residual_fn, make_residual_fn,
                             make_value_jac_fn))
    if n_modes != 1:
        raise ValueError("pass exactly one of residual_fn / "
                         "make_residual_fn / make_value_jac_fn")
    n_lat = s0.shape[0]
    eye = jnp.eye(n_lat, dtype=s0.dtype)

    def body(carry, _):
        s, lam, radius = carry
        if make_value_jac_fn is not None:
            r, j, rfn = make_value_jac_fn(s)
            err = jnp.sum(r * r)
        else:
            rfn = (residual_fn if make_residual_fn is None
                   else make_residual_fn(s))
            # one linearization serves both the residual value and the
            # jacobian (jacfwd would evaluate the primal a second time)
            r, lin = jax.linearize(rfn, s)
            err = jnp.sum(r * r)
            j = jax.vmap(lin)(eye).T  # [R, L]
        if damp_floor_rel == _DAMP_FLOOR_REL:
            # the whole step block through lm_delta: identical math, with
            # a crowd-fused Pallas batching rule (see lm_delta below)
            delta = lm_delta(j, r, lam, radius)
        else:
            jtj = jnp.matmul(j.T, j, precision=jax.lax.Precision.HIGHEST)
            # Relative floor on the damping diagonal: with few active
            # residuals JtJ is rank-deficient and near-null latent dims
            # carry ~0 diagonal, so pure Marquardt scaling lets the solve
            # blow up along them (measured step norms of ~1000 on a
            # 1-constraint problem).
            dg = jnp.diagonal(jtj)
            floor = jnp.maximum(damp_floor_rel * jnp.max(dg), 1e-6)
            damp = jnp.diag(jnp.maximum(dg, floor))
            g = jnp.matmul(j.T, r, precision=jax.lax.Precision.HIGHEST)
            delta = chol_solve(jtj + lam * damp, g)
            nrm = jnp.linalg.norm(delta)
            delta = delta * jnp.minimum(
                1.0, radius / jnp.maximum(nrm, 1e-10))
        s_new = s - delta
        # accept/reject against the SAME (frozen) model the step was
        # computed on — consistent within the iteration; callers of the
        # frozen path re-score the final iterate exactly and keep it only
        # when the TRUE error improves
        r_new = rfn(s_new)
        err_new = jnp.sum(r_new * r_new)
        improved = err_new < err
        s = jnp.where(improved, s_new, s)
        lam = jnp.where(improved, jnp.maximum(lam * lam_down, 1e-6),
                        lam * lam_up)
        radius = jnp.where(improved, jnp.minimum(radius * 2.0, max_radius),
                           radius)
        return (s, lam, radius), jnp.minimum(err, err_new)

    (s_opt, _, _), errs = jax.lax.scan(
        body, (s0, jnp.asarray(init_lambda, s0.dtype),
               jnp.asarray(init_radius, s0.dtype)), None, length=n_iters)
    return s_opt, errs[-1]
