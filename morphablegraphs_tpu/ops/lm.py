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

import jax
import jax.numpy as jnp


def lm_minimize(residual_fn, s0: jax.Array, n_iters: int,
                init_lambda: float = 1.0, init_radius: float = 1.0,
                max_radius: float = 16.0):
    """Minimize sum(residual_fn(s)^2) from s0 with n_iters LM iterations.

    Accept/reject per iteration: an improving step halves lambda and doubles
    the trust radius; a rejected step multiplies lambda by 10 and quarters
    the radius.  Returns (s_opt, final_sq_err).
    """

    def body(carry, _):
        s, lam, radius = carry
        r = residual_fn(s)
        err = jnp.sum(r * r)
        j = jax.jacfwd(residual_fn)(s)  # [R, L]
        jtj = jnp.matmul(j.T, j, precision=jax.lax.Precision.HIGHEST)
        # Relative floor on the damping diagonal: with few active residuals
        # JtJ is rank-deficient and near-null latent dims carry ~0 diagonal,
        # so pure Marquardt scaling lets the solve blow up along them
        # (measured step norms of ~1000 on a 1-constraint problem).
        dg = jnp.diagonal(jtj)
        floor = jnp.maximum(1e-2 * jnp.max(dg), 1e-6)
        damp = jnp.diag(jnp.maximum(dg, floor))
        g = jnp.matmul(j.T, r, precision=jax.lax.Precision.HIGHEST)
        delta = jnp.linalg.solve(jtj + lam * damp, g)
        nrm = jnp.linalg.norm(delta)
        delta = delta * jnp.minimum(1.0, radius / jnp.maximum(nrm, 1e-10))
        s_new = s - delta
        r_new = residual_fn(s_new)
        err_new = jnp.sum(r_new * r_new)
        improved = err_new < err
        s = jnp.where(improved, s_new, s)
        lam = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-6), lam * 10.0)
        radius = jnp.where(improved, jnp.minimum(radius * 2.0, max_radius),
                           jnp.maximum(radius * 0.25, 1e-3))
        return (s, lam, radius), jnp.minimum(err, err_new)

    (s_opt, _, _), errs = jax.lax.scan(
        body, (s0, jnp.asarray(init_lambda, s0.dtype),
               jnp.asarray(init_radius, s0.dtype)), None, length=n_iters)
    return s_opt, errs[-1]
