"""Global graph-walk refinement: multi-step spatial LM + time optimization.

Replaces reference motion_generator/graph_walk_optimizer.py:39-189 and
constraints/time_constraints{,_builder}.py:

  * spatial: the concatenated spatial latents of the last `max_steps` steps
    are optimized jointly against all steps' constraint residuals, with the
    alignment chained differentiably (step i aligns against step i-1's final
    coefficient row) — one Levenberg-Marquardt on the whole window instead
    of the reference's scipy leastsq over a Python chain
    (graph_walk_optimizer.py:78-118);
  * temporal: gammas of steps carrying `desired_time` keyframe constraints
    are optimized so warped keyframe times match (reference
    time_constraints.py:26-111 semantics, with the exp-sum warp evaluated
    in-graph instead of re-warping via scipy).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..constraints import compiled
from ..models.primitive import MotionPrimitive, back_project_spatial
from ..models.skeleton import Skeleton
from ..ops import align, gmm as gmm_ops, timewarp


def _chain_residuals(skeleton: Skeleton, prims: List[MotionPrimitive],
                     scs: List[compiled.StepConstraints],
                     alphas: List[jax.Array], gammas: List[jax.Array],
                     quality_scale: float):
    """Residuals of every step in the window with chained alignment.

    The first step uses its stored alignment state; each later step aligns
    against the previous step's final aligned coefficient row (clamped
    spline: last coeff == last frame)."""
    all_res = []
    prev_last = None
    for i, (prim, sc, alpha) in enumerate(zip(prims, scs, alphas)):
        coeffs = back_project_spatial(prim, alpha)
        if i == 0:
            q_prev, d_prev = align.node_aligning_2d_transform(sc.prev_last, coeffs[0])
            q_y = jnp.where(sc.has_prev > 0, q_prev, sc.start_q)
            delta = jnp.where(sc.has_prev > 0, d_prev, sc.start_delta)
        else:
            q_y, delta = align.node_aligning_2d_transform(prev_last, coeffs[0])
        aligned = align.transform_frames(coeffs, q_y, delta)
        res = compiled.residuals_from_coeffs(skeleton, prim.knots_s, sc, aligned)
        s_full = jnp.concatenate([alpha, gammas[i]])
        nll = -gmm_ops.log_prob(prim.gmm, s_full)
        # gate families compiled out by the (default) use_* flags of the
        # residuals call above, so no mask slot degenerates to pure nll
        active = compiled.active_mask(sc) * jnp.asarray(
            compiled.static_family_gate())
        all_res.append(active * (res + quality_scale * nll))
        prev_last = aligned[-1]
    return jnp.concatenate(all_res)


def adapt_constraint_weights(scs: List[compiled.StepConstraints], mode: str,
                             position_weight: float,
                             orientation_weight: float):
    """Pre-optimization constraint weight adaptation (reference
    graph_walk_optimizer.py:119-131 `_adapt_constraint_weights`).

    mode "all"/"two_hands": every step's NON-generated keyframe slots (user
    constraints; the loco goal/half-step/foot-plant slots carry the
    reference's {"generated": True} annotation via `kf_generated`) get
    `position_weight`.  mode "trajectory_end" (reference END_POINT): only
    the LAST step is touched — its keyframe slots get `position_weight`
    and its 2D-direction slot gets `orientation_weight` (the reference's
    only consumption of the `orientation_weight` config key).  Returns
    adapted copies; the inputs are not mutated."""
    out = list(scs)
    if mode in ("all", "two_hands"):
        for i, sc in enumerate(out):
            kf_w = np.where(
                (np.asarray(sc.kf_active) > 0)
                & (np.asarray(sc.kf_generated) == 0),
                np.float32(position_weight),
                np.asarray(sc.kf_weight, np.float32))
            out[i] = sc.replace(kf_weight=kf_w)
    else:  # "trajectory_end"
        sc = out[-1]
        kf_w = np.where(np.asarray(sc.kf_active) > 0,
                        np.float32(position_weight),
                        np.asarray(sc.kf_weight, np.float32))
        out[-1] = sc.replace(kf_weight=kf_w,
                             dir_weight=np.float32(orientation_weight))
    return out


def optimize_spatial_over_steps(skeleton: Skeleton,
                                prims: List[MotionPrimitive],
                                scs: List[compiled.StepConstraints],
                                parameters: List[np.ndarray],
                                n_iters: int = 8,
                                quality_scale: float = 0.0001,
                                init_lambda: float = 1e-2):
    """Jointly refine the spatial latents of a step window.

    parameters: per-step full latent vectors; returns updated copies.
    (reference optimize_spatial_parameters_over_graph_walk semantics with
    quality term; position_weight folding is carried by the constraint
    weights.)
    """
    sizes = [p.n_spatial for p in prims]
    gammas = [jnp.asarray(parameters[i][sizes[i]:], jnp.float32)
              for i in range(len(prims))]
    x0 = jnp.concatenate([jnp.asarray(parameters[i][: sizes[i]], jnp.float32)
                          for i in range(len(prims))])
    offsets = np.cumsum([0] + sizes)

    def split(x):
        return [x[offsets[i]: offsets[i + 1]] for i in range(len(prims))]

    def residuals(x):
        return _chain_residuals(skeleton, prims, scs, split(x), gammas,
                                quality_scale)

    n = x0.shape[0]
    eye = jnp.eye(n)

    @jax.jit
    def run(x0):
        def body(carry, _):
            x, lam = carry
            r = residuals(x)
            err = jnp.sum(r * r)
            jac = jax.jacfwd(residuals)(x)
            a = jnp.matmul(jac.T, jac, precision=jax.lax.Precision.HIGHEST) + lam * eye
            g = jnp.matmul(jac.T, r, precision=jax.lax.Precision.HIGHEST)
            x_new = x - jnp.linalg.solve(a, g)
            err_new = jnp.sum(residuals(x_new) ** 2)
            improved = err_new < err
            x = jnp.where(improved, x_new, x)
            lam = jnp.where(improved, lam * 0.3, lam * 5.0)
            return (x, lam), err_new
        (x, _), errs = jax.lax.scan(body, (x0, jnp.asarray(init_lambda)),
                                    None, length=n_iters)
        return x, errs

    x_opt, errs = run(x0)
    x_opt = np.asarray(x_opt)
    out = []
    for i in range(len(prims)):
        p = np.asarray(parameters[i]).copy()
        p[: sizes[i]] = x_opt[offsets[i]: offsets[i + 1]]
        out.append(p)
    return out, float(errs[-1])


# ---------------------------------------------------------------------------
# Time optimization (reference TimeConstraints)
# ---------------------------------------------------------------------------

def optimize_time_over_steps(prims: List[MotionPrimitive],
                             parameters: List[np.ndarray],
                             constrained: List[tuple],
                             frame_time: float,
                             n_iters: int = 20,
                             quality_scale: float = 0.0001,
                             lr: float = 0.1,
                             start_frames: float = 0.0):
    """Refine the gammas so constrained keyframes land on desired times.

    constrained: list of (step_index, canonical_keyframe, desired_time_s).
    Error per constraint (reference time_constraints.py:68-111): the output
    time of the keyframe = (frames of previous steps + warped keyframe
    position) * frame_time; squared seconds error + GMM naturalness.
    Gradient descent on the concatenated gammas (reference uses L-BFGS-B).

    start_frames: warped frame count of the steps BEFORE this optimization
    window, held fixed during the solve (reference time_constraints.py:34-41
    `_get_start_frame` — the `optimized_actions` windowing passes windows
    that do not start at step 0).
    """
    if not constrained:
        return parameters
    k_sizes = [p.n_time for p in prims]
    g0 = jnp.concatenate([jnp.asarray(parameters[i][prims[i].n_spatial:], jnp.float32)
                          for i in range(len(prims))])
    offsets = np.cumsum([0] + k_sizes)
    alphas = [jnp.asarray(parameters[i][: prims[i].n_spatial], jnp.float32)
              for i in range(len(prims))]

    del lr  # Gauss-Newton needs no step size

    def residuals(g):
        gammas = [g[offsets[i]: offsets[i + 1]] for i in range(len(prims))]
        # per-step output length ~ t_canonical[-2] + 2 (timewarp inversion)
        t_cans = [timewarp.canonical_time_function(p.mean_t_d, p.eigen_t_d, gm)
                  for p, gm in zip(prims, gammas)]
        lengths = [t[-2] + 2.0 for t in t_cans]
        res = []
        for step_idx, keyframe, desired in constrained:
            prior = sum(lengths[:step_idx]) if step_idx > 0 else 0.0
            warped_pos = t_cans[step_idx][int(keyframe)]
            res.append((start_frames + prior + warped_pos) * frame_time
                       - desired)
        for i in range(len(prims)):
            s_full = jnp.concatenate([alphas[i], gammas[i]])
            nll = -gmm_ops.log_prob(prims[i].gmm, s_full)
            res.append(jnp.sqrt(jnp.maximum(nll, 0.0) * quality_scale))
        return jnp.stack(res)

    n = g0.shape[0]
    eye = jnp.eye(n)

    @jax.jit
    def run(g0):
        def body(carry, _):
            g, lam = carry
            r = residuals(g)
            err = jnp.sum(r * r)
            jac = jax.jacfwd(residuals)(g)
            a = jnp.matmul(jac.T, jac, precision=jax.lax.Precision.HIGHEST) + lam * eye
            grad = jnp.matmul(jac.T, r, precision=jax.lax.Precision.HIGHEST)
            g_new = g - jnp.linalg.solve(a, grad)
            err_new = jnp.sum(residuals(g_new) ** 2)
            improved = err_new < err
            g = jnp.where(improved, g_new, g)
            lam = jnp.where(improved, lam * 0.3, lam * 5.0)
            return (g, lam), err_new
        (g, _), _ = jax.lax.scan(body, (g0, jnp.asarray(1e-3)), None,
                                 length=n_iters)
        return g

    g = np.asarray(run(g0))
    out = []
    for i in range(len(prims)):
        p = np.asarray(parameters[i]).copy()
        p[prims[i].n_spatial:] = g[offsets[i]: offsets[i + 1]]
        out.append(p)
    return out
