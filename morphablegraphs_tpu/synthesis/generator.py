"""Per-step constrained latent selection: best-of-N sampling + LM refinement.

Replaces the reference's `MotionPrimitiveGenerator`
(motion_generator/motion_primitive_generator.py:47-263) and its scipy
`leastsq` local optimization (optimization/least_squares.py):

  * `random_discrete` mode: N GMM samples scored under the compiled
    constraint set with one vmapped evaluation (reference loops Python,
    :192-207 — Hot Loop A in SURVEY.md);
  * local refinement: fixed-iteration Levenberg-Marquardt with exact
    jacobians via `jax.jacfwd` over the residual vector (the reference uses
    MINPACK leastsq with numeric diff; residual semantics match
    objective_functions.py:239-267 — error_scale * residual +
    quality_scale * negative GMM log-likelihood added to active slots).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..constraints import compiled
from ..models.primitive import MotionPrimitive, sample_latent
from ..models.skeleton import Skeleton
from ..ops import gmm as gmm_ops
from ..ops import lm as lm_ops


def _score_pool(skeleton: Skeleton, prim: MotionPrimitive,
                sc: compiled.StepConstraints, pool: jax.Array,
                use_traj: bool, use_ca: bool, use_ts: bool) -> jax.Array:
    """Constraint error of every candidate in the pool [N, L] -> [N] —
    the single scoring rule shared by best-of-n sampling, cluster-candidate
    search, and the multi-start top-k selection."""
    return jax.vmap(lambda s: compiled.evaluate_error(
        skeleton, prim, sc, s, use_traj=use_traj, use_ca=use_ca,
        use_ts=use_ts))(pool)


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_samples", "use_traj", "use_ca", "use_ts"))
def best_of_n(skeleton: Skeleton, key: jax.Array, prim: MotionPrimitive,
              sc: compiled.StepConstraints, n_samples: int = 100,
              use_traj: bool = True, use_ca: bool = True,
              use_ts: bool = False):
    """Draw n samples from the GMM and keep the best under the constraint
    error (reference motion_primitive_generator.py:192-207).

    Returns (s_best [L], error_best).
    """
    samples = sample_latent(key, prim, n_samples)
    errors = _score_pool(skeleton, prim, sc, samples, use_traj, use_ca,
                         use_ts)
    i = jnp.argmin(errors)
    return samples[i], errors[i]


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_iters", "use_traj", "use_ca", "use_ts"))
def refine_lm(skeleton: Skeleton, prim: MotionPrimitive,
              sc: compiled.StepConstraints, s0: jax.Array,
              n_iters: int = 10, error_scale: float = 1.0,
              quality_scale: float = 0.1, init_lambda: float = 1e-3,
              use_traj: bool = True, use_ca: bool = True,
              use_ts: bool = False):
    """Levenberg-Marquardt on the weighted residual vector + naturalness.

    Residual layout matches the reference (objective_functions.py:239-267):
    each active residual r_i -> error_scale * r_i + quality_scale * NLL(s),
    padded slots stay 0.  Damped normal equations with adaptive lambda,
    fixed iteration count (jit-friendly; reference caps at 500 MINPACK
    iterations, which converges in far fewer on these small problems).

    Returns (s_opt, final_constraint_error).
    """
    active = _active_mask(sc) * jnp.asarray(compiled.static_family_gate(
        use_traj=use_traj, use_ca=use_ca, use_ts=use_ts))

    def residuals(s):
        res = compiled.evaluate_residuals(skeleton, prim, sc, s,
                                          use_traj=use_traj, use_ca=use_ca, use_ts=use_ts)
        nll = -gmm_ops.log_prob(prim.gmm, s)
        return active * (error_scale * res + quality_scale * nll)

    s_opt, _ = lm_ops.lm_minimize(residuals, s0, n_iters,
                                  init_lambda=init_lambda)
    final_err = compiled.evaluate_error(skeleton, prim, sc, s_opt,
                                        use_traj=use_traj, use_ca=use_ca, use_ts=use_ts)
    return s_opt, final_err


_active_mask = compiled.active_mask


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("use_traj", "use_ca", "use_ts"))
def search_candidates(skeleton: Skeleton, prim: MotionPrimitive,
                      sc: compiled.StepConstraints, candidates: jax.Array,
                      use_traj: bool = True, use_ca: bool = True,
                      use_ts: bool = False):
    """Score a fixed candidate set (cluster-tree data) under the constraint
    error — the TPU replacement for the reference's objective-directed tree
    traversal (cluster_tree.py:117-149): exhaustive vmapped argmin is exact
    and one batched computation (SURVEY.md §7.8)."""
    errors = _score_pool(skeleton, prim, sc, candidates, use_traj, use_ca,
                         use_ts)
    i = jnp.argmin(errors)
    return candidates[i], errors[i]


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_iters", "use_traj", "use_ca", "use_ts"))
def _refine_topk_if_above_threshold(skeleton: Skeleton,
                                    prim: MotionPrimitive,
                                    sc: compiled.StepConstraints,
                                    starts: jax.Array, errs: jax.Array,
                                    threshold: float, n_iters: int,
                                    error_scale: float, quality_scale: float,
                                    use_traj: bool = True, use_ca: bool = True,
                                    use_ts: bool = False):
    """Multi-start LM: refine the k best pool candidates in parallel (one
    vmapped LM over [k, L] starts) and keep the best converged latent.

    A TPU-native extension of the reference's refine-the-single-best flow
    (motion_primitive_generator.py:149-155): scipy leastsq converges to the
    basin of the one start it is given, so a lucky/unlucky candidate pool
    moves the converged error by centimeters.  Refining k starts costs one
    batched LM on TPU (the per-start programs are identical and vmap onto
    the vector units) and takes the min over basins instead.  Gating matches
    the single-start path: the LM only runs when the pool best is at or
    above the activation threshold.  n_lm_starts=1 (the default) preserves
    reference semantics exactly."""

    def refine(args):
        s0s, e0s = args
        s_ref, e_ref = jax.vmap(lambda s: refine_lm(
            skeleton, prim, sc, s, n_iters=n_iters, error_scale=error_scale,
            quality_scale=quality_scale, use_traj=use_traj, use_ca=use_ca,
            use_ts=use_ts))(s0s)
        # keep-better per start (same contract as the single-start gate)
        s_all = jnp.where((e_ref < e0s)[:, None], s_ref, s0s)
        e_all = jnp.minimum(e0s, e_ref)
        j = jnp.argmin(e_all)
        return s_all[j], e_all[j]

    def skip(args):
        s0s, e0s = args
        j = jnp.argmin(e0s)
        return s0s[j], e0s[j]

    return jax.lax.cond(jnp.min(errs) >= threshold, refine, skip,
                        (starts, errs))


def _topk_starts(samples: jax.Array, errors: jax.Array, k: int):
    """The k lowest-error pool candidates (and their errors)."""
    neg, idx = jax.lax.top_k(-errors, k)
    return samples[idx], -neg


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_iters", "use_traj", "use_ca", "use_ts"))
def _refine_if_above_threshold(skeleton: Skeleton, prim: MotionPrimitive,
                               sc: compiled.StepConstraints, s: jax.Array,
                               err: jax.Array, threshold: float,
                               n_iters: int, error_scale: float,
                               quality_scale: float,
                               use_traj: bool = True, use_ca: bool = True,
                      use_ts: bool = False):
    """LM refinement gated on-device by the activation threshold
    (reference motion_primitive_generator.py:149-155 `min_error >=
    start_error_threshold`) — lax.cond instead of a host sync on `err`."""

    def refine(args):
        s0, e0 = args
        s_ref, err_ref = refine_lm(skeleton, prim, sc, s0, n_iters=n_iters,
                                   error_scale=error_scale,
                                   quality_scale=quality_scale,
                                   use_traj=use_traj, use_ca=use_ca, use_ts=use_ts)
        # keep the better of the two (reference keeps the optimizer output;
        # LM with adaptive damping never worsens the residual objective, but
        # the *constraint* error may differ from the damped objective)
        better = err_ref < e0
        return jnp.where(better, s_ref, s0), jnp.minimum(e0, err_ref)

    return jax.lax.cond(err >= threshold, refine, lambda args: args, (s, err))


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_samples", "n_iters", "do_refine",
                                    "use_traj", "use_ca", "use_ts",
                                    "n_starts"))
def _sample_and_refine(skeleton: Skeleton, key: jax.Array,
                       prim: MotionPrimitive, sc: compiled.StepConstraints,
                       threshold, error_scale, quality_scale,
                       n_samples: int, n_iters: int, do_refine: bool,
                       use_traj: bool, use_ca: bool, use_ts: bool,
                       n_starts: int = 1):
    """best_of_n + threshold-gated LM as ONE dispatch (two separate jit
    calls each pay a tunnel round-trip on remote-attached TPUs).

    n_starts > 1 refines the k best pool candidates with one vmapped LM and
    keeps the best converged (see _refine_topk_if_above_threshold)."""
    if do_refine and n_starts > 1:
        samples = sample_latent(key, prim, n_samples)
        errors = _score_pool(skeleton, prim, sc, samples, use_traj, use_ca,
                             use_ts)
        starts, errs = _topk_starts(samples, errors,
                                    min(n_starts, n_samples))
        return _refine_topk_if_above_threshold(
            skeleton, prim, sc, starts, errs, threshold, n_iters=n_iters,
            error_scale=error_scale, quality_scale=quality_scale,
            use_traj=use_traj, use_ca=use_ca, use_ts=use_ts)
    s, err = best_of_n(skeleton, key, prim, sc, n_samples=n_samples,
                       use_traj=use_traj, use_ca=use_ca, use_ts=use_ts)
    if do_refine:
        s, err = _refine_if_above_threshold(
            skeleton, prim, sc, s, err, threshold, n_iters=n_iters,
            error_scale=error_scale, quality_scale=quality_scale,
            use_traj=use_traj, use_ca=use_ca, use_ts=use_ts)
    return s, err


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_iters", "do_refine",
                                    "use_traj", "use_ca", "use_ts",
                                    "n_starts"))
def _search_and_refine(skeleton: Skeleton, prim: MotionPrimitive,
                       sc: compiled.StepConstraints, candidates: jax.Array,
                       threshold, error_scale, quality_scale,
                       n_iters: int, do_refine: bool,
                       use_traj: bool, use_ca: bool, use_ts: bool,
                       n_starts: int = 1):
    """search_candidates + threshold-gated LM as one dispatch."""
    if do_refine and n_starts > 1:
        errors = _score_pool(skeleton, prim, sc, candidates, use_traj,
                             use_ca, use_ts)
        starts, errs = _topk_starts(candidates, errors,
                                    min(n_starts, candidates.shape[0]))
        return _refine_topk_if_above_threshold(
            skeleton, prim, sc, starts, errs, threshold, n_iters=n_iters,
            error_scale=error_scale, quality_scale=quality_scale,
            use_traj=use_traj, use_ca=use_ca, use_ts=use_ts)
    s, err = search_candidates(skeleton, prim, sc, candidates,
                               use_traj=use_traj, use_ca=use_ca, use_ts=use_ts)
    if do_refine:
        s, err = _refine_if_above_threshold(
            skeleton, prim, sc, s, err, threshold, n_iters=n_iters,
            error_scale=error_scale, quality_scale=quality_scale,
            use_traj=use_traj, use_ca=use_ca, use_ts=use_ts)
    return s, err


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_samples", "n_iters", "do_refine",
                                    "use_traj", "use_ca", "use_ts",
                                    "loco_flags", "n_starts"))
def _loco_sample_and_refine(skeleton: Skeleton, key: jax.Array,
                            prim: MotionPrimitive,
                            sc: compiled.StepConstraints, path, loco,
                            threshold, error_scale, quality_scale,
                            n_samples: int, n_iters: int, do_refine: bool,
                            use_traj: bool, use_ca: bool, use_ts: bool,
                            loco_flags: tuple, n_starts: int = 1):
    """Locomotion-slot fill + best_of_n + gated LM as ONE dispatch: the goal
    position/direction path queries run on device instead of a host
    round-trip per step (reference locomotion_constraints_builder.py:54-120).
    Returns (s, err, filled sc) — the filled set feeds global optimization."""
    sc = compiled.fill_locomotion_slots(sc, path, loco, *loco_flags)
    s, err = _sample_and_refine(
        skeleton, key, prim, sc, threshold, error_scale, quality_scale,
        n_samples=n_samples, n_iters=n_iters, do_refine=do_refine,
        use_traj=use_traj, use_ca=use_ca, use_ts=use_ts, n_starts=n_starts)
    return s, err, sc


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_iters", "do_refine",
                                    "use_traj", "use_ca", "use_ts",
                                    "loco_flags", "n_starts"))
def _loco_search_and_refine(skeleton: Skeleton, prim: MotionPrimitive,
                            sc: compiled.StepConstraints, candidates,
                            path, loco, threshold, error_scale,
                            quality_scale, n_iters: int, do_refine: bool,
                            use_traj: bool, use_ca: bool, use_ts: bool,
                            loco_flags: tuple, n_starts: int = 1):
    """Cluster-candidate variant of _loco_sample_and_refine."""
    sc = compiled.fill_locomotion_slots(sc, path, loco, *loco_flags)
    s, err = _search_and_refine(
        skeleton, prim, sc, candidates, threshold, error_scale,
        quality_scale, n_iters=n_iters, do_refine=do_refine,
        use_traj=use_traj, use_ca=use_ca, use_ts=use_ts, n_starts=n_starts)
    return s, err, sc


def _selection_params(sc: compiled.StepConstraints, config: dict) -> dict:
    """Static/scalar selection parameters shared by the plain and deferred
    generate_constrained_sample entry points."""
    opt = config.get("local_optimization_settings", {})
    return dict(
        use_traj=bool(float(np.asarray(sc.traj_active)) > 0),
        use_ca=bool(np.asarray(sc.ca_active).sum() > 0),
        use_ts=bool(float(np.asarray(sc.ts_active)) > 0),
        do_refine=config.get("local_optimization_mode", "all") != "none",
        threshold=float(opt.get("start_error_threshold", 0.0)),
        n_iters=int(config.get("lm_iterations", 10)),
        error_scale=float(opt.get("error_scale_factor", 1.0)),
        quality_scale=float(opt.get("quality_scale_factor", 0.1)),
        n_samples=int(config.get("n_random_samples", 100)),
        n_starts=int(config.get("n_lm_starts", 1)),
        cluster_mode=config.get("constrained_sampling_mode",
                                "random_discrete") == "cluster_tree_search",
    )


def generate_constrained_sample_loco(key: jax.Array, skeleton: Skeleton,
                                     prim: MotionPrimitive,
                                     sc: compiled.StepConstraints,
                                     path, loco, loco_flags: tuple,
                                     config: dict, cluster_tree=None,
                                     candidates=None):
    """generate_constrained_sample with deferred locomotion slots (see
    action_builder.build_step_constraints(defer_locomotion=True)).

    Returns (s, error, filled StepConstraints) as device values.
    """
    p = _selection_params(sc, config)
    if candidates is not None:
        p.pop("cluster_mode")
        p.pop("n_samples")
        return _loco_search_and_refine(
            skeleton, prim, sc, jnp.asarray(candidates), path, loco,
            p.pop("threshold"), p.pop("error_scale"), p.pop("quality_scale"),
            loco_flags=loco_flags, **p)
    if p.pop("cluster_mode") and cluster_tree is not None:
        p.pop("n_samples")
        return _loco_search_and_refine(
            skeleton, prim, sc, jnp.asarray(cluster_tree.data), path, loco,
            p.pop("threshold"), p.pop("error_scale"), p.pop("quality_scale"),
            loco_flags=loco_flags, **p)
    return _loco_sample_and_refine(
        skeleton, key, prim, sc, path, loco,
        p.pop("threshold"), p.pop("error_scale"), p.pop("quality_scale"),
        loco_flags=loco_flags, **p)


def generate_constrained_sample(key: jax.Array, skeleton: Skeleton,
                                prim: MotionPrimitive,
                                sc: compiled.StepConstraints,
                                config: dict, cluster_tree=None,
                                candidates=None):
    """Full per-step selection (reference
    motion_primitive_generator.py:126-178): cluster-tree search or best-of-N,
    then LM when the error exceeds the activation threshold and local
    optimization is enabled.  Selection and refinement run as a single
    device dispatch with no intermediate host pull.

    candidates: optional explicit pool [N, L] — scored instead of sampling
    the node's own mixture (the transition-model path, reference
    motion_primitive_generator.py:195-198 `_get_best_fit_sample_using_gmm`
    with a predicted gmm).

    Returns (s, error) as device arrays.
    """
    p = _selection_params(sc, config)
    if candidates is not None:
        p.pop("cluster_mode")
        p.pop("n_samples")
        return _search_and_refine(
            skeleton, prim, sc, jnp.asarray(candidates),
            p.pop("threshold"), p.pop("error_scale"), p.pop("quality_scale"),
            **p)
    if p.pop("cluster_mode") and cluster_tree is not None:
        p.pop("n_samples")
        return _search_and_refine(
            skeleton, prim, sc, jnp.asarray(cluster_tree.data),
            p.pop("threshold"), p.pop("error_scale"), p.pop("quality_scale"),
            **p)
    return _sample_and_refine(
        skeleton, key, prim, sc,
        p.pop("threshold"), p.pop("error_scale"), p.pop("quality_scale"),
        **p)


# ---------------------------------------------------------------------------
# Fused step: selection + refinement + epilogue in ONE device dispatch
# ---------------------------------------------------------------------------
#
# The host-loop generator previously paid two dispatches + two host pulls
# per step (select/refine, then the back-project/align/arc epilogue); on a
# remote-attached TPU each extra round-trip is ~30 ms of p50 step latency.
# These entry points return everything the host loop needs from one jitted
# program, pulled with one device_get.
#
# The fusion is a DISPATCH-latency trade: on CPU, interleaved 10-run A/Bs
# measured fused == split within noise (both ~9-10 ms p50 step on the toy
# walk), while off-CPU the saved round-trip is pure win, so fused is the
# default everywhere.  MG_FUSED_STEP=0 keeps the two-program split as an
# escape hatch (and the split entry points remain first-class APIs).


def use_fused_step() -> bool:
    """Whether host-loop steps run as one fused dispatch (default yes;
    MG_FUSED_STEP=0 selects the split two-program path)."""
    return os.environ.get("MG_FUSED_STEP", "1") != "0"


def _finalize_core(prim, s, sc, path, travelled, max_frames: int,
                   window: int, use_traj: bool, look_ahead=None,
                   n_refine: int = 8):
    """Step epilogue: back-project the winner, align to the motion so far
    (or place at the start pose), advance the travelled arc (the former
    motion_generator epilogue — alignment state rides in `sc`
    exactly as constraint evaluation used it, so the emitted frames match
    what the constraints scored).

    look_ahead (traced scalar or None=unbounded) caps the travelled-arc
    closest-point window at travelled + look_ahead — the reference
    `look_ahead_distance` semantics (motion_generator.py:354-363
    _update_travelled_arc_length).  n_refine carries the
    closest_point_search_accuracy budget (spline_path.refine_iters_for_accuracy)."""
    from ..models import primitive as prim_mod
    from ..ops import align, spline_path
    frames, n_frames, _ = prim_mod.back_project(prim, s, max_frames,
                                                use_time=False)
    aligned_prev = align.align_clip(sc.prev_last, frames, window)
    placed_start = align.transform_frames(frames, sc.start_q, sc.start_delta)
    frames = jnp.where(sc.has_prev > 0, aligned_prev, placed_start)
    if use_traj:
        last = frames[jnp.maximum(n_frames - 1, 0)]
        travelled = jnp.asarray(travelled)
        if look_ahead is None:
            _, travelled, _ = spline_path.closest_point(
                path, last[:3], travelled, n_refine=n_refine)
        else:
            _, travelled, _ = spline_path.closest_point(
                path, last[:3], travelled, n_refine=n_refine,
                max_arc_length=travelled + look_ahead, bounded=True)
    return frames, n_frames, travelled


@functools.partial(jax.jit, static_argnames=("max_frames", "window",
                                             "use_traj", "n_refine"))
def finalize_step(prim, s, sc, path, travelled, max_frames: int,
                  window: int, use_traj: bool, look_ahead=None,
                  n_refine: int = 8):
    """Standalone jitted step epilogue (the split-dispatch path and the
    transition-model branch use it; the fused entry points inline the same
    body)."""
    return _finalize_core(prim, s, sc, path, travelled, max_frames, window,
                          use_traj, look_ahead, n_refine)


def _select_core(skeleton, key, prim, sc, candidates, threshold, error_scale,
                 quality_scale, n_samples: int, n_iters: int, do_refine: bool,
                 use_traj: bool, use_ca: bool, use_ts: bool,
                 use_candidates: bool, n_starts: int = 1):
    """Shared selection body of the fused steps: candidate-pool search or
    best-of-N GMM sampling, then threshold-gated LM (one definition so a
    fix to the select flow cannot miss one of the fused wrappers)."""
    if use_candidates:
        return _search_and_refine(
            skeleton, prim, sc, candidates, threshold, error_scale,
            quality_scale, n_iters=n_iters, do_refine=do_refine,
            use_traj=use_traj, use_ca=use_ca, use_ts=use_ts,
            n_starts=n_starts)
    return _sample_and_refine(
        skeleton, key, prim, sc, threshold, error_scale, quality_scale,
        n_samples=n_samples, n_iters=n_iters, do_refine=do_refine,
        use_traj=use_traj, use_ca=use_ca, use_ts=use_ts, n_starts=n_starts)


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_samples", "n_iters", "do_refine",
                                    "use_traj", "use_ca", "use_ts",
                                    "loco_flags", "max_frames", "window",
                                    "use_candidates", "n_refine", "n_starts"))
def _loco_step_fused(skeleton, key, prim, sc, candidates, path, loco,
                     travelled, threshold, error_scale, quality_scale,
                     n_samples: int, n_iters: int, do_refine: bool,
                     use_traj: bool, use_ca: bool, use_ts: bool,
                     loco_flags: tuple, max_frames: int, window: int,
                     use_candidates: bool, look_ahead=None,
                     n_refine: int = 8, n_starts: int = 1):
    sc = compiled.fill_locomotion_slots(sc, path, loco, *loco_flags)
    s, err = _select_core(skeleton, key, prim, sc, candidates, threshold,
                          error_scale, quality_scale, n_samples, n_iters,
                          do_refine, use_traj, use_ca, use_ts, use_candidates,
                          n_starts=n_starts)
    frames, n_frames, travelled = _finalize_core(
        prim, s, sc, path, travelled, max_frames, window, use_traj=True,
        look_ahead=look_ahead, n_refine=n_refine)
    return s, err, sc, frames, n_frames, travelled


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_samples", "n_iters", "do_refine",
                                    "use_traj", "use_ca", "use_ts",
                                    "max_frames", "window",
                                    "use_candidates", "n_starts"))
def _step_fused(skeleton, key, prim, sc, candidates, path, travelled,
                threshold, error_scale, quality_scale,
                n_samples: int, n_iters: int, do_refine: bool,
                use_traj: bool, use_ca: bool, use_ts: bool,
                max_frames: int, window: int, use_candidates: bool,
                n_starts: int = 1):
    s, err = _select_core(skeleton, key, prim, sc, candidates, threshold,
                          error_scale, quality_scale, n_samples, n_iters,
                          do_refine, use_traj, use_ca, use_ts, use_candidates,
                          n_starts=n_starts)
    # non-loco steps never advance the travelled arc (split path contract:
    # generate_step's MG_FUSED_STEP=0 branch finalizes with use_traj=False;
    # use_traj above only selects the constraint-residual terms)
    frames, n_frames, travelled = _finalize_core(
        prim, s, sc, path, travelled, max_frames, window, use_traj=False)
    return s, err, sc, frames, n_frames, travelled


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("max_frames", "window"))
def _unconstrained_step_fused(skeleton, key, prim, sc, path, travelled,
                              max_frames: int, window: int):
    s = sample_latent(key, prim, 1)[0]
    frames, n_frames, travelled = _finalize_core(
        prim, s, sc, path, travelled, max_frames, window, use_traj=False)
    return s, frames, n_frames, travelled


def unconstrained_step(skeleton, key, prim, sc, path, travelled,
                       max_frames: int, window: int):
    """Unconstrained step (one GMM sample + epilogue); fused or split per
    use_fused_step, same contract as generate_step minus err/sc."""
    if use_fused_step():
        return _unconstrained_step_fused(skeleton, key, prim, sc, path,
                                         travelled, max_frames=max_frames,
                                         window=window)
    s = sample_latent(key, prim, 1)[0]
    frames, n_frames, new_arc = finalize_step(
        prim, s, sc, path, travelled, max_frames=max_frames, window=window,
        use_traj=False)
    return s, frames, n_frames, new_arc


def generate_step(key, skeleton: Skeleton, prim: MotionPrimitive,
                  sc: compiled.StepConstraints, config: dict,
                  travelled, max_frames: int, window: int,
                  path=None, loco=None, loco_flags=None,
                  cluster_tree=None, candidates=None,
                  look_ahead=None, n_refine: int = 8):
    """Constrained step: selection (+ optional LM) + epilogue.

    With `loco`/`loco_flags`, the locomotion slots fill on device first
    (deferred-slot flow).  candidates > cluster_tree > GMM sampling pick
    the pool, mirroring generate_constrained_sample{,_loco}.
    Returns (s, err, filled_sc, frames, n_frames, new_travelled) as device
    values — pull with ONE jax.device_get.

    Runs as ONE fused dispatch by default (dispatch round-trips dominate on
    remote-attached TPUs; CPU measured parity) — MG_FUSED_STEP=0 selects the
    two-program split (see use_fused_step)."""
    if not use_fused_step():
        if loco is not None:
            s, err, sc = generate_constrained_sample_loco(
                key, skeleton, prim, sc, path, loco, loco_flags, config,
                cluster_tree=cluster_tree, candidates=candidates)
            fin_path, fin_traj = path, True
        else:
            s, err = generate_constrained_sample(
                key, skeleton, prim, sc, config,
                cluster_tree=cluster_tree, candidates=candidates)
            fin_path, fin_traj = sc.traj, False
        frames, n_frames, new_arc = finalize_step(
            prim, s, sc, fin_path, travelled, max_frames=max_frames,
            window=window, use_traj=fin_traj,
            look_ahead=(look_ahead if fin_traj else None), n_refine=n_refine)
        return s, err, sc, frames, n_frames, new_arc
    p = _selection_params(sc, config)
    cluster_mode = p.pop("cluster_mode")
    pool = candidates
    if pool is None and cluster_mode and cluster_tree is not None:
        pool = cluster_tree.data
    use_candidates = pool is not None
    pool_arr = (jnp.asarray(pool) if use_candidates
                else jnp.zeros((1, 1), jnp.float32))
    common = dict(threshold=p.pop("threshold"),
                  error_scale=p.pop("error_scale"),
                  quality_scale=p.pop("quality_scale"),
                  max_frames=max_frames, window=window,
                  use_candidates=use_candidates, **p)
    if loco is not None:
        return _loco_step_fused(skeleton, key, prim, sc, pool_arr, path,
                                loco, travelled,
                                loco_flags=tuple(loco_flags),
                                look_ahead=look_ahead, n_refine=n_refine,
                                **common)
    # non-loco steps finalize with use_traj=False, so the path operand is
    # only a tracing placeholder (sc.traj keeps the pytree shape stable)
    placeholder = path if path is not None else sc.traj
    return _step_fused(skeleton, key, prim, sc, pool_arr, placeholder,
                       travelled, **common)
