"""Fully-jitted constrained locomotion: trajectory following as one scan.

The reference's constrained synthesis is a Python loop: per step it builds
constraints, scores 100 GMM samples through back-projection + FK, optionally
runs scipy leastsq, appends frames (SURVEY.md §3.1 Hot Loops A-C).  Here the
whole trajectory-following walk — goal estimation, candidate scoring,
selection, back-projection, alignment — is ONE `lax.scan`, and a crowd of
characters each following their own path is a `vmap` over it.

Key cost trick: for clamped B-splines the first/last coefficient rows ARE
the first/last frames, so locomotion candidates (goal position + heading at
the step end, reference locomotion_constraints_builder.py:54-120) are scored
from two gathered coefficient rows per candidate — no full back-projection,
no FK.  This is the same structure as the reference's analytic step-goal
objective (motion_primitive.py:345-378), vectorized over candidates x
characters.  Only the winning latent is fully back-projected.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.graph import (StackedGraph, NODE_TYPE_STANDARD, NODE_TYPE_END,
                            NODE_TYPE_IDS, TRANSITION_TYPE_IDS)
from ..ops import align, quat, spline_path
from ..ops import lm as lm_ops
from . import walk as walk_mod


class ConstrainedWalkState(NamedTuple):
    node_id: jax.Array
    prev_last: jax.Array  # [D] last aligned frame so far
    travelled: jax.Array  # arc length on the path
    done: jax.Array
    key: jax.Array


def _boundary_rows(g: StackedGraph, node_id: jax.Array):
    """Eigen/mean rows for the first and last coefficient blocks of a node.

    Returns (e2 [2*n_dim, k_s], mu2 [2*n_dim]) with rows [first; last]."""
    d = g.n_dim
    eigen = g.eigen_s[node_id]  # [D_max, k]
    mean = g.mean_s[node_id]  # [D_max]
    first_e = jax.lax.dynamic_slice_in_dim(eigen, 0, d, axis=0)
    first_m = jax.lax.dynamic_slice_in_dim(mean, 0, d, axis=0)
    # last block: rows (n_basis_max - 1) * n_dim ... (padded blocks are zero,
    # so use the node's true n_basis via gather arithmetic)
    # Padded trailing coefficient blocks are zero and do NOT hold the final
    # frame; the true last block index is (true n_basis - 1), stored per
    # node at stack time.
    last_start = (g.node_n_basis[node_id] - 1) * d
    last_e = jax.lax.dynamic_slice_in_dim(eigen, last_start, d, axis=0)
    last_m = jax.lax.dynamic_slice_in_dim(mean, last_start, d, axis=0)
    return (jnp.concatenate([first_e, last_e], axis=0),
            jnp.concatenate([first_m, last_m], axis=0))


def _score_candidates(g: StackedGraph, node_id: jax.Array, samples: jax.Array,
                      prev_last: jax.Array, goal_pos: jax.Array,
                      goal_dir: jax.Array, has_prev: jax.Array,
                      dir_weight: float = 0.8):
    """Score latent candidates on end-position (XZ) + end-heading error after
    per-candidate 2D alignment.  samples: [N, L] -> errors [N]."""
    d = g.n_dim
    e2, mu2 = _boundary_rows(g, node_id)
    alphas = samples[:, : g.k_s_max]  # [N, k]
    rows = jnp.matmul(alphas, e2.T, precision=jax.lax.Precision.HIGHEST) + mu2
    first = rows[:, :d]
    last = rows[:, d:]

    def align_one(first_f, last_f):
        q_y, delta = align.node_aligning_2d_transform(prev_last, first_f)
        q_y = jnp.where(has_prev, q_y, jnp.array([1.0, 0, 0, 0]))
        delta = jnp.where(has_prev, delta, jnp.zeros(3))
        return align.transform_frames(last_f[None], q_y, delta)[0]

    last_aligned = jax.vmap(align_one)(first, last)
    pos = last_aligned[:, :3]
    pos_err = jnp.sqrt((pos[:, 0] - goal_pos[0]) ** 2
                       + (pos[:, 2] - goal_pos[2]) ** 2 + 1e-12)
    heading = quat.rotate_vec(quat.normalize(last_aligned[:, 3:7]),
                              jnp.array([0.0, 0.0, 1.0]))
    hd = jnp.stack([heading[:, 0], heading[:, 2]], axis=-1)
    hd = hd / jnp.maximum(jnp.linalg.norm(hd, axis=-1, keepdims=True), 1e-10)
    cos_a = jnp.clip(jnp.sum(hd * goal_dir, axis=-1), -1.0, 1.0)
    dir_err = jnp.rad2deg(jnp.arccos(cos_a))
    return pos_err + dir_weight * dir_err


@functools.partial(jax.jit, static_argnames=("n_steps", "max_step_frames",
                                             "n_samples", "window"))
def constrained_walk(key: jax.Array, g: StackedGraph,
                     path: spline_path.PathSpline, start_id: jax.Array,
                     n_steps: int, max_step_frames: int = 128,
                     n_samples: int = 64, window: int = 20,
                     step_length_factor: float = 1.0,
                     end_threshold: float = 20.0):
    """Follow a trajectory spline with constrained per-step selection.

    Per scan step (reference motion_generator.py:157-268 semantics):
      goal arc = travelled + avg_step_length; goal position/direction from
      the path; best of n_samples GMM candidates under the locomotion
      objective; back-project the winner; align to the previous step; update
      travelled arc via closest-point search.

    Returns (segments [S, T, D], n_frames [S], node_ids [S], errors [S]).
    """
    d = g.n_dim
    std_t = TRANSITION_TYPE_IDS[NODE_TYPE_STANDARD]
    end_t = TRANSITION_TYPE_IDS[NODE_TYPE_END]
    full_arc = path.full_arc_length

    init = ConstrainedWalkState(
        node_id=jnp.asarray(start_id, jnp.int32),
        prev_last=jnp.zeros(d, jnp.float32),
        travelled=jnp.asarray(0.0, jnp.float32),
        done=jnp.asarray(False),
        key=key,
    )

    def step(state: ConstrainedWalkState, step_idx):
        k_s, k_t, k_n = jax.random.split(state.key, 3)
        has_prev = step_idx > 0

        # ---- locomotion goal (reference locomotion_constraints_builder)
        step_len = g.avg_step_length[state.node_id] * step_length_factor
        near_end = state.travelled + step_len >= full_arc - end_threshold
        goal_arc = jnp.where(near_end, full_arc, state.travelled + step_len)
        goal_pos, goal_dir = spline_path.point_and_dir_at_arc_length(path, goal_arc)

        # ---- best-of-N candidate selection on boundary rows
        samples = walk_mod.sample_node_latents(k_s, g, state.node_id,
                                               n_samples)
        errors = _score_candidates(g, state.node_id, samples, state.prev_last,
                                   goal_pos, goal_dir, has_prev)
        best = jnp.argmin(errors)
        s = samples[best]
        err = errors[best]

        # ---- back-project the winner + align (boundary-scan style)
        frames, n_frames, _ = walk_mod.back_project_node(
            g, state.node_id, s, max_step_frames, use_time=True)
        q_y, delta = align.node_aligning_2d_transform(state.prev_last, frames[0])
        q_y = jnp.where(has_prev, q_y, jnp.array([1.0, 0, 0, 0]))
        delta = jnp.where(has_prev, delta, jnp.zeros(3))
        aligned = align.transform_frames(frames, q_y, delta)
        aligned = jnp.where(has_prev,
                            align.smooth_transition(state.prev_last, aligned, window),
                            aligned)
        last_idx = jnp.maximum(n_frames - 1, 0)
        new_last = aligned[last_idx]

        # ---- travelled arc update (closest point from previous arc)
        _, new_arc, _ = spline_path.closest_point(path, new_last[:3],
                                                  state.travelled)

        # ---- transition (end when the path is nearly consumed)
        want_end = new_arc >= full_arc - end_threshold
        type_id = jnp.where(want_end, end_t, std_t)
        next_id, found = walk_mod.choose_transition(k_t, g, state.node_id, type_id)
        emitted_id = jnp.where(state.done, -1, state.node_id)
        n_frames = jnp.where(state.done, 0, n_frames)
        done = state.done | ~found | (want_end & (g.node_type[state.node_id]
                                                  == NODE_TYPE_IDS[NODE_TYPE_END]))
        new_state = ConstrainedWalkState(next_id, new_last, new_arc, done, k_n)
        return new_state, (aligned, n_frames, emitted_id, err)

    _, (segments, n_frames, node_ids, errors) = jax.lax.scan(
        step, init, jnp.arange(n_steps))
    return segments, n_frames, node_ids, errors


# ---------------------------------------------------------------------------
# Full-constraint flagship: complete StepConstraints semantics + gated LM
# ---------------------------------------------------------------------------
#
# The lightweight `constrained_walk` above scores only end-position +
# end-heading from two boundary coefficient rows.  This variant evaluates the
# COMPLETE compiled constraint slot set per candidate — keyframe transforms,
# 2D direction, look-at, relative-transform, joint-rotation, transition pose,
# trajectory residuals with advancing arc, collision avoidance — exactly the
# semantics of constraints/compiled.evaluate_error (reference
# motion_primitive_constraints.py:100-158), plus a lax.cond-gated
# Levenberg-Marquardt refinement per scan step (reference
# motion_primitive_generator.py:126-207 `_optimize_parameters_numerically`),
# all inside ONE jitted scan over a StackedGraph.

def node_gmm(g: StackedGraph, node_id: jax.Array):
    """Gather node `node_id`'s mixture as a GMM pytree view."""
    from ..ops import gmm as gmm_ops
    return gmm_ops.GMM(g.gmm_weights[node_id], g.gmm_means[node_id],
                       g.gmm_cov_chol[node_id], g.gmm_prec_chol[node_id])


def stacked_aligned_coeffs(g: StackedGraph, node_id: jax.Array, sc,
                           s: jax.Array) -> jax.Array:
    """Back-project the spatial latent from stacked rows and apply the step's
    aligning transform to the coefficient rows (stacked-graph twin of
    constraints/compiled.aligned_coeffs)."""
    from ..constraints import compiled  # local: avoid import cycle at module load
    alpha = s[: g.k_s_max]
    coeffs = jnp.matmul(g.eigen_s[node_id], alpha,
                        precision=jax.lax.Precision.HIGHEST) + g.mean_s[node_id]
    coeffs = coeffs.reshape(g.n_basis_max, g.n_dim)
    q_prev, d_prev = align.node_aligning_2d_transform(sc.prev_last, coeffs[0])
    q_y = jnp.where(sc.has_prev > 0, q_prev, sc.start_q)
    delta = jnp.where(sc.has_prev > 0, d_prev, sc.start_delta)
    return align.transform_frames(coeffs, q_y, delta)


def stacked_residuals(skeleton, g: StackedGraph, node_id: jax.Array, sc,
                      s: jax.Array, use_traj: bool = True,
                      use_ca: bool = True, use_ts: bool = False,
                      root_only: bool = False) -> jax.Array:
    """Full compiled-constraint residual vector for a latent candidate at a
    (traced) stacked-graph node."""
    from ..constraints import compiled
    coeffs = stacked_aligned_coeffs(g, node_id, sc, s)
    return compiled.residuals_from_coeffs(skeleton, g.knots_s[node_id], sc,
                                          coeffs, use_traj=use_traj,
                                          use_ca=use_ca, use_ts=use_ts,
                                          root_only=root_only)


def stacked_error(skeleton, g: StackedGraph, node_id: jax.Array, sc,
                  s: jax.Array, use_traj: bool = True,
                  use_ca: bool = True, use_ts: bool = False,
                  root_only: bool = False) -> jax.Array:
    from ..constraints import compiled
    return compiled.error_from_residuals(
        stacked_residuals(skeleton, g, node_id, sc, s, use_traj, use_ca,
                          use_ts, root_only))


class FullWalkState(NamedTuple):
    node_id: jax.Array
    prev_last: jax.Array
    travelled: jax.Array
    done: jax.Array
    key: jax.Array


def default_step_scs(skeleton, n_steps: int):
    """Host-built default per-step constraint pytree: n_steps broadcast
    copies of the empty StepConstraints (numpy leaves — no trace hazard)."""
    from ..constraints import compiled
    base = compiled.empty_step_constraints(skeleton, 0)
    return jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (n_steps,) + np.shape(x)),
        base)


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_steps", "max_step_frames", "n_samples",
                                    "window", "lm_iters", "use_traj",
                                    "use_ca", "use_ts", "use_half",
                                    "root_node", "pallas_selection",
                                    "pallas_ee",
                                    "root_only", "lm_frozen",
                                    "lm_frozen_closed", "frozen_ee",
                                    "return_pre_lm_err"))
def constrained_walk_full(skeleton, key: jax.Array, g: StackedGraph,
                          path: spline_path.PathSpline, start_id: jax.Array,
                          n_steps: int, step_scs=None,
                          max_step_frames: int = 128, n_samples: int = 64,
                          window: int = 20, lm_iters: int = 5,
                          lm_threshold: float = 0.0,
                          error_scale: float = 1.0,
                          quality_scale: float = 0.1,
                          step_length_factor: float = 1.0,
                          end_threshold: float = 20.0,
                          pos_weight: float = 1.0, dir_weight: float = 0.8,
                          traj_weight: float = 1.0, use_traj: bool = True,
                          use_ca: bool = False, use_ts: bool = False,
                          use_half: bool = False,
                          root_node: int = 0,
                          pallas_selection: bool = False,
                          pallas_ee: str = None,
                          root_only: bool = False,
                          lm_frozen: bool = False,
                          lm_frozen_closed: bool = True,
                          frozen_ee: str = None,
                          return_pre_lm_err: bool = False):
    """Trajectory-following walk with FULL constraint semantics per step.

    Per scan step (reference motion_generator.py:157-268 +
    motion_primitive_generator.py:126-207 semantics):
      1. locomotion goal/direction slots filled from on-device path queries
         (kf slot 0 = end goal, optional slot 1 = half step);
      2. the step's trajectory constraint follows the path from the travelled
         arc (advancing closest-point residuals over TRAJ_SAMPLES canonical
         frames);
      3. any extra user constraints from `step_scs` (a StepConstraints pytree
         stacked over a leading [n_steps] axis; keyframe slots 2+ are free —
         slots 0/1 are overwritten by the locomotion goals) are evaluated in
         the same residual vector;
      4. best of n_samples GMM candidates under the complete constraint
         error;
      5. lax.cond-gated Levenberg-Marquardt refinement (exact `jacfwd`
         jacobians over residuals + GMM naturalness) when the best error is
         still >= lm_threshold and lm_iters > 0;
      6. back-project the winner with time warping, align + seam-smooth,
         update the travelled arc, transition (end type once the path is
         nearly consumed).

    root_only=True (static) skips the per-joint FK chain inside every
    residual evaluation (and its LM tangents) — valid only when all active
    user slots reference the root joint; check the stacked pytree host-side
    with `compiled.step_scs_root_only` (the locomotion slots the walk fills
    are always root-referencing).

    Returns (segments [S, T, D], n_frames [S], node_ids [S], errors [S]);
    with return_pre_lm_err=True (static) a 5th array [S] carries each
    step's PRE-LM best-of-N selection error, so tests can assert the
    reference leastsq never-worsen contract (least_squares.py:~35 returns
    the initial guess on failure) within ONE run — comparing two whole
    walks per-step is only valid at step 0, because refining step k
    changes the carried pose + travelled arc that step k+1 selects under.
    """
    from ..constraints import compiled
    from ..ops import gmm as gmm_ops

    d = g.n_dim
    std_t = TRANSITION_TYPE_IDS[NODE_TYPE_STANDARD]
    end_t = TRANSITION_TYPE_IDS[NODE_TYPE_END]
    full_arc = path.full_arc_length

    if step_scs is None:
        step_scs = default_step_scs(skeleton, n_steps)

    if pallas_selection:
        # the fused selection kernel covers exactly the locomotion family
        # (root goal keyframe + direction + root trajectory) — plus, with
        # pallas_ee, ONE position-only end-effector keyframe in slot 2;
        # callers must verify step_scs carries nothing else BEFORE enabling
        # it (compiled.step_scs_locomotion_only / step_scs_pallas_ee_only —
        # checked host-side in constrained_walk_full_crowd; step_scs is
        # traced here, so only the static flags are checkable at this level)
        from ..ops import pallas_kernels as pk
        # ValueError, not assert: these guards protect against silent
        # mis-ranking and must survive python -O
        if n_samples % pk.N_BLK != 0:
            raise ValueError(
                f"pallas_selection needs n_samples % {pk.N_BLK} == 0")
        if use_half:
            raise ValueError(
                "pallas_selection scores the locomotion goal only; the "
                "half-step keyframe slot would be ignored during ranking")
        # fk_root adds the skeleton's root offset to frame translations;
        # shift the kernel's goal/table by -offset so its raw-translation
        # residuals equal the exact evaluator's
        root_off = jnp.asarray(skeleton.offsets[0], jnp.float32)
        path_table = pk.pack_path_table(path, root_offset=root_off)
        # constant across scan steps
        if pallas_ee is not None:
            ee_chain_idx, ee_chain_const = pk.pack_ee_chain(skeleton,
                                                            pallas_ee)
            ee_chain = jnp.asarray(ee_chain_const)
        else:
            ee_chain_idx = ee_chain = None
    elif pallas_ee is not None:
        raise ValueError("pallas_ee requires pallas_selection")

    init = FullWalkState(
        node_id=jnp.asarray(start_id, jnp.int32),
        prev_last=jnp.zeros(d, jnp.float32),
        travelled=jnp.asarray(0.0, jnp.float32),
        done=jnp.asarray(False),
        key=key,
    )

    def step(state: FullWalkState, xs):
        step_idx, sc0 = xs
        k_s, k_t, k_n = jax.random.split(state.key, 3)
        has_prev = (step_idx > 0).astype(jnp.float32)
        n_can_f = g.n_canonical[state.node_id].astype(jnp.float32)

        # ---- locomotion goal (reference locomotion_constraints_builder)
        step_len = g.avg_step_length[state.node_id] * step_length_factor
        near_end = state.travelled + step_len >= full_arc - end_threshold
        goal_arc = jnp.where(near_end, full_arc, state.travelled + step_len)
        loco = compiled.LocoSpec(
            goal_arc=goal_arc, half_arc=state.travelled + 0.5 * step_len,
            node=jnp.asarray(root_node, jnp.int32),
            end_kf=n_can_f - 1.0, mid_kf=0.5 * (n_can_f - 1.0),
            dim_mask=jnp.array([1.0, 0.0, 1.0]),
            pos_weight=jnp.asarray(pos_weight),
            dir_weight=jnp.asarray(dir_weight))
        sc = sc0.replace(
            traj=path,
            traj_active=jnp.asarray(1.0 if use_traj else 0.0),
            traj_node=jnp.asarray(root_node, jnp.int32),
            traj_min_arc=state.travelled,
            traj_weight=jnp.asarray(traj_weight),
            n_canonical=n_can_f,
            prev_last=state.prev_last, has_prev=has_prev)
        sc = compiled.fill_locomotion_slots(sc, path, loco, use_pos=True,
                                            use_dir=True, use_half=use_half)

        # ---- best-of-N under the COMPLETE constraint error
        samples = walk_mod.sample_node_latents(k_s, g, state.node_id,
                                               n_samples)
        if pallas_selection:
            # fused VMEM-resident scoring (ops/pallas_kernels.py): ranks the
            # candidates; the winner is re-scored through the exact XLA
            # evaluator below so the reported error and LM gate semantics
            # match the XLA selection path bit-for-bit in aggregation
            from ..ops import pallas_kernels as pk
            goal_pos, goal_dir = spline_path.point_and_dir_at_arc_length(
                path, goal_arc)
            mop = pk.selection_operator(
                g.eigen_s[state.node_id], g.mean_s[state.node_id],
                g.knots_s[state.node_id], g.n_basis_max, g.n_dim,
                goal_frame=n_can_f - 1.0, dir_frame=n_can_f - 1.0,
                n_canonical=n_can_f,
                ee_frame=sc.kf_frame[2] if pallas_ee else None,
                ee_chain_idx=ee_chain_idx)
            a_prev = align.heading_angle(state.prev_last[3:7])
            # step 0 uses the user start pose, exactly like the evaluator
            a_start = align.heading_angle(sc.start_q)
            cfg = pk.pack_selection_cfg(
                path, a_prev, state.prev_last[:3],
                start_theta=a_start, start_delta=sc.start_delta,
                has_prev=has_prev, goal_pos=goal_pos, dir_target=goal_dir,
                min_arc=state.travelled, kf_weight=pos_weight,
                dir_weight=dir_weight,
                traj_active=1.0 if use_traj else 0.0,
                traj_weight=traj_weight,
                # user active ranges must gate the kernel's trajectory
                # residuals exactly like the XLA scorer's sc.traj_range_*
                range_lo=sc.traj_range_start, range_hi=sc.traj_range_end,
                root_offset=root_off,
                # the end-effector keyframe (user slot 2) when enabled —
                # target/mask/weight straight from the user's slot
                ee_active=sc.kf_active[2] if pallas_ee else 0.0,
                ee_weight=sc.kf_weight[2] if pallas_ee else 1.0,
                ee_target=sc.kf_pos[2] if pallas_ee else None,
                ee_mask=sc.kf_pos_mask[2] if pallas_ee else None)
            errors = pk.score_locomotion_candidates(
                mop, samples[:, : g.k_s_max], path_table, cfg,
                chain=ee_chain)
            best = jnp.argmin(errors)
            s = samples[best]
            err = stacked_error(skeleton, g, state.node_id, sc, s,
                                use_traj, use_ca, use_ts,
                                root_only=root_only)
        else:
            errors = jax.vmap(lambda sv: stacked_error(
                skeleton, g, state.node_id, sc, sv, use_traj, use_ca,
                use_ts, root_only=root_only))(samples)
            best = jnp.argmin(errors)
            s = samples[best]
            err = errors[best]

        err_pre = err  # best-of-N selection error, before any LM
        # ---- gated LM refinement (reference leastsq semantics)
        if lm_frozen and not root_only and frozen_ee is None:
            raise ValueError("lm_frozen needs root-only slots or a single "
                             "end-effector joint via frozen_ee; anything "
                             "else needs the exact LM")
        if lm_iters > 0:
            gmm = node_gmm(g, state.node_id)
            # gate the active mask by the STATIC use_* flags: families
            # compiled out of the residual vector must not keep their mask
            # slots on, or each such slot degenerates to quality_scale*nll
            # and the naturalness term is counted up to 20x (one per
            # masked-but-unevaluated slot)
            act = compiled.active_mask(sc) * jnp.asarray(
                compiled.static_family_gate(use_traj=use_traj, use_ca=use_ca,
                                            use_ts=use_ts))

            def residuals(sv):
                r = stacked_residuals(skeleton, g, state.node_id, sc, sv,
                                      use_traj, use_ca, use_ts,
                                      root_only=root_only)
                nll = -gmm_ops.log_prob(gmm, sv)
                return act * (error_scale * r + quality_scale * nll)

            def refine(args):
                s0, e0 = args
                if lm_frozen:
                    # frozen-model LM: alignment + trajectory
                    # correspondences re-frozen each iteration, residuals
                    # affine in the latent.  The final candidate is
                    # re-scored exactly below, so a frozen-model step is
                    # only ever kept when the TRUE error improves.
                    # Default: the closed-form fused iteration
                    # (value + jacobian in one VJP pass over the 7-channel
                    # heads + affine contractions) — lm_frozen_closed=False
                    # falls back to the linearize-per-tangent form (the
                    # spec the closed form is parity-tested against).
                    use_closed = (lm_frozen_closed
                                  and compiled.frozen_closed_supported(
                                      skeleton))
                    # single end-effector fast path (VERDICT r4 #4): slots
                    # on root OR frozen_ee run the same fused frozen
                    # iteration via ancestor-chain affine channels
                    ee_idx = (skeleton.index_of(frozen_ee)
                              if (frozen_ee is not None and not root_only)
                              else None)
                    if use_closed:
                        raw_make_c = compiled.make_frozen_root_residuals_closed(
                            skeleton, g.knots_s[state.node_id], sc,
                            g.eigen_s[state.node_id], g.mean_s[state.node_id],
                            g.n_basis_max, g.n_dim, g.k_s_max,
                            use_traj=use_traj, use_ca=use_ca,
                            ee_node=ee_idx)
                        n_lat = s0.shape[0]

                        def make_vj(sv):
                            r_raw, j_raw, vfn = raw_make_c(sv)
                            nll, g_nll = jax.value_and_grad(
                                lambda x: -gmm_ops.log_prob(gmm, x))(sv)
                            j_pad = jnp.pad(
                                j_raw, ((0, 0), (0, n_lat - j_raw.shape[1])))
                            r = act * (error_scale * r_raw
                                       + quality_scale * nll)
                            j = act[:, None] * (error_scale * j_pad
                                                + quality_scale
                                                * g_nll[None, :])

                            def value(x):
                                return act * (
                                    error_scale * vfn(x)
                                    + quality_scale
                                    * (-gmm_ops.log_prob(gmm, x)))

                            return r, j, value

                        s_opt, _ = lm_ops.lm_minimize(
                            None, s0, lm_iters, make_value_jac_fn=make_vj)
                    else:
                        raw_make = compiled.make_frozen_root_residuals(
                            skeleton, g.knots_s[state.node_id], sc,
                            g.eigen_s[state.node_id], g.mean_s[state.node_id],
                            g.n_basis_max, g.n_dim, g.k_s_max,
                            use_traj=use_traj, use_ca=use_ca,
                            ee_node=ee_idx)

                        def make_fn(sv):
                            rf = raw_make(sv)
                            return lambda x: act * (
                                error_scale * rf(x)
                                + quality_scale
                                * (-gmm_ops.log_prob(gmm, x)))

                        s_opt, _ = lm_ops.lm_minimize(
                            None, s0, lm_iters, make_residual_fn=make_fn)
                else:
                    s_opt, _ = lm_ops.lm_minimize(residuals, s0, lm_iters)
                e_opt = stacked_error(skeleton, g, state.node_id, sc, s_opt,
                                      use_traj, use_ca, use_ts,
                                      root_only=root_only)
                better = e_opt < e0
                return jnp.where(better, s_opt, s0), jnp.minimum(e0, e_opt)

            s, err = jax.lax.cond(err >= lm_threshold, refine,
                                  lambda args: args, (s, err))

        # ---- back-project the winner + align + smooth
        frames, n_frames, _ = walk_mod.back_project_node(
            g, state.node_id, s, max_step_frames, use_time=True)
        q_y, delta = align.node_aligning_2d_transform(state.prev_last, frames[0])
        q_y = jnp.where(has_prev > 0, q_y, jnp.array([1.0, 0, 0, 0]))
        delta = jnp.where(has_prev > 0, delta, jnp.zeros(3))
        aligned = align.transform_frames(frames, q_y, delta)
        aligned = jnp.where(has_prev > 0,
                            align.smooth_transition(state.prev_last, aligned,
                                                    window),
                            aligned)
        last_idx = jnp.maximum(n_frames - 1, 0)
        new_last = aligned[last_idx]

        # ---- travelled arc + transition
        _, new_arc, _ = spline_path.closest_point(path, new_last[:3],
                                                  state.travelled)
        want_end = new_arc >= full_arc - end_threshold
        type_id = jnp.where(want_end, end_t, std_t)
        next_id, found = walk_mod.choose_transition(k_t, g, state.node_id,
                                                    type_id)
        emitted_id = jnp.where(state.done, -1, state.node_id)
        n_frames = jnp.where(state.done, 0, n_frames)
        done = state.done | ~found | (want_end & (g.node_type[state.node_id]
                                                  == NODE_TYPE_IDS[NODE_TYPE_END]))
        new_state = FullWalkState(next_id, new_last, new_arc, done, k_n)
        out = (aligned, n_frames, emitted_id, err)
        if return_pre_lm_err:
            out = out + (err_pre,)
        return new_state, out

    _, outs = jax.lax.scan(step, init, (jnp.arange(n_steps), step_scs))
    return outs


def check_pallas_selection_contract(skeleton, step_scs, pallas_ee=None):
    """Host-side guard every pallas_selection consumer must run: the kernel
    ranks candidates on the locomotion family (plus, with pallas_ee, ONE
    position-only keyframe in slot 2) and would silently mis-rank any other
    user slot.  step_scs is traced inside constrained_walk_full, so the
    check can only happen at the crowd/serving boundary — raising here (not
    assert: must survive python -O) keeps every wrapper honest."""
    from ..constraints import compiled
    if pallas_ee is not None:
        if not compiled.step_scs_pallas_ee_only(
                step_scs, skeleton.index_of(pallas_ee)):
            raise ValueError(
                "pallas_selection+pallas_ee ranks candidates on the "
                "locomotion family plus ONE position-only keyframe on "
                f"'{pallas_ee}' in slot 2; step_scs carries other user "
                "slots that would be ignored — use the XLA selection path")
    elif not compiled.step_scs_locomotion_only(step_scs):
        raise ValueError(
            "pallas_selection ranks candidates on the locomotion family "
            "only; step_scs carries user constraint slots that would be "
            "ignored — use the XLA selection path for this workload")


def constrained_walk_full_crowd(skeleton, key: jax.Array, g: StackedGraph,
                                paths: spline_path.PathSpline, start_id,
                                n_chars: int, n_steps: int, **kw):
    """Crowd of full-constraint walks: one vmapped program, per-character
    paths stacked along the leading axis."""
    keys = jax.random.split(key, n_chars)
    start_ids = jnp.broadcast_to(jnp.asarray(start_id, jnp.int32), (n_chars,))
    if kw.get("step_scs") is None:
        kw["step_scs"] = default_step_scs(skeleton, n_steps)
    if kw.get("pallas_selection"):
        check_pallas_selection_contract(skeleton, kw["step_scs"],
                                        kw.get("pallas_ee"))
    if kw.get("lm_frozen") and kw.get("frozen_ee") \
            and not kw.get("root_only"):
        # the frozen-ee LM models exactly root slots + ONE position-only
        # ee keyframe in slot 2 (step_scs is traced inside the walk, so
        # the shape check lives at this boundary like the selection one)
        from ..constraints import compiled
        if not compiled.step_scs_pallas_ee_only(
                kw["step_scs"], skeleton.index_of(kw["frozen_ee"])):
            raise ValueError(
                "lm_frozen+frozen_ee models root slots plus ONE "
                f"position-only keyframe on '{kw['frozen_ee']}' in slot "
                "2; step_scs carries other user slots — use the exact LM")
    # n_steps as a keyword: jit static_argnames only binds keyword args
    return jax.vmap(lambda k, p, s: constrained_walk_full(
        skeleton, k, g, p, s, n_steps=n_steps, **kw))(keys, paths, start_ids)


def constrained_walk_crowd(key: jax.Array, g: StackedGraph,
                           paths: spline_path.PathSpline, start_id,
                           n_chars: int, n_steps: int, **kw):
    """A crowd of characters each following their own path: paths is a
    PathSpline pytree with a leading [n_chars] axis (build each with the
    same max_points and jax.tree.map-stack them)."""
    keys = jax.random.split(key, n_chars)
    start_ids = jnp.broadcast_to(jnp.asarray(start_id, jnp.int32), (n_chars,))
    return jax.vmap(lambda k, p, s: constrained_walk(k, g, p, s, n_steps, **kw))(
        keys, paths, start_ids)


def stack_paths(paths):
    """Stack per-character PathSplines into one leading-axis pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *paths)