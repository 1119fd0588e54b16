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

from ..models.graph import (StackedGraph, NODE_TYPE_STANDARD, NODE_TYPE_END,
                            NODE_TYPE_IDS, TRANSITION_TYPE_IDS)
from ..ops import align, quat, spline_path
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
        samples = jax.vmap(
            lambda kk: walk_mod.sample_node_latent(kk, g, state.node_id))(
                jax.random.split(k_s, n_samples))
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