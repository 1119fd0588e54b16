"""Graph walks as `lax.scan` programs over a StackedGraph.

TPU-native redesign of the reference's per-step Python loop
(reference motion_state_graph.py:52-139 random walk, §3.5 of SURVEY.md;
frame concatenation semantics of graph_walk.py:154-215):
the whole walk — GMM sampling, fPCA back-projection, B-spline evaluation,
alignment, concatenation — is one jitted scan, and a crowd of characters is
a vmap over the leading axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.graph import (StackedGraph, NODE_TYPE_IDS, TRANSITION_TYPE_IDS,
                            NODE_TYPE_STANDARD, NODE_TYPE_END)
from ..ops import align, bspline, timewarp


def sample_node_latent(key: jax.Array, g: StackedGraph, node_id: jax.Array) -> jax.Array:
    """Draw one latent vector from node `node_id`'s GMM (padded dims included;
    they are inert downstream)."""
    k_comp, k_norm = jax.random.split(key)
    w = g.gmm_weights[node_id]
    comp = jax.random.categorical(k_comp, jnp.log(jnp.maximum(w, 1e-30)))
    mu = g.gmm_means[node_id, comp]
    chol = g.gmm_cov_chol[node_id, comp]
    eps = jax.random.normal(k_norm, mu.shape, dtype=mu.dtype)
    return mu + jnp.matmul(chol, eps, precision=jax.lax.Precision.HIGHEST)


def sample_node_latents(key: jax.Array, g: StackedGraph, node_id: jax.Array,
                        n: int) -> jax.Array:
    """Draw n latent vectors from node `node_id`'s GMM with ONE gather of
    the node's mixture.

    vmapping `sample_node_latent` over n split keys gathers the [L, L]
    component cholesky PER SAMPLE — in the crowd walk that materialized a
    [chars * n, L, L] tensor (0.8 GB of traffic per step at 1024 x 128).
    Here the eps batch is pushed through ALL components as one einsum on
    the MXU and mixed with a one-hot of the sampled component ids."""
    k_comp, k_norm = jax.random.split(key)
    w = g.gmm_weights[node_id]  # [k]
    comps = jax.random.categorical(
        k_comp, jnp.log(jnp.maximum(w, 1e-30)), shape=(n,))
    mus = g.gmm_means[node_id]  # [k, L]
    chols = g.gmm_cov_chol[node_id]  # [k, L, L]
    eps = jax.random.normal(k_norm, (n, mus.shape[-1]), dtype=mus.dtype)
    y = jnp.einsum("kij,nj->nki", chols, eps,
                   precision=jax.lax.Precision.HIGHEST)  # [n, k, L]
    onehot = jax.nn.one_hot(comps, w.shape[0], dtype=mus.dtype)  # [n, k]
    return jnp.einsum("nk,nki->ni", onehot, y) + jnp.matmul(
        onehot, mus, precision=jax.lax.Precision.HIGHEST)


def back_project_node(g: StackedGraph, node_id: jax.Array, s: jax.Array,
                      max_frames: int, use_time: bool = True,
                      speed: float = 1.0):
    """Back-project latent s at a (traced) node id: gather the node's rows,
    then two matmuls (fPCA + B-spline basis).  Equivalent to reference
    motion_primitive.py:206-318 but shape-uniform across nodes."""
    alpha = s[: g.k_s_max]
    gamma = s[g.k_s_max:]
    coeffs = jnp.matmul(g.eigen_s[node_id], alpha,
                        precision=jax.lax.Precision.HIGHEST) + g.mean_s[node_id]
    coeffs = coeffs.reshape(g.n_basis_max, g.n_dim)
    n_can = g.n_canonical[node_id]
    if use_time:
        t_can = timewarp.canonical_time_function_masked(
            g.mean_t_d[node_id], g.eigen_t_d[node_id], gamma, n_can)
        t_fn, n_frames = timewarp.invert_time_function_dynamic(
            t_can, n_can, max_frames, speed)
    else:
        # linspace(0, F, F/speed) timeline, traced-n_can twin of
        # timewarp.linear_time_function (the i = frame-index shortcut
        # ignored `speed` and differed from primitive.back_project by up to
        # ~1 canonical frame near clip ends)
        n_can_f = n_can.astype(jnp.float32)
        num = jnp.maximum(jnp.floor(n_can_f * (1.0 / speed)), 2.0)
        i = jnp.arange(max_frames, dtype=jnp.float32)
        t_fn = jnp.minimum(i * (n_can_f / (num - 1.0)), n_can_f - 1.0)
        n_frames = jnp.minimum(num.astype(jnp.int32), max_frames)
    frames = bspline.evaluate(coeffs, g.knots_s[node_id], t_fn)
    return frames, n_frames, t_fn


def choose_transition(key: jax.Array, g: StackedGraph, node_id: jax.Array,
                      type_id: jax.Array):
    """Uniformly pick an outgoing edge of the given type
    (reference motion_state_graph_node.py:144-160).

    Returns (next_id, found).  When no edge matches, next_id == node_id and
    found is False.
    """
    row = g.transitions[type_id, node_id]  # [N] bool
    any_edge = jnp.any(row)
    logits = jnp.where(row, 0.0, -jnp.inf)
    choice = jax.random.categorical(key, logits)
    next_id = jnp.where(any_edge, choice, node_id)
    return next_id, any_edge


class WalkState(NamedTuple):
    buffer: jax.Array  # [MAX_T, D]
    n_valid: jax.Array  # int32
    node_id: jax.Array  # int32
    done: jax.Array  # bool
    key: jax.Array


@functools.partial(jax.jit, static_argnames=("n_steps", "max_step_frames",
                                             "max_total_frames", "window",
                                             "use_time"))
def random_walk(key: jax.Array, g: StackedGraph, start_id: jax.Array,
                n_steps: int, max_step_frames: int = 128,
                max_total_frames: Optional[int] = None, window: int = 20,
                use_time: bool = True):
    """Random graph walk: start node, (n_steps-2) standard transitions, one
    end transition; frames aligned + concatenated with seam smoothing.

    Returns (buffer [MAX_T, D], n_valid, node_ids [n_steps], latents
    [n_steps, L_max]).  node_ids[i] == -1 marks steps after the walk ended
    (no outgoing edge of the requested type).
    """
    if max_total_frames is None:
        max_total_frames = n_steps * max_step_frames
    d = g.n_dim
    std_t = TRANSITION_TYPE_IDS[NODE_TYPE_STANDARD]
    end_t = TRANSITION_TYPE_IDS[NODE_TYPE_END]

    init = WalkState(
        buffer=jnp.zeros((max_total_frames, d), jnp.float32),
        n_valid=jnp.asarray(0, jnp.int32),
        node_id=jnp.asarray(start_id, jnp.int32),
        done=jnp.asarray(False),
        key=key,
    )

    def step(state: WalkState, step_idx):
        k_sample, k_trans, k_next = jax.random.split(state.key, 3)
        s = sample_node_latent(k_sample, g, state.node_id)
        frames, n_frames, _ = back_project_node(g, state.node_id, s,
                                                max_step_frames, use_time)
        buffer, n_valid = align.append_frames(state.buffer, state.n_valid,
                                              frames, n_frames, window)
        # keep old buffer when the walk already ended
        buffer = jnp.where(state.done, state.buffer, buffer)
        n_valid = jnp.where(state.done, state.n_valid, n_valid)
        emitted_id = jnp.where(state.done, -1, state.node_id)

        # transition: standard until the second-to-last step, then end
        want_end = step_idx >= n_steps - 2
        type_id = jnp.where(want_end, end_t, std_t)
        next_id, found = choose_transition(k_trans, g, state.node_id, type_id)
        done = state.done | ~found
        new_state = WalkState(buffer, n_valid, next_id, done, k_next)
        return new_state, (emitted_id, s)

    final, (node_ids, latents) = jax.lax.scan(step, init, jnp.arange(n_steps))
    return final.buffer, final.n_valid, node_ids, latents


def random_walk_crowd(key: jax.Array, g: StackedGraph, start_id, n_chars: int,
                      n_steps: int, **kw):
    """vmapped crowd: one walk per character (BASELINE.md config 5 shape)."""
    keys = jax.random.split(key, n_chars)
    start_ids = jnp.broadcast_to(jnp.asarray(start_id, jnp.int32), (n_chars,))
    return jax.vmap(lambda k, s: random_walk(k, g, s, n_steps, **kw))(keys, start_ids)


# ---------------------------------------------------------------------------
# Segment-form walk (the fast path)
# ---------------------------------------------------------------------------

class SegWalkState(NamedTuple):
    node_id: jax.Array
    done: jax.Array
    key: jax.Array


@functools.partial(jax.jit, static_argnames=("n_steps", "max_step_frames",
                                             "window", "use_time"))
def random_walk_segments(key: jax.Array, g: StackedGraph, start_id: jax.Array,
                         n_steps: int, max_step_frames: int = 128,
                         window: int = 20, use_time: bool = True):
    """Random walk emitting per-step SEGMENTS instead of one concatenated
    buffer.

    The concatenating variant's vmapped `dynamic_update_slice` (per-character
    offsets) lowers to a scatter, which dominates the crowd benchmark by
    ~20x.  Here the scan writes each step's frames at a *uniform* index
    (scan ys), and the chained 2D alignment is factored into:
      1. a cheap scan over segment BOUNDARY frames computing each step's
         cumulative aligning transform + smoothing offset, then
      2. one batched application over all segments in parallel.
    This is exact except when a step is shorter than the smoothing window
    (the offset blend would then leak into the boundary frame; steps are
    typically 2-4x the window).

    Returns (frames [n_steps, max_step_frames, D], n_frames [n_steps],
    node_ids [n_steps], latents [n_steps, L]).
    """
    init = SegWalkState(node_id=jnp.asarray(start_id, jnp.int32),
                        done=jnp.asarray(False), key=key)
    std_t = TRANSITION_TYPE_IDS[NODE_TYPE_STANDARD]
    end_t = TRANSITION_TYPE_IDS[NODE_TYPE_END]

    def gen_step(state: SegWalkState, step_idx):
        k_sample, k_trans, k_next = jax.random.split(state.key, 3)
        s = sample_node_latent(k_sample, g, state.node_id)
        frames, n_frames, _ = back_project_node(g, state.node_id, s,
                                                max_step_frames, use_time)
        emitted_id = jnp.where(state.done, -1, state.node_id)
        n_frames = jnp.where(state.done, 0, n_frames)
        want_end = step_idx >= n_steps - 2
        type_id = jnp.where(want_end, end_t, std_t)
        next_id, found = choose_transition(k_trans, g, state.node_id, type_id)
        done = state.done | ~found
        return (SegWalkState(next_id, done, k_next),
                (frames, n_frames, emitted_id, s))

    _, (frames, n_frames, node_ids, latents) = jax.lax.scan(
        gen_step, init, jnp.arange(n_steps))

    # ---- chained alignment on boundary frames only -----------------------
    last_idx = jnp.maximum(n_frames - 1, 0)
    firsts = frames[:, 0]  # [S, D]
    lasts = frames[jnp.arange(n_steps), last_idx]  # [S, D]

    from ..ops import quat as quat_ops

    def align_scan(prev_last, inputs):
        first_raw, last_raw, is_first = inputs
        q_y, delta = align.node_aligning_2d_transform(prev_last, first_raw)
        q_y = jnp.where(is_first, jnp.array([1.0, 0, 0, 0]), q_y)
        delta = jnp.where(is_first, jnp.zeros(3), delta)
        new_last = align.transform_frames(last_raw[None], q_y, delta)[0]
        # the seam smoothing hemisphere-aligns the whole segment against the
        # anchor, which can flip quaternion signs clip-wide — apply the same
        # flip to the carried last frame so the next step's anchor matches
        # the SMOOTHED segment (what the concatenating walk chains on)
        new_last = quat_ops.frame_fix_signs(new_last[None], prev_last)[0]
        new_last = jnp.where(is_first, last_raw, new_last)
        return new_last, (q_y, delta, prev_last)

    is_first = jnp.arange(n_steps) == 0
    _, (q_ys, deltas, prev_lasts) = jax.lax.scan(align_scan, lasts[0],
                                                 (firsts, lasts, is_first))

    # ---- apply transforms + seam smoothing to all segments in parallel ---
    aligned = jax.vmap(align.transform_frames)(frames, q_ys, deltas)

    def smooth_seg(prev_last, seg, is_first_seg):
        sm = align.smooth_transition(prev_last, seg, window)
        return jnp.where(is_first_seg, seg, sm)

    aligned = jax.vmap(smooth_seg)(prev_lasts, aligned, is_first)
    return aligned, n_frames, node_ids, latents


def flatten_segments(frames: jax.Array, n_frames: jax.Array):
    """Host-side flatten of segment-form output to one [T, D] motion."""
    import numpy as np
    out = []
    for seg, n in zip(np.asarray(frames), np.asarray(n_frames)):
        out.append(seg[: int(n)])
    return np.concatenate(out, axis=0) if out else np.zeros((0, frames.shape[-1]))
