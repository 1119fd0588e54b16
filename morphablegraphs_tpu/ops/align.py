"""Frame alignment, concatenation and seam smoothing.

Re-implements the anim_utils motion_concatenation surface the reference leans
on (SURVEY.md §2.9): `get_node_aligning_2d_transform`,
`transform_quaternion_frames`, `smooth_quaternion_frames2` (reference
motion_generator/utils.py:101-148) and `align_and_concatenate_frames`
(used at graph_walk.py:355 and mg_state_queue.py:108-130).

Semantics (reverse-engineered from the reference's pfnn variant,
mg_state_planner.py:92-107, which spells the math out):
  1. heading(frame) = rotation of the root quaternion applied to ref [0,0,1],
     projected to the ground (XZ) plane; angle about +Y = atan2(x, z).
  2. aligning rotation q_y rotates the new clip's first-frame heading onto
     the previous clip's last-frame heading.
  3. translation delta makes the root XZ positions coincide at the seam
     (Y untouched).
  4. the transform applies to root translation + root quaternion only
     (children are in local coordinates).
  5. seam smoothing: offset blending — add (prev_last - new_first) to every
     dof, decayed linearly over `window` frames, with per-joint quaternion
     hemisphere alignment against the previous frame first.

All functions are jittable and vmap over a leading character axis.  Frame
buffers are fixed-size with valid-frame counts so concatenation works under
jit (SURVEY.md §7 "Hard parts": masks instead of dynamic shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import quat

REF_VECTOR = (0.0, 0.0, 1.0)  # reference motion_generator/utils.py:66


def heading_angle(root_q: jax.Array, ref_vector=REF_VECTOR) -> jax.Array:
    """Angle about +Y of the root's ground-plane heading (atan2(x, z))."""
    v = quat.rotate_vec(quat.normalize(root_q), jnp.asarray(ref_vector, root_q.dtype))
    return jnp.arctan2(v[..., 0], v[..., 2])


def node_aligning_2d_transform(prev_last: jax.Array, new_first: jax.Array,
                               ref_vector=REF_VECTOR):
    """2D transform (q_y, delta) aligning a new clip onto the previous one.

    prev_last/new_first: single quaternion frames [D].
    Returns (q_y [4] rotation about Y, delta [3] translation, XZ only).
    """
    a_prev = heading_angle(prev_last[3:7], ref_vector)
    a_new = heading_angle(new_first[3:7], ref_vector)
    theta = a_prev - a_new
    q_y = quat.about_y(theta)
    rotated_first = quat.rotate_vec(q_y, new_first[:3])
    delta = prev_last[:3] - rotated_first
    delta = delta * jnp.array([1.0, 0.0, 1.0], prev_last.dtype)  # Y untouched
    return q_y, delta


@jax.jit
def transform_from_start_pose(position: jax.Array, orientation_deg: jax.Array):
    """Transform placing a clip at an absolute start pose
    (anim_utils get_transform_from_start_pose semantics: position [3] with
    possible NaN/None components treated as 0, orientation = rotation about Y
    in degrees).  Returns (q_y, delta)."""
    pos = jnp.where(jnp.isnan(position), 0.0, position)
    theta = jnp.deg2rad(orientation_deg)
    return quat.about_y(theta), pos


@jax.jit
def transform_frames(frames: jax.Array, q_y: jax.Array, delta: jax.Array) -> jax.Array:
    """Apply (q_y, delta) to root channels of frames [..., T, D]
    (anim_utils transform_quaternion_frames)."""
    root_pos = quat.rotate_vec(q_y[..., None, :], frames[..., :3]) + delta[..., None, :]
    root_q = quat.multiply(q_y[..., None, :], frames[..., 3:7])
    return jnp.concatenate([root_pos, root_q, frames[..., 7:]], axis=-1)


def smoothing_factors(window: int, n_frames: int, dtype=jnp.float32) -> jax.Array:
    """Linear decay 1 - f/w for f <= w, else 0 (reference utils.py:88-99)."""
    f = jnp.arange(n_frames, dtype=dtype)
    w = jnp.asarray(float(window), dtype)
    return jnp.where(f <= w, 1.0 - f / w, 0.0)


def smooth_transition(prev_frame: jax.Array, frames: jax.Array, window: int,
                      include_root_xz: bool = True) -> jax.Array:
    """Offset-blend frames toward continuity with prev_frame
    (reference utils.py:101-148 smooth_quaternion_frames2).

    frames: [T, D]; prev_frame: [D].  Quaternions are hemisphere-aligned per
    joint against prev_frame before blending raw components.

    window <= 0 (spatial_smoothing disabled, reference smoothing_settings)
    is the identity: the clip is aligned but the seam is left as-is.
    """
    if window <= 0:
        return frames
    t, d = frames.shape
    # single-expression form of frame_fix_signs + offset blend: the
    # per-joint hemisphere flip becomes a +/-1 channel mask multiplied
    # into the same FMA that applies the decay, so XLA fuses the whole
    # smoothing into ~2 HBM passes over the clip instead of the 4-5 the
    # fix-then-concat-then-blend chain materialized (measured 23 ms of
    # the 76 ms per-iteration no-LM floor at crowd scale,
    # benchmarks/breakdown.py round-5 decomposition).  Values are
    # identical: sign(dot) multiplication == fix_signs' where-flip.
    quats = frames[:, 3:].reshape(t, -1, 4)
    ref = prev_frame[3:].reshape(-1, 4)
    dots = jnp.einsum("tjc,jc->tj", quats, ref,
                      precision=jax.lax.Precision.HIGHEST)  # [T, J]
    sign_q = jnp.where(dots < 0.0, -1.0, 1.0)
    sign = jnp.concatenate(
        [jnp.ones((t, 3), frames.dtype),
         jnp.broadcast_to(sign_q[:, :, None],
                          sign_q.shape + (4,)).reshape(t, d - 3)], axis=-1)
    factors = smoothing_factors(window, t, frames.dtype)  # [T]
    magnitude = prev_frame - frames[0] * sign[0]  # [D]
    dof_mask = jnp.ones((d,), frames.dtype)
    if not include_root_xz:
        dof_mask = dof_mask.at[0].set(0.0).at[2].set(0.0)
    return frames * sign + factors[:, None] * (magnitude * dof_mask)[None, :]


@functools.partial(jax.jit, static_argnames=("window", "ref_vector"))
def align_clip(prev_last: jax.Array, new_frames: jax.Array, window: int,
               ref_vector=REF_VECTOR) -> jax.Array:
    """Align + smooth a new clip against the last frame of the motion so far
    (= anim_utils align_and_concatenate_frames without the buffer append)."""
    q_y, delta = node_aligning_2d_transform(prev_last, new_frames[0], ref_vector)
    aligned = transform_frames(new_frames, q_y, delta)
    return smooth_transition(prev_last, aligned, window)


def blend_seam_np(prev_frames, new_frames, window: int):
    """Two-sided seam smoothing, host numpy (the reference's alternative
    spatial_smoothing_method="blending": anim_utils-style centered seam
    interpolation — frames within window/2 of the seam are replaced by a
    linear ramp between the two boundary frames, per-dof with quaternion
    hemisphere alignment; the default "smoothing" method is the one-sided
    offset decay in smooth_transition, reference utils.py:101-148).

    Mutates COPIES; returns (prev_frames_out, new_frames_out).  Runs on the
    host because the left side lives in the already-emitted numpy buffer.
    """
    import numpy as _np
    prev_frames = _np.asarray(prev_frames)
    new_frames = _np.asarray(new_frames)
    half = min(window // 2, len(prev_frames), len(new_frames))
    if half <= 0:
        return prev_frames, new_frames
    left = prev_frames[-half].copy()
    right = new_frames[half - 1].copy()
    # hemisphere-align the right boundary's quats against the left so the
    # component-wise ramp doesn't swing the long way round
    d = left.shape[-1]
    for q0 in range(3, d - 3, 4):
        if _np.dot(left[q0:q0 + 4], right[q0:q0 + 4]) < 0:
            right[q0:q0 + 4] = -right[q0:q0 + 4]
    n = 2 * half
    ts = (_np.arange(1, n + 1, dtype=left.dtype) / (n + 1))[:, None]
    ramp = left[None, :] * (1.0 - ts) + right[None, :] * ts
    prev_out = prev_frames.copy()
    new_out = new_frames.copy()
    prev_out[-half:] = ramp[:half]
    new_out[:half] = ramp[half:]
    return prev_out, new_out


def filter_root_np(frames, window: int):
    """Moving-average the root translation channels (reference
    smoothing_settings root_filter_window; anim_utils applies a box filter
    over the root position after concatenation).  Host numpy; window <= 1
    is the identity."""
    import numpy as _np
    frames = _np.asarray(frames)
    if window <= 1 or len(frames) < window:
        return frames
    out = frames.copy()
    kernel = _np.ones(window) / window
    pad = window // 2
    for c in range(3):
        col = _np.pad(frames[:, c], (pad, window - 1 - pad), mode="edge")
        out[:, c] = _np.convolve(col, kernel, mode="valid")
    return out


@functools.partial(jax.jit, static_argnames=("window",))
def append_frames(buffer: jax.Array, n_valid: jax.Array, new_frames: jax.Array,
                  n_new: jax.Array, window: int = 20):
    """Masked concatenation for jit: align new_frames to buffer[n_valid-1]
    and write them at offset n_valid.

    buffer: [MAX_T, D] with buffer[:n_valid] valid; new_frames: [S, D] with
    new_frames[:n_new] valid (S static).  The slice written past n_new is
    garbage but lies beyond the new n_valid and gets overwritten by later
    appends or masked by consumers.  When n_valid == 0 the clip is written
    unaligned (caller applies a start-pose transform first if desired).

    A clip whose full S-row slab would overrun the buffer is DROPPED
    (n_valid unchanged): dynamic_update_slice clamps out-of-range starts
    backward, which would silently overwrite valid earlier frames.

    Returns (buffer, new n_valid).
    """
    has_prev = n_valid > 0
    prev_last = buffer[jnp.maximum(n_valid - 1, 0)]
    aligned = jax.lax.cond(
        has_prev,
        lambda nf: align_clip(prev_last, nf, window),
        lambda nf: nf,
        new_frames,
    )
    fits = n_valid + new_frames.shape[0] <= buffer.shape[0]
    updated = jax.lax.dynamic_update_slice_in_dim(buffer, aligned, n_valid,
                                                  axis=0)
    buffer = jnp.where(fits, updated, buffer)
    return buffer, jnp.where(fits, n_valid + n_new, n_valid)
