"""Batched quaternion kernels.

Convention: quaternions are [w, x, y, z] (scalar first), matching the
`transformations` package the reference delegates to (see reference
construction/utils.py:150-158 `rotate_frames`).  All ops broadcast over
arbitrary leading batch axes; the quaternion axis is the last one.

These replace the per-frame Python loops of the reference's anim_utils layer
(SURVEY.md §2.9) with vectorized XLA primitives so a whole crowd of characters
can be rotated/blended in one fused VPU pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def normalize(q: jax.Array) -> jax.Array:
    """Unit-normalize, guarding against zero norm."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b (w-first)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def rotate_vec(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate 3-vector(s) v by quaternion(s) q.

    Uses the 2-cross-product form: v' = v + 2*qw*(u x v) + 2*u x (u x v).
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion -> 3x3 rotation matrix (batched; normalizes input)."""
    q = normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def from_matrix(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> quaternion (w-first), batched, branch-free.

    Uses the four-candidate construction (one per largest diagonal choice)
    combined with `where` so it is jit/vmap safe.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Candidate 0: trace-dominant.
    s0 = jnp.sqrt(jnp.maximum(tr + 1.0, _EPS)) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    # Candidate 1: m00 dominant.
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    # Candidate 2: m11 dominant.
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    # Candidate 3: m22 dominant.
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond_tr = (tr > 0.0)[..., None]
    cond_0 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond_1 = (m11 >= m22)[..., None]
    q = jnp.where(cond_tr, q0, jnp.where(cond_0, q1, jnp.where(cond_1, q2, q3)))
    return normalize(q)


def slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical linear interpolation with shortest-path sign fix.

    Falls back to nlerp when the quaternions are nearly parallel (sin ~ 0),
    keeping the whole op branch-free for jit.
    """
    q0 = normalize(q0)
    q1 = normalize(q1)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0.0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t, dtype=q0.dtype)
    if t.ndim == q0.ndim - 1:  # per-quaternion scalar weights -> broadcast over components
        t = t[..., None]
    near = sin_theta < 1e-5
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, _EPS))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, _EPS))
    return normalize(w0 * q0 + w1 * q1)


def from_axis_angle(axis: jax.Array, angle) -> jax.Array:
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    angle = jnp.asarray(angle)
    half = angle[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def about_y(angle) -> jax.Array:
    """Rotation about +Y (the ground-plane heading rotation used everywhere
    in 2D alignment, reference anim_utils get_node_aligning_2d_transform)."""
    angle = jnp.asarray(angle)
    half = angle * 0.5
    zeros = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zeros, jnp.sin(half), zeros], axis=-1)


def from_euler(angles_deg: jax.Array, order: str = "rxyz") -> jax.Array:
    """Euler angles in DEGREES -> quaternion.

    `order` 'rxyz' means rotating-frame x, then y, then z — the composition
    q = qx * qy * qz, which is what BVH 'Xrotation Yrotation Zrotation'
    channel triplets denote.  Supports any permutation 'r[xyz][xyz][xyz]'.
    """
    assert order.startswith("r") and len(order) == 4
    rad = jnp.deg2rad(angles_deg)
    axes = {"x": jnp.array([1.0, 0.0, 0.0]),
            "y": jnp.array([0.0, 1.0, 0.0]),
            "z": jnp.array([0.0, 0.0, 1.0])}
    q = None
    for i, ax in enumerate(order[1:]):
        qi = from_axis_angle(axes[ax].astype(rad.dtype), rad[..., i])
        q = qi if q is None else multiply(q, qi)
    return q


def to_euler(q: jax.Array, order: str = "rxyz") -> jax.Array:
    """Quaternion -> Euler angles in DEGREES for rotating-frame orders.

    Only the orders used by BVH export are implemented ('rxyz' and 'rzxy'
    etc. can be added on demand); implemented generically via the rotation
    matrix factorization for order 'rxyz'.
    """
    m = to_matrix(q)
    if order == "rxyz":
        # R = Rx(a) Ry(b) Rz(c)
        b = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
        a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
        c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
        out = jnp.stack([a, b, c], axis=-1)
    elif order == "rzyx":
        # R = Rz(a) Ry(b) Rx(c)
        b = jnp.arcsin(jnp.clip(-m[..., 2, 0], -1.0, 1.0))
        a = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
        c = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
        out = jnp.stack([a, b, c], axis=-1)
    elif order == "rzxy":
        # R = Rz(a) Rx(b) Ry(c)
        b = jnp.arcsin(jnp.clip(m[..., 2, 1], -1.0, 1.0))
        a = jnp.arctan2(-m[..., 0, 1], m[..., 1, 1])
        c = jnp.arctan2(-m[..., 2, 0], m[..., 2, 2])
        out = jnp.stack([a, b, c], axis=-1)
    elif order == "ryxz":
        # R = Ry(a) Rx(b) Rz(c)
        b = jnp.arcsin(jnp.clip(-m[..., 1, 2], -1.0, 1.0))
        a = jnp.arctan2(m[..., 0, 2], m[..., 2, 2])
        c = jnp.arctan2(m[..., 1, 0], m[..., 1, 1])
        out = jnp.stack([a, b, c], axis=-1)
    else:
        raise NotImplementedError(f"euler order {order}")
    return jnp.rad2deg(out)


def fix_signs(quats: jax.Array, ref: jax.Array) -> jax.Array:
    """Flip quaternion signs so dot(ref, q) >= 0 (hemisphere alignment for
    blending; reference construction/utils.py:162-184 align_quaternion_frames)."""
    d = jnp.sum(quats * ref, axis=-1, keepdims=True)
    return jnp.where(d < 0.0, -quats, quats)


def fix_signs_sequential(quats: jax.Array) -> jax.Array:
    """Hemisphere-align a time sequence of quaternions [T, ..., 4] so each
    frame's quats stay on the same hemisphere as the previous frame's.

    Sign flips compose multiplicatively down the sequence, so the scan state
    is the running sign; expressed as an associative cumulative product of
    per-step flip signs for O(log T) depth.
    """
    d = jnp.sum(quats[1:] * quats[:-1], axis=-1)  # [T-1, ...]
    step_sign = jnp.where(d < 0.0, -1.0, 1.0).astype(quats.dtype)
    run = jnp.cumprod(step_sign, axis=0)
    # explicit length-1 ones: ones_like(run[:1]) is EMPTY for T == 1 and
    # would collapse single-frame inputs to zero frames
    run = jnp.concatenate([jnp.ones((1,) + run.shape[1:], run.dtype), run],
                          axis=0)
    return quats * run[..., None]


def frame_fix_signs(frames: jax.Array, ref_frame: jax.Array) -> jax.Array:
    """Hemisphere-align a quaternion frame matrix [..., 3+4J] against a
    reference frame (same layout: root translation + J joint quaternions)."""
    trans = frames[..., :3]
    quats = frames[..., 3:]
    shape = quats.shape[:-1] + (-1, 4)
    quats = quats.reshape(shape)
    ref = ref_frame[..., 3:].reshape(ref_frame.shape[:-1] + (-1, 4))
    quats = fix_signs(quats, ref)
    return jnp.concatenate([trans, quats.reshape(frames.shape[:-1] + (-1,))], axis=-1)


def add_frames(a: jax.Array, b: jax.Array) -> jax.Array:
    """c = a + b in quaternion-frame space: translations add, joint
    quaternions compose (reference motion_generator/utils.py:36-47)."""
    trans = a[..., :3] + b[..., :3]
    qa = a[..., 3:].reshape(a.shape[:-1] + (-1, 4))
    qb = b[..., 3:].reshape(b.shape[:-1] + (-1, 4))
    q = normalize(multiply(qa, qb))
    return jnp.concatenate([trans, q.reshape(a.shape[:-1] + (-1,))], axis=-1)


def subtract_frames(a: jax.Array, b: jax.Array) -> jax.Array:
    """c = a - b: translation difference + relative quaternions b^-1 * a
    (reference motion_generator/utils.py:49-62)."""
    trans = a[..., :3] - b[..., :3]
    qa = a[..., 3:].reshape(a.shape[:-1] + (-1, 4))
    qb = b[..., 3:].reshape(b.shape[:-1] + (-1, 4))
    q = normalize(multiply(conjugate(qb), qa))
    return jnp.concatenate([trans, q.reshape(a.shape[:-1] + (-1,))], axis=-1)
