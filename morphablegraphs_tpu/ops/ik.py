"""Inverse kinematics kernels: damped least-squares, CCD, look-at.

Replaces the anim_utils `MotionEditing` surface the reference depends on
(SURVEY.md §2.9: L-BFGS-B IK `modify_motion_vector`, CCD `run_ccd`,
`edit_motion_to_look_at_target`) with jittable fixed-iteration solvers:

  * `solve_ik` — Gauss-Newton / damped least squares over per-joint rotation
    deltas (exponential map), exact jacobians via `jax.jacfwd`; vmappable
    over frames so a whole motion's keyframe constraints solve in one batch;
  * `ccd_step`/`run_ccd` — cyclic coordinate descent along a static chain;
  * `look_at` — single-joint orientation edit pointing a local axis at a
    world target.

Constraint layout is padded/masked (MAX_IK_CONSTRAINTS slots) so the solver
has a static shape regardless of how many constraints a frame carries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.skeleton import Skeleton, fk_global
from . import quat

MAX_IK_CONSTRAINTS = 4


def _apply_deltas(skel: Skeleton, frame: jax.Array, deltas: jax.Array,
                  joint_mask: jax.Array) -> jax.Array:
    """frame' with q_j <- exp(delta_j) * q_j for unmasked joints.

    deltas: [J, 3] rotation vectors; joint_mask: [J] 0/1.
    """
    j = skel.n_animated
    quats = frame[3:].reshape(j, 4)
    # smooth quaternion exp: dq = [cos|h|, h * sinc(|h|)] with h = delta/2.
    # sinc keeps the jacobian finite at delta = 0 (norm() is not
    # differentiable there, which poisons jacfwd with NaNs).
    half = deltas * 0.5
    angle_sq = jnp.sum(half * half, axis=-1, keepdims=True)
    angle = jnp.sqrt(angle_sq + 1e-16)
    dq = jnp.concatenate([jnp.cos(angle), half * jnp.sinc(angle / jnp.pi)], axis=-1)
    new_quats = quat.multiply(dq, quats)
    new_quats = jnp.where(joint_mask[:, None] > 0, new_quats, quats)
    return jnp.concatenate([frame[:3], new_quats.reshape(-1)])


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("n_iters",))
def solve_ik(skel: Skeleton, frame: jax.Array,
             target_nodes: jax.Array, target_positions: jax.Array,
             constraint_mask: jax.Array, joint_mask: jax.Array = None,
             n_iters: int = 10, damping: float = 0.5,
             prior_weight: float = 0.3, target_offsets: jax.Array = None):
    """Damped least-squares IK on one frame.

    target_nodes: [C] skeleton node indices; target_positions: [C, 3];
    constraint_mask: [C] 0/1; joint_mask: [J] which joints may move
    (default: all except none); target_offsets: optional [C, 3] LOCAL
    offsets in each constrained node's frame — the constraint then targets
    the offset point `pos + R_node @ offset` (a tool tip) instead of the
    joint origin (reference tool offsets, constraint_builder.py:242-280).
    Returns the edited frame.
    """
    j = skel.n_animated
    if joint_mask is None:
        joint_mask = jnp.ones(j)
    if target_offsets is None:
        target_offsets = jnp.zeros_like(target_positions)

    def residuals(deltas):
        f = _apply_deltas(skel, frame, deltas.reshape(j, 3), joint_mask)
        pos, ori = fk_global(skel, f)
        tip = pos[target_nodes] + quat.rotate_vec(
            quat.normalize(ori[target_nodes]), target_offsets)
        diff = (tip - target_positions) * constraint_mask[:, None]
        return diff.reshape(-1)

    def body(deltas, _):
        r = residuals(deltas)
        jac = jax.jacfwd(residuals)(deltas)  # [3C, 3J]
        a = jnp.matmul(jac.T, jac, precision=jax.lax.Precision.HIGHEST)
        a = a + (damping + prior_weight) * jnp.eye(a.shape[0])
        # minimum-norm prior: the objective includes prior_weight*|deltas|^2,
        # so joints in the jacobian's null space (unable to affect any
        # constraint) decay geometrically back to zero instead of keeping
        # the nonzero init as a permanent ~2 degree distortion.
        g = jnp.matmul(jac.T, r, precision=jax.lax.Precision.HIGHEST) \
            + prior_weight * deltas
        deltas = deltas - jnp.linalg.solve(a, g)
        return deltas, jnp.sum(r * r)

    # small nonzero start: at singular configurations (e.g. fully extended
    # legs asked to move along the limb axis) the jacobian at exactly zero
    # deltas has no component toward the target and Gauss-Newton stalls.
    deltas0 = jnp.full(j * 3, 0.02)
    deltas, errs = jax.lax.scan(body, deltas0, None, length=n_iters)
    return _apply_deltas(skel, frame, deltas.reshape(j, 3), joint_mask)


def _rotate_joint_toward(skel: Skeleton, frame: jax.Array, ori: jax.Array,
                         joint_idx: int, node_idx: int,
                         v_from: jax.Array, v_to: jax.Array) -> jax.Array:
    """Pre-multiply animated joint `joint_idx`'s local quaternion with the
    world rotation aligning v_from onto v_to, converted into the joint's
    parent frame: q_local' = q_p^-1 q_world q_p q_local.  Shared core of
    CCD and look-at edits."""
    v1 = v_from / jnp.maximum(jnp.linalg.norm(v_from), 1e-10)
    v2 = v_to / jnp.maximum(jnp.linalg.norm(v_to), 1e-10)
    axis = jnp.cross(v1, v2)
    s = jnp.linalg.norm(axis)
    c = jnp.dot(v1, v2)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s, 1e-10)
    half = angle * 0.5
    q_world = jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])
    parent_node = skel.parents[node_idx]
    if parent_node >= 0:
        p_ori = ori[parent_node]
    else:
        p_ori = jnp.array([1.0, 0, 0, 0])
    q_rel = quat.multiply(quat.conjugate(p_ori),
                          quat.multiply(q_world, p_ori))
    sl = 3 + 4 * joint_idx
    q_old = jax.lax.dynamic_slice(frame, (sl,), (4,))
    q_new = quat.normalize(quat.multiply(q_rel, q_old))
    return jax.lax.dynamic_update_slice(frame, q_new, (sl,))


@functools.partial(jax.jit, static_argnums=(0, 1, 2),
                   static_argnames=("n_iters",))
def run_ccd(skel: Skeleton, chain: tuple, effector_node: int,
            frame: jax.Array, target: jax.Array, n_iters: int = 5):
    """Cyclic coordinate descent: chain is a static tuple of animated-joint
    indices ordered child -> root (anim_utils run_ccd semantics)."""

    def one_pass(frame, _):
        for joint_idx in chain:
            pos, ori = fk_global(skel, frame)
            node_idx = skel.index_of(skel.animated_joints[joint_idx])
            pivot = pos[node_idx]
            frame = _rotate_joint_toward(skel, frame, ori, joint_idx,
                                         node_idx, pos[effector_node] - pivot,
                                         target - pivot)
        return frame, None

    frame, _ = jax.lax.scan(one_pass, frame, None, length=n_iters)
    return frame


@functools.partial(jax.jit, static_argnums=(0, 1))
def look_at(skel: Skeleton, head_joint_idx: int, frame: jax.Array,
            target: jax.Array, local_dir=(0.0, 0.0, 1.0)):
    """Rotate the head joint so its local `local_dir` points at the world
    target (anim_utils edit_motion_to_look_at_target core edit)."""
    pos, ori = fk_global(skel, frame)
    node_idx = skel.index_of(skel.animated_joints[head_joint_idx])
    cur_dir = quat.rotate_vec(ori[node_idx], jnp.asarray(local_dir))
    return _rotate_joint_toward(skel, frame, ori, head_joint_idx, node_idx,
                                cur_dir, target - pos[node_idx])


@jax.jit
def apply_joint_limits(frames: jax.Array, axes: jax.Array, mins: jax.Array,
                       maxs: jax.Array, mask: jax.Array) -> jax.Array:
    """Clamp each constrained joint's TWIST about its limit axis, per frame.

    The reference runs `MotionEditing.apply_joint_constraints(new_frames,
    look_start, look_end)` after its look-at/spine IK edits
    (mg_state_planner.py:814) with per-joint limit specs from
    `skeleton.skeleton_model["joint_constraints"]` or the anim_utils
    JOINT_CONSTRAINTS default (:262-266).  TPU-native form: the limit table
    is four arrays over the animated joints and the clamp is one closed-form
    swing-twist pass over ALL frames x joints at once (no per-joint Python).

    frames: [..., 3 + 4J]; axes: [J, 3] unit limit axes in each joint's
    local frame; mins/maxs: [J] twist bounds in radians; mask: [J] 1 where
    the joint is constrained.  Swing (rotation perpendicular to the axis)
    is preserved exactly; only the twist angle is clipped:

        q = swing x twist,  twist = [cos(t/2), sin(t/2) a],
        t = 2 atan2(<q_xyz, a>, q_w)  (q canonicalized to q_w >= 0 first,
        so t is the wrapped representative in (-pi, pi])
    """
    lead = frames.shape[:-1]
    j = axes.shape[0]
    quats = frames[..., 3:].reshape(*lead, j, 4)
    # double cover: q and -q are one rotation; pick w >= 0 so the twist
    # angle branch is stable
    q = jnp.where(quats[..., :1] < 0, -quats, quats)
    p = jnp.sum(q[..., 1:] * axes, axis=-1)  # [..., J] signed projection
    theta = 2.0 * jnp.arctan2(p, q[..., 0])
    half = theta * 0.5
    twist = jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axes], axis=-1)
    swing = quat.multiply(q, quat.conjugate(twist))
    theta_c = jnp.clip(theta, mins, maxs)
    half_c = theta_c * 0.5
    twist_c = jnp.concatenate(
        [jnp.cos(half_c)[..., None], jnp.sin(half_c)[..., None] * axes],
        axis=-1)
    clamped = quat.multiply(swing, twist_c)
    # untouched joints (and in-range twists) keep their exact input values
    active = (mask > 0) & (theta_c != theta)
    out = jnp.where(active[..., None], clamped, quats)
    return jnp.concatenate([frames[..., :3], out.reshape(*lead, 4 * j)],
                           axis=-1)
