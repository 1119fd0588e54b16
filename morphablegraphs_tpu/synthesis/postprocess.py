"""Post-processing: keyframe IK edits, look-at, grounding orchestration.

Replaces reference motion_generator.py:281-352 `_post_process_motion` (which
delegates to anim_utils MotionEditing.modify_motion_vector + grounding) and
graph_walk.py:220-340 `_create_ik_constraints`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from ..models.skeleton import Skeleton
from ..ops import ik as ik_ops
from . import grounding

# actions whose IK orientation constraints are ignored unless
# constrain_place_orientation is set (reference graph_walk.py:41
# DEFAULT_PLACE_ACTION_LIST)
PLACE_ACTION_LIST = ("placeRight", "placeLeft", "insertRight", "insertLeft",
                     "screwRight", "screwLeft")


@dataclasses.dataclass
class IKConstraint:
    """Positional end-effector constraint at an output frame (reference
    graph_walk._create_ik_constraints entry).

    pin_joints: joints to hold at their CURRENT positions during the solve
    (reference keepMirrorBoneStatic, constraint_builder.py:341-343: a
    dynamic constraint keeps the mirror joint where it was)."""

    frame_idx: int
    joint: str
    position: np.ndarray  # [3] (NaN components ignored)
    look_at: bool = False
    pin_joints: tuple = ()
    # local tool offset in the joint's frame: the target applies to the
    # tool tip pos + R_joint @ offset (reference tool offsets,
    # constraint_builder.py:242-280)
    offset: np.ndarray = None
    # target GLOBAL orientation quaternion [4] wxyz, or None — applied
    # after the positional solve when the ik settings' optimize_orientation
    # flag is on (reference IKConstraintsBuilder constrain_orientation,
    # motion_primitive_constraints.py:380-384)
    orientation: np.ndarray = None


def create_ik_constraints(graph, steps, constraint_specs,
                          constrain_place_orientation: bool = False
                          ) -> List[IKConstraint]:
    """From graph-walk steps' user keyframe constraints to per-frame IK
    constraints.  constraint_specs: {step_index: [(joint, position, canonical
    keyframe[, orientation_quat])]}; the output frame index interpolates the
    step's frame range by canonical position (time-warp-aware approximation
    of reference keyframe_constraint_base.py:77-81).

    Steps belonging to a place/insert/screw action (PLACE_ACTION_LIST) drop
    the orientation component unless constrain_place_orientation is set
    (reference graph_walk.py:104,:224 — the inverse_kinematics_settings
    "constrain_place_orientation" key)."""
    out = []
    for step_idx, specs in constraint_specs.items():
        step = steps[step_idx]
        keep_ori = (constrain_place_orientation
                    or getattr(step, "action_name", "")
                    not in PLACE_ACTION_LIST)
        prim = graph.nodes[step.node_key].primitive
        n_can = max(prim.n_canonical_frames - 1, 1)
        n_out = step.end_frame - step.start_frame
        for spec in specs:
            joint, position, keyframe = spec[:3]
            orientation = spec[3] if len(spec) > 3 and keep_ori else None
            frame_idx = step.start_frame + int(round(keyframe / n_can * n_out))
            out.append(IKConstraint(
                frame_idx=frame_idx, joint=joint,
                position=np.asarray(position, np.float64),
                orientation=None if orientation is None
                else np.asarray(orientation, np.float64)))
    return out


@dataclasses.dataclass
class IKTrajectoryConstraint:
    """IK trajectory constraint over an output frame range — the dict
    contract of reference graph_walk.py:277-297
    `_create_ik_trajectory_constraints_from_ca_trajectories` (trajectory +
    joint_name + start/end_frame + fixed_range + delta), produced when
    `collision_avoidance_constraints_mode == "ik"` and solved by the IK
    post-pass instead of inline residuals.

    spline: a built ops.spline_path.PathSpline.  fixed_range=False searches
    for a closer start: the target arcs begin at the closest point of the
    joint's position at start_frame (reference: "search for closer start").
    delta is the reference's target spacing along the trajectory; the
    batched solver emits one target PER FRAME, which is at least as dense
    for every real workload, so delta is kept for API parity only."""

    joint: str
    spline: object
    start_frame: int
    end_frame: int  # inclusive
    fixed_range: bool = False
    delta: float = 1.0
    unconstrained_dims: tuple = ()


def apply_ik_trajectory_constraints(skeleton: Skeleton, frames: np.ndarray,
                                    constraints: List[IKTrajectoryConstraint],
                                    n_iters: int = 10,
                                    blend_window: int = 10) -> np.ndarray:
    """Pull each constraint's joint onto its trajectory across the frame
    range (the anim_utils MotionEditing trajectory-following edit the
    reference delegates to, motion_generator.py:281-352).

    TPU-native shape: ONE vmapped DLS solve over the whole frame range
    (per-frame python IK loops are the reference's bottleneck), root held,
    per-frame targets from a single batched spline evaluation.  Edits decay
    to zero over `blend_window` frames at both range edges so the edit
    never pops against untouched frames."""
    import jax
    from ..models.skeleton import fk_positions
    from ..ops import spline_path

    frames = frames.copy()
    for c in constraints:
        if c.joint not in skeleton.node_names:
            continue
        s = int(np.clip(c.start_frame, 0, len(frames) - 1))
        e = int(np.clip(c.end_frame, 0, len(frames) - 1))
        if e <= s:
            continue
        n = e - s + 1
        node_idx = skeleton.index_of(c.joint)
        batch = jnp.asarray(frames[s:e + 1], jnp.float32)
        cur = np.asarray(jax.vmap(
            lambda f: fk_positions(skeleton, f))(batch))[:, node_idx]
        full_arc = float(c.spline.full_arc_length)
        if c.fixed_range:
            arc0 = 0.0
        else:
            _, a0, _ = spline_path.closest_point(
                c.spline, jnp.asarray(cur[0], jnp.float32))
            arc0 = float(a0)
        arcs = jnp.asarray(arc0 + (full_arc - arc0)
                           * np.linspace(0.0, 1.0, n, dtype=np.float32))
        pts = np.array(jax.vmap(
            lambda a: spline_path.point_and_dir_at_arc_length(
                c.spline, a)[0])(arcs))
        # unconstrained dims (e.g. height) follow the CURRENT joint path
        for d_ in c.unconstrained_dims:
            pts[:, d_] = cur[:, d_]

        nodes = np.zeros(ik_ops.MAX_IK_CONSTRAINTS, np.int32)
        mask = np.zeros(ik_ops.MAX_IK_CONSTRAINTS, np.float32)
        nodes[0] = node_idx
        mask[0] = 1.0
        joint_mask = np.ones(skeleton.n_animated, np.float32)
        joint_mask[0] = 0.0  # root is the walk's alignment anchor
        targets = np.zeros((n, ik_ops.MAX_IK_CONSTRAINTS, 3), np.float32)
        targets[:, 0, :] = pts
        # pad the batch to a multiple of 32: every distinct range length
        # would otherwise compile its own vmapped solve (ranges are
        # per-action and arbitrary)
        n_pad = ((n + 31) // 32) * 32
        batch_p = jnp.concatenate(
            [batch, jnp.broadcast_to(batch[-1],
                                     (n_pad - n,) + batch.shape[1:])])
        targets_p = np.concatenate(
            [targets, np.broadcast_to(targets[-1],
                                      (n_pad - n,) + targets.shape[1:])])
        edited = np.asarray(jax.vmap(
            lambda f, t: ik_ops.solve_ik(
                skeleton, f, jnp.asarray(nodes), t, jnp.asarray(mask),
                jnp.asarray(joint_mask), n_iters=n_iters))(
            batch_p, jnp.asarray(targets_p)))[:n]
        # ramp: 1 in the interior, linear decay to 0 at both range edges
        w = max(1, min(int(blend_window), n // 2))
        ramp = np.ones(n, np.float32)
        edge = np.linspace(0.0, 1.0, w + 1, dtype=np.float32)[1:]
        ramp[:w] = np.minimum(ramp[:w], edge)
        ramp[n - w:] = np.minimum(ramp[n - w:], edge[::-1])
        frames[s:e + 1] = (frames[s:e + 1]
                           + (edited - frames[s:e + 1]) * ramp[:, None])
    return frames


def _np_quat_multiply(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                     w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                     w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                     w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], a.dtype)


def _set_global_orientation(skeleton: Skeleton, frame: np.ndarray,
                            joint: str, target_q: np.ndarray) -> np.ndarray:
    """Rotate `joint`'s LOCAL quaternion channels so its global orientation
    equals target_q (wxyz): local' = conj(parent_global) * target.  The
    orientation half of the reference's IK constraint application
    (anim_utils MotionEditing orientation objective, gated by
    inverse_kinematics_settings["optimize_orientation"])."""
    if joint not in skeleton.node_names:
        return frame
    try:
        sl = skeleton.quat_slice(joint)
    except (KeyError, ValueError):
        return frame  # joint carries no animated quaternion channels
    from ..models.skeleton import fk_global
    _, ori = fk_global(skeleton, jnp.asarray(frame, jnp.float32))
    parent = skeleton.parents[skeleton.index_of(joint)]
    if parent < 0:
        parent_q = np.array([1.0, 0.0, 0.0, 0.0], np.float64)
    else:
        parent_q = np.asarray(ori[parent], np.float64)
        parent_q = parent_q / max(np.linalg.norm(parent_q), 1e-10)
    target = np.asarray(target_q, np.float64)
    target = target / max(np.linalg.norm(target), 1e-10)
    conj = parent_q * np.array([1.0, -1.0, -1.0, -1.0])
    local = _np_quat_multiply(conj, target)
    # keep hemisphere continuity with the previous local quaternion
    if np.dot(local, np.asarray(frame[sl], np.float64)) < 0:
        local = -local
    frame = frame.copy()
    frame[sl] = local
    return frame


def apply_ik_constraints(skeleton: Skeleton, frames: np.ndarray,
                         constraints: List[IKConstraint],
                         interpolation_window: int = 60,
                         n_iters: int = 10,
                         optimize_orientation: bool = True) -> np.ndarray:
    """Solve each IK constraint at its frame and blend the edit into the
    surrounding window (reference inverse_kinematics_settings:
    interpolation_window=120, transition_window=60).

    optimize_orientation gates the orientation half of constraints that
    carry one (reference inverse_kinematics_settings["optimize_orientation"],
    consumed by anim_utils MotionEditing)."""
    frames = frames.copy()
    for c in constraints:
        if c.joint not in skeleton.node_names:
            continue
        fi = int(np.clip(c.frame_idx, 0, len(frames) - 1))
        target = np.where(np.isnan(c.position), 0.0, c.position)
        mask_dims = ~np.isnan(c.position)
        from ..models.skeleton import fk_global
        from ..ops import quat as quat_ops
        pos_j, ori_j = fk_global(skeleton, jnp.asarray(frames[fi],
                                                       jnp.float32))
        cur = np.asarray(pos_j)
        node_idx = skeleton.index_of(c.joint)
        offset = (np.zeros(3, np.float32) if c.offset is None
                  else np.asarray(c.offset, np.float32))
        # fill unconstrained dims with the current TIP position (joint
        # origin when there is no tool offset)
        cur_tip = cur[node_idx] + np.asarray(quat_ops.rotate_vec(
            quat_ops.normalize(ori_j[node_idx]), jnp.asarray(offset)))
        target = np.where(mask_dims, target, cur_tip)

        nodes = np.zeros(ik_ops.MAX_IK_CONSTRAINTS, np.int32)
        targets = np.zeros((ik_ops.MAX_IK_CONSTRAINTS, 3), np.float32)
        mask = np.zeros(ik_ops.MAX_IK_CONSTRAINTS, np.float32)
        offsets = np.zeros((ik_ops.MAX_IK_CONSTRAINTS, 3), np.float32)
        nodes[0] = node_idx
        targets[0] = target
        mask[0] = 1.0
        offsets[0] = offset
        slot = 1
        for pin in c.pin_joints:
            if pin not in skeleton.node_names or slot >= len(nodes):
                continue
            pin_idx = skeleton.index_of(pin)
            nodes[slot] = pin_idx
            targets[slot] = cur[pin_idx]  # hold at the current position
            mask[slot] = 1.0
            slot += 1
        # allow all joints except the root to move
        joint_mask = np.ones(skeleton.n_animated, np.float32)
        joint_mask[0] = 0.0
        edited = np.asarray(ik_ops.solve_ik(
            skeleton, jnp.asarray(frames[fi], jnp.float32),
            jnp.asarray(nodes), jnp.asarray(targets), jnp.asarray(mask),
            jnp.asarray(joint_mask), n_iters=n_iters,
            target_offsets=jnp.asarray(offsets)))
        if optimize_orientation and c.orientation is not None:
            edited = _set_global_orientation(skeleton, edited, c.joint,
                                             c.orientation)
        delta = edited - frames[fi]
        w = interpolation_window // 2
        for off in range(-w, w + 1):
            k = fi + off
            if 0 <= k < len(frames):
                factor = 1.0 - abs(off) / (w + 1)
                frames[k] = frames[k] + delta * factor
    return frames


def post_process_motion(skeleton: Skeleton, frames: np.ndarray, steps,
                        ik_constraints: Optional[List[IKConstraint]] = None,
                        config: Optional[dict] = None,
                        scene=None,
                        ik_trajectories: Optional[
                            List[IKTrajectoryConstraint]] = None
                        ) -> np.ndarray:
    """Full post-processing chain (reference motion_generator.py:281-352):
    keyframe IK edits -> trajectory IK edits (CA "ik" mode) -> grounding."""
    config = config or {}
    ik_settings = config.get("inverse_kinematics_settings", {})
    # the reference budget is scipy-minimize iterations over all dofs; DLS
    # converges ~100x faster per iteration, so scale it (default 1000 ->
    # 10 DLS iterations) — shared by the keyframe and trajectory passes
    budget = int(np.clip(
        round(int(ik_settings.get("max_iterations", 1000)) / 100), 1, 25))
    if ik_constraints and config.get("activate_inverse_kinematics", True):
        # max_iterations bounds the DLS solve; activate_blending=False
        # applies the edit only at the constrained frame (reference
        # inverse_kinematics_settings, motion_generator.py:298-320)
        interp = (int(ik_settings.get("interpolation_window", 120))
                  if ik_settings.get("activate_blending", True) else 0)
        frames = apply_ik_constraints(
            skeleton, frames, ik_constraints,
            interpolation_window=interp, n_iters=budget,
            optimize_orientation=bool(
                ik_settings.get("optimize_orientation", True)))
    if ik_trajectories and config.get("activate_inverse_kinematics", True):
        frames = apply_ik_trajectory_constraints(
            skeleton, frames, ik_trajectories, n_iters=budget,
            blend_window=int(ik_settings.get("transition_window", 60)) // 6)
    if config.get("activate_motion_grounding", False):
        frames = grounding.ground_motion(
            skeleton, frames, steps, scene,
            settings=config.get("motion_grounding_settings"))
    return frames
