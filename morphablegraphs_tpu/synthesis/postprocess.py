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


def create_ik_constraints(graph, steps, constraint_specs) -> List[IKConstraint]:
    """From graph-walk steps' user keyframe constraints to per-frame IK
    constraints.  constraint_specs: {step_index: [(joint, position, canonical
    keyframe)]}; the output frame index interpolates the step's frame range
    by canonical position (time-warp-aware approximation of reference
    keyframe_constraint_base.py:77-81)."""
    out = []
    for step_idx, specs in constraint_specs.items():
        step = steps[step_idx]
        prim = graph.nodes[step.node_key].primitive
        n_can = max(prim.n_canonical_frames - 1, 1)
        n_out = step.end_frame - step.start_frame
        for joint, position, keyframe in specs:
            frame_idx = step.start_frame + int(round(keyframe / n_can * n_out))
            out.append(IKConstraint(frame_idx=frame_idx, joint=joint,
                                    position=np.asarray(position, np.float64)))
    return out


def apply_ik_constraints(skeleton: Skeleton, frames: np.ndarray,
                         constraints: List[IKConstraint],
                         interpolation_window: int = 60,
                         n_iters: int = 10) -> np.ndarray:
    """Solve each IK constraint at its frame and blend the edit into the
    surrounding window (reference inverse_kinematics_settings:
    interpolation_window=120, transition_window=60)."""
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
                        scene=None) -> np.ndarray:
    """Full post-processing chain (reference motion_generator.py:281-352):
    IK edits -> motion grounding."""
    config = config or {}
    ik_settings = config.get("inverse_kinematics_settings", {})
    if ik_constraints and config.get("activate_inverse_kinematics", True):
        # max_iterations bounds the DLS solve; activate_blending=False
        # applies the edit only at the constrained frame (reference
        # inverse_kinematics_settings, motion_generator.py:298-320)
        interp = (int(ik_settings.get("interpolation_window", 120))
                  if ik_settings.get("activate_blending", True) else 0)
        # the reference budget is scipy-minimize iterations over all dofs;
        # DLS converges ~100x faster per iteration, so scale the budget
        # (default 1000 -> 10 DLS iterations, preserving prior behavior)
        budget = int(np.clip(
            round(int(ik_settings.get("max_iterations", 1000)) / 100),
            1, 25))
        frames = apply_ik_constraints(
            skeleton, frames, ik_constraints,
            interpolation_window=interp, n_iters=budget)
    if config.get("activate_motion_grounding", False):
        frames = grounding.ground_motion(skeleton, frames, steps, scene)
    return frames
