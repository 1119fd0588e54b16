"""Hand pose overlay: event-driven status machine for grasp poses.

Replaces reference motion_generator/hand_pose_generator.py:33-188: hand
states (standard / pick / place per hand) are switched by keyframe events
(attach/detach/transfer); the active pose's hand-joint quaternions overwrite
each frame, with slerp smoothing over a window (default 30) at transitions.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from ..models.skeleton import Skeleton
from ..ops import quat

RIGHT_HAND_JOINTS_PREFIX = "Right"
LEFT_HAND_JOINTS_PREFIX = "Left"
DEFAULT_SMOOTHING_WINDOW = 30  # reference :158


@dataclasses.dataclass
class HandPose:
    """One static hand pose: {joint_name: quaternion [4]}."""

    name: str
    joint_quats: Dict[str, np.ndarray]


class HandPoseGenerator:
    """reference hand_pose_generator.py:39-188."""

    def __init__(self, skeleton: Skeleton,
                 smoothing_window: int = DEFAULT_SMOOTHING_WINDOW):
        self.skeleton = skeleton
        self.pose_map: Dict[str, HandPose] = {}
        self.status = {"Right": "standard", "Left": "standard"}
        self.smoothing_window = smoothing_window
        self.status_change_map: Dict[str, str] = {}

    def init_from_desc(self, desc: dict):
        """Load hand poses from the zip's hand_pose_info structure.

        Accepts both the reference zip schema (reference
        hand_pose_generator.py:49-67: per-hand flattened quaternion vectors
        plus `{left,right}_hand_skeleton.joint_names` + status_change_map)
        and the flat joint->quat map form."""
        self.status_change_map = dict(desc.get("status_change_map", {}))
        left = desc.get("left_hand_skeleton", {}).get("joint_names", [])
        right = desc.get("right_hand_skeleton", {}).get("joint_names", [])
        for name, pose in desc.get("poses", {}).items():
            if (isinstance(pose, dict)
                    and ("LeftHand" in pose or "RightHand" in pose)
                    and (left or right)):
                joint_quats = {}
                for side, joints in (("LeftHand", left), ("RightHand", right)):
                    vec = np.asarray(pose.get(side, ()), np.float32).reshape(-1, 4)
                    for j, q in zip(joints, vec):
                        joint_quats[j] = q
                self.pose_map[name] = HandPose(name=name, joint_quats=joint_quats)
            else:
                self.pose_map[name] = HandPose(
                    name=name,
                    joint_quats={j: np.asarray(q, np.float32)
                                 for j, q in pose.items()})

    def add_pose(self, name: str, joint_quats: Dict[str, np.ndarray]):
        self.pose_map[name] = HandPose(name, {j: np.asarray(q, np.float32)
                                              for j, q in joint_quats.items()})

    def _status_for_event(self, event: str, current: str) -> str:
        """attach -> pick pose, detach -> standard (transfer is handled by
        the caller as a two-hand status SWAP, reference :132-137); an
        explicit status_change_map from the zip takes precedence."""
        if event in self.status_change_map:
            return self.status_change_map[event]
        if event == "attach":
            return "pick"
        if event == "detach":
            return "standard"
        return current

    def set_pose_in_frame(self, frame: np.ndarray, pose_name: str,
                          hand: str) -> np.ndarray:
        """Overwrite the hand-joint quaternions of one frame (:147-158)."""
        pose = self.pose_map.get(f"{hand}_{pose_name}") or self.pose_map.get(pose_name)
        if pose is None:
            return frame
        out = frame.copy()
        for joint, q in pose.joint_quats.items():
            if joint in self.skeleton.animated_joints and joint.startswith(hand):
                out[self.skeleton.quat_slice(joint)] = q
        return out

    def generate_hand_poses(self, frames: np.ndarray,
                            events: List[dict],
                            carry_status: bool = False) -> np.ndarray:
        """Walk the event list, overwrite hand joints per frame, smooth
        transitions (:114-188).

        events: [{keyframe, event, parameters: {joint: RightHand|LeftHand}}].
        carry_status=True starts from the statuses the previous call ended
        with (streaming chunks: a grasp from chunk 1 persists into chunk 2
        until a detach); the default resets both hands to 'standard' per
        call, matching the reference.
        """
        frames = np.asarray(frames, np.float32).copy()
        switch_frames = []
        status = (dict(self.status) if carry_status
                  else {"Right": "standard", "Left": "standard"})
        changes = sorted(events, key=lambda e: e.get("keyframe", 0))
        ci = 0
        for i in range(len(frames)):
            while ci < len(changes) and changes[ci].get("keyframe", 0) <= i:
                e = changes[ci]
                if e.get("event", "") == "transfer":
                    # transfer SWAPS the two hands' statuses (reference
                    # generate_hand_poses :132-137) — both get a switch frame
                    status["Right"], status["Left"] = (status["Left"],
                                                       status["Right"])
                    switch_frames.append((i, "Right"))
                    switch_frames.append((i, "Left"))
                    ci += 1
                    continue
                joint = e.get("parameters", {}).get("joint", "")
                hand = "Right" if joint.startswith("Right") else "Left"
                new_status = self._status_for_event(e.get("event", ""), status[hand])
                if new_status != status[hand]:
                    status[hand] = new_status
                    switch_frames.append((i, hand))
                ci += 1
            for hand, st in status.items():
                if st != "standard":
                    frames[i] = self.set_pose_in_frame(frames[i], st, hand)
        for sf, hand in switch_frames:
            frames = self.smooth_state_transition(frames, sf, hand=hand)
        self.status = status
        return frames

    def smooth_state_transition(self, frames: np.ndarray, at_frame: int,
                                window: Optional[int] = None,
                                hand: Optional[str] = None) -> np.ndarray:
        """Slerp-blend the switching hand's joint quats across the
        transition (:158-188).  Only the joints the hand pose overwrites are
        blended — the rest of the body keeps its real motion."""
        window = window or self.smoothing_window
        n = len(frames)
        lo = max(at_frame - window // 2, 0)
        hi = min(at_frame + window // 2, n - 1)
        if hi <= lo:
            return frames
        # Blend ONLY the joints a hand pose actually overwrites (the union of
        # joint_quats keys across loaded poses for this hand) — a bare
        # prefix filter would also match LeftUpLeg/LeftShoulder/... and wipe
        # real limb motion around every status change (the reference smooths
        # only the hand-skeleton indices, hand_pose_generator.py:158-188).
        pose_joints = set()
        for pose in self.pose_map.values():
            pose_joints.update(pose.joint_quats.keys())
        joints = [j for j in self.skeleton.animated_joints
                  if j in pose_joints
                  and (hand is None or j.startswith(hand))]
        if not joints:
            return frames
        slots = [self.skeleton.quat_slice(j) for j in joints]
        q_lo = np.stack([frames[lo, s] for s in slots])
        q_hi = np.stack([frames[hi, s] for s in slots])
        for i in range(lo, hi + 1):
            t = (i - lo) / (hi - lo)
            blended = np.asarray(quat.slerp(jnp.asarray(q_lo), jnp.asarray(q_hi),
                                            jnp.asarray(t, jnp.float32)))
            for s, q in zip(slots, blended):
                frames[i, s] = q
        return frames
