"""Pose feature analysis for semantic annotation.

Replaces reference motion_analysis/ (bvh_analyzer.py:33-643 BVHAnalyzer's
per-frame FK + boolean/scalar pose predicates, motion_plane.py:27-99
Plane/plane_fitting).  Feature curves are computed for ALL frames in one
batched FK pass instead of the reference's per-frame loops.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp

from ..models.skeleton import Skeleton, fk_global


class Plane:
    """Best-fit plane through points (reference motion_plane.py:27-99)."""

    def __init__(self, normal: np.ndarray, point: np.ndarray):
        self.normal = np.asarray(normal, np.float64)
        self.normal /= max(np.linalg.norm(self.normal), 1e-12)
        self.point = np.asarray(point, np.float64)

    @classmethod
    def fit(cls, points: np.ndarray) -> "Plane":
        points = np.asarray(points, np.float64)
        centroid = points.mean(axis=0)
        _, _, vt = np.linalg.svd(points - centroid)
        return cls(vt[-1], centroid)

    def distance(self, p: np.ndarray) -> float:
        return float(np.dot(np.asarray(p) - self.point, self.normal))


class BVHAnalyzer:
    """Batched pose-feature predicates (reference bvh_analyzer.py:33-643).

    A representative subset of the reference's ~40 predicates; each returns
    a per-frame bool/scalar array computed from one FK pass.
    """

    def __init__(self, skeleton: Skeleton, frames: np.ndarray):
        self.skeleton = skeleton
        self.frames = np.asarray(frames, np.float32)
        pos, ori = fk_global(skeleton, jnp.asarray(self.frames))
        self.positions = np.asarray(pos)  # [T, nodes, 3]
        self.orientations = np.asarray(ori)

    def _p(self, joint: str) -> np.ndarray:
        return self.positions[:, self.skeleton.index_of(joint)]

    def has_joint(self, *names) -> bool:
        return all(n in self.skeleton.node_names for n in names)

    # -- scalar features ------------------------------------------------
    def joint_height(self, joint: str) -> np.ndarray:
        return self._p(joint)[:, 1]

    def joint_speed(self, joint: str) -> np.ndarray:
        p = self._p(joint)
        v = np.linalg.norm(np.diff(p, axis=0), axis=1)
        return np.concatenate([v, v[-1:]])

    def joint_distance(self, a: str, b: str) -> np.ndarray:
        return np.linalg.norm(self._p(a) - self._p(b), axis=1)

    def knee_angle(self, side: str = "Right") -> np.ndarray:
        """Angle at the knee (reference knee-angle predicate)."""
        hip = self._p(f"{side}UpLeg")
        knee = self._p(f"{side}Leg")
        foot = self._p(f"{side}Foot")
        v1 = hip - knee
        v2 = foot - knee
        cos = np.sum(v1 * v2, axis=1) / np.maximum(
            np.linalg.norm(v1, axis=1) * np.linalg.norm(v2, axis=1), 1e-10)
        return np.degrees(np.arccos(np.clip(cos, -1, 1)))

    # -- boolean predicates --------------------------------------------
    def hand_in_front_of_root(self, side: str = "Right") -> np.ndarray:
        """Hand forward of the hips in the character's local frame
        (reference hand-forward predicate)."""
        from ..ops import quat as quat_ops
        root_q = self.frames[:, 3:7]
        fwd = np.asarray(quat_ops.rotate_vec(
            jnp.asarray(root_q), jnp.asarray([0.0, 0.0, 1.0])))
        hand = f"{side}Hand"
        if not self.has_joint(hand):
            return np.zeros(len(self.frames), bool)
        rel = self._p(hand) - self._p(self.skeleton.node_names[0])
        return np.sum(rel * fwd, axis=1) > 0

    def foot_behind_other_leg(self, side: str = "Right") -> np.ndarray:
        other = "Left" if side == "Right" else "Right"
        if not self.has_joint(f"{side}Foot", f"{other}Foot"):
            return np.zeros(len(self.frames), bool)
        from ..ops import quat as quat_ops
        fwd = np.asarray(quat_ops.rotate_vec(
            jnp.asarray(self.frames[:, 3:7]), jnp.asarray([0.0, 0.0, 1.0])))
        rel = self._p(f"{side}Foot") - self._p(f"{other}Foot")
        return np.sum(rel * fwd, axis=1) < 0

    def spine_horizontal(self, threshold_deg: float = 45.0) -> np.ndarray:
        """Spine tilted toward horizontal (bending over)."""
        if not self.has_joint("Spine", "Head"):
            return np.zeros(len(self.frames), bool)
        up = self._p("Head") - self._p("Spine")
        up = up / np.maximum(np.linalg.norm(up, axis=1, keepdims=True), 1e-10)
        angle = np.degrees(np.arccos(np.clip(up[:, 1], -1, 1)))
        return angle > threshold_deg

    def feature_vector(self) -> Dict[str, np.ndarray]:
        """All applicable features as named curves (the reference's feature
        table for semantic annotation)."""
        out = {}
        root = self.skeleton.node_names[0]
        out["root_height"] = self.joint_height(root)
        out["root_speed"] = self.joint_speed(root)
        for side in ("Left", "Right"):
            if self.has_joint(f"{side}Foot"):
                out[f"{side}_foot_height"] = self.joint_height(f"{side}Foot")
                out[f"{side}_foot_speed"] = self.joint_speed(f"{side}Foot")
            if self.has_joint(f"{side}UpLeg", f"{side}Leg", f"{side}Foot"):
                out[f"{side}_knee_angle"] = self.knee_angle(side)
            if self.has_joint(f"{side}Hand"):
                out[f"{side}_hand_front"] = self.hand_in_front_of_root(side)
        if self.has_joint("Spine", "Head"):
            out["spine_horizontal"] = self.spine_horizontal()
        return out
