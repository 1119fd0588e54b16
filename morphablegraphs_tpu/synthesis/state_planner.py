"""Interactive/streaming planner: direction- and target-driven locomotion.

Replaces the core of reference motion_generator/mg_state_planner.py:191-1189
(used by the external mg_server / Unity bridge): an action-sequence consumer
that walks the node-type FSM (idle -> start -> standard -> end -> idle),
generates constrained steps toward control points or a steering direction,
and feeds aligned states into the MGStateQueue.  Upper-body gesture overlay
(:817) splices upper-body joint quaternions from a second primitive.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..constraints import compiled
from ..models import primitive as prim_mod
from ..models.graph import (MotionStateGraph, NODE_TYPE_END, NODE_TYPE_IDLE,
                            NODE_TYPE_START, NODE_TYPE_STANDARD)
from ..utils.config import default_config
from . import generator
from .state_queue import MGStateQueue

UPPER_BODY_JOINTS = ("Spine", "Spine1", "Spine2", "Neck", "Head",
                     "LeftShoulder", "LeftArm", "LeftForeArm", "LeftHand",
                     "RightShoulder", "RightArm", "RightForeArm", "RightHand")


@dataclasses.dataclass
class MGStatePlanningSettings:
    """Tunable subset of the reference's ~45 settings
    (mg_state_planner.py:191-235)."""

    blend_window: int = 20
    buffer_size: int = 10
    step_target_threshold: float = 10.0  # target switching distance
    overstepping_range: float = 5.0
    direction_constraint_weight: float = 0.8
    position_constraint_weight: float = 1.0
    n_samples: int = 30
    use_optimization: bool = False
    max_steps_per_target: int = 50
    activate_upper_body_overlay: bool = False
    collision_check_step: float = 10.0  # sampling step along the checked ray
    # PFNN locomotion (reference mg_state_planner.py:219-224)
    min_pfnn_target_distance: float = 8.0
    min_pfnn_primitive_steps: int = 100
    split_pfnn_primitives: bool = True
    pfnn_n_target_averaging: int = 1
    max_pfnn_frames: int = 2000  # hard bound (the reference loops unbounded)
    # cubic control-point upsampling factor before PFNN locomotion; 0 = off,
    # the reference uses 0.1 (mg_state_planner.py:874 stretch_points)
    pfnn_stretch_scale: float = 0.0


def stretch_points(points, scale: float) -> np.ndarray:
    """Cubic resampling of a control-point sequence at parameter step
    `scale` (reference mg_state_planner.py:78-90 stretch_points, built on
    anim_utils CubicMotionSpline.fit_frames): interpolating cubic spline over
    times 0..n-1 evaluated at arange(0, n-1, scale)."""
    from scipy.interpolate import CubicSpline
    points = np.asarray(points, np.float64)
    times = np.arange(len(points))
    spline = CubicSpline(times, points, axis=0)
    return spline(np.arange(0.0, float(len(points) - 1), scale))


class MGStatePlanner:
    """reference mg_state_planner.py:237-1189 core loop (functional subset)."""

    def __init__(self, graph: MotionStateGraph,
                 settings: Optional[MGStatePlanningSettings] = None,
                 config: Optional[dict] = None, seed: int = 0,
                 collision_boundary=None, pfnn_wrapper=None):
        self.graph = graph
        # optional PFNN controller with reset(pos, phase, dir) and
        # get_next_frame(target_dir) -> quaternion frame; the reference takes
        # it from outside too (mg_state_planner.py:238, pfnn_wrapper param)
        self.pfnn_wrapper = pfnn_wrapper
        self.use_pfnn = False  # reference :268 default
        # optional callable (x, z) -> bool blocked (reference checks an
        # external collision-avoidance service / scene boundary,
        # mg_state_planner.py:672-704 collision_boundary.check_trajectory)
        self.collision_boundary = collision_boundary
        self.settings = settings or MGStatePlanningSettings()
        # copy before overriding: mutating a shared config dict would
        # clobber other components' sample counts
        self.config = dict(config or default_config())
        self.config["n_random_samples"] = self.settings.n_samples
        frame_time = graph.skeleton.frame_time if graph.skeleton else 1.0 / 30
        self.state_queue = MGStateQueue(graph.skeleton, frame_time,
                                        self.settings.blend_window,
                                        self.settings.buffer_size)
        self.key = jax.random.PRNGKey(seed)
        self.stop_thread = False
        self._thread: Optional[threading.Thread] = None

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # -- node type FSM (reference get_next_node_type :537-560) ----------
    def get_next_node_type(self, current_type: str, reached_target: bool) -> str:
        if current_type == NODE_TYPE_IDLE:
            return NODE_TYPE_START
        if current_type == NODE_TYPE_START:
            return NODE_TYPE_END if reached_target else NODE_TYPE_STANDARD
        if current_type == NODE_TYPE_STANDARD:
            return NODE_TYPE_END if reached_target else NODE_TYPE_STANDARD
        if current_type == NODE_TYPE_END:
            return NODE_TYPE_IDLE
        return NODE_TYPE_START

    def _pick_node(self, prev_key, node_type: str, action: str):
        if prev_key is None:
            group = self.graph.node_groups[action]
            candidates = ([s for s in group.idle_states] or
                          [s for s in group.start_states] or
                          [k[1] for k in group.node_keys])
            return (action, candidates[0])
        edges = self.graph.nodes[prev_key].edges_of_type(node_type)
        if not edges:
            for t in (NODE_TYPE_STANDARD, NODE_TYPE_END, NODE_TYPE_IDLE):
                edges = self.graph.nodes[prev_key].edges_of_type(t)
                if edges:
                    break
        return edges[0] if edges else None

    # -- step generation (reference generate_locomotion_step :772) ------
    def generate_step(self, node_key, pose_buffer, target_pos=None,
                      target_dir=None):
        """One constrained step toward a position and/or heading; returns
        the aligned MotionState appended to the queue."""
        skel = self.graph.skeleton
        prim = self.graph.nodes[node_key].primitive
        sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
        slot = 0
        if target_pos is not None:
            pos = np.asarray(target_pos, np.float64)
            pos_c = np.array([pos[0], np.nan, pos[2]])
            sc = compiled.set_keyframe_constraint(
                sc, slot, skel, skel.animated_joints[0],
                prim.n_canonical_frames - 1, position=pos_c,
                weight=self.settings.position_constraint_weight)
            slot += 1
        if target_dir is not None:
            sc = compiled.set_direction_constraint(
                sc, np.asarray(target_dir, np.float32),
                prim.n_canonical_frames - 1,
                weight=self.settings.direction_constraint_weight)
        if pose_buffer:
            sc = compiled.set_alignment_from_prev(sc, np.asarray(pose_buffer[-1]))
        else:
            sc = compiled.set_alignment_from_start_pose(sc, np.zeros(3), 0.0)

        if target_pos is None and target_dir is None:
            s = prim_mod.sample_latent(self._next_key(), prim, 1)[0]
        else:
            s, _ = generator.generate_constrained_sample(
                self._next_key(), skel, prim, sc, self.config,
                cluster_tree=self.graph.nodes[node_key].cluster_tree)

        frames, n, _ = prim_mod.back_project(
            prim, s, max_frames=_pad(prim.n_canonical_frames), use_time=False)
        frames = np.asarray(frames)[: int(n)]
        node_type = self.graph.nodes[node_key].node_type
        return self.state_queue.add_state(node_key, node_type, frames, pose_buffer)

    # -- locomotion loops ----------------------------------------------
    def generate_locomotion_from_pfnn(self, pose_buffer, control_points):
        """Frame-by-frame PFNN locomotion toward the control points."""
        scale = float(getattr(self.settings, "pfnn_stretch_scale", 0.0))
        if scale > 0.0:
            control_points = stretch_points(control_points, scale)
        return self._generate_locomotion_from_pfnn(pose_buffer, control_points)

    def _generate_locomotion_from_pfnn(self, pose_buffer, control_points):
        """Frame-by-frame PFNN locomotion toward the control points
        (reference generate_locomotion_from_pfnn :855-930): reset the
        controller at the current position, pull frames until the final
        target is within min_pfnn_target_distance, and split the stream into
        state-queue entries every min_pfnn_primitive_steps frames."""
        control_points = np.asarray(control_points, np.float64)
        cur = (np.asarray(pose_buffer[-1][:3], np.float64) if pose_buffer
               else np.zeros(3))
        self.pfnn_wrapper.reset(cur, 0, np.array([0.0, 0.0, 1.0]))
        new_frames = []
        target_idx = 0
        success = False
        for _ in range(self.settings.max_pfnn_frames):
            if self.stop_thread:
                break
            # average the next k control points for a smoother target
            # (reference :846-853 pfnn_n_target_averaging)
            k = max(1, min(self.settings.pfnn_n_target_averaging,
                           len(control_points) - target_idx))
            target = control_points[target_idx: target_idx + k].mean(axis=0)
            to_target = target - cur
            to_target[1] = 0.0
            distance = float(np.linalg.norm(to_target))
            if distance < self.settings.min_pfnn_target_distance:
                if target_idx >= len(control_points) - 1:
                    success = True
                    break
                target_idx += 1
                continue
            frame = np.asarray(
                self.pfnn_wrapper.get_next_frame(to_target / distance))
            new_frames.append(frame)
            cur = frame[:3].astype(np.float64)
            if (self.settings.split_pfnn_primitives and
                    len(new_frames) >= self.settings.min_pfnn_primitive_steps):
                entry = self.state_queue.add_state(
                    ("pfnn", "locomotion"), NODE_TYPE_STANDARD,
                    np.stack(new_frames), pose_buffer)
                pose_buffer = entry.pose_buffer
                new_frames = []
        if new_frames:
            entry = self.state_queue.add_state(
                ("pfnn", "locomotion"), NODE_TYPE_STANDARD,
                np.stack(new_frames), pose_buffer)
            pose_buffer = entry.pose_buffer
        return pose_buffer, success

    def generate_locomotion(self, action: str, control_points: np.ndarray,
                            pose_buffer=None):
        """Walk through control points until the last is reached (reference
        generate_locomotion_from_motion_primitives :562-770: target switching
        by distance threshold)."""
        if self.use_pfnn and self.pfnn_wrapper is not None:
            # reference :363-365 routes locomotion through the PFNN wrapper
            pose_buffer, _ = self.generate_locomotion_from_pfnn(
                pose_buffer, control_points)
            return pose_buffer
        control_points = np.asarray(control_points, np.float32)
        node_key = None
        node_type = NODE_TYPE_IDLE
        target_idx = 0
        steps = 0
        while (target_idx < len(control_points) and not self.stop_thread
               and steps < self.settings.max_steps_per_target * len(control_points)):
            target = control_points[target_idx]
            cur = (np.asarray(pose_buffer[-1][:3]) if pose_buffer
                   else np.zeros(3))
            to_target = target - cur
            to_target[1] = 0.0
            dist = float(np.linalg.norm(to_target))
            if dist < self.settings.step_target_threshold:
                target_idx += 1
                continue
            if self.collision_boundary is not None and self._path_blocked(cur, target):
                # skip targets behind obstacles (reference skips/aborts the
                # trajectory segment on a boundary hit)
                target_idx += 1
                continue
            last = target_idx == len(control_points) - 1
            reached_soon = last and dist < self.settings.step_target_threshold * 2
            node_type = self.get_next_node_type(node_type, reached_soon)
            node_key = self._pick_node(node_key, node_type, action)
            if node_key is None:
                break
            direction = to_target / max(dist, 1e-6)
            entry = self.generate_step(node_key, pose_buffer,
                                       target_pos=target if last else None,
                                       target_dir=[direction[0], direction[2]])
            pose_buffer = entry.pose_buffer
            node_type = self.graph.nodes[node_key].node_type
            steps += 1
        return pose_buffer

    def generate_motion_states_from_action_sequence(self, actions: List[dict],
                                                    pose_buffer=None):
        """reference :316-350: [{action, controlPoints|direction, nSteps}]."""
        for a in actions:
            if self.stop_thread:
                break
            if "controlPoints" in a:
                pose_buffer = self.generate_locomotion(
                    a["action"], np.asarray(a["controlPoints"], np.float32),
                    pose_buffer)
            else:
                n_steps = int(a.get("nSteps", 1))
                direction = a.get("direction")
                node_key = None
                node_type = NODE_TYPE_IDLE
                for _ in range(n_steps):
                    node_type = self.get_next_node_type(node_type, False)
                    node_key = self._pick_node(node_key, node_type, a["action"])
                    if node_key is None:
                        break
                    entry = self.generate_step(node_key, pose_buffer,
                                               target_dir=direction)
                    pose_buffer = entry.pose_buffer
                    node_type = self.graph.nodes[node_key].node_type
        return pose_buffer

    def start(self, actions: List[dict]):
        """Run the planner on a worker thread feeding the state queue
        (reference worker-thread structure, :307-350)."""
        self.stop_thread = False
        self._thread = threading.Thread(
            target=self.generate_motion_states_from_action_sequence,
            args=(actions,), daemon=True)
        self._thread.start()
        return self._thread

    def stop(self):
        self.stop_thread = True
        if self._thread is not None:
            self._thread.join(timeout=10)

    def _path_blocked(self, cur, target) -> bool:
        """Sample the straight line to the target against the collision
        boundary (reference check_trajectory semantics)."""
        cur = np.asarray(cur, np.float64)
        target = np.asarray(target, np.float64)
        d = float(np.linalg.norm((target - cur) * np.array([1, 0, 1])))
        n = max(int(d / max(self.settings.collision_check_step, 1e-3)), 1)
        for i in range(1, n + 1):
            p = cur + (target - cur) * (i / n)
            if self.collision_boundary(float(p[0]), float(p[2])):
                return True
        return False

    # -- upper body overlay (reference :817-930) ------------------------
    def overlay_upper_body(self, base_frames: np.ndarray,
                           gesture_frames: np.ndarray) -> np.ndarray:
        """Splice upper-body joint quaternions from a gesture clip onto the
        locomotion frames (lengths matched by linear resampling)."""
        skel = self.graph.skeleton
        base = np.asarray(base_frames, np.float32).copy()
        gesture = np.asarray(gesture_frames, np.float32)
        idx = np.linspace(0, len(gesture) - 1, len(base)).round().astype(int)
        resampled = gesture[idx]
        for joint in UPPER_BODY_JOINTS:
            if joint in skel.animated_joints:
                sl = skel.quat_slice(joint)
                base[:, sl] = resampled[:, sl]
        return base


def _pad(n: int, multiple: int = 32) -> int:
    return ((n + multiple - 1) // multiple) * multiple
