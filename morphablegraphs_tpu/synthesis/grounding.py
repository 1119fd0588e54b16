"""Foot grounding: stance-foot contact enforcement per walk primitive.

Replaces reference motion_generator/motion_primitive_grounding.py (the
MP_CONFIGURATIONS step model, ankle-from-toe constraints, first/last-frame
grounding with blend windows, `move_to_ground`, `align_xz_to_origin`) and the
anim_utils MotionGrounding/FootplantConstraintGenerator surface used by
motion_generator.py:281-352.

IK solves are the batched damped-LS kernel from ops.ik, vmapped over the
frames inside each grounding window.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.skeleton import Skeleton, fk_positions
from ..ops import align as align_ops
from ..ops import ik as ik_ops

LEFT_FOOT = "LeftFoot"
RIGHT_FOOT = "RightFoot"
LEFT_TOE = "LeftToeBase"
RIGHT_TOE = "RightToeBase"

# Stance/swing model per walk primitive
# (reference motion_primitive_grounding.py:43-120)
MP_CONFIGURATIONS: Dict[str, dict] = {
    "leftStance": {"start_stance_foot": "right", "stance_foot": "right",
                   "swing_foot": "left", "end_stance_foot": "left",
                   "stance_mode": "toe", "start_window_size": 10,
                   "end_window_size": 10},
    "rightStance": {"start_stance_foot": "left", "stance_foot": "left",
                    "swing_foot": "right", "end_stance_foot": "right",
                    "stance_mode": "toe", "start_window_size": 10,
                    "end_window_size": 10},
    "beginLeftStance": {"start_stance_foot": "both", "stance_foot": "right",
                        "swing_foot": "left", "end_stance_foot": "left",
                        "stance_mode": "toe", "start_window_size": 10,
                        "end_window_size": 10},
    "beginRightStance": {"start_stance_foot": "both", "stance_foot": "left",
                         "swing_foot": "right", "end_stance_foot": "right",
                         "stance_mode": "toe", "start_window_size": 10,
                         "end_window_size": 10},
    "endRightStance": {"start_stance_foot": "left", "stance_foot": "left",
                       "swing_foot": "right", "end_stance_foot": "both",
                       "stance_mode": "none", "start_window_size": 10,
                       "end_window_size": 10},
    "endLeftStance": {"start_stance_foot": "right", "stance_foot": "right",
                      "swing_foot": "left", "end_stance_foot": "both",
                      "stance_mode": "none", "start_window_size": 10,
                      "end_window_size": 10},
    "turnLeftRightStance": {"start_stance_foot": "both", "stance_foot": "left",
                            "swing_foot": "right", "end_stance_foot": "right",
                            "stance_mode": "none", "start_window_size": 20,
                            "end_window_size": 20},
    "turnRightLeftStance": {"start_stance_foot": "both", "stance_foot": "right",
                            "swing_foot": "left", "end_stance_foot": "left",
                            "stance_mode": "none", "start_window_size": 20,
                            "end_window_size": 20},
}


def _foot_nodes(skeleton: Skeleton, side: str) -> List[str]:
    names = {"left": [LEFT_FOOT], "right": [RIGHT_FOOT],
             "both": [LEFT_FOOT, RIGHT_FOOT]}[side]
    return [n for n in names if n in skeleton.node_names]


class SceneInterface:
    """Height query adapter (reference motion_generator/scene_interface.py)."""

    def __init__(self, height_fn: Optional[Callable] = None,
                 constant_height: float = 0.0):
        self.height_fn = height_fn
        self.constant_height = constant_height
        self.offset = [0.0, 0.0]

    def set_scene(self, scene) -> None:
        """Install a height source: anything with .get_height(x, z) or a
        plain callable (reference scene_interface.py set_scene)."""
        self.height_fn = getattr(scene, "get_height", scene)

    def set_offset(self, x: float, z: float) -> None:
        self.offset = [float(x), float(z)]

    def get_height(self, x: float, z: float) -> float:
        x += self.offset[0]
        z += self.offset[1]
        if self.height_fn is not None:
            return float(self.height_fn(x, z))
        return self.constant_height


def move_to_ground(skeleton: Skeleton, frames: np.ndarray,
                   scene: Optional[SceneInterface] = None,
                   source_frame: int = 0) -> np.ndarray:
    """Shift the whole motion vertically so the lowest foot node touches the
    ground at the source frame (reference motion_primitive_grounding
    move_to_ground)."""
    scene = scene or SceneInterface()
    feet = _foot_nodes(skeleton, "both")
    if not feet:
        return frames
    pos = np.asarray(fk_positions(skeleton,
                                  jnp.asarray(frames[source_frame], jnp.float32)))
    low = min(pos[skeleton.index_of(f)][1] for f in feet)
    root = frames[source_frame][:3]
    target = scene.get_height(float(root[0]), float(root[2]))
    out = frames.copy()
    out[:, 1] += target - low
    return out


def align_xz_to_origin(frames: np.ndarray) -> np.ndarray:
    """Translate so the first frame's root is at the XZ origin (reference
    motion_primitive_grounding align_xz_to_origin)."""
    out = frames.copy()
    out[:, 0] -= out[0, 0]
    out[:, 2] -= out[0, 2]
    return out


def _ground_window(skeleton: Skeleton, frames: np.ndarray, frame_indices,
                   feet: List[str], ground_height: float,
                   blend_window: int) -> np.ndarray:
    """Solve foot-on-ground IK at anchor frames and blend the edit into the
    neighbouring window (reference ground_first_frame/ground_initial_stance
    semantics, motion_primitive_grounding.py:221-340)."""
    if not feet or len(frame_indices) == 0:
        return frames
    frames = frames.copy()
    node_idx = [skeleton.index_of(f) for f in feet]
    j = skeleton.n_animated
    # legs-only joint mask: allow joints on the path root->feet (minus root)
    leg_joints = set()
    for f in feet:
        i = skeleton.index_of(f)
        while i >= 0:
            name = skeleton.node_names[i]
            if name in skeleton.animated_joints and name != skeleton.animated_joints[0]:
                leg_joints.add(skeleton.animated_index_of(name))
            i = skeleton.parents[i]
    joint_mask = np.zeros(j, np.float32)
    for a in leg_joints:
        joint_mask[a] = 1.0

    for fi in frame_indices:
        frame = jnp.asarray(frames[fi], jnp.float32)
        pos = np.asarray(fk_positions(skeleton, frame))
        targets = np.zeros((ik_ops.MAX_IK_CONSTRAINTS, 3), np.float32)
        nodes = np.zeros(ik_ops.MAX_IK_CONSTRAINTS, np.int32)
        mask = np.zeros(ik_ops.MAX_IK_CONSTRAINTS, np.float32)
        for c, ni in enumerate(node_idx[: ik_ops.MAX_IK_CONSTRAINTS]):
            t = pos[ni].copy()
            t[1] = ground_height
            targets[c] = t
            nodes[c] = ni
            mask[c] = 1.0
        edited = np.asarray(ik_ops.solve_ik(
            skeleton, frame, jnp.asarray(nodes), jnp.asarray(targets),
            jnp.asarray(mask), jnp.asarray(joint_mask), n_iters=8))
        delta = edited - frames[fi]
        # blend the edit over the window around the anchor
        for w in range(-blend_window, blend_window + 1):
            k = fi + w
            if 0 <= k < len(frames):
                factor = 1.0 - abs(w) / (blend_window + 1)
                frames[k] = frames[k] + delta * factor
    return frames


def _leg_joint_mask(skeleton: Skeleton, feet: List[str]) -> np.ndarray:
    """0/1 mask over animated joints on the root->feet chains (minus root)."""
    j = skeleton.n_animated
    mask = np.zeros(j, np.float32)
    for f in feet:
        i = skeleton.index_of(f)
        while i >= 0:
            name = skeleton.node_names[i]
            if (name in skeleton.animated_joints
                    and name != skeleton.animated_joints[0]):
                mask[skeleton.animated_index_of(name)] = 1.0
            i = skeleton.parents[i]
    return mask


def ground_stance_swing(skeleton: Skeleton, frames: np.ndarray, cfg: dict,
                        start_frame: int, end_frame: int,
                        ground_height: float) -> np.ndarray:
    """Per-frame stance-foot pinning + swing-foot ground clamp over a step
    (reference ground_initial_stance_foot,
    motion_primitive_grounding.py:290-344: the stance foot is held at its
    first-frame position for every frame of the step — the foot-skate
    removal the anchors alone don't provide — and the swing foot is clamped
    when it would penetrate the ground).

    One vmapped DLS-IK launch over the step's frames instead of the
    reference's per-frame analytical-IK Python loop."""
    if cfg.get("stance_mode", "none") == "none":
        return frames
    stance = _foot_nodes(skeleton, cfg["stance_foot"])
    swing = _foot_nodes(skeleton, cfg["swing_foot"])
    if not stance or not swing:
        return frames
    end_frame = min(end_frame, len(frames) - 1)
    if end_frame <= start_frame:
        return frames
    frames = frames.copy()
    seg = jnp.asarray(frames[start_frame: end_frame + 1], jnp.float32)
    pos = np.asarray(fk_positions(skeleton, seg))  # [T, nodes, 3]
    t = len(pos)
    n_c = ik_ops.MAX_IK_CONSTRAINTS
    targets = np.zeros((t, n_c, 3), np.float32)
    nodes = np.zeros((t, n_c), np.int32)
    mask = np.zeros((t, n_c), np.float32)
    si = skeleton.index_of(stance[0])
    pin = pos[0, si].copy()
    pin[1] = ground_height
    targets[:, 0] = pin
    nodes[:, 0] = si
    mask[:, 0] = 1.0
    wi = skeleton.index_of(swing[0])
    cur = pos[:, wi].copy()
    below = cur[:, 1] < ground_height
    cur[:, 1] = np.maximum(cur[:, 1], ground_height)
    targets[:, 1] = cur
    nodes[:, 1] = wi
    mask[:, 1] = below.astype(np.float32)
    joint_mask = _leg_joint_mask(skeleton, [stance[0], swing[0]])
    if not joint_mask.any():
        return frames
    edited = np.asarray(jax.vmap(
        lambda f, nd, tg, mk: ik_ops.solve_ik(
            skeleton, f, nd, tg, mk, jnp.asarray(joint_mask), n_iters=8))(
        seg, jnp.asarray(nodes), jnp.asarray(targets), jnp.asarray(mask)))
    frames[start_frame: end_frame + 1] = edited
    return frames


# ---------------------------------------------------------------------------
# Footplant constraint generation (reference FootplantConstraintGenerator —
# the anim_utils surface consumed by motion_generator.py:321-340
# run_motion_grounding; settings schema = algorithm config
# motion_grounding_settings, algorithm_configuration.py:225-236).  The
# anim_utils implementation is an external sibling repo; these functions
# consume every settings key with the semantics its name/defaults imply and
# are validated by behavior tests (tests/test_postprocess.py).
# ---------------------------------------------------------------------------

# Single source of truth is the algorithm-config schema; direct callers of
# detect_ground_contacts / generate_foot_plant_constraints that pass no
# settings get exactly the defaults post_process_motion would pass them
# (damp_* keys are superseded — DLS damping is fixed per kernel, see
# utils/config.py INERT_KEYS).
from ..utils.config import DEFAULT_ALGORITHM_CONFIG as _DAC

DEFAULT_GROUNDING_SETTINGS = {
    k: v for k, v in _DAC["motion_grounding_settings"].items()
    if not k.startswith("damp_")}


def detect_ground_contacts(skeleton: Skeleton, frames: np.ndarray,
                           settings: Optional[dict] = None,
                           scene: Optional[SceneInterface] = None,
                           positions: Optional[np.ndarray] = None
                           ) -> Dict[str, np.ndarray]:
    """Per-frame ground-contact booleans per foot from ONE batched FK pass.

    A frame is a strict contact when the foot is within `contact_tolerance`
    of the scene height at its own XZ; strict contacts are extended through
    frames within `foot_lift_tolerance` of the ground that lie within
    `foot_lift_search_window` frames of a strict contact (hysteresis: the
    foot is not "lifted" until it clears the lift tolerance), then the
    bitvector is majority-vote smoothed over
    `smoothing_constraints_window` frames."""
    s = dict(DEFAULT_GROUNDING_SETTINGS)
    s.update(settings or {})
    scene = scene or SceneInterface()
    feet = _foot_nodes(skeleton, "both")
    out: Dict[str, np.ndarray] = {}
    if not feet or len(frames) == 0:
        return out
    from ..construct.preprocessing import smooth_bitvector
    pos = (np.asarray(fk_positions(skeleton, jnp.asarray(frames, jnp.float32)))
           if positions is None else positions)
    win = max(int(s["foot_lift_search_window"]), 1)
    for f in feet:
        p = pos[:, skeleton.index_of(f)]  # [T, 3]
        ground = np.array([scene.get_height(float(x), float(z))
                           for x, z in zip(p[:, 0], p[:, 2])])
        h = p[:, 1] - ground
        strict = h < float(s["contact_tolerance"])
        loose = h < float(s["foot_lift_tolerance"])
        # kernel clamped to the signal length: np.convolve(mode="same")
        # returns max(len(signal), len(kernel)) elements, so a search
        # window longer than the motion would break the mask shapes
        kwin = min(2 * win + 1, len(strict))
        near_strict = np.convolve(strict.astype(np.float64),
                                  np.ones(kwin), mode="same") > 0
        bv = (loose & near_strict).astype(np.int8)
        out[f] = smooth_bitvector(
            bv, int(s["smoothing_constraints_window"]))
    return out


def generate_foot_plant_constraints(skeleton: Skeleton, frames: np.ndarray,
                                    settings: Optional[dict] = None,
                                    scene: Optional[SceneInterface] = None,
                                    steps=None):
    """Contact runs -> grounding constraints + blend ranges (reference
    FootplantConstraintGenerator.generate_from_graph_walk returning
    (constraints, blend_ranges, ground_contacts),
    motion_generator.py:328-336).

    Each contiguous contact run pins the foot at its median contact
    position (height = scene height there) for the whole run; the blend
    range extends `constraint_range` frames past each end.  When graph-walk
    `steps` are given, a run is clipped against its owning step's frame
    range extended by `graph_walk_grounding_window` frames, so one step's
    plant never reaches deep into the next step."""
    s = dict(DEFAULT_GROUNDING_SETTINGS)
    s.update(settings or {})
    scene = scene or SceneInterface()
    # ONE FK pass serves both the contact detector and the anchor medians
    pos = np.asarray(fk_positions(skeleton, jnp.asarray(frames, jnp.float32)))
    contacts = detect_ground_contacts(skeleton, frames, s, scene,
                                      positions=pos)
    rng = int(s["constraint_range"])
    gw = int(s["graph_walk_grounding_window"])
    constraints = []  # (joint, start, end, target[3])
    blend_ranges: Dict[str, list] = {}
    n = len(frames)
    for joint, bv in contacts.items():
        ji = skeleton.index_of(joint)
        edges = np.flatnonzero(np.diff(np.concatenate([[0], bv, [0]])))
        for k in range(0, len(edges), 2):
            start, end = int(edges[k]), int(edges[k + 1]) - 1
            if steps is not None:
                owner = next((st for st in steps
                              if st.start_frame <= (start + end) // 2
                              <= st.end_frame), None)
                if owner is not None:
                    start = max(start, owner.start_frame - gw)
                    end = min(end, owner.end_frame + gw)
            if end < start:
                continue
            anchor = np.median(pos[start: end + 1, ji], axis=0)
            anchor[1] = scene.get_height(float(anchor[0]), float(anchor[2]))
            constraints.append((joint, start, end, anchor))
            blend_ranges.setdefault(joint, []).append(
                (max(start - rng, 0), min(end + rng, n - 1)))
    return constraints, blend_ranges, contacts


def apply_grounding_constraints(skeleton: Skeleton, frames: np.ndarray,
                                constraints, activate_blending: bool = True,
                                constraint_range: int = 10) -> np.ndarray:
    """Apply footplant constraints: per run, one vmapped DLS-IK launch pins
    the foot at its anchor for every frame of the run (foot-skate removal);
    with activate_blending the edit ramps in/out over `constraint_range`
    frames on each side (reference MotionGrounding.run + add_blend_range,
    motion_generator.py:331-340)."""
    if not constraints:
        return frames
    frames = frames.copy()
    for joint, start, end, anchor in constraints:
        if joint not in skeleton.node_names:
            continue
        joint_mask = _leg_joint_mask(skeleton, [joint])
        if not joint_mask.any():
            continue
        end = min(end, len(frames) - 1)
        seg = jnp.asarray(frames[start: end + 1], jnp.float32)
        t = int(end - start + 1)
        n_c = ik_ops.MAX_IK_CONSTRAINTS
        targets = np.zeros((t, n_c, 3), np.float32)
        nodes = np.zeros((t, n_c), np.int32)
        mask = np.zeros((t, n_c), np.float32)
        targets[:, 0] = anchor
        nodes[:, 0] = skeleton.index_of(joint)
        mask[:, 0] = 1.0
        edited = np.asarray(jax.vmap(
            lambda f, nd, tg, mk: ik_ops.solve_ik(
                skeleton, f, nd, tg, mk, jnp.asarray(joint_mask),
                n_iters=8))(seg, jnp.asarray(nodes), jnp.asarray(targets),
                            jnp.asarray(mask)))
        frames[start: end + 1] = edited
        if activate_blending and constraint_range > 0:
            delta_s = edited[0] - seg[0]
            delta_e = edited[-1] - seg[-1]
            for w in range(1, constraint_range + 1):
                factor = 1.0 - w / (constraint_range + 1)
                k = start - w
                if k >= 0:
                    frames[k] = frames[k] + np.asarray(delta_s) * factor
                k = end + w
                if k < len(frames):
                    frames[k] = frames[k] + np.asarray(delta_e) * factor
    return frames


def ground_step(skeleton: Skeleton, frames: np.ndarray, mp_name: str,
                start_frame: int, end_frame: int,
                scene: Optional[SceneInterface] = None) -> np.ndarray:
    """Ground one graph-walk step according to its primitive configuration
    (reference MotionPrimitiveGrounding.ground_* dispatch)."""
    cfg = MP_CONFIGURATIONS.get(mp_name)
    if cfg is None:
        return frames
    scene = scene or SceneInterface()
    # terrain height is sampled at EACH anchor's own root position — one
    # start-frame sample for both anchors plants the end stance foot at the
    # wrong height on slopes/stairs
    end_frame = min(end_frame, len(frames) - 1)
    h_start = scene.get_height(float(frames[start_frame][0]),
                               float(frames[start_frame][2]))
    h_end = scene.get_height(float(frames[end_frame][0]),
                             float(frames[end_frame][2]))
    feet_start = _foot_nodes(skeleton, cfg["start_stance_foot"])
    feet_end = _foot_nodes(skeleton, cfg["end_stance_foot"])
    frames = _ground_window(skeleton, frames, [start_frame], feet_start,
                            h_start, cfg["start_window_size"])
    frames = _ground_window(skeleton, frames, [end_frame], feet_end, h_end,
                            cfg["end_window_size"])
    # per-frame stance pin + swing clamp between the anchors (reference
    # ground_initial_stance_foot — runs for stance_mode != 'none')
    frames = ground_stance_swing(skeleton, frames, cfg, start_frame,
                                 end_frame, h_start)
    return frames


def ground_motion(skeleton: Skeleton, frames: np.ndarray, steps,
                  scene: Optional[SceneInterface] = None,
                  settings: Optional[dict] = None) -> np.ndarray:
    """Ground a full graph walk (reference run_motion_grounding,
    motion_generator.py:321-352): move to ground, then either detected
    footplant constraints (generate_foot_plant_constraints — the reference
    offline default via FootplantConstraintGenerator) or per-step
    stance-table grounding (reference MotionPrimitiveGrounding
    semantics; also the fallback when no settings are given)."""
    if not _foot_nodes(skeleton, "both"):
        return frames  # skeleton has no feet (e.g. reduced test rigs)
    frames = move_to_ground(skeleton, frames, scene)
    s = settings or {}
    if s.get("generate_foot_plant_constraints", False):
        cs, _brs, _ = generate_foot_plant_constraints(
            skeleton, frames, s, scene, steps)
        return apply_grounding_constraints(
            skeleton, frames, cs,
            activate_blending=bool(s.get("activate_blending", True)),
            constraint_range=int(s.get("constraint_range", 10)))
    for step in steps:
        frames = ground_step(skeleton, frames, step.node_key[1],
                             step.start_frame, step.end_frame, scene)
    return frames
