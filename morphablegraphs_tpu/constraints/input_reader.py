"""Constraint input ("CNL") JSON reader.

Host-side replacement for the reference's `MGInputFormatReader` +
`KeyframeConstraintReader` + `TrajectoryConstraintReader` (reference
constraints/mg_input_format_reader/*.py).  Parses the same schema as
examples/example_input.json:

  {"startPose": {"position", "orientation"},
   "elementaryActions": [{"action", "constraints": [{"joint",
        "keyframeConstraints" | "trajectoryConstraints" | "directionConstraints"
        : [...]}], "keyframeAnnotations": [...]}]}
  (or {"tasks": [{"elementaryActions": [...]}]})

Output is plain-numpy spec objects consumed by the constraint compiler.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

# CAD -> OpenGL: -90deg rotation about X (reference
# mg_input_format_reader/utils.py:27-35): [x, y, z] -> [x, z, -y]
_CAD_TO_GL = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64)
_CAD_TO_GL_INDEX = {0: 0, 1: 2, 2: 1}

DEFAULT_JOINT_NAME_MAP = {"RightHand": "RightToolEndSite",
                          "LeftHand": "LeftToolEndSite"}


@dataclasses.dataclass
class KeyframeConstraintSpec:
    """One keyframe constraint attached to a label (reference
    keyframe_constraint_reader.py:133-190 `_extend_keyframe_constraint_definition`)."""

    joint: str
    position: np.ndarray  # [3], NaN for unconstrained components
    orientation: np.ndarray  # [3] euler degrees, NaN when unset
    keyframe_label: str
    time: Optional[float] = None
    semantic_annotation: dict = dataclasses.field(default_factory=dict)
    look_at: bool = False
    event_name: Optional[str] = None
    event_target: Optional[str] = None


@dataclasses.dataclass
class TrajectorySpec:
    """Filtered control points for one joint's trajectory constraint."""

    joint: str
    control_points: np.ndarray  # [P, 3] (None components -> 0)
    unconstrained_dims: tuple  # dims to ignore in distances (e.g. height)
    annotated: bool = False  # carries collision-avoidance regions (later)


@dataclasses.dataclass
class ActionSpec:
    name: str
    keyframe_constraints: List[KeyframeConstraintSpec] = dataclasses.field(default_factory=list)
    trajectories: List[TrajectorySpec] = dataclasses.field(default_factory=list)
    annotations: Dict[str, dict] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class MGInput:
    start_pose_position: np.ndarray  # [3]
    start_pose_orientation: Optional[np.ndarray]  # [3] euler deg or None
    actions: List[ActionSpec] = dataclasses.field(default_factory=list)


def _tf_point(p, do_transform: bool, scale: float = 1.0) -> np.ndarray:
    """None components -> NaN; optional CAD->GL rotation; scaling."""
    arr = np.array([np.nan if v is None else float(v) * scale for v in p], np.float64)
    if do_transform:
        filled = np.where(np.isnan(arr), 0.0, arr)
        rotated = _CAD_TO_GL @ filled
        nan_idx = [_CAD_TO_GL_INDEX[i] for i in range(3) if np.isnan(arr[i])]
        for i in nan_idx:
            rotated[i] = np.nan
        return rotated
    return arr


def read_input(mg_input: dict, activate_coordinate_transform: bool = True,
               scale_factor: float = 1.0, activate_joint_mapping: bool = False,
               center_constraints: bool = False,
               control_point_filter_threshold: float = 0.0) -> MGInput:
    """Parse the constraint input dict (reference
    mg_input_format_reader.py:56-101, :158-185).

    control_point_filter_threshold drops near-duplicate trajectory control
    points (reference trajectory_following_settings key, consumed at
    action_constraints_builder.py:68,:284); a 1e-3 floor always applies so
    coincident points cannot degenerate the Catmull-Rom segments."""
    if activate_joint_mapping:
        # Whole-JSON string replace is EXACT reference behavior
        # (_apply_joint_mapping_on_string, mg_input_format_reader.py:114-117
        # runs str.replace over the serialized input) — including its quirk
        # that any string merely containing a mapped name (e.g.
        # "RightHandIndex1") is rewritten too.  Kept for parity; the flag is
        # off by default.
        import json as _json
        s = _json.dumps(mg_input)
        for k, v in DEFAULT_JOINT_NAME_MAP.items():
            s = s.replace(k, v)
        mg_input = _json.loads(s)

    if "elementaryActions" in mg_input:
        action_list = mg_input["elementaryActions"]
    elif "tasks" in mg_input:
        action_list = []
        for task in mg_input["tasks"]:
            action_list += task.get("elementaryActions", [])
    else:
        raise ValueError("input contains neither elementaryActions nor tasks")

    sp = mg_input.get("startPose", {"position": [0, 0, 0], "orientation": [0, 0, 0]})
    pos = _tf_point(sp["position"], activate_coordinate_transform, scale_factor)
    pos = np.where(np.isnan(pos), 0.0, pos)
    if sp.get("orientation") is None or None in sp["orientation"]:
        orientation = None
    else:
        orientation = _tf_point(sp["orientation"], activate_coordinate_transform)

    offset = pos.copy() if center_constraints else np.zeros(3)
    if center_constraints:
        pos = np.zeros(3)

    out = MGInput(start_pose_position=pos.astype(np.float32),
                  start_pose_orientation=None if orientation is None
                  else orientation.astype(np.float32))

    for entry in action_list:
        action = ActionSpec(name=entry["action"])
        for joint_entry in entry.get("constraints", []):
            joint = joint_entry.get("joint")
            for c_type in ("keyframeConstraints", "directionConstraints"):
                for c in joint_entry.get(c_type, []):
                    spec = _parse_keyframe_constraint(
                        joint, c, c_type, activate_coordinate_transform, scale_factor)
                    spec.position = (spec.position - offset).astype(np.float32)
                    action.keyframe_constraints.append(spec)
            if "trajectoryConstraints" in joint_entry:
                traj = _parse_trajectory(
                    joint, joint_entry["trajectoryConstraints"],
                    activate_coordinate_transform, scale_factor, offset,
                    distance_threshold=max(
                        control_point_filter_threshold, 1e-3))
                if traj is not None:
                    action.trajectories.append(traj)
        for ann in entry.get("keyframeAnnotations", []):
            action.annotations[ann["keyframe"]] = ann
        out.actions.append(action)
    return out


def _parse_keyframe_constraint(joint, c, c_type, do_transform, scale):
    position = _tf_point(c.get("position", [None] * 3), do_transform, scale)
    orientation = _tf_point(c.get("orientation", [None] * 3), do_transform)
    semantic = dict(c.get("semanticAnnotation", {}))
    label = c.get("keyframeLabel")
    if label is None:
        labels = [k for k, v in semantic.items() if v is True and k != "keyframeLabel"]
        label = labels[0] if labels else "end"
    semantic["keyframeLabel"] = label
    return KeyframeConstraintSpec(
        joint=joint,
        position=position.astype(np.float32),
        orientation=orientation.astype(np.float32),
        keyframe_label=label,
        time=c.get("time"),
        semantic_annotation=semantic,
        look_at=(c_type == "directionConstraints"),
        event_name=c.get("eventName"),
        event_target=c.get("eventTarget"),
    )


def _parse_trajectory(joint, control_points, do_transform, scale, offset,
                      distance_threshold: float = 0.001):
    """Filter + transform control points (reference
    trajectory_constraint_reader.py:66-175 `_filter_control_points_simple`)."""
    points = []
    unconstrained = set()
    prev = None
    annotated = False
    for cp in control_points:
        if "semanticAnnotation" in cp and cp["semanticAnnotation"].get(
                "collisionAvoidance") is not None:
            annotated = True  # CA active-region trajectory (reference
            # trajectory_constraint_reader.py:36-66 _is_active_trajectory_region)
        p = cp.get("position")
        if p is None or all(v is None for v in p):
            continue
        arr = _tf_point(p, do_transform, scale)
        for i in range(3):
            if np.isnan(arr[i]):
                unconstrained.add(i)
                arr[i] = 0.0
        arr = arr - offset
        if prev is not None and np.linalg.norm(arr - prev) < distance_threshold:
            continue
        points.append(arr)
        prev = arr
    if len(points) < 2:
        return None
    return TrajectorySpec(joint=joint,
                          control_points=np.asarray(points, np.float32),
                          unconstrained_dims=tuple(sorted(unconstrained)),
                          annotated=annotated)
