"""Synthetic model/graph builders: tiny hand-built 'walk' models in the
reference's legacy JSON schema (reference motion_primitive.py:93-180 and the
zip-reader dict form, motion_state_graph_loader.py:184-307).

Used by tests, benchmarks and demos — the reference ships no model data, so
valid random models are synthesized (SURVEY.md §4 golden-file strategy).
"""

import numpy as np

from morphablegraphs_tpu.ops import bspline

# A minimal 4-joint skeleton: Hips -> Spine -> Head, Hips -> Leg.
TEST_BVH = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 90.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Xrotation Yrotation Zrotation
  JOINT Spine
  {
    OFFSET 0.0 20.0 0.0
    CHANNELS 3 Xrotation Yrotation Zrotation
    JOINT Head
    {
      OFFSET 0.0 15.0 0.0
      CHANNELS 3 Xrotation Yrotation Zrotation
      End Site
      {
        OFFSET 0.0 10.0 0.0
      }
    }
  }
  JOINT Leg
  {
    OFFSET 5.0 -45.0 0.0
    CHANNELS 3 Xrotation Yrotation Zrotation
    End Site
    {
      OFFSET 0.0 -45.0 0.0
    }
  }
}
MOTION
Frames: 2
Frame Time: 0.033333
0 90 0 0 0 0 0 0 0 0 0 0 10 0 0
1 90 2 0 5 0 0 0 5 0 0 0 15 0 0
"""

N_JOINTS = 4  # TEST_BVH animated joints: Hips, Spine, Head, Leg

# A legged humanoid for grounding / IK tests: 10 animated joints.
WALK_BVH = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 90.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Xrotation Yrotation Zrotation
  JOINT Spine
  {
    OFFSET 0.0 20.0 0.0
    CHANNELS 3 Xrotation Yrotation Zrotation
    JOINT Head
    {
      OFFSET 0.0 25.0 0.0
      CHANNELS 3 Xrotation Yrotation Zrotation
      End Site
      {
        OFFSET 0.0 15.0 0.0
      }
    }
  }
  JOINT LeftUpLeg
  {
    OFFSET 9.0 -5.0 0.0
    CHANNELS 3 Xrotation Yrotation Zrotation
    JOINT LeftLeg
    {
      OFFSET 0.0 -40.0 0.0
      CHANNELS 3 Xrotation Yrotation Zrotation
      JOINT LeftFoot
      {
        OFFSET 0.0 -40.0 0.0
        CHANNELS 3 Xrotation Yrotation Zrotation
        JOINT LeftToeBase
        {
          OFFSET 0.0 -5.0 12.0
          CHANNELS 3 Xrotation Yrotation Zrotation
          End Site
          {
            OFFSET 0.0 0.0 5.0
          }
        }
      }
    }
  }
  JOINT RightUpLeg
  {
    OFFSET -9.0 -5.0 0.0
    CHANNELS 3 Xrotation Yrotation Zrotation
    JOINT RightLeg
    {
      OFFSET 0.0 -40.0 0.0
      CHANNELS 3 Xrotation Yrotation Zrotation
      JOINT RightFoot
      {
        OFFSET 0.0 -40.0 0.0
        CHANNELS 3 Xrotation Yrotation Zrotation
        JOINT RightToeBase
        {
          OFFSET 0.0 -5.0 12.0
          CHANNELS 3 Xrotation Yrotation Zrotation
          End Site
          {
            OFFSET 0.0 0.0 5.0
          }
        }
      }
    }
  }
}
MOTION
Frames: 1
Frame Time: 0.033333
0 90 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
"""


def _bvh_from_tree(tree, root_offset=(0.0, 90.0, 0.0)):
    """Build a BVH HIERARCHY string from a nested (name, offset, children)
    tree; every joint gets 3 rotation channels (root gets 6)."""
    lines = ["HIERARCHY"]

    def walk(node, depth, is_root):
        name, off, children = node
        pad = "  " * depth
        kw = "ROOT" if is_root else "JOINT"
        lines.append(f"{pad}{kw} {name}")
        lines.append(pad + "{")
        lines.append(f"{pad}  OFFSET {off[0]} {off[1]} {off[2]}")
        if is_root:
            lines.append(f"{pad}  CHANNELS 6 Xposition Yposition Zposition "
                         "Xrotation Yrotation Zrotation")
        else:
            lines.append(f"{pad}  CHANNELS 3 Xrotation Yrotation Zrotation")
        if children:
            for c in children:
                walk(c, depth + 1, False)
        else:
            lines.append(f"{pad}  End Site")
            lines.append(pad + "  {")
            lines.append(f"{pad}    OFFSET 0.0 5.0 0.0")
            lines.append(pad + "  }")
        lines.append(pad + "}")

    walk((tree[0], root_offset, tree[2]), 0, True)
    n_channels = 6 + 3 * (_count_joints(tree) - 1)
    lines.append("MOTION")
    lines.append("Frames: 1")
    lines.append("Frame Time: 0.033333")
    lines.append(" ".join(["0"] * n_channels))
    return "\n".join(lines) + "\n"


def _count_joints(node):
    return 1 + sum(_count_joints(c) for c in node[2])


# A 19-animated-joint humanoid at production dimensions (D = 3 + 4*19 = 79
# frame channels, the reference's ~79-channel scale, SURVEY.md §2.1 row 1).
_REF_TREE = (
    "Hips", (0.0, 90.0, 0.0), [
        ("Spine", (0.0, 10.0, 0.0), [
            ("Spine1", (0.0, 12.0, 0.0), [
                ("Neck", (0.0, 12.0, 0.0), [
                    ("Head", (0.0, 8.0, 0.0), []),
                ]),
                ("LeftArm", (18.0, 8.0, 0.0), [
                    ("LeftForeArm", (0.0, -28.0, 0.0), [
                        ("LeftHand", (0.0, -25.0, 0.0), []),
                    ]),
                ]),
                ("RightArm", (-18.0, 8.0, 0.0), [
                    ("RightForeArm", (0.0, -28.0, 0.0), [
                        ("RightHand", (0.0, -25.0, 0.0), []),
                    ]),
                ]),
            ]),
        ]),
        ("LeftUpLeg", (9.0, -5.0, 0.0), [
            ("LeftLeg", (0.0, -40.0, 0.0), [
                ("LeftFoot", (0.0, -40.0, 0.0), [
                    ("LeftToeBase", (0.0, -5.0, 12.0), []),
                ]),
            ]),
        ]),
        ("RightUpLeg", (-9.0, -5.0, 0.0), [
            ("RightLeg", (0.0, -40.0, 0.0), [
                ("RightFoot", (0.0, -40.0, 0.0), [
                    ("RightToeBase", (0.0, -5.0, 12.0), []),
                ]),
            ]),
        ]),
    ])

REF_BVH = _bvh_from_tree(_REF_TREE)
REF_N_JOINTS = _count_joints(("Hips", (0, 0, 0), _REF_TREE[2]))  # 19

# Production-scale model dimensions (SURVEY.md §2.1 / VERDICT r1 item 2:
# D≈79 channels, n_basis 16, k_s≈25, k_t 3, ~130 canonical frames).
REF_SCALE = dict(n_joints=19, n_canonical_frames=130, n_basis=16,
                 k_s=25, k_t=3, n_components=5)


def make_legacy_model_json(seed=0, n_canonical_frames=50, n_basis=12,
                           n_joints=4, k_s=5, k_t=2, n_components=3,
                           version=2, translation_maxima=(1.0, 1.0, 1.0)):
    """Random-but-valid legacy model JSON (schema of reference
    motion_primitive.py:93-180)."""
    rng = np.random.default_rng(seed)
    n_dim = 3 + 4 * n_joints
    d_s = n_basis * n_dim

    # Mean: a plausible motion — root moving forward, identity-ish quats.
    mean = np.zeros((n_basis, n_dim))
    mean[:, 2] = np.linspace(0, 30, n_basis)  # root z advance
    mean[:, 1] = 90.0  # hip height
    for j in range(n_joints):
        mean[:, 3 + 4 * j] = 1.0  # w component
        mean[:, 4 + 4 * j: 7 + 4 * j] = rng.standard_normal((n_basis, 3)) * 0.1
    mean_vec = mean.reshape(-1)

    eigen = rng.standard_normal((k_s, d_s)) * 0.3  # stored [k, D] (rows)
    knots_s = bspline.clamped_knots(n_basis, n_canonical_frames)

    # Temporal model: small log-increment perturbations.
    n_basis_t = 8
    t_eigen = rng.standard_normal((n_basis_t, k_t)) * 0.05
    t_mean = rng.standard_normal(n_basis_t) * 0.03
    knots_t = bspline.clamped_knots(n_basis_t, n_canonical_frames)

    d_latent = k_s + k_t
    w = rng.random(n_components)
    w /= w.sum()
    means_g = rng.standard_normal((n_components, d_latent)) * 0.8
    covars = []
    for _ in range(n_components):
        a = rng.standard_normal((d_latent, d_latent)) * 0.2
        covars.append(a @ a.T + np.eye(d_latent) * 0.3)

    data = {
        "name": "walk_leftStance",
        "gmm_weights": w.tolist(),
        "gmm_means": means_g.tolist(),
        "gmm_covars": np.stack(covars).tolist(),
        "eigen_vectors_spatial": eigen.tolist(),
        "mean_spatial_vector": mean_vec.tolist(),
        "n_canonical_frames": n_canonical_frames,
        "translation_maxima": list(translation_maxima),
        "n_basis_spatial": n_basis,
        "n_dim_spatial": n_dim,
        "b_spline_knots_spatial": knots_s.tolist(),
        "keyframes": {"start": 0, "middle": n_canonical_frames // 2,
                      "end": n_canonical_frames - 1},
    }
    if version == 1:
        data.update({
            "eigen_vectors_temporal_semantic": t_eigen.tolist(),
            "mean_temporal_semantic_vector": t_mean.tolist(),
            "b_spline_knots_temporal_semantic": knots_t.tolist(),
            "n_basis_temporal_semantic": n_basis_t,
            "n_dim_temporal_semantic": 1,
        })
    else:
        data.update({
            "eigen_vectors_time": t_eigen.tolist(),
            "mean_time_vector": t_mean.tolist(),
            "b_spline_knots_time": knots_t.tolist(),
            "n_basis_time": n_basis_t,
        })
    return data


def make_graph_dict(seed=0, n_joints=4, n_canonical_frames=40, n_basis=12,
                    k_s=5, k_t=2, n_components=3):
    """A 'walk' graph: beginLeftStance -> {left,right}Stance cycle ->
    endRightStance, in the dict form of the reference's zip reader
    (motion_state_graph_loader.py:184-307).  Defaults are the tiny smoke
    scale; pass **REF_SCALE for production dimensions."""
    prims = {}
    for i, name in enumerate(["beginLeftStance", "leftStance", "rightStance",
                              "endRightStance"]):
        mm = make_legacy_model_json(seed=seed + i, n_joints=n_joints,
                                    n_canonical_frames=n_canonical_frames + 4 * i,
                                    n_basis=n_basis, k_s=k_s, k_t=k_t,
                                    n_components=n_components)
        mm["name"] = f"walk_{name}"
        prims[name] = {"name": f"walk_{name}", "mm": mm}
    return {
        "formatVersion": 2.0,
        "subgraphs": {
            "walk": {
                "name": "walk",
                "info": {
                    "start_states": ["beginLeftStance"],
                    "end_states": ["endRightStance"],
                },
                "nodes": prims,
            }
        },
        "transitions": {
            "walk_beginLeftStance": ["walk_rightStance"],
            "walk_leftStance": ["walk_rightStance", "walk_endRightStance"],
            "walk_rightStance": ["walk_leftStance", "walk_endRightStance"],
        },
        "startNode": ["walk", "beginLeftStance"],
    }


def make_reference_scale_graph_dict(seed=0):
    """The walk graph at production dimensions: 19 joints (D=79), n_basis 16,
    k_s 25, k_t 3, ~130 canonical frames (matches the reference's trained
    models, SURVEY.md §2.1/§3.4).  Skeleton: REF_BVH."""
    return make_graph_dict(seed=seed, **REF_SCALE)


def make_multi_action_graph_dict(seed=0, n_joints=4):
    """Walk + pickRight/carryRight/placeRight actions with contact labels —
    the action set exercised by the reference's examples/example_input.json."""
    gd = make_graph_dict(seed=seed, n_joints=n_joints)
    rng_base = seed + 100
    for i, (action, mp, label) in enumerate([
            ("pickRight", "reach", "start_contact"),
            ("carryRight", "locomotion", None),
            ("placeRight", "reach", "end_contact")]):
        mm = make_legacy_model_json(seed=rng_base + i, n_joints=n_joints,
                                    n_canonical_frames=36 + 2 * i)
        mm["name"] = f"{action}_{mp}"
        if label:
            mm["keyframes"][label] = mm["n_canonical_frames"] // 2
        gd["subgraphs"][action] = {
            "name": action,
            "info": {"start_states": [mp], "end_states": [mp]},
            "nodes": {mp: {"name": f"{action}_{mp}", "mm": mm}},
        }
        # action transitions from walk's end state and into the next action
        gd["transitions"].setdefault("walk_endRightStance", []).append(
            f"{action}_{mp}")
    gd["transitions"]["pickRight_reach"] = ["carryRight_locomotion"]
    gd["transitions"]["carryRight_locomotion"] = ["placeRight_reach"]
    return gd


def to_v3_json(legacy, animated_joints=None):
    """Convert a legacy model dict to the v3 {sspm,tspm,gmm} schema
    (reference motion_model_constructor.py:499-523).

    animated_joints defaults to generated names sized from the model's
    frame dimensionality ((n_dims - 3) / 4 joints; the TEST_BVH names for
    the 4-joint toy scale) so the list never contradicts sspm.n_dims."""
    n_dims = int(legacy["n_dim_spatial"])
    if animated_joints is None:
        n_joints = (n_dims - 3) // 4
        if n_joints == 4:
            animated_joints = ["Hips", "Spine", "Head", "Leg"]
        else:
            animated_joints = ["Hips"] + [f"Joint{i}"
                                          for i in range(1, n_joints)]
    return {
        "sspm": {
            "eigen": legacy["eigen_vectors_spatial"],
            "mean": legacy["mean_spatial_vector"],
            "n_coeffs": legacy["n_basis_spatial"],
            "n_dims": n_dims,
            "knots": legacy["b_spline_knots_spatial"],
            "animated_joints": list(animated_joints),
            "degree": 3,
        },
        "tspm": {
            "eigen": legacy["eigen_vectors_time"],
            "mean": legacy["mean_time_vector"],
            "n_coeffs": legacy["n_basis_time"],
            "n_dims": 1,
            "knots": legacy["b_spline_knots_time"],
            "degree": 3,
            "semantic_labels": {},
            "frame_time": 0.013889,
        },
        "gmm": {
            "weights": legacy["gmm_weights"],
            "means": legacy["gmm_means"],
            "covars": legacy["gmm_covars"],
        },
        "keyframes": legacy.get("keyframes", {}),
    }
