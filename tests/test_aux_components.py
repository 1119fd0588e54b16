"""Tests for auxiliary components: static primitives, look-at constraints,
hand poses, height maps, preprocessing, motion analysis, zip writer, PFNN."""

import json
import os
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.models import primitive as prim_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.models.static_primitive import make_static_model_json
from morphablegraphs_tpu.models.zip_writer import write_graph_zip
from morphablegraphs_tpu.models import pfnn as pfnn_mod
from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.utils.height_map import HeightMapInterface
from morphablegraphs_tpu.utils.exceptions import (ConstraintError,
                                                  PathSearchError,
                                                  SynthesisError)

from fixtures import TEST_BVH, WALK_BVH, make_graph_dict, make_legacy_model_json


# ---------------------------------------------------------------------------
# static primitive
# ---------------------------------------------------------------------------

def test_static_primitive_roundtrip():
    rng = np.random.default_rng(0)
    t, d = 40, 19
    # smooth clip (a 16-basis spline cannot reproduce white noise)
    ts = np.linspace(0, 2 * np.pi, t)[:, None]
    phases = rng.uniform(0, np.pi, d)[None, :]
    frames = np.sin(ts + phases).astype(np.float32)
    frames[:, 2] = np.linspace(0, 20, t)
    data = make_static_model_json(frames, n_basis=16, name="single")
    prim = prim_mod.load_primitive_json(data)
    assert prim.n_spatial == 1
    # sampling always reproduces the clip
    f, n, _ = prim_mod.sample_frames(jax.random.PRNGKey(0), prim,
                                     max_frames=64, use_time=True)
    f = np.asarray(f)[: int(n)]
    assert int(n) == t
    assert np.max(np.abs(f - frames)) < 0.1


# ---------------------------------------------------------------------------
# look-at constraint
# ---------------------------------------------------------------------------

def test_look_at_constraint():
    from morphablegraphs_tpu.constraints import compiled
    g = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    prim = g.nodes[("walk", "leftStance")].primitive
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    sc = compiled.set_look_at_constraint(sc, skel, "Head",
                                         target=[100.0, 120.0, 100.0],
                                         canonical_keyframe=prim.n_canonical_frames - 1)
    s = jnp.zeros(prim.n_latent)
    err = float(compiled.evaluate_error(skel, prim, sc, s))
    assert np.isfinite(err) and err > 0
    # pointing straight at the head's own gaze gives near-zero error
    coeffs = np.asarray(compiled.aligned_coeffs(prim, s, sc))
    from morphablegraphs_tpu.ops import bspline
    frame = np.asarray(bspline.evaluate(jnp.asarray(coeffs), prim.knots_s,
                                        jnp.asarray([float(prim.n_canonical_frames - 1)])))[0]
    pos, ori = sk.fk_global(skel, jnp.asarray(frame))
    from morphablegraphs_tpu.ops import quat as quat_ops
    head = skel.index_of("Head")
    gaze = np.asarray(quat_ops.rotate_vec(quat_ops.normalize(ori[head]),
                                          jnp.asarray([0.0, 0, 1.0])))
    target_on_gaze = np.asarray(pos[head]) + gaze * 50
    sc2 = compiled.set_look_at_constraint(sc, skel, "Head", target_on_gaze,
                                          prim.n_canonical_frames - 1)
    err2 = float(compiled.evaluate_error(skel, prim, sc2, s))
    assert err2 < 2.0  # degrees


# ---------------------------------------------------------------------------
# hand poses
# ---------------------------------------------------------------------------

def test_hand_pose_overlay():
    from morphablegraphs_tpu.synthesis.hand_pose import HandPoseGenerator
    skel, _ = sk.load_bvh(WALK_BVH)
    gen = HandPoseGenerator(skel, smoothing_window=4)
    # the walk skeleton has no hands; use the Right* leg joints as stand-ins
    grip = np.array([0.0, 0.0, 1.0, 0.0], np.float32)
    gen.add_pose("pick", {"RightLeg": grip})
    frames = np.zeros((20, skel.n_frame_params), np.float32)
    for j in range(skel.n_animated):
        frames[:, 3 + 4 * j] = 1.0
    events = [{"keyframe": 5, "event": "attach",
               "parameters": {"joint": "RightLeg"}}]
    out = gen.generate_hand_poses(frames, events)
    sl = skel.quat_slice("RightLeg")
    # after the attach event the pose quaternion is applied
    np.testing.assert_allclose(out[15, sl], grip, atol=1e-5)
    # before the event: original identity (outside the smoothing window)
    np.testing.assert_allclose(out[0, sl], [1, 0, 0, 0], atol=1e-5)


def test_hand_pose_smoothing_leaves_non_pose_joints_alone():
    """The transition blend must touch ONLY joints the pose overwrites;
    other Right*-prefixed joints (RightFoot, RightUpLeg, ...) keep their
    real motion (advisor finding r1: prefix filter wiped limb motion)."""
    from morphablegraphs_tpu.synthesis.hand_pose import HandPoseGenerator
    skel, _ = sk.load_bvh(WALK_BVH)
    gen = HandPoseGenerator(skel, smoothing_window=8)
    grip = np.array([0.0, 0.0, 1.0, 0.0], np.float32)
    gen.add_pose("pick", {"RightLeg": grip})
    rng = np.random.default_rng(3)
    frames = np.zeros((20, skel.n_frame_params), np.float32)
    for j in range(skel.n_animated):
        q = rng.normal(size=(20, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        frames[:, 3 + 4 * j: 7 + 4 * j] = q
    events = [{"keyframe": 10, "event": "attach",
               "parameters": {"joint": "RightLeg"}}]
    out = gen.generate_hand_poses(frames, events)
    other = [j for j in skel.animated_joints
             if j.startswith("Right") and j != "RightLeg"]
    assert other, "walk skeleton should have other Right* joints"
    for j in other:
        sl2 = skel.quat_slice(j)
        np.testing.assert_allclose(out[:, sl2], frames[:, sl2], atol=1e-6)


# ---------------------------------------------------------------------------
# height map
# ---------------------------------------------------------------------------

def test_height_map_bilinear():
    hm = HeightMapInterface(np.array([[0.0, 1.0], [2.0, 3.0]]), scale=10.0)
    assert hm.get_height(0, 0) == 0.0
    assert abs(hm.get_height(5, 0) - 0.5) < 1e-6
    assert abs(hm.get_height(5, 5) - 1.5) < 1e-6
    # out of range -> default
    assert hm.get_height(100, 100) == 0.0


# ---------------------------------------------------------------------------
# preprocessing
# ---------------------------------------------------------------------------

def _stepping_motion(skel, n=60):
    """Synthetic stepping: alternate small vertical foot lifts."""
    frames = np.zeros((n, skel.n_frame_params), np.float32)
    frames[:, 1] = -5.0
    for j in range(skel.n_animated):
        frames[:, 3 + 4 * j] = 1.0
    li = skel.animated_index_of("LeftUpLeg")
    ri = skel.animated_index_of("RightUpLeg")
    for i in range(n):
        phase = (i // 15) % 2
        swing = li if phase == 0 else ri
        ang = np.deg2rad(20 * np.sin(np.pi * (i % 15) / 15))
        frames[i, 3 + 4 * swing: 7 + 4 * swing] = [np.cos(ang / 2), np.sin(ang / 2), 0, 0]
        frames[i, 2] = i * 0.8
    return frames


def test_contact_bitvector_and_sections():
    from morphablegraphs_tpu.construct import preprocessing
    skel, _ = sk.load_bvh(WALK_BVH)
    frames = _stepping_motion(skel)
    bv = preprocessing.calc_contact_bitvector(skel, frames, threshold=2.0)
    assert set(bv) == {"LeftFoot", "RightFoot"}
    assert bv["LeftFoot"].shape == (len(frames),)
    sections = preprocessing.split_walk_motion(skel, frames, threshold=2.0)
    assert len(sections) >= 1
    assert sections[0]["start_idx"] == 0
    assert sections[-1]["end_idx"] == len(frames)
    # sections tile the clip
    for a, b in zip(sections[:-1], sections[1:]):
        assert a["end_idx"] == b["start_idx"]


def test_semantic_annotation_walk():
    from morphablegraphs_tpu.construct import preprocessing
    skel, _ = sk.load_bvh(WALK_BVH)
    frames = _stepping_motion(skel)
    anno = preprocessing.create_semantic_annotation(
        "walk", "beginRightStance", skel, {"a.bvh": frames})
    assert anno["annotation_list"] == ["LeftFootContact", "RightFootContact",
                                       "start", "end"]
    clip = anno["data"]["a.bvh"]
    n = len(frames)
    assert clip["LeftFootContact"] == [1.0] * n  # stance foot always down
    rc = clip["RightFootContact"]
    assert len(rc) == n and rc[0] == 1 and rc[-1] == 1
    assert clip["start"][0] == 1.0 and sum(clip["start"]) == 1.0
    assert clip["end"][-1] == 1.0 and sum(clip["end"]) == 1.0
    # turnLeft maps onto the rightStance model (reference gen_walk_annotation)
    anno2 = preprocessing.create_semantic_annotation(
        "walk", "turnLeftRightStance", skel, {"a.bvh": frames})
    assert anno2["data"]["a.bvh"]["LeftFootContact"] == [1.0] * n


def test_semantic_annotation_pick_and_screw():
    from morphablegraphs_tpu.construct import preprocessing
    skel, _ = sk.load_bvh(WALK_BVH)
    frames = _stepping_motion(skel, n=20)
    anno = preprocessing.create_semantic_annotation(
        "pickRight", "first", skel, {"c.bvh": frames})
    clip = anno["data"]["c.bvh"]
    assert clip["rightHandContact"][-1] == 1 and sum(clip["rightHandContact"]) == 1
    assert sum(clip["leftHandContact"]) == 0
    anno = preprocessing.create_semantic_annotation(
        "pickBoth", "second", skel, {"c.bvh": frames})
    clip = anno["data"]["c.bvh"]
    assert clip["leftHandContact"] == [1.0] * 20
    assert clip["rightHandContact"] == [1.0] * 20
    anno = preprocessing.create_semantic_annotation(
        "screw", "retrieve", skel, {"c.bvh": frames})
    assert anno["annotation_list"] == ["start", "end"]
    import pytest
    with pytest.raises(KeyError):
        preprocessing.create_semantic_annotation("jump", "x", skel, {})


def test_motion_analysis_features():
    from morphablegraphs_tpu.construct.motion_analysis import BVHAnalyzer, Plane
    skel, _ = sk.load_bvh(WALK_BVH)
    frames = _stepping_motion(skel, n=30)
    analyzer = BVHAnalyzer(skel, frames)
    feats = analyzer.feature_vector()
    assert "root_speed" in feats and "Left_knee_angle" in feats
    assert feats["root_speed"].shape == (30,)
    assert np.all(feats["Left_knee_angle"] > 90)  # nearly straight legs
    # plane fitting
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, 50), np.zeros(50), rng.uniform(-1, 1, 50)], 1)
    plane = Plane.fit(pts)
    assert abs(abs(plane.normal[1]) - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# zip writer round trip
# ---------------------------------------------------------------------------

def test_zip_writer_roundtrip(tmp_path):
    skel, _ = sk.load_bvh(TEST_BVH)
    gd = make_graph_dict()
    actions = {"walk": {
        "nodes": {mp: node["mm"] for mp, node in gd["subgraphs"]["walk"]["nodes"].items()},
        "info": gd["subgraphs"]["walk"]["info"],
    }}
    # optional sections in the reference layout (zip_io.py:96-166): hand
    # poses as per-hand flattened quat vectors + PFNN float32 binaries
    hand_pose_info = {
        "status_change_map": {"attach": "pick", "release": "standard"},
        "right_hand_skeleton": {"joint_names": ["RightHand"]},
        "left_hand_skeleton": {"joint_names": ["LeftHand"]},
        "poses": {"pick": {"RightHand": [0.0, 1.0, 0.0, 0.0],
                           "LeftHand": [1.0, 0.0, 0.0, 0.0]}},
        "skeletonStrings": {"pick": "HIERARCHY"},
    }
    rng = np.random.default_rng(0)
    pfnn_data = {
        "weights": {k: rng.standard_normal(8).astype(np.float32)
                    for k in ("W0", "W1", "W2", "b0", "b1", "b2")},
        "means": {k: rng.standard_normal(4).astype(np.float32)
                  for k in ("Xmean", "Ymean", "Xstd", "Ystd")},
    }
    path = write_graph_zip(str(tmp_path / "packaged"), skel, actions,
                           gd["transitions"], start_node=gd["startNode"],
                           hand_pose_info=hand_pose_info, pfnn_data=pfnn_data)
    g = graph_mod.load_graph(path)
    assert ("walk", "leftStance") in g.nodes
    assert g.nodes[("walk", "beginLeftStance")].node_type == graph_mod.NODE_TYPE_START
    assert g.start_node == ("walk", "beginLeftStance")
    # hand poses hydrated through the reference schema
    hp = g.hand_pose_generator
    assert hp is not None and "pick" in hp.pose_map
    assert np.allclose(hp.pose_map["pick"].joint_quats["RightHand"],
                       [0.0, 1.0, 0.0, 0.0])
    assert hp.status_change_map["release"] == "standard"
    assert hp._status_for_event("release", "pick") == "standard"
    # pfnn binaries round-trip exactly
    assert g.pfnn_data is not None
    assert np.array_equal(g.pfnn_data["weights"]["W1"],
                          pfnn_data["weights"]["W1"])
    assert np.array_equal(g.pfnn_data["means"]["Ystd"],
                          pfnn_data["means"]["Ystd"])


# ---------------------------------------------------------------------------
# PFNN
# ---------------------------------------------------------------------------

def test_pfnn_forward():
    rng = np.random.default_rng(0)
    p, h, x_dim, y_dim = 4, 8, 6, 5
    weights = {"W0": rng.standard_normal(p * h * x_dim) * 0.1,
               "W1": rng.standard_normal(p * h * h) * 0.1,
               "W2": rng.standard_normal(p * y_dim * h) * 0.1,
               "b0": np.zeros(p * h), "b1": np.zeros(p * h),
               "b2": np.zeros(p * y_dim)}
    means = {"Xmean": np.zeros(x_dim), "Xstd": np.ones(x_dim),
             "Ymean": np.zeros(y_dim), "Ystd": np.ones(y_dim)}
    model = pfnn_mod.load_from_arrays(weights, means, n_controls=p, hidden=h)
    x = jnp.asarray(rng.standard_normal(x_dim), jnp.float32)
    y1 = pfnn_mod.forward(model, x, jnp.asarray(0.1))
    y2 = pfnn_mod.forward(model, x, jnp.asarray(0.6))
    assert y1.shape == (y_dim,)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))  # phase matters
    # crowd path
    xs = jnp.asarray(rng.standard_normal((7, x_dim)), jnp.float32)
    ys = pfnn_mod.forward_crowd(model, xs, jnp.linspace(0, 0.9, 7))
    assert ys.shape == (7, y_dim)
    # phase continuity across the wrap
    ya = np.asarray(pfnn_mod.forward(model, x, jnp.asarray(0.999)))
    yb = np.asarray(pfnn_mod.forward(model, x, jnp.asarray(0.001)))
    assert np.max(np.abs(ya - yb)) < 0.1


# ---------------------------------------------------------------------------
# exceptions
# ---------------------------------------------------------------------------

def test_exceptions_carry_payload():
    e = SynthesisError("failed", quat_frames=np.zeros((2, 3)), bad_samples=[1])
    assert e.bad_samples == [1]
    p = PathSearchError({"last": 1.0})
    assert p.search_parameters["last"] == 1.0
    c = ConstraintError("bad", bad_constraints=["x"])
    assert c.bad_constraints == ["x"]
    assert isinstance(c, ValueError)


def test_image_height_map_reference_semantics():
    """ImageHeightMap vs a direct replication of the reference mapping
    (utilities/height_map_interface.py:36-66): centered normalized
    coordinates, nearest-lower pixel, pixel/255 * height_scale."""
    from morphablegraphs_tpu.utils.height_map import ImageHeightMap
    rng = np.random.default_rng(5)
    pixels = rng.integers(0, 256, size=(16, 12)).astype(np.float64)  # [H, W]
    width, depth, height_scale = 48.0, 64.0, 10.0
    scale = (2.0, 1.5)
    hm = ImageHeightMap(pixels, width, depth, scale, height_scale)

    def oracle(x, z):
        rel_x = (x / scale[0] + width / 2) / width
        rel_z = (z / scale[1] + depth / 2) / depth
        if rel_x < 0 or rel_x > 1.0 or rel_z < 0 or rel_z > 1.0:
            return 0.0
        ix = min(int(rel_x * 12), 11)
        iy = min(int(rel_z * 16), 15)
        return pixels[iy, ix] / 255.0 * height_scale

    for x, z in [(0, 0), (10, -20), (-47.9, 47.9), (30.5, -12.25), (500, 0),
                 (0, -500)]:
        assert abs(hm.get_height(x, z) - oracle(x, z)) < 1e-12

    # RGB image: channel 0 (pixel_is_tuple branch)
    rgb = np.stack([pixels, pixels * 0, pixels * 0], axis=-1)
    hm_rgb = ImageHeightMap(rgb, width, depth, scale, height_scale)
    assert hm_rgb.get_height(3.0, 4.0) == hm.get_height(3.0, 4.0)


def test_scene_interface_offset_and_scene():
    from morphablegraphs_tpu.synthesis.grounding import SceneInterface
    from morphablegraphs_tpu.utils.height_map import ImageHeightMap
    pixels = np.full((4, 4), 255.0)
    hm = ImageHeightMap(pixels, 8.0, 8.0, (1.0, 1.0), 3.0)
    scene = SceneInterface()
    scene.set_scene(hm)
    assert abs(scene.get_height(0, 0) - 3.0) < 1e-12
    scene.set_offset(100.0, 0.0)   # pushes queries off the map -> 0
    assert scene.get_height(0, 0) == 0.0


def test_motion_analysis_extended_predicates():
    """The widened BVHAnalyzer surface (accessors, leg/feet/hand predicates,
    body planes) — batched equivalents of reference bvh_analyzer.py:43-643."""
    from morphablegraphs_tpu.construct.motion_analysis import BVHAnalyzer, Plane
    skel, _ = sk.load_bvh(WALK_BVH)
    n = 30
    frames = _stepping_motion(skel, n=n)
    a = BVHAnalyzer(skel, frames)

    # accessors
    assert a.get_global_joint_positions("LeftFoot").shape == (n, 3)
    assert np.allclose(a.get_global_pos("LeftFoot", 3),
                       a.get_global_joint_positions("LeftFoot")[3])
    rel = a.get_relative_joint_position("Head", 0)
    assert rel[1] > 0  # head above the root
    assert a.get_parent_joint_name("LeftFoot") == "LeftLeg"
    chain = a.get_joint_chain("LeftFoot")
    assert chain[0] == "Hips" and chain[-1] == "LeftFoot"

    # kinematics
    assert a.joint_acceleration("Hips").shape == (n,)

    # scalar features
    feet = a.feet_distance_on_ground()
    assert feet.shape == (n,) and np.all(feet > 0)
    towards = a.feet_moving_towards_each_other()
    assert towards.dtype == bool and towards.shape == (n,)

    # leg state machine features: the stepping motion bends then stretches
    bend = a.leg_bending("Left")
    stretch = a.leg_stretching("Left")
    assert bend.any() and stretch.any()
    assert not (bend & stretch).any()
    assert not bend[0] and not stretch[0]  # frame 0 is False (reference :530)

    # body plane: for a mostly-upright character the normal is horizontal-ish
    normals, points = a.body_planes()
    assert normals.shape == (n, 3)
    assert np.all(np.abs(normals[:, 1]) < 0.7)

    d = a.joint_distance_to_body("Head")
    assert d.shape == (n,)
    assert np.all(np.abs(d) < 10.0)  # head is near the torso plane

    # toe test: WALK_BVH has LeftToeBase/RightToeBase
    toe = a.toe_before_leg("Right")
    assert toe.shape == (n,) and toe.dtype == bool

    # three-point plane + signed side (reference Plane.is_before_plane)
    p = Plane.from_three_points([0, 0, 0], [1, 0, 0], [0, 0, 1])
    assert abs(abs(p.normal[1]) - 1) < 1e-12
    assert p.is_before([0, -1, 0]) != p.is_before([0, 1, 0])

    feats = a.feature_vector()
    assert "feet_distance" in feats and "Left_leg_bending" in feats


def test_retarget_identity_and_scaled():
    """Global-orientation-copy retargeting (anim_utils surface the
    reference REST layer uses, mg_rest_interface.py:70-93): identity map
    reproduces positions; renamed rig with doubled offsets reproduces
    scaled positions."""
    import dataclasses
    import jax.numpy as jnp
    from morphablegraphs_tpu.models import retarget
    skel, _ = sk.load_bvh(WALK_BVH)
    frames = _stepping_motion(skel, n=8)
    out = retarget.retarget_frames(skel, frames, skel)
    p_src = np.asarray(sk.fk_positions(skel, jnp.asarray(frames)))
    p_dst = np.asarray(sk.fk_positions(skel, jnp.asarray(out)))
    assert np.abs(p_src - p_dst).max() < 1e-3

    renamed = dataclasses.replace(
        skel,
        node_names=tuple(n + "_t" for n in skel.node_names),
        animated_joints=tuple(n + "_t" for n in skel.animated_joints),
        offsets=np.asarray(skel.offsets) * 2.0)
    jm = {n: n + "_t" for n in skel.animated_joints}
    out2 = retarget.retarget_frames(skel, frames, renamed, jm, scale_factor=2.0)
    p2 = np.asarray(sk.fk_positions(renamed, jnp.asarray(out2)))
    assert np.abs(p_src * 2.0 - p2).max() < 1e-3

    # partial map: unmapped target joints stay at rest (identity quats)
    jm_partial = {"Hips": "Hips_t", "Spine": "Spine_t"}
    out3 = retarget.retarget_frames(skel, frames, renamed, jm_partial)
    li = renamed.animated_joints.index("LeftUpLeg_t")
    np.testing.assert_allclose(out3[:, 3 + 4 * li: 7 + 4 * li],
                               np.tile([1, 0, 0, 0], (8, 1)), atol=1e-6)

    # the reference's Rocketbox->game-engine map round-trips
    assert retarget.GAME_ENGINE_TO_ROCKETBOX_MAP["pelvis"] == "Hips"


def test_zip_load_populates_joint_weights_and_rejects_partial_pfnn(tmp_path):
    """load_graph gives the skeleton depth-attenuated pose weights when the
    package carries none, and a present-but-incomplete pfnn/ section raises
    instead of silently disabling PFNN locomotion."""
    import zipfile
    skel, _ = sk.load_bvh(TEST_BVH)
    gd = make_graph_dict()
    actions = {"walk": {
        "nodes": {mp: n["mm"] for mp, n in gd["subgraphs"]["walk"]["nodes"].items()},
        "info": gd["subgraphs"]["walk"]["info"]}}
    path = write_graph_zip(str(tmp_path / "w"), skel, actions, gd["transitions"])
    g = graph_mod.load_graph(path)
    w = g.skeleton.joint_weights
    assert len(w) == skel.n_animated and w[0] == 1.0 and min(w) < 1.0

    with zipfile.ZipFile(path, "a") as zf:  # only one of 10 pfnn binaries
        zf.writestr("pfnn/weights/W0.bin", b"\x00\x00\x80\x3f")
    import pytest
    with pytest.raises(ValueError, match="incomplete pfnn"):
        graph_mod.load_graph(path)


def test_logging_surface(tmp_path, caplog):
    """anim_utils-style logging surface (SURVEY §5): write_message_to_log /
    set_log_mode / file logging via service-config keys / clear_log."""
    import logging
    from morphablegraphs_tpu.utils import log as mglog

    mglog.set_log_mode(mglog.LOG_MODE_DEBUG)
    with caplog.at_level(logging.DEBUG, logger="morphablegraphs_tpu"):
        mglog.write_message_to_log("hello debug", mglog.LOG_MODE_DEBUG)
        mglog.write_message_to_log("hello error", mglog.LOG_MODE_ERROR)
    assert "hello debug" in caplog.text and "hello error" in caplog.text

    # INFO mode filters DEBUG records (caplog.at_level would override the
    # logger threshold, so check the threshold directly)
    mglog.set_log_mode(mglog.LOG_MODE_INFO)
    assert not mglog.logger.isEnabledFor(logging.DEBUG)
    mglog.set_log_mode(mglog.LOG_MODE_ERROR)
    assert not mglog.logger.isEnabledFor(logging.INFO)

    # service-config file logging + clear_log truncation
    log_path = str(tmp_path / "svc.log")
    mglog.configure_from_service_config(
        {"write_log": True, "log_file": log_path, "log_level": 1})
    mglog.write_message_to_log("to file")
    assert "to file" in open(log_path).read()
    mglog.clear_log()
    assert open(log_path).read() == ""
    mglog.set_log_file(None)

    # graph loading emits debug messages through the same logger
    mglog.set_log_mode(mglog.LOG_MODE_DEBUG)
    caplog.clear()
    with caplog.at_level(logging.DEBUG, logger="morphablegraphs_tpu"):
        graph_mod.build_graph_from_dict(make_graph_dict())
    assert "Load action walk" in caplog.text
    mglog.set_log_mode(mglog.LOG_MODE_INFO)


def test_jsonpath_negative_index():
    from morphablegraphs_tpu.utils import jsonpath
    data = {"points": [{"v": 1}, {"v": 2}, {"v": 3}]}
    assert jsonpath.get_value(data, "points[-1].v") == 3
    jsonpath.set_value(data, "points[-2].v", 9)
    assert data["points"][1]["v"] == 9


def test_plain_height_grid_true_heights():
    """set_height_map's bare {'height_map'} form takes TRUE world heights
    (no /255 pixel semantics, no width/depth requirement)."""
    from morphablegraphs_tpu.serve.rest import set_height_map

    class Ctx:
        class generator:
            from morphablegraphs_tpu.synthesis.grounding import SceneInterface
            scene_interface = SceneInterface()

    grid = [[0.0, 1.0], [2.0, 3.0]]
    assert set_height_map(Ctx, {"height_map": grid})
    scene = Ctx.generator.scene_interface
    assert abs(scene.get_height(0.0, 0.0) - 0.0) < 1e-9
    # bilinear midpoint of the 2x2 grid = mean of the four TRUE heights
    # (pixel /255 semantics would give 1.5/255 here)
    assert abs(scene.get_height(0.5, 0.5) - 1.5) < 1e-9


def test_hand_pose_transfer_swaps_hands():
    """A 'transfer' event SWAPS the two hands' statuses (reference
    generate_hand_poses :132-137) — the receiving hand gets the pose, the
    giving hand returns to standard."""
    from morphablegraphs_tpu.synthesis.hand_pose import HandPoseGenerator
    skel, _ = sk.load_bvh(WALK_BVH)
    gen = HandPoseGenerator(skel, smoothing_window=0)
    grip = np.array([0.0, 0.0, 1.0, 0.0], np.float32)
    gen.add_pose("pick", {"RightLeg": grip, "LeftLeg": grip})
    frames = np.zeros((30, skel.n_frame_params), np.float32)
    for j in range(skel.n_animated):
        frames[:, 3 + 4 * j] = 1.0
    events = [
        {"keyframe": 5, "event": "attach",
         "parameters": {"joint": "RightLeg"}},
        {"keyframe": 15, "event": "transfer",
         "parameters": {"joint": "LeftLeg"}},
    ]
    out = gen.generate_hand_poses(frames, events)
    r, l = skel.quat_slice("RightLeg"), skel.quat_slice("LeftLeg")
    np.testing.assert_allclose(out[10, r], grip, atol=1e-5)  # right holds
    np.testing.assert_allclose(out[10, l], [1, 0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(out[25, l], grip, atol=1e-5)  # left received
    np.testing.assert_allclose(out[25, r], [1, 0, 0, 0], atol=1e-5)
    # carry_status: a new chunk with no events keeps the left grasp
    out2 = gen.generate_hand_poses(frames, [], carry_status=True)
    np.testing.assert_allclose(out2[0, l], grip, atol=1e-5)


def test_build_state_ignore_rotation_keeps_heading():
    """ignore_rotation must SKIP rotational alignment (translation only),
    not rotate the clip to world heading zero."""
    from morphablegraphs_tpu.synthesis.state_queue import MGStateQueue
    from morphablegraphs_tpu.ops import align as align_ops
    skel, _ = sk.load_bvh(WALK_BVH)
    q = MGStateQueue(skel, 1.0 / 30, blend_window=2, buffer_size=10)
    # prev pose faces +X (90 deg about Y); new clip faces 45 deg
    prev = np.zeros(skel.n_frame_params, np.float32)
    prev[3::4] = 1.0
    half = np.deg2rad(90) / 2
    prev[3:7] = [np.cos(half), 0, np.sin(half), 0]
    frames = np.zeros((5, skel.n_frame_params), np.float32)
    frames[:, 3::4] = 1.0
    half2 = np.deg2rad(45) / 2
    frames[:, 3:7] = np.array([np.cos(half2), 0, np.sin(half2), 0])
    state = q.build_state(frames, [prev], ignore_rotation=True)
    # read past the blend window: heading must stay at the clip's own 45deg
    a_out = float(align_ops.heading_angle(jnp.asarray(state.frames[4][3:7])))
    assert abs(a_out - np.deg2rad(45)) < 1e-3, np.rad2deg(a_out)


def test_closest_point_advancing_clamp():
    """closest_point never returns an arc below min_arc_length, even when
    the true closest point lies just behind it."""
    from morphablegraphs_tpu.ops import spline_path
    sp = spline_path.build(np.array([[0.0, 0, 0], [100.0, 0, 0]], np.float32))
    # query point near arc 50; min_arc ahead of it
    pos, arc, d = spline_path.closest_point(sp, jnp.asarray([50.0, 0, 0.0]),
                                            min_arc_length=60.0)
    assert float(arc) >= 60.0 - 1e-4, float(arc)
    np.testing.assert_allclose(np.asarray(pos)[0], 60.0, atol=1.5)


def test_height_map_far_edge_interpolates():
    """Queries on the terrain's far edge interpolate from the last cell
    instead of snapping to default_height."""
    hm = HeightMapInterface(np.array([[0.0, 1.0], [2.0, 3.0]]), scale=1.0)
    assert abs(hm.get_height(1.0, 1.0) - 3.0) < 1e-9
    assert abs(hm.get_height(1.0, 0.0) - 1.0) < 1e-9
    assert hm.get_height(1.01, 1.0) == 0.0  # beyond the edge -> default


def test_static_model_short_clip():
    """Clips shorter than the default n_basis still fit (n_basis clamps to
    the clip length); clips below the cubic-spline minimum (4 frames, same
    as scipy splrep k=3) raise a clear error."""
    with pytest.raises(ValueError):
        make_static_model_json(np.ones((2, 7), np.float32))
    frames = np.tile(np.linspace(0, 1, 10)[:, None], (1, 7)).astype(np.float32)
    data = make_static_model_json(frames, n_basis=16, name="short")
    prim = prim_mod.load_primitive_json(data)
    f, n, _ = prim_mod.sample_frames(jax.random.PRNGKey(0), prim,
                                     max_frames=32)
    assert int(n) == 10
    assert np.max(np.abs(np.asarray(f)[: int(n)] - frames)) < 0.05


def test_analyzer_single_frame_lengths():
    """Every feature curve has length T even for a single-frame motion."""
    from morphablegraphs_tpu.construct.motion_analysis import BVHAnalyzer
    skel, _ = sk.load_bvh(WALK_BVH)
    frame = np.zeros((1, skel.n_frame_params), np.float32)
    frame[:, 3::4] = 1.0
    an = BVHAnalyzer(skel, frame)
    fv = an.feature_vector()
    for k, v in fv.items():
        assert len(v) == 1, (k, len(v))
