"""IK / grounding / export tests (reference post-processing surface,
motion_generator.py:281-352 + annotated_motion_vector.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.ops import ik as ik_ops
from morphablegraphs_tpu.serve.export import AnnotatedMotion, KeyframeEvent
from morphablegraphs_tpu.synthesis import grounding, postprocess

from fixtures import WALK_BVH


@pytest.fixture(scope="module")
def skel():
    s, _ = sk.load_bvh(WALK_BVH)
    return s


def _rest_frame(skel):
    f = np.zeros(skel.n_frame_params, np.float32)
    f[:3] = [0, 90, 0]
    for j in range(skel.n_animated):
        f[3 + 4 * j] = 1.0
    return f


def test_solve_ik_reaches_target(skel):
    frame = _rest_frame(skel)
    foot_idx = skel.index_of("LeftFoot")
    pos = np.asarray(sk.fk_positions(skel, jnp.asarray(frame)))
    start = pos[foot_idx]
    target = start + np.array([5.0, 10.0, 5.0], np.float32)

    nodes = np.zeros(ik_ops.MAX_IK_CONSTRAINTS, np.int32)
    targets = np.zeros((ik_ops.MAX_IK_CONSTRAINTS, 3), np.float32)
    mask = np.zeros(ik_ops.MAX_IK_CONSTRAINTS, np.float32)
    nodes[0] = foot_idx
    targets[0] = target
    mask[0] = 1.0
    joint_mask = np.ones(skel.n_animated, np.float32)
    joint_mask[0] = 0.0  # root fixed
    out = np.asarray(ik_ops.solve_ik(skel, jnp.asarray(frame),
                                     jnp.asarray(nodes), jnp.asarray(targets),
                                     jnp.asarray(mask), jnp.asarray(joint_mask),
                                     n_iters=15))
    new_pos = np.asarray(sk.fk_positions(skel, jnp.asarray(out)))[foot_idx]
    err = np.linalg.norm(new_pos - target)
    assert err < 1.0, err
    # root untouched
    np.testing.assert_allclose(out[:3], frame[:3], atol=1e-5)
    np.testing.assert_allclose(out[3:7], frame[3:7], atol=1e-5)


def test_ccd_reaches_target(skel):
    frame = _rest_frame(skel)
    foot_node = skel.index_of("RightFoot")
    chain = (skel.animated_index_of("RightLeg"), skel.animated_index_of("RightUpLeg"))
    pos = np.asarray(sk.fk_positions(skel, jnp.asarray(frame)))
    target = pos[foot_node] + np.array([8.0, 15.0, 0.0], np.float32)
    out = np.asarray(ik_ops.run_ccd(skel, chain, foot_node, jnp.asarray(frame),
                                    jnp.asarray(target), n_iters=30))
    new_pos = np.asarray(sk.fk_positions(skel, jnp.asarray(out)))[foot_node]
    assert np.linalg.norm(new_pos - target) < 0.5


def test_look_at(skel):
    frame = _rest_frame(skel)
    head_idx = skel.animated_index_of("Head")
    target = jnp.asarray([50.0, 135.0, 50.0])
    out = ik_ops.look_at(skel, head_idx, jnp.asarray(frame), target)
    pos, ori = sk.fk_global(skel, out)
    node = skel.index_of("Head")
    from morphablegraphs_tpu.ops import quat as quat_ops
    gaze = np.asarray(quat_ops.rotate_vec(ori[node], jnp.asarray([0.0, 0, 1.0])))
    want = np.asarray(target) - np.asarray(pos[node])
    want /= np.linalg.norm(want)
    assert np.dot(gaze, want) > 0.99


def test_move_to_ground(skel):
    frames = np.tile(_rest_frame(skel), (20, 1))
    frames[:, 1] += 25.0  # float above ground
    out = grounding.move_to_ground(skel, frames)
    pos = np.asarray(sk.fk_positions(skel, jnp.asarray(out[0])))
    feet_y = min(pos[skel.index_of("LeftFoot")][1], pos[skel.index_of("RightFoot")][1])
    assert abs(feet_y) < 0.1


def test_ground_step_touches_ground(skel):
    frames = np.tile(_rest_frame(skel), (30, 1))
    # hips BVH offset is (0, 90, 0) and feet hang 85 below the hips, so a
    # root channel of y = -8 puts the feet 3 units below the ground
    frames[:, :3] = [0, -8.0, 0]
    ground = grounding.SceneInterface(constant_height=0.0)
    pos_before = np.asarray(sk.fk_positions(skel, jnp.asarray(frames[0])))
    y_before = pos_before[skel.index_of("RightFoot")][1]
    assert y_before < 0  # sanity: penetrating
    out = grounding.ground_step(skel, frames, "leftStance", 0, 29, ground)
    pos0 = np.asarray(sk.fk_positions(skel, jnp.asarray(out[0])))
    # start stance foot (right) pulled to the ground at the first frame
    assert abs(pos0[skel.index_of("RightFoot")][1]) < 1.0


def test_apply_ik_constraints_blending(skel):
    frames = np.tile(_rest_frame(skel), (60, 1))
    pos = np.asarray(sk.fk_positions(skel, jnp.asarray(frames[30])))
    target = pos[skel.index_of("LeftFoot")] + np.array([4.0, 8.0, 0.0])
    c = postprocess.IKConstraint(frame_idx=30, joint="LeftFoot", position=target)
    out = postprocess.apply_ik_constraints(skel, frames, [c],
                                           interpolation_window=20)
    new_pos = np.asarray(sk.fk_positions(skel, jnp.asarray(out[30])))
    assert np.linalg.norm(new_pos[skel.index_of("LeftFoot")] - target) < 1.5
    # far frames untouched
    np.testing.assert_allclose(out[0], frames[0], atol=1e-5)
    np.testing.assert_allclose(out[59], frames[59], atol=1e-5)


def test_unity_export(skel):
    frames = np.tile(_rest_frame(skel), (4, 1))
    motion = AnnotatedMotion(skel, frames,
                             action_ranges=[("walk", 0, 4)],
                             events=[KeyframeEvent(2, "attach",
                                                   {"joint": "RightHand",
                                                    "target": "box"})])
    unity = motion.to_unity_format()
    assert len(unity["frames"]) == 4
    f0 = unity["frames"][0]
    assert f0["rootTranslation"] == {"x": -0.0, "y": 90.0, "z": 0.0}
    assert len(f0["rotations"]) == len([n for n in skel.node_names
                                        if not n.endswith("_EndSite")])
    # handedness: w negated
    assert f0["rotations"][0]["w"] == -1.0
    assert unity["events"][0]["keyframe"] == 2
    ann = motion.frame_annotation()
    assert ann["elementaryActionSequence"][0]["elementaryAction"] == "walk"


def test_export_files(skel, tmp_path):
    frames = np.tile(_rest_frame(skel), (3, 1))
    motion = AnnotatedMotion(skel, frames, action_ranges=[("walk", 0, 3)])
    prefix = str(tmp_path / "out")
    motion.export(prefix)
    import os, json
    assert os.path.exists(prefix + ".bvh")
    ann = json.load(open(prefix + "_annotations.json"))
    assert "elementaryActionSequence" in ann
    acts = json.load(open(prefix + "_actions.json"))
    assert "events" in acts


def test_solve_ik_leaves_null_space_joints_untouched():
    """Joints that cannot affect any constraint must come back unrotated
    (the singularity-escape init must not leak a ~2 degree distortion)."""
    from morphablegraphs_tpu.ops import ik
    from morphablegraphs_tpu.ops import quat as quat_ops
    skel, _ = sk.load_bvh(WALK_BVH)
    frame = np.zeros(skel.n_frame_params, np.float32)
    frame[1] = 10.0
    for j in range(skel.n_animated):
        frame[3 + 4 * j] = 1.0
    # constrain the LEFT foot; RIGHT-leg joints have zero jacobian columns
    target_node = skel.index_of("LeftFoot")
    cur = np.asarray(sk.fk_positions(skel, jnp.asarray(frame)))[target_node]
    out = ik.solve_ik(skel, jnp.asarray(frame),
                      jnp.asarray([target_node], jnp.int32),
                      jnp.asarray([cur + np.array([2.0, 0, 0])], jnp.float32),
                      jnp.asarray([1.0]), n_iters=10)
    out = np.asarray(out)
    for joint in ("RightUpLeg", "RightLeg"):
        slq = skel.quat_slice(joint)
        q = out[slq] / np.linalg.norm(out[slq])
        angle = 2 * np.arccos(min(abs(q[0]), 1.0))
        assert np.degrees(angle) < 0.2, (joint, np.degrees(angle))


def test_ground_stance_swing_pins_stance_foot(skel):
    """Per-frame stance pin (reference ground_initial_stance_foot): the
    stance foot must stay at its first-frame position through the step
    instead of sliding with a drifting root."""
    frames = np.tile(_rest_frame(skel), (20, 1))
    # root drifts 10 units in x over the step -> without pinning the stance
    # foot skates with it
    frames[:, 0] = np.linspace(0.0, 10.0, 20)
    pos0 = np.asarray(sk.fk_positions(skel, jnp.asarray(frames[0])))
    ground_h = float(pos0[skel.index_of("RightFoot")][1])
    cfg = grounding.MP_CONFIGURATIONS["leftStance"]  # stance foot = right
    out = grounding.ground_stance_swing(skel, frames, cfg, 0, 19, ground_h)
    pos_all = np.asarray(sk.fk_positions(skel, jnp.asarray(out)))
    stance_x = pos_all[:, skel.index_of("RightFoot"), 0]
    before = np.asarray(sk.fk_positions(skel, jnp.asarray(frames)))
    skate_before = float(np.ptp(before[:, skel.index_of("RightFoot"), 0]))
    skate_after = float(np.ptp(stance_x))
    assert skate_before > 8.0  # sanity: foot skated with the root
    # DLS-IK with leg-only joints can't fully cancel root translation, but
    # the skate must be strongly reduced
    assert skate_after < 0.5 * skate_before, (skate_before, skate_after)


def test_ground_step_on_slope_uses_per_anchor_heights(skel):
    """End-anchor grounding samples the terrain at the END position — on a
    slope the end stance foot lands at the end height, not the start's."""
    frames = np.tile(_rest_frame(skel), (30, 1))
    frames[:, 0] = np.linspace(0.0, 50.0, 30)  # walk 50 units in x
    # keep the body roughly tracking the slope so the anchors only
    # fine-tune (feet hang ~85 below the hips offset of 90 -> root channel
    # y = -8 puts feet ~ -3; add the local slope height)
    frames[:, 1] = -8.0 + 0.2 * frames[:, 0]
    slope = grounding.SceneInterface(height_fn=lambda x, z: 0.2 * x)
    # endRightStance: stance_mode 'none' -> anchors only (the stance pin is
    # exercised separately above; this synthetic 50-unit stride would make
    # a whole-step pin unreachable for leg-only IK)
    out = grounding.ground_step(skel, frames, "endRightStance", 0, 29, slope)
    pos_end = np.asarray(sk.fk_positions(skel, jnp.asarray(out[29])))
    # end anchors ground BOTH feet near the slope height at x=50 (10 units)
    end_y = pos_end[skel.index_of("LeftFoot")][1]
    assert abs(end_y - 0.2 * 50.0) < 3.0, end_y


# -- joint-limit clamp (reference MotionEditing.apply_joint_constraints,
#    mg_state_planner.py:814, limit specs :262-266) ------------------------

def _np_quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def _np_axis_quat(axis, deg):
    half = np.deg2rad(deg) * 0.5
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(half)], np.sin(half) * axis])


def _limit_frame(skel, joint, q):
    f = _rest_frame(skel)
    f[skel.quat_slice(joint)] = q
    return f


def _twist_angle_deg(q, axis):
    q = np.asarray(q, np.float64)
    if q[0] < 0:
        q = -q
    p = float(np.dot(q[1:], axis))
    return np.rad2deg(2.0 * np.arctan2(p, q[0]))


def test_apply_joint_limits_in_range_untouched(skel):
    from morphablegraphs_tpu.models import skeleton_models as sm

    axes, mins, maxs, mask = sm.build_limit_table(skel)
    frame = _limit_frame(skel, "Head", _np_axis_quat((0, 1, 0), 45.0))
    out = np.asarray(ik_ops.apply_joint_limits(
        jnp.asarray(frame), jnp.asarray(axes), jnp.asarray(mins),
        jnp.asarray(maxs), jnp.asarray(mask)))
    np.testing.assert_allclose(out, frame, atol=0)  # bit-exact passthrough


def test_apply_joint_limits_clamps_pure_twist(skel):
    from morphablegraphs_tpu.models import skeleton_models as sm

    axes, mins, maxs, mask = sm.build_limit_table(skel)
    frame = _limit_frame(skel, "Head", _np_axis_quat((0, 1, 0), 120.0))
    out = np.asarray(ik_ops.apply_joint_limits(
        jnp.asarray(frame), jnp.asarray(axes), jnp.asarray(mins),
        jnp.asarray(maxs), jnp.asarray(mask)))
    got = out[skel.quat_slice("Head")]
    assert abs(_twist_angle_deg(got, np.array([0, 1, 0.0])) - 80.0) < 1e-3
    # other joints untouched
    other = np.ones(len(frame), bool)
    other[skel.quat_slice("Head")] = False
    np.testing.assert_allclose(out[other], frame[other], atol=0)


def test_apply_joint_limits_preserves_swing(skel):
    from morphablegraphs_tpu.models import skeleton_models as sm

    axes, mins, maxs, mask = sm.build_limit_table(skel)
    swing = _np_axis_quat((1, 0, 0), 30.0)  # perpendicular to the y limit axis
    twist = _np_axis_quat((0, 1, 0), -120.0)
    frame = _limit_frame(skel, "Head", _np_quat_mul(swing, twist))
    out = np.asarray(ik_ops.apply_joint_limits(
        jnp.asarray(frame), jnp.asarray(axes), jnp.asarray(mins),
        jnp.asarray(maxs), jnp.asarray(mask)))
    want = _np_quat_mul(swing, _np_axis_quat((0, 1, 0), -80.0))
    got = out[skel.quat_slice("Head")]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_apply_joint_limits_double_cover(skel):
    """q and -q are the same rotation and must clamp to the same result."""
    from morphablegraphs_tpu.models import skeleton_models as sm

    axes, mins, maxs, mask = sm.build_limit_table(skel)
    q = _np_quat_mul(_np_axis_quat((1, 0, 0), 20.0),
                     _np_axis_quat((0, 1, 0), 150.0))
    f_pos = _limit_frame(skel, "Head", q)
    f_neg = _limit_frame(skel, "Head", -q)
    args = (jnp.asarray(axes), jnp.asarray(mins), jnp.asarray(maxs),
            jnp.asarray(mask))
    out_pos = np.asarray(ik_ops.apply_joint_limits(jnp.asarray(f_pos), *args))
    out_neg = np.asarray(ik_ops.apply_joint_limits(jnp.asarray(f_neg), *args))
    sl = skel.quat_slice("Head")
    np.testing.assert_allclose(out_pos[sl], out_neg[sl], atol=1e-5)
    assert abs(_twist_angle_deg(out_pos[sl], np.array([0, 1, 0.0])) - 80.0) < 1e-3


def test_apply_joint_limits_batched_frames(skel):
    from morphablegraphs_tpu.models import skeleton_models as sm

    axes, mins, maxs, mask = sm.build_limit_table(skel)
    frames = np.stack([
        _limit_frame(skel, "Head", _np_axis_quat((0, 1, 0), d))
        for d in (-120.0, 0.0, 60.0, 170.0)])
    out = np.asarray(ik_ops.apply_joint_limits(
        jnp.asarray(frames), jnp.asarray(axes), jnp.asarray(mins),
        jnp.asarray(maxs), jnp.asarray(mask)))
    sl = skel.quat_slice("Head")
    got = [_twist_angle_deg(q, np.array([0, 1, 0.0])) for q in out[:, sl]]
    np.testing.assert_allclose(got, [-80.0, 0.0, 60.0, 80.0], atol=1e-3)
    # root channels pass through
    np.testing.assert_allclose(out[:, :3], frames[:, :3], atol=0)


# ---------------------------------------------------------------------------
# IK orientation constraints (inverse_kinematics_settings
# "optimize_orientation" + "constrain_place_orientation", reference
# graph_walk.py:41,:104,:224 + IKConstraintsBuilder constrain_orientation)
# ---------------------------------------------------------------------------

def _np_axis_quat_deg(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    h = np.radians(deg) / 2.0
    return np.concatenate([[np.cos(h)], np.sin(h) * axis])


def test_set_global_orientation_matches_target(skel):
    frame = _rest_frame(skel)
    target = _np_axis_quat_deg((0, 1, 0), 40.0)
    edited = postprocess._set_global_orientation(skel, frame, "Head", target)
    from morphablegraphs_tpu.models.skeleton import fk_global
    _, ori = fk_global(skel, jnp.asarray(edited, jnp.float32))
    got = np.asarray(ori[skel.index_of("Head")], np.float64)
    got /= np.linalg.norm(got)
    dot = abs(np.dot(got, target))
    assert dot > 1.0 - 1e-5, (got, target)
    # only the Head quat channels changed
    sl = skel.quat_slice("Head")
    mask = np.ones(len(frame), bool)
    mask[sl] = False
    np.testing.assert_allclose(edited[mask], frame[mask], atol=0)


def test_apply_ik_orientation_gated(skel):
    frames = np.stack([_rest_frame(skel)] * 5)
    target_q = _np_axis_quat_deg((0, 1, 0), 35.0)
    from morphablegraphs_tpu.models.skeleton import fk_global, fk_positions
    cur = np.asarray(fk_positions(skel, jnp.asarray(frames[2], jnp.float32)))
    c = postprocess.IKConstraint(
        frame_idx=2, joint="Head",
        position=cur[skel.index_of("Head")].astype(np.float64),
        orientation=target_q)
    out_on = postprocess.apply_ik_constraints(
        skel, frames, [c], interpolation_window=0, n_iters=2,
        optimize_orientation=True)
    out_off = postprocess.apply_ik_constraints(
        skel, frames, [c], interpolation_window=0, n_iters=2,
        optimize_orientation=False)
    _, ori_on = fk_global(skel, jnp.asarray(out_on[2], jnp.float32))
    q_on = np.asarray(ori_on[skel.index_of("Head")], np.float64)
    q_on /= np.linalg.norm(q_on)
    assert abs(np.dot(q_on, target_q)) > 1.0 - 1e-4
    _, ori_off = fk_global(skel, jnp.asarray(out_off[2], jnp.float32))
    q_off = np.asarray(ori_off[skel.index_of("Head")], np.float64)
    q_off /= np.linalg.norm(q_off)
    assert abs(np.dot(q_off, target_q)) < 1.0 - 1e-3  # gate respected


def test_place_orientation_gate():
    import types
    prim = types.SimpleNamespace(n_canonical_frames=11)
    graph = types.SimpleNamespace(
        nodes={("placeRight", "reach"): types.SimpleNamespace(primitive=prim)})
    step = types.SimpleNamespace(node_key=("placeRight", "reach"),
                                 start_frame=0, end_frame=10,
                                 action_name="placeRight")
    q = tuple(_np_axis_quat_deg((0, 1, 0), 20.0))
    specs = {0: [("RightHand", np.zeros(3), 5, np.asarray(q))]}
    # place action + flag off -> orientation dropped
    out = postprocess.create_ik_constraints(
        graph, [step], specs, constrain_place_orientation=False)
    assert out[0].orientation is None
    # flag on -> orientation kept
    out = postprocess.create_ik_constraints(
        graph, [step], specs, constrain_place_orientation=True)
    np.testing.assert_allclose(out[0].orientation, q)
    # non-place action keeps orientation regardless of the flag
    step.action_name = "pickRight"
    out = postprocess.create_ik_constraints(
        graph, [step], specs, constrain_place_orientation=False)
    np.testing.assert_allclose(out[0].orientation, q)


# ---------------------------------------------------------------------------
# Footplant constraint generation (motion_grounding_settings keys, reference
# FootplantConstraintGenerator via motion_generator.py:321-340)
# ---------------------------------------------------------------------------

def _plant_motion(skel, n=60):
    """Synthetic walk: the skeleton stands still for frames 10-35 (feet on
    the ground) and rises/strides elsewhere, so contact detection has one
    clean plant run per foot."""
    frames = np.tile(_rest_frame(skel), (n, 1))
    # feet rest exactly on y=0 when the root is at 85 (WALK_BVH leg length)
    pos = np.asarray(sk.fk_positions(skel, jnp.asarray(frames[0])))
    foot_y = pos[skel.index_of("LeftFoot")][1]
    frames[:, 1] = 90.0 - foot_y  # shift the root so the feet touch y=0
    for i in range(n):
        if i < 10 or i > 35:
            frames[i, 1] += 8.0 + 0.5 * i  # airborne + moving
            frames[i, 0] += 0.8 * i
    return frames


def test_detect_ground_contacts_finds_plant_run(skel):
    frames = _plant_motion(skel)
    contacts = grounding.detect_ground_contacts(
        skel, frames, {"contact_tolerance": 1.0, "foot_lift_tolerance": 3.0,
                       "foot_lift_search_window": 5,
                       "smoothing_constraints_window": 3})
    assert "LeftFoot" in contacts and "RightFoot" in contacts
    bv = contacts["LeftFoot"]
    assert bv[20] == 1 and bv[22] == 1  # mid-plant is contact
    assert bv[2] == 0 and bv[-2] == 0   # airborne frames are not


def test_footplant_constraints_pin_the_foot(skel):
    frames = _plant_motion(skel)
    settings = {"generate_foot_plant_constraints": True,
                "contact_tolerance": 1.0, "foot_lift_tolerance": 3.0,
                "foot_lift_search_window": 5,
                "smoothing_constraints_window": 3,
                "constraint_range": 4, "activate_blending": True}
    cs, blends, contacts = grounding.generate_foot_plant_constraints(
        skel, frames, settings)
    assert cs, "no constraints detected"
    joints = {c[0] for c in cs}
    assert "LeftFoot" in joints
    # jitter the plant frames a little so the pin has work to do
    noisy = frames.copy()
    noisy[15:30, 0] += np.linspace(0, 2.0, 15)
    out = grounding.apply_grounding_constraints(
        skel, noisy, cs, activate_blending=True, constraint_range=4)
    # foot positions during a run are now constant (skate removed)
    joint, s0, e0, anchor = next(c for c in cs if c[0] == "LeftFoot")
    pos = np.asarray(sk.fk_positions(
        skel, jnp.asarray(out[s0:e0 + 1], jnp.float32)))
    foot = pos[:, skel.index_of("LeftFoot")]
    drift = np.max(np.linalg.norm(foot - foot[0], axis=-1))
    pos_before = np.asarray(sk.fk_positions(
        skel, jnp.asarray(noisy[s0:e0 + 1], jnp.float32)))
    drift_before = np.max(np.linalg.norm(
        pos_before[:, skel.index_of("LeftFoot")]
        - pos_before[0, skel.index_of("LeftFoot")], axis=-1))
    assert drift < drift_before * 0.5, (drift, drift_before)


def test_ground_motion_footplant_path(skel):
    import types
    frames = _plant_motion(skel)
    steps = [types.SimpleNamespace(node_key=("walk", "leftStance"),
                                   start_frame=0, end_frame=len(frames) - 1)]
    settings = {"generate_foot_plant_constraints": True,
                "contact_tolerance": 1.0, "foot_lift_tolerance": 3.0,
                "foot_lift_search_window": 5,
                "smoothing_constraints_window": 3,
                "constraint_range": 4, "graph_walk_grounding_window": 4,
                "activate_blending": True}
    out = grounding.ground_motion(skel, frames, steps,
                                  grounding.SceneInterface(), settings)
    assert out.shape == frames.shape
    assert not np.isnan(out).any()
    # the flag off falls back to the stance-table path and still works
    out2 = grounding.ground_motion(skel, frames, steps,
                                   grounding.SceneInterface(),
                                   {"generate_foot_plant_constraints": False})
    assert out2.shape == frames.shape
