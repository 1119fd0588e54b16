"""Constraint system tests: input parsing (example_input.json), compiled
evaluation semantics, generator best-of-N + LM refinement."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.constraints import compiled, input_reader
from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import primitive as prim_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.ops import spline_path
from morphablegraphs_tpu.synthesis import generator

from fixtures import TEST_BVH, make_graph_dict

EXAMPLE_INPUT = "/root/reference/examples/example_input.json"


# ---------------------------------------------------------------------------
# input reader
# ---------------------------------------------------------------------------

def test_parse_example_input():
    with open(EXAMPLE_INPUT) as f:
        data = json.load(f)
    parsed = input_reader.read_input(data, activate_coordinate_transform=True)
    assert [a.name for a in parsed.actions] == ["walk", "pickRight", "carryRight", "placeRight"]
    walk = parsed.actions[0]
    assert len(walk.trajectories) == 1
    traj = walk.trajectories[0]
    assert traj.joint == "Hips"
    # CAD -> OpenGL: null z becomes unconstrained height (dim 1)
    assert traj.unconstrained_dims == (1,)
    assert traj.control_points.shape[0] == 6
    # first control point: [530.1, 268.8, null] -> [530.1, 0, -268.8]
    np.testing.assert_allclose(traj.control_points[0],
                               [530.11029052734, 0.0, -268.851318359375],
                               atol=1e-3)
    pick = parsed.actions[1]
    assert len(pick.keyframe_constraints) == 1
    kc = pick.keyframe_constraints[0]
    assert kc.joint == "RightHand"
    assert kc.keyframe_label == "start_contact"
    assert not np.any(np.isnan(kc.position))
    assert "start_contact" in pick.annotations
    # start pose
    np.testing.assert_allclose(parsed.start_pose_position,
                               [530.11029052734, 0.0, -268.851318359375], atol=1e-3)


def test_parse_without_transform():
    with open(EXAMPLE_INPUT) as f:
        data = json.load(f)
    parsed = input_reader.read_input(data, activate_coordinate_transform=False)
    traj = parsed.actions[0].trajectories[0]
    assert traj.unconstrained_dims == (2,)
    np.testing.assert_allclose(traj.control_points[0], [530.11029052734, 268.851318359375, 0.0], atol=1e-3)


def test_parse_tasks_variant():
    with open(EXAMPLE_INPUT) as f:
        data = json.load(f)
    wrapped = {"startPose": data["startPose"],
               "tasks": [{"elementaryActions": data["elementaryActions"]}]}
    parsed = input_reader.read_input(wrapped)
    assert len(parsed.actions) == 4


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        input_reader.read_input({"foo": 1})


# ---------------------------------------------------------------------------
# compiled constraint evaluation
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    graph = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    graph.skeleton = skel
    prim = graph.nodes[("walk", "leftStance")].primitive
    return graph, skel, prim


def test_keyframe_position_constraint_error(setup):
    graph, skel, prim = setup
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    s = np.zeros(prim.n_latent, np.float32)
    # evaluate where the hips actually end up with the mean motion, then
    # constrain exactly there -> error 0
    coeffs = np.asarray(compiled.aligned_coeffs(prim, jnp.asarray(s), sc))
    from morphablegraphs_tpu.ops import bspline
    end_frame = np.asarray(bspline.evaluate(
        jnp.asarray(coeffs), prim.knots_s,
        jnp.asarray([float(prim.n_canonical_frames - 1)])))[0]
    hips_pos = np.asarray(sk.fk_positions(skel, jnp.asarray(end_frame)))[skel.index_of("Hips")]

    sc2 = compiled.set_keyframe_constraint(sc, 0, skel, "Hips",
                                           prim.n_canonical_frames - 1,
                                           position=hips_pos)
    err = float(compiled.evaluate_error(skel, prim, sc2, jnp.asarray(s)))
    assert err < 1e-2
    # offset target by 5 in x -> error ~5
    sc3 = compiled.set_keyframe_constraint(sc, 0, skel, "Hips",
                                           prim.n_canonical_frames - 1,
                                           position=hips_pos + np.array([5.0, 0, 0]))
    err3 = float(compiled.evaluate_error(skel, prim, sc3, jnp.asarray(s)))
    assert abs(err3 - 5.0) < 0.1


def test_nan_components_masked(setup):
    graph, skel, prim = setup
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    s = np.zeros(prim.n_latent, np.float32)
    target = np.array([0.0, np.nan, 0.0])  # y unconstrained
    sc = compiled.set_keyframe_constraint(sc, 0, skel, "Hips", 0, position=target)
    err = float(compiled.evaluate_error(skel, prim, sc, jnp.asarray(s)))
    # y offset (~90 hips height + 90 offset) must NOT appear in the error
    coeffs = np.asarray(compiled.aligned_coeffs(prim, jnp.asarray(s), sc))
    frame0 = coeffs[0]
    hips = np.asarray(sk.fk_positions(skel, jnp.asarray(frame0)))[skel.index_of("Hips")]
    expected = np.sqrt(hips[0] ** 2 + hips[2] ** 2)
    assert abs(err - expected) < 0.5


def test_direction_constraint_degrees(setup):
    graph, skel, prim = setup
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    s = jnp.zeros(prim.n_latent)
    coeffs = np.asarray(compiled.aligned_coeffs(prim, s, sc))
    from morphablegraphs_tpu.ops import quat as quat_ops
    heading = np.asarray(quat_ops.rotate_vec(
        jnp.asarray(coeffs[-1][3:7] / np.linalg.norm(coeffs[-1][3:7])),
        jnp.asarray([0.0, 0.0, 1.0])))
    dir_now = np.array([heading[0], heading[2]])
    dir_now /= np.linalg.norm(dir_now)
    sc_same = compiled.set_direction_constraint(sc, dir_now, prim.n_canonical_frames - 1)
    err_same = float(compiled.evaluate_error(skel, prim, sc_same, s))
    assert err_same < 1.0  # < 1 degree
    # rotate target by 90 degrees -> ~90 deg error (x0.8 default weight n/a here)
    dir_rot = np.array([dir_now[1], -dir_now[0]])
    sc_rot = compiled.set_direction_constraint(sc, dir_rot, prim.n_canonical_frames - 1)
    err_rot = float(compiled.evaluate_error(skel, prim, sc_rot, s))
    assert abs(err_rot - 90.0) < 2.0


def test_alignment_in_evaluation(setup):
    """With prev frames set, the candidate is evaluated as if aligned."""
    graph, skel, prim = setup
    s = jnp.zeros(prim.n_latent)
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    prev_last = np.zeros(skel.n_frame_params, np.float32)
    prev_last[:3] = [50.0, 90.0, -20.0]
    prev_last[3:7] = [1, 0, 0, 0]
    for j in range(1, skel.n_animated):
        prev_last[3 + 4 * j] = 1.0
    sc = compiled.set_alignment_from_prev(sc, prev_last)
    coeffs = np.asarray(compiled.aligned_coeffs(prim, s, sc))
    # first coefficient row's root position must coincide with prev in XZ
    assert abs(coeffs[0][0] - 50.0) < 1e-3
    assert abs(coeffs[0][2] - (-20.0)) < 1e-3


def test_trajectory_constraint_monotone(setup):
    graph, skel, prim = setup
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    s = jnp.zeros(prim.n_latent)
    # trajectory roughly along the mean motion root path
    coeffs = np.asarray(compiled.aligned_coeffs(prim, s, sc))
    root_pts = coeffs[:, :3].copy()
    root_pts[:, 1] = 0.0
    traj = spline_path.build(root_pts[:: max(1, len(root_pts) // 6)][:6],
                             unconstrained_dims=(1,))
    sc = compiled.set_trajectory_constraint(sc, skel, traj, "Hips")
    err = float(compiled.evaluate_error(skel, prim, sc, s))
    assert np.isfinite(err)
    assert err < 50.0  # following its own root path loosely


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

def test_best_of_n_beats_single_sample(setup):
    graph, skel, prim = setup
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    target = np.array([10.0, np.nan, 30.0])
    sc = compiled.set_keyframe_constraint(sc, 0, skel, "Hips",
                                          prim.n_canonical_frames - 1,
                                          position=target)
    key = jax.random.PRNGKey(0)
    s1, e1 = generator.best_of_n(skel, key, prim, sc, n_samples=1)
    s100, e100 = generator.best_of_n(skel, key, prim, sc, n_samples=100)
    assert float(e100) <= float(e1)


def test_lm_refinement_reduces_error(setup):
    graph, skel, prim = setup
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    target = np.array([10.0, np.nan, 25.0])
    sc = compiled.set_keyframe_constraint(sc, 0, skel, "Hips",
                                          prim.n_canonical_frames - 1,
                                          position=target)
    key = jax.random.PRNGKey(1)
    s0, e0 = generator.best_of_n(skel, key, prim, sc, n_samples=10)
    s_opt, e_opt = generator.refine_lm(skel, prim, sc, s0, n_iters=10,
                                       quality_scale=0.001)
    assert float(e_opt) < float(e0) * 1.001
    assert float(e_opt) < 2.0, float(e_opt)  # near-exact reach
    # with zero naturalness the constraint is met almost exactly
    _, e_exact = generator.refine_lm(skel, prim, sc, s0, n_iters=30,
                                     quality_scale=0.0)
    assert float(e_exact) < 0.05, float(e_exact)


def test_pose_constraint_joint_weights(setup):
    """Pose residual uses per-joint weights (reference create_pose_constraint
    pulls skeleton.joint_weight_map): zeroing the weight of the joint that
    moved removes its contribution from the error."""
    graph, skel, prim = setup
    s = np.zeros(prim.n_latent, np.float32)
    frames, n, _ = prim_mod.back_project(prim, jnp.asarray(s),
                                         prim.n_canonical_frames)
    base = np.asarray(frames)[0]
    target = base.copy()
    # rotate a mid-chain joint 90 deg -> only its descendants move
    half = np.deg2rad(90) / 2
    target[7:11] = [np.cos(half), np.sin(half), 0.0, 0.0]
    moved = np.linalg.norm(
        np.asarray(sk.fk_positions(skel, jnp.asarray(target)))
        - np.asarray(sk.fk_positions(skel, jnp.asarray(base))), axis=-1) > 1e-3
    assert moved.any() and not moved.all()

    def err_with(weights):
        sc = compiled.set_pose_constraint(
            compiled.empty_step_constraints(skel, prim.n_canonical_frames),
            skel, target, joint_weights=weights)
        sc = compiled.set_alignment_from_start_pose(sc, np.zeros(3), 0.0)
        return float(compiled.evaluate_error(skel, prim, sc, jnp.asarray(s)))

    err_uniform = err_with(None)
    # zero out exactly the moved joints -> their displacement stops counting
    err_w = err_with(np.where(moved, 0.0, 1.0))
    assert err_uniform > 0.5
    assert err_w < 0.1 * err_uniform


def test_deferred_locomotion_fill_matches_eager_build(setup):
    """The on-device locomotion fill (LocoSpec + fill_locomotion_slots) must
    produce the same constraint set as the eager host build — the eager
    branch stays the public default of build_step_constraints, so the two
    encodings of locomotion_constraints_builder semantics are pinned
    together here."""
    from morphablegraphs_tpu.synthesis import action_builder
    from morphablegraphs_tpu.ops import spline_path
    from morphablegraphs_tpu.utils.config import default_config

    graph, skel, prim = setup
    cfg = default_config()
    cfg["trajectory_following_settings"]["generate_half_step_constraint"] = True
    acs = action_builder.ActionConstraintSet(action_name="walk")
    acs.root_trajectory = spline_path.build(
        np.array([[0.0, 0, 0], [10.0, 0, 40], [0.0, 0, 80]]),
        max_points=compiled.spline_path_max_points(),
        unconstrained_dims=(1,))
    acs.root_unconstrained_dims = (1,)

    node_key = ("walk", "leftStance")
    eager = action_builder.build_step_constraints(
        graph, acs, node_key, 12.0, None, False, cfg)
    sc, loco, flags = action_builder.build_step_constraints(
        graph, acs, node_key, 12.0, None, False, cfg, defer_locomotion=True)
    filled = jax.jit(compiled.fill_locomotion_slots,
                     static_argnames=("use_pos", "use_dir", "use_half"))(
        sc, acs.root_trajectory, loco,
        use_pos=flags[0], use_dir=flags[1], use_half=flags[2])
    for field in ("kf_active", "kf_node", "kf_pos", "kf_pos_mask",
                  "kf_frame", "kf_weight", "dir_active", "dir_target",
                  "dir_frame", "dir_weight"):
        np.testing.assert_allclose(
            np.asarray(getattr(filled, field)),
            np.asarray(getattr(eager, field)), atol=2e-3, err_msg=field)


def test_chain_fk_residuals_match_dense(setup):
    """The opt-in chain-FK query path matches the dense full-skeleton FK
    path (the default) for every constraint family, incl. non-root joints."""
    from morphablegraphs_tpu.ops import spline_path

    graph, skel, prim = setup
    rng = np.random.default_rng(7)
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    last = float(prim.n_canonical_frames - 1)
    # non-root end effector + orientation
    sc = compiled.set_keyframe_constraint(
        sc, 0, skel, "Head", last, position=np.array([5.0, 120.0, 10.0]),
        quat_wxyz=np.array([0.9238795, 0.0, 0.3826834, 0.0]))
    sc = compiled.set_keyframe_constraint(
        sc, 1, skel, "Leg", 0.0, position=np.array([0.0, np.nan, 3.0]))
    sc = compiled.set_direction_constraint(sc, [0.3, 1.0], last)
    sc = compiled.set_look_at_constraint(sc, skel, "Head", [50.0, 100.0, 80.0],
                                         last / 2)
    sc = compiled.set_relative_transform_constraint(
        sc, skel, "Head", "Spine", [1.0, 2.0, 3.0], last / 3)
    sc = compiled.set_joint_rotation_constraint(
        sc, skel, "Spine", [1.0, 0, 0, 0], last)
    traj = spline_path.build(
        np.array([[0.0, 0, 0], [5.0, 0, 30], [0.0, 0, 60]], np.float32))
    sc = compiled.set_trajectory_constraint(sc, skel, traj, "Hips")
    sc = compiled.set_ca_constraint(sc, skel, "Leg", [30.0, 0.0, 30.0],
                                    slot=1)

    for _ in range(3):
        s = rng.normal(size=prim.n_latent).astype(np.float32)
        r_chain = np.asarray(compiled.evaluate_residuals(
            skel, prim, sc, jnp.asarray(s), chain_fk=True))
        r_dense = np.asarray(compiled.evaluate_residuals(
            skel, prim, sc, jnp.asarray(s)))
        assert np.any(r_chain != 0.0)
        np.testing.assert_allclose(r_chain, r_dense, atol=1e-3, rtol=1e-4)


def test_look_at_constraint_compiled_from_direction_constraints(setup):
    """directionConstraints: position is the LOOK-AT target for the Head
    (reference keyframe_constraint_reader.py:185-188 + LookAtConstraint) —
    must compile to the la slot, not a dead keyframe slot."""
    from morphablegraphs_tpu.constraints.input_reader import KeyframeConstraintSpec
    from morphablegraphs_tpu.synthesis import action_builder
    from morphablegraphs_tpu.utils.config import default_config

    graph, skel, prim = setup
    acs = action_builder.ActionConstraintSet(action_name="walk")
    acs.keyframe_constraints["leftStance"] = [KeyframeConstraintSpec(
        joint="Head", position=np.array([50.0, 100.0, 80.0]),
        orientation=np.full(3, np.nan), keyframe_label="end", look_at=True)]
    sc = action_builder.build_step_constraints(
        graph, acs, ("walk", "leftStance"), 0.0, None, False,
        default_config())
    assert float(np.asarray(sc.la_active)) == 1.0
    assert int(np.asarray(sc.la_node)) == skel.index_of("Head")
    np.testing.assert_allclose(np.asarray(sc.la_target), [50.0, 100.0, 80.0])
    # no keyframe slot burned on the look-at desc
    assert float(np.asarray(sc.kf_active).sum()) == 0.0


def test_unknown_joint_keyframe_constraint_skipped(setup):
    """A keyframe constraint on a joint the skeleton does not have is
    SKIPPED, not silently rerouted to the root (which would drag the pelvis
    to an end-effector target)."""
    from morphablegraphs_tpu.constraints.input_reader import KeyframeConstraintSpec
    from morphablegraphs_tpu.synthesis import action_builder
    from morphablegraphs_tpu.utils.config import default_config

    graph, skel, prim = setup
    acs = action_builder.ActionConstraintSet(action_name="walk")
    acs.keyframe_constraints["leftStance"] = [KeyframeConstraintSpec(
        joint="RightToolEndSite", position=np.array([10.0, 120.0, 40.0]),
        orientation=np.full(3, np.nan), keyframe_label="end")]
    sc = action_builder.build_step_constraints(
        graph, acs, ("walk", "leftStance"), 0.0, None, False,
        default_config())
    assert float(np.asarray(sc.kf_active).sum()) == 0.0


def test_cycled_next_requires_cycle_states(setup):
    """walk -> walk repetition must NOT set cycled_next when the group has
    no cycle states (reference _detect_action_cycles gates on
    has_cycle_states) — otherwise the first action truncates to one step."""
    from morphablegraphs_tpu.constraints import input_reader
    from morphablegraphs_tpu.synthesis import action_builder
    from morphablegraphs_tpu.utils.config import default_config

    graph, skel, prim = setup
    mg_input = input_reader.read_input({
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [
            {"action": "walk", "constraints": [{"joint": "Hips",
                "trajectoryConstraints": [{"position": [0, None, 0]},
                                          {"position": [5, None, 60]}]}]},
            {"action": "walk", "constraints": [{"joint": "Hips",
                "trajectoryConstraints": [{"position": [5, None, 60]},
                                          {"position": [5, None, 120]}]}]},
        ]}, activate_coordinate_transform=False)
    acs_list = action_builder.build_action_constraints(
        graph, mg_input, default_config())
    assert not acs_list[0].cycled_next
    # with cycle states present, repetition DOES set the flag
    graph.node_groups["walk"].cycle_states = ["leftStance"]
    try:
        acs_list2 = action_builder.build_action_constraints(
            graph, mg_input, default_config())
        assert acs_list2[0].cycled_next
    finally:
        graph.node_groups["walk"].cycle_states = []


def test_ca_annotated_root_trajectory_not_walking_path(setup):
    """A collision-avoidance-annotated trajectory on the ROOT joint is an
    avoidance region, not the locomotion path."""
    from morphablegraphs_tpu.constraints import input_reader
    from morphablegraphs_tpu.synthesis import action_builder
    from morphablegraphs_tpu.utils.config import default_config

    graph, skel, prim = setup
    mg_input = input_reader.read_input({
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [
            {"action": "walk", "constraints": [{"joint": "Hips",
                "trajectoryConstraints": [
                    {"position": [0, None, 0],
                     "semanticAnnotation": {"collisionAvoidance": True}},
                    {"position": [30, None, 30],
                     "semanticAnnotation": {"collisionAvoidance": True}}]}]},
        ]}, activate_coordinate_transform=False)
    acs_list = action_builder.build_action_constraints(
        graph, mg_input, default_config())
    assert acs_list[0].root_trajectory is None
    assert len(acs_list[0].ca_trajectories) == 1
