"""Behavior tests for the live algorithm-config knobs (VERDICT r3 item 2):
look_ahead_distance, constrain_start/transition_orientation,
closest_point_search_accuracy/max_iterations, arc_length_granularity and
control_point_filter_threshold must change behavior, not just load
(reference algorithm_configuration.py:141-257 consumption sites cited
per-knob below)."""

import numpy as np
import pytest

import jax.numpy as jnp

from morphablegraphs_tpu.constraints import compiled, input_reader
from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.ops import spline_path
from morphablegraphs_tpu.synthesis import action_builder
from morphablegraphs_tpu.utils.config import default_config

from fixtures import TEST_BVH, make_graph_dict


@pytest.fixture(scope="module")
def setup():
    graph = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    graph.skeleton = skel
    return graph, skel


# ---------------------------------------------------------------------------
# look_ahead_distance: bounded travelled-arc closest-point window
# (reference motion_generator.py:354-363 _update_travelled_arc_length)
# ---------------------------------------------------------------------------

# A path that doubles back: the tail passes within ~2 units of the start,
# so an UNBOUNDED closest-point query from near the origin jumps far ahead.
SELF_APPROACHING = np.array([
    [0.0, 0.0, 0.0],
    [40.0, 0.0, 0.0],
    [40.0, 0.0, 10.0],
    [0.0, 0.0, 10.0],
    [0.0, 0.0, 2.0],   # returns right next to the start
    [-40.0, 0.0, 2.0],
], np.float32)


def test_bounded_closest_point_respects_window():
    sp = spline_path.build(SELF_APPROACHING)
    q = jnp.asarray([1.0, 0.0, 1.5])  # near both the head and the tail
    _, arc_free, _ = spline_path.closest_point(sp, q, 0.0)
    _, arc_bounded, _ = spline_path.closest_point(
        sp, q, 0.0, max_arc_length=25.0, bounded=True)
    # unbounded: snaps to the returning tail (far along the path)
    assert float(arc_free) > 60.0
    # bounded by min + look_ahead: stays within the window
    assert 0.0 <= float(arc_bounded) <= 25.0 + 1e-3
    # and picks the genuinely closest point inside it (the head, near arc~1)
    assert float(arc_bounded) < 5.0


def test_bounded_window_beyond_closest_matches_unbounded():
    sp = spline_path.build(SELF_APPROACHING)
    q = jnp.asarray([20.0, 0.0, -1.0])  # closest point is at arc ~20
    _, arc_free, d_free = spline_path.closest_point(sp, q, 0.0)
    _, arc_b, d_b = spline_path.closest_point(
        sp, q, 0.0, max_arc_length=float(sp.full_arc_length), bounded=True)
    np.testing.assert_allclose(float(arc_b), float(arc_free), atol=1e-3)
    np.testing.assert_allclose(float(d_b), float(d_free), atol=1e-4)


def test_bounded_window_collapses_to_min_arc():
    """max <= min: the advancing guarantee pins the result at min_arc."""
    sp = spline_path.build(SELF_APPROACHING)
    q = jnp.asarray([1.0, 0.0, 1.5])
    _, arc, _ = spline_path.closest_point(
        sp, q, 30.0, max_arc_length=10.0, bounded=True)
    np.testing.assert_allclose(float(arc), 30.0, atol=1e-3)


# ---------------------------------------------------------------------------
# closest_point_search_accuracy / max_iterations -> refinement budget
# (reference parameterized_spline.py:54-69 SegmentList subdivision budget)
# ---------------------------------------------------------------------------

def test_refine_iters_mapping_monotone():
    f = spline_path.refine_iters_for_accuracy
    loose = f(1000.0, accuracy=1.0)
    tight = f(1000.0, accuracy=1e-4)
    assert tight > loose >= 4
    assert f(1000.0, accuracy=1e-12) <= 32      # hard cap
    assert f(1000.0, accuracy=1e-4, max_iterations=6) == 6
    assert f(1000.0, accuracy=1e9) == 4         # already bracketed
    # the budget actually reaches the requested accuracy: bracket*(2/3)^n
    n = f(1000.0, accuracy=0.01)
    bracket = 2.0 * 1000.0 / spline_path.GRANULARITY
    assert bracket * (2.0 / 3.0) ** n <= 0.01 * 1.0001


def test_arc_length_granularity_changes_table():
    sp_fine = spline_path.build(SELF_APPROACHING, granularity=2000)
    sp_coarse = spline_path.build(SELF_APPROACHING, granularity=100)
    assert sp_fine.table_arc.shape[0] == 2001
    assert sp_coarse.table_arc.shape[0] == 101
    # both converge to ~the same full arc length
    np.testing.assert_allclose(float(sp_fine.full_arc_length),
                               float(sp_coarse.full_arc_length), rtol=0.01)


# ---------------------------------------------------------------------------
# control_point_filter_threshold (reference trajectory_following_settings,
# consumed at trajectory_constraint_reader.py:66-175 via the builder)
# ---------------------------------------------------------------------------

def _traj_input(points):
    return {"startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
            "elementaryActions": [{"action": "walk", "constraints": [
                {"joint": "Hips",
                 "trajectoryConstraints": [{"position": p} for p in points]}]}]}


def test_control_point_filter_threshold_drops_near_duplicates():
    pts = [[0, None, 0], [0.5, None, 0], [1.0, None, 0], [50, None, 0],
           [100, None, 0]]
    loose = input_reader.read_input(
        _traj_input(pts), activate_coordinate_transform=False,
        control_point_filter_threshold=2.0)
    tight = input_reader.read_input(
        _traj_input(pts), activate_coordinate_transform=False)
    assert tight.actions[0].trajectories[0].control_points.shape[0] == 5
    # 0.5 and 1.0 are within 2.0 of their predecessor -> dropped
    assert loose.actions[0].trajectories[0].control_points.shape[0] == 3


def test_coincident_control_points_always_filtered():
    """The 1e-3 floor: exactly repeated points never degenerate the spline."""
    pts = [[0, None, 0], [0, None, 0], [50, None, 0], [50, None, 0],
           [100, None, 0]]
    parsed = input_reader.read_input(
        _traj_input(pts), activate_coordinate_transform=False,
        control_point_filter_threshold=0.0)
    assert parsed.actions[0].trajectories[0].control_points.shape[0] == 3


# ---------------------------------------------------------------------------
# option-evaluation constraints: goal at travelled + look_ahead_distance,
# orientation gated on constrain_start/transition_orientation
# (reference graph_walk_planner.py:56-64,:93,:121,:156-188)
# ---------------------------------------------------------------------------

WALK_INPUT = {
    "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
    "elementaryActions": [{"action": "walk", "constraints": [
        {"joint": "Hips", "trajectoryConstraints": [
            {"position": [0.0, None, 0.0]},
            {"position": [0.0, None, 60.0]},
            {"position": [0.0, None, 120.0]},
        ]}]}],
}


def _option_sc(setup, cfg, add_orientation, travelled=0.0):
    graph, skel = setup
    parsed = input_reader.read_input(WALK_INPUT,
                                     activate_coordinate_transform=False)
    acs = action_builder.build_action_constraints(graph, parsed, cfg)[0]
    sc = action_builder.build_option_eval_constraints(
        graph, acs, ("walk", "leftStance"), travelled, None, cfg,
        add_orientation)
    return acs, sc


def test_option_eval_goal_at_look_ahead(setup):
    cfg = default_config()
    cfg["trajectory_following_settings"]["look_ahead_distance"] = 40.0
    acs, sc = _option_sc(setup, cfg, add_orientation=False)
    goal, _ = spline_path.point_and_dir_at_arc_length(
        acs.root_trajectory, jnp.asarray(40.0))
    goal = np.asarray(goal)
    assert float(sc.kf_active[0]) == 1.0
    got = np.asarray(sc.kf_pos[0])
    mask = np.asarray(sc.kf_pos_mask[0])
    # height is unconstrained (dim 1 NaN in the input) -> masked out
    np.testing.assert_array_equal(mask, [1.0, 0.0, 1.0])
    np.testing.assert_allclose(got[mask > 0], goal[mask > 0], atol=1e-3)
    assert float(sc.dir_active) == 0.0
    # a different look-ahead moves the goal
    cfg2 = default_config()
    cfg2["trajectory_following_settings"]["look_ahead_distance"] = 80.0
    _, sc2 = _option_sc(setup, cfg2, add_orientation=False)
    assert np.linalg.norm(np.asarray(sc2.kf_pos[0]) - got) > 10.0


def test_option_eval_orientation_gated(setup):
    cfg = default_config()
    acs, sc = _option_sc(setup, cfg, add_orientation=True)
    assert float(sc.dir_active) == 1.0
    d = np.asarray(sc.dir_target)
    # straight +z path: tangent direction ~ [0, 1] in the xz plane
    np.testing.assert_allclose(d / np.linalg.norm(d), [0.0, 1.0], atol=0.05)


def test_option_eval_half_step_constraint(setup):
    cfg = default_config()
    cfg["trajectory_following_settings"]["look_ahead_distance"] = 40.0
    cfg["trajectory_following_settings"]["generate_half_step_constraint"] = True
    acs, sc = _option_sc(setup, cfg, add_orientation=False)
    assert float(sc.kf_active[0]) == 1.0 and float(sc.kf_active[1]) == 1.0
    half, _ = spline_path.point_and_dir_at_arc_length(
        acs.root_trajectory, jnp.asarray(20.0))
    mask = np.asarray(sc.kf_pos_mask[1])
    np.testing.assert_allclose(np.asarray(sc.kf_pos[1])[mask > 0],
                               np.asarray(half)[mask > 0], atol=1e-3)


# ---------------------------------------------------------------------------
# accepted-but-inert key warning (VERDICT r3 "silent-ignore" trap)
# ---------------------------------------------------------------------------

def test_inert_keys_warn_on_non_default(tmp_path):
    import json
    from morphablegraphs_tpu.utils import config as config_mod
    preset = {"trajectory_following_settings": {"spline_type": 3,
                                                "look_ahead_distance": 80},
              "n_cluster_search_candidates": 16}
    p = tmp_path / "preset_algorithm.config"
    p.write_text(json.dumps(preset))
    fired = config_mod.warn_inert_keys(preset, source=str(p))
    keys = {k for k, _ in fired}
    assert "trajectory_following_settings.spline_type" in keys
    assert "n_cluster_search_candidates" in keys
    # live keys never warn
    assert not any("look_ahead_distance" in k for k in keys)
    cfg = config_mod.load_config(str(p))
    assert cfg["trajectory_following_settings"]["look_ahead_distance"] == 80


def test_inert_keys_silent_on_default_values():
    from morphablegraphs_tpu.utils import config as config_mod
    assert config_mod.warn_inert_keys(
        {"trajectory_following_settings": {"spline_type": 0}}) == []
    # every INERT_KEYS entry must name a real config key
    for dotted in config_mod.INERT_KEYS:
        _, present = config_mod._lookup(
            config_mod.DEFAULT_ALGORITHM_CONFIG, dotted)
        assert present, dotted


# ---------------------------------------------------------------------------
# top-level knobs: use_constraints, activate_time_variation
# (reference motion_primitive_generator.py:109, graph_walk.py:103)
# ---------------------------------------------------------------------------

def test_use_constraints_false_samples_randomly(setup):
    from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
    graph, _ = setup
    cfg = default_config()
    cfg["use_constraints"] = False
    cfg["n_random_samples"] = 10
    gen = MotionGenerator(graph, cfg, seed=0)
    res = gen.generate_motion(WALK_INPUT, activate_coordinate_transform=False)
    assert len(res.steps) > 0
    # no constraint evaluation happened: errors stay 0, and no per-step
    # candidate pools were scored
    assert all(s.error == 0.0 for s in res.steps)
    assert np.isfinite(np.asarray(res.frames)).all()


def test_activate_time_variation_false_exports_canonical_length(setup):
    from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
    graph, _ = setup
    cfg = default_config()
    cfg["n_random_samples"] = 10
    cfg["lm_iterations"] = 2
    cfg["activate_time_variation"] = False
    gen = MotionGenerator(graph, cfg, seed=0)
    res = gen.generate_motion(WALK_INPUT, activate_coordinate_transform=False)
    canonical = sum(graph.nodes[s.node_key].primitive.n_canonical_frames
                    for s in res.steps)
    assert len(res.frames) == canonical


# ---------------------------------------------------------------------------
# optimize_collision_avoidance_constraints_extra: post-hoc CA-only pass
# (reference graph_walk_optimizer.py:74-76,:156-189)
# ---------------------------------------------------------------------------

CA_WALK_INPUT = {
    "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
    "elementaryActions": [{"action": "walk", "constraints": [
        {"joint": "Hips", "trajectoryConstraints": [
            {"position": [0.0, None, 0.0]},
            {"position": [0.0, None, 60.0]},
            {"position": [0.0, None, 120.0]},
        ]},
        {"joint": "Head", "trajectoryConstraints": [
            {"position": [30.0, None, 0.0],
             "semanticAnnotation": {"collisionAvoidance": True}},
            {"position": [30.0, None, 60.0],
             "semanticAnnotation": {"collisionAvoidance": True}},
            {"position": [30.0, None, 120.0],
             "semanticAnnotation": {"collisionAvoidance": True}},
        ]}]}],
}


def test_ca_extra_pass_changes_parameters(setup):
    from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
    graph, _ = setup
    base = default_config()
    base["n_random_samples"] = 10
    base["lm_iterations"] = 3
    gen_off = MotionGenerator(graph, dict(base), seed=0)
    res_off = gen_off.generate_motion(CA_WALK_INPUT,
                                      activate_coordinate_transform=False)
    cfg_on = dict(base)
    cfg_on["optimize_collision_avoidance_constraints_extra"] = True
    gen_on = MotionGenerator(graph, cfg_on, seed=0)
    res_on = gen_on.generate_motion(CA_WALK_INPUT,
                                    activate_coordinate_transform=False)
    # same walk structure (same seed), but the CA pass moved the latents
    assert [s.node_key for s in res_on.steps] == \
        [s.node_key for s in res_off.steps]
    diffs = [float(np.linalg.norm(a.parameters - b.parameters))
             for a, b in zip(res_on.steps, res_off.steps)]
    assert max(diffs) > 1e-4
    assert np.isfinite(np.asarray(res_on.frames)).all()
    # the rebuilt buffer stays step-consistent
    assert res_on.steps[-1].end_frame == len(res_on.frames) - 1


# ---------------------------------------------------------------------------
# collision_avoidance_constraints_mode == "ik": CA trajectories become IK
# trajectory constraints solved in the post-pass (reference
# graph_walk.py:247-248 + :277-297)
# ---------------------------------------------------------------------------

def test_ca_ik_mode_post_pass_follows_trajectory(setup):
    """Mode 'ik' must leave the graph walk itself untouched (same latents)
    and edit the FRAMES in post-processing so the CA joint tracks the CA
    trajectory more closely than the default mode's output."""
    from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
    from morphablegraphs_tpu.models.skeleton import fk_positions
    graph, skel = setup
    base = default_config()
    base["n_random_samples"] = 10
    base["lm_iterations"] = 2
    gen_def = MotionGenerator(graph, dict(base), seed=0)
    res_def = gen_def.generate_motion(CA_WALK_INPUT,
                                      activate_coordinate_transform=False)
    cfg_ik = dict(base)
    cfg_ik["collision_avoidance_constraints_mode"] = "ik"
    gen_ik = MotionGenerator(graph, cfg_ik, seed=0)
    res_ik = gen_ik.generate_motion(CA_WALK_INPUT,
                                    activate_coordinate_transform=False)
    # the mode only adds a post-pass: identical walk + latents
    assert [s.node_key for s in res_ik.steps] == \
        [s.node_key for s in res_def.steps]
    for a, b in zip(res_ik.steps, res_def.steps):
        np.testing.assert_array_equal(a.parameters, b.parameters)
    assert np.isfinite(res_ik.frames).all()
    # the flag changes the output frames...
    assert res_ik.frames.shape == res_def.frames.shape
    assert float(np.max(np.abs(res_ik.frames - res_def.frames))) > 1e-3

    # ...and pulls the CA joint (Head-equivalent on the toy skeleton: the
    # CA trajectory rides x=30) toward the avoidance path
    ca_joint = CA_WALK_INPUT["elementaryActions"][0]["constraints"][1]["joint"]
    jidx = skel.index_of(ca_joint)

    def mean_x_dist(frames):
        xs = [float(np.asarray(fk_positions(
            skel, jnp.asarray(f, jnp.float32)))[jidx, 0])
            for f in frames[::10]]
        return float(np.mean(np.abs(np.asarray(xs) - 30.0)))

    assert mean_x_dist(res_ik.frames) < mean_x_dist(res_def.frames)


def test_apply_ik_trajectory_constraints_unit(setup):
    """Batched trajectory IK: interior frames track the spline, range-edge
    frames blend to zero edit, frames outside the range are untouched."""
    from morphablegraphs_tpu.synthesis import postprocess
    from morphablegraphs_tpu.models.skeleton import fk_positions
    graph, skel = setup
    joint = skel.node_names[min(2, len(skel.node_names) - 1)]
    jidx = skel.index_of(joint)
    base = np.zeros((40, skel.n_frame_params), np.float32)
    base[:, 3::4] = 1.0  # identity quats
    p0 = np.asarray(fk_positions(skel, jnp.asarray(base[0], jnp.float32)))
    # a straight line offset from the joint's rest position
    line = np.stack([p0[jidx] + [5.0, 0.0, -10.0],
                     p0[jidx] + [5.0, 0.0, 0.0],
                     p0[jidx] + [5.0, 0.0, 10.0]]).astype(np.float32)
    sp = spline_path.build(line)
    c = postprocess.IKTrajectoryConstraint(
        joint=joint, spline=sp, start_frame=8, end_frame=31,
        fixed_range=True)
    out = postprocess.apply_ik_trajectory_constraints(
        skel, base, [c], n_iters=10, blend_window=4)
    np.testing.assert_array_equal(out[:8], base[:8])
    np.testing.assert_array_equal(out[32:], base[32:])
    mid = np.asarray(fk_positions(skel, jnp.asarray(out[20], jnp.float32)))
    before = float(np.linalg.norm(p0[jidx] - (p0[jidx] + [5.0, 0, 0])))
    after = float(np.linalg.norm(mid[jidx] - np.asarray(
        jax_closest(sp, mid[jidx]))))
    assert after < before  # moved toward the trajectory
    # edge frames carry a smaller edit than interior frames
    d_edge = float(np.max(np.abs(out[8] - base[8])))
    d_mid = float(np.max(np.abs(out[20] - base[20])))
    assert d_edge < d_mid


def jax_closest(sp, p):
    pos, _, _ = spline_path.closest_point(sp, jnp.asarray(p, jnp.float32))
    return pos


# ---------------------------------------------------------------------------
# generate_foot_plant_constraints: foot goals replace the root goal
# (reference locomotion_constraints_builder.py:65-68 +
#  foot_step_constraints_builder.py:50-88)
# ---------------------------------------------------------------------------

def test_foot_plant_constraints_replace_root_goal(setup):
    import copy
    from morphablegraphs_tpu.models import skeleton as sk_mod
    from morphablegraphs_tpu.utils.synthetic import REF_BVH
    graph, _ = setup
    skel, _ = sk_mod.load_bvh(REF_BVH)
    graph = copy.copy(graph)
    graph.skeleton = skel
    cfg = default_config()
    cfg["trajectory_following_settings"]["generate_foot_plant_constraints"] = True
    parsed = input_reader.read_input(WALK_INPUT,
                                     activate_coordinate_transform=False)
    acs = action_builder.build_action_constraints(graph, parsed, cfg)[0]
    sc, loco, loco_flags = action_builder.build_step_constraints(
        graph, acs, ("walk", "leftStance"), 0.0, None, False, cfg,
        defer_locomotion=True)
    use_pos, use_dir, use_half = loco_flags
    assert use_pos is False        # root goal replaced
    assert use_dir is True         # direction constraint kept
    active = np.asarray(sc.kf_active)
    nodes = np.asarray(sc.kf_node)
    foot_idx = {skel.index_of("LeftFoot"), skel.index_of("RightFoot")}
    planted = [i for i in range(len(active)) if active[i] > 0]
    assert len(planted) == 2       # leftStance: stance right + swing left
    assert {int(nodes[i]) for i in planted} <= foot_idx
    # the targets sit laterally offset from the path (straight +z path:
    # lateral is +-x), height masked as unconstrained
    for i in planted:
        pos_i = np.asarray(sc.kf_pos[i])
        mask_i = np.asarray(sc.kf_pos_mask[i])
        np.testing.assert_array_equal(mask_i, [1.0, 0.0, 1.0])
        assert abs(abs(pos_i[0]) - action_builder.FOOT_OFFSET_X) < 1.0
    # without the flag the root goal is used
    cfg2 = default_config()
    _, _, flags2 = action_builder.build_step_constraints(
        graph, acs, ("walk", "leftStance"), 0.0, None, False, cfg2,
        defer_locomotion=True)
    assert flags2[0] is True


# ---------------------------------------------------------------------------
# smoothing_settings: spatial_smoothing gate, blending method,
# root_filter_window, apply_foot_alignment, time_smoothing_window
# (reference graph_walk.py:96-101 + anim_utils motion-vector consumption)
# ---------------------------------------------------------------------------

def test_spatial_smoothing_off_is_identity():
    from morphablegraphs_tpu.ops import align
    prev = np.arange(11.0, dtype=np.float32)
    clip = np.ones((6, 11), np.float32)
    out = np.asarray(align.smooth_transition(jnp.asarray(prev),
                                             jnp.asarray(clip), 0))
    np.testing.assert_array_equal(out, clip)
    # window > 0 pulls the first frame onto prev
    sm = np.asarray(align.smooth_transition(jnp.asarray(prev),
                                            jnp.asarray(clip), 4))
    np.testing.assert_allclose(sm[0], prev, atol=1e-6)


def test_blend_seam_ramps_across_boundary():
    from morphablegraphs_tpu.ops import align
    prev = np.zeros((10, 11), np.float32)
    new = np.ones((10, 11), np.float32)
    p_out, n_out = align.blend_seam_np(prev, new, window=8)
    assert p_out.shape == prev.shape and n_out.shape == new.shape
    seam = np.concatenate([p_out[-4:], n_out[:4]], axis=0)[:, 0]
    # strictly increasing ramp from ~0 to ~1 across the seam
    assert np.all(np.diff(seam) > 0)
    assert seam[0] > 0.0 and seam[-1] < 1.0
    # frames outside the window untouched
    np.testing.assert_array_equal(p_out[:-4], prev[:-4])
    np.testing.assert_array_equal(n_out[4:], new[4:])


def test_root_filter_window_smooths_root_only():
    from morphablegraphs_tpu.ops import align
    frames = np.zeros((40, 11), np.float32)
    frames[20, 0] = 10.0   # root x spike
    frames[20, 5] = 10.0   # non-root channel spike
    out = align.filter_root_np(frames, window=5)
    assert out.shape == frames.shape
    assert out[20, 0] < 5.0           # spike spread out
    np.testing.assert_allclose(out[:, 0].sum(), 10.0, rtol=1e-5)  # mass kept
    assert out[20, 5] == 10.0         # quaternion channels untouched
    np.testing.assert_array_equal(align.filter_root_np(frames, 1), frames)


def test_time_smoothing_window_changes_filter():
    from morphablegraphs_tpu.ops import timewarp
    rng = np.random.default_rng(0)
    t = np.cumsum(1.0 + 0.5 * rng.standard_normal(60))
    s_small = timewarp.smooth_time_function_np(t, window=5)
    s_big = timewarp.smooth_time_function_np(t, window=21)
    assert s_small.shape == t.shape == s_big.shape
    assert not np.allclose(s_small, s_big)
    # the wider window smooths harder
    assert (np.abs(np.diff(s_big, 2)).sum()
            < np.abs(np.diff(s_small, 2)).sum())


def test_foot_alignment_matches_seam_feet(setup):
    from morphablegraphs_tpu.models import skeleton as sk_mod
    from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
    from morphablegraphs_tpu.synthesis.grounding import LEFT_FOOT, RIGHT_FOOT
    from morphablegraphs_tpu.utils.synthetic import REF_BVH
    import copy
    graph, _ = setup
    skel, _ = sk_mod.load_bvh(REF_BVH)  # fixture skeleton has no feet
    graph = copy.copy(graph)
    graph.skeleton = skel
    feet = [j for j in (LEFT_FOOT, RIGHT_FOOT) if j in skel.node_names]
    assert feet
    cfg = default_config()
    cfg["smoothing_settings"]["apply_foot_alignment"] = True
    gen = MotionGenerator(graph, cfg, seed=0)
    rng = np.random.default_rng(1)
    d = skel.n_frame_params
    prev_last = np.zeros(d, np.float32)
    prev_last[3] = 1.0  # identity root quat
    for q0 in range(7, d, 4):
        prev_last[q0] = 1.0
    clip = np.tile(prev_last, (6, 1)).astype(np.float32)
    clip[:, 0] += 7.0  # clip starts offset in x
    aligned = gen._foot_align(prev_last, clip.copy())
    idx = [skel.index_of(j) for j in feet]
    pts = np.asarray(sk_mod.fk_positions(
        skel, jnp.asarray(np.stack([prev_last, aligned[0]]), jnp.float32)))
    np.testing.assert_allclose(pts[0][idx].mean(axis=0)[[0, 2]],
                               pts[1][idx].mean(axis=0)[[0, 2]], atol=1e-4)


@pytest.mark.parametrize("flag", [False, True])
def test_orientation_flags_flow_from_config(setup, monkeypatch, flag):
    """constrain_start_orientation gates the direction slot in start-node
    option scoring (reference graph_walk_planner.py:56-59,:93)."""
    from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
    import morphablegraphs_tpu.synthesis.motion_generator as mg_mod
    graph, skel = setup
    cfg = default_config()
    cfg["trajectory_following_settings"]["constrain_start_orientation"] = flag
    captured = {}
    gen = MotionGenerator(graph, cfg, seed=0)
    orig = action_builder.build_option_eval_constraints

    def spy(*args, **kwargs):
        captured["add_orientation"] = (kwargs["add_orientation"]
                                       if "add_orientation" in kwargs
                                       else args[6])
        return orig(*args, **kwargs)

    parsed = input_reader.read_input(WALK_INPUT,
                                     activate_coordinate_transform=False)
    acs = action_builder.build_action_constraints(graph, parsed, cfg)[0]
    # the fixture group has a single start state -> widen to force scoring
    group = graph.node_groups["walk"]
    monkeypatch.setattr(group, "start_states",
                        ["beginLeftStance", "leftStance"])
    monkeypatch.setattr(mg_mod.action_builder,
                        "build_option_eval_constraints", spy)
    gen._best_start_node(acs, None, None)
    assert captured["add_orientation"] is flag
