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
