"""End-to-end constrained synthesis (BASELINE.md config 3 shape): trajectory-
following walk through the full generate_motion path."""

import numpy as np
import pytest

from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
from morphablegraphs_tpu.utils.config import default_config

from fixtures import TEST_BVH, make_graph_dict


WALK_INPUT = {
    "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
    "elementaryActions": [
        {
            "action": "walk",
            "constraints": [{
                "joint": "Hips",
                "trajectoryConstraints": [
                    {"position": [0.0, None, 0.0]},
                    {"position": [5.0, None, 40.0]},
                    {"position": [15.0, None, 80.0]},
                    {"position": [20.0, None, 120.0]},
                ],
            }],
        },
    ],
}


@pytest.fixture(scope="module")
def graph():
    g = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    return g


@pytest.fixture(scope="module")
def result(graph):
    cfg = default_config()
    cfg["n_random_samples"] = 30
    cfg["lm_iterations"] = 5
    gen = MotionGenerator(graph, cfg, seed=0)
    return gen.generate_motion(WALK_INPUT, activate_coordinate_transform=False)


def test_motion_generated(result):
    assert result.frames is not None
    assert len(result.frames) > 30
    assert not np.any(np.isnan(result.frames))
    assert len(result.steps) >= 2


def test_walk_follows_trajectory(result):
    """Root path should head toward the trajectory end point."""
    end_target = np.array([20.0, 120.0])  # x, z
    final_root = result.frames[-1][:3]
    d_end = np.linalg.norm(np.array([final_root[0], final_root[2]]) - end_target)
    start_d = np.linalg.norm(end_target)  # distance from origin
    assert d_end < start_d * 0.5, (d_end, final_root)
    # intermediate frames: max distance from path is bounded
    assert result.stats["average_error"] < 100.0


def test_steps_recorded(result):
    for step in result.steps:
        assert step.node_key[0] == "walk"
        assert step.parameters.shape[0] > 0
    # first step starts at a start state, walk ends at end state or runs out
    assert result.steps[0].node_key[1] == "beginLeftStance"
    assert result.action_ranges[0][0] == "walk"


def test_seams_are_smooth(result):
    root = result.frames[:, :3]
    jumps = np.linalg.norm(np.diff(root, axis=0), axis=1)
    assert np.max(jumps) < 10.0, np.max(jumps)


def test_keyframe_constraint_action(graph):
    """A pick-like action with an end-position keyframe constraint."""
    cfg = default_config()
    cfg["n_random_samples"] = 30
    cfg["lm_iterations"] = 8
    mg_input = {
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [
            {
                "action": "walk",
                "constraints": [{
                    "joint": "Hips",
                    "keyframeConstraints": [{
                        "position": [10.0, None, 35.0],
                        "semanticAnnotation": {"end": True},
                    }],
                }],
            },
        ],
    }
    gen = MotionGenerator(graph, cfg, seed=1)
    res = gen.generate_motion(mg_input, activate_coordinate_transform=False)
    assert res.frames is not None and len(res.frames) > 10
    assert not np.any(np.isnan(res.frames))


def test_smooth_time_parameters_path(graph, result):
    """config["smooth_time_parameters"] savgol-smooths each step's sampled
    time function before spline evaluation (reference
    motion_primitive.py:284-285 + :320-333)."""
    cfg = default_config()
    cfg["n_random_samples"] = 30
    cfg["lm_iterations"] = 5
    cfg["smooth_time_parameters"] = True
    gen = MotionGenerator(graph, cfg, seed=0)
    res = gen.generate_motion(WALK_INPUT, activate_coordinate_transform=False)
    assert res.frames is not None and len(res.frames) > 30
    assert not np.any(np.isnan(res.frames))
    # same seed, same walk: smoothing only perturbs time sampling slightly
    n = min(len(res.frames), len(result.frames))
    assert n > 0


def test_end_state_conditions(graph):
    """reference motion_generator_state.py is_end_state: cycled actions end
    after one step; debug_max_step caps the walk; consumed path ends it."""
    from morphablegraphs_tpu.synthesis.action_builder import ActionConstraintSet
    gen = MotionGenerator(graph, default_config(), seed=0)
    acs = ActionConstraintSet(action_name="walk")

    assert gen._is_end_state(graph_mod.NODE_TYPE_END, acs, None, 0.0, 0, 0.0, 1)
    assert not gen._is_end_state(graph_mod.NODE_TYPE_STANDARD, acs, None,
                                 0.0, 0, 0.0, 1)
    acs.cycled_next = True
    assert gen._is_end_state(graph_mod.NODE_TYPE_STANDARD, acs, None,
                             0.0, 0, 0.0, 1)
    acs.cycled_next = False
    gen.config["debug_max_step"] = 2
    assert gen._is_end_state(graph_mod.NODE_TYPE_STANDARD, acs, None,
                             0.0, 0, 0.0, 3)
    assert not gen._is_end_state(graph_mod.NODE_TYPE_STANDARD, acs, None,
                                 0.0, 0, 0.0, 1)


def test_split_dispatch_matches_fused(graph, result, monkeypatch):
    """MG_FUSED_STEP=0 (two-program split, generator.use_fused_step) must
    produce bitwise-identical walks to the fused one-dispatch default: the
    same selection, LM, and epilogue math merely regrouped into separate
    XLA programs."""
    monkeypatch.setenv("MG_FUSED_STEP", "0")
    cfg = default_config()
    cfg["n_random_samples"] = 30
    cfg["lm_iterations"] = 5
    gen = MotionGenerator(graph, cfg, seed=0)
    res = gen.generate_motion(WALK_INPUT, activate_coordinate_transform=False)
    assert res.stats["n_steps"] == result.stats["n_steps"]
    np.testing.assert_allclose(res.frames, result.frames, atol=1e-4)
    assert np.isclose(res.stats["average_error"],
                      result.stats["average_error"], atol=1e-3)


def test_nonloco_traj_step_fused_matches_split(graph, monkeypatch):
    """A non-locomotion step whose constraint set carries an active
    trajectory slot must NOT advance the travelled arc, and the fused
    one-dispatch path must match the MG_FUSED_STEP=0 split exactly (the
    fused path once advanced travelled through its placeholder path
    operand, diverging from the split contract)."""
    import jax
    import jax.numpy as jnp
    from morphablegraphs_tpu.constraints import compiled
    from morphablegraphs_tpu.ops import spline_path
    from morphablegraphs_tpu.synthesis import generator

    skel = graph.skeleton
    prim = graph.nodes[("walk", "beginLeftStance")].primitive
    path = spline_path.build(
        np.array([[0.0, 0, 0], [5.0, 0, 40], [10.0, 0, 80]], np.float32),
        unconstrained_dims=(1,))
    sc = jax.tree.map(jnp.asarray, compiled.empty_step_constraints(
        skel, int(prim.n_canonical_frames)))
    sc = sc.replace(traj=path, traj_active=jnp.asarray(1.0),
                    traj_node=jnp.asarray(0, jnp.int32),
                    traj_min_arc=jnp.asarray(0.0))
    cfg = default_config()
    cfg["n_random_samples"] = 8
    cfg["lm_iterations"] = 2
    key = jax.random.PRNGKey(5)
    travelled = 7.5
    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("MG_FUSED_STEP", mode)
        outs[mode] = jax.device_get(generator.generate_step(
            key, skel, prim, sc, cfg, travelled, 64, 5))
    s_f, e_f, _, frames_f, n_f, arc_f = outs["1"]
    s_s, e_s, _, frames_s, n_s, arc_s = outs["0"]
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(frames_f), np.asarray(frames_s),
                               atol=1e-4)
    assert int(n_f) == int(n_s)
    assert float(arc_f) == pytest.approx(float(arc_s))
    assert float(arc_f) == pytest.approx(travelled)


def test_unknown_action_raises_constraint_error(graph):
    """An action the graph does not define must fail at the input boundary
    with a typed, self-describing error (REST maps ValueError to a 400),
    not a bare KeyError from deep inside the step loop."""
    from morphablegraphs_tpu.utils.exceptions import ConstraintError
    gen = MotionGenerator(graph, default_config(), seed=0)
    bad = {"elementaryActions": [{"action": "no_such_action"}]}
    with pytest.raises(ConstraintError, match="no_such_action"):
        gen.generate_motion(bad, activate_coordinate_transform=False)
