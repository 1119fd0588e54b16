"""Global multi-step spatial + time optimization tests (reference
graph_walk_optimizer.py + time_constraints.py semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.constraints import compiled
from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import primitive as prim_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.synthesis import generator, global_opt
from morphablegraphs_tpu.utils.config import default_config

from fixtures import TEST_BVH, make_graph_dict


@pytest.fixture(scope="module")
def setup():
    graph = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    graph.skeleton = skel
    return graph, skel


def test_global_spatial_optimization_reduces_error(setup):
    graph, skel = setup
    keys = [("walk", "beginLeftStance"), ("walk", "rightStance")]
    prims = [graph.nodes[k].primitive for k in keys]
    # constraints: end position targets for each step
    scs = []
    sc0 = compiled.empty_step_constraints(skel, prims[0].n_canonical_frames)
    sc0 = compiled.set_keyframe_constraint(
        sc0, 0, skel, "Hips", prims[0].n_canonical_frames - 1,
        position=np.array([5.0, np.nan, 20.0]))
    sc0 = compiled.set_alignment_from_start_pose(sc0, np.zeros(3), 0.0)
    scs.append(sc0)
    sc1 = compiled.empty_step_constraints(skel, prims[1].n_canonical_frames)
    sc1 = compiled.set_keyframe_constraint(
        sc1, 0, skel, "Hips", prims[1].n_canonical_frames - 1,
        position=np.array([10.0, np.nan, 45.0]))
    # alignment state for step 1 is chained inside the optimizer
    scs.append(sc1)

    key = jax.random.PRNGKey(0)
    params = []
    for prim in prims:
        key, sub = jax.random.split(key)
        params.append(np.asarray(prim_mod.sample_latent(sub, prim, 1)[0]))

    def window_error(parameters):
        alphas = [jnp.asarray(p[: pr.n_spatial]) for p, pr in zip(parameters, prims)]
        gammas = [jnp.asarray(p[pr.n_spatial:]) for p, pr in zip(parameters, prims)]
        r = global_opt._chain_residuals(skel, prims, scs, alphas, gammas, 0.0)
        return float(jnp.sum(r * r))

    err0 = window_error(params)
    new_params, _ = global_opt.optimize_spatial_over_steps(
        skel, prims, scs, params, n_iters=8, quality_scale=1e-5)
    err1 = window_error(new_params)
    assert err1 < err0 * 0.5, (err0, err1)


def test_time_optimization_hits_desired_time(setup):
    graph, skel = setup
    keys = [("walk", "beginLeftStance"), ("walk", "rightStance")]
    prims = [graph.nodes[k].primitive for k in keys]
    key = jax.random.PRNGKey(1)
    params = []
    for prim in prims:
        key, sub = jax.random.split(key)
        params.append(np.asarray(prim_mod.sample_latent(sub, prim, 1)[0]))

    frame_time = 1.0 / 30
    # desire: the middle keyframe of step 1 lands at t = 2.8 s
    kf = prims[1].n_canonical_frames // 2
    constrained = [(1, kf, 2.8)]

    def keyframe_time(parameters):
        from morphablegraphs_tpu.ops import timewarp
        gammas = [jnp.asarray(p[pr.n_spatial:]) for p, pr in zip(parameters, prims)]
        t0 = timewarp.canonical_time_function(prims[0].mean_t_d, prims[0].eigen_t_d, gammas[0])
        t1 = timewarp.canonical_time_function(prims[1].mean_t_d, prims[1].eigen_t_d, gammas[1])
        return float((t0[-2] + 2.0 + t1[kf]) * frame_time)

    t_before = keyframe_time(params)
    new_params = global_opt.optimize_time_over_steps(
        prims, params, constrained, frame_time, n_iters=40,
        quality_scale=1e-6, lr=0.05)
    t_after = keyframe_time(new_params)
    assert abs(t_after - 2.8) < abs(t_before - 2.8)
    assert abs(t_after - 2.8) < 0.2, (t_before, t_after)
    # spatial params untouched
    np.testing.assert_allclose(new_params[0][: prims[0].n_spatial],
                               params[0][: prims[0].n_spatial])


def test_motion_generator_with_global_opt(setup):
    """End-to-end with global optimization enabled."""
    graph, skel = setup
    from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
    cfg = default_config()
    cfg["n_random_samples"] = 20
    cfg["lm_iterations"] = 3
    cfg["global_spatial_optimization_mode"] = "trajectory_end"
    cfg["global_spatial_optimization_settings"]["max_steps"] = 2
    cfg["global_spatial_optimization_settings"]["start_error_threshold"] = 0.0
    mg_input = {
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [{
            "action": "walk",
            "constraints": [{
                "joint": "Hips",
                "trajectoryConstraints": [
                    {"position": [0.0, None, 0.0]},
                    {"position": [10.0, None, 50.0]},
                    {"position": [15.0, None, 100.0]},
                ],
            }],
        }],
    }
    gen = MotionGenerator(graph, cfg, seed=0)
    res = gen.generate_motion(mg_input, activate_coordinate_transform=False)
    assert res.frames is not None and len(res.frames) > 10
    assert not np.any(np.isnan(res.frames))


# ---------------------------------------------------------------------------
# Weight adaptation before global spatial optimization (reference
# graph_walk_optimizer.py:119-131 _adapt_constraint_weights: the
# position_weight / orientation_weight config keys)
# ---------------------------------------------------------------------------

def _weight_scs(skel, prim):
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    # slot 0: generated loco goal; slot 1: user keyframe
    sc = compiled.set_keyframe_constraint(
        sc, 0, skel, "Hips", prim.n_canonical_frames - 1,
        position=np.array([5.0, np.nan, 20.0]), weight=2.0, generated=True)
    sc = compiled.set_keyframe_constraint(
        sc, 1, skel, "Hips", prim.n_canonical_frames - 1,
        position=np.array([5.0, np.nan, 20.0]), weight=1.0)
    sc = compiled.set_direction_constraint(
        sc, np.array([0.0, 1.0]), prim.n_canonical_frames - 1, weight=3.0)
    return sc


def test_adapt_constraint_weights_all_mode(setup):
    graph, skel = setup
    prim = graph.nodes[("walk", "beginLeftStance")].primitive
    scs = [_weight_scs(skel, prim), _weight_scs(skel, prim)]
    out = global_opt.adapt_constraint_weights(scs, "all", 1000.0, 77.0)
    for sc_in, sc in zip(scs, out):
        w = np.asarray(sc.kf_weight)
        assert w[0] == 2.0          # generated slot untouched
        assert w[1] == 1000.0       # user slot boosted
        assert float(sc.dir_weight) == 3.0  # dir (generated) untouched
        # inputs not mutated
        assert np.asarray(sc_in.kf_weight)[1] == 1.0


def test_adapt_constraint_weights_trajectory_end(setup):
    graph, skel = setup
    prim = graph.nodes[("walk", "beginLeftStance")].primitive
    scs = [_weight_scs(skel, prim), _weight_scs(skel, prim)]
    out = global_opt.adapt_constraint_weights(
        scs, "trajectory_end", 1000.0, 77.0)
    # only the LAST step is touched
    np.testing.assert_allclose(np.asarray(out[0].kf_weight),
                               np.asarray(scs[0].kf_weight))
    assert float(out[0].dir_weight) == 3.0
    w = np.asarray(out[-1].kf_weight)
    assert w[0] == 1000.0 and w[1] == 1000.0  # all active kf slots boosted
    assert float(out[-1].dir_weight) == 77.0  # orientation_weight consumed


# ---------------------------------------------------------------------------
# optimized_actions windowing: steps before the window contribute only a
# fixed warped-frame offset (reference time_constraints.py:34-41 +
# graph_walk_optimizer.py:132-137)
# ---------------------------------------------------------------------------

def test_time_optimization_start_frames_offset(setup):
    graph, skel = setup
    prim = graph.nodes[("walk", "rightStance")].primitive
    key = jax.random.PRNGKey(3)
    params = [np.asarray(prim_mod.sample_latent(key, prim, 1)[0])]
    frame_time = 1.0 / 30
    kf = prim.n_canonical_frames // 2
    # 60 warped frames of earlier steps precede this window
    start_frames = 60.0
    constrained = [(0, kf, 3.0)]

    def keyframe_time(parameters):
        from morphablegraphs_tpu.ops import timewarp
        gamma = jnp.asarray(parameters[0][prim.n_spatial:])
        t = timewarp.canonical_time_function(prim.mean_t_d, prim.eigen_t_d,
                                             gamma)
        return float((start_frames + t[kf]) * frame_time)

    t_before = keyframe_time(params)
    new_params = global_opt.optimize_time_over_steps(
        [prim], params, constrained, frame_time, n_iters=40,
        quality_scale=1e-6, start_frames=start_frames)
    t_after = keyframe_time(new_params)
    assert abs(t_after - 3.0) < abs(t_before - 3.0), (t_before, t_after)
    assert abs(t_after - 3.0) < 0.25, (t_before, t_after)
