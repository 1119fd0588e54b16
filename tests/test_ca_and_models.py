"""CA constraints, feature-point models, config preset loading."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.constraints import compiled, input_reader
from morphablegraphs_tpu.construct.feature_point_model import (
    FeaturePointModel, SemanticStatisticalModel)
from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import primitive as prim_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.utils.config import load_config, default_config

from fixtures import TEST_BVH, make_graph_dict


@pytest.fixture(scope="module")
def setup():
    g = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    return g, skel


def test_ca_constraint_min_over_frames(setup):
    g, skel = setup
    prim = g.nodes[("walk", "leftStance")].primitive
    s = jnp.zeros(prim.n_latent)
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    # target ON the motion's own root path at mid-step -> min distance ~ 0
    coeffs = np.asarray(compiled.aligned_coeffs(prim, s, sc))
    from morphablegraphs_tpu.ops import bspline
    mid = np.asarray(bspline.evaluate(
        jnp.asarray(coeffs), prim.knots_s,
        jnp.asarray([prim.n_canonical_frames / 2.0])))[0]
    hips_mid = np.asarray(sk.fk_positions(skel, jnp.asarray(mid)))[skel.index_of("Hips")]
    sc1 = compiled.set_ca_constraint(sc, skel, "Hips", hips_mid)
    err1 = float(compiled.evaluate_error(skel, prim, sc1, s))
    assert err1 < 1.0, err1
    # far-away target -> large min distance
    sc2 = compiled.set_ca_constraint(sc, skel, "Hips", hips_mid + np.array([500.0, 0, 0]))
    err2 = float(compiled.evaluate_error(skel, prim, sc2, s))
    assert err2 > 400


def test_two_simultaneous_ca_constraints(setup):
    """Two CA slots active at once: each contributes its own min-distance
    residual (VERDICT r1 item 9: one CA slot per step was a gap)."""
    g, skel = setup
    prim = g.nodes[("walk", "leftStance")].primitive
    s = jnp.zeros(prim.n_latent)
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    coeffs = np.asarray(compiled.aligned_coeffs(prim, s, sc))
    from morphablegraphs_tpu.ops import bspline
    mid = np.asarray(bspline.evaluate(
        jnp.asarray(coeffs), prim.knots_s,
        jnp.asarray([prim.n_canonical_frames / 2.0])))[0]
    hips_mid = np.asarray(sk.fk_positions(skel, jnp.asarray(mid)))[skel.index_of("Hips")]
    # slot 0 on the path (near-zero), slot 1 far away
    sc2 = compiled.set_ca_constraint(sc, skel, "Hips", hips_mid, slot=0)
    sc2 = compiled.set_ca_constraint(sc2, skel, "Head",
                                     hips_mid + np.array([300.0, 0, 0]),
                                     slot=1)
    res = np.asarray(compiled.evaluate_residuals(skel, prim, sc2, s))
    ca = res[compiled._OFF_CA: compiled._OFF_CA + compiled.MAX_CA]
    assert ca[0] < 2.0, ca
    assert ca[1] > 250.0, ca
    assert ca[2] == 0.0 and ca[3] == 0.0  # inactive slots stay zero
    # both contribute to the scalar error
    err_two = float(compiled.evaluate_error(skel, prim, sc2, s))
    err_one = float(compiled.evaluate_error(
        skel, prim, compiled.set_ca_constraint(sc, skel, "Hips", hips_mid), s))
    assert err_two > err_one + 200.0


def test_trajectory_set_constraint(setup):
    """Joint-set trajectory constraint (reference
    trajectory_set_constraint.py): two joints each following their own
    spline; following the motion's own joint paths gives near-zero residual,
    displaced splines give a large one."""
    from morphablegraphs_tpu.ops import bspline, spline_path

    g, skel = setup
    prim = g.nodes[("walk", "leftStance")].primitive
    s = jnp.zeros(prim.n_latent)
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    coeffs = np.asarray(compiled.aligned_coeffs(prim, s, sc))
    t = np.linspace(0, prim.n_canonical_frames - 1, compiled.TRAJ_SAMPLES)
    frames = np.asarray(bspline.evaluate(jnp.asarray(coeffs), prim.knots_s,
                                         jnp.asarray(t)))
    pos = np.asarray(sk.fk_positions(skel, jnp.asarray(frames)))
    joints = ["Hips", "Head"]
    trajs = [spline_path.build(pos[:, skel.index_of(j)], max_points=32)
             for j in joints]
    sc_on = compiled.set_trajectory_set_constraint(sc, skel, joints, trajs)
    res_on = np.asarray(compiled.evaluate_residuals(skel, prim, sc_on, s,
                                                    use_ts=True))
    ts_on = res_on[compiled._OFF_TS:]
    assert ts_on.max() < 12.0, ts_on  # follows its own paths loosely
    # displaced splines -> large centroid error
    trajs_far = [spline_path.build(pos[:, skel.index_of(j)]
                                   + np.array([200.0, 0, 0]), max_points=32)
                 for j in joints]
    sc_far = compiled.set_trajectory_set_constraint(sc, skel, joints,
                                                    trajs_far)
    res_far = np.asarray(compiled.evaluate_residuals(skel, prim, sc_far, s,
                                                     use_ts=True))
    assert res_far[compiled._OFF_TS:].mean() > 100.0
    # the scalar error includes the averaged set residual
    e_on = float(compiled.evaluate_error(skel, prim, sc_on, s, use_ts=True))
    e_far = float(compiled.evaluate_error(skel, prim, sc_far, s, use_ts=True))
    assert e_far > e_on + 100.0
    # use_ts=False compiles the branch out -> zero slots
    res_off = np.asarray(compiled.evaluate_residuals(skel, prim, sc_on, s,
                                                     use_ts=False))
    assert (res_off[compiled._OFF_TS:] == 0).all()


def test_ca_trajectory_parsed_from_input():
    mg_input = {
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [{
            "action": "walk",
            "constraints": [{
                "joint": "RightHand",
                "trajectoryConstraints": [
                    {"position": [0, 0, 0],
                     "semanticAnnotation": {"collisionAvoidance": True}},
                    {"position": [10, 0, 10],
                     "semanticAnnotation": {"collisionAvoidance": True}},
                ],
            }],
        }],
    }
    parsed = input_reader.read_input(mg_input, activate_coordinate_transform=False)
    traj = parsed.actions[0].trajectories[0]
    assert traj.annotated
    assert traj.joint == "RightHand"


def test_feature_point_model(setup):
    g, skel = setup
    prim = g.nodes[("walk", "leftStance")].primitive
    key = jax.random.PRNGKey(0)
    motions = []
    for i in range(8):
        key, sub = jax.random.split(key)
        s = prim_mod.sample_latent(sub, prim, 1)[0]
        f, n, _ = prim_mod.back_project(prim, s, 64, use_time=False)
        motions.append(np.asarray(f)[: int(n)])
    fpm = FeaturePointModel(skel, "Head").fit(motions, keyframe=-1, max_k=2)
    # a typical end position scores much better than a far-away one
    typical = np.asarray(sk.fk_positions(
        skel, jnp.asarray(motions[0][-1])))[skel.index_of("Head")]
    far = typical + np.array([500.0, 0, 0])
    assert fpm.score_target(typical) > fpm.score_target(far) + 10


def test_semantic_statistical_model():
    rng = np.random.default_rng(0)
    data = {"pick": rng.standard_normal((40, 4)) + 3,
            "place": rng.standard_normal((40, 4)) - 3}
    m = SemanticStatisticalModel().fit(data, max_k=2)
    s_pick = m.sample(jax.random.PRNGKey(0), "pick", 1)[0]
    assert m.classify(s_pick) == "pick"
    assert m.score("pick", s_pick) > m.score("place", s_pick)


def test_reference_config_presets_load():
    """The reference's shipped preset files merge over the defaults."""
    for preset in ["accuracy", "performance", "standard"]:
        path = f"/root/reference/examples/config/{preset}_algorithm.config"
        cfg = load_config(path)
        assert "trajectory_following_settings" in cfg
        assert "n_random_samples" in cfg
    acc = load_config("/root/reference/examples/config/accuracy_algorithm.config")
    assert acc["trajectory_following_settings"]["look_ahead_distance"] == 80
    perf = load_config("/root/reference/examples/config/performance_algorithm.config")
    assert perf["global_spatial_optimization_mode"] == "none"


def test_shipped_config_presets_load():
    """Every preset in configs/ (incl. legacy_sampling/mgrd_sampling) merges
    over the defaults; space_partitioning.json parses."""
    import glob
    import json
    import os
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    presets = glob.glob(os.path.join(root, "*_algorithm.config"))
    assert len(presets) >= 6
    for path in presets:
        cfg = load_config(path)
        assert "constrained_sampling_mode" in cfg
    legacy = load_config(os.path.join(root, "legacy_sampling_algorithm.config"))
    assert legacy["constrained_sampling_mode"] == "random_discrete"
    assert legacy["n_random_samples"] == 100
    mgrd = load_config(os.path.join(root, "mgrd_sampling_algorithm.config"))
    assert mgrd["n_random_samples"] == 1000
    with open(os.path.join(root, "space_partitioning.json")) as f:
        sp = json.load(f)
    assert sp["n_subdivisions_per_level"] == 4


def test_trajectory_set_exhausted_joint_drops_out(setup):
    """A joint whose advancing arc runs off the end of its own spline drops
    out of BOTH centroids (reference trajectory_set_constraint.py:95-100) —
    late-sample residuals must not be pulled toward its stale endpoint."""
    from morphablegraphs_tpu.ops import bspline, spline_path

    g, skel = setup
    prim = g.nodes[("walk", "leftStance")].primitive
    s = jnp.zeros(prim.n_latent)
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    coeffs = np.asarray(compiled.aligned_coeffs(prim, s, sc))
    t = np.linspace(0, prim.n_canonical_frames - 1, compiled.TRAJ_SAMPLES)
    frames = np.asarray(bspline.evaluate(jnp.asarray(coeffs), prim.knots_s,
                                         jnp.asarray(t)))
    pos = np.asarray(sk.fk_positions(skel, jnp.asarray(frames)))
    hips = pos[:, skel.index_of("Hips")]
    head = pos[:, skel.index_of("Head")]
    # Hips follow their own full path; Head gets a SHORT spline (first 3
    # samples only) displaced far sideways -> its arc exhausts early
    trajs = [spline_path.build(hips, max_points=32),
             spline_path.build(head[:3] + np.array([200.0, 0, 0]),
                               max_points=32)]
    sc_ts = compiled.set_trajectory_set_constraint(
        sc, skel, ["Hips", "Head"], trajs)
    res = np.asarray(compiled.evaluate_residuals(skel, prim, sc_ts, s,
                                                 use_ts=True))
    ts = res[compiled._OFF_TS:]
    # early samples: Head active and displaced -> centroid error ~100
    assert ts[0] > 50.0, ts
    # late samples: Head exhausted, dropped -> Hips-only error, small
    assert ts[-1] < 20.0, ts


def test_lm_family_gate_neutralizes_compiled_out_slots(setup):
    """Residual families compiled out by use_* flags must not keep their
    active-mask slots on in the LM objective (each such slot degenerates to
    quality_scale * nll, over-weighting naturalness ~20x)."""
    from morphablegraphs_tpu.synthesis import generator

    g, skel = setup
    prim = g.nodes[("walk", "leftStance")].primitive
    rng = np.random.default_rng(1)
    s0 = jnp.asarray(rng.normal(size=prim.n_latent).astype(np.float32))
    last = float(prim.n_canonical_frames - 1)
    base = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    base = compiled.set_keyframe_constraint(
        base, 0, skel, "Hips", last, position=np.array([5.0, np.nan, 20.0]))
    # CA slot set but evaluated with use_ca=False
    sc_ca = compiled.set_ca_constraint(base, skel, "Head", [50.0, 0, 50.0])
    s_a, e_a = generator.refine_lm(skel, prim, sc_ca, s0, n_iters=4,
                                   use_ca=False)
    s_b, e_b = generator.refine_lm(skel, prim, base, s0, n_iters=4,
                                   use_ca=False)
    # gated: the phantom CA slot contributes nothing -> identical optimum
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b),
                               atol=1e-5, rtol=1e-5)
    gate = compiled.static_family_gate(use_ca=False, use_ts=False)
    assert gate[compiled._OFF_CA:compiled._OFF_TRAJ].sum() == 0
    assert gate[compiled._OFF_TS:].sum() == 0
    assert gate[:compiled._OFF_CA].sum() == compiled._OFF_CA
