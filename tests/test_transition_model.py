"""Conditional-GMM transition models (the reference's GPM slot,
motion_state_graph_node.py:232-271 / motion_primitive_generator.py:190-214).
The reference's own implementation is dead code (unshipped `gp` package);
these tests pin the native replacement's math to closed-form Gaussian
conditioning and its integration to the reference's use_transition_model
control flow."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.models import transition_model as tm
from morphablegraphs_tpu.ops import gmm as gmm_ops


def _joint_gaussian(rng, dx, dy):
    d = dx + dy
    a = rng.standard_normal((d, d)) * 0.4
    cov = a @ a.T + np.eye(d) * 0.5
    mean = rng.standard_normal(d)
    return mean, cov


def test_single_component_matches_closed_form():
    """K=1: predict() must equal exact linear-Gaussian conditioning."""
    rng = np.random.default_rng(0)
    dx, dy = 3, 4
    mean, cov = _joint_gaussian(rng, dx, dy)
    model = tm.from_joint(np.array([1.0]), mean[None], cov[None], n_in=dx)
    x = rng.standard_normal(dx).astype(np.float32)
    pred = tm.predict(model, jnp.asarray(x))
    s_xx = cov[:dx, :dx]
    s_yx = cov[dx:, :dx]
    mu_ref = mean[dx:] + s_yx @ np.linalg.solve(s_xx, x - mean[:dx])
    cov_ref = cov[dx:, dx:] - s_yx @ np.linalg.solve(s_xx, s_yx.T)
    np.testing.assert_allclose(np.asarray(pred.means[0]), mu_ref,
                               atol=1e-4, rtol=1e-4)
    got_cov = np.asarray(pred.cov_chol[0]) @ np.asarray(pred.cov_chol[0]).T
    np.testing.assert_allclose(got_cov, cov_ref, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(float(pred.weights[0]), 1.0, atol=1e-6)


def test_component_reweighting():
    """Conditioning on x near one component's x-marginal concentrates the
    predicted weights there."""
    rng = np.random.default_rng(1)
    dx, dy = 2, 2
    means = np.array([[-5.0, -5.0, 1.0, 0.0], [5.0, 5.0, -1.0, 0.0]])
    cov = np.tile(np.eye(dx + dy), (2, 1, 1))
    model = tm.from_joint(np.array([0.5, 0.5]), means, cov, n_in=dx)
    pred = tm.predict(model, jnp.asarray([-5.0, -5.0]))
    w = np.asarray(pred.weights)
    assert w[0] > 0.999 and w[1] < 1e-3
    # the conditional mean of an identity-cov component is just mu_y
    np.testing.assert_allclose(np.asarray(pred.means[0]), [1.0, 0.0],
                               atol=1e-5)


def test_fit_recovers_linear_map():
    """Fit on y = A x + b + noise pairs: the conditional mean must track
    the linear map (GMM regression sanity)."""
    rng = np.random.default_rng(2)
    dx, dy, n = 3, 2, 4000
    a = rng.standard_normal((dy, dx))
    b = rng.standard_normal(dy)
    x = rng.standard_normal((n, dx))
    y = x @ a.T + b + 0.05 * rng.standard_normal((n, dy))
    model = tm.fit_transition_model(x, y, n_components=1, seed=0)
    for q in rng.standard_normal((5, dx)):
        pred = tm.predict(model, jnp.asarray(q, jnp.float32))
        mu = np.asarray(pred.means[0])
        np.testing.assert_allclose(mu, a @ q + b, atol=0.15)
    # sampling stays near the conditional mean (small noise regime)
    s = np.asarray(tm.predict_parameters(jax.random.PRNGKey(0), model,
                                         jnp.zeros(dx), n=256))
    np.testing.assert_allclose(s.mean(axis=0), b, atol=0.2)


def test_json_roundtrip():
    rng = np.random.default_rng(3)
    mean, cov = _joint_gaussian(rng, 3, 2)
    model = tm.from_joint(np.array([1.0]), mean[None], cov[None], n_in=3)
    back = tm.from_json(json.loads(json.dumps(tm.to_json(model))))
    x = jnp.asarray(rng.standard_normal(3), jnp.float32)
    p1, p2 = tm.predict(model, x), tm.predict(back, x)
    np.testing.assert_allclose(np.asarray(p1.means), np.asarray(p2.means),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1.weights),
                               np.asarray(p2.weights), atol=1e-6)
    with pytest.raises(ValueError, match="unknown transition model"):
        tm.from_json({"type": "gpm"})


@pytest.fixture(scope="module")
def graph_with_models():
    from morphablegraphs_tpu.models import graph as graph_mod
    from morphablegraphs_tpu.models import skeleton as sk
    from morphablegraphs_tpu.utils.synthetic import TEST_BVH, make_graph_dict
    graph = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    graph.skeleton = skel
    tm.fit_transition_models_for_graph(graph, n_pairs=300, n_components=2)
    return graph


def test_fit_models_for_graph_and_zip_roundtrip(graph_with_models, tmp_path):
    from morphablegraphs_tpu.models import graph as graph_mod
    from morphablegraphs_tpu.models.graph import NODE_TYPE_STANDARD
    from morphablegraphs_tpu.models.zip_writer import write_graph_zip
    from morphablegraphs_tpu.utils.synthetic import make_graph_dict
    graph = graph_with_models
    # every standard edge got a model
    edges = [(f, t) for f, n in graph.nodes.items()
             for t in n.edges_of_type(NODE_TYPE_STANDARD)]
    assert edges
    for f, t in edges:
        assert graph.nodes[f].has_transition_model(t)
        pred = graph.nodes[f].predict_gmm(
            t, jnp.zeros(graph.nodes[f].primitive.n_latent))
        assert np.all(np.isfinite(np.asarray(pred.means)))
    # zip round-trip through the reference layout's transition_models/ dir
    gd = make_graph_dict()
    tm_entries = [{"from": f"{f[0]}_{f[1]}", "to": f"{t[0]}_{t[1]}",
                   "model": tm.to_json(graph.nodes[f].transition_models[t])}
                  for f, t in edges]
    actions = {a: {"nodes": {mp: d["mm"] for mp, d in ad["nodes"].items()},
                   "info": ad["info"]}
               for a, ad in gd["subgraphs"].items()}
    path = str(tmp_path / "g.zip")
    write_graph_zip(path, graph.skeleton, actions, gd["transitions"],
                    start_node=("walk", "beginLeftStance"),
                    transition_models=tm_entries)
    g2 = graph_mod.load_graph(path)
    for f, t in edges:
        assert g2.nodes[f].has_transition_model(t), (f, t)
        x = jnp.zeros(graph.nodes[f].primitive.n_latent)
        p1 = graph.nodes[f].predict_gmm(t, x)
        p2 = g2.nodes[f].predict_gmm(t, x)
        np.testing.assert_allclose(np.asarray(p1.means),
                                   np.asarray(p2.means), atol=1e-5)


def test_motion_generator_uses_transition_model(graph_with_models):
    """use_transition_model routes the candidate pool through the
    conditioned mixture after the first step (reference
    motion_primitive_generator.py:195-198)."""
    from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
    from morphablegraphs_tpu.utils.config import default_config
    cfg = default_config()
    cfg["use_transition_model"] = True
    cfg["n_random_samples"] = 16
    cfg["lm_iterations"] = 2
    gen = MotionGenerator(graph_with_models, cfg, seed=0)
    calls = []
    orig = tm.predict_parameters

    def spy(key, model, x, n=1):
        calls.append(n)
        return orig(key, model, x, n=n)

    mg_input = {
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [{
            "action": "walk",
            "constraints": [{"joint": "Hips", "trajectoryConstraints": [
                {"position": [0.0, None, 0.0]},
                {"position": [5.0, None, 40.0]}]}],
        }],
    }
    try:
        tm.predict_parameters = spy
        res = gen.generate_motion(mg_input,
                                  activate_coordinate_transform=False)
    finally:
        tm.predict_parameters = orig
    assert res.frames is not None and np.all(np.isfinite(res.frames))
    # the first step has no previous latent; every later step predicts
    assert len(calls) >= 1 and all(n == 16 for n in calls)


def test_match_boundary_poses_matches_bruteforce():
    """The matmul-expansion pairing (one [N, N] grid) must equal the naive
    per-pair squared-distance argmin."""
    rng = np.random.default_rng(3)
    xe = rng.normal(size=(40, 7)).astype(np.float32)
    yst = rng.normal(size=(50, 7)).astype(np.float32)
    got = np.asarray(tm._match_boundary_poses(jnp.asarray(xe),
                                              jnp.asarray(yst)))
    want = np.argmin(
        ((xe[:, None, :] - yst[None, :, :]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(got, want)
