"""Cluster tree / latent search tests (BASELINE.md config 4: search result
quality >= beam-search parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.construct import space_partitioning as sp
from morphablegraphs_tpu.models import primitive as prim_mod

from fixtures import make_legacy_model_json


@pytest.fixture(scope="module")
def prim():
    return prim_mod.load_primitive_json(make_legacy_model_json(seed=0))


@pytest.fixture(scope="module")
def tree(prim):
    key = jax.random.PRNGKey(0)
    return sp.build_cluster_tree_for_primitive(key, prim, n_samples=2000,
                                               max_level=3)


def _make_objective(target):
    """Toy objective: distance of latent to a target vector."""
    t = jnp.asarray(target, jnp.float32)

    @jax.jit
    def batched(x):
        return jnp.linalg.norm(x - t, axis=-1)

    return batched


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((100, 2)) * 0.2 + [5, 0]
    b = rng.standard_normal((100, 2)) * 0.2 + [-5, 0]
    x = np.concatenate([a, b])
    labels = sp.kmeans(np.random.default_rng(1), x.astype(np.float32), 2)
    assert len(np.unique(labels[:100])) == 1
    assert len(np.unique(labels[100:])) == 1
    assert labels[0] != labels[150]


def test_tree_structure(tree):
    assert tree.root is not None
    assert not tree.root.is_leaf
    # all indices partitioned
    def collect(node):
        if node.is_leaf:
            return list(node.indices)
        out = []
        for c in node.children:
            out += collect(c)
        return out
    leaf_indices = collect(tree.root)
    assert sorted(leaf_indices) == list(range(len(tree.data)))


def test_beam_search_close_to_exhaustive(tree):
    target = np.asarray(tree.data[123])
    obj = _make_objective(target)
    err_ex, best_ex = sp.search_best_exhaustive(obj, jnp.asarray(tree.data))
    assert float(err_ex) < 1e-5  # finds the exact stored sample
    err_tree, best_tree = tree.find_best_example(obj, n_candidates=4)
    # beam search is approximate but must come close (reference parity bar)
    assert err_tree <= float(jnp.mean(obj(jnp.asarray(tree.data)))) * 0.25


def test_exhaustive_beats_or_matches_beam(tree):
    rng = np.random.default_rng(2)
    for seed in range(3):
        target = rng.standard_normal(tree.data.shape[1]) * 0.5
        obj = _make_objective(target)
        err_ex, _ = sp.search_best_exhaustive(obj, jnp.asarray(tree.data))
        err_tree, _ = tree.find_best_example(obj, n_candidates=4)
        assert float(err_ex) <= err_tree + 1e-5


def test_save_load_roundtrip(tree, tmp_path):
    prefix = str(tmp_path / "test")
    tree.save(prefix)
    loaded = sp.ClusterTree.load(prefix, n_dims=tree.data.shape[1])
    np.testing.assert_allclose(loaded.data, tree.data, atol=1e-6)
    obj = _make_objective(np.asarray(tree.data[7]))
    e1, _ = tree.find_best_example(obj)
    e2, _ = loaded.find_best_example(obj)
    assert abs(e1 - e2) < 1e-5


def test_reference_json_format(tree):
    """The reference FeatureClusterTree JSON shape loads."""
    data = {
        "data": tree.data.tolist(),
        "features": tree.data[:, :2].tolist(),
        "options": {"n_subdivisions_per_level": 4, "n_levels": 3},
        "root": {"indices": list(range(len(tree.data))),
                 "children": [
                     {"indices": list(range(0, 1000)), "children": []},
                     {"indices": list(range(1000, 2000)), "children": []},
                 ]},
    }
    t2 = sp.load_reference_feature_tree_json(data)
    obj = _make_objective(np.asarray(tree.data[42]))
    err, best = t2.find_best_example(obj, n_candidates=2)
    assert err < 1.0


def test_knn_interpolation_matches_reference_weighting():
    """knn_interpolation vs a numpy replication of the reference's
    inverse-distance blend (kdtree_wrapper_node.py:58-84)."""
    rng = np.random.default_rng(11)
    data = rng.normal(size=(200, 6)).astype(np.float32)
    target = rng.normal(size=(6,)).astype(np.float32)

    def objective_batched(x):
        return jnp.sum((x - target) ** 2, axis=-1)

    k = 8
    err, blended = sp.knn_interpolation(objective_batched, jnp.asarray(data), k=k)
    # numpy oracle
    errors = np.sum((data - target) ** 2, axis=-1)
    order = np.argsort(errors)[:k]
    d = errors[order]
    influences = 1.0 / d[:-1] - 1.0 / d[-1]
    weights = influences / influences.sum()
    expected = (weights[:, None] * data[order[:-1]]).sum(axis=0)
    assert np.abs(np.asarray(blended) - expected).max() < 1e-4
    assert abs(float(err) - float(np.sum((expected - target) ** 2))) < 1e-4
    # the blend should not be worse than the k-th best sample
    assert float(err) <= float(d[-1]) + 1e-6


def test_knn_interpolation_k1_falls_back_to_best():
    rng = np.random.default_rng(12)
    data = rng.normal(size=(50, 4)).astype(np.float32)

    def objective_batched(x):
        return jnp.sum(x ** 2, axis=-1)

    err, best = sp.knn_interpolation(objective_batched, jnp.asarray(data), k=1)
    i = np.argmin(np.sum(data ** 2, axis=-1))
    assert np.allclose(np.asarray(best), data[i])


def test_cluster_tree_knn_search(tree):
    """find_best_example_knn returns a blended candidate at least as good as
    a random tree sample and close to the exhaustive optimum."""
    target = np.full(tree.data.shape[1], 0.5, np.float32)

    def objective_batched(x):
        return jnp.sum((x - target) ** 2, axis=-1)

    err_knn, blended = tree.find_best_example_knn(objective_batched, k=10)
    err_best, _ = sp.search_best_exhaustive(objective_batched,
                                            jnp.asarray(tree.data))
    assert blended.shape == (tree.data.shape[1],)
    # interpolation may beat the best single sample; never be much worse
    assert err_knn <= float(err_best) * 3 + 1e-3
