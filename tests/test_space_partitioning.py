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
