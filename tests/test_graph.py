"""Graph build / stack / random-walk-scan tests (SURVEY.md §3.5 parity)."""

import json
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.synthesis import walk as walk_mod

from morphablegraphs_tpu.models import skeleton as sk

from fixtures import TEST_BVH, make_graph_dict


@pytest.fixture(scope="module")
def graph():
    return graph_mod.build_graph_from_dict(make_graph_dict())


@pytest.fixture(scope="module")
def stacked(graph):
    return graph_mod.stack_graph(graph)


def test_graph_structure(graph):
    assert set(graph.node_groups) == {"walk"}
    assert ("walk", "leftStance") in graph.nodes
    assert graph.nodes[("walk", "beginLeftStance")].node_type == graph_mod.NODE_TYPE_START
    assert graph.nodes[("walk", "endRightStance")].node_type == graph_mod.NODE_TYPE_END
    assert graph.nodes[("walk", "leftStance")].node_type == graph_mod.NODE_TYPE_STANDARD
    # transition typing (reference motion_state_graph_loader.py:255-281)
    edges = graph.nodes[("walk", "leftStance")].outgoing_edges
    assert edges[("walk", "rightStance")] == graph_mod.NODE_TYPE_STANDARD
    assert edges[("walk", "endRightStance")] == graph_mod.NODE_TYPE_END
    assert graph.start_node == ("walk", "beginLeftStance")
    # stats computed
    assert graph.nodes[("walk", "leftStance")].average_step_length > 0
    assert graph.nodes[("walk", "leftStance")].n_standard_transitions == 1


def test_stacked_tables(graph, stacked):
    assert stacked.n_nodes == 4
    i = stacked.node_id(("walk", "leftStance"))
    j = stacked.node_id(("walk", "rightStance"))
    t_std = graph_mod.TRANSITION_TYPE_IDS[graph_mod.NODE_TYPE_STANDARD]
    assert bool(stacked.transitions[t_std, i, j])
    assert not bool(stacked.transitions[t_std, j, j])
    assert int(stacked.n_canonical[i]) == graph.nodes[("walk", "leftStance")].primitive.n_canonical_frames


def test_stacked_back_projection_matches_unstacked(graph, stacked):
    """Gathered/padded back-projection must equal the per-primitive path."""
    from morphablegraphs_tpu.models import primitive as prim_mod
    key = ("walk", "rightStance")
    prim = graph.nodes[key].primitive
    nid = stacked.node_id(key)
    rng = np.random.default_rng(0)
    s_small = rng.standard_normal(prim.n_latent).astype(np.float32) * 0.5
    # place into padded latent layout: alphas [0:k_s), gammas [k_s_max:...)
    s_pad = np.zeros(stacked.k_s_max + stacked.k_t_max, np.float32)
    s_pad[: prim.n_spatial] = s_small[: prim.n_spatial]
    s_pad[stacked.k_s_max: stacked.k_s_max + prim.n_time] = s_small[prim.n_spatial:]

    f1, n1, _ = prim_mod.back_project(prim, jnp.asarray(s_small), 96, use_time=True)
    f2, n2, _ = walk_mod.back_project_node(stacked, jnp.asarray(nid),
                                           jnp.asarray(s_pad), 96, use_time=True)
    assert int(n1) == int(n2)
    n = int(n1)
    np.testing.assert_allclose(np.asarray(f1)[:n], np.asarray(f2)[:n], atol=2e-3)


def test_random_walk_scan(stacked):
    key = jax.random.PRNGKey(0)
    start = stacked.node_id(("walk", "beginLeftStance"))
    buf, n_valid, node_ids, latents = walk_mod.random_walk(
        key, stacked, start, n_steps=5, max_step_frames=64)
    n_valid = int(n_valid)
    assert n_valid > 0
    frames = np.asarray(buf)[:n_valid]
    assert not np.any(np.isnan(frames))
    ids = np.asarray(node_ids)
    assert ids[0] == start
    # walk must end on the end node (or terminate earlier)
    end_id = stacked.node_id(("walk", "endRightStance"))
    assert end_id in ids or -1 in ids
    # seam continuity: no large root jumps between consecutive frames
    root = frames[:, :3]
    jumps = np.linalg.norm(np.diff(root, axis=0), axis=1)
    assert np.max(jumps) < 10.0, np.max(jumps)


def test_segment_walk_matches_concatenating_walk(stacked):
    """The scatter-free segment walk must be numerically identical to the
    buffer-concatenating walk (same keys -> same choices -> same frames)."""
    start = stacked.node_id(("walk", "beginLeftStance"))
    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        buf, nv, ids1, _ = walk_mod.random_walk(key, stacked, start,
                                                n_steps=5, max_step_frames=64)
        segs, nf, ids2, _ = walk_mod.random_walk_segments(
            key, stacked, start, n_steps=5, max_step_frames=64)
        flat = walk_mod.flatten_segments(segs, nf)
        ref = np.asarray(buf)[: int(nv)]
        assert len(flat) == int(nv)
        np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
        np.testing.assert_allclose(flat, ref, atol=1e-5)


def test_random_walk_crowd(stacked):
    key = jax.random.PRNGKey(1)
    start = stacked.node_id(("walk", "beginLeftStance"))
    buf, n_valid, node_ids, latents = walk_mod.random_walk_crowd(
        key, stacked, start, n_chars=8, n_steps=4, max_step_frames=64)
    assert buf.shape[0] == 8
    assert node_ids.shape == (8, 4)
    # different characters should get different walks/latents
    assert np.std(np.asarray(latents)[:, 0, 0]) > 0


def test_zip_roundtrip(tmp_path):
    """Write the graph in the reference's zip layout and load it back
    (reference utilities/zip_io.py format version 2)."""
    gd = make_graph_dict()
    zip_path = str(tmp_path / "graph.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        graph_def = {
            "formatVersion": 2.0,
            "transitions": gd["transitions"],
            "startNode": gd["startNode"],
        }
        zf.writestr("graph_definition.json", json.dumps(graph_def))
        from fixtures import TEST_BVH
        zf.writestr("skeleton.bvh", TEST_BVH)
        for mp_name, node in gd["subgraphs"]["walk"]["nodes"].items():
            zf.writestr(
                f"elementary_action_models/elementary_action_walk/walk_{mp_name}_mm.json",
                json.dumps(node["mm"]))
        zf.writestr(
            "elementary_action_models/elementary_action_walk/meta_information.json",
            json.dumps(gd["subgraphs"]["walk"]["info"]))
    g = graph_mod.load_graph(zip_path)
    assert set(g.node_groups) == {"walk"}
    assert ("walk", "leftStance") in g.nodes
    assert g.nodes[("walk", "beginLeftStance")].node_type == graph_mod.NODE_TYPE_START
    assert g.skeleton is not None
    assert g.skeleton.animated_joints == ("Hips", "Spine", "Head", "Leg")
    assert g.start_node == ("walk", "beginLeftStance")


def _make_reference_pickle_tree(rng, n=64, dim=5):
    """Pickle a stub of the reference's ClusterTree object graph under the
    reference's module paths (morphablegraphs.space_partitioning.*) without
    the reference package: fake modules are registered only long enough to
    pickle, then removed — loading must NOT need them."""
    import pickle
    import sys
    import types

    data = rng.standard_normal((n, dim))
    mods = {}
    for mod_name in ["morphablegraphs",
                     "morphablegraphs.space_partitioning",
                     "morphablegraphs.space_partitioning.cluster_tree",
                     "morphablegraphs.space_partitioning.cluster_tree_node",
                     "morphablegraphs.space_partitioning.kdtree_wrapper_node",
                     "morphablegraphs.space_partitioning.kdtree"]:
        mods[mod_name] = types.ModuleType(mod_name)

    def make_cls(mod_name, cls_name):
        cls = type(cls_name, (object,), {"__module__": mod_name})
        setattr(mods[mod_name], cls_name, cls)
        return cls

    CT = make_cls("morphablegraphs.space_partitioning.cluster_tree", "ClusterTree")
    CTN = make_cls("morphablegraphs.space_partitioning.cluster_tree_node", "ClusterTreeNode")
    KDW = make_cls("morphablegraphs.space_partitioning.kdtree_wrapper_node", "KDTreeWrapper")
    KDT = make_cls("morphablegraphs.space_partitioning.kdtree", "KDTree")

    def kd_wrapper(indices):
        w = KDW.__new__(KDW)
        t = KDT.__new__(KDT)
        # reference kdtree.construct stores raw point LISTS (kdtree.py:87-89)
        t.data = data[indices].tolist()
        t.root = None
        w.kdtree = t
        w.dim = dim
        w.type = "kd_tree_wrapper"
        return w

    def ctn(indices, clusters, leaf, depth):
        node = CTN.__new__(CTN)
        node.id = "x"
        node.clusters = clusters
        node.mean = data[indices].mean(axis=0)
        node.leaf = leaf
        node.type = "leaf" if leaf else "inner"
        node.depth = depth
        node.indices = None  # store_indices=False path: recover from leaves
        return node

    half = n // 2
    left = ctn(np.arange(half), [kd_wrapper(np.arange(half))], True, 1)
    right = ctn(np.arange(half, n), [kd_wrapper(np.arange(half, n))], True, 1)
    root = ctn(np.arange(n), [left, right], False, 0)
    tree = CT.__new__(CT)
    tree.data = data
    tree.root = root
    tree.n_subdivisions = 2
    tree.max_level = 2
    sys.modules.update(mods)
    try:
        payload = pickle.dumps(tree, protocol=2)
    finally:
        for k in mods:
            sys.modules.pop(k, None)
    return payload, data


def test_pickle_cluster_tree_ingestion(tmp_path):
    """Legacy pickled cluster trees hydrate node.cluster_tree from a zip and
    cluster_tree_search finds the true argmin (reference zip_io.py:210-223;
    VERDICT r1 item 5)."""
    from morphablegraphs_tpu.construct.space_partitioning import (
        load_reference_pickle_tree)

    rng = np.random.default_rng(4)
    payload, data = _make_reference_pickle_tree(rng)
    tree = load_reference_pickle_tree(payload)
    assert tree.data.shape == data.shape
    np.testing.assert_allclose(tree.data, data, atol=1e-6)
    # all indices recovered through the point-matching path
    got = np.sort(np.concatenate([c.indices for c in tree.root.children]))
    np.testing.assert_array_equal(got, np.arange(len(data)))
    # beam search with a simple objective matches brute force
    target = data[17]
    obj = lambda x: np.linalg.norm(np.asarray(x) - target, axis=-1)
    err, best = tree.find_best_example(obj, n_candidates=2)
    assert err <= 1e-6  # the exact row is reachable

    # --- through a legacy zip (pck entry, no json tree) -------------------
    gd = make_graph_dict()
    zip_path = str(tmp_path / "legacy.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("graph_definition.json", json.dumps({
            "formatVersion": 2.0, "transitions": gd["transitions"],
            "startNode": gd["startNode"]}))
        from fixtures import TEST_BVH
        zf.writestr("skeleton.bvh", TEST_BVH)
        for mp_name, node in gd["subgraphs"]["walk"]["nodes"].items():
            base = f"elementary_action_models/elementary_action_walk/walk_{mp_name}"
            zf.writestr(base + "_mm.json", json.dumps(node["mm"]))
            zf.writestr(base + "_cluster_tree.pck", payload)
        zf.writestr(
            "elementary_action_models/elementary_action_walk/meta_information.json",
            json.dumps(gd["subgraphs"]["walk"]["info"]))
    g = graph_mod.load_graph(zip_path)
    node = g.nodes[("walk", "leftStance")]
    assert node.cluster_tree is not None
    assert node.cluster_tree.data.shape == data.shape

    # cluster_tree_search mode consumes the hydrated tree: candidates come
    # from the pickled tree's data, not GMM samples.  (The pickled fixture's
    # dim (5) < the primitive's latent dim, so pad — real packages store
    # full-latent samples; this only checks the search path wiring.)
    from morphablegraphs_tpu.models import skeleton as sk_mod
    from morphablegraphs_tpu.synthesis import generator
    from morphablegraphs_tpu.constraints import compiled
    import jax as _jax
    import jax.numpy as _jnp

    skel = g.skeleton
    prim = node.primitive
    cands = np.zeros((len(data), prim.n_latent), np.float32)
    cands[:, : data.shape[1]] = data
    node.cluster_tree.data = cands
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    sc = compiled.set_keyframe_constraint(sc, 0, skel, "Hips",
                                          prim.n_canonical_frames - 1,
                                          position=[5.0, np.nan, 20.0])
    cfg = {"constrained_sampling_mode": "cluster_tree_search",
           "local_optimization_mode": "none"}
    s, err = generator.generate_constrained_sample(
        _jax.random.PRNGKey(0), skel, prim, sc, cfg,
        cluster_tree=node.cluster_tree)
    # the selected latent is one of the tree's stored samples
    d = np.abs(cands - np.asarray(s)).sum(axis=1)
    assert d.min() < 1e-5
    assert np.isfinite(float(err))


def test_pickle_cluster_tree_rejects_foreign_classes():
    """The restricted unpickler must refuse non-numpy, non-reference class
    references (pickle gadget hygiene)."""
    import pickle

    from morphablegraphs_tpu.construct.space_partitioning import (
        load_reference_pickle_tree)

    payload = pickle.dumps({"exploit": __import__("os").system})
    try:
        load_reference_pickle_tree(payload)
        raised = False
    except Exception:
        raised = True
    assert raised

    # builtins gadgets (eval/exec/getattr) must be refused too — a blanket
    # builtins allowlist would be arbitrary code execution
    for gadget in (eval, exec, getattr, __import__):
        try:
            load_reference_pickle_tree(pickle.dumps({"g": gadget}))
            raised = False
        except Exception:
            raised = True
        assert raised, f"unpickler accepted builtins gadget {gadget}"


def test_zip_roundtrip_v1_v3_and_underscore_names(tmp_path):
    """Review fixes: v1 layout parses; v3 packages keep their skeleton;
    underscore action names survive the zip round trip with transitions."""
    from morphablegraphs_tpu.models.zip_writer import write_graph_zip
    skel, _ = sk.load_bvh(TEST_BVH)
    gd = make_graph_dict()
    nodes = {mp: n["mm"] for mp, n in gd["subgraphs"]["walk"]["nodes"].items()}
    info = gd["subgraphs"]["walk"]["info"]

    # v1 layout (2-part paths)
    p1 = write_graph_zip(str(tmp_path / "v1"), skel, {"walk": {"nodes": nodes,
                                                               "info": info}},
                         gd["transitions"], format_version=1.0)
    g1 = graph_mod.load_graph(p1)
    assert ("walk", "leftStance") in g1.nodes and g1.skeleton is not None

    # v3 header with skeleton.bvh must still yield a skeleton
    p3 = write_graph_zip(str(tmp_path / "v3"), skel, {"walk": {"nodes": nodes,
                                                               "info": info}},
                         gd["transitions"], format_version=3.0)
    g3 = graph_mod.load_graph(p3)
    assert g3.skeleton is not None
    assert g3.nodes[("walk", "leftStance")].outgoing_edges

    # underscore-bearing action name: nodes AND transitions survive
    uname = "pick_both"
    trans = {f"{uname}_leftStance": [f"{uname}_rightStance"]}
    pu = write_graph_zip(str(tmp_path / "u"), skel,
                         {uname: {"nodes": nodes, "info": info}}, trans)
    gu = graph_mod.load_graph(pu)
    assert (uname, "leftStance") in gu.nodes
    assert (uname, "rightStance") in gu.nodes[(uname, "leftStance")].outgoing_edges


def test_packaged_stats_are_authoritative():
    """Packaged per-node .stats load and are NOT clobbered by the sampled
    recompute; mm-file keyframes survive meta annotations."""
    gd = make_graph_dict()
    node = gd["subgraphs"]["walk"]["nodes"]["leftStance"]
    node["stats"] = {"average_step_length": 123.5, "n_standard_transitions": 7}
    node["mm"]["keyframes"] = {"contact_label": 11}
    gd["subgraphs"]["walk"]["info"]["annotations"] = {"leftStance": {"meta_label": 3}}
    g = graph_mod.build_graph_from_dict(gd)
    assert g.nodes[("walk", "leftStance")].average_step_length == 123.5
    group = g.node_groups["walk"]
    # both label sources resolvable, no duplicate map entries
    assert group.map_label_to_keyframe("leftStance", "contact_label", 50) == 11
    assert group.map_label_to_keyframe("leftStance", "meta_label", 50) == 3
    assert group.label_to_motion_primitive_map["contact_label"] == ["leftStance"]


def test_skeleton_json_loader():
    from morphablegraphs_tpu.models.skeleton import load_skeleton_json
    data = {"root": "Hips", "frame_time": 1 / 60,
            "animated_joints": ["Hips", "Spine"],
            "nodes": {
                "Hips": {"offset": [0, 90, 0], "children": ["Spine"]},
                "Spine": {"offset": [0, 20, 0], "children": ["Head"]},
                "Head": {"offset": [0, 15, 0], "children": []},
            }}
    skel = load_skeleton_json(data)
    assert skel.node_names == ("Hips", "Spine", "Head")
    assert skel.parents == (-1, 0, 1)
    assert skel.animated_joints == ("Hips", "Spine")
    assert skel.n_frame_params == 11
    assert abs(skel.frame_time - 1 / 60) < 1e-9


def test_random_walk_step_count(graph):
    import random as _random
    walk = graph.generate_random_walk(jax.random.PRNGKey(0), "walk", 3,
                                      _random.Random(1))
    # start + 3 standard targets + end (when transitions allow)
    assert len(walk) == 5


def test_pickle_cluster_tree_rejects_numpy_gadgets():
    """The numpy allowlist is name-level: numpy.ctypeslib.load_library (a
    during-unpickling code-execution gadget) must be refused while real
    array pickles still load."""
    import pickle

    import numpy as _np

    from morphablegraphs_tpu.construct.space_partitioning import (
        load_reference_pickle_tree)

    class Evil:
        def __reduce__(self):
            return (_np.ctypeslib.load_library, ("libevil", "/tmp"))

    try:
        load_reference_pickle_tree(pickle.dumps(Evil()))
        raised = False
    except pickle.UnpicklingError:
        raised = True
    except Exception as e:  # anything else means the gadget RAN
        raise AssertionError(f"gadget executed: {e}")
    assert raised


def test_native_cluster_tree_zip_roundtrip(tmp_path):
    """Trees built by the mg-tpu cluster-trees CLI (native ClusterTree.save
    layout: JSON meta + raw f32 .data sidecar) must survive the zip round
    trip and hydrate node.cluster_tree on load."""
    from morphablegraphs_tpu.construct.space_partitioning import (
        ClusterTree, build_cluster_tree_for_primitive)
    from morphablegraphs_tpu.models.zip_writer import write_graph_zip

    gd = make_graph_dict()
    graph = graph_mod.build_graph_from_dict(gd)
    skel, _ = sk.load_bvh(TEST_BVH)
    prim = graph.nodes[("walk", "leftStance")].primitive
    tree = build_cluster_tree_for_primitive(
        jax.random.PRNGKey(0), prim, n_samples=64, n_subdivisions=2,
        max_level=2)
    nodes = {mp: n["mm"] for mp, n in gd["subgraphs"]["walk"]["nodes"].items()}
    info = gd["subgraphs"]["walk"]["info"]
    path = write_graph_zip(
        str(tmp_path / "native_tree"), skel,
        {"walk": {"nodes": nodes, "info": info,
                  "cluster_trees": {"leftStance": tree}}},
        gd["transitions"], start_node=gd["startNode"])
    g = graph_mod.load_graph(path)
    loaded = g.nodes[("walk", "leftStance")].cluster_tree
    assert isinstance(loaded, ClusterTree)
    np.testing.assert_allclose(loaded.data, tree.data, atol=1e-6)
    assert len(loaded.root.children) == len(tree.root.children)
