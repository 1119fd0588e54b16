"""cluster_tree_search sampling mode end-to-end + planner collision hook."""

import numpy as np
import pytest

import jax

from morphablegraphs_tpu.construct.space_partitioning import build_cluster_tree_for_primitive
from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
from morphablegraphs_tpu.synthesis.state_planner import (MGStatePlanner,
                                                         MGStatePlanningSettings)
from morphablegraphs_tpu.utils.config import default_config

from fixtures import TEST_BVH, make_graph_dict


@pytest.fixture(scope="module")
def graph_with_trees():
    g = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    key = jax.random.PRNGKey(0)
    for node in g.nodes.values():
        key, sub = jax.random.split(key)
        node.cluster_tree = build_cluster_tree_for_primitive(
            sub, node.primitive, n_samples=500, max_level=2)
    return g


def test_cluster_tree_search_mode(graph_with_trees):
    """constrained_sampling_mode=cluster_tree_search uses the per-node trees
    (reference algorithm_configuration.py:239 default mode)."""
    cfg = default_config()
    cfg["constrained_sampling_mode"] = "cluster_tree_search"
    cfg["lm_iterations"] = 2
    gen = MotionGenerator(graph_with_trees, cfg, seed=0)
    mg_input = {
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [{
            "action": "walk",
            "constraints": [{"joint": "Hips", "trajectoryConstraints": [
                {"position": [0, None, 0]},
                {"position": [8, None, 60]}]}],
        }],
    }
    res = gen.generate_motion(mg_input, activate_coordinate_transform=False)
    assert res.frames is not None and len(res.frames) > 20
    assert not np.any(np.isnan(res.frames))
    assert res.stats["average_error"] < 100


def test_planner_collision_boundary(graph_with_trees):
    """Targets behind a blocked region are skipped (reference
    collision_boundary.check_trajectory semantics)."""
    blocked_region = lambda x, z: z > 50.0  # wall at z=50

    settings = MGStatePlanningSettings(n_samples=5, max_steps_per_target=4)
    p = MGStatePlanner(graph_with_trees, settings,
                       collision_boundary=blocked_region)
    p.generate_motion_states_from_action_sequence(
        [{"action": "walk", "controlPoints": [[0, 0, 40], [0, 0, 200]]}])
    n_blocked = len(p.state_queue)

    p2 = MGStatePlanner(graph_with_trees, settings)
    p2.generate_motion_states_from_action_sequence(
        [{"action": "walk", "controlPoints": [[0, 0, 40], [0, 0, 200]]}])
    n_free = len(p2.state_queue)
    # the blocked planner skips the far target -> strictly fewer states
    assert n_blocked < n_free
