"""Host-level random walk API + skeleton model maps + mirroring."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.models import skeleton_models as skm
from morphablegraphs_tpu.synthesis import graph_walk_io
from morphablegraphs_tpu.synthesis.motion_generator import GraphWalkEntry

from fixtures import TEST_BVH, WALK_BVH, make_graph_dict


@pytest.fixture(scope="module")
def graph():
    g = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    return g


def test_generate_random_walk(graph):
    walk = graph.generate_random_walk(jax.random.PRNGKey(0), "walk", 3,
                                      random.Random(1))
    assert len(walk) >= 2
    assert walk[0]["node_key"][1] == "beginLeftStance"
    assert walk[-1]["node_key"][1] == "endRightStance"
    # entries re-project to frames via the walk IO path
    steps = [GraphWalkEntry(node_key=e["node_key"], parameters=e["parameters"],
                            arc_length=0.0, start_frame=0, end_frame=0)
             for e in walk]
    frames = graph_walk_io.rebuild_frames_from_steps(graph, steps)
    assert frames.shape[0] > 30
    assert not np.any(np.isnan(frames))


def test_mirror_frames():
    skel, _ = sk.load_bvh(WALK_BVH)
    frames = np.zeros((4, skel.n_frame_params), np.float32)
    frames[:, :3] = [10.0, 90.0, 5.0]
    for j in range(skel.n_animated):
        frames[:, 3 + 4 * j] = 1.0
    # bend the LEFT knee distinctly
    sl = skel.quat_slice("LeftLeg")
    frames[:, sl] = [0.9239, 0.3827, 0, 0]  # 45 deg about x
    mirrored = skm.mirror_frames(skel, frames)
    # root x negated
    assert mirrored[0, 0] == -10.0
    # the RIGHT knee now carries the bend
    sr = skel.quat_slice("RightLeg")
    np.testing.assert_allclose(mirrored[:, sr],
                               np.tile([0.9239, 0.3827, 0, 0], (4, 1)),
                               atol=1e-5)
    # mirroring twice restores the original
    back = skm.mirror_frames(skel, mirrored)
    np.testing.assert_allclose(back, frames, atol=1e-5)


def test_mirror_preserves_ground_plane():
    """Mirrored walks stay on the ground (FK symmetry check)."""
    skel, _ = sk.load_bvh(WALK_BVH)
    rng = np.random.default_rng(0)
    frames = np.zeros((3, skel.n_frame_params), np.float32)
    frames[:, 1] = -5.0
    for j in range(skel.n_animated):
        q = rng.standard_normal(4) * 0.2 + np.array([1.0, 0, 0, 0])
        frames[:, 3 + 4 * j: 7 + 4 * j] = q / np.linalg.norm(q)
    mirrored = skm.mirror_frames(skel, frames)
    pos_o = np.asarray(sk.fk_positions(skel, jnp.asarray(frames)))
    pos_m = np.asarray(sk.fk_positions(skel, jnp.asarray(mirrored)))
    # left foot of the original matches the right foot of the mirror, x-negated
    lf = skel.index_of("LeftFoot")
    rf = skel.index_of("RightFoot")
    np.testing.assert_allclose(pos_m[:, rf, 1:], pos_o[:, lf, 1:], atol=1e-4)
    np.testing.assert_allclose(pos_m[:, rf, 0], -pos_o[:, lf, 0], atol=1e-4)
