"""Fully-jitted constrained trajectory-following walk (device-side planner)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.ops import spline_path
from morphablegraphs_tpu.synthesis import constrained_walk as cw
from morphablegraphs_tpu.synthesis import walk as walk_mod

from fixtures import make_graph_dict


@pytest.fixture(scope="module")
def stacked():
    g = graph_mod.build_graph_from_dict(make_graph_dict())
    return graph_mod.stack_graph(g)


def _path(points):
    return spline_path.build(np.asarray(points, np.float32),
                             unconstrained_dims=(1,))


def test_constrained_walk_follows_path(stacked):
    start = stacked.node_id(("walk", "beginLeftStance"))
    path = _path([[0, 0, 0], [10, 0, 60], [15, 0, 120], [15, 0, 180]])
    segs, nf, ids, errs = cw.constrained_walk(
        jax.random.PRNGKey(0), stacked, path, start, n_steps=10,
        max_step_frames=64, n_samples=64)
    flat = walk_mod.flatten_segments(segs, nf)
    assert len(flat) > 50
    assert not np.any(np.isnan(flat))
    # walk progresses along the path: final root near the path end (XZ)
    end = np.array([15.0, 180.0])
    final = flat[-1][[0, 2]]
    d_end = np.linalg.norm(final - end)
    assert d_end < 60.0, (final, d_end)
    # and strictly closer than the start was
    assert d_end < np.linalg.norm(end) * 0.35
    # per-step constraint errors recorded
    active = np.asarray(nf) > 0
    assert np.all(np.isfinite(np.asarray(errs)[active]))


def test_constrained_walk_beats_random_walk(stacked):
    """Constrained selection must track the path better than random walks."""
    start = stacked.node_id(("walk", "beginLeftStance"))
    path = _path([[0, 0, 0], [-20, 0, 50], [-40, 0, 100]])

    def mean_path_dist(flat):
        pts = np.asarray(spline_path.point_at_arc_length(
            path, jnp.linspace(0.0, float(np.asarray(path.full_arc_length)), 30)))
        d = []
        for f in flat[:: max(1, len(flat) // 30)]:
            d.append(np.min(np.linalg.norm(
                (pts - f[:3]) * np.array([1, 0, 1]), axis=1)))
        return float(np.mean(d))

    segs, nf, _, _ = cw.constrained_walk(jax.random.PRNGKey(1), stacked, path,
                                         start, n_steps=8, max_step_frames=64,
                                         n_samples=64)
    flat_c = walk_mod.flatten_segments(segs, nf)
    segs_r, nf_r, _, _ = walk_mod.random_walk_segments(
        jax.random.PRNGKey(1), stacked, start, n_steps=8, max_step_frames=64)
    flat_r = walk_mod.flatten_segments(segs_r, nf_r)
    d_c = mean_path_dist(flat_c)
    d_r = mean_path_dist(flat_r)
    assert d_c < d_r, (d_c, d_r)


def test_constrained_walk_crowd(stacked):
    start = stacked.node_id(("walk", "beginLeftStance"))
    paths = [
        _path([[0, 0, 0], [20, 0, 60], [40, 0, 120]]),
        _path([[0, 0, 0], [-20, 0, 60], [-40, 0, 120]]),
        _path([[0, 0, 0], [0, 0, 70], [0, 0, 140]]),
        _path([[0, 0, 0], [30, 0, 40], [60, 0, 80]]),
    ]
    stacked_paths = cw.stack_paths(paths)
    segs, nf, ids, errs = cw.constrained_walk_crowd(
        jax.random.PRNGKey(2), stacked, stacked_paths, start, n_chars=4,
        n_steps=6, max_step_frames=64, n_samples=32)
    assert segs.shape[0] == 4
    for c in range(4):
        flat = walk_mod.flatten_segments(segs[c], nf[c])
        assert not np.any(np.isnan(flat))
        # each character heads toward its own path's end direction
    # characters diverge (different paths -> different final roots)
    finals = [walk_mod.flatten_segments(segs[c], nf[c])[-1][:3] for c in range(4)]
    assert np.std([f[0] for f in finals]) > 5.0
