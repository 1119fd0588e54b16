"""Graph-walk serialization / resume + statistics tests (SURVEY.md §5
checkpoint/resume)."""

import numpy as np
import pytest

from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.synthesis import graph_walk_io
from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
from morphablegraphs_tpu.utils.config import default_config

from fixtures import TEST_BVH, make_graph_dict


@pytest.fixture(scope="module")
def setup():
    g = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    cfg = default_config()
    cfg["n_random_samples"] = 15
    cfg["lm_iterations"] = 2
    gen = MotionGenerator(g, cfg, seed=0)
    mg_input = {
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [{
            "action": "walk",
            "constraints": [{"joint": "Hips", "trajectoryConstraints": [
                {"position": [0.0, None, 0.0]},
                {"position": [10.0, None, 70.0]}]}],
        }],
    }
    result = gen.generate_motion(mg_input, activate_coordinate_transform=False)
    return g, result


def test_walk_roundtrip(setup, tmp_path):
    g, result = setup
    path = str(tmp_path / "walk.json")
    graph_walk_io.save_graph_walk(path, result.steps)
    loaded = graph_walk_io.load_graph_walk(path)
    assert len(loaded) == len(result.steps)
    for a, b in zip(result.steps, loaded):
        assert a.node_key == b.node_key
        np.testing.assert_allclose(a.parameters, b.parameters, atol=1e-6)
        assert a.start_frame == b.start_frame


def test_resume_rebuilds_frames(setup, tmp_path):
    g, result = setup
    path = str(tmp_path / "walk.json")
    graph_walk_io.save_graph_walk(path, result.steps)
    loaded = graph_walk_io.load_graph_walk(path)
    frames = graph_walk_io.rebuild_frames_from_steps(g, loaded, use_time=True)
    assert frames.shape[0] > 10
    assert not np.any(np.isnan(frames))
    # same steps -> same motion as the original conversion (up to renumbering)
    assert abs(len(frames) - len(result.frames)) <= 2


def test_statistics_string(setup):
    g, result = setup
    stats = graph_walk_io.get_statistics_string(result)
    assert "average error" in stats
    assert "objective evaluations" in stats
    assert result.stats["objective_evaluations"] > 0
