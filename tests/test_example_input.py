"""The reference's examples/example_input.json through the FULL pipeline
(walk trajectory -> pickRight keyframe -> carryRight trajectory -> placeRight
keyframe + attach/detach annotations) — BASELINE config 3 integration."""

import json

import numpy as np
import pytest

from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.serve.export import events_from_result
from morphablegraphs_tpu.constraints.input_reader import read_input
from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
from morphablegraphs_tpu.utils.config import default_config

from fixtures import TEST_BVH, make_multi_action_graph_dict

EXAMPLE_INPUT = "/root/reference/examples/example_input.json"


@pytest.fixture(scope="module")
def graph():
    g = graph_mod.build_graph_from_dict(make_multi_action_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    return g


@pytest.fixture(scope="module")
def result(graph):
    with open(EXAMPLE_INPUT) as f:
        mg_input = json.load(f)
    cfg = default_config()
    cfg["n_random_samples"] = 20
    cfg["lm_iterations"] = 3
    # the reference input is at CAD scale (hundreds of cm over a long path);
    # scale down via the reader's scale factor by pre-dividing positions is
    # not part of the schema, so run with the synthetic-model scale as-is and
    # rely on trajectory following semantics
    gen = MotionGenerator(graph, cfg, seed=0)
    # scale the CAD-sized input down to the synthetic models' step scale
    return gen.generate_motion(mg_input, activate_coordinate_transform=True,
                               scale_factor=0.15), mg_input


def test_graph_has_all_actions(graph):
    for action in ("walk", "pickRight", "carryRight", "placeRight"):
        assert action in graph.node_groups, action
    # labels from model keyframes feed the label maps
    assert "start_contact" in graph.node_groups["pickRight"].label_to_motion_primitive_map
    assert "end_contact" in graph.node_groups["placeRight"].label_to_motion_primitive_map


def test_full_pipeline_runs(result):
    res, mg_input = result
    assert res.frames is not None and len(res.frames) > 30
    assert not np.any(np.isnan(res.frames))
    # all four actions produced steps
    actions = [a for a, _, _ in res.action_ranges]
    assert actions == ["walk", "pickRight", "carryRight", "placeRight"]
    # action ranges are contiguous and ordered
    for (_, s0, e0), (_, s1, e1) in zip(res.action_ranges, res.action_ranges[1:]):
        assert s1 >= s0


def test_events_extracted(result, graph):
    res, mg_input = result
    parsed = read_input(mg_input, activate_coordinate_transform=True,
                        scale_factor=0.15)
    annotations = [a.annotations for a in parsed.actions]
    events = events_from_result(graph, res, annotations)
    names = sorted(e.event for e in events)
    assert names == ["attach", "detach"]
    for e in events:
        assert 0 <= e.keyframe < len(res.frames)
        assert e.parameters.get("joint") == "RightHand"
