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


def test_rotate_events_for_detach(result, graph):
    """add_rotate_events pairs each place-action detach whose constraint
    carries an orientation with an empty 'rotate' event one frame earlier
    (reference keyframe_event_list.py:110-142)."""
    import copy
    res, mg_input = result
    modified = copy.deepcopy(mg_input)
    for a in modified["elementaryActions"]:
        if a["action"] == "placeRight":
            a["constraints"][0]["keyframeConstraints"][0]["orientation"] = \
                [0.0, 90.0, 0.0]
    parsed = read_input(modified, activate_coordinate_transform=True,
                        scale_factor=0.15)
    annotations = [a.annotations for a in parsed.actions]
    specs = [a.keyframe_constraints for a in parsed.actions]
    events = events_from_result(graph, res, annotations,
                                add_rotate_events=True,
                                constraints_per_action=specs)
    rotates = [e for e in events if e.event == "rotate"]
    assert len(rotates) == 1
    detach = [e for e in events if e.event == "detach"][0]
    r = rotates[0]
    assert r.keyframe == detach.keyframe - 1
    assert r.parameters["target"] == "part_8556319"
    assert r.parameters["joint"] == "RightHand"
    assert r.parameters["relativeOrientation"] == [None, None, None]
    assert r.parameters["referenceKeyframe"] == detach.keyframe
    assert all(v is not None for v in r.parameters["globalOrientation"])
    # no orientation on the constraint -> no rotate event (reference :115-117)
    parsed0 = read_input(mg_input, activate_coordinate_transform=True,
                         scale_factor=0.15)
    events0 = events_from_result(
        graph, res, [a.annotations for a in parsed0.actions],
        add_rotate_events=True,
        constraints_per_action=[a.keyframe_constraints
                                for a in parsed0.actions])
    assert not [e for e in events0 if e.event == "rotate"]


def test_collision_vis_data_payload(graph):
    """create_ca_vis_data maps each active CA slot to the output keyframe
    where the joint passes closest to the target (reference
    keyframe_event_list.py:219-239)."""
    import jax.numpy as jnp
    from morphablegraphs_tpu.constraints import compiled
    from morphablegraphs_tpu.models.skeleton import fk_positions
    from morphablegraphs_tpu.serve.export import collision_vis_data_from_result
    from morphablegraphs_tpu.synthesis.motion_generator import GraphWalkEntry

    skel = graph.skeleton
    rng = np.random.default_rng(0)
    frames = np.zeros((12, skel.n_frame_params), np.float32)
    frames[:, 3] = 1.0
    for q0 in range(7, skel.n_frame_params, 4):
        frames[:, q0] = 1.0
    frames[:, 0] = np.arange(12)  # root walks along +x
    # CA target at the Head position of frame 7
    pts7 = np.asarray(fk_positions(skel, jnp.asarray(frames[7])))
    target = pts7[skel.index_of("Head")]
    sc = compiled.empty_step_constraints(skel, 12)
    sc = compiled.set_ca_constraint(sc, skel, "Head", target, slot=0)
    step = GraphWalkEntry(node_key=("walk", "leftStance"),
                          parameters=np.zeros(4, np.float32),
                          arc_length=0.0, start_frame=0, end_frame=11,
                          step_constraints=sc)
    result = type("R", (), {"steps": [step], "frames": frames})
    data = collision_vis_data_from_result(skel, result)
    assert data == {7: ["Head"]}


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
