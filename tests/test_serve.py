"""Serve layer tests: REST API, CLI, state queue, interactive planner."""

import json
import os

import numpy as np
import pytest

from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.synthesis.state_planner import MGStatePlanner, MGStatePlanningSettings
from morphablegraphs_tpu.synthesis.state_queue import MGStateQueue, MotionState
from morphablegraphs_tpu.utils.config import default_config

from fixtures import TEST_BVH, make_graph_dict


@pytest.fixture(scope="module")
def graph():
    g = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    return g


@pytest.fixture(scope="module")
def ref_graph():
    from morphablegraphs_tpu.utils.synthetic import (
        REF_BVH, make_reference_scale_graph_dict)
    g = graph_mod.build_graph_from_dict(make_reference_scale_graph_dict())
    skel, _ = sk.load_bvh(REF_BVH)
    g.skeleton = skel
    return g


# ---------------------------------------------------------------------------
# state queue
# ---------------------------------------------------------------------------

def _frames(n, d=19, z0=0.0):
    f = np.zeros((n, d), np.float32)
    f[:, 2] = z0 + np.arange(n)
    for j in range(4):
        f[:, 3 + 4 * j] = 1.0
    return f


def test_state_queue_fifo(graph):
    q = MGStateQueue(graph.skeleton, 1 / 30)
    e1 = q.add_state(("walk", "a"), "start", _frames(10), None)
    e2 = q.add_state(("walk", "b"), "standard", _frames(10), e1.pose_buffer)
    assert len(q) == 2
    assert q.pop().node_key == ("walk", "a")
    assert q.pop().node_key == ("walk", "b")
    assert q.pop() is None


def test_state_queue_alignment(graph):
    q = MGStateQueue(graph.skeleton, 1 / 30)
    e1 = q.add_state(("walk", "a"), "start", _frames(10), None)
    # second clip far away -> must be aligned to the end of the first
    far = _frames(10, z0=500.0)
    e2 = q.add_state(("walk", "b"), "standard", far, e1.pose_buffer)
    seam_prev = e1.pose_buffer[-1][:3]
    seam_next = e2.state.frames[0][:3]
    assert np.linalg.norm(np.asarray(seam_next) - np.asarray(seam_prev)) < 1.0


def test_generate_idle_state(graph):
    """reference mg_state_queue.py:160-197: an idle clip enters the queue
    aligned to the pose buffer with node type 'idle'."""
    q = MGStateQueue(graph.skeleton, 1 / 30)
    e1 = q.add_state(("walk", "a"), "start", _frames(10), None)
    idle = q.generate_idle_state(_frames(6, z0=99.0), e1.pose_buffer)
    assert idle.node_type == "idle"
    assert idle.node_key == ("walk", "idle")
    seam = np.linalg.norm(np.asarray(idle.state.frames[0][:3])
                          - np.asarray(e1.pose_buffer[-1][:3]))
    assert seam < 1.0
    assert q.pop().node_key == ("walk", "a")
    assert q.pop().node_type == "idle"


def test_motion_state_playback():
    ms = MotionState(_frames(10), frame_time=1 / 30)
    assert ms.update(1 / 30)
    assert ms.frame_idx == 1
    for _ in range(20):
        ms.update(1 / 30)
    assert not ms.update(1 / 30) or ms.frame_idx >= 9


def test_end_corrections(graph):
    q = MGStateQueue(graph.skeleton, 1 / 30)
    frames = _frames(30)
    corrected = q.apply_end_pos_correction(frames, np.array([10.0, 0, 40.0]),
                                           window=10)
    np.testing.assert_allclose(corrected[-1][:3], [10.0, 0.0, 40.0], atol=0.5)
    np.testing.assert_allclose(corrected[0], frames[0], atol=1e-5)
    rotated = q.apply_end_orientation_correction(frames, np.array([1.0, 0.0]),
                                                 window=10)
    from morphablegraphs_tpu.ops import align
    import jax.numpy as jnp
    final_heading = float(align.heading_angle(jnp.asarray(rotated[-1][3:7])))
    assert abs(final_heading - np.pi / 2) < 0.1


# ---------------------------------------------------------------------------
# interactive planner
# ---------------------------------------------------------------------------

def test_state_planner_fsm(graph):
    p = MGStatePlanner(graph)
    assert p.get_next_node_type("idle", False) == "start"
    assert p.get_next_node_type("start", False) == "standard"
    assert p.get_next_node_type("standard", False) == "standard"
    assert p.get_next_node_type("standard", True) == "end"
    assert p.get_next_node_type("end", False) == "idle"


def test_state_planner_locomotion(graph):
    settings = MGStatePlanningSettings(n_samples=10, step_target_threshold=15.0,
                                       max_steps_per_target=10)
    p = MGStatePlanner(graph, settings)
    buf = p.generate_motion_states_from_action_sequence(
        [{"action": "walk", "controlPoints": [[0, 0, 40], [0, 0, 90]]}])
    assert len(p.state_queue) > 0
    # states play back contiguously
    prev_end = None
    while True:
        e = p.state_queue.pop()
        if e is None:
            break
        assert not np.any(np.isnan(e.state.frames))
        if prev_end is not None:
            assert np.linalg.norm(e.state.frames[0][:3] - prev_end) < 5.0
        prev_end = e.state.frames[-1][:3]


def test_direction_walk_carries_overlay_and_look_at(graph):
    """The direction branch of the action sequence supports the same
    upper-body gesture + look-at edits as the control-point branch
    (reference generate_locomotion_from_motion_primitives_using_direction
    :612-653 reads upper_body_gesture / body_orientation_targets too)."""
    settings = MGStatePlanningSettings(n_samples=6)
    p = MGStatePlanner(graph, settings)
    seen = {}
    orig = p.generate_step

    def spy(node_key, pose_buffer, **kw):
        seen["upper_body_state"] = kw.get("upper_body_state")
        seen["body_orientation_targets"] = kw.get("body_orientation_targets")
        return orig(node_key, pose_buffer, **kw)

    p.generate_step = spy
    p.generate_motion_states_from_action_sequence(
        [{"action": "walk", "direction": [0.0, 0.0, 1.0], "n_steps": 2,
          "upper_body_gesture": {"name": "walk"},
          "lookAtTarget": [0.0, 100.0, 50.0]}])
    assert len(p.state_queue) > 0
    assert seen["upper_body_state"] is not None
    assert seen["body_orientation_targets"][0] == [0.0, 100.0, 50.0]
    while True:
        e = p.state_queue.pop()
        if e is None:
            break
        assert not np.any(np.isnan(e.state.frames))


def test_action_sequence_plays_non_walk_action_with_frame_constraints():
    """Non-walk actions in the streaming sequence play their action
    definition's node sequence with per-node frame constraints (reference
    generate_action_motion :384-408): the constraint reaches generate_step,
    the queue gets the action node, and prevent_action_drift blends the
    end back toward the action's start position."""
    from morphablegraphs_tpu.utils.synthetic import make_multi_action_graph_dict

    g = graph_mod.build_graph_from_dict(make_multi_action_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    g.action_definitions = {
        "pickRight": {"node_sequence": [["reach", "standard"]]}}

    p = MGStatePlanner(g, MGStatePlanningSettings(n_samples=6))
    seen = {}
    orig = p.generate_step

    def spy(node_key, pose_buffer, **kw):
        if kw.get("keyframe_constraints"):
            seen[node_key] = kw["keyframe_constraints"]
        return orig(node_key, pose_buffer, **kw)

    p.generate_step = spy
    p.generate_motion_states_from_action_sequence([
        {"action": "walk", "controlPoints": [[0, 0, 30], [0, 0, 60]]},
        {"action": "pickRight",
         "frame_constraints": [{"node": "reach", "joint": "Head",
                                "position": [10.0, np.nan, 40.0],
                                "keyframeLabel": "start_contact",
                                "keyframeEvents": [{"event": "attach",
                                                    "parameters": {}}],
                                "holdFrame": True}]}])
    played, entries = [], {}
    while True:
        e = p.state_queue.pop()
        if e is None:
            break
        assert not np.any(np.isnan(e.state.frames))
        played.append(e.node_key)
        entries[e.node_key] = e
    assert ("pickRight", "reach") in played, played
    assert ("pickRight", "reach") in seen
    assert seen[("pickRight", "reach")][0]["joint"] == "Head"
    # events + hold frames ride the state entry (reference
    # generate_constrained_frames :528-535)
    pick = entries[("pickRight", "reach")]
    (kf, events), = pick.events.items()
    assert events[0]["event"] == "attach"
    assert pick.hold_frames == (kf,)


def test_region_constraint_holds_over_range(graph):
    """constrainPositionInRegion + endKeyframe (reference
    constraint_builder.py:323-345: the constraint is enacted from the
    resolved keyframe to the END keyframe): the generated pose satisfies
    the target at the region's END frame, not only at the start keyframe,
    and the hold metadata covers the whole span."""
    from morphablegraphs_tpu.models.skeleton import fk_positions
    import jax.numpy as jnp

    skel = graph.skeleton
    head = skel.index_of("Head")
    node_key = graph.node_groups["walk"].node_keys[0]
    mp = node_key[1]
    prim = graph.nodes[node_key].primitive
    n_can = prim.n_canonical_frames
    graph.node_groups["walk"].labeled_frames.setdefault(mp, {}).update(
        {"contact_start": 2, "contact_end": "lastFrame"})
    target = [6.0, np.nan, 20.0]
    base_c = {"node": mp, "joint": "Head", "position": list(target),
              "keyframeLabel": "contact_start"}

    e_plain = MGStatePlanner(graph).generate_step(
        node_key, None, keyframe_constraints=[dict(base_c)])
    region_c = dict(base_c, endKeyframeLabel="contact_end",
                    constrainPositionInRegion=True, holdFrame=True)
    e_reg = MGStatePlanner(graph).generate_step(
        node_key, None, keyframe_constraints=[region_c])

    def head_err(entry, fi):
        f = entry.state.frames
        fi = min(fi, len(f) - 1)
        p = np.asarray(fk_positions(skel, jnp.asarray(f[fi], jnp.float32)))
        return float(np.linalg.norm((p[head] - np.asarray(
            [6.0, p[head][1], 20.0]))[[0, 2]]))

    end_fi = len(e_reg.state.frames) - 1
    # the region run holds the target at the END of the span...
    assert head_err(e_reg, end_fi) < 1.0, head_err(e_reg, end_fi)
    # ...which the single-keyframe run does not (it only snaps frame 2 and
    # blends out)
    assert head_err(e_reg, end_fi) < 0.5 * head_err(e_plain, end_fi), (
        head_err(e_reg, end_fi), head_err(e_plain, end_fi))
    # hold metadata covers the whole region for the engine side
    assert e_reg.hold_frames[0] == 2
    assert e_reg.hold_frames[-1] >= n_can - 1
    assert len(e_reg.hold_frames) == e_reg.hold_frames[-1] - 2 + 1


def test_snap_keyframe_constraints_hits_target(graph):
    """The streaming IK pass (reference apply_ik_constraints :1023-1060)
    moves the constrained joint to the world target at the keyframe and
    blends the edit into the surrounding window."""
    from morphablegraphs_tpu.models.skeleton import fk_positions
    import jax.numpy as jnp

    skel = graph.skeleton
    p = MGStatePlanner(graph)
    frames = _frames(20)
    head = skel.index_of("Head")
    kf = 10
    before = np.asarray(fk_positions(skel, jnp.asarray(frames[kf])))[head]
    target = before + np.array([4.0, np.nan, -3.0])
    out = p._snap_keyframe_constraints(frames, None,
                                       [("Head", kf, target)])
    after = np.asarray(fk_positions(skel, jnp.asarray(out[kf])))[head]
    err_before = np.linalg.norm((before - target)[[0, 2]])
    err_after = np.linalg.norm((after - target)[[0, 2]])
    assert err_after < 0.3 * err_before, (err_before, err_after)
    # root untouched; frames outside the blend window untouched
    np.testing.assert_allclose(out[:, :3], frames[:, :3], atol=1e-6)
    # no-op cases: no position, unknown joint
    same = p._snap_keyframe_constraints(frames, None,
                                        [("Head", kf, None),
                                         ("NoJoint", kf, target)])
    np.testing.assert_allclose(same, frames, atol=0)


def test_engine_frame_constraints_resolve_through_constraint_slots():
    """Engine (Unity) constraint descs name only a keyframe label; the
    action definition's constraint_slots resolve node + default joint, and
    coordinates flip handedness (reference generate_frame_constraint
    :288-345)."""
    from morphablegraphs_tpu.utils.synthetic import make_multi_action_graph_dict

    g = graph_mod.build_graph_from_dict(make_multi_action_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    g.action_definitions = {
        "screw": {"constraint_slots": {
            "start_contact": {"cycle_nodes": ["a", "b"], "joint": "Head"}}}}
    p = MGStatePlanner(g)
    out = p.resolve_engine_frame_constraints("screw", [
        {"keyframe": "start_contact", "cycle": 1,
         "position": {"x": 1.0, "y": 2.0, "z": 3.0},
         "orientation": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0},
         "constrainOrientation": True, "hold": True,
         "keyframeEvents": [{"event": "attach"}]},
        {"keyframe": "start_contact", "cycle": 5, "position": [0, 0, 0]}])
    assert out[0]["node"] == "b" and out[0]["joint"] == "Head"
    assert out[0]["position"] == [-1.0, 2.0, 3.0]
    assert out[0]["orientation"] == [-1.0, -0.0, 0.0, 0.0]
    assert out[0]["holdFrame"] and out[0]["keyframeEvents"]
    assert out[1]["node"] == "b"  # cycle beyond list clamps to last


def test_ik_snap_pins_mirror_joint():
    """keepMirrorBoneStatic (reference constraint_builder.py:340-343): the
    mirror joint holds its current position while the IK snap moves the
    constrained joint."""
    from morphablegraphs_tpu.models.skeleton import fk_positions
    from morphablegraphs_tpu.utils.synthetic import (
        REF_BVH, make_reference_scale_graph_dict)
    import jax.numpy as jnp

    g = graph_mod.build_graph_from_dict(make_reference_scale_graph_dict())
    skel, _ = sk.load_bvh(REF_BVH)
    g.skeleton = skel
    p = MGStatePlanner(g)
    frames = np.zeros((16, skel.n_frame_params), np.float32)
    frames[:, 1] = 90.0
    for j in range(skel.n_animated):
        frames[:, 3 + 4 * j] = 1.0
    kf = 8
    rh, lh = skel.index_of("RightHand"), skel.index_of("LeftHand")
    before = np.asarray(fk_positions(skel, jnp.asarray(frames[kf])))
    target = before[rh] + np.array([6.0, -4.0, 5.0])
    out = p._snap_keyframe_constraints(
        frames, None, [("RightHand", kf, target, "LeftHand")])
    after = np.asarray(fk_positions(skel, jnp.asarray(out[kf])))
    # constrained hand moved toward the target...
    assert (np.linalg.norm(after[rh] - target)
            < 0.5 * np.linalg.norm(before[rh] - target))
    # ...while the pinned mirror hand stayed close to where it was
    assert np.linalg.norm(after[lh] - before[lh]) < 1.5, (
        np.linalg.norm(after[lh] - before[lh]))


def test_ik_snap_with_tool_offset_hits_tip(graph):
    """With a local tool offset the IK snap puts pos + R_joint @ offset
    (the tool tip) on the target, not the joint origin (reference
    extract_tool_offset, constraint_builder.py:242-280)."""
    from morphablegraphs_tpu.models.skeleton import fk_global
    from morphablegraphs_tpu.ops import quat as quat_ops
    import jax.numpy as jnp

    skel = graph.skeleton
    p = MGStatePlanner(graph)
    frames = _frames(20)
    kf, joint = 10, "Head"
    ni = skel.index_of(joint)
    offset = np.array([0.0, 8.0, 0.0])
    pos0, ori0 = fk_global(skel, jnp.asarray(frames[kf]))
    tip0 = np.asarray(pos0[ni]) + np.asarray(
        quat_ops.rotate_vec(quat_ops.normalize(ori0[ni]),
                            jnp.asarray(offset)))
    target = tip0 + np.array([4.0, np.nan, -3.0])
    out = p._snap_keyframe_constraints(
        frames, None, [(joint, kf, target, None, offset)])
    pos1, ori1 = fk_global(skel, jnp.asarray(out[kf]))
    tip1 = np.asarray(pos1[ni]) + np.asarray(
        quat_ops.rotate_vec(quat_ops.normalize(ori1[ni]),
                            jnp.asarray(offset)))
    err0 = np.linalg.norm((tip0 - target)[[0, 2]])
    err1 = np.linalg.norm((tip1 - target)[[0, 2]])
    assert err1 < 0.3 * err0, (err0, err1)


def test_resolve_tool_offset_from_current_pose(graph):
    """toolEndPoint + currentPose overwrite the declared offset with the
    tool end point expressed in the joint's local frame (reference
    :248-260)."""
    from morphablegraphs_tpu.constraints.server_builder import mg_frame_to_unity_frame
    from morphablegraphs_tpu.models.skeleton import fk_global
    from morphablegraphs_tpu.ops import quat as quat_ops
    import jax.numpy as jnp

    skel = graph.skeleton
    p = MGStatePlanner(graph)
    frame = _frames(1)[0]
    unity = mg_frame_to_unity_frame(skel, frame)
    pos, ori = fk_global(skel, jnp.asarray(frame))
    ni = skel.index_of("Head")
    # a world point 5 units above the head, in engine coordinates (x flip)
    world = np.asarray(pos[ni]) + np.array([0.0, 5.0, 0.0])
    desc = {"applyOffset": True, "offset": [1.0, 1.0, 1.0],
            "toolEndPoint": [-world[0], world[1], world[2]],
            "currentPose": unity}
    off = p._resolve_tool_offset(desc, "Head")
    back = np.asarray(quat_ops.rotate_vec(
        quat_ops.normalize(ori[ni]), jnp.asarray(np.asarray(off))))
    np.testing.assert_allclose(np.asarray(pos[ni]) + back, world, atol=1e-3)
    # without applyOffset the declared offset is ignored
    assert p._resolve_tool_offset({"offset": [1, 2, 3]}, "Head") is None


def test_relative_frame_constraint_uses_rt_slot(graph, monkeypatch):
    """A frame constraint with a relative joint fills the relative-transform
    slot instead of a keyframe slot (reference :339 relativeBoneName ->
    RelativeTransformConstraint, constraint_builder.py:160)."""
    from morphablegraphs_tpu.constraints import compiled as cmp
    from morphablegraphs_tpu.synthesis import state_planner as sp_mod

    p = MGStatePlanner(graph, MGStatePlanningSettings(n_samples=6))
    calls = {}
    orig = cmp.set_relative_transform_constraint

    def spy(sc, skel, joint, parent, offset, kf, weight=1.0):
        calls["args"] = (joint, parent, tuple(np.asarray(offset)))
        return orig(sc, skel, joint, parent, offset, kf, weight=weight)

    monkeypatch.setattr(sp_mod.compiled,
                        "set_relative_transform_constraint", spy)
    entry = p.generate_step(
        ("walk", "leftStance"), None,
        keyframe_constraints=[{"joint": "Head", "relativeJoint": "Spine",
                               "position": [0.0, 5.0, 0.0],
                               "keyframe": 3}])
    assert not np.any(np.isnan(entry.state.frames))
    assert calls["args"] == ("Head", "Spine", (0.0, 5.0, 0.0))


def test_action_node_queue_cycles():
    """Cyclic actions expand cycle_start/cycle_node/cycle_end n_cycles
    times (reference generate_action_node_queue_with_cycles :446-464)."""
    from morphablegraphs_tpu.utils.synthetic import make_multi_action_graph_dict

    g = graph_mod.build_graph_from_dict(make_multi_action_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    g.action_definitions = {
        "screw": {"cycle_start": ["a", "start"], "cycle_node": ["b", "standard"],
                  "cycle_end": ["c", "end"], "cycle_nodes": ["b"]}}
    p = MGStatePlanner(g)
    q = p.generate_action_node_queue("screw", n_cycles=4)
    names = [k[1] for k, t in q if k[0] == "screw"]
    assert names == ["a", "b", "b", "c"], names


def test_direction_extraction_target_switching(graph):
    """reference get_direction_from_control_points :706-770: reached targets
    pop, the steering vector points at the current target, and the step
    distance is capped by the node-type-dependent maximum."""
    settings = MGStatePlanningSettings(min_target_distance=10.0,
                                       max_step_length=25.0,
                                       max_begin_step_length=12.0)
    p = MGStatePlanner(graph, settings)
    buf = [np.zeros(19, np.float32)]
    buf[0][3::4] = 1.0
    # first target already within min_target_distance -> popped; second used
    cps = [np.array([0.0, 0, 5.0]), np.array([0.0, 0, 100.0])]
    state = {"distance": np.inf, "prev_distance": np.inf,
             "prev_direction_vector": None, "prev_target": cps[0],
             "current_position": np.zeros(3)}
    d, step, buf = p.get_direction_from_control_points(cps, "standard", state,
                                                       buf)
    assert len(cps) == 1
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)
    assert step == 25.0  # capped by max_step_length
    # from idle the begin cap applies
    state2 = dict(state, prev_distance=np.inf)
    d2, step2, _ = p.get_direction_from_control_points(list(cps), "idle",
                                                       state2, buf)
    assert step2 == 12.0
    # end_direction override near the last target
    near = [np.zeros(19, np.float32)]
    near[0][3::4] = 1.0
    near[0][2] = 70.0  # 30 from target < min_dir_distance (50)
    d3, _, _ = p.get_direction_from_control_points(
        list(cps), "standard", dict(state), near, end_direction=[1.0, 0, 0])
    np.testing.assert_allclose(d3, [1, 0, 0], atol=1e-6)


def test_direction_extraction_overstepping_abort(graph):
    """Overstepping the final target (distance growing inside the
    overstepping range) pops the last queued state and reuses the previous
    direction (reference :718-727)."""
    settings = MGStatePlanningSettings(overstepping_range=50.0,
                                       min_target_distance=1.0)
    p = MGStatePlanner(graph, settings)
    e1 = p.state_queue.add_state(("walk", "a"), "start", _frames(10), None)
    e2 = p.state_queue.add_state(("walk", "b"), "standard", _frames(10),
                                 e1.pose_buffer)
    assert len(p.state_queue) == 2
    buf = [np.zeros(19, np.float32)]
    buf[0][3::4] = 1.0
    buf[0][2] = 30.0  # 10 past the target at z=20, inside overstepping range
    prev_dir = np.array([0.0, 0.0, 1.0])
    state = {"distance": 10.0, "prev_distance": 5.0,
             "prev_direction_vector": prev_dir,
             "prev_target": np.array([0.0, 0, 20.0]),
             "current_position": np.zeros(3)}
    cps = [np.array([0.0, 0, 20.0])]
    d, step, buf2 = p.get_direction_from_control_points(cps, "standard",
                                                        state, buf)
    assert len(p.state_queue) == 1  # overstepping popped the newest state
    assert len(cps) == 0
    np.testing.assert_allclose(d, prev_dir, atol=1e-6)
    assert step == 0.0


def test_queue_end_corrections_on_last_state(graph):
    """correct_last_state_end_pos/dir edit the NEWEST queued entry in place
    — frames AND pose buffer tail (reference apply_end_pos_correction
    :228-253 operates on the queue)."""
    q = MGStateQueue(graph.skeleton, 1 / 30)
    e1 = q.add_state(("walk", "a"), "start", _frames(30), None)
    target = np.array([10.0, 0, 40.0])
    assert q.correct_last_state_end_pos(target, window=10)
    last = q.get_last_state()
    np.testing.assert_allclose(last.state.frames[-1][:3], target, atol=0.5)
    np.testing.assert_allclose(last.pose_buffer[-1][:3], target, atol=0.5)
    assert q.correct_last_state_end_dir(np.array([1.0, 0.0]), window=10)
    from morphablegraphs_tpu.ops import align
    import jax.numpy as jnp
    heading = float(align.heading_angle(
        jnp.asarray(q.get_last_state().state.frames[-1][3:7])))
    assert abs(heading - np.pi / 2) < 0.1
    # empty queue -> no-op, reports False
    q2 = MGStateQueue(graph.skeleton, 1 / 30)
    assert not q2.correct_last_state_end_pos(target)


def test_force_walk_end_targets(graph):
    """With force_walk_end_targets the locomotion run ends EXACTLY on the
    final control point, oriented along end_direction (reference
    generate_motion_states_from_action :357-380)."""
    settings = MGStatePlanningSettings(
        n_samples=6, max_steps_per_target=8, force_walk_end_targets=True,
        min_end_distance=1.0, end_target_blend_range=10)
    p = MGStatePlanner(graph, settings)
    target = [0.0, 0.0, 60.0]
    p.generate_locomotion("walk", np.array([[0.0, 0, 30.0], target]),
                          end_direction=[1.0, 0.0, 0.0])
    last = p.state_queue.get_last_state()
    assert last is not None
    xz = last.state.frames[-1][[0, 2]]
    np.testing.assert_allclose(xz, [target[0], target[2]], atol=0.5)
    from morphablegraphs_tpu.ops import align
    import jax.numpy as jnp
    heading = float(align.heading_angle(
        jnp.asarray(last.state.frames[-1][3:7])))
    assert abs(heading - np.pi / 2) < 0.1


def test_ignore_idle_rotation(graph):
    """generate_idle_state(ignore_rotation=True) keeps the idle clip's own
    heading while still translating it onto the buffer (reference
    ignore_idle_rotation)."""
    from morphablegraphs_tpu.ops import align, quat
    import jax.numpy as jnp
    q = MGStateQueue(graph.skeleton, 1 / 30)
    e1 = q.add_state(("walk", "a"), "start", _frames(10), None)
    idle = _frames(6, z0=50.0)
    # give the idle clip a distinctive 90-degree heading
    rot = np.asarray(quat.about_y(jnp.asarray(np.pi / 2)), np.float32)
    idle[:, 3:7] = rot
    kept = q.generate_idle_state(idle, e1.pose_buffer, ignore_rotation=True)
    h = float(align.heading_angle(jnp.asarray(kept.state.frames[0][3:7])))
    assert abs(h - np.pi / 2) < 1e-3  # own heading preserved
    seam = np.linalg.norm(np.asarray(kept.state.frames[0][:3])
                          - np.asarray(e1.pose_buffer[-1][:3]))
    assert seam < 1.0  # still translated onto the buffer


def test_use_constrained_sampling_off(graph):
    """use_constrained_sampling=False always takes a plain GMM sample
    (reference generate_constrained_motion_primitive :1003-1012)."""
    from morphablegraphs_tpu.synthesis import state_planner as sp_mod
    settings = MGStatePlanningSettings(use_constrained_sampling=False,
                                       n_samples=4)
    p = MGStatePlanner(graph, settings)
    calls = []
    orig = sp_mod.generator.generate_constrained_sample

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    sp_mod.generator.generate_constrained_sample = spy
    try:
        entry = p.generate_step(("walk", "beginLeftStance"), None,
                                target_dir=[0.0, 1.0])
    finally:
        sp_mod.generator.generate_constrained_sample = orig
    assert entry is not None and not calls  # constrained path never ran


def test_add_transition_constraint(graph):
    """add_transition_constraint activates the transition pose slot on the
    step's compiled constraints (reference constraint_builder.py:404-406)."""
    from morphablegraphs_tpu.synthesis import state_planner as sp_mod
    settings = MGStatePlanningSettings(add_transition_constraint=True,
                                       n_samples=4)
    p = MGStatePlanner(graph, settings)
    seen = {}
    orig = sp_mod.generator.generate_constrained_sample

    def spy(key, skel, prim, sc, config, **kw):
        seen["pose_active"] = float(sc.pose_active)
        return orig(key, skel, prim, sc, config, **kw)

    sp_mod.generator.generate_constrained_sample = spy
    try:
        e0 = p.state_queue.add_state(("walk", "a"), "start", _frames(10),
                                     None)
        p.generate_step(("walk", "leftStance"), e0.pose_buffer,
                        target_dir=[0.0, 1.0])
    finally:
        sp_mod.generator.generate_constrained_sample = orig
    assert seen.get("pose_active") == 1.0


def test_upper_body_state_cycles_through_gesture(graph):
    """reference combine_frames_with_other_motion_primitive :817-828: the
    gesture frames splice cyclically into consecutive steps."""
    p = MGStatePlanner(graph)
    state = p.generate_upper_body_state({"action": "walk",
                                         "primitive": "leftStance"})
    assert state is not None and len(state["frames"]) > 0
    n_gesture = len(state["frames"])
    base = _frames(n_gesture + 5)
    out = p.combine_frames_with_upper_body(base, state)
    skel = graph.skeleton
    sl = skel.quat_slice("Spine")
    np.testing.assert_allclose(out[0, sl], state["frames"][0, sl], atol=1e-6)
    # wrap-around: frame n_gesture uses gesture frame 0 again
    np.testing.assert_allclose(out[n_gesture, sl], state["frames"][0, sl],
                               atol=1e-6)
    assert state["frame_idx"] == (n_gesture + 5) % n_gesture
    # root motion untouched
    np.testing.assert_allclose(out[:, :3], base[:, :3], atol=1e-6)


def test_apply_body_orientation_targets(graph):
    """Look-at edit rotates the head toward the world target over the
    look-at window (reference apply_ik_constraints :1023 + :795-815)."""
    from morphablegraphs_tpu.models.skeleton import fk_global
    import jax.numpy as jnp
    from morphablegraphs_tpu.ops import quat as quat_ops
    import jax

    p = MGStatePlanner(graph, MGStatePlanningSettings(look_at_window=50))
    frames = _frames(10)
    target = np.array([100.0, 105.0, 50.0])
    out = p.apply_body_orientation_targets(frames, None, (target, None))
    skel = graph.skeleton
    head = skel.index_of("Head")
    pos, ori = fk_global(skel, jnp.asarray(out[-1]))
    gaze = np.asarray(quat_ops.rotate_vec(quat_ops.normalize(ori[head]),
                                          jnp.asarray([0.0, 0, 1.0])))
    want = target - np.asarray(pos[head])
    want /= np.linalg.norm(want)
    assert float(np.dot(gaze, want)) > 0.95
    # frames untouched when no targets given
    same = p.apply_body_orientation_targets(frames, None, (None, None))
    np.testing.assert_allclose(same, frames)


def test_look_at_respects_joint_limits(graph):
    """A target far BEHIND the character would need ~180 deg of head yaw;
    with joint constraints active (reference :814 apply_joint_constraints
    after the look-at edit) the head twist clamps to the table's 80 deg."""
    from morphablegraphs_tpu.models import skeleton_models as sm

    skel = graph.skeleton

    def head_twist_deg(frames_out):
        q = np.asarray(frames_out[-1][skel.quat_slice("Head")], np.float64)
        if q[0] < 0:
            q = -q
        return abs(np.rad2deg(2.0 * np.arctan2(q[2], q[0])))

    frames = _frames(10)
    target = np.array([-5.0, 105.0, -500.0])  # behind, slightly to the side
    free = MGStatePlanner(graph, MGStatePlanningSettings(
        look_at_window=50, activate_joint_constraints=False))
    unclamped = head_twist_deg(
        free.apply_body_orientation_targets(frames, None, (target, None)))
    assert unclamped > 90.0, unclamped  # sanity: the edit wants to overturn

    limited = MGStatePlanner(graph, MGStatePlanningSettings(look_at_window=50))
    assert limited.settings.activate_joint_constraints  # reference default
    clamped = head_twist_deg(
        limited.apply_body_orientation_targets(frames, None, (target, None)))
    assert clamped <= 80.0 + 1e-3, clamped
    # the limit source is overridable per skeleton model (reference :262-264)
    custom = MGStatePlanner(graph, MGStatePlanningSettings(look_at_window=50))
    custom.joint_constraints = dict(sm.JOINT_CONSTRAINTS,
                                    Head={"axis": (0, 1, 0),
                                          "min_angle": -30.0,
                                          "max_angle": 30.0})
    tight = head_twist_deg(
        custom.apply_body_orientation_targets(frames, None, (target, None)))
    assert tight <= 30.0 + 1e-3, tight


def test_gesture_parameters_modulate_wrist(ref_graph):
    """Gesture-parameter edits (reference :683-697): velocityFactor
    resamples the overlay, distanceToHeadFactor pushes the wrist trajectory
    away from the neck and reproduces it with a shoulder-bounded CCD chain,
    noiseFactor jitters it; joints outside the arm chain stay untouched."""
    from morphablegraphs_tpu.models.skeleton import fk_positions
    import jax.numpy as jnp

    skel = ref_graph.skeleton
    wrist = skel.index_of("RightHand")
    neck = skel.index_of("Neck")

    base = MGStatePlanner(ref_graph, seed=3)
    plain = base.generate_upper_body_state({"action": "walk"})
    assert plain is not None and len(plain["frames"]) > 2

    # velocityFactor=2 -> roughly half the canonical frames; the reference's
    # upperBodyGesture message keys the action as "name" (:655)
    fast = MGStatePlanner(ref_graph, seed=3).generate_upper_body_state(
        {"name": "walk", "velocityFactor": 2.0})
    assert abs(len(fast["frames"]) - len(plain["frames"]) / 2) <= 1

    # distance factor pushes the wrist away from the neck (setting gated:
    # same desc without enable_gesture_parameters must change nothing)
    off = MGStatePlanner(ref_graph, seed=3).generate_upper_body_state(
        {"action": "walk", "distanceToHeadFactor": 10.0})
    np.testing.assert_allclose(off["frames"], plain["frames"], atol=1e-6)
    # the CCD reproduction assumes unit quats (as trained models emit; the
    # synthetic fixture's raw samples are far from unit norm, which scales
    # FK) — drive the helper on a normalized copy of the sampled overlay
    frames_plain = plain["frames"].copy()
    for j in skel.animated_joints:
        sl = skel.quat_slice(j)
        frames_plain[:, sl] /= np.linalg.norm(frames_plain[:, sl], axis=-1,
                                              keepdims=True)
    p_on = MGStatePlanner(ref_graph, MGStatePlanningSettings(
        enable_gesture_parameters=True, gesture_ik_max_iter=5), seed=3)
    frames_on = p_on._apply_gesture_parameters(frames_plain, 0.0, 10.0)
    assert not np.isnan(frames_on).any()
    pos_on = np.asarray(fk_positions(skel, jnp.asarray(frames_on)))
    pos_plain = np.asarray(fk_positions(skel, jnp.asarray(frames_plain)))
    # the modified trajectory the CCD reproduces: original wrist pushed away
    # from the neck by the distance factor (move_distance_to_head :178-188)
    dirs = pos_plain[:, wrist] - pos_plain[:, neck]
    dirs /= np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-10)
    target_traj = pos_plain[:, wrist] + dirs * 10.0
    d_on = np.linalg.norm(pos_on[:, wrist] - target_traj, axis=-1)
    d_plain = np.linalg.norm(pos_plain[:, wrist] - target_traj, axis=-1)
    # CCD pulled the wrist toward the pushed-out trajectory (d_plain = 10)
    assert float(np.median(d_on)) < float(np.median(d_plain)), (
        np.median(d_on), np.median(d_plain))
    # the CCD chain is bounded at the shoulder: legs and root unchanged
    for j in ("Hips", "Spine", "LeftUpLeg", "RightFoot"):
        sl = skel.quat_slice(j)
        np.testing.assert_allclose(frames_on[:, sl], frames_plain[:, sl],
                                   atol=1e-6)
    np.testing.assert_allclose(frames_on[:, :3], frames_plain[:, :3],
                               atol=1e-6)

    # noise jitters the wrist trajectory (seeded rng -> deterministic)
    noisy = p_on._apply_gesture_parameters(frames_plain, 1.0, 0.0)
    assert not np.isnan(noisy).any()
    assert float(np.max(np.abs(noisy - frames_plain))) > 1e-4


def test_handle_collision_ccd(graph):
    """A collision report moves the boundary joint away along the normal via
    the CCD edit (reference handle_collision :1135-1157)."""
    from morphablegraphs_tpu.models.skeleton import fk_positions
    import jax.numpy as jnp

    class Boundary:
        joint_name = "Head"

        def check_trajectory(self, points, dt):
            # pretend frame 5 collides; push along -z
            return 5, np.asarray(points[5]), np.array([0.0, 0.0, 1.0])

    p = MGStatePlanner(graph, hand_collision_boundary=Boundary())
    frames = _frames(10)
    before = np.asarray(fk_positions(graph.skeleton, jnp.asarray(frames)))
    out = p.handle_collision(frames, "walk")
    after = np.asarray(fk_positions(graph.skeleton, jnp.asarray(out)))
    head = graph.skeleton.index_of("Head")
    # the edited frame's head moved toward (collision point - 20*normal)
    assert after[5, head, 2] < before[5, head, 2] - 1.0
    # other frames untouched
    np.testing.assert_allclose(out[0], frames[0], atol=1e-6)
    np.testing.assert_allclose(out[9], frames[9], atol=1e-6)


def test_handle_collision2_multi_joint(graph):
    """Multi-joint delta-trajectory collision edits (reference
    handle_collision2 :1158-1189): only the reported frames change, each
    joint pushed toward position + delta."""
    from morphablegraphs_tpu.models.skeleton import fk_positions
    import jax.numpy as jnp

    class Boundary:
        joint_name = "Head"

        def get_delta_trajectory(self, points, dt):
            return True, {4: np.array([0.0, 0.0, -15.0])}

    p = MGStatePlanner(graph, hand_collision_boundary=Boundary())
    frames = _frames(10)
    before = np.asarray(fk_positions(graph.skeleton, jnp.asarray(frames)))
    out = p.handle_collision2(frames, "walk", ["Head", "Spine"])
    after = np.asarray(fk_positions(graph.skeleton, jnp.asarray(out)))
    head = graph.skeleton.index_of("Head")
    assert after[4, head, 2] < before[4, head, 2] - 1.0
    np.testing.assert_allclose(out[0], frames[0], atol=1e-6)
    np.testing.assert_allclose(out[9], frames[9], atol=1e-6)


def test_locomotion_with_overlay_and_lookat(graph):
    """End-to-end: locomotion with an upper-body gesture + look-at target
    produces contiguous, NaN-free states."""
    settings = MGStatePlanningSettings(n_samples=6, max_steps_per_target=6,
                                       min_target_distance=15.0)
    p = MGStatePlanner(graph, settings)
    p.generate_motion_states_from_action_sequence([
        {"action": "walk", "controlPoints": [[0, 0, 60]],
         "lookAtTarget": [50.0, 120.0, 50.0],
         "upperBodyGesture": {"action": "walk", "primitive": "rightStance"}}])
    assert len(p.state_queue) > 0
    while True:
        e = p.state_queue.pop()
        if e is None:
            break
        assert not np.any(np.isnan(e.state.frames))


def test_upper_body_overlay(graph):
    p = MGStatePlanner(graph)
    base = _frames(20)
    gesture = _frames(10)
    skel = graph.skeleton
    sl = skel.quat_slice("Spine")
    gesture[:, sl] = [0.0, 1.0, 0.0, 0.0]  # distinctive spine rotation
    out = p.overlay_upper_body(base, gesture)
    np.testing.assert_allclose(out[:, sl], np.tile([0, 1, 0, 0], (20, 1)), atol=1e-6)
    # root untouched
    np.testing.assert_allclose(out[:, :3], base[:, :3], atol=1e-6)


# ---------------------------------------------------------------------------
# REST API (Tornado test client)
# ---------------------------------------------------------------------------

def test_rest_api(graph):
    os.environ["ASYNC_TEST_TIMEOUT"] = "500"  # first generate compiles kernels
    import tornado.testing
    from morphablegraphs_tpu.serve.rest import MGContext, make_app

    cfg = default_config()
    cfg["n_random_samples"] = 10
    cfg["lm_iterations"] = 2
    ctx = MGContext(graph, cfg)
    # warm the jit caches on the MAIN thread: compiling inside the tornado
    # ioloop thread has produced flaky XLA-CPU segfaults in full-suite runs
    ctx.run({
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [{"action": "walk", "constraints": [{
            "joint": "Hips", "trajectoryConstraints": [
                {"position": [0, None, 0]}, {"position": [5, None, 60]}]}]}],
    })

    class Case(tornado.testing.AsyncHTTPTestCase):
        def get_app(self):
            return make_app(ctx)

        def test_skeleton(self):
            resp = self.fetch("/get_skeleton")
            assert resp.code == 200
            assert b"HIERARCHY" in resp.body

        def test_generate(self):
            mg_input = {
                "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
                "elementaryActions": [{
                    "action": "walk",
                    "constraints": [{
                        "joint": "Hips",
                        "trajectoryConstraints": [
                            {"position": [0, None, 0]},
                            {"position": [5, None, 60]},
                        ],
                    }],
                }],
            }
            resp = self.fetch("/run_morphablegraphs", method="POST",
                              body=json.dumps(mg_input), request_timeout=480)
            assert resp.code == 200
            data = json.loads(resp.body)
            assert "bvh" in data
            assert "HIERARCHY" in data["bvh"]
            assert "annotation" in data

        def test_bad_json(self):
            resp = self.fetch("/run_morphablegraphs", method="POST",
                              body="not json{")
            assert resp.code == 400

        def test_set_height_map(self):
            # plain pixel-array form; 255 at the center of a 64x64-unit
            # terrain -> height_scale at (0, 0), 0 outside the extent
            pixels = [[0.0] * 8 for _ in range(8)]
            pixels[4][4] = 255.0
            resp = self.fetch("/set_height_map", method="POST",
                              body=json.dumps({
                                  "height_map": pixels, "width": 64,
                                  "depth": 64, "height_scale": 2.5}))
            assert resp.code == 200
            assert json.loads(resp.body)["success"] is True
            scene = ctx.generator.scene_interface
            assert abs(scene.get_height(0.0, 0.0) - 2.5) < 1e-9
            assert scene.get_height(100.0, 0.0) == 0.0
            resp = self.fetch("/set_height_map", method="POST",
                              body=json.dumps({"nonsense": 1}))
            assert json.loads(resp.body)["success"] is False

        def test_set_configuration(self):
            # keep n_random_samples at the warmed value: it is a STATIC jit
            # arg, so changing it would force a fresh compile on the tornado
            # thread (the flaky-segfault path the warmup avoids)
            resp = self.fetch("/set_configuration", method="POST",
                              body=json.dumps({"n_random_samples": 10,
                                               "verbose": True}))
            assert resp.code == 200
            assert ctx.config["verbose"] is True
            assert ctx.config["n_random_samples"] == 10

    for name in ["test_skeleton", "test_bad_json", "test_set_configuration",
                 "test_set_height_map", "test_generate"]:
        case = Case(name)
        case.setUp()
        try:
            getattr(case, name)()
        finally:
            case.tearDown()


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def test_cli_train_and_run(tmp_path, graph):
    import jax
    from morphablegraphs_tpu.models import primitive as prim_mod
    from morphablegraphs_tpu.serve import cli

    # create BVH clips from the fixture model
    clip_dir = tmp_path / "clips"
    clip_dir.mkdir()
    src = graph.nodes[("walk", "leftStance")].primitive
    skel = graph.skeleton
    key = jax.random.PRNGKey(0)
    for i in range(4):
        key, sub = jax.random.split(key)
        s = prim_mod.sample_latent(sub, src, 1)[0]
        frames, n, _ = prim_mod.back_project(src, s, 64, use_time=True)
        sk.write_bvh(skel, np.asarray(frames)[: int(n)],
                     str(clip_dir / f"clip{i}.bvh"))

    out = cli.train_model(str(clip_dir), "cli_walk",
                          str(tmp_path / "cli_walk_mm.json"),
                          config={"max_gmm_components": 2, "npc_temporal": 2})
    assert os.path.exists(out)
    prim = prim_mod.load_primitive(out)
    assert prim.n_spatial > 0
    # sample BVH exported by the round-trip check
    assert os.path.exists(str(tmp_path / "cli_walk_sample.bvh"))


def test_state_planner_pfnn_locomotion(graph):
    """use_pfnn routes locomotion through the wrapper's
    reset/get_next_frame surface (reference mg_state_planner.py:363-365,
    :855-930), splitting frames into state-queue entries."""
    skel = graph.skeleton

    class MockPFNN:
        """Walks 2 units per frame toward the target."""
        def reset(self, position, phase, direction):
            self.position = np.asarray(position, np.float64)

        def get_next_frame(self, target_dir):
            self.position = self.position + 2.0 * np.asarray(target_dir)
            frame = np.zeros(skel.n_frame_params, np.float32)
            frame[:3] = self.position
            frame[3::4][: skel.n_animated] = 1.0  # identity quats
            return frame

    settings = MGStatePlanningSettings(min_pfnn_target_distance=5.0,
                                       min_pfnn_primitive_steps=10,
                                       max_pfnn_frames=200)
    p = MGStatePlanner(graph, settings, pfnn_wrapper=MockPFNN())
    p.use_pfnn = True
    buf, success = p.generate_locomotion_from_pfnn(
        None, np.array([[0.0, 0, 30], [0.0, 0, 60]]))
    assert success
    assert len(p.state_queue) >= 2  # split every 10 frames
    last_pos = None
    while True:
        e = p.state_queue.pop()
        if e is None:
            break
        assert e.node_key == ("pfnn", "locomotion")
        last_pos = e.state.frames[-1][:3]
    assert last_pos is not None
    assert np.linalg.norm(np.asarray(last_pos)[[0, 2]] - [0, 60]) < 10.0

    # generate_locomotion routes through the PFNN path when enabled
    p2 = MGStatePlanner(graph, settings, pfnn_wrapper=MockPFNN())
    p2.use_pfnn = True
    p2.generate_locomotion("walk", np.array([[0.0, 0, 30]]))
    assert len(p2.state_queue) >= 1


def test_stretch_points_cubic_upsampling():
    """reference mg_state_planner.py stretch_points: cubic interpolation of
    control points at step `scale` — endpoints and density preserved."""
    from morphablegraphs_tpu.synthesis.state_planner import stretch_points
    pts = np.array([[0.0, 0, 0], [10.0, 0, 0], [10.0, 0, 10], [0.0, 0, 10]])
    out = stretch_points(pts, 0.1)
    assert out.shape == (30, 3)  # arange(0, 3, 0.1)
    assert np.allclose(out[0], pts[0])
    assert np.allclose(out[10], pts[1])  # interpolates through the points
    assert np.allclose(out[20], pts[2])
    # straight segments stay within the hull along x
    assert out[:, 0].max() < 12.0


def test_rest_context_retargets_output(graph):
    """MGContext with a target skeleton retargets before export (reference
    mg_rest_interface.py:133-136) — the BVH output uses the target rig's
    joint names."""
    import dataclasses
    from morphablegraphs_tpu.serve.rest import MGContext
    skel = graph.skeleton
    renamed = dataclasses.replace(
        skel,
        node_names=tuple(n + "_ge" for n in skel.node_names),
        animated_joints=tuple(n + "_ge" for n in skel.animated_joints))
    jm = {n: n + "_ge" for n in skel.animated_joints}
    cfg = default_config()
    cfg["n_random_samples"] = 10
    cfg["lm_iterations"] = 2
    ctx = MGContext(graph, cfg, target_skeleton=renamed, joint_name_map=jm)
    out = ctx.run({
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [{"action": "walk", "constraints": [{
            "joint": "Hips", "trajectoryConstraints": [
                {"position": [0, None, 0]}, {"position": [5, None, 60]}]}]}],
    })
    assert "Hips_ge" in out["bvh"]


def test_cli_train_plain_json_output_not_overwritten(tmp_path, graph):
    """`--output walk.json` (no _mm suffix): the sample BVH must go to
    walk_sample.bvh, NOT overwrite the freshly-trained model file."""
    import jax
    from morphablegraphs_tpu.models import primitive as prim_mod
    from morphablegraphs_tpu.serve import cli

    clip_dir = tmp_path / "clips"
    clip_dir.mkdir()
    src = graph.nodes[("walk", "leftStance")].primitive
    skel = graph.skeleton
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, sub = jax.random.split(key)
        s = prim_mod.sample_latent(sub, src, 1)[0]
        frames, n, _ = prim_mod.back_project(src, s, 64, use_time=True)
        sk.write_bvh(skel, np.asarray(frames)[: int(n)],
                     str(clip_dir / f"clip{i}.bvh"))
    out = cli.train_model(str(clip_dir), "plain",
                          str(tmp_path / "plain.json"),
                          config={"max_gmm_components": 2, "npc_temporal": 2})
    model = json.load(open(out))  # still JSON, not BVH text
    assert isinstance(model, dict)
    prim = prim_mod.load_primitive(out)
    assert prim.n_spatial > 0
    assert os.path.exists(str(tmp_path / "plain_sample.bvh"))


def test_end_correction_window_clamps_to_state_length(graph):
    """A blend window larger than the state (reference :206/:238 clamps
    blend_range to n_frames) must leave frame 0 untouched — an unclamped
    ramp would displace the first frame and pop the seam with the previous
    queued state."""
    q = MGStateQueue(graph.skeleton, 1 / 30)
    frames = _frames(30)
    target = np.array([10.0, 0, 40.0])
    corrected = q.apply_end_pos_correction(frames, target, window=50)
    np.testing.assert_allclose(corrected[0], frames[0], atol=1e-6)
    np.testing.assert_allclose(corrected[-1][:3], target, atol=0.5)
    rotated = q.apply_end_orientation_correction(frames, np.array([1.0, 0.0]),
                                                 window=50)
    np.testing.assert_allclose(rotated[0], frames[0], atol=1e-6)
