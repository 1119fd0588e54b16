"""Skeleton / BVH IO / FK tests."""

import numpy as np

import jax.numpy as jnp

from morphablegraphs_tpu.models import skeleton as sk

from fixtures import TEST_BVH


def test_bvh_parse():
    skel, frames = sk.load_bvh(TEST_BVH)
    assert skel.node_names[0] == "Hips"
    assert "Head_EndSite" in skel.node_names
    assert skel.animated_joints == ("Hips", "Spine", "Head", "Leg")
    assert frames.shape == (2, 15)
    assert abs(skel.frame_time - 0.033333) < 1e-6
    assert skel.parents[skel.index_of("Spine")] == skel.index_of("Hips")


def test_quat_frame_roundtrip():
    skel, euler = sk.load_bvh(TEST_BVH)
    qf = sk.bvh_to_quat_frames(skel, euler)
    assert qf.shape == (2, 3 + 4 * 4)
    # root translation preserved
    np.testing.assert_allclose(qf[:, :3], euler[:, :3], atol=1e-5)
    back = sk.quat_frames_to_bvh(skel, qf)
    # angles should round-trip (mod equivalent euler representations; here
    # small angles so direct comparison holds)
    np.testing.assert_allclose(back, euler, atol=1e-3)


def test_bvh_write_reload_roundtrip():
    skel, euler = sk.load_bvh(TEST_BVH)
    qf = sk.bvh_to_quat_frames(skel, euler)
    text = sk.write_bvh(skel, qf)
    skel2, euler2 = sk.load_bvh(text)
    assert skel2.node_names == skel.node_names
    np.testing.assert_allclose(skel2.offsets, skel.offsets, atol=1e-5)
    np.testing.assert_allclose(euler2, sk.quat_frames_to_bvh(skel, qf), atol=1e-4)


def test_fk_rest_pose():
    skel, euler = sk.load_bvh(TEST_BVH)
    qf = sk.bvh_to_quat_frames(skel, euler)
    # Zero rotations, root at BVH offset -> positions = cumulative offsets
    identity = np.zeros(3 + 16, np.float32)
    identity[:3] = [0, 90, 0]
    for j in range(4):
        identity[3 + 4 * j] = 1.0
    pos = np.asarray(sk.fk_positions(skel, jnp.asarray(identity)))
    # Hips at offset(0,90,0) + root_t(0,90,0)? Note: reference semantics add
    # root translation to the root offset.
    hips = pos[skel.index_of("Hips")]
    spine = pos[skel.index_of("Spine")]
    head = pos[skel.index_of("Head")]
    leg = pos[skel.index_of("Leg")]
    np.testing.assert_allclose(spine - hips, [0, 20, 0], atol=1e-5)
    np.testing.assert_allclose(head - spine, [0, 15, 0], atol=1e-5)
    np.testing.assert_allclose(leg - hips, [5, -45, 0], atol=1e-5)


def test_fk_rotation_propagates():
    skel, _ = sk.load_bvh(TEST_BVH)
    frame = np.zeros(3 + 16, np.float32)
    for j in range(4):
        frame[3 + 4 * j] = 1.0
    # Rotate hips 90 deg about Z: children move accordingly
    half = np.deg2rad(90) / 2
    frame[3:7] = [np.cos(half), 0, 0, np.sin(half)]
    pos = np.asarray(sk.fk_positions(skel, jnp.asarray(frame)))
    hips = pos[skel.index_of("Hips")]
    spine = pos[skel.index_of("Spine")]
    # offset (0,20,0) rotated 90deg about z -> (-20, 0, 0)
    np.testing.assert_allclose(spine - hips, [-20, 0, 0], atol=1e-4)


def test_fk_batched():
    skel, euler = sk.load_bvh(TEST_BVH)
    qf = sk.bvh_to_quat_frames(skel, euler)
    pos = np.asarray(sk.fk_positions(skel, jnp.asarray(qf, jnp.float32)))
    assert pos.shape == (2, skel.n_nodes, 3)
    assert not np.any(np.isnan(pos))


def test_add_fixed_joint_parameters_to_motion():
    """anim_utils add_fixed_joint_parameters_to_motion: frames over a joint
    subset expand to the full animated set with identity quats elsewhere."""
    skel, _ = sk.load_bvh(TEST_BVH)
    subset = skel.animated_joints[:2]
    frames = np.zeros((3, 3 + 4 * 2), np.float32)
    frames[:, 0] = 7.0  # root x
    frames[:, 3:7] = [0.0, 1.0, 0.0, 0.0]  # first joint: 180deg about x
    frames[:, 7:11] = [0.0, 0.0, 1.0, 0.0]
    out = sk.add_fixed_joint_parameters_to_motion(skel, frames, subset)
    assert out.shape == (3, skel.n_frame_params)
    assert np.all(out[:, 0] == 7.0)
    assert np.allclose(out[:, 3:7], [0, 1, 0, 0])
    assert np.allclose(out[:, 7:11], [0, 0, 1, 0])
    # unmodelled joints get identity quaternions
    for j in range(2, skel.n_animated):
        assert np.allclose(out[:, 3 + 4 * j: 7 + 4 * j], [1, 0, 0, 0])
    # full-set input is returned unchanged
    full = np.zeros((2, skel.n_frame_params), np.float32)
    assert sk.add_fixed_joint_parameters_to_motion(skel, full) is full


def test_joint_weight_map():
    skel, _ = sk.load_bvh(TEST_BVH)
    assert skel.joint_weight_map == {j: 1.0 for j in skel.animated_joints}
    import dataclasses
    w = tuple(float(i + 1) for i in range(skel.n_animated))
    skel2 = dataclasses.replace(skel, joint_weights=w)
    assert skel2.joint_weight_map[skel.animated_joints[-1]] == float(skel.n_animated)


def test_depth_joint_weights():
    from morphablegraphs_tpu.models.skeleton_models import depth_joint_weights
    skel, _ = sk.load_bvh(TEST_BVH)
    w = depth_joint_weights(skel, decay=0.5)
    assert len(w) == skel.n_animated
    assert w[0] == 1.0  # root at depth 0
    # monotone down the chain: child weight <= parent weight
    by_name = dict(zip(skel.animated_joints, w))
    for name in skel.animated_joints:
        p = skel.parents[skel.index_of(name)]
        while p >= 0 and skel.node_names[p] not in by_name:
            p = skel.parents[p]
        if p >= 0:
            assert by_name[name] <= by_name[skel.node_names[p]]


def test_fk_node_matches_fk_global():
    """Chain FK (fk_node) composes local transforms in fk_global's order —
    results match the full-skeleton pass to fusion-level rounding."""
    from morphablegraphs_tpu.utils.synthetic import REF_BVH
    rng = np.random.default_rng(3)
    for bvh in (TEST_BVH, REF_BVH):
        skel, _ = sk.load_bvh(bvh)
        frames = np.zeros((6, skel.n_frame_params), np.float32)
        frames[:, :3] = rng.normal(scale=50.0, size=(6, 3))
        q = rng.normal(size=(6, skel.n_animated, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        frames[:, 3:] = q.reshape(6, -1).astype(np.float32)
        pos_all, ori_all = sk.fk_global(skel, jnp.asarray(frames))
        pos_all, ori_all = np.asarray(pos_all), np.asarray(ori_all)
        nodes = np.arange(skel.n_nodes, dtype=np.int32)
        # batched over frames x nodes via joint broadcasting
        p, o = sk.fk_node(skel, jnp.asarray(frames)[:, None, :],
                          jnp.asarray(nodes)[None, :])
        np.testing.assert_allclose(np.asarray(p), pos_all,
                                   atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(o), ori_all,
                                   atol=1e-5, rtol=1e-5)


def test_fk_node_scalar_query():
    skel, euler = sk.load_bvh(TEST_BVH)
    qf = sk.bvh_to_quat_frames(skel, euler)
    n = skel.index_of("Head")
    p, q = sk.fk_node(skel, jnp.asarray(qf[0]), jnp.asarray(n))
    pos_all, ori_all = sk.fk_global(skel, jnp.asarray(qf[0]))
    np.testing.assert_allclose(np.asarray(p), np.asarray(pos_all)[n],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(q), np.asarray(ori_all)[n],
                               atol=1e-5)


def test_skeleton_json_rest_rotations_in_fk():
    """skeleton.json per-node 'rotation' fields are applied by FK as the
    local rotation of NON-animated joints (anim_utils SkeletonBuilder
    schema) — fixed joints with pre-rotations are no longer treated as
    identity."""
    from morphablegraphs_tpu.models.skeleton import load_skeleton_json
    half = np.deg2rad(90) / 2
    rot90z = [float(np.cos(half)), 0.0, 0.0, float(np.sin(half))]
    data = {"root": "Hips", "animated_joints": ["Hips"],
            "nodes": {
                "Hips": {"offset": [0, 0, 0], "children": ["Fixed"]},
                "Fixed": {"offset": [0, 10, 0], "children": ["Tip"],
                          "rotation": rot90z},
                "Tip": {"offset": [0, 5, 0], "children": []},
            }}
    skel = load_skeleton_json(data)
    assert skel.rest_rotations  # recorded
    frame = np.zeros(skel.n_frame_params, np.float32)
    frame[3] = 1.0  # identity root quat
    pos = np.asarray(sk.fk_positions(skel, jnp.asarray(frame)))
    tip = pos[skel.index_of("Tip")]
    # Fixed rotates its child's (0,5,0) offset 90deg about z -> (-5, 0, 0)
    # relative to Fixed at (0, 10, 0)
    np.testing.assert_allclose(tip, [-5.0, 10.0, 0.0], atol=1e-5)
    # chain FK agrees
    p, _ = sk.fk_node(skel, jnp.asarray(frame),
                      jnp.asarray(skel.index_of("Tip")))
    np.testing.assert_allclose(np.asarray(p), tip, atol=1e-5)


def test_fk_point_cloud_normalize_accepts_numpy():
    skel, euler = sk.load_bvh(TEST_BVH)
    qf = np.asarray(sk.bvh_to_quat_frames(skel, euler))
    pc = np.asarray(sk.fk_point_cloud(skel, qf, normalize=True))
    assert pc.shape == (2, skel.n_nodes, 3)
    # root translation removed: Hips at its offset
    np.testing.assert_allclose(pc[:, skel.index_of("Hips")],
                               [[0, 90, 0], [0, 90, 0]], atol=1e-5)


def test_rest_rotations_survive_bvh_export():
    """write_bvh synthesizes rotation channels for fixed joints carrying a
    rest rotation, so the exported geometry matches internal FK."""
    from morphablegraphs_tpu.models.skeleton import load_skeleton_json
    half = np.deg2rad(90) / 2
    rot90z = [float(np.cos(half)), 0.0, 0.0, float(np.sin(half))]
    data = {"root": "Hips", "animated_joints": ["Hips"],
            "nodes": {
                "Hips": {"offset": [0, 0, 0], "children": ["Fixed"]},
                "Fixed": {"offset": [0, 10, 0], "children": ["Tip"],
                          "rotation": rot90z},
                "Tip": {"offset": [0, 5, 0], "children": []},
            }}
    skel = load_skeleton_json(data)
    frame = np.zeros((1, skel.n_frame_params), np.float32)
    frame[0, 3] = 1.0
    tip_internal = np.asarray(sk.fk_positions(skel, jnp.asarray(frame[0])))[
        skel.index_of("Tip")]
    text = sk.write_bvh(skel, frame)
    skel2, euler2 = sk.load_bvh(text)
    qf2 = sk.bvh_to_quat_frames(skel2, euler2)
    tip_export = np.asarray(sk.fk_positions(skel2, jnp.asarray(qf2[0])))[
        skel2.node_names.index("Tip")]
    np.testing.assert_allclose(tip_export, tip_internal, atol=1e-4)


def test_add_fixed_joint_expansion_uses_rest_rotations():
    from morphablegraphs_tpu.models.skeleton import load_skeleton_json
    half = np.deg2rad(45) / 2
    rest = [float(np.cos(half)), 0.0, float(np.sin(half)), 0.0]
    data = {"root": "Hips", "animated_joints": ["Hips", "Arm"],
            "nodes": {
                "Hips": {"offset": [0, 0, 0], "children": ["Arm"]},
                "Arm": {"offset": [0, 10, 0], "children": [],
                        "rotation": rest},
            }}
    skel = load_skeleton_json(data)
    frames = np.zeros((2, 3 + 4), np.float32)  # Hips-only subset
    frames[:, 3] = 1.0
    out = sk.add_fixed_joint_parameters_to_motion(skel, frames, ("Hips",))
    # the unmodelled Arm gets its REST pose, not identity
    np.testing.assert_allclose(out[:, 7:11], np.tile(rest, (2, 1)), atol=1e-6)
