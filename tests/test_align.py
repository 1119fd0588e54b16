"""Alignment / concatenation semantics (reference motion_generator/utils.py
smooth_quaternion_frames2 + mg_state_planner.py:92-107 aligning transform)."""

import numpy as np

import jax.numpy as jnp

from morphablegraphs_tpu.ops import align, quat


def _frame(pos, heading_deg, n_joints=2):
    f = np.zeros(3 + 4 * n_joints, np.float32)
    f[:3] = pos
    half = np.deg2rad(heading_deg) / 2
    f[3:7] = [np.cos(half), 0, np.sin(half), 0]  # rotation about Y
    for j in range(1, n_joints):
        f[3 + 4 * j] = 1.0
    return f


def test_heading_angle():
    f = _frame([0, 0, 0], 0.0)
    assert abs(float(align.heading_angle(jnp.asarray(f[3:7])))) < 1e-5
    f90 = _frame([0, 0, 0], 90.0)
    assert abs(float(align.heading_angle(jnp.asarray(f90[3:7]))) - np.pi / 2) < 1e-4


def test_aligning_transform_matches_seam():
    prev_last = _frame([5.0, 1.0, 7.0], 35.0)
    new_first = _frame([2.0, 1.5, -3.0], -20.0)
    q_y, delta = align.node_aligning_2d_transform(jnp.asarray(prev_last),
                                                  jnp.asarray(new_first))
    moved = align.transform_frames(jnp.asarray(new_first)[None], q_y, delta)[0]
    moved = np.asarray(moved)
    # XZ position coincides; Y position untouched by delta
    assert abs(moved[0] - prev_last[0]) < 1e-4
    assert abs(moved[2] - prev_last[2]) < 1e-4
    assert abs(moved[1] - new_first[1]) < 1e-4
    # heading matches
    a = float(align.heading_angle(jnp.asarray(moved[3:7])))
    b = float(align.heading_angle(jnp.asarray(prev_last[3:7])))
    assert abs(a - b) < 1e-4


def test_smooth_transition_continuity():
    rng = np.random.default_rng(0)
    prev = _frame([0, 0, 0], 10.0)
    frames = np.stack([_frame([0.5 * i, 0, 0.2 * i], 20.0) for i in range(30)])
    out = np.asarray(align.smooth_transition(jnp.asarray(prev),
                                             jnp.asarray(frames), window=10))
    # frame 0 is pulled exactly onto prev
    np.testing.assert_allclose(out[0], prev, atol=1e-5)
    # frames beyond the window are untouched
    np.testing.assert_allclose(out[15:], frames[15:], atol=1e-5)
    # monotone decay in between
    d = np.linalg.norm(out[:12] - frames[:12], axis=1)
    assert np.all(np.diff(d) <= 1e-5)


def test_append_frames_masked():
    d = 11
    buf = jnp.zeros((64, d))
    n_valid = jnp.asarray(0, jnp.int32)
    clip1 = jnp.asarray(np.tile(_frame([0, 0, 0], 0.0), (16, 1)))
    buf, n_valid = align.append_frames(buf, n_valid, clip1, jnp.asarray(10, jnp.int32))
    assert int(n_valid) == 10
    # first clip written unaligned
    np.testing.assert_allclose(np.asarray(buf)[0], np.asarray(clip1)[0], atol=1e-6)
    clip2 = jnp.asarray(np.tile(_frame([100.0, 0, 50.0], 45.0), (16, 1)))
    buf, n_valid = align.append_frames(buf, n_valid, clip2, jnp.asarray(12, jnp.int32))
    assert int(n_valid) == 22
    # second clip got aligned: its first frame == last frame of first clip
    np.testing.assert_allclose(np.asarray(buf)[10][:3], np.asarray(buf)[9][:3], atol=1e-4)


def test_append_frames_overflow_drops_clip():
    """A clip whose write slab would overrun the fixed buffer is dropped
    (dynamic_update_slice would clamp backward and corrupt earlier frames)."""
    from morphablegraphs_tpu.ops import align
    d = 7
    buf = jnp.zeros((100, d))
    marker = jnp.full((40, d), 5.0).at[:, 3].set(1.0)
    buf, n = align.append_frames(buf, jnp.asarray(0), marker, jnp.asarray(40),
                                 window=4)
    buf, n = align.append_frames(buf, n, marker, jnp.asarray(40), window=4)
    assert int(n) == 80
    before = np.asarray(buf).copy()
    # 40 more rows do not fit into the remaining 20
    buf, n = align.append_frames(buf, n, marker, jnp.asarray(40), window=4)
    assert int(n) == 80  # unchanged
    np.testing.assert_array_equal(np.asarray(buf), before)
