"""Quaternion kernels vs scipy.spatial.transform oracle."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from morphablegraphs_tpu.ops import quat


def _rand_quats(rng, n):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def _to_scipy(q_wxyz):
    return Rotation.from_quat(np.roll(q_wxyz, -1, axis=-1))  # scipy is xyzw


def test_multiply_matches_scipy():
    rng = np.random.default_rng(0)
    a, b = _rand_quats(rng, 50), _rand_quats(rng, 50)
    ours = np.asarray(quat.multiply(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    ref = (_to_scipy(a) * _to_scipy(b)).as_quat()  # xyzw
    ref = np.roll(ref, 1, axis=-1)
    sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
    assert np.max(np.abs(ours - sign * ref)) < 1e-5


def test_rotate_vec_matches_matrix():
    rng = np.random.default_rng(1)
    q = _rand_quats(rng, 40)
    v = rng.standard_normal((40, 3))
    ours = np.asarray(quat.rotate_vec(jnp.asarray(q, jnp.float32), jnp.asarray(v, jnp.float32)))
    ref = _to_scipy(q).apply(v)
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_matrix_roundtrip():
    rng = np.random.default_rng(2)
    q = _rand_quats(rng, 100)
    m = quat.to_matrix(jnp.asarray(q, jnp.float32))
    ref_m = _to_scipy(q).as_matrix()
    assert np.max(np.abs(np.asarray(m) - ref_m)) < 1e-5
    q2 = np.asarray(quat.from_matrix(m))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    assert np.max(np.abs(q2 - sign * q)) < 1e-4


def test_euler_roundtrip_bvh_orders():
    rng = np.random.default_rng(3)
    for order in ["rxyz", "rzyx", "rzxy", "ryxz"]:
        angles = rng.uniform(-80, 80, (30, 3))
        q = quat.from_euler(jnp.asarray(angles, jnp.float32), order)
        # scipy intrinsic rotations: uppercase axes, same sequence
        seq = order[1:].upper()
        ref = Rotation.from_euler(seq, angles, degrees=True)
        ours_m = np.asarray(quat.to_matrix(q))
        assert np.max(np.abs(ours_m - ref.as_matrix())) < 1e-5, order
        back = np.asarray(quat.to_euler(q, order))
        assert np.max(np.abs(back - angles)) < 1e-3, order


def test_slerp_against_scipy():
    from scipy.spatial.transform import Slerp
    rng = np.random.default_rng(4)
    q = _rand_quats(rng, 2)
    rot = _to_scipy(q)
    sl = Slerp([0.0, 1.0], rot)
    ts = np.linspace(0, 1, 11)
    ref = sl(ts).as_quat()
    ref = np.roll(ref, 1, axis=-1)
    ours = np.asarray(quat.slerp(jnp.asarray(np.tile(q[0], (11, 1)), jnp.float32),
                                 jnp.asarray(np.tile(q[1], (11, 1)), jnp.float32),
                                 jnp.asarray(ts, jnp.float32)))
    sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
    assert np.max(np.abs(ours - sign * ref)) < 1e-4


def test_fix_signs_sequential():
    rng = np.random.default_rng(5)
    q = _rand_quats(rng, 20)
    # Introduce random sign flips down a "time" axis
    signs = rng.choice([-1.0, 1.0], size=(20, 1))
    flipped = q * signs
    fixed = np.asarray(quat.fix_signs_sequential(jnp.asarray(flipped, jnp.float32)))
    dots = np.sum(fixed[1:] * fixed[:-1], axis=-1)
    # fixed[i+1] = q[i+1] * prod(step signs) makes every consecutive dot |dot|
    assert np.all(dots >= -1e-6)
    assert not np.any(np.isnan(fixed))
