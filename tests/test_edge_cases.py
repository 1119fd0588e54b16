"""Degenerate-size property sweep (round-2 escape class: T=1 collapsed
fix_signs_sequential, export dropped rest rotations — both only visible at
degenerate sizes).  Parametrized over the smallest legal inputs everywhere:
T=1 motions, a 1-joint skeleton, empty constraint sets, zero-length paths,
n_basis=4 (the cubic B-spline minimum) — at both the toy and the
reference scale where a scale exists."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.models import primitive as prim_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.ops import bspline, quat, spline_path
from morphablegraphs_tpu.utils.synthetic import (
    REF_BVH, TEST_BVH, make_legacy_model_json)

# A single-joint skeleton: root + end site only (the smallest hierarchy the
# BVH grammar allows).
ONE_JOINT_BVH = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  End Site
  {
    OFFSET 0.0 10.0 0.0
  }
}
MOTION
Frames: 1
Frame Time: 0.013889
0.0 90.0 0.0 0.0 0.0 0.0
"""

SKELETONS = {"one_joint": ONE_JOINT_BVH, "toy": TEST_BVH, "ref": REF_BVH}


def _rand_frames(rng, skel, t):
    """Valid random quat frames [t, 3+4J] for a skeleton."""
    n_j = len(skel.animated_joints)
    q = rng.standard_normal((t, n_j, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    frames = np.zeros((t, 3 + 4 * n_j), np.float32)
    frames[:, :3] = rng.standard_normal((t, 3))
    frames[:, 3:] = q.reshape(t, -1)
    return frames


# ---------------------------------------------------------------------------
# quat: T=1 sequences
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("t", [1, 2, 5])
def test_fix_signs_sequential_preserves_length(t):
    rng = np.random.default_rng(t)
    q = rng.standard_normal((t, 3, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    out = np.asarray(quat.fix_signs_sequential(jnp.asarray(q)))
    assert out.shape == q.shape
    assert np.all(np.abs(np.abs(out) - np.abs(q)) < 1e-6)  # sign-only edit
    # consecutive frames on the same hemisphere
    if t > 1:
        assert np.all(np.sum(out[1:] * out[:-1], axis=-1) >= -1e-6)


def test_slerp_endpoints_and_identical():
    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    q1 = quat.about_y(jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(quat.slerp(q0, q1, 0.0)),
                               np.asarray(q0), atol=1e-6)
    s1 = np.asarray(quat.slerp(q0, q1, 1.0))
    assert np.abs(np.dot(s1, np.asarray(q1))) > 1 - 1e-5
    # identical endpoints: the sin(theta)/sin(0) division must not NaN
    mid = np.asarray(quat.slerp(q0, q0, 0.5))
    assert np.all(np.isfinite(mid))
    np.testing.assert_allclose(np.abs(mid), np.abs(np.asarray(q0)), atol=1e-5)


@pytest.mark.parametrize("order", ["rxyz", "rzxy"])
def test_euler_roundtrip_single_frame(order):
    angles = jnp.asarray([[10.0, -20.0, 30.0]])
    q = quat.from_euler(angles, order)
    back = quat.from_euler(quat.to_euler(q, order), order)
    d = np.abs(np.sum(np.asarray(q) * np.asarray(back), axis=-1))
    assert np.all(d > 1 - 1e-5)


# ---------------------------------------------------------------------------
# bspline: n_basis=4 (cubic minimum) and tiny frame counts
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_frames", [4, 5, 130])
def test_bspline_min_basis_fit_roundtrip(n_frames):
    """n_basis=4 is the smallest clamped cubic basis; fitting a cubic
    polynomial there must reproduce it at the samples."""
    knots = jnp.asarray(bspline.clamped_knots(4, n_frames))
    t = jnp.linspace(0.0, n_frames - 1.0, n_frames)
    tn = t / max(n_frames - 1.0, 1.0)  # unit-scaled: keep f32 QR well-posed
    y = (0.1 * tn**3 - tn**2 + 3.0 * tn + 1.0)[:, None]
    coeffs = bspline.fit_coeffs(y, knots, t)
    y2 = bspline.evaluate(coeffs, knots, t)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y),
                               rtol=1e-3, atol=1e-2)


def test_bspline_single_query_point():
    knots = jnp.asarray(bspline.clamped_knots(4, 10))
    coeffs = jnp.ones((4, 2))
    out = np.asarray(bspline.evaluate(coeffs, knots, jnp.asarray([0.0])))
    assert out.shape == (1, 2) and np.all(np.isfinite(out))
    # domain endpoints must evaluate (clamped basis sums to 1 there)
    for tq in (0.0, 9.0):
        v = np.asarray(bspline.evaluate(coeffs, knots, jnp.asarray([tq])))
        np.testing.assert_allclose(v, 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# skeleton: 1-joint hierarchy, T=1 motions, BVH roundtrip at all scales
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", list(SKELETONS))
def test_bvh_roundtrip_single_frame(name):
    skel, euler = sk.load_bvh(SKELETONS[name])
    rng = np.random.default_rng(7)
    frames = _rand_frames(rng, skel, 1)
    text = sk.write_bvh(skel, frames)
    skel2, euler2 = sk.load_bvh(text)
    frames2 = sk.bvh_to_quat_frames(skel2, euler2)
    assert frames2.shape == frames.shape
    # positions identical through the euler round-trip (quats up to sign
    # and euler path, so compare FK point clouds instead of raw channels)
    p1 = np.asarray(sk.fk_positions(skel, jnp.asarray(frames)))
    p2 = np.asarray(sk.fk_positions(skel2, jnp.asarray(frames2)))
    np.testing.assert_allclose(p1, p2, atol=1e-3)


@pytest.mark.parametrize("name", list(SKELETONS))
@pytest.mark.parametrize("t", [1, 3])
def test_fk_degenerate_sizes(name, t):
    skel, _ = sk.load_bvh(SKELETONS[name])
    rng = np.random.default_rng(t)
    frames = jnp.asarray(_rand_frames(rng, skel, t))
    pos = np.asarray(sk.fk_positions(skel, frames))
    assert pos.shape[0] == t and np.all(np.isfinite(pos))
    # root FK = root offset + the frame's own translation channel
    np.testing.assert_allclose(
        pos[:, 0], np.asarray(frames[:, :3]) + skel.offsets[0], atol=1e-5)


def test_one_joint_fixed_completion():
    """add_fixed_joint_parameters_to_motion on the minimal skeleton is a
    no-op that keeps shape (no fixed joints to add)."""
    skel, _ = sk.load_bvh(ONE_JOINT_BVH)
    frames = _rand_frames(np.random.default_rng(0), skel, 1)
    full = sk.add_fixed_joint_parameters_to_motion(skel, frames)
    assert full.shape[0] == 1 and np.all(np.isfinite(full))


# ---------------------------------------------------------------------------
# spline_path: zero-length and minimal paths
# ---------------------------------------------------------------------------

def test_zero_length_path_queries_finite():
    """Two identical control points: arc length 0.  Every query must stay
    finite and return the point itself."""
    p = np.array([[1.0, 0.0, 2.0], [1.0, 0.0, 2.0]])
    sp = spline_path.build(p)
    # f32 noise accumulates over the granularity-segment arc table
    assert float(sp.table_arc[-1]) < 1e-2
    for arc in (0.0, 0.5):
        pt = np.asarray(spline_path.point_at_arc_length(sp, jnp.asarray(arc)))
        assert np.all(np.isfinite(pt))
        np.testing.assert_allclose(pt, p[0], atol=1e-5)
    tan = np.asarray(spline_path.tangent_at_arc_length(sp, jnp.asarray(0.0)))
    assert np.all(np.isfinite(tan))
    pt, arc, dist = (np.asarray(x) for x in spline_path.closest_point(
        sp, jnp.asarray([0.0, 0.0, 0.0])))
    assert np.isfinite(arc) and np.isfinite(dist)
    np.testing.assert_allclose(pt, p[0], atol=1e-3)


def test_two_point_path_exact():
    """The minimal legal path (2 points) is the straight segment."""
    sp = spline_path.build(np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 10.0]]))
    np.testing.assert_allclose(float(sp.table_arc[-1]), 10.0, atol=0.05)
    mid = np.asarray(spline_path.point_at_arc_length(sp, jnp.asarray(5.0)))
    np.testing.assert_allclose(mid, [0.0, 0.0, 5.0], atol=0.1)


# ---------------------------------------------------------------------------
# primitive: n_basis=4 floor at both scales
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kw", [
    dict(n_joints=1, n_canonical_frames=8, n_basis=4, k_s=2, k_t=2,
         n_components=1),
    dict(n_joints=19, n_canonical_frames=130, n_basis=4, k_s=3, k_t=2,
         n_components=2),
])
def test_primitive_min_basis_back_project(kw):
    prim = prim_mod.load_primitive_json(make_legacy_model_json(seed=3, **kw))
    s = prim_mod.sample_latent(jax.random.PRNGKey(0), prim, 1)[0]
    frames, n, _ = prim_mod.back_project(prim, s, kw["n_canonical_frames"],
                                         use_time=True)
    frames = np.asarray(frames)
    assert int(n) >= 1 and np.all(np.isfinite(frames[: int(n)]))
    # raw spline output: quats are near-unit but unnormalized by design
    # (normalization happens downstream) — just no degenerate collapse
    n_j = kw["n_joints"]
    q = frames[: int(n), 3:3 + 4 * n_j].reshape(int(n), n_j, 4)
    assert np.all(np.linalg.norm(q, axis=-1) > 0.1)


# ---------------------------------------------------------------------------
# constraints: the empty set
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scale", ["toy", "ref"])
def test_empty_constraint_set_zero_error(scale):
    from morphablegraphs_tpu.constraints import compiled
    if scale == "toy":
        kw = dict(n_joints=1, n_canonical_frames=8, n_basis=4, k_s=2,
                  k_t=2, n_components=1)
        bvh = ONE_JOINT_BVH
    else:
        kw = dict(n_joints=19, n_canonical_frames=130, n_basis=16, k_s=5,
                  k_t=2, n_components=2)
        bvh = REF_BVH
    skel, _ = sk.load_bvh(bvh)
    prim = prim_mod.load_primitive_json(make_legacy_model_json(seed=1, **kw))
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    s = prim_mod.sample_latent(jax.random.PRNGKey(1), prim, 1)[0]
    err = float(compiled.evaluate_error(skel, prim, sc, s))
    assert np.isfinite(err) and abs(err) < 1e-6
