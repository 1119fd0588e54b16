"""Relative-transform / joint-rotation constraints + frame arithmetic."""

import numpy as np
import pytest

import jax.numpy as jnp

from morphablegraphs_tpu.constraints import compiled
from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.ops import quat

from fixtures import TEST_BVH, make_graph_dict


@pytest.fixture(scope="module")
def setup():
    g = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    prim = g.nodes[("walk", "leftStance")].primitive
    return skel, prim


def test_relative_transform_constraint(setup):
    skel, prim = setup
    s = jnp.zeros(prim.n_latent)
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    # compute the Head's actual offset in the Spine's frame at the end frame
    coeffs = np.asarray(compiled.aligned_coeffs(prim, s, sc))
    from morphablegraphs_tpu.ops import bspline
    frame = np.asarray(bspline.evaluate(
        jnp.asarray(coeffs), prim.knots_s,
        jnp.asarray([float(prim.n_canonical_frames - 1)])))[0]
    pos, ori = sk.fk_global(skel, jnp.asarray(frame))
    spine_i, head_i = skel.index_of("Spine"), skel.index_of("Head")
    rel = np.asarray(quat.rotate_vec(
        quat.conjugate(quat.normalize(ori[spine_i])),
        pos[head_i] - pos[spine_i]))
    sc1 = compiled.set_relative_transform_constraint(
        sc, skel, "Head", "Spine", rel, prim.n_canonical_frames - 1)
    err = float(compiled.evaluate_error(skel, prim, sc1, s, use_traj=False,
                                        use_ca=False))
    assert err < 0.1, err
    # wrong offset -> error ~ its magnitude
    sc2 = compiled.set_relative_transform_constraint(
        sc, skel, "Head", "Spine", rel + np.array([7.0, 0, 0]),
        prim.n_canonical_frames - 1)
    err2 = float(compiled.evaluate_error(skel, prim, sc2, s, use_traj=False,
                                         use_ca=False))
    assert abs(err2 - 7.0) < 0.2


def test_joint_rotation_constraint(setup):
    skel, prim = setup
    s = jnp.zeros(prim.n_latent)
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    coeffs = np.asarray(compiled.aligned_coeffs(prim, s, sc))
    from morphablegraphs_tpu.ops import bspline
    frame = np.asarray(bspline.evaluate(
        jnp.asarray(coeffs), prim.knots_s, jnp.asarray([0.0])))[0]
    j = skel.animated_index_of("Spine")
    q_actual = frame[3 + 4 * j: 7 + 4 * j]
    q_actual = q_actual / np.linalg.norm(q_actual)
    sc1 = compiled.set_joint_rotation_constraint(sc, skel, "Spine", q_actual, 0)
    err = float(compiled.evaluate_error(skel, prim, sc1, s, use_traj=False,
                                        use_ca=False))
    assert err < 0.05
    # 90 degrees off -> ~pi/2
    q_rot = np.asarray(quat.multiply(
        jnp.asarray([np.cos(np.pi / 4), np.sin(np.pi / 4), 0.0, 0.0]),
        jnp.asarray(q_actual)))
    sc2 = compiled.set_joint_rotation_constraint(sc, skel, "Spine", q_rot, 0)
    err2 = float(compiled.evaluate_error(skel, prim, sc2, s, use_traj=False,
                                         use_ca=False))
    assert abs(err2 - np.pi / 2) < 0.1


def test_frame_arithmetic():
    rng = np.random.default_rng(0)
    d = 3 + 4 * 2
    a = np.zeros(d, np.float32)
    b = np.zeros(d, np.float32)
    a[:3] = [1, 2, 3]
    b[:3] = [10, 20, 30]
    for j in range(2):
        qa = rng.standard_normal(4)
        qb = rng.standard_normal(4)
        a[3 + 4 * j: 7 + 4 * j] = qa / np.linalg.norm(qa)
        b[3 + 4 * j: 7 + 4 * j] = qb / np.linalg.norm(qb)
    c = np.asarray(quat.add_frames(jnp.asarray(a), jnp.asarray(b)))
    back = np.asarray(quat.subtract_frames(jnp.asarray(c), jnp.asarray(a)))
    np.testing.assert_allclose(back[:3], b[:3], atol=1e-5)
    # subtract recovers b's quats up to sign... add then subtract:
    # c = a*b (quats), c - a = a^-1 * (a*b) = b
    for j in range(2):
        sl = slice(3 + 4 * j, 7 + 4 * j)
        sign = np.sign(np.dot(back[sl], b[sl]))
        np.testing.assert_allclose(sign * back[sl], b[sl], atol=1e-5)
