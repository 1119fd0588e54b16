"""Device-mesh crowd parallelism + server constraint builder tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu import parallel

from fixtures import TEST_BVH, make_graph_dict


@pytest.fixture(scope="module")
def stacked():
    g = graph_mod.build_graph_from_dict(make_graph_dict())
    return graph_mod.stack_graph(g)


def test_crowd_walk_sharded_8_devices(stacked):
    assert len(jax.devices()) == 8  # conftest forces 8 virtual CPU devices
    mesh = parallel.make_mesh(8)
    start = stacked.node_id(("walk", "beginLeftStance"))
    buf, n_valid, ids, lat = parallel.crowd_walk_sharded(
        mesh, stacked, jax.random.PRNGKey(0), start, n_chars=16, n_steps=3,
        max_step_frames=64)
    assert buf.shape[0] == 16
    # output sharding follows the input dp sharding
    assert len(buf.sharding.device_set) == 8
    frames0 = np.asarray(buf[0])[: int(n_valid[0])]
    assert not np.any(np.isnan(frames0))


def test_sharded_matches_single_device(stacked):
    """dp-sharded execution must be numerically identical to single-device."""
    from morphablegraphs_tpu.synthesis import walk as walk_mod
    start = stacked.node_id(("walk", "beginLeftStance"))
    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    single = jax.vmap(lambda k: walk_mod.random_walk(
        k, stacked, jnp.asarray(start, jnp.int32), n_steps=3,
        max_step_frames=64))(keys)
    mesh = parallel.make_mesh(8)
    sharded = parallel.crowd_walk_sharded(mesh, stacked,
                                          jax.random.PRNGKey(7), start,
                                          n_chars=8, n_steps=3,
                                          max_step_frames=64)
    # partitioned compilation may tile matmuls differently -> f32 noise
    np.testing.assert_allclose(np.asarray(single[0]), np.asarray(sharded[0]),
                               atol=1e-4)


def test_unity_frame_roundtrip():
    from morphablegraphs_tpu.constraints import server_builder as sb
    skel, _ = sk.load_bvh(TEST_BVH)
    frame = np.zeros(skel.n_frame_params, np.float32)
    frame[:3] = [10.0, 90.0, -5.0]
    rng = np.random.default_rng(0)
    for j in range(skel.n_animated):
        q = rng.standard_normal(4)
        frame[3 + 4 * j: 7 + 4 * j] = q / np.linalg.norm(q)
    unity = sb.mg_frame_to_unity_frame(skel, frame)
    back = sb.unity_frame_to_mg_frame(skel, unity)
    np.testing.assert_allclose(back, frame, atol=1e-5)


def test_generate_walk_constraints():
    from morphablegraphs_tpu.constraints import server_builder as sb, compiled
    from morphablegraphs_tpu.models import primitive as prim_mod
    from fixtures import make_legacy_model_json
    skel, _ = sk.load_bvh(TEST_BVH)
    prim = prim_mod.load_primitive_json(make_legacy_model_json(seed=0))
    sc = sb.generate_walk_constraints(skel, prim, target_dir_xz=[0.0, 1.0],
                                      target_pos=[5.0, 0.0, 30.0])
    assert float(np.asarray(sc.dir_active)) == 1.0
    assert float(np.asarray(sc.kf_active).sum()) == 1.0
    err = compiled.evaluate_error(skel, prim, sc,
                                  jnp.zeros(prim.n_latent), use_traj=False)
    assert np.isfinite(float(err))


def test_constrained_crowd_sharded_matches_single_device(stacked):
    """The sharded full-constraint crowd (serving's multi-device path and
    the driver dryrun) matches unsharded execution, including the
    pad-to-mesh path for character counts that do not divide the mesh."""
    from morphablegraphs_tpu.ops import spline_path
    from morphablegraphs_tpu.synthesis import constrained_walk as cw
    skel, _ = sk.load_bvh(TEST_BVH)
    start = stacked.node_id(("walk", "beginLeftStance"))
    n_chars = 8
    paths = cw.stack_paths([spline_path.build(
        np.array([[0.0, 0, 0], [5.0 * i, 0, 60], [0.0, 0, 120]], np.float32),
        unconstrained_dims=(1,)) for i in range(n_chars)])
    kw = dict(n_steps=3, max_step_frames=32, n_samples=8, lm_iters=2)
    keys = jax.random.split(jax.random.PRNGKey(3), n_chars)
    scs = cw.default_step_scs(skel, 3)
    single = jax.vmap(lambda k, p, s: cw.constrained_walk_full(
        skel, k, stacked, p, s, step_scs=scs, **kw))(
            keys, paths, jnp.full((n_chars,), start, jnp.int32))
    mesh = parallel.make_mesh(8)
    sharded = parallel.constrained_crowd_sharded(
        mesh, skel, stacked, paths, jax.random.PRNGKey(3),
        jnp.full((n_chars,), start, jnp.int32), **kw)
    # partitioned compilation tiles the LM matmuls differently -> f32
    # noise (measured max 2.4e-3 on ~90-unit channels); node choices and
    # frame shapes must be identical
    np.testing.assert_allclose(np.asarray(single[0]), np.asarray(sharded[0]),
                               atol=1e-2)
    np.testing.assert_array_equal(np.asarray(single[2]),
                                  np.asarray(sharded[2]))
    # non-divisible char count: padded to the mesh, outputs sliced back
    paths5 = jax.tree.map(lambda x: x[:5], paths)
    segs5, nf5, ids5, errs5 = parallel.constrained_crowd_sharded(
        mesh, skel, stacked, paths5, jax.random.PRNGKey(3),
        jnp.full((5,), start, jnp.int32), **kw)
    assert segs5.shape[0] == 5 and errs5.shape[0] == 5
    assert not np.any(np.isnan(np.asarray(segs5)))


def test_constrained_crowd_sharded_rejects_unscored_slots(stacked):
    """pallas_selection through the public sharded API must hit the same
    host-side contract guard as constrained_walk_full_crowd: the kernel
    scores the locomotion family only, so a step_scs carrying a user
    keyframe slot would be silently mis-ranked."""
    from morphablegraphs_tpu.constraints import compiled
    from morphablegraphs_tpu.ops import spline_path
    from morphablegraphs_tpu.synthesis import constrained_walk as cw
    skel, _ = sk.load_bvh(TEST_BVH)
    start = stacked.node_id(("walk", "beginLeftStance"))
    paths = cw.stack_paths([spline_path.build(
        np.array([[0.0, 0, 0], [5.0, 0, 60], [0.0, 0, 120]], np.float32),
        unconstrained_dims=(1,))])
    base = compiled.empty_step_constraints(skel, 0)
    base = compiled.set_keyframe_constraint(
        base, 2, skel, "Head", 10.0, position=[1.0, 2.0, 3.0])
    scs = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (2,) + np.shape(x)), base)
    mesh = parallel.make_mesh(1)
    with pytest.raises(ValueError, match="locomotion family"):
        parallel.constrained_crowd_sharded(
            mesh, skel, stacked, paths, jax.random.PRNGKey(0),
            jnp.full((1,), start, jnp.int32), n_steps=2, step_scs=scs,
            max_step_frames=32, n_samples=128, lm_iters=2,
            pallas_selection=True)


def test_constrained_crowd_sharded_frozen_ee(stacked):
    """The frozen-ee LM (pure XLA — GSPMD-partitionable, unlike the Pallas
    kernels) runs through the sharded crowd and matches single-device
    execution; a step_scs with slots outside the frozen-ee family hits the
    same host-side contract guard as constrained_walk_full_crowd."""
    from morphablegraphs_tpu.constraints import compiled
    from morphablegraphs_tpu.ops import spline_path
    from morphablegraphs_tpu.synthesis import constrained_walk as cw
    skel, _ = sk.load_bvh(TEST_BVH)
    start = stacked.node_id(("walk", "beginLeftStance"))
    n_chars = 8
    paths = cw.stack_paths([spline_path.build(
        np.array([[0.0, 0, 0], [4.0 * i, 0, 60], [0.0, 0, 120]], np.float32),
        unconstrained_dims=(1,)) for i in range(n_chars)])
    base = compiled.empty_step_constraints(skel, 0)
    base = compiled.set_keyframe_constraint(
        base, 2, skel, "Head", 10.0, position=[5.0, 20.0, 30.0])
    scs = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (2,) + np.shape(x)), base)
    kw = dict(n_steps=2, max_step_frames=32, n_samples=8, lm_iters=2,
              lm_frozen=True, frozen_ee="Head")
    keys = jax.random.split(jax.random.PRNGKey(4), n_chars)
    single = jax.vmap(lambda k, p, s: cw.constrained_walk_full(
        skel, k, stacked, p, s, step_scs=scs, **kw))(
            keys, paths, jnp.full((n_chars,), start, jnp.int32))
    mesh = parallel.make_mesh(8)
    sharded = parallel.constrained_crowd_sharded(
        mesh, skel, stacked, paths, jax.random.PRNGKey(4),
        jnp.full((n_chars,), start, jnp.int32), step_scs=scs, **kw)
    np.testing.assert_array_equal(np.asarray(single[2]),
                                  np.asarray(sharded[2]))
    np.testing.assert_allclose(np.asarray(single[0]), np.asarray(sharded[0]),
                               atol=1e-2)
    # contract guard: a second user slot outside the frozen-ee family
    bad = compiled.set_keyframe_constraint(
        base, 3, skel, skel.node_names[1], 5.0, position=[0.0, 1.0, 2.0])
    bad_scs = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (2,) + np.shape(x)), bad)
    with pytest.raises(ValueError, match="frozen-ee|exact LM"):
        parallel.constrained_crowd_sharded(
            mesh, skel, stacked, paths, jax.random.PRNGKey(4),
            jnp.full((n_chars,), start, jnp.int32), step_scs=bad_scs, **kw)
