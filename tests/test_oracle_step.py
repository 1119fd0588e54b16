"""Constrained-step oracle anchor (VERDICT r3 item 4): the numpy/scipy
oracle implements reference residual semantics + reference optimization
(motion_primitive_generator.py:109-190, objective_functions.py:239-267);
the repo must agree on the error of any latent and solve at least as well."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.constraints import compiled
from morphablegraphs_tpu.models import primitive as prim_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.synthesis import generator

from fixtures import TEST_BVH, make_legacy_model_json
from reference_oracle import oracle_constrained_step

GOAL = np.array([5.0, np.nan, 30.0])
DIR = np.array([0.2, 1.0]) / np.linalg.norm([0.2, 1.0])


@pytest.fixture(scope="module")
def setup():
    data = make_legacy_model_json(seed=0)
    prim = prim_mod.load_primitive_json(data)
    skel, _ = sk.load_bvh(TEST_BVH)
    end_kf = data["n_canonical_frames"] - 1
    sc = compiled.empty_step_constraints(skel, prim.n_canonical_frames)
    sc = compiled.set_keyframe_constraint(sc, 0, skel, "Hips", end_kf,
                                          position=GOAL)
    sc = compiled.set_direction_constraint(sc, DIR, end_kf)
    sc = compiled.set_alignment_from_start_pose(sc, np.zeros(3, np.float32),
                                                0.0)
    return data, prim, skel, sc, end_kf


def test_residual_semantics_match_oracle(setup):
    """evaluate_error(oracle_latent) == the oracle's own error: the two
    implementations agree on what the constraint error IS."""
    data, prim, skel, sc, end_kf = setup
    s_o, err_o = oracle_constrained_step(data, GOAL, DIR, end_kf,
                                         n_samples=30, seed=0)
    err_repo = float(compiled.evaluate_error(
        skel, prim, sc, jnp.asarray(s_o, jnp.float32), use_traj=False))
    np.testing.assert_allclose(err_repo, err_o, rtol=1e-4, atol=1e-3)


def test_repo_step_at_least_as_good_as_oracle(setup):
    """BASELINE config 3 target: repo constrained-step error <= the
    reference-equivalent oracle's error on the same problem (small slack
    for sampler noise)."""
    data, prim, skel, sc, end_kf = setup
    _, err_o = oracle_constrained_step(data, GOAL, DIR, end_kf,
                                       n_samples=50, seed=0)
    s0, _ = generator.best_of_n(skel, jax.random.PRNGKey(0), prim, sc,
                                n_samples=50)
    _, err = generator.refine_lm(skel, prim, sc, s0, n_iters=10)
    assert float(err) <= err_o * 1.1, (float(err), err_o)


def test_lm_schedule_beats_oracle_same_pool(setup):
    """The MINPACK-like LM schedule (init_lambda 1e-3, 0.1x decay) + multi-
    start refinement solves at least as well as scipy leastsq when BOTH
    sides get the SAME candidate pool (pool= hands the oracle the repo's
    candidates, so the ratio measures machinery, not RNG luck)."""
    data, prim, skel, sc, end_kf = setup
    pool = prim_mod.sample_latent(jax.random.PRNGKey(0), prim, 50)
    _, err_o = oracle_constrained_step(data, GOAL, DIR, end_kf,
                                       n_samples=50, seed=0,
                                       pool=np.asarray(pool))
    _, err = generator._search_and_refine(
        skel, prim, sc, pool, 0.0, 1.0, 0.1, n_iters=20, do_refine=True,
        use_traj=False, use_ca=False, use_ts=False, n_starts=8)
    assert float(err) <= err_o * 1.05, (float(err), err_o)


def test_multi_start_no_worse_than_single(setup):
    """n_lm_starts > 1 never yields a worse final error than the single-
    start flow on the same pool (keep-better + min over basins)."""
    data, prim, skel, sc, end_kf = setup
    key = jax.random.PRNGKey(3)
    args = (skel, key, prim, sc, 0.0, 1.0, 0.1)
    kw = dict(n_samples=40, n_iters=8, do_refine=True,
              use_traj=False, use_ca=False, use_ts=False)
    _, e1 = generator._sample_and_refine(*args, **kw, n_starts=1)
    _, e8 = generator._sample_and_refine(*args, **kw, n_starts=8)
    assert float(e8) <= float(e1) + 1e-4, (float(e8), float(e1))


def test_n_lm_starts_config_flows_through_generate(setup):
    """The n_lm_starts config key reaches the public entry point and
    changes the refinement (top-k path compiles and runs)."""
    from morphablegraphs_tpu.utils.config import default_config
    data, prim, skel, sc, end_kf = setup
    cfg = default_config()
    cfg["n_random_samples"] = 40
    cfg["lm_iterations"] = 8
    cfg["n_lm_starts"] = 4
    s, err = generator.generate_constrained_sample(
        jax.random.PRNGKey(0), skel, prim, sc, cfg)
    assert np.isfinite(float(err))
    cfg1 = dict(cfg, n_lm_starts=1)
    _, err1 = generator.generate_constrained_sample(
        jax.random.PRNGKey(0), skel, prim, sc, cfg1)
    assert float(err) <= float(err1) + 1e-4
