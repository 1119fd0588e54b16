"""Construction pipeline tests: DTW, fPCA, GMM-EM, full constructor
round-trip (reference test strategy SURVEY.md §4: train -> load -> sample)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.construct import constructor, dtw, fpca, gmm_trainer
from morphablegraphs_tpu.models import primitive as prim_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.ops import bspline

from fixtures import TEST_BVH, make_legacy_model_json


# ---------------------------------------------------------------------------
# DTW
# ---------------------------------------------------------------------------

def _random_cloud(rng, n_frames=30, n_joints=5):
    base = rng.standard_normal((n_joints, 3)) * 10
    clouds = []
    for t in range(n_frames):
        offset = np.array([t * 0.5, 0.0, t * 0.3])
        clouds.append(base + offset + rng.standard_normal((n_joints, 3)) * 0.05)
    return np.stack(clouds)


def test_pair_distance_transform_invariant():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((6, 3)) * 5
    theta = 1.1
    rot = np.array([[np.cos(theta), 0, np.sin(theta)], [0, 1, 0],
                    [-np.sin(theta), 0, np.cos(theta)]])
    b = a @ rot.T + np.array([7.0, 0.0, -3.0])
    d = float(dtw.pair_distance(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    assert d < 1e-3  # rotation about Y + XZ translation is factored out
    # a y-offset is NOT factored out
    b2 = a + np.array([0.0, 5.0, 0.0])
    d2 = float(dtw.pair_distance(jnp.asarray(a, jnp.float32), jnp.asarray(b2, jnp.float32)))
    assert abs(d2 - 5.0) < 1e-3


def test_dtw_identity():
    rng = np.random.default_rng(1)
    x = _random_cloud(rng)
    path, grid = dtw.run_dtw(x, x)
    wf = dtw.get_warping_function(path)
    # warping of a motion against itself is near-identity
    assert len(wf) == len(x)
    assert np.max(np.abs(np.asarray(wf) - np.arange(len(x)))) <= 1


def test_dtw_speed_change():
    rng = np.random.default_rng(2)
    x = _random_cloud(rng, n_frames=30)
    # y = x slowed down 2x (each frame doubled)
    y = np.repeat(x, 2, axis=0)
    path, _ = dtw.run_dtw(x, y)
    wf = dtw.get_warping_function(path)
    # frame i of x maps to ~2i of y
    assert abs(wf[10] - 20) <= 3
    assert abs(wf[25] - 50) <= 4


# ---------------------------------------------------------------------------
# GMM-EM
# ---------------------------------------------------------------------------

def test_gmm_em_recovers_components():
    rng = np.random.default_rng(3)
    n = 300
    a = rng.multivariate_normal([5, 0, 0], np.eye(3) * 0.3, n // 2)
    b = rng.multivariate_normal([-5, 2, 1], np.eye(3) * 0.5, n // 2)
    x = np.concatenate([a, b])
    w, mu, cov, ll = gmm_trainer.fit_gmm(x, 2, seed=0)
    mus = sorted(mu.tolist())
    np.testing.assert_allclose(mus[0], [-5, 2, 1], atol=0.3)
    np.testing.assert_allclose(mus[1], [5, 0, 0], atol=0.3)
    np.testing.assert_allclose(sorted(w), [0.5, 0.5], atol=0.05)


def test_gmm_bic_selection():
    rng = np.random.default_rng(4)
    a = rng.multivariate_normal([4, 0], np.eye(2) * 0.2, 100)
    b = rng.multivariate_normal([-4, 0], np.eye(2) * 0.2, 100)
    x = np.concatenate([a, b])
    model = gmm_trainer.train(x, max_k=5)
    assert len(model["gmm_weights"]) == 2
    assert abs(sum(model["gmm_weights"]) - 1.0) < 1e-4


def test_gmm_matches_sklearn_loglik():
    """EM should reach a log-likelihood comparable to sklearn's."""
    from sklearn.mixture import GaussianMixture
    rng = np.random.default_rng(5)
    x = np.concatenate([
        rng.multivariate_normal([3, 1], [[0.5, 0.1], [0.1, 0.3]], 80),
        rng.multivariate_normal([-2, -1], [[0.4, 0], [0, 0.6]], 120)])
    w, mu, cov, ll = gmm_trainer.fit_gmm(x, 2, seed=1)
    skg = GaussianMixture(2, covariance_type="full", random_state=0).fit(x)
    ll_ours = ll / len(x)
    ll_sk = skg.score(x)
    assert ll_ours > ll_sk - 0.1, (ll_ours, ll_sk)


# ---------------------------------------------------------------------------
# fPCA
# ---------------------------------------------------------------------------

def test_fpca_spatial_roundtrip():
    """Data generated from a low-rank functional model is recovered."""
    rng = np.random.default_rng(6)
    n_samples, t, d = 12, 40, 11
    n_basis = 8
    knots = bspline.clamped_knots(n_basis, t)
    true_mean = rng.standard_normal((n_basis, d)) * 2
    # keep quat-channel dots positive so hemisphere alignment never flips
    # (flips on random data would break the low-rank structure)
    true_mean[:, 3:] += 8.0
    true_modes = rng.standard_normal((3, n_basis, d))
    motions = []
    for _ in range(n_samples):
        alpha = rng.standard_normal(3)
        coeffs = true_mean + np.tensordot(alpha, true_modes, axes=1)
        motions.append(np.asarray(bspline.evaluate(
            jnp.asarray(coeffs, jnp.float32), jnp.asarray(knots, jnp.float32),
            jnp.arange(t, dtype=jnp.float32))))
    motions = np.stack(motions)
    result = fpca.fpca_spatial(motions, n_basis, fraction=0.999)
    assert result.eigenvectors.shape[0] <= 4  # ~3 modes + noise
    # reconstruction: project + backproject reproduces the coefficients
    recon = result.parameters @ result.eigenvectors + result.mean
    coeffs_fit = fpca.fit_functional_data(motions, n_basis).reshape(n_samples, -1)
    # scale baked back in means recon compares against raw (unscaled) coeffs
    err = np.abs(recon - coeffs_fit).max()
    assert err < 0.2, err


def test_fpca_temporal_roundtrip():
    rng = np.random.default_rng(7)
    warps = []
    for _ in range(10):
        inc = np.exp(rng.standard_normal(50) * 0.2)
        warps.append(np.cumsum(inc) - 1.0)
    result = fpca.fpca_temporal(warps, n_basis=8, n_components=3)
    assert result.eigenvectors.shape == (8, 3)
    assert result.parameters.shape == (10, 3)


# ---------------------------------------------------------------------------
# Full constructor round-trip
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("version", [1, 2, 3])
def test_constructor_roundtrip(version):
    """Train on synthetic clips sampled from a known model, export JSON,
    re-load with the runtime loader, sample frames (the reference's
    run_construction.py:212-220 sanity loop)."""
    skel, _ = sk.load_bvh(TEST_BVH)
    src = prim_mod.load_primitive_json(make_legacy_model_json(seed=9, n_joints=4))
    key = jax.random.PRNGKey(0)
    motions = {}
    for i in range(6):
        key, sub = jax.random.split(key)
        s = prim_mod.sample_latent(sub, src, 1)[0]
        frames, n, _ = prim_mod.back_project(src, s, 96, use_time=True)
        motions[i] = np.asarray(frames)[: int(n)]

    c = constructor.MotionModelConstructor(skel, {"max_gmm_components": 3,
                                                  "npc_temporal": 2})
    c.set_motions(motions)
    model_json = c.construct_model("test_walk", version=version)

    prim = prim_mod.load_primitive_json(model_json)
    assert prim.n_spatial > 0
    assert prim.has_time
    key2 = jax.random.PRNGKey(1)
    frames, n, _ = prim_mod.sample_frames(key2, prim, 128, use_time=True)
    f = np.asarray(frames)[: int(n)]
    assert not np.any(np.isnan(f))
    # spatial alignment zeroes the root start (incl. height, reference
    # motion_model_constructor.py:258-262), so sampled roots sit near 0
    assert abs(f[:, 1].mean()) < 30.0
    # quaternion channels stay in plausible range
    assert np.abs(f[:, 3:]).max() < 5.0


# ---------------------------------------------------------------------------
# section-split DTW (reference _align_frames_temporally_split,
# motion_model_constructor.py:304-355 + run_construction.py:77-130)
# ---------------------------------------------------------------------------

def _sectioned_motions(n=4, seed=11):
    """Synthetic sectioned clips from a known model: each clip is two
    back-projected samples concatenated, with per-clip speed differences;
    the section boundary is recorded per clip."""
    skel, _ = sk.load_bvh(TEST_BVH)
    src = prim_mod.load_primitive_json(make_legacy_model_json(seed=seed,
                                                             n_joints=4))
    key = jax.random.PRNGKey(seed)
    motions, sections = {}, {}
    for i in range(n):
        parts = []
        bounds = [0]
        for j in range(2):
            key, sub = jax.random.split(key)
            s = prim_mod.sample_latent(sub, src, 1)[0]
            frames, nf, _ = prim_mod.back_project(src, s, 96, use_time=True)
            f = np.asarray(frames)[: int(nf)]
            # vary section length per clip so DTW has real work
            f = f[:: (1 + (i + j) % 2)]
            parts.append(f)
            bounds.append(bounds[-1] + len(f))
        motions[f"clip{i}"] = np.concatenate(parts, axis=0)
        sections[f"clip{i}"] = [
            {"start_idx": bounds[0], "end_idx": bounds[1]},
            {"start_idx": bounds[1], "end_idx": bounds[2]}]
    return skel, motions, sections


def test_split_dtw_monotone_and_boundary_aligned():
    """Per-section warps concatenate into a monotone warping function into
    the ORIGINAL clip, and every clip's canonical section boundary lands on
    the reference motion's boundary (the point of splitting: keyframe-
    annotated production data must stay aligned at contacts)."""
    skel, motions, sections = _sectioned_motions()
    warped, warps, contact_kf = constructor.align_frames_temporally_split(
        skel, motions, sections)
    assert "contact0" in contact_kf and "contact1" in contact_kf
    lengths = {len(w) for w in warped.values()}
    assert len(lengths) == 1  # all clips share the canonical timeline
    n_canonical = lengths.pop()
    assert contact_kf["contact1"] == n_canonical
    boundary = contact_kf["contact0"]
    assert 0 < boundary < n_canonical
    for key, wf in warps.items():
        wf = np.asarray(wf)
        assert len(wf) == n_canonical
        assert (np.diff(wf) >= 0).all(), f"warp not monotone for {key}"
        assert wf[-1] <= len(motions[key]) - 1
        # the canonical boundary maps into the clip's own section boundary
        sec_end = sections[key][0]["end_idx"]
        assert abs(int(wf[boundary]) - sec_end) <= 1, key


def test_split_dtw_constructor_and_sections_from_keyframes():
    """End-to-end: sections from keyframes.json-style dicts -> constructor
    with set_dtw_sections -> loadable model carrying contact keyframes."""
    skel, motions, sections = _sectioned_motions(n=3, seed=13)
    keyframes = {k: s[0]["end_idx"] for k, s in sections.items()}
    built = constructor.define_sections_from_keyframes(motions, keyframes)
    assert built.keys() == motions.keys()
    for k in built:
        assert built[k][0]["end_idx"] == sections[k][0]["end_idx"]

    c = constructor.MotionModelConstructor(skel, {"max_gmm_components": 2,
                                                  "npc_temporal": 2})
    c.set_motions(motions)
    c.set_dtw_sections(built)
    model_json = c.construct_model("sectioned_walk", version=3)
    assert "contact0" in model_json["keyframes"]
    prim = prim_mod.load_primitive_json(model_json)
    frames, n, _ = prim_mod.sample_frames(jax.random.PRNGKey(3), prim, 256,
                                          use_time=True)
    assert not np.any(np.isnan(np.asarray(frames)[: int(n)]))


# ---------------------------------------------------------------------------
# scaled fPCA (per-joint weight optimization)
# ---------------------------------------------------------------------------

def test_scaled_fpca_weights_reduce_cartesian_error():
    """optimize_weights should not increase the Cartesian reconstruction
    objective, and must respect the (1e-4, inf) bound (reference
    scaled_fpca.py:102-121; the reference file itself is import-broken, so
    the oracle is its documented objective STEPS)."""
    from morphablegraphs_tpu.construct import scaled_fpca
    from morphablegraphs_tpu.models import skeleton as sk
    from fixtures import TEST_BVH

    skel, _ = sk.load_bvh(TEST_BVH)
    rng = np.random.default_rng(9)
    n_samples, n_basis = 10, 6
    d = skel.n_frame_params
    knots = bspline.clamped_knots(n_basis, 30)
    # coefficients near identity quats, roots with large scale (so the
    # root-normalization heuristic has something to do)
    coeffs = rng.standard_normal((n_samples, n_basis, d)).astype(np.float32) * 0.1
    coeffs[..., 3::4] += 1.0   # w components
    coeffs[..., :3] *= 50.0    # root translation large
    npc = 3

    init = scaled_fpca.heuristic_initialization(coeffs, knots, skel, npc)
    assert init.shape == (3 + skel.n_animated,)
    e0 = float(scaled_fpca.sfpca_objective(
        jnp.asarray(init, jnp.float32), jnp.asarray(coeffs),
        jnp.asarray(knots, jnp.float32), skel, npc))
    w, e1 = scaled_fpca.optimize_weights(coeffs, knots, skel, npc,
                                         n_iters=30, init=init)
    assert np.all(w >= 1e-4)
    assert e1 <= e0 * 1.001, (e0, e1)

    model = scaled_fpca.ScaledFunctionalPCA(coeffs, knots, skel, npc)
    model.initialize_weights(w)
    proj, recon = model.fit()
    assert proj.shape == (n_samples, npc)
    assert recon.shape == coeffs.shape
    assert np.isfinite(recon).all()


def test_dtw_window_constraints():
    """Global window constraints of the legacy DTW class (reference
    motion_dtw.py:213-260 "none"/"itakura"/"sakoechiba"/"slantedband"):
    masks have the right shape/anchors and constrained paths stay inside."""
    from morphablegraphs_tpu.construct import dtw

    m_it = dtw.window_mask(40, 40, "itakura")
    assert m_it[0, 0] and m_it[39, 39]
    assert not m_it[0, 30]  # slope > 2 from the start corner
    m_sc = dtw.window_mask(40, 40, "sakoechiba", band=3)
    assert m_sc[10, 12] and not m_sc[10, 14]
    m_sl = dtw.window_mask(20, 40, "slantedband", band=2)
    assert m_sl[10, 21] and not m_sl[10, 30]
    with pytest.raises(ValueError):
        dtw.window_mask(5, 5, "bogus")

    # a speed-changed clip still aligns under the Itakura window, and the
    # path respects the window
    rng = np.random.default_rng(0)
    base = rng.standard_normal((30, 4, 3)).astype(np.float32)
    slow = np.repeat(base, 2, axis=0)[:40]
    path, _ = dtw.run_dtw(base, slow, window="itakura")
    assert path[0] == (0, 0) and path[-1] == (29, 39)
    mask = dtw.window_mask(30, 40, "itakura")
    assert all(mask[i, j] for i, j in path)


def test_kmeanspp_duplicate_rows():
    """Duplicate parameter rows (or k > distinct rows) must not crash
    kmeans++ init with a probabilities error."""
    from morphablegraphs_tpu.construct.gmm_trainer import _kmeanspp_init
    rng = np.random.default_rng(0)
    x = np.tile(np.array([[1.0, 2.0, 3.0]]), (6, 1))
    centers = _kmeanspp_init(rng, x, 3)
    assert centers.shape == (3, 3)


def test_monotonic_indices_constant_run():
    """A long constant run with a tiny tail gap must still come out
    strictly increasing (the naive backward pass pushes values below
    w[0])."""
    from morphablegraphs_tpu.construct.fpca import monotonic_indices
    w = monotonic_indices(np.array([0.0, 0.0, 0.0, 0.005]))
    assert np.all(np.diff(w) > 0), w
    assert w[0] == 0.0 and abs(w[-1] - 0.005) < 1e-12


def test_monotonic_indices_degenerate_end_below_start():
    """A degenerate warp whose end is at or below its start must still come
    out strictly increasing (the plain endpoint ramp would be flat or
    decreasing)."""
    from morphablegraphs_tpu.construct.fpca import monotonic_indices
    for end in (0.0, -1.0):
        w = monotonic_indices(np.array([0.0, 0.5, 0.2, end]))
        assert np.all(np.diff(w) > 0), (end, w)
        assert w[0] == 0.0


def test_detect_keyframes_local_minima():
    """Two separated pose matches: the picks must be the two LOCAL minima,
    not two points on the slopes of the deeper valley."""
    from morphablegraphs_tpu.construct import preprocessing as pp
    from morphablegraphs_tpu.models import skeleton as sk
    from morphablegraphs_tpu.utils.synthetic import TEST_BVH
    skel, _ = sk.load_bvh(TEST_BVH)
    rest = np.zeros(skel.n_frame_params, np.float32)
    rest[3::4] = 1.0
    frames = np.tile(rest, (80, 1))
    # bend the Spine joint (pair_distance is rigid-transform invariant, so
    # root translation would be invisible): deep valley at frame 20
    # (angle 0), shallower one at frame 60
    ang = np.full(80, 60.0)
    ang[:41] = np.abs(np.arange(41) - 20) * 3.0
    ang[41:] = 20.0 + np.abs(np.arange(41, 80) - 60) * 2.0
    half = np.deg2rad(ang) / 2
    sl = skel.quat_slice("Spine")
    frames[:, sl] = np.stack([np.cos(half), np.zeros(80), np.zeros(80),
                              np.sin(half)], axis=1)
    picks = pp.detect_keyframes_by_pose_distance(skel, frames, rest,
                                                 n_keyframes=2)
    assert len(picks) == 2
    assert abs(picks[0] - 20) <= 2 and abs(picks[1] - 60) <= 2, picks


def test_split_walk_motion_stance_label(monkeypatch):
    """The foot releasing at a segment's END mark was planted during the
    segment — it is the stance foot."""
    from morphablegraphs_tpu.construct import preprocessing as pp
    from morphablegraphs_tpu.models import skeleton as sk
    from morphablegraphs_tpu.utils.synthetic import TEST_BVH
    skel, _ = sk.load_bvh(TEST_BVH)
    frames = np.zeros((90, skel.n_frame_params), np.float32)
    monkeypatch.setattr(pp, "detect_walking_keyframes",
                        lambda *a, **k: {"RightFoot": [30],
                                         "LeftFoot": [60]})
    sections = pp.split_walk_motion(skel, frames)
    assert sections[0]["stance_foot"] == "right"  # right released at 30
    assert sections[1]["stance_foot"] == "left"   # left released at 60
    assert sections[2]["stance_foot"] == "both"   # trailing segment


def test_find_optimal_dtw_batched_matches_per_pair():
    """The single-launch padded/chunked find_optimal_dtw (and its
    mesh-sharded variant) produces exactly the per-pair run_dtw results —
    same chosen paths for every (reference, motion) combination, ragged
    lengths included."""
    import jax
    from morphablegraphs_tpu import parallel
    rng = np.random.default_rng(11)
    clouds = {}
    for i, t in enumerate([14, 19, 25]):
        base = rng.standard_normal((1, 4, 3)) * 5
        walkline = np.linspace(0, 10, t)[:, None, None]
        clouds[f"m{i}"] = (base + walkline
                           + 0.2 * rng.standard_normal((t, 4, 3)))

    # oracle: the original per-pair formulation
    keys = list(clouds)
    best_cost, expect = np.inf, None
    for rk in keys:
        results, cost = {}, 0.0
        for k in keys:
            path, d = dtw.run_dtw(clouds[rk], clouds[k])
            results[k] = path
            cost += float(d[-1, -1])
        if cost < best_cost:
            best_cost, expect = cost, results

    got = dtw.find_optimal_dtw(clouds)
    assert set(got) == set(expect)
    for k in keys:
        assert got[k] == expect[k], k

    got_sharded = dtw.find_optimal_dtw(clouds, mesh=parallel.make_mesh(8))
    for k in keys:
        assert got_sharded[k] == expect[k], k

    # mean_key restriction still honored
    got_mean = dtw.find_optimal_dtw(clouds, mean_key="m1")
    path, _ = dtw.run_dtw(clouds["m1"], clouds["m2"])
    assert got_mean["m2"] == path
