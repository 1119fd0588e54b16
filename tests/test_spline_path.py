"""Arc-length parameterized spline tests (reference ParameterizedSpline
semantics, parameterized_spline.py:41-325)."""

import numpy as np

import jax
import jax.numpy as jnp

from morphablegraphs_tpu.ops import spline_path


CONTROL_POINTS = np.array([
    [0.0, 0.0, 0.0],
    [10.0, 0.0, 5.0],
    [20.0, 0.0, 5.0],
    [30.0, 0.0, 0.0],
    [40.0, 0.0, -10.0],
], np.float32)


def _build():
    return spline_path.build(CONTROL_POINTS, unconstrained_dims=(1,))


def test_endpoints():
    sp = _build()
    p0 = np.asarray(spline_path.point_at_u(sp, jnp.asarray(0.0)))
    p1 = np.asarray(spline_path.point_at_u(sp, jnp.asarray(1.0)))
    np.testing.assert_allclose(p0, CONTROL_POINTS[0], atol=1e-4)
    np.testing.assert_allclose(p1, CONTROL_POINTS[-1], atol=1e-4)


def test_interpolates_control_points():
    """Catmull-Rom passes through its control points."""
    sp = _build()
    n_seg = len(CONTROL_POINTS) - 1
    for i, cp in enumerate(CONTROL_POINTS):
        u = i / n_seg
        p = np.asarray(spline_path.point_at_u(sp, jnp.asarray(u)))
        np.testing.assert_allclose(p, cp, atol=1e-3)


def test_arc_length_table():
    sp = _build()
    full = float(np.asarray(sp.full_arc_length))
    # chord length lower bound, loose upper bound
    chord = np.sum(np.linalg.norm(np.diff(CONTROL_POINTS, axis=0), axis=1))
    assert full >= chord - 1e-3
    assert full < chord * 1.5
    # midpoint query lands on the curve
    p = np.asarray(spline_path.point_at_arc_length(sp, jnp.asarray(full / 2)))
    assert np.all(np.isfinite(p))


def test_point_at_arc_length_even_spacing():
    sp = _build()
    full = float(np.asarray(sp.full_arc_length))
    arcs = np.linspace(0, full, 20)
    pts = np.asarray(spline_path.point_at_arc_length(sp, jnp.asarray(arcs, jnp.float32)))
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    # arc-length parameterization -> nearly equal spacing
    assert np.std(seg) / np.mean(seg) < 0.12


def test_tangent_direction():
    sp = _build()
    _, d = spline_path.point_and_dir_at_arc_length(sp, jnp.asarray(0.0))
    d = np.asarray(d)
    # initial direction roughly towards +x (first segment goes +x,+z)
    assert d[0] > 0.5


def test_closest_point():
    sp = _build()
    # query near a known curve point
    target = np.asarray(spline_path.point_at_u(sp, jnp.asarray(0.4)))
    q = target + np.array([0.0, 5.0, 2.0], np.float32)  # offset in y (unconstrained) & z
    pos, arc, dist = spline_path.closest_point(sp, jnp.asarray(q))
    pos = np.asarray(pos)
    # found point should be close to target in constrained dims
    assert abs(pos[0] - target[0]) < 2.5
    assert float(dist) <= np.linalg.norm((q - target) * np.array([1, 0, 1])) + 1e-3


def test_interp_monotone_matches_jnp_interp():
    """The gather-free interp must match jnp.interp on monotone grids."""
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 100, 50))
    y = np.cumsum(rng.random(50))
    xq = rng.uniform(-10, 110, 200)
    ours = np.asarray(spline_path._interp_monotone(
        jnp.asarray(xq, jnp.float32), jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32)))
    ref = np.interp(xq, x, y)
    assert np.max(np.abs(ours - ref)) < 1e-3
    # scalar input keeps scalar shape
    s = spline_path._interp_monotone(jnp.asarray(50.0), jnp.asarray(x, jnp.float32),
                                     jnp.asarray(y, jnp.float32))
    assert s.shape == ()


def test_arc_at_u_matches_table():
    sp = _build()
    u = jnp.asarray(np.linspace(0, 1, 37), jnp.float32)
    ours = np.asarray(spline_path._arc_at_u(sp, u))
    ref = np.interp(np.asarray(u), np.asarray(sp.table_u), np.asarray(sp.table_arc))
    assert np.max(np.abs(ours - ref)) < 1e-2


def test_closest_point_min_arc_monotone():
    sp = _build()
    full = float(np.asarray(sp.full_arc_length))
    q = jnp.asarray(CONTROL_POINTS[0])
    # constrained to arc >= 60% of the path, result must respect that
    _, arc, _ = spline_path.closest_point(sp, q, jnp.asarray(0.6 * full))
    assert float(arc) >= 0.6 * full - 1.0


def test_closest_point_min_arc_beyond_end_snaps_to_end():
    """min_arc_length past the path end returns the END of the spline
    (reference parameterized_spline.py:287 special case), not the start."""
    sp = spline_path.build(np.array([[0.0, 0, 0], [100.0, 0, 0]]))
    full = float(np.asarray(sp.full_arc_length))
    pos, arc, d = spline_path.closest_point(
        sp, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray(full + 50.0))
    assert float(arc) > full - 1.0
    assert abs(float(np.asarray(pos)[0]) - 100.0) < 1.0


def test_closest_points_advancing_matches_sequential():
    """The batched advancing search must agree with the sequential
    closest_point scan to table-cell resolution (its carry is the chosen
    cell's table arc; the scan's carry is the refined arc)."""
    sp = _build()
    rng = np.random.default_rng(3)
    cp = np.asarray(sp.table_points)
    # noisy points marching along the path
    idx = np.linspace(0, cp.shape[0] - 1, 16).astype(int)
    q = jnp.asarray(cp[idx] + rng.normal(0, 2.0, (16, 3)).astype(np.float32))

    def step(m, p):
        _, arc, d = spline_path.closest_point(sp, p, m)
        return arc, (arc, d)

    _, (arcs_seq, d_seq) = jax.lax.scan(step, jnp.asarray(0.0, jnp.float32), q)
    _, arcs_b, d_b = spline_path.closest_points_advancing(sp, q, 0.0)
    cell = float(np.asarray(sp.full_arc_length)) / (sp.table_arc.shape[0] - 1)
    assert float(jnp.max(jnp.abs(arcs_seq - arcs_b))) < 2 * cell
    # parabolic sub-cell refinement vs the 8-iteration ternary loop; the
    # advancing floors differ sub-cell (sequential floors on the refined
    # arc, batch on the table arc), so clamped samples may differ by up to
    # a fraction of a table cell
    np.testing.assert_allclose(np.asarray(d_seq), np.asarray(d_b),
                               atol=0.5 * cell)


def test_closest_points_advancing_monotone_arcs():
    sp = _build()
    cp = np.asarray(sp.table_points)
    # points deliberately out of order: arcs must still advance
    q = jnp.asarray(np.stack([cp[200], cp[50], cp[150], cp[100]]))
    _, arcs, _ = spline_path.closest_points_advancing(sp, q, 0.0)
    a = np.asarray(arcs)
    cell = float(np.asarray(sp.full_arc_length)) / (sp.table_arc.shape[0] - 1)
    assert (np.diff(a) >= -2 * cell).all()
