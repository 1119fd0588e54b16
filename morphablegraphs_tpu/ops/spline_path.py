"""Arc-length parameterized trajectory splines.

Replaces the reference's `ParameterizedSpline` + `CatmullRomSpline` +
`RelativeArcLengthMap` (reference constraints/spatial_constraints/splines/
parameterized_spline.py:41-325, catmull_rom_spline.py:33-183,
arc_length_map.py:26-189) with a data-oriented, jittable design:

  * control points padded to a static maximum, true count traced;
  * Catmull-Rom evaluation is a gather + one 4-vector dot per query,
    vectorized over query batches;
  * the arc-length table (granularity 1000, reference default) is built in
    one vectorized pass; arc-length queries are `jnp.interp` on the table;
  * closest-point search = masked argmin over the table + fixed-iteration
    parabolic refinement (replaces scipy minimize / SegmentList recursion —
    SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

GRANULARITY = 1000  # reference ParameterizedSpline granularity

# Catmull-Rom base matrix (reference catmull_rom_spline.py:51-54)
_CR_BASE = np.array([[-1.0, 3.0, -3.0, 1.0],
                     [2.0, -5.0, 4.0, -1.0],
                     [-1.0, 0.0, 1.0, 0.0],
                     [0.0, 2.0, 0.0, 0.0]], np.float32)


@struct.dataclass
class PathSpline:
    """Padded Catmull-Rom spline + arc-length table."""

    points: jax.Array  # [P_max + 3, 3] extended control points
    #                    ([p0] + points + [pn, pn], reference :70)
    n_points: jax.Array  # int32 true control point count
    table_u: jax.Array  # [G+1] parameter grid
    table_arc: jax.Array  # [G+1] cumulative arc length at grid
    table_points: jax.Array  # [G+1, 3] spline points at the grid (cached so
    #                          vmapped closest-point search reuses them)
    unconstrained: jax.Array  # [3] bool mask of unconstrained dims (e.g. Y)

    @property
    def full_arc_length(self) -> jax.Array:
        return self.table_arc[-1]


def _eval_u(points: jax.Array, n_points: jax.Array, u: jax.Array) -> jax.Array:
    """Catmull-Rom point at parameter u in [0, 1] (batched over u).

    points: extended control array [P_max+3, 3]; real segment count =
    n_points - 1 (reference catmull_rom_spline.py:119-158).
    """
    n_seg = jnp.maximum(n_points - 1, 1).astype(u.dtype)
    scaled = jnp.clip(u, 0.0, 1.0) * n_seg
    idx = jnp.clip(jnp.floor(scaled).astype(jnp.int32), 0, (n_points - 2).astype(jnp.int32))
    local = scaled - idx.astype(u.dtype)
    # control points p[idx-1+1 .. idx+2+1] in the extended array (offset +1
    # for the leading auxiliary point)
    base = idx  # extended index of p_{i-1} is idx, since extended[0] = p0
    p = jnp.stack([
        points[base], points[base + 1], points[base + 2], points[base + 3]
    ], axis=-2)  # [..., 4, 3]
    w = jnp.stack([local ** 3, local ** 2, local, jnp.ones_like(local)], axis=-1)
    return 0.5 * jnp.einsum("...w,wc,...cd->...d", w, jnp.asarray(_CR_BASE), p)


def _tangent_u(points: jax.Array, n_points: jax.Array, u: jax.Array,
               eps: float = 5e-4) -> jax.Array:
    """Finite-difference tangent (reference uses eval deltas likewise)."""
    a = _eval_u(points, n_points, jnp.clip(u - eps, 0.0, 1.0))
    b = _eval_u(points, n_points, jnp.clip(u + eps, 0.0, 1.0))
    d = b - a
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-10)


MAX_PATH_POINTS = 32  # default padded control-point capacity of `build`


def build(control_points: np.ndarray, max_points: int = MAX_PATH_POINTS,
          unconstrained_dims=(), granularity: int = GRANULARITY) -> PathSpline:
    """Host-side constructor from filtered control points [P, 3].

    Pads to max_points; the arc-length table is computed with jitted batch
    evaluation at granularity+1 samples (reference arc_length_map.py:26-80)."""
    cp = np.asarray(control_points, np.float32)
    p = cp.shape[0]
    assert p >= 2, "need at least 2 control points"
    assert p <= max_points, f"too many control points ({p} > {max_points})"
    ext = np.concatenate([cp[:1], cp, cp[-1:], cp[-1:]], axis=0)
    padded = np.zeros((max_points + 3, 3), np.float32)
    padded[: ext.shape[0]] = ext
    padded[ext.shape[0]:] = ext[-1]
    unc = np.zeros(3, bool)
    for d in unconstrained_dims:
        unc[d] = True
    return _finalize(jnp.asarray(padded), jnp.asarray(p, jnp.int32),
                     jnp.asarray(unc), granularity)


@functools.partial(jax.jit, static_argnames=("granularity",))
def _finalize(padded, n_points, unconstrained, granularity: int):
    u = jnp.linspace(0.0, 1.0, granularity + 1)
    pts = _eval_u(padded, n_points, u)
    seg = jnp.linalg.norm(pts[1:] - pts[:-1], axis=-1)
    arc = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
    return PathSpline(points=padded, n_points=n_points, table_u=u,
                      table_arc=arc, table_points=pts,
                      unconstrained=unconstrained)


# ---------------------------------------------------------------------------
# Queries (jittable, batched)
# ---------------------------------------------------------------------------

def point_at_u(sp: PathSpline, u: jax.Array) -> jax.Array:
    return _eval_u(sp.points, sp.n_points, u)


def _interp_monotone(xq: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Gather-free linear interp on a monotone grid: comparison-matrix index
    + one-hot matmul (jnp.interp lowers to searchsorted + gathers, which
    dominate vmapped path queries — same issue as ops.timewarp.interp_cubic).
    Accepts any xq shape (incl. scalar)."""
    shape = jnp.shape(xq)
    q = jnp.reshape(jnp.asarray(xq), (-1,))
    n = x.shape[-1]
    i = jnp.clip(jnp.sum(x[None, :] <= q[:, None], axis=-1) - 1, 0, n - 2)
    onehot = jax.nn.one_hot(i, n, dtype=x.dtype)
    x_p1 = jnp.concatenate([x[1:], x[-1:]])
    y_p1 = jnp.concatenate([y[1:], y[-1:]])
    table = jnp.stack([x, x_p1, y, y_p1], axis=1)
    vals = jnp.matmul(onehot, table, precision=jax.lax.Precision.HIGHEST)
    x0, x1, y0, y1 = (vals[..., j] for j in range(4))
    t = jnp.clip((q - x0) / jnp.maximum(x1 - x0, 1e-8), 0.0, 1.0)
    out = y0 + t * (y1 - y0)
    # clamp outside the domain like jnp.interp
    out = jnp.where(q <= x[0], y[0], out)
    out = jnp.where(q >= x[-1], y[-1], out)
    return out.reshape(shape)


def _arc_at_u(sp: PathSpline, u: jax.Array) -> jax.Array:
    """table_u is a uniform grid, so u -> arc needs no search: blend the two
    neighbouring table entries via a one-hot matmul."""
    g = sp.table_arc.shape[-1] - 1
    pos = jnp.clip(u, 0.0, 1.0) * g
    i = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, g - 1)
    frac = pos - i.astype(pos.dtype)
    onehot = jax.nn.one_hot(i, g + 1, dtype=sp.table_arc.dtype)
    a_p1 = jnp.concatenate([sp.table_arc[1:], sp.table_arc[-1:]])
    table = jnp.stack([sp.table_arc, a_p1], axis=1)
    vals = jnp.matmul(onehot, table, precision=jax.lax.Precision.HIGHEST)
    return vals[..., 0] * (1 - frac) + vals[..., 1] * frac


@jax.jit
def u_at_arc_length(sp: PathSpline, arc: jax.Array) -> jax.Array:
    """Monotone interp on the arc-length table
    (reference arc_length_map.py:100-140 map_relative_arc_length semantics)."""
    return _interp_monotone(arc, sp.table_arc, sp.table_u)


@jax.jit
def point_at_arc_length(sp: PathSpline, arc: jax.Array) -> jax.Array:
    """reference parameterized_spline.py `query_point_by_absolute_arc_length`."""
    return point_at_u(sp, u_at_arc_length(sp, arc))


@jax.jit
def tangent_at_arc_length(sp: PathSpline, arc: jax.Array) -> jax.Array:
    return _tangent_u(sp.points, sp.n_points, u_at_arc_length(sp, arc))


@jax.jit
def point_and_dir_at_arc_length(sp: PathSpline, arc: jax.Array):
    """(position, 2D direction) at an arc length — the locomotion goal query
    (reference locomotion_constraints_builder.py:152-182)."""
    u = u_at_arc_length(sp, arc)
    pos = point_at_u(sp, u)
    tan = _tangent_u(sp.points, sp.n_points, u)
    dir2d = jnp.stack([tan[..., 0], tan[..., 2]], axis=-1)
    dir2d = dir2d / jnp.maximum(jnp.linalg.norm(dir2d, axis=-1, keepdims=True), 1e-10)
    return pos, dir2d


@functools.partial(jax.jit, static_argnames=("n_refine", "bounded"))
def closest_point(sp: PathSpline, point: jax.Array,
                  min_arc_length: jax.Array = 0.0, n_refine: int = 8,
                  max_arc_length: jax.Array = 0.0, bounded: bool = False):
    """Closest point on the spline at arc length >= min_arc_length.

    Table argmin + fixed-iteration ternary refinement between the two
    neighbouring grid cells (replaces the reference's SegmentList recursion /
    scipy minimize, parameterized_spline.py:275-324).

    With bounded=True the search window is additionally capped at
    max_arc_length — the reference `find_closest_point(point, min, max)`
    call shape, where the travelled-arc update bounds the window to
    min + look_ahead_distance so a self-approaching path cannot jump the
    character far ahead (reference motion_generator.py:354-363
    _update_travelled_arc_length + graph_walk_planner.py:270-273).

    Unconstrained dims are excluded from the distance (reference
    trajectory constraints ignore None components).

    Returns (closest_pos [3], arc_length, distance).
    """
    mask_dim = jnp.where(sp.unconstrained, 0.0, 1.0)
    d2 = jnp.sum(((sp.table_points - point) * mask_dim) ** 2, axis=-1)
    valid = sp.table_arc >= jnp.asarray(min_arc_length) - 1e-6
    if bounded:
        valid &= sp.table_arc <= jnp.asarray(max_arc_length) + 1e-6
    d2 = jnp.where(valid, d2, jnp.inf)
    # min_arc_length beyond the path: snap to the END (reference
    # parameterized_spline.py:287 special-case), not argmin-of-all-inf = 0
    i = jnp.where(jnp.any(valid), jnp.argmin(d2), d2.shape[0] - 1)
    # table_u is uniform: neighbours need no gather
    g = sp.table_u.shape[0] - 1
    lo = jnp.maximum(i - 1, 0).astype(d2.dtype) / g
    hi = jnp.minimum(i + 1, g).astype(d2.dtype) / g

    def dist(u):
        p = _eval_u(sp.points, sp.n_points, u)
        return jnp.sum(((p - point) * mask_dim) ** 2, axis=-1)

    def body(_, carry):
        lo, hi = carry
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        keep_lo = dist(m1) < dist(m2)
        return (jnp.where(keep_lo, lo, m1), jnp.where(keep_lo, m2, hi))

    lo, hi = jax.lax.fori_loop(0, n_refine, body, (lo, hi))
    u_best = 0.5 * (lo + hi)
    arc = _arc_at_u(sp, u_best)
    # the refinement searched [i-1, i+1] around the masked argmin, so on a
    # self-approaching path it can land one cell BELOW min_arc_length (or,
    # bounded, one cell above max); the advancing guarantee must hold
    # (travelled arc never regresses, and never overshoots the window)
    min_arc = jnp.asarray(min_arc_length, arc.dtype)
    clamped = arc < min_arc
    arc = jnp.maximum(arc, min_arc)
    if bounded:
        max_arc = jnp.maximum(jnp.asarray(max_arc_length, arc.dtype), min_arc)
        clamped |= arc > max_arc
        arc = jnp.minimum(arc, max_arc)
    u_best = jnp.where(clamped, u_at_arc_length(sp, arc), u_best)
    pos = point_at_u(sp, u_best)
    d = jnp.sqrt(dist(u_best))
    return pos, arc, d


def refine_iters_for_accuracy(full_arc_length: float,
                              accuracy: float = 1e-3,
                              max_iterations: int = 5000,
                              granularity: int = GRANULARITY) -> int:
    """Map the reference's closest-point search budget to ternary-refinement
    iterations (reference parameterized_spline.py:54-69 +
    segment_list.py: SegmentList(accuracy, max_iterations) subdivides until
    segment length < accuracy).

    The table argmin brackets the optimum within 2 cells of world-space
    width ~2*full_arc/granularity; each ternary iteration shrinks the
    bracket by 2/3, so n iterations reach accuracy when
    bracket * (2/3)^n <= accuracy.  Hard cap 32 — 32 iterations reach
    5e-6 of a cell, far below any meaningful world accuracy.

    The accuracy-derived count is rounded UP to a multiple of 4: n_refine
    is a static jit argument of the fused step programs, so every distinct
    value is a full recompile (minutes over the tunnel TPU) — quantizing
    bounds the compile universe while only ever EXCEEDING the requested
    accuracy.  `max_iterations` is the reference's HARD search budget
    (parameterized_spline.py:54-69 passes it straight to SegmentList), so
    when it is the binding limit it wins over the quantization: the result
    is then exactly min(max_iterations, 32), even if not a multiple of 4
    (a user-set budget is one config value, not a per-call recompile
    universe)."""
    import math
    bracket = 2.0 * max(float(full_arc_length), 1e-6) / float(granularity)
    if accuracy <= 0.0 or accuracy >= bracket:
        n = 4
    else:
        n = math.ceil(math.log(accuracy / bracket) / math.log(2.0 / 3.0))
    n = min(-(-max(4, min(n, 32)) // 4) * 4, 32)
    return max(1, min(n, int(max_iterations)))


@functools.partial(jax.jit, static_argnames=("n_refine",))
def closest_points_advancing(sp: PathSpline, points: jax.Array,
                             min_arc_length: jax.Array = 0.0,
                             n_refine: int = 8):
    """Advancing closest points for a SEQUENCE of query points [S, 3]:
    sample i's search is constrained to arc >= sample i-1's found arc
    (the trajectory-residual semantics of reference
    trajectory_constraint.py:85-110 `_min_arc_length` advancing).

    Semantically the scan `closest_point(p_i, min_arc=arc_{i-1})`, but
    restructured for the TPU: the [S, G+1] distance table is ONE batched
    pass, and the advancing masked argmin is a scan over precomputed rows
    (two vector ops per sample instead of a distance + 2*n_refine-eval
    refinement chain — profiled at 28% of the crowd-walk iteration).
    The advancing carry is the chosen cell's TABLE arc rather than the
    refined arc; they differ by less than one table cell, which can only
    flip near-tie cell selections on self-crossing paths.  Sub-cell
    refinement is a closed-form parabola through the three neighbouring
    TABLE distances (no extra spline evaluations; an 8-iteration ternary
    loop here was 12% of the crowd-walk iteration, and the parabola agrees
    with it to ~cell^2 — exact where d^2(u) is locally quadratic).

    n_refine is accepted for signature parity with `closest_point` and
    ignored (refinement is closed-form).

    Returns (positions [S, 3], arc_lengths [S], distances [S])."""
    del n_refine
    mask_dim = jnp.where(sp.unconstrained, 0.0, 1.0)
    d2_all = jnp.sum(((sp.table_points[None, :, :] - points[:, None, :])
                      * mask_dim) ** 2, axis=-1)  # [S, G+1]
    gp1 = sp.table_arc.shape[0]

    def advance(min_arc, d2_row):
        valid = sp.table_arc >= min_arc - 1e-6
        d2m = jnp.where(valid, d2_row, jnp.inf)
        i = jnp.where(jnp.any(valid), jnp.argmin(d2m), gp1 - 1)
        return jnp.maximum(min_arc, sp.table_arc[i]), (i, min_arc)

    _, (idx, floors) = jax.lax.scan(
        advance, jnp.asarray(min_arc_length, sp.table_arc.dtype), d2_all)

    g = gp1 - 1
    d2_m1 = jnp.take_along_axis(
        d2_all, jnp.maximum(idx - 1, 0)[:, None], axis=1)[:, 0]
    d2_0 = jnp.take_along_axis(d2_all, idx[:, None], axis=1)[:, 0]
    d2_p1 = jnp.take_along_axis(
        d2_all, jnp.minimum(idx + 1, g)[:, None], axis=1)[:, 0]
    denom = d2_m1 - 2.0 * d2_0 + d2_p1
    offset = jnp.where(denom > 1e-12,
                       jnp.clip(0.5 * (d2_m1 - d2_p1) / jnp.maximum(
                           denom, 1e-12), -1.0, 1.0),
                       0.0)
    u_best = jnp.clip((idx.astype(points.dtype) + offset) / g, 0.0, 1.0)

    arc = _arc_at_u(sp, u_best)
    # clamp to each sample's advancing floor: the parabolic refinement can
    # land up to one cell below it (same guarantee as closest_point)
    clamped = arc < floors
    arc = jnp.maximum(arc, floors)
    u_best = jnp.where(clamped, u_at_arc_length(sp, arc), u_best)
    pos = point_at_u(sp, u_best)
    d = jnp.sqrt(jnp.sum(((pos - points) * mask_dim) ** 2, axis=-1))
    return pos, arc, d


def transform(sp: PathSpline, q_y: jax.Array, delta: jax.Array) -> PathSpline:
    """Rigid 2D transform of the whole spline (used when constraints are
    moved into a primitive's local frame, reference
    motion_primitive_constraints.py:268-330)."""
    from . import quat as quat_ops
    new_pts = quat_ops.rotate_vec(q_y[None, :], sp.points) + delta[None, :]
    seg_pts = quat_ops.rotate_vec(q_y[None, :], sp.table_points) + delta[None, :]
    seg = jnp.linalg.norm(seg_pts[1:] - seg_pts[:-1], axis=-1)
    arc = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
    return sp.replace(points=new_pts, table_points=seg_pts, table_arc=arc)


def plot_path(sp: PathSpline, root_motion=None, filename: str = None,
              scale_factor: float = 0.7, n_samples: int = 100):
    """Debug plot of a path spline with tangents (+ an optional root motion
    overlay), matching the reference's -x/z projection (reference
    constraints/spatial_constraints/splines/utils.py:154-198
    plot_annotated_spline).  Requires matplotlib; import is deferred so the
    synthesis path carries no plotting dependency."""
    import numpy as np
    from matplotlib import pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(1, 1, 1)
    total = float(sp.full_arc_length)
    arcs = np.linspace(0.0, total, n_samples)
    pts = np.asarray(jax.vmap(lambda a: point_at_arc_length(sp, a))(
        jnp.asarray(arcs, jnp.float32))) * scale_factor
    ax.plot(-pts[:, 0], pts[:, 2], label="path")
    for a in np.linspace(0.0, total, 10):
        p, d2 = point_and_dir_at_arc_length(sp, jnp.asarray(a, jnp.float32))
        p = np.asarray(p) * scale_factor
        d2 = np.asarray(d2) * scale_factor  # (x, z) direction
        ax.plot([-p[0], -p[0] - d2[0] * 10], [p[2], p[2] + d2[1] * 10],
                color="gray")
    if root_motion is not None:
        rm = np.asarray(root_motion) * scale_factor
        ax.plot(-rm[:, 0], rm[:, 2], label="root motion")
    ax.set_aspect("equal")
    ax.legend()
    if filename:
        fig.savefig(filename)
        plt.close(fig)
    return fig
