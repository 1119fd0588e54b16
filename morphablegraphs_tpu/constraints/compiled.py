"""Per-step compiled constraint sets + vectorized evaluation.

TPU-native replacement for the reference's per-constraint object dispatch
(reference constraints/motion_primitive_constraints.py:100-158 and the
keyframe-constraint class zoo, SURVEY.md §2.3): constraints are fixed-size
tagged arrays; evaluation of a latent candidate is a handful of batched
matmuls + one FK pass, so thousands of candidates (best-of-N sampling,
cluster search, LM iterations) evaluate under vmap with no Python.

Key exactness property exploited: the 2D aligning transform is linear and
the B-spline basis rows sum to 1, so transforming the *coefficients* equals
transforming the evaluated frames — the same trick the reference uses by
calling align_quaternion_frames on `motion_spline.coeffs`
(motion_primitive_constraints.py:113-115).

Error semantics match the reference:
  * keyframe position: euclidean distance over constrained components
    (global_transform_constraint.py:139-147);
  * keyframe orientation: absolute rotation angle between the joint's global
    orientation and the target;
  * 2D direction: absolute heading angle difference in DEGREES
    (direction_2d_constraint.py:42-52);
  * pose (transition): average joint point distance;
  * trajectory: per-sampled-frame distance to the closest spline point with
    monotonically advancing arc length (trajectory_constraint.py:95-116),
    with unconstrained dims masked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models.primitive import MotionPrimitive, back_project_spatial
from ..models.skeleton import Skeleton, fk_global, fk_node, fk_root
from ..ops import align, bspline, quat, spline_path

MAX_KF = 8  # padded keyframe-constraint slots per step
TRAJ_SAMPLES = 16  # canonical-frame samples for trajectory residuals
MAX_CA = 4  # collision-avoidance constraint slots per step
MAX_TS_JOINTS = 4  # joints in a trajectory-set constraint

# residual-vector layout offsets
_OFF_CA = MAX_KF + 5  # kf | dir | la | rt | jr | pose
_OFF_TRAJ = _OFF_CA + MAX_CA
_OFF_TS = _OFF_TRAJ + TRAJ_SAMPLES
N_RESIDUALS = _OFF_TS + TRAJ_SAMPLES


@struct.dataclass
class StepConstraints:
    """Fixed-size constraint set for one graph-walk step."""

    # keyframe transform constraints (position and/or orientation)
    kf_active: jax.Array  # [K] f32 0/1
    kf_node: jax.Array  # [K] i32 skeleton node index
    kf_pos: jax.Array  # [K, 3]
    kf_pos_mask: jax.Array  # [K, 3] 1 where constrained
    kf_quat: jax.Array  # [K, 4]
    kf_has_quat: jax.Array  # [K] f32 0/1
    kf_frame: jax.Array  # [K] f32 canonical keyframe
    kf_weight: jax.Array  # [K]
    # 1 for builder-generated slots (loco goal/half-step/foot-plant), 0 for
    # user keyframes — the reference tags generated constraints with
    # semanticAnnotation {"generated": True} (locomotion_constraints_
    # builder.py:84,:98,:111, foot_step_constraints_builder.py:87) and the
    # global optimizer's weight adaptation skips them
    # (graph_walk_optimizer.py:119-131)
    kf_generated: jax.Array  # [K] f32 0/1
    # 2D direction constraint (at most one, reference locomotion builder)
    dir_active: jax.Array  # f32 0/1
    dir_target: jax.Array  # [2] normalized (x, z)
    dir_frame: jax.Array  # f32
    dir_weight: jax.Array  # f32
    # look-at constraint: joint gaze direction toward a world target at a
    # keyframe (reference look_at_constraint.py:36)
    la_active: jax.Array  # f32 0/1
    la_node: jax.Array  # i32 skeleton node index (head)
    la_target: jax.Array  # [3]
    la_frame: jax.Array  # f32
    la_weight: jax.Array  # f32
    # transition pose constraint (frame 0 point cloud)
    pose_active: jax.Array  # f32 0/1
    pose_points: jax.Array  # [J, 3] target joint positions
    pose_weight: jax.Array  # f32
    pose_joint_weights: jax.Array  # [J] per-joint importance (anim_utils
    #                                skeleton joint_weight_map)
    # root trajectory-following constraint
    traj_active: jax.Array  # f32 0/1
    traj: spline_path.PathSpline
    traj_node: jax.Array  # i32
    traj_min_arc: jax.Array  # f32
    traj_weight: jax.Array  # f32
    # active arc-length range (annotated/CA trajectories, reference
    # trajectory_constraint.py:56-60 set_active_range); inf = unbounded
    traj_range_start: jax.Array  # f32
    traj_range_end: jax.Array  # f32
    # collision-avoidance constraints: MIN distance over the step's frames
    # to a target position must stay small (reference
    # global_transform_ca_constraint.py:28 semantics); MAX_CA slots so a
    # step can carry several simultaneous CA targets
    ca_active: jax.Array  # [C] f32 0/1
    ca_node: jax.Array  # [C] i32
    ca_pos: jax.Array  # [C, 3]
    ca_pos_mask: jax.Array  # [C, 3]
    ca_weight: jax.Array  # [C]
    # trajectory-set constraint: a SET of joints each following its own
    # spline; per sampled frame the residual is the distance between the
    # joint-set centroid and the target centroid, with per-joint arcs
    # advancing by the joint's own travelled distance (reference
    # trajectory_set_constraint.py:41-108)
    ts_active: jax.Array  # f32 0/1
    ts_joints: jax.Array  # [J] i32 skeleton node indices
    ts_joint_mask: jax.Array  # [J] f32 1 for real joints
    ts_trajs: spline_path.PathSpline  # stacked leading axis [J]
    ts_arc0: jax.Array  # [J] f32 starting arc lengths
    ts_weight: jax.Array  # f32
    # relative-transform constraint: joint offset in a parent joint's space
    # (reference relative_transform_constraint.py:35)
    rt_active: jax.Array  # f32 0/1
    rt_node: jax.Array  # i32 constrained joint
    rt_parent: jax.Array  # i32 parent/reference joint
    rt_offset: jax.Array  # [3] offset in the parent's frame
    rt_frame: jax.Array  # f32 canonical keyframe
    rt_weight: jax.Array  # f32
    # joint-rotation constraint: local joint quaternion at a keyframe
    # (reference joint_rotation_constraint.py:31)
    jr_active: jax.Array  # f32 0/1
    jr_joint: jax.Array  # i32 ANIMATED joint index (frame quat slot)
    jr_quat: jax.Array  # [4] target local quaternion
    jr_frame: jax.Array  # f32
    jr_weight: jax.Array  # f32
    # alignment state: when has_prev, the 2D aligning transform is computed
    # per-candidate from the candidate's own first coefficient row vs the
    # previous motion's last frame (reference align_quaternion_frames called
    # inside evaluate, motion_primitive_constraints.py:113); otherwise the
    # fixed start-pose transform applies.
    has_prev: jax.Array  # f32 0/1
    prev_last: jax.Array  # [D] last frame of the motion so far
    start_q: jax.Array  # [4] start-pose rotation about Y
    start_delta: jax.Array  # [3] start-pose translation
    n_canonical: jax.Array  # f32 (for traj sample positions)

    @property
    def n_residuals(self) -> int:
        return N_RESIDUALS


@functools.lru_cache(maxsize=1)
def _dummy_spline() -> spline_path.PathSpline:
    # one device round-trip total, not one per constraint set.
    # ensure_compile_time_eval: this can be reached from inside a trace
    # (e.g. a jitted walk building its default constraint set), and caching
    # tracers in the lru_cache would leak them out of the trace.
    with jax.ensure_compile_time_eval():
        return spline_path.build(np.array([[0.0, 0, 0], [1.0, 0, 0]]),
                                 max_points=spline_path_max_points())


def empty_step_constraints(skeleton: Skeleton,
                           n_canonical: int = 0) -> StepConstraints:
    # Host-side numpy leaves: the builders below mutate copies without any
    # device dispatch (each eager jnp op costs a tunnel round-trip on
    # remote-attached TPUs); jit converts the leaves at the call boundary.
    dummy_spline = _dummy_spline()
    j = skeleton.n_nodes
    f32 = np.float32
    return StepConstraints(
        kf_active=np.zeros(MAX_KF, f32), kf_node=np.zeros(MAX_KF, np.int32),
        kf_pos=np.zeros((MAX_KF, 3), f32), kf_pos_mask=np.zeros((MAX_KF, 3), f32),
        kf_quat=np.tile(np.array([1.0, 0, 0, 0], f32), (MAX_KF, 1)),
        kf_has_quat=np.zeros(MAX_KF, f32), kf_frame=np.zeros(MAX_KF, f32),
        kf_weight=np.ones(MAX_KF, f32), kf_generated=np.zeros(MAX_KF, f32),
        dir_active=f32(0.0), dir_target=np.array([0.0, 1.0], f32),
        dir_frame=f32(0.0), dir_weight=f32(1.0),
        la_active=f32(0.0), la_node=np.int32(0),
        la_target=np.zeros(3, f32), la_frame=f32(0.0),
        la_weight=f32(1.0),
        pose_active=f32(0.0), pose_points=np.zeros((j, 3), f32),
        pose_weight=f32(1.0), pose_joint_weights=np.ones(j, f32),
        traj_active=f32(0.0), traj=dummy_spline,
        traj_node=np.int32(0), traj_min_arc=f32(0.0),
        traj_weight=f32(1.0),
        traj_range_start=f32(-np.inf), traj_range_end=f32(np.inf),
        ca_active=np.zeros(MAX_CA, f32), ca_node=np.zeros(MAX_CA, np.int32),
        ca_pos=np.zeros((MAX_CA, 3), f32),
        ca_pos_mask=np.ones((MAX_CA, 3), f32),
        ca_weight=np.ones(MAX_CA, f32),
        ts_active=f32(0.0),
        ts_joints=np.zeros(MAX_TS_JOINTS, np.int32),
        ts_joint_mask=np.zeros(MAX_TS_JOINTS, f32),
        ts_trajs=jax.tree.map(lambda *xs: np.stack(xs),
                              *([dummy_spline] * MAX_TS_JOINTS)),
        ts_arc0=np.zeros(MAX_TS_JOINTS, f32),
        ts_weight=f32(1.0),
        rt_active=f32(0.0), rt_node=np.int32(0),
        rt_parent=np.int32(0), rt_offset=np.zeros(3, f32),
        rt_frame=f32(0.0), rt_weight=f32(1.0),
        jr_active=f32(0.0), jr_joint=np.int32(0),
        jr_quat=np.array([1.0, 0, 0, 0], f32), jr_frame=f32(0.0),
        jr_weight=f32(1.0),
        has_prev=f32(0.0),
        prev_last=np.zeros(skeleton.n_frame_params, f32),
        start_q=np.array([1.0, 0, 0, 0], f32), start_delta=np.zeros(3, f32),
        n_canonical=f32(float(n_canonical)),
    )


def spline_path_max_points() -> int:
    """Padded control-point capacity the compiled constraint tables assume —
    the single source of truth is spline_path.build's default."""
    return spline_path.MAX_PATH_POINTS


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

def aligned_coeffs(prim: MotionPrimitive, s: jax.Array,
                   sc: StepConstraints) -> jax.Array:
    """Back-project the spatial part and apply the step's aligning transform
    to the coefficient rows (exact, see module docstring).

    The transform is candidate-dependent when there are previous frames
    (heading alignment of the candidate's own first frame), which makes it
    differentiable through the LM refinement."""
    coeffs = back_project_spatial(prim, s[: prim.n_spatial])
    q_prev, d_prev = align.node_aligning_2d_transform(sc.prev_last, coeffs[0])
    q_y = jnp.where(sc.has_prev > 0, q_prev, sc.start_q)
    delta = jnp.where(sc.has_prev > 0, d_prev, sc.start_delta)
    return align.transform_frames(coeffs, q_y, delta)


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("use_traj", "use_ca", "use_ts",
                                    "chain_fk"))
def evaluate_residuals(skeleton: Skeleton, prim: MotionPrimitive,
                       sc: StepConstraints, s: jax.Array,
                       use_traj: bool = True, use_ca: bool = True,
                       use_ts: bool = False,
                       chain_fk: bool = False) -> jax.Array:
    """Residual vector [N_RESIDUALS] of weighted errors; inactive slots are
    0 (reference pads likewise, objective_functions.py:233-236).
    use_traj/use_ca/use_ts=False compile out the respective sampled-frame
    branches entirely (their residual slots stay 0) — the expensive parts
    when a step carries no such constraint."""
    coeffs = aligned_coeffs(prim, s, sc)
    return residuals_from_coeffs(skeleton, prim.knots_s, sc, coeffs,
                                 use_traj=use_traj, use_ca=use_ca,
                                 use_ts=use_ts, chain_fk=chain_fk)


def residuals_from_coeffs(skeleton: Skeleton, knots_s: jax.Array,
                          sc: StepConstraints, coeffs: jax.Array,
                          use_traj: bool = True, use_ca: bool = True,
                          use_ts: bool = False,
                          root_only: bool = False,
                          chain_fk: bool = False) -> jax.Array:
    """Residuals given already-aligned coefficients + the node's spatial
    knot vector (used by the global multi-step optimizer where alignment
    chains across steps, and by the stacked-graph flagship where the knots
    are a traced per-node gather).

    All constraint families share ONE basis-matrix evaluation and ONE
    batched FK pass over their stacked query frames (a ~5x cut in both HLO
    size and runtime vs per-family evaluation; the per-candidate cost is
    this whole function under vmap + jacfwd in the LM loop).

    root_only=True (static) replaces the per-joint FK chain with the root
    transform broadcast over nodes — valid ONLY when every active slot
    references the root joint (locomotion family; check with
    `step_scs_root_only`).  Non-root residual slots then read root values,
    which is harmless because they are inactive (masked to 0) by contract.

    chain_fk=True (static) resolves each query through `fk_node` — an
    ancestor-chain FK of O(depth) gathered quaternion ops per queried joint
    — instead of the full-skeleton `fk_global` pass over every query frame
    (the transition-pose constraint, which genuinely reads all nodes at one
    frame, still runs full FK on that frame).  Measured on v5e-1 at
    reference scale (19 joints, non-root end-effector keyframe active) the
    chain variant ties the dense pass for plain candidate scoring (22.1 vs
    23.6 ms / 8192 candidates) but loses 3.5x inside the LM loop (299 vs
    87 ms / 1024x3-iter refinements): under jax.linearize each tangent pass
    repeats the per-depth gathers, and many small gathers lose to one big
    regular FK on the VPU.  Dense therefore stays the default; the chain
    path is kept as the measured counterfactual and for oracle
    cross-checking (same math, same composition order — results agree to
    fusion-level rounding)."""

    # ---- fused frame evaluation: stack every family's query times --------
    # layout: [kf(8) | dir(1) | la(1) | rt(1) | jr(1) | t_lin(16)?]
    # + one extra row for the frame-0 pose constraint (coeffs[0] directly:
    # clamped spline first coeff == first frame).  The trajectory, CA and
    # trajectory-set families all sample the SAME canonical time grid, so
    # they share one block of evaluated frames.
    parts = [sc.kf_frame, sc.dir_frame[None], sc.la_frame[None],
             sc.rt_frame[None], sc.jr_frame[None]]
    o_lin = MAX_KF + 4
    t_lin = jnp.linspace(0.0, 1.0, TRAJ_SAMPLES) * jnp.maximum(
        sc.n_canonical - 1.0, 1.0)
    need_lin = use_traj or use_ca or use_ts
    if need_lin:
        parts.append(t_lin)
    o_pose = o_lin + (TRAJ_SAMPLES if need_lin else 0)
    t_all = jnp.concatenate(parts)
    b_all = bspline.basis_matrix(knots_s, t_all)  # [T, n_basis]
    frames_all = jnp.matmul(b_all, coeffs, precision=jax.lax.Precision.HIGHEST)
    frames_all = jnp.concatenate([frames_all, coeffs[:1]], axis=0)
    # Node-indexed views of the FK results.  Under root_only the per-joint
    # FK chain is skipped and every node index resolves to the root's
    # transform via INDEX helpers — an explicit broadcast_to(n_nodes) here
    # was materialized by XLA at [chars, tangents, frames, nodes, 3] inside
    # the LM jacobian (150 ms/iter of pure copy); indexing keeps everything
    # at root width.
    if root_only:
        rp, rq = fk_root(skeleton, frames_all)  # [T+1, 3/4]

        def pos_at(t, node):
            shape = jnp.broadcast_shapes(jnp.shape(t), jnp.shape(node))
            return jnp.broadcast_to(rp[t], shape + (3,))

        def ori_at(t, node):
            shape = jnp.broadcast_shapes(jnp.shape(t), jnp.shape(node))
            return jnp.broadcast_to(rq[t], shape + (4,))

        def pos_nodes(t):  # [T', n_nodes, 3] (only masked families read it)
            sl = rp[t]
            return jnp.broadcast_to(sl[..., None, :],
                                    sl.shape[:-1] + (skeleton.n_nodes, 3))
    elif not chain_fk:
        pos_all, ori_all = fk_global(skeleton, frames_all)  # [T+1, nodes, 3/4]

        def pos_at(t, node):
            return pos_all[t, node]

        def ori_at(t, node):
            return ori_all[t, node]

        def pos_nodes(t):
            return pos_all[t]
    else:
        # chain FK per query: O(depth) ops for the handful of queried
        # joints instead of a full-skeleton pass over every query frame.
        # pos_at/ori_at pairs at the same (t, node) arguments share one
        # chain via an identity-keyed cache (the cache holds the argument
        # references, so `is` comparison is sound; relying on XLA CSE under
        # jax.linearize proved unreliable).
        _fk_cache = []

        def _at(t, node):
            for t0, n0, res in _fk_cache:
                if t0 is t and n0 is node:
                    return res
            shape = jnp.broadcast_shapes(jnp.shape(t), jnp.shape(node))
            t_b = jnp.broadcast_to(t, shape)
            n_b = jnp.broadcast_to(node, shape)
            res = fk_node(skeleton, frames_all[t_b], n_b)
            _fk_cache.append((t, node, res))
            return res

        def pos_at(t, node):
            return _at(t, node)[0]

        def ori_at(t, node):
            return _at(t, node)[1]

        def pos_nodes(t):
            # only the transition-pose constraint reads every node, at one
            # frame — full FK on just that frame
            return fk_global(skeleton, frames_all[t])[0]

    # ---- keyframe constraints
    idx = jnp.arange(MAX_KF)
    jpos = pos_at(idx, sc.kf_node)  # [K, 3]
    jori = ori_at(idx, sc.kf_node)  # [K, 4]
    pos_err = jnp.sqrt(jnp.maximum(
        jnp.sum(((jpos - sc.kf_pos) * sc.kf_pos_mask) ** 2, axis=-1), 1e-12))
    # orientation: absolute relative-rotation angle
    dot = jnp.abs(jnp.sum(quat.normalize(jori) * sc.kf_quat, axis=-1))
    ang = 2.0 * jnp.arccos(jnp.clip(dot, -1.0 + 1e-6, 1.0 - 1e-6))
    kf_res = sc.kf_active * sc.kf_weight * (pos_err + sc.kf_has_quat * ang)

    # ---- 2D direction constraint (error in degrees, reference parity)
    frame_dir = frames_all[MAX_KF]
    heading = quat.rotate_vec(quat.normalize(frame_dir[3:7]),
                              jnp.array([0.0, 0.0, 1.0]))
    motion_dir = jnp.stack([heading[0], heading[2]])
    motion_dir = motion_dir / jnp.maximum(jnp.linalg.norm(motion_dir), 1e-10)
    cos_a = jnp.clip(jnp.dot(sc.dir_target, motion_dir), -1.0, 1.0)
    dir_res = sc.dir_active * sc.dir_weight * jnp.rad2deg(jnp.arccos(cos_a))

    # ---- look-at constraint: gaze angle toward target (degrees)
    head_pos = pos_at(MAX_KF + 1, sc.la_node)
    head_ori = ori_at(MAX_KF + 1, sc.la_node)
    gaze = quat.rotate_vec(quat.normalize(head_ori), jnp.array([0.0, 0.0, 1.0]))
    want = sc.la_target - head_pos
    want = want / jnp.maximum(jnp.linalg.norm(want), 1e-10)
    cos_la = jnp.clip(jnp.dot(gaze, want), -1.0, 1.0)
    la_res = sc.la_active * sc.la_weight * jnp.rad2deg(jnp.arccos(cos_la))

    # ---- relative-transform constraint: offset in the parent joint's space
    target_rt = pos_at(MAX_KF + 2, sc.rt_parent) + quat.rotate_vec(
        quat.normalize(ori_at(MAX_KF + 2, sc.rt_parent)), sc.rt_offset)
    diff_rt = pos_at(MAX_KF + 2, sc.rt_node) - target_rt
    # safe norm: the inactive default is exactly 0 and norm() has a NaN
    # gradient there, which would poison the LM jacobian through 0 * NaN
    rt_res = sc.rt_active * sc.rt_weight * jnp.sqrt(
        jnp.sum(diff_rt * diff_rt) + 1e-12)

    # ---- joint-rotation constraint: local quaternion angle at a keyframe
    frame_jr = frames_all[MAX_KF + 3]
    quats_jr = frame_jr[3:].reshape(-1, 4)
    q_local = quat.normalize(quats_jr[sc.jr_joint])
    dot_jr = jnp.abs(jnp.sum(q_local * sc.jr_quat))
    # clip strictly inside (-1, 1): arccos' gradient is infinite at +-1
    jr_res = sc.jr_active * sc.jr_weight * 2.0 * jnp.arccos(
        jnp.clip(dot_jr, -1.0 + 1e-6, 1.0 - 1e-6))

    # ---- transition pose constraint at frame 0 (last FK row = coeffs[0])
    pose_pos = pos_nodes(o_pose)
    diff_pose = pose_pos - sc.pose_points
    pose_d = jnp.sqrt(jnp.sum(diff_pose * diff_pose, axis=-1) + 1e-12)
    pose_err = (jnp.sum(sc.pose_joint_weights * pose_d)
                / jnp.maximum(jnp.sum(sc.pose_joint_weights), 1e-6))
    pose_res = sc.pose_active * sc.pose_weight * pose_err

    # ---- trajectory constraint: sampled canonical frames, advancing arc
    if use_traj:
        root_tr = pos_at(jnp.arange(o_lin, o_lin + TRAJ_SAMPLES),
                         sc.traj_node)  # [S, 3]
        _, arcs, traj_d = spline_path.closest_points_advancing(
            sc.traj, root_tr, sc.traj_min_arc)
        # active-range masking (annotated/CA trajectories): residuals outside
        # [range_start, range_end] don't count
        in_range = (arcs >= sc.traj_range_start) & (arcs <= sc.traj_range_end)
        traj_res = sc.traj_active * sc.traj_weight * jnp.where(in_range, traj_d, 0.0)
    else:
        traj_res = jnp.zeros(TRAJ_SAMPLES)

    # ---- collision-avoidance constraints: min distance over sampled frames
    if use_ca:
        jca = pos_at(jnp.arange(o_lin, o_lin + TRAJ_SAMPLES)[:, None],
                     sc.ca_node[None, :])  # [S, C, 3]
        d_ca = jnp.sqrt(jnp.maximum(jnp.sum(
            ((jca - sc.ca_pos) * sc.ca_pos_mask) ** 2, axis=-1), 1e-12))
        ca_res = sc.ca_active * sc.ca_weight * jnp.min(d_ca, axis=0)  # [C]
    else:
        ca_res = jnp.zeros(MAX_CA)

    # ---- trajectory-set constraint: joint-set centroid vs target centroid
    # (reference trajectory_set_constraint.py:84-108: per-joint arcs advance
    # by the joint's own travelled distance between frames; the reference's
    # np.average over position LISTS collapses to a scalar — here the
    # centroid is the mean position VECTOR, the evident intent)
    if use_ts:
        pos_ts = pos_at(jnp.arange(o_lin, o_lin + TRAJ_SAMPLES)[:, None],
                        sc.ts_joints[None, :])  # [S, J, 3]
        steps_d = jnp.sqrt(jnp.sum(
            (pos_ts[1:] - pos_ts[:-1]) ** 2, axis=-1) + 1e-12)  # [S-1, J]
        travelled = jnp.concatenate([jnp.zeros((1, MAX_TS_JOINTS)),
                                     jnp.cumsum(steps_d, axis=0)])  # [S, J]
        arcs_ts = sc.ts_arc0 + travelled  # [S, J]

        def target_at(j, arc):
            traj_j = jax.tree.map(lambda x: x[j], sc.ts_trajs)
            p, _ = spline_path.point_and_dir_at_arc_length(traj_j, arc)
            return p, traj_j.full_arc_length

        targets, full_arcs = jax.vmap(
            lambda j, arc_col: jax.vmap(lambda a: target_at(j, a))(arc_col),
            in_axes=(0, 1), out_axes=(1, 1))(
                jnp.arange(MAX_TS_JOINTS), arcs_ts)  # [S, J, 3], [S, J]
        active = (arcs_ts <= full_arcs).astype(pos_ts.dtype) * sc.ts_joint_mask
        # DELIBERATE DEVIATION from the reference: a joint whose advancing
        # arc has run off the end of its own spline drops out of BOTH
        # centroids here (per-sample weights from the active mask).  The
        # reference keeps ALL joints in both centroids and only gates the
        # whole frame residual by np.any(is_active)
        # (trajectory_set_constraint.py) — like the vector-vs-scalar
        # centroid fix, the dropout avoids an exhausted spline's frozen
        # endpoint dragging the centroid target.  Documented in PARITY.md.
        w = active / jnp.maximum(jnp.sum(active, axis=1, keepdims=True), 1e-6)
        actual_c = jnp.sum(pos_ts * w[..., None], axis=1)  # [S, 3]
        target_c = jnp.sum(targets * w[..., None], axis=1)
        diff_ts = actual_c - target_c
        d_ts = jnp.sqrt(jnp.sum(diff_ts * diff_ts, axis=-1) + 1e-12)
        any_active = (jnp.sum(active, axis=1) > 0).astype(d_ts.dtype)
        ts_res = sc.ts_active * sc.ts_weight * any_active * d_ts  # [S]
    else:
        ts_res = jnp.zeros(TRAJ_SAMPLES)

    return jnp.concatenate([kf_res, dir_res[None], la_res[None],
                            rt_res[None], jr_res[None],
                            pose_res[None], ca_res, traj_res, ts_res])


def step_scs_root_only(step_scs, root_node: int = 0) -> bool:
    """Host-side check: True when every ACTIVE slot in a (numpy-leaf)
    StepConstraints pytree references only the root joint, so the static
    `root_only` FK shortcut is valid.  Constraint families that read frame
    channels directly (direction, joint-rotation) never need FK and are
    always allowed; look-at / relative-transform / pose / trajectory-set
    read non-root FK results and must be inactive."""
    import numpy as np

    def any_active(a):
        return bool(np.any(np.asarray(a) > 0))

    kf_act = np.asarray(step_scs.kf_active) > 0
    if np.any(kf_act & (np.asarray(step_scs.kf_node) != root_node)):
        return False
    ca_act = np.asarray(step_scs.ca_active) > 0
    if np.any(ca_act & (np.asarray(step_scs.ca_node) != root_node)):
        return False
    if np.any((np.asarray(step_scs.traj_active) > 0)
              & (np.asarray(step_scs.traj_node) != root_node)):
        return False
    return not (any_active(step_scs.la_active)
                or any_active(step_scs.rt_active)
                or any_active(step_scs.pose_active)
                or any_active(step_scs.ts_active))


def _non_kf_families_inactive(step_scs) -> bool:
    """Every constraint family OUTSIDE the keyframe slots is inactive.
    Shared by the Pallas-selection contract predicates below: a family
    added to StepConstraints must be added HERE once, or the kernels would
    silently ignore it and mis-rank candidates."""

    def any_active(a):
        return bool(np.any(np.asarray(a) > 0))

    return not (any_active(step_scs.la_active)
                or any_active(step_scs.rt_active)
                or any_active(step_scs.jr_active)
                or any_active(step_scs.pose_active)
                or any_active(step_scs.ca_active)
                or any_active(step_scs.ts_active))


def step_scs_locomotion_only(step_scs) -> bool:
    """Host-side check: True when a (numpy-leaf) StepConstraints pytree
    carries NO user constraint slots beyond the locomotion family — i.e.
    keyframe slots 2+ (0/1 are the walk's own goal/half-step slots), and
    every non-locomotion family, are inactive.  The fused Pallas selection
    kernel scores exactly the locomotion family; ranking candidates while
    silently ignoring user slots would systematically pick
    constraint-violating winners, so callers must verify this before
    enabling `pallas_selection`."""
    kf_act = np.asarray(step_scs.kf_active) > 0
    user_kf = kf_act[..., 2:]
    return not bool(np.any(user_kf)) and _non_kf_families_inactive(step_scs)


def step_scs_pallas_ee_only(step_scs, ee_node: int) -> bool:
    """Host-side check for the end-effector selection kernel: True when the
    ONLY user constraint beyond the locomotion family is keyframe slot 2,
    position-only, on `ee_node` (the reference's pick/place shape — one
    end-effector target per step, motion_primitive_constraints_builder.py:
    218-230).  Slots 0/1 are the walk's own locomotion goals; anything else
    would be silently ignored by the kernel and mis-rank candidates."""
    kf_act = np.asarray(step_scs.kf_active) > 0
    kf_act2 = np.atleast_2d(kf_act)  # [n_steps?, K]
    if np.any(kf_act2[:, 3:]):
        return False
    slot2 = kf_act2[:, 2]
    if np.any(slot2):
        node = np.atleast_2d(np.asarray(step_scs.kf_node))[:, 2]
        has_q = np.atleast_2d(np.asarray(step_scs.kf_has_quat))[:, 2]
        if np.any(slot2 & (node != ee_node)):
            return False
        if np.any(slot2 & (has_q > 0)):
            return False
    return _non_kf_families_inactive(step_scs)


def active_mask(sc: StepConstraints) -> jax.Array:
    """0/1 mask over the residual vector marking active constraint slots
    (reference pads residuals likewise, objective_functions.py:233-236)."""
    traj_mask = jnp.broadcast_to(sc.traj_active, (TRAJ_SAMPLES,))
    ts_mask = jnp.broadcast_to(sc.ts_active, (TRAJ_SAMPLES,))
    return jnp.concatenate([sc.kf_active, sc.dir_active[None],
                            sc.la_active[None], sc.rt_active[None],
                            sc.jr_active[None], sc.pose_active[None],
                            sc.ca_active, traj_mask, ts_mask])


def static_family_gate(use_traj: bool = True, use_ca: bool = True,
                       use_ts: bool = False) -> np.ndarray:
    """Host-side 0/1 gate over the residual layout for families compiled
    OUT of `residuals_from_coeffs` by the static use_* flags.

    Multiply `active_mask(sc)` by this wherever the mask feeds an LM
    residual vector: a family whose residuals are compiled out must not
    keep its mask slots on, or each such slot degenerates to
    quality_scale * nll and the naturalness term gets counted once per
    masked-but-unevaluated slot."""
    gate = np.ones(N_RESIDUALS, np.float32)
    if not use_ca:
        gate[_OFF_CA:_OFF_TRAJ] = 0.0
    if not use_traj:
        gate[_OFF_TRAJ:_OFF_TS] = 0.0
    if not use_ts:
        gate[_OFF_TS:] = 0.0
    return gate


def error_from_residuals(res: jax.Array) -> jax.Array:
    """Scalar constraint error from a residual vector: sum of residuals,
    except trajectory residuals enter as their average (reference
    trajectory_constraint.py:84 `evaluate_motion_sample` averages; other
    constraints sum)."""
    base = jnp.sum(res[..., : _OFF_TRAJ], axis=-1)
    traj = res[..., _OFF_TRAJ: _OFF_TS]
    ts = res[..., _OFF_TS:]
    traj_active = jnp.where(jnp.any(traj > 0, axis=-1), 1.0, 0.0)
    ts_active = jnp.where(jnp.any(ts > 0, axis=-1), 1.0, 0.0)
    return (base + traj_active * jnp.mean(traj, axis=-1)
            + ts_active * jnp.mean(ts, axis=-1))


def evaluate_error(skeleton: Skeleton, prim: MotionPrimitive,
                   sc: StepConstraints, s: jax.Array,
                   use_traj: bool = True, use_ca: bool = True,
                   use_ts: bool = False) -> jax.Array:
    """Scalar constraint error (see error_from_residuals)."""
    res = evaluate_residuals(skeleton, prim, sc, s, use_traj=use_traj,
                             use_ca=use_ca, use_ts=use_ts)
    return error_from_residuals(res)


# ---------------------------------------------------------------------------
# Host-side builders
# ---------------------------------------------------------------------------

class LocoSpec(struct.PyTreeNode):
    """Locomotion goal parameters for on-device constraint filling
    (reference locomotion_constraints_builder.py:54-120): the goal position/
    direction queries run inside the selection kernel instead of paying a
    host round-trip per step."""

    goal_arc: jax.Array  # f32 goal arc length on the path
    half_arc: jax.Array  # f32 half-step arc length
    node: jax.Array  # i32 root joint skeleton index
    end_kf: jax.Array  # f32 canonical keyframe of the step end
    mid_kf: jax.Array  # f32 canonical keyframe of the step middle
    dim_mask: jax.Array  # [3] 1 where the goal component is constrained
    pos_weight: jax.Array  # f32
    dir_weight: jax.Array  # f32


def make_frozen_root_residuals(skeleton: Skeleton, knots_s: jax.Array,
                               sc: StepConstraints, eigen_s: jax.Array,
                               mean_s: jax.Array, n_basis: int, n_dim: int,
                               k_s: int, use_traj: bool = True,
                               use_ca: bool = False, ee_node: int = None):
    """Frozen-correspondence residual factory for the root-only LM fast path.

    ee_node (static, round-5 extension): node index of ONE end-effector
    joint — keyframe slots may then reference the root OR that joint (the
    reference's pick/place shape, motion_primitive_constraints_builder.py:
    218-230); the kf family evaluates via ancestor-chain FK instead of the
    root shortcut.  All other families keep root-only semantics
    (`step_scs_pallas_ee_only` is the host-side contract check).

    Returns make(s_freeze) -> residual_fn where residual_fn(s) evaluates the
    full residual layout with the trajectory closest-point correspondences
    FROZEN at s_freeze (ICP-style).  The advancing closest-point search is a
    16-step sequential scan — by far the most expensive part of a residual
    evaluation — and under the exact LM it re-runs once per jacobian tangent
    plus the accept probe (~30x per iteration).  Freezing it leaves: an
    affine map to the query frames (basis x eigenvectors precomputed ONCE
    per step as [T, D, k]), the cheap differentiable 2D alignment (exact —
    NOT frozen; freezing it measurably degraded converged error), and tiny
    residual heads.

    Exactness: at s == s_freeze the residuals equal
    `residuals_from_coeffs(..., root_only=True)` to fusion-level rounding —
    same formulas, same correspondences (tested).  Away from the freeze
    point only the trajectory family is approximated (distance to the
    frozen spline points instead of the advancing closest points).  Callers
    re-freeze every LM iteration and re-score the final candidate exactly,
    keeping it only when the TRUE error improves.

    Contract: root_only semantics — every active slot references the root
    (la/rt/pose/ts must be inactive, `step_scs_root_only`); jr reads frame
    channels directly and is allowed."""
    d = n_dim
    parts = [sc.kf_frame, sc.dir_frame[None], sc.la_frame[None],
             sc.rt_frame[None], sc.jr_frame[None]]
    o_lin = MAX_KF + 4
    t_lin = jnp.linspace(0.0, 1.0, TRAJ_SAMPLES) * jnp.maximum(
        sc.n_canonical - 1.0, 1.0)
    need_lin = use_traj or use_ca
    if need_lin:
        parts.append(t_lin)
    t_all = jnp.concatenate(parts)
    b_all = bspline.basis_matrix(knots_s, t_all)  # [T, nb]
    e3 = eigen_s[:, :k_s].reshape(n_basis, d, k_s)
    be = jnp.einsum("tb,bdc->tdc", b_all, e3,
                    precision=jax.lax.Precision.HIGHEST)  # [T, d, k]
    bmu = jnp.matmul(b_all, mean_s.reshape(n_basis, d),
                     precision=jax.lax.Precision.HIGHEST)  # [T, d]
    first_e = eigen_s[:d]  # first coefficient row block
    first_mu = mean_s[:d]
    mask_dim = (jnp.where(sc.traj.unconstrained, 0.0, 1.0)
                if use_traj else jnp.ones(3))

    def frames_at(s: jax.Array) -> jax.Array:
        """Aligned query frames [T, D]: affine base + exact differentiable
        2D alignment from the candidate's own first coefficient row
        (stacked_aligned_coeffs semantics)."""
        alpha = s[:k_s]
        base = bmu + jnp.einsum("tdc,c->td", be, alpha,
                                precision=jax.lax.Precision.HIGHEST)
        first = jnp.matmul(first_e, alpha,
                           precision=jax.lax.Precision.HIGHEST) + first_mu
        q_prev, d_prev = align.node_aligning_2d_transform(sc.prev_last, first)
        q_y = jnp.where(sc.has_prev > 0, q_prev, sc.start_q)
        delta = jnp.where(sc.has_prev > 0, d_prev, sc.start_delta)
        return align.transform_frames(base, q_y, delta)

    def make(s_freeze: jax.Array):
        frozen = {}
        if use_traj:
            f0 = frames_at(s_freeze)
            rp0, _ = fk_root(skeleton, f0)
            pts, arcs, _ = spline_path.closest_points_advancing(
                sc.traj, rp0[o_lin: o_lin + TRAJ_SAMPLES], sc.traj_min_arc)
            in_range = ((arcs >= sc.traj_range_start)
                        & (arcs <= sc.traj_range_end))
            frozen["pts"] = pts
            frozen["in_range"] = in_range

        def residual_fn(s: jax.Array) -> jax.Array:
            f = frames_at(s)
            rp, rq = fk_root(skeleton, f)  # [T, 3/4]

            idx = jnp.arange(MAX_KF)
            if ee_node is None:
                jpos = rp[idx]
                jori = rq[idx]
            else:
                # slots may reference root or the ee joint: ancestor-chain
                # FK per kf row resolves both (root rows produce the same
                # values as fk_root to op-order rounding)
                from ..models.skeleton import fk_node
                jpos, jori = fk_node(skeleton, f[idx], sc.kf_node)
            pos_err = jnp.sqrt(jnp.maximum(jnp.sum(
                ((jpos - sc.kf_pos) * sc.kf_pos_mask) ** 2, axis=-1), 1e-12))
            dot = jnp.abs(jnp.sum(quat.normalize(jori) * sc.kf_quat, axis=-1))
            ang = 2.0 * jnp.arccos(jnp.clip(dot, -1.0 + 1e-6, 1.0 - 1e-6))
            kf_res = sc.kf_active * sc.kf_weight * (pos_err
                                                    + sc.kf_has_quat * ang)

            frame_dir = f[MAX_KF]
            heading = quat.rotate_vec(quat.normalize(frame_dir[3:7]),
                                      jnp.array([0.0, 0.0, 1.0]))
            motion_dir = jnp.stack([heading[0], heading[2]])
            motion_dir = motion_dir / jnp.maximum(
                jnp.linalg.norm(motion_dir), 1e-10)
            cos_a = jnp.clip(jnp.dot(sc.dir_target, motion_dir), -1.0, 1.0)
            dir_res = (sc.dir_active * sc.dir_weight
                       * jnp.rad2deg(jnp.arccos(cos_a)))

            frame_jr = f[MAX_KF + 3]
            quats_jr = frame_jr[3:].reshape(-1, 4)
            q_local = quat.normalize(quats_jr[sc.jr_joint])
            dot_jr = jnp.abs(jnp.sum(q_local * sc.jr_quat))
            jr_res = sc.jr_active * sc.jr_weight * 2.0 * jnp.arccos(
                jnp.clip(dot_jr, -1.0 + 1e-6, 1.0 - 1e-6))

            if use_traj:
                root_tr = rp[o_lin: o_lin + TRAJ_SAMPLES]
                d_tr = jnp.sqrt(jnp.maximum(jnp.sum(
                    ((root_tr - frozen["pts"]) * mask_dim) ** 2, axis=-1),
                    1e-24))
                traj_res = (sc.traj_active * sc.traj_weight
                            * jnp.where(frozen["in_range"], d_tr, 0.0))
            else:
                traj_res = jnp.zeros(TRAJ_SAMPLES)

            if use_ca:
                jca = rp[o_lin: o_lin + TRAJ_SAMPLES][:, None, :]
                d_ca = jnp.sqrt(jnp.maximum(jnp.sum(
                    ((jca - sc.ca_pos) * sc.ca_pos_mask) ** 2, axis=-1),
                    1e-12))
                ca_res = sc.ca_active * sc.ca_weight * jnp.min(d_ca, axis=0)
            else:
                ca_res = jnp.zeros(MAX_CA)

            zero = jnp.zeros(1)
            return jnp.concatenate([kf_res, dir_res[None], zero, zero,
                                    jr_res[None], zero, ca_res, traj_res,
                                    jnp.zeros(TRAJ_SAMPLES)])

        return residual_fn

    return make


def make_frozen_root_residuals_closed(skeleton: Skeleton, knots_s: jax.Array,
                                      sc: StepConstraints, eigen_s: jax.Array,
                                      mean_s: jax.Array, n_basis: int,
                                      n_dim: int, k_s: int,
                                      use_traj: bool = True,
                                      use_ca: bool = False,
                                      ee_node: int = None):
    """Fused-iteration form of `make_frozen_root_residuals`: same frozen
    model, but the residual VALUE and its JACOBIAN come out of one pass
    instead of `jax.linearize` + one tangent evaluation per latent dim.

    Returns make(s_freeze) -> (r_raw [R], J_raw [R, k_s], value_fn) where
    r_raw/J_raw are evaluated at the freeze point (LM re-freezes every
    iteration, so the jacobian is always wanted exactly there) and
    value_fn(s) evaluates the frozen-model residuals at a probe point.

    Structure exploited: the aligned query frames are an affine map of the
    latent (base = bmu + be @ alpha, first = fe @ alpha + fmu) followed by
    a chain that only ever reads SEVEN channels per frame row — root
    translation 0:3 and the root quaternion 3:7 (`fk_root` with the root
    as animated joint 0; the jr family's dynamically-indexed quaternion is
    carried as one extra affine 4-vector).  So the whole jacobian is
    J = (dg/dfirst7) @ fe7 + (dg/drows7) . be7 + (dg/djrq) @ bejr: the
    head gradients come from ONE vector-jacobian pass over the cheap
    7-channel head function g (auto-derived — no hand-written chain rule),
    and the contractions with the precomputed affine operators are batched
    matmuls.  Per LM iteration this replaces the k_s-tangent linearize of
    the full [T, n_dim] frame chain (the dominant op-count block in the
    HLO receipts, benchmarks/hlo_ops.py) with ~one value pass + one VJP
    pass + two dots.

    Exactness: r_raw and value_fn match `make_frozen_root_residuals` to
    rounding, and J_raw matches its `jax.linearize` jacobian (tested in
    test_constrained_walk_full.py).  Contract: `fk_root`'s root must be
    animated joint 0 (callers check `frozen_closed_supported`); remaining
    semantics (root-only slots, jr allowed) are as the frozen factory.
    Reference provenance: objective_functions.py:239-267 residual
    semantics via make_frozen_root_residuals (this file).

    ee_node (static, round-5): with one end-effector joint the consumed
    channel set widens from 7 to 7 + 4*(animated ancestor-chain joints
    below the root): the ee position/orientation is an ancestor-chain FK
    over those affine channel rows — still a cheap head under the SAME
    one-VJP jacobian pass, so the ee pick/place workload gets the fused
    frozen iteration the root-only headline rides (the exact-LM tangents
    through full dense FK were the measured 3.4x ee gap, VERDICT r4 #4).

    HARD CONTRACT (host-checkable only — kf_node is traced here): every
    active keyframe slot must reference the ROOT or `ee_node`.  A slot on
    any OTHER joint is silently scored against the root's transform by
    this closed form (the `jnp.where(is_ee, ...)` select has no third
    chain), while the linearize spec (`make_frozen_root_residuals`, which
    uses fk_node per slot) would score it correctly — the two forms then
    disagree with no error raised.  Callers gate with
    `step_scs_pallas_ee_only` at their host boundary
    (constrained_walk_full_crowd, constrained_crowd_sharded,
    bench.run_config)."""
    from ..models.skeleton import _fk_tables, _rest_table

    if _fk_tables(skeleton)[0] != 0:
        raise ValueError("closed frozen path requires the root to be "
                         "animated joint 0 (fk_root reads channels 3:7)")
    anim_idx = _fk_tables(skeleton)
    if ee_node is None:
        chain_nodes = []
        ch_extra = []
    else:
        chain_nodes = []
        n = int(ee_node)
        while n >= 0:
            chain_nodes.append(n)
            n = int(skeleton.parents[n])
        chain_nodes.reverse()  # root .. ee
        ch_extra = [anim_idx[n] for n in chain_nodes[1:] if anim_idx[n] >= 0]
    # consumed frame channels: root trans+quat, then each animated chain
    # joint's quaternion block
    ch_idx = list(range(7)) + [3 + 4 * a + j for a in ch_extra
                               for j in range(4)]
    d = n_dim
    parts = [sc.kf_frame, sc.dir_frame[None], sc.la_frame[None],
             sc.rt_frame[None], sc.jr_frame[None]]
    o_lin = MAX_KF + 4
    t_lin = jnp.linspace(0.0, 1.0, TRAJ_SAMPLES) * jnp.maximum(
        sc.n_canonical - 1.0, 1.0)
    need_lin = use_traj or use_ca
    if need_lin:
        parts.append(t_lin)
    t_all = jnp.concatenate(parts)
    n_rows = t_all.shape[0]
    b_all = bspline.basis_matrix(knots_s, t_all)  # [T, nb]
    e3 = eigen_s[:, :k_s].reshape(n_basis, d, k_s)
    m2 = mean_s.reshape(n_basis, d)
    # affine operators restricted to the consumed channels (a plain slice
    # when root-only, preserving the measured headline program bit-for-bit;
    # a gather over ch_idx with an ee chain)
    if ee_node is None:
        be7 = jnp.einsum("tb,bck->tck", b_all, e3[:, :7, :],
                         precision=jax.lax.Precision.HIGHEST)  # [T, 7, k]
        bmu7 = jnp.matmul(b_all, m2[:, :7],
                          precision=jax.lax.Precision.HIGHEST)  # [T, 7]
    else:
        ch = np.asarray(ch_idx, np.int32)
        be7 = jnp.einsum("tb,bck->tck", b_all, e3[:, ch, :],
                         precision=jax.lax.Precision.HIGHEST)  # [T, C, k]
        bmu7 = jnp.matmul(b_all, m2[:, ch],
                          precision=jax.lax.Precision.HIGHEST)  # [T, C]
    # the jr row's full-D affine map (its quaternion channel is dynamic)
    bejr = jnp.einsum("b,bdk->dk", b_all[MAX_KF + 3], e3,
                      precision=jax.lax.Precision.HIGHEST)  # [d, k]
    bmujr = jnp.matmul(b_all[MAX_KF + 3], m2,
                       precision=jax.lax.Precision.HIGHEST)  # [d]
    cjr = 3 + 4 * sc.jr_joint
    jr_map = jax.lax.dynamic_slice(bejr, (cjr, 0), (4, k_s))  # [4, k]
    jr_mu = jax.lax.dynamic_slice(bmujr, (cjr,), (4,))
    fe7 = eigen_s[:7, :k_s]  # first coefficient row block, 7 channels
    fmu7 = mean_s[:7]
    off0 = jnp.asarray(skeleton.offsets)[0]
    mask_dim = (jnp.where(sc.traj.unconstrained, 0.0, 1.0)
                if use_traj else jnp.ones(3))

    def align_from(first7: jax.Array):
        q_prev, d_prev = align.node_aligning_2d_transform(sc.prev_last,
                                                          first7)
        q_y = jnp.where(sc.has_prev > 0, q_prev, sc.start_q)
        delta = jnp.where(sc.has_prev > 0, d_prev, sc.start_delta)
        return q_y, delta

    def affine_at(s: jax.Array):
        alpha = s[:k_s]
        first7 = jnp.matmul(fe7, alpha,
                            precision=jax.lax.Precision.HIGHEST) + fmu7
        rows7 = bmu7 + jnp.einsum("tck,k->tc", be7, alpha,
                                  precision=jax.lax.Precision.HIGHEST)
        jrq = jr_mu + jnp.matmul(jr_map, alpha,
                                 precision=jax.lax.Precision.HIGHEST)
        return first7, rows7, jrq

    def make(s_freeze: jax.Array):
        first7_0, rows7_0, jrq_0 = affine_at(s_freeze)
        frozen = {}
        if use_traj:
            q_y0, delta_0 = align_from(first7_0)
            rp0 = (off0 + quat.rotate_vec(q_y0[None], rows7_0[o_lin:, :3])
                   + delta_0)
            pts, arcs, _ = spline_path.closest_points_advancing(
                sc.traj, rp0, sc.traj_min_arc)
            frozen["pts"] = pts
            frozen["in_range"] = ((arcs >= sc.traj_range_start)
                                  & (arcs <= sc.traj_range_end))

        def g(first7: jax.Array, rows7: jax.Array, jrq: jax.Array):
            """Residual heads on the 7-channel frame rows (+ the jr
            4-vector) — same formulas as make_frozen_root_residuals."""
            q_y, delta = align_from(first7)
            rp = off0 + quat.rotate_vec(q_y[None], rows7[:, :3]) + delta
            rq = quat.multiply(q_y[None], rows7[:, 3:7])

            jpos = rp[:MAX_KF]
            jori = rq[:MAX_KF]
            if ee_node is not None:
                # ancestor-chain FK over the extra affine channel rows, in
                # fk_global's composition order (pos += R_parent @ offset,
                # ori = parent * local; quats deliberately unnormalized)
                p_ee = jpos
                q_ee = jori
                col = 7
                offs = jnp.asarray(skeleton.offsets)
                rest = jnp.asarray(_rest_table(skeleton))
                for node in chain_nodes[1:]:
                    p_ee = p_ee + quat.rotate_vec(
                        q_ee, jnp.broadcast_to(offs[node], p_ee.shape))
                    if anim_idx[node] >= 0:
                        local = rows7[:MAX_KF, col: col + 4]
                        col += 4
                    else:
                        local = jnp.broadcast_to(rest[node], q_ee.shape)
                    q_ee = quat.multiply(q_ee, local)
                is_ee = (sc.kf_node == ee_node)[:, None]
                jpos = jnp.where(is_ee, p_ee, jpos)
                jori = jnp.where(is_ee, q_ee, jori)
            pos_err = jnp.sqrt(jnp.maximum(jnp.sum(
                ((jpos - sc.kf_pos) * sc.kf_pos_mask) ** 2, axis=-1), 1e-12))
            dot = jnp.abs(jnp.sum(quat.normalize(jori) * sc.kf_quat,
                                  axis=-1))
            ang = 2.0 * jnp.arccos(jnp.clip(dot, -1.0 + 1e-6, 1.0 - 1e-6))
            kf_res = sc.kf_active * sc.kf_weight * (pos_err
                                                    + sc.kf_has_quat * ang)

            heading = quat.rotate_vec(quat.normalize(rq[MAX_KF]),
                                      jnp.array([0.0, 0.0, 1.0]))
            motion_dir = jnp.stack([heading[0], heading[2]])
            motion_dir = motion_dir / jnp.maximum(
                jnp.linalg.norm(motion_dir), 1e-10)
            cos_a = jnp.clip(jnp.dot(sc.dir_target, motion_dir), -1.0, 1.0)
            dir_res = (sc.dir_active * sc.dir_weight
                       * jnp.rad2deg(jnp.arccos(cos_a)))

            # jr: animated joint 0 is the root -> its quat channels 3:7
            # are the aligned rq row; any other joint is pass-through
            q_jr = jnp.where(sc.jr_joint == 0, rq[MAX_KF + 3], jrq)
            q_local = quat.normalize(q_jr)
            dot_jr = jnp.abs(jnp.sum(q_local * sc.jr_quat))
            jr_res = sc.jr_active * sc.jr_weight * 2.0 * jnp.arccos(
                jnp.clip(dot_jr, -1.0 + 1e-6, 1.0 - 1e-6))

            if use_traj:
                root_tr = rp[o_lin: o_lin + TRAJ_SAMPLES]
                d_tr = jnp.sqrt(jnp.maximum(jnp.sum(
                    ((root_tr - frozen["pts"]) * mask_dim) ** 2, axis=-1),
                    1e-24))
                traj_res = (sc.traj_active * sc.traj_weight
                            * jnp.where(frozen["in_range"], d_tr, 0.0))
            else:
                traj_res = jnp.zeros(TRAJ_SAMPLES)

            if use_ca:
                jca = rp[o_lin: o_lin + TRAJ_SAMPLES][:, None, :]
                d_ca = jnp.sqrt(jnp.maximum(jnp.sum(
                    ((jca - sc.ca_pos) * sc.ca_pos_mask) ** 2, axis=-1),
                    1e-12))
                ca_res = sc.ca_active * sc.ca_weight * jnp.min(d_ca, axis=0)
            else:
                ca_res = jnp.zeros(MAX_CA)

            zero = jnp.zeros(1)
            return jnp.concatenate([kf_res, dir_res[None], zero, zero,
                                    jr_res[None], zero, ca_res, traj_res,
                                    jnp.zeros(TRAJ_SAMPLES)])

        r_raw, vjp = jax.vjp(g, first7_0, rows7_0, jrq_0)
        j_first, j_rows, j_jr = jax.vmap(vjp)(jnp.eye(N_RESIDUALS,
                                                      dtype=r_raw.dtype))
        j_raw = (jnp.matmul(j_first, fe7,
                            precision=jax.lax.Precision.HIGHEST)
                 + jnp.einsum("rtc,tck->rk", j_rows, be7,
                              precision=jax.lax.Precision.HIGHEST)
                 + jnp.matmul(j_jr, jr_map,
                              precision=jax.lax.Precision.HIGHEST))

        def value_fn(s: jax.Array) -> jax.Array:
            return g(*affine_at(s))

        return r_raw, j_raw, value_fn

    return make


def frozen_closed_supported(skeleton: Skeleton) -> bool:
    """Host-static check for the closed frozen-LM path: the root must be
    animated joint 0 so `fk_root`'s orientation is frame channels 3:7."""
    from ..models.skeleton import _fk_tables
    return _fk_tables(skeleton)[0] == 0


def fill_locomotion_slots(sc: StepConstraints, path: spline_path.PathSpline,
                          loco: LocoSpec, use_pos: bool = True,
                          use_dir: bool = True,
                          use_half: bool = False) -> StepConstraints:
    """Fill the reserved locomotion keyframe/direction slots from on-device
    path queries (slot 0 = end goal, slot 1 = half step; the host builder
    reserves them).  Traced — call inside a jitted selection kernel."""
    goal, gdir = spline_path.point_and_dir_at_arc_length(path, loco.goal_arc)
    kf_active = jnp.asarray(sc.kf_active)
    kf_node = jnp.asarray(sc.kf_node)
    kf_pos = jnp.asarray(sc.kf_pos)
    kf_mask = jnp.asarray(sc.kf_pos_mask)
    kf_frame = jnp.asarray(sc.kf_frame)
    kf_weight = jnp.asarray(sc.kf_weight)
    kf_generated = jnp.asarray(sc.kf_generated)
    if use_pos:
        kf_active = kf_active.at[0].set(1.0)
        kf_node = kf_node.at[0].set(loco.node)
        kf_pos = kf_pos.at[0].set(goal * loco.dim_mask)
        kf_mask = kf_mask.at[0].set(loco.dim_mask)
        kf_frame = kf_frame.at[0].set(loco.end_kf)
        kf_weight = kf_weight.at[0].set(loco.pos_weight)
        kf_generated = kf_generated.at[0].set(1.0)
    if use_half:
        half_goal, _ = spline_path.point_and_dir_at_arc_length(path, loco.half_arc)
        slot = 1 if use_pos else 0
        kf_active = kf_active.at[slot].set(1.0)
        kf_node = kf_node.at[slot].set(loco.node)
        kf_pos = kf_pos.at[slot].set(half_goal * loco.dim_mask)
        kf_mask = kf_mask.at[slot].set(loco.dim_mask)
        kf_frame = kf_frame.at[slot].set(loco.mid_kf)
        kf_weight = kf_weight.at[slot].set(loco.pos_weight)
        kf_generated = kf_generated.at[slot].set(1.0)
    sc = sc.replace(kf_active=kf_active, kf_node=kf_node, kf_pos=kf_pos,
                    kf_pos_mask=kf_mask, kf_frame=kf_frame,
                    kf_weight=kf_weight, kf_generated=kf_generated)
    if use_dir:
        sc = sc.replace(dir_active=jnp.asarray(1.0), dir_target=gdir,
                        dir_frame=jnp.asarray(loco.end_kf),
                        dir_weight=jnp.asarray(loco.dir_weight))
    return sc


def _np_set(arr, idx, val):
    """Copy-and-set a row of a host-side leaf (numpy replacement for the
    eager `.at[idx].set(val)` device scatter)."""
    out = np.array(arr, copy=True)
    out[idx] = val
    return out


def set_keyframe_constraint(sc: StepConstraints, slot: int, skeleton: Skeleton,
                            joint: str, canonical_keyframe: float,
                            position=None, quat_wxyz=None,
                            weight: float = 1.0,
                            generated: bool = False) -> StepConstraints:
    pos = np.zeros(3, np.float32)
    mask = np.zeros(3, np.float32)
    if position is not None:
        p = np.asarray(position, np.float32)
        mask = (~np.isnan(p)).astype(np.float32)
        pos = np.where(np.isnan(p), 0.0, p)
    has_q = 0.0
    q = np.array([1.0, 0, 0, 0], np.float32)
    if quat_wxyz is not None:
        q = np.asarray(quat_wxyz, np.float32)
        has_q = 1.0
    return sc.replace(
        kf_active=_np_set(sc.kf_active, slot, 1.0),
        kf_node=_np_set(sc.kf_node, slot, skeleton.index_of(joint)),
        kf_pos=_np_set(sc.kf_pos, slot, pos),
        kf_pos_mask=_np_set(sc.kf_pos_mask, slot, mask),
        kf_quat=_np_set(sc.kf_quat, slot, q),
        kf_has_quat=_np_set(sc.kf_has_quat, slot, has_q),
        kf_frame=_np_set(sc.kf_frame, slot, float(canonical_keyframe)),
        kf_weight=_np_set(sc.kf_weight, slot, weight),
        kf_generated=_np_set(sc.kf_generated, slot, float(generated)),
    )


def set_direction_constraint(sc: StepConstraints, dir_xz,
                             canonical_keyframe: float,
                             weight: float = 1.0) -> StepConstraints:
    d = np.asarray(dir_xz, np.float32)
    d = d / max(np.linalg.norm(d), 1e-10)
    return sc.replace(dir_active=np.float32(1.0),
                      dir_target=d,
                      dir_frame=np.float32(canonical_keyframe),
                      dir_weight=np.float32(weight))


def set_look_at_constraint(sc: StepConstraints, skeleton: Skeleton,
                           joint: str, target, canonical_keyframe: float,
                           weight: float = 1.0) -> StepConstraints:
    return sc.replace(la_active=np.float32(1.0),
                      la_node=np.int32(skeleton.index_of(joint)),
                      la_target=np.asarray(target, np.float32),
                      la_frame=np.float32(canonical_keyframe),
                      la_weight=np.float32(weight))


def set_pose_constraint(sc: StepConstraints, skeleton: Skeleton,
                        target_frame, weight: float = 1.0,
                        joint_weights=None) -> StepConstraints:
    pts, _ = fk_global(skeleton, jnp.asarray(target_frame, jnp.float32))
    if joint_weights is None:
        # per-NODE weights from the skeleton's animated-joint weight map
        # (reference create_pose_constraint pulls skeleton.joint_weight_map,
        # motion_primitive_constraints_builder.py:291-300)
        wmap = skeleton.joint_weight_map
        joint_weights = [wmap.get(n, 1.0) for n in skeleton.node_names]
    return sc.replace(pose_active=np.float32(1.0),
                      pose_points=np.asarray(pts),
                      pose_weight=np.float32(weight),
                      pose_joint_weights=np.asarray(joint_weights, np.float32))


def set_trajectory_constraint(sc: StepConstraints, skeleton: Skeleton,
                              traj: spline_path.PathSpline, joint: str,
                              min_arc_length: float = 0.0,
                              weight: float = 1.0) -> StepConstraints:
    return sc.replace(traj_active=np.float32(1.0), traj=traj,
                      traj_node=np.int32(skeleton.index_of(joint)),
                      traj_min_arc=np.float32(min_arc_length),
                      traj_weight=np.float32(weight))


def set_relative_transform_constraint(sc: StepConstraints, skeleton: Skeleton,
                                       joint: str, parent_joint: str, offset,
                                       canonical_keyframe: float,
                                       weight: float = 1.0) -> StepConstraints:
    return sc.replace(
        rt_active=np.float32(1.0),
        rt_node=np.int32(skeleton.index_of(joint)),
        rt_parent=np.int32(skeleton.index_of(parent_joint)),
        rt_offset=np.asarray(offset, np.float32),
        rt_frame=np.float32(canonical_keyframe),
        rt_weight=np.float32(weight))


def set_joint_rotation_constraint(sc: StepConstraints, skeleton: Skeleton,
                                  joint: str, quat_wxyz,
                                  canonical_keyframe: float,
                                  weight: float = 1.0) -> StepConstraints:
    return sc.replace(
        jr_active=np.float32(1.0),
        jr_joint=np.int32(skeleton.animated_index_of(joint)),
        jr_quat=np.asarray(quat_wxyz, np.float32),
        jr_frame=np.float32(canonical_keyframe),
        jr_weight=np.float32(weight))


def set_ca_constraint(sc: StepConstraints, skeleton: Skeleton, joint: str,
                      position, weight: float = 1.0,
                      slot: int = 0) -> StepConstraints:
    p = np.asarray(position, np.float32)
    mask = (~np.isnan(p)).astype(np.float32)
    return sc.replace(ca_active=_np_set(sc.ca_active, slot, 1.0),
                      ca_node=_np_set(sc.ca_node, slot,
                                      skeleton.index_of(joint)),
                      ca_pos=_np_set(sc.ca_pos, slot,
                                     np.where(np.isnan(p), 0.0, p)),
                      ca_pos_mask=_np_set(sc.ca_pos_mask, slot, mask),
                      ca_weight=_np_set(sc.ca_weight, slot, weight))


def set_trajectory_set_constraint(sc: StepConstraints, skeleton: Skeleton,
                                  joints, trajs, arc0=None,
                                  weight: float = 1.0) -> StepConstraints:
    """Joint-set trajectory constraint (reference
    trajectory_set_constraint.py:30-108): up to MAX_TS_JOINTS joints each
    with its own PathSpline (all built with the same max_points/granularity
    so the pytrees stack)."""
    n = len(joints)
    assert 0 < n <= MAX_TS_JOINTS, f"1..{MAX_TS_JOINTS} joints, got {n}"
    assert len(trajs) == n
    idx = np.zeros(MAX_TS_JOINTS, np.int32)
    mask = np.zeros(MAX_TS_JOINTS, np.float32)
    for i, j in enumerate(joints):
        idx[i] = skeleton.index_of(j)
        mask[i] = 1.0
    padded = list(trajs) + [trajs[-1]] * (MAX_TS_JOINTS - n)
    stacked = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                           *padded)
    arcs = np.zeros(MAX_TS_JOINTS, np.float32)
    if arc0 is not None:
        arcs[:n] = np.asarray(arc0, np.float32)[:n]
    return sc.replace(ts_active=np.float32(1.0), ts_joints=idx,
                      ts_joint_mask=mask, ts_trajs=stacked, ts_arc0=arcs,
                      ts_weight=np.float32(weight))


def set_trajectory_active_range(sc: StepConstraints, start: float,
                                end: float) -> StepConstraints:
    return sc.replace(traj_range_start=np.float32(start),
                      traj_range_end=np.float32(end))


def set_alignment_from_prev(sc: StepConstraints, prev_last) -> StepConstraints:
    return sc.replace(has_prev=np.float32(1.0),
                      prev_last=np.asarray(prev_last, np.float32))


def set_alignment_from_start_pose(sc: StepConstraints, position,
                                  orientation_y_deg: float) -> StepConstraints:
    # numpy mirror of align.transform_from_start_pose (NaN components -> 0,
    # rotation about +Y by the degrees heading)
    pos = np.asarray(position, np.float32)
    pos = np.where(np.isnan(pos), 0.0, pos)
    half = 0.5 * np.deg2rad(float(orientation_y_deg))
    q = np.array([np.cos(half), 0.0, np.sin(half), 0.0], np.float32)
    return sc.replace(has_prev=np.float32(0.0), start_q=q, start_delta=pos)
