"""Batched request serving: many constraint inputs -> one device launch.

The reference scales its REST service by forking one process per CPU core,
each loading its own full graph (mg_rest_interface_parallel.py:10-265).  The
TPU-native equivalent (SURVEY.md §2.10 "Request parallelism") batches
requests into the vmapped constrained-walk path: N locomotion requests
become N rows of `constrained_walk_crowd` and synthesize in one launch.

Requests whose constraints go beyond trajectory following (user keyframe
constraints, multiple actions) fall back to the sequential full-fidelity
`MotionGenerator` path.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..constraints.input_reader import read_input
from ..models.graph import MotionStateGraph, stack_graph
from ..ops import spline_path
from ..synthesis import constrained_walk as cw
from ..synthesis import walk as walk_mod
from ..utils.config import default_config

# spline_path.build's padded control-point capacity — single source of truth
# (passed explicitly to build in generate_batch so the guard and the build
# can never desync)
_MAX_PATH_POINTS = spline_path.MAX_PATH_POINTS


def _root_trajectory(parsed, root_joint: str):
    """The action's ROOT trajectory, or None (a hand/CA trajectory must NOT
    be used as the character's walking path — the sequential path treats
    only the aligning-root joint's trajectory as the locomotion spline,
    synthesis/action_builder.py)."""
    a = parsed.actions[0]
    for traj in a.trajectories:
        if traj.joint in (root_joint, "Hips") and not traj.annotated:
            return traj
    return None


def _is_batchable(parsed, root_joint: str) -> bool:
    """Single locomotion action with a ROOT trajectory that fits the padded
    spline (<= max control points), no keyframe constraints and no extra
    joint/CA trajectories — the shape the crowd path handles."""
    if len(parsed.actions) != 1:
        return False
    a = parsed.actions[0]
    traj = _root_trajectory(parsed, root_joint)
    if traj is None or a.keyframe_constraints:
        return False
    if len(a.trajectories) > 1:
        return False  # extra joint / CA trajectories need the full path
    # must fit the padded PathSpline (spline_path.build max_points default);
    # a longer path would assert inside the batch and 500 every request
    return len(traj.control_points) <= _MAX_PATH_POINTS


class BatchedGenerator:
    """Collects parsed locomotion requests and synthesizes them in one
    vmapped launch."""

    def __init__(self, graph: MotionStateGraph, config: Optional[dict] = None,
                 n_steps: int = 12, n_samples: int = 64,
                 max_step_frames: int = 64, full_constraints: bool = True,
                 lm_iters: int = 3):
        self.graph = graph
        self.stacked = stack_graph(graph)
        self.config = config or default_config()
        self.n_steps = n_steps
        self.n_samples = n_samples
        self.max_step_frames = max_step_frames
        # full_constraints routes through constrained_walk_full (complete
        # compiled constraint semantics + gated LM; fused Pallas selection
        # kernel on TPU, n_samples rounded up to the lane width); False
        # keeps the round-1 boundary-row scorer
        self.full_constraints = full_constraints
        self.lm_iters = lm_iters

    def _start_id(self, action: str) -> int:
        group = self.graph.node_groups[action]
        names = group.start_states or [k[1] for k in group.node_keys]
        return self.stacked.node_id((action, names[0]))

    def _root_joint(self) -> str:
        skel = self.graph.skeleton
        if skel is not None and "Hips" in skel.node_names:
            return "Hips"
        return skel.animated_joints[0] if skel else "Hips"

    def split_batchable(self, mg_inputs: List[dict],
                        activate_coordinate_transform: bool = False):
        """Partition requests into (batchable, fallback) index lists.

        Returns (batchable, fallback, parsed) where parsed[i] is the parsed
        input for batchable indices (None elsewhere) — pass it to
        generate_batch to avoid re-parsing."""
        batchable, fallback = [], []
        parsed_list = [None] * len(mg_inputs)
        root_joint = self._root_joint()
        for i, mg_input in enumerate(mg_inputs):
            try:
                parsed = read_input(
                    mg_input,
                    activate_coordinate_transform=activate_coordinate_transform)
                if _is_batchable(parsed, root_joint):
                    parsed_list[i] = parsed
                    batchable.append(i)
                else:
                    fallback.append(i)
            except (KeyError, ValueError):
                fallback.append(i)
        return batchable, fallback, parsed_list

    def generate_batch(self, mg_inputs: List[dict],
                       activate_coordinate_transform: bool = False,
                       seed: int = 0,
                       parsed_list: Optional[list] = None) -> List[np.ndarray]:
        """Synthesize N locomotion requests in one launch.

        Returns one [T_i, D] frame array per request (segment-flattened).
        All requests must be batchable (use split_batchable first;
        parsed_list re-uses its parse results).
        """
        paths = []
        start_ids = []
        root_joint = self._root_joint()
        for i, mg_input in enumerate(mg_inputs):
            parsed = (parsed_list[i] if parsed_list is not None
                      and parsed_list[i] is not None else read_input(
                          mg_input,
                          activate_coordinate_transform=activate_coordinate_transform))
            a = parsed.actions[0]
            traj = _root_trajectory(parsed, root_joint)
            if traj is None:
                raise ValueError(
                    f"request {i} has no root trajectory — not batchable")
            # paths are relative to the request's start pose
            pts = traj.control_points - traj.control_points[:1] \
                + parsed.start_pose_position
            paths.append(spline_path.build(
                pts, max_points=_MAX_PATH_POINTS,
                unconstrained_dims=traj.unconstrained_dims))
            start_ids.append(self._start_id(a.name))
        stacked_paths = cw.stack_paths(paths)
        start_arr = jnp.asarray(start_ids, jnp.int32)
        if self.full_constraints:
            from .. import parallel
            from ..constraints import compiled
            skel = self.graph.skeleton
            step_scs = cw.default_step_scs(skel, self.n_steps)
            # the request batch IS the crowd's character axis: one shared
            # library path for 1-device hosts and meshes alike (pure dp,
            # zero cross-request collectives; parallel/crowd.py).  On a
            # 1-device mesh the program is identical to a plain vmap.
            mesh = parallel.make_mesh()
            # the fused selection kernel ranks on the locomotion family
            # only, and Mosaic kernels are not GSPMD-partitionable — TPU +
            # single device + no user slots (today step_scs is always
            # default/empty here, but a future batch path adding user slots
            # must fall back to XLA selection)
            use_pallas = (jax.default_backend() == "tpu"
                          and mesh.devices.size == 1
                          and compiled.step_scs_locomotion_only(step_scs))
            n_samples = self.n_samples
            if use_pallas:
                from ..ops import pallas_kernels as pk
                n_samples = ((n_samples + pk.N_BLK - 1) // pk.N_BLK) * pk.N_BLK
            # locomotion-only constraints touch just the root joint: skip
            # the FK chain inside the LM residuals (static shortcut)
            root_only = compiled.step_scs_root_only(step_scs)
            segs, n_frames, node_ids, errors = \
                parallel.constrained_crowd_sharded(
                    mesh, skel, self.stacked, stacked_paths,
                    jax.random.PRNGKey(seed), start_arr,
                    n_steps=self.n_steps, step_scs=step_scs,
                    max_step_frames=self.max_step_frames,
                    n_samples=n_samples, lm_iters=self.lm_iters,
                    pallas_selection=use_pallas, root_only=root_only)
        else:
            keys = jax.random.split(jax.random.PRNGKey(seed),
                                    len(mg_inputs))
            segs, n_frames, node_ids, errors = jax.vmap(
                lambda k, p, s: cw.constrained_walk(
                    k, self.stacked, p, s, n_steps=self.n_steps,
                    max_step_frames=self.max_step_frames,
                    n_samples=self.n_samples))(keys, stacked_paths, start_arr)
        out = []
        for c in range(len(mg_inputs)):
            out.append(walk_mod.flatten_segments(segs[c], n_frames[c]))
        return out
