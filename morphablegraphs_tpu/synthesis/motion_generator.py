"""Top-level constrained synthesis: input dict -> quaternion frames.

Host-driven orchestration (planner decisions, step loop) around jitted step
kernels — the redesign of the reference's `MotionGenerator.generate_motion`
(motion_generator/motion_generator.py:88-386) and `GraphWalkPlanner`
(graph_walk_planner.py:35-278).  Each inner-loop evaluation (option scoring,
best-of-N, LM refinement) runs as one vmapped XLA computation instead of the
reference's Python objective loops.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..constraints import compiled
from ..constraints.input_reader import read_input
from ..models import primitive as prim_mod
from ..models.graph import (MotionStateGraph, NODE_TYPE_END, NODE_TYPE_SINGLE,
                            NODE_TYPE_STANDARD, NODE_TYPE_CYCLE_END)
from ..ops import align, timewarp
from ..utils.config import default_config
from . import action_builder, generator


@dataclasses.dataclass
class GraphWalkEntry:
    """One synthesis step (reference graph_walk.py:44-77)."""

    node_key: tuple
    parameters: np.ndarray
    arc_length: float
    start_frame: int
    end_frame: int
    error: float = 0.0
    step_constraints: object = None  # compiled.StepConstraints for global opt
    time_constraints: tuple = ()  # ((canonical_keyframe, desired_time_s), ...)
    # ((joint, position[3], canonical_keyframe, orientation_quat_or_None), ...)
    user_constraints: tuple = ()
    action_name: str = ""  # owning elementary action (place-orientation gate)


@dataclasses.dataclass
class MotionResult:
    frames: np.ndarray  # [T, D] quaternion frames (time-warped)
    steps: List[GraphWalkEntry]
    action_ranges: List[tuple]  # (action_name, start_frame, end_frame)
    stats: dict


class MotionGenerator:
    """reference motion_generator.py:41-147 facade."""

    def __init__(self, graph: MotionStateGraph, config: Optional[dict] = None,
                 seed: int = 0):
        self.graph = graph
        self.config = config or default_config()
        if self.config.get("verbose"):
            # reference passes verbose into every component for debug prints
            from ..utils.log import LOG_MODE_DEBUG, set_log_mode
            set_log_mode(LOG_MODE_DEBUG)
        self.key = jax.random.PRNGKey(seed)
        self._start_transform = None  # (q_y, delta) used to place step one
        self._objective_evaluations = 0  # reference graph_walk.py:390-394 stat
        self._step_times: List[float] = []  # per-step solve wall-clock
        # transition-model state (reference motion_primitive_generator.py:
        # 195-214 use_transition_model path keys on the previous step)
        self._prev_latent = None
        self._prev_node_key = None
        from .grounding import SceneInterface
        self.scene_interface = SceneInterface()

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ------------------------------------------------------------------
    def generate_motion(self, mg_input: dict, complete_motion_vector: bool = True,
                        activate_joint_mapping: bool = False,
                        activate_coordinate_transform: bool = False,
                        scale_factor: float = 1.0) -> MotionResult:
        t_start = time.time()
        self._step_times = []
        self._prev_latent = None  # fresh request: no transition context
        self._prev_node_key = None
        # CA "ik" mode spans: (ca trajectories, first step idx, end step
        # idx) per action, consumed by _post_process (reference
        # graph_walk.py:247-248: mode "ik" converts CA constraints to IK
        # trajectory constraints over the action's frame range)
        self._ca_ik_spans = []
        parsed = read_input(mg_input,
                            activate_coordinate_transform=activate_coordinate_transform,
                            activate_joint_mapping=activate_joint_mapping,
                            scale_factor=scale_factor,
                            control_point_filter_threshold=float(
                                self.config["trajectory_following_settings"]
                                .get("control_point_filter_threshold", 0)))
        action_sets = action_builder.build_action_constraints(
            self.graph, parsed, self.config)

        steps: List[GraphWalkEntry] = []
        frames: Optional[np.ndarray] = None
        action_step_spans = []  # (action, first step idx, last step idx + 1)
        prev_node_key = None
        for acs in action_sets:
            first_step = len(steps)
            frames, prev_node_key = self._generate_action(
                acs, frames, steps, prev_node_key)
            action_step_spans.append((acs.action_name, first_step, len(steps)))

        # final conversion with time warping (reference
        # graph_walk.py:112-176 convert_to_annotated_motion);
        # complete_motion_vector fills identity quats for skeleton joints a
        # step's model does not animate, per step with that step's own
        # animated subset (reference add_fixed_joint_parameters_to_motion in
        # _post_process_motion, motion_generator.py:281-320) — post-process
        # IK/grounding then runs on full-width frames.
        self._maybe_optimize_time(steps, action_step_spans)
        # _convert_with_time_warp remaps every step's start/end_frame onto
        # the WARPED buffer, so post-process IK/grounding and the exported
        # action ranges address the frames that actually exist (warped
        # lengths differ from the unwarped synthesis buffer's)
        warped = self._convert_with_time_warp(
            steps, complete_motion_vector=complete_motion_vector)
        action_ranges = [
            (name, steps[i0].start_frame if i1 > i0 else 0,
             steps[i1 - 1].end_frame + 1 if i1 > i0 else 0)
            for name, i0, i1 in action_step_spans]
        warped = self._post_process(warped, steps)

        stats = {
            "n_steps": len(steps),
            "time": time.time() - t_start,
            "average_error": float(np.mean([s.error for s in steps])) if steps else 0.0,
            "objective_evaluations": self._objective_evaluations,
            # BASELINE.md secondary metric: p50 graph-walk step latency
            "p50_step_latency": float(np.median(self._step_times)) if self._step_times else 0.0,
        }
        # reference logs the wall time + statistics after every request
        # (motion_generator.py:124-147, graph_walk.py:396-414)
        from ..utils.log import write_message_to_log
        write_message_to_log(
            "generated motion in {time:.3f}s: {n_steps} steps, "
            "avg constraint error {average_error:.3f}, "
            "{objective_evaluations} objective evaluations".format(**stats))
        return MotionResult(frames=warped, steps=steps,
                            action_ranges=action_ranges, stats=stats)

    # ------------------------------------------------------------------
    def _generate_action(self, acs, frames, steps, prev_node_key,
                         max_steps: int = 100):
        """reference motion_generator.py:157-199 per-action loop."""
        graph = self.graph
        travelled = 0.0
        first_idx = len(steps)  # this action's first step (CA extra pass)
        full_arc = acs.full_arc_length
        arc_of_end = self._end_step_arc_length(acs)

        node_key = self._best_start_node(acs, frames, prev_node_key)
        frames, travelled, err = self._generate_step(
            acs, node_key, frames, steps, travelled, is_last_step=False)
        node_type = graph.nodes[node_key].node_type

        n = 0
        while not self._is_end_state(node_type, acs, frames, travelled,
                                     arc_of_end, full_arc,
                                     len(steps)) and n < max_steps:
            next_key, next_type = self._best_transition_node(
                acs, node_key, frames, travelled, arc_of_end)
            if next_key is None:
                break  # keep node_key: the next action links from it
            node_key = next_key
            frames, travelled, err = self._generate_step(
                acs, node_key, frames, steps, travelled,
                is_last_step=(next_type == NODE_TYPE_END))
            node_type = graph.nodes[node_key].node_type
            n += 1
        frames = self._maybe_optimize_globally(steps, frames, acs)
        frames = self._maybe_optimize_ca_extra(steps, frames, acs, first_idx)
        if (self.config.get("collision_avoidance_constraints_mode",
                            "direct_connection") == "ik"
                and acs.ca_trajectories and len(steps) > first_idx):
            self._ca_ik_spans.append(
                (list(acs.ca_trajectories), first_idx, len(steps)))
        return frames, node_key

    def _maybe_optimize_ca_extra(self, steps, frames, acs, first_idx: int):
        """Post-hoc collision-avoidance re-optimization (reference
        graph_walk_optimizer.py:74-76,:156-189
        optimize_for_collision_avoidance_constraints): when the flag is set
        and the action carries CA trajectories, every step's latent is
        re-optimized against CA-ONLY residuals (trajectory-set slots) with
        each trajectory's min arc advanced from the REBUILT frames, then
        the motion buffer from this action's first step on is rebuilt."""
        if not self.config.get(
                "optimize_collision_avoidance_constraints_extra", False):
            return frames
        skel = self.graph.skeleton
        from ..models.skeleton import fk_positions
        from ..ops import spline_path
        ca = [t for t in acs.ca_trajectories
              if t.joint in skel.node_names][:compiled.MAX_TS_JOINTS]
        if not ca or first_idx >= len(steps):
            return frames
        joints = [t.joint for t in ca]
        trajs = [spline_path.build(t.control_points,
                                   max_points=compiled.spline_path_max_points(),
                                   unconstrained_dims=t.unconstrained_dims)
                 for t in ca]
        settings = self.config["local_optimization_settings"]
        window = self._smoothing_window()
        prefix = (frames[:steps[first_idx].start_frame]
                  if frames is not None else None)
        rebuilt = prefix if prefix is not None and len(prefix) else None
        for step in steps[first_idx:]:
            prim = self.graph.nodes[step.node_key].primitive
            sc = compiled.empty_step_constraints(skel,
                                                 prim.n_canonical_frames)
            if rebuilt is not None:
                # min arc from the rebuilt frames so far (reference
                # set_min_arc_length_from_previous_frames)
                pts = np.asarray(fk_positions(
                    skel, jnp.asarray(rebuilt[-1], jnp.float32)))
                arc0 = [float(jax.device_get(spline_path.closest_point(
                    sp, jnp.asarray(pts[skel.index_of(j)], jnp.float32))[1]))
                        for j, sp in zip(joints, trajs)]
                sc = compiled.set_alignment_from_prev(sc, rebuilt[-1])
            else:
                arc0 = [0.0] * len(joints)
                sc = compiled.set_alignment_from_start_pose(
                    sc, acs.start_pose_position, acs.start_pose_orientation_y)
            sc = compiled.set_trajectory_set_constraint(sc, skel, joints,
                                                        trajs, arc0=arc0)
            s_opt, _ = generator.refine_lm(
                skel, prim, sc, jnp.asarray(step.parameters, jnp.float32),
                n_iters=int(self.config.get("lm_iterations", 10)),
                error_scale=float(settings.get("error_scale_factor", 1.0)),
                quality_scale=float(settings.get("quality_scale_factor", 0.1)),
                use_traj=False, use_ca=False, use_ts=True)
            step.parameters = np.asarray(jax.device_get(s_opt))
            self._objective_evaluations += 2 * int(
                self.config.get("lm_iterations", 10))
            f, n, _ = prim_mod.back_project(
                prim, jnp.asarray(step.parameters),
                max_frames=_pad_frames(prim.n_canonical_frames),
                use_time=False)
            rebuilt = self._append_padded(rebuilt, f, int(n), window)
            step.start_frame = len(rebuilt) - int(n)
            step.end_frame = len(rebuilt) - 1
        return rebuilt

    def _is_end_state(self, node_type, acs, frames, travelled, arc_of_end,
                      full_arc, n_total_steps):
        """reference motion_generator_state.py:60-72 is_end_state: last
        node type, cycled action (one step, the next same-action instance
        continues the cycle), debug step cap, or path consumed."""
        if node_type in (NODE_TYPE_END, NODE_TYPE_SINGLE):
            return True
        if acs.cycled_next:
            return True
        debug_max_step = int(self.config.get("debug_max_step", -1))
        if debug_max_step > -1 and n_total_steps > debug_max_step:
            return True
        if acs.root_trajectory is not None and travelled >= full_arc:
            return True
        return False

    def _end_step_arc_length(self, acs) -> float:
        """Average step length of the action's end states (reference
        motion_generator.py get_end_step_arc_length)."""
        group = self.graph.node_groups[acs.action_name]
        lengths = [self.graph.nodes[(acs.action_name, s)].average_step_length
                   for s in group.end_states
                   if (acs.action_name, s) in self.graph.nodes]
        factor = self.config["trajectory_following_settings"]["end_step_length_factor"]
        return float(np.mean(lengths)) * factor if lengths else 0.0

    def _smoothing_window(self) -> int:
        """Seam-smoothing window; 0 when spatial_smoothing is off (reference
        smoothing_settings, graph_walk.py:96-101)."""
        ss = self.config["smoothing_settings"]
        if not ss.get("spatial_smoothing", True):
            return 0
        return int(ss["spatial_smoothing_window"])

    def _closest_point_refine_iters(self, acs) -> int:
        """Ternary-refinement budget from the closest-point search settings
        (reference parameterized_spline.py:54-69 accuracy/max_iterations)."""
        from ..ops import spline_path
        tf = self.config["trajectory_following_settings"]
        return spline_path.refine_iters_for_accuracy(
            acs.full_arc_length,
            accuracy=float(tf.get("closest_point_search_accuracy", 1e-3)),
            max_iterations=int(tf.get("closest_point_search_max_iterations",
                                      5000)),
            granularity=int(tf.get("arc_length_granularity",
                                   spline_path.GRANULARITY)))

    # -- planner -------------------------------------------------------
    def _best_start_node(self, acs, frames, prev_node_key):
        """reference graph_walk_planner.py:89-96."""
        group = self.graph.node_groups[acs.action_name]
        options = [(acs.action_name, s) for s in group.start_states
                   if (acs.action_name, s) in self.graph.nodes]
        if prev_node_key is not None:
            edges = self.graph.nodes[prev_node_key].outgoing_edges
            linked = [o for o in options if o in edges]
            if linked:
                options = linked
        if not options:
            options = list(group.node_keys)
        if len(options) == 1:
            return options[0]
        # start-node orientation scoring per constrain_start_orientation
        # (reference graph_walk_planner.py:56-59,:93)
        add_orientation = bool(self.config["trajectory_following_settings"]
                               .get("constrain_start_orientation", True))
        return self._select_best_option(acs, options, frames, travelled=0.0,
                                        add_orientation=add_orientation)

    def _best_transition_node(self, acs, prev_key, frames, travelled,
                              arc_of_end):
        """reference graph_walk_planner.py:97-154: transition type from the
        trajectory end condition, then option scoring."""
        graph = self.graph
        if acs.root_trajectory is not None:
            root_pos = frames[-1][:3]
            ended = acs.check_end_condition(
                root_pos, travelled, arc_of_end,
                acs.full_arc_length, acs.last_control_point)
            next_type = NODE_TYPE_END if ended else NODE_TYPE_STANDARD
        else:
            n_std = self.graph.nodes[prev_key].edges_of_type(NODE_TYPE_STANDARD)
            next_type = NODE_TYPE_STANDARD if n_std else NODE_TYPE_END
            if acs.cycled_next and next_type == NODE_TYPE_END:
                next_type = NODE_TYPE_CYCLE_END
        options = graph.nodes[prev_key].edges_of_type(next_type)
        if not options:
            # fall back to any transition type (reference resets planner)
            for t in (NODE_TYPE_STANDARD, NODE_TYPE_END):
                options = graph.nodes[prev_key].edges_of_type(t)
                if options:
                    next_type = t
                    break
        if not options:
            return None, None
        if len(options) == 1:
            return options[0], next_type
        # transition orientation scoring per constrain_transition_orientation
        # (reference graph_walk_planner.py:60-64,:121)
        add_orientation = bool(self.config["trajectory_following_settings"]
                               .get("constrain_transition_orientation", True))
        best = self._select_best_option(acs, options, frames, travelled,
                                        add_orientation=add_orientation)
        return best, next_type

    def _select_best_option(self, acs, options, frames, travelled,
                            add_orientation=False):
        """Score each option with best-of-K GMM samples (reference
        graph_walk_planner.py:184-226).  With a root trajectory the scoring
        constraints are the planner's OWN evaluation set — a unit-weight
        goal at travelled + look_ahead_distance plus the tangent direction
        when add_orientation is set (:156-188) — not the step constraints.
        Option errors are pulled in one transfer after all dispatches are
        queued."""
        k = int(self.config.get("planner_samples_per_option", 10))
        errs = []
        for option in options:
            prim = self.graph.nodes[option].primitive
            if acs.root_trajectory is not None:
                sc = action_builder.build_option_eval_constraints(
                    self.graph, acs, option, travelled, frames,
                    self.config, add_orientation)
                _, err = generator.best_of_n(self.graph.skeleton,
                                             self._next_key(), prim, sc,
                                             n_samples=k)
            else:
                sc = action_builder.build_step_constraints(
                    self.graph, acs, option, travelled,
                    frames, is_last_step=False, config=self.config)
                _, err = generator.best_of_n(self.graph.skeleton,
                                             self._next_key(), prim, sc,
                                             n_samples=k)
            errs.append(err)
            # option scoring evaluates k samples per option (reference
            # planner _evaluate_option; part of the evaluations stat)
            self._objective_evaluations += k
        # NaN-scoring options (degenerate samples) must never win the argmin
        errs = np.nan_to_num(np.asarray(jax.device_get(errs), np.float64),
                             nan=np.inf)
        return options[int(np.argmin(errs))]

    def _count_constrained_step_evals(self):
        """Objective-evaluation accounting for one constrained step
        (reference MotionPrimitiveConstraints.evaluations, SURVEY.md §5):
        the candidate pool, plus the LM's residual+probe evaluations ONLY
        when local optimization is actually enabled."""
        self._objective_evaluations += int(self.config.get("n_random_samples", 100))
        if self.config.get("local_optimization_mode", "all") != "none":
            self._objective_evaluations += 2 * int(self.config.get("lm_iterations", 10))

    # -- step ----------------------------------------------------------
    def _generate_step(self, acs, node_key, frames, steps, travelled,
                       is_last_step):
        """reference motion_generator.py:201-268."""
        t_step = time.time()
        graph = self.graph
        prim = graph.nodes[node_key].primitive
        # transition-model candidate pool: when enabled and the previous
        # node's edge carries a conditional-GMM model, candidates come from
        # the CONDITIONED mixture instead of the node's own (reference
        # motion_primitive_generator.py:195-198 / generate_random_sample
        # :209-214).  Lazy: the constrained branches draw the full pool,
        # the unconstrained branch draws exactly one (reference parity —
        # and 100x less sampling on the streaming path).
        tm_model = None
        if (self.config.get("use_transition_model")
                and self._prev_latent is not None
                and self._prev_node_key in graph.nodes
                and graph.nodes[self._prev_node_key].has_transition_model(
                    node_key)):
            tm_model = graph.nodes[self._prev_node_key].transition_models[
                node_key]

        def tm_candidates(n=None):
            from ..models import transition_model as tm
            if n is None:
                n = int(self.config.get("n_random_samples", 100))
            return tm.predict_parameters(
                self._next_key(), tm_model, jnp.asarray(self._prev_latent),
                n=n)

        use_traj = acs.root_trajectory is not None
        window = self._smoothing_window()
        max_frames = _pad_frames(prim.n_canonical_frames)
        if acs.root_trajectory is not None:
            # locomotion slots fill on device inside the selection kernel —
            # no goal-query host round-trip per step; selection + LM +
            # epilogue run as ONE dispatch pulled with ONE transfer (each
            # extra round-trip is ~30 ms p50 on remote-attached TPUs;
            # MG_FUSED_STEP=0 selects the split path, generator.use_fused_step)
            sc, loco, loco_flags = action_builder.build_step_constraints(
                graph, acs, node_key, travelled, frames, is_last_step,
                self.config, defer_locomotion=True)
            # travelled-arc update window + closest-point budget from the
            # trajectory-following settings (reference look_ahead_distance
            # at motion_generator.py:354-363; accuracy/max_iterations at
            # parameterized_spline.py:54-69)
            tf = self.config["trajectory_following_settings"]
            if not self.config.get("use_constraints", True):
                # use_constraints=False: every step is a plain GMM sample
                # (reference motion_primitive_generator.py:109); the
                # travelled arc still advances so trajectory actions end
                s = generator.sample_latent(self._next_key(), prim, 1)[0]
                new_frames, n_frames, new_arc = generator.finalize_step(
                    prim, s, sc, acs.root_trajectory, travelled,
                    max_frames=max_frames, window=window, use_traj=True,
                    look_ahead=jnp.float32(tf["look_ahead_distance"]),
                    n_refine=self._closest_point_refine_iters(acs))
                err = 0.0
            else:
                s, err, sc, new_frames, n_frames, new_arc = \
                    generator.generate_step(
                        self._next_key(), graph.skeleton, prim, sc,
                        self.config, travelled, max_frames, window,
                        path=acs.root_trajectory, loco=loco,
                        loco_flags=loco_flags,
                        cluster_tree=graph.nodes[node_key].cluster_tree,
                        candidates=(tm_candidates() if tm_model is not None
                                    else None),
                        look_ahead=jnp.float32(tf["look_ahead_distance"]),
                        n_refine=self._closest_point_refine_iters(acs))
                self._count_constrained_step_evals()
        else:
            sc = action_builder.build_step_constraints(
                graph, acs, node_key, travelled, frames, is_last_step,
                self.config)
            has_constraints = (float(np.asarray(sc.kf_active).sum())
                               + float(np.asarray(sc.dir_active))
                               + float(np.asarray(sc.traj_active))
                               + float(np.asarray(sc.ca_active).sum())
                               + float(np.asarray(sc.ts_active))
                               + float(np.asarray(sc.pose_active))) > 0
            has_constraints &= bool(self.config.get("use_constraints", True))
            if has_constraints:
                s, err, sc, new_frames, n_frames, new_arc = \
                    generator.generate_step(
                        self._next_key(), graph.skeleton, prim, sc,
                        self.config, travelled, max_frames, window,
                        cluster_tree=graph.nodes[node_key].cluster_tree,
                        candidates=(tm_candidates() if tm_model is not None
                                    else None))
                self._count_constrained_step_evals()
            elif tm_model is not None:
                # unconstrained step with a transition model: one predicted
                # sample (reference generate_random_sample :209-214)
                s = tm_candidates(n=1)[0]
                err = 0.0
                new_frames, n_frames, new_arc = generator.finalize_step(
                    prim, s, sc, sc.traj, travelled, max_frames=max_frames,
                    window=window, use_traj=False)
            else:
                s, new_frames, n_frames, new_arc = \
                    generator.unconstrained_step(
                        graph.skeleton, self._next_key(), prim, sc, sc.traj,
                        travelled, max_frames=max_frames, window=window)
                err = 0.0
        # ONE transfer for everything the host loop needs
        s_np, err, new_frames, n_frames, new_arc = jax.device_get(
            (s, err, new_frames, n_frames, new_arc))
        err = float(err)
        self._prev_latent = s_np
        self._prev_node_key = node_key
        new_frames = new_frames[: int(n_frames)]
        if use_traj:
            travelled = float(new_arc)

        start_frame = 0 if frames is None else len(frames)
        if frames is None or len(frames) == 0:
            # record the start placement for later re-projection passes
            self._start_transform = (jnp.asarray(sc.start_q),
                                     jnp.asarray(sc.start_delta))
            frames = new_frames
        else:
            frames = np.concatenate([frames, new_frames], axis=0)

        time_cs = []
        user_cs = []
        for kc in acs.keyframe_constraints.get(node_key[1], []):
            kf = action_builder._label_keyframe(graph, node_key,
                                                kc.keyframe_label,
                                                prim.n_canonical_frames)
            if kf is None:
                continue
            if kc.time is not None:
                time_cs.append((int(kf), float(kc.time)))
            if kc.joint in graph.skeleton.node_names and not np.all(np.isnan(kc.position)):
                quat_wxyz = None
                if not np.any(np.isnan(kc.orientation)):
                    from ..models.skeleton import _np_from_euler
                    quat_wxyz = tuple(
                        np.asarray(_np_from_euler(kc.orientation, "rxyz"),
                                   np.float64))
                user_cs.append((kc.joint, tuple(np.asarray(kc.position, np.float64)),
                                int(kf), quat_wxyz))
        steps.append(GraphWalkEntry(node_key=node_key, parameters=s_np,
                                    arc_length=travelled,
                                    start_frame=start_frame,
                                    end_frame=len(frames) - 1, error=err,
                                    step_constraints=sc,
                                    time_constraints=tuple(time_cs),
                                    user_constraints=tuple(user_cs),
                                    action_name=acs.action_name))
        self._step_times.append(time.time() - t_step)
        return frames, travelled, err

    def _maybe_optimize_globally(self, steps, frames, acs=None):
        """Windowed multi-step spatial refinement after an action
        (reference graph_walk_optimizer.py:60-118)."""
        cfg = self.config
        mode = cfg.get("global_spatial_optimization_mode", "none")
        if mode == "none":
            return frames
        # reference _is_optimization_required (graph_walk_optimizer.py:56-58):
        # mode 'all' optimizes only actions carrying USER constraints;
        # 'two_hands' only two-hand pick/place actions
        if acs is not None:
            if mode == "all" and not acs.contains_user_constraints:
                return frames
            if mode == "two_hands" and not acs.contains_two_hands_constraints:
                return frames
            if mode == "trajectory_end" and acs.root_trajectory is None:
                # reference END_POINT branch requires a root trajectory
                return frames
        settings = cfg["global_spatial_optimization_settings"]
        window = [s for s in steps if s.step_constraints is not None][-int(settings["max_steps"]):]
        if len(window) < 2:
            return frames
        avg_err = float(np.mean([s.error for s in window]))
        if avg_err < float(settings.get("start_error_threshold", 0.0)):
            return frames
        from . import global_opt
        prims = [self.graph.nodes[s.node_key].primitive for s in window]
        scs = global_opt.adapt_constraint_weights(
            [s.step_constraints for s in window], mode,
            float(settings.get("position_weight", 1000.0)),
            float(settings.get("orientation_weight", 1000.0)))
        params = [s.parameters for s in window]
        new_params, final_err = global_opt.optimize_spatial_over_steps(
            self.graph.skeleton, prims, scs, params,
            quality_scale=float(settings.get("quality_scale_factor", 100.0)) * 1e-6)
        for s, p in zip(window, new_params):
            s.parameters = p
        return self._rebuild_frames(steps)

    def _rebuild_frames(self, steps):
        """Re-assemble the motion buffer from (possibly updated) step
        parameters (reference re-projects after update_spatial_parameters,
        graph_walk.py:190-219)."""
        frames = None
        window = self._smoothing_window()
        for step in steps:
            prim = self.graph.nodes[step.node_key].primitive
            f, n, _ = prim_mod.back_project(
                prim, jnp.asarray(step.parameters),
                max_frames=_pad_frames(prim.n_canonical_frames),
                use_time=False)
            frames = self._append_padded(frames, f, int(n), window)
            step.start_frame = len(frames) - int(n)
            step.end_frame = len(frames) - 1
        return frames

    def _append_padded(self, frames, f, n: int, window: int):
        """Align a PADDED clip [M, D] (static shape -> one compile per
        primitive instead of one per dynamic clip length) and append its
        first n rows.

        spatial_smoothing_method="blending" replaces the one-sided offset
        decay with the two-sided centered seam ramp (align.blend_seam_np;
        reference graph_walk.py:97-100 routes the method name into the
        motion vector).  apply_foot_alignment adds an XZ correction so the
        mean foot position matches across the seam (reference
        smoothing_settings key, consumed in anim_utils concatenation)."""
        ss = self.config["smoothing_settings"]
        if frames is None:
            if self._start_transform is not None:
                f = align.transform_frames(jnp.asarray(f),
                                           *self._start_transform)
            return np.asarray(f)[:n]
        method = ss.get("spatial_smoothing_method", "smoothing")
        # "blending" aligns without the offset decay, then ramps the seam
        aligned = np.asarray(align.align_clip(
            jnp.asarray(frames[-1], jnp.float32), jnp.asarray(f, jnp.float32),
            0 if method == "blending" else window))[:n]
        if ss.get("apply_foot_alignment", False):
            aligned = self._foot_align(frames[-1], aligned)
        if method == "blending" and window > 0:
            frames, aligned = align.blend_seam_np(frames, aligned, window)
        return np.concatenate([frames, aligned], axis=0)

    def _foot_align(self, prev_last, aligned):
        """Shift the new clip in XZ so its first-frame mean foot position
        matches the previous frame's (seam foot-sliding correction)."""
        from ..models import skeleton as sk
        from .grounding import LEFT_FOOT, RIGHT_FOOT
        skel = self.graph.skeleton
        if skel is None:
            return aligned
        feet = [j for j in (LEFT_FOOT, RIGHT_FOOT) if j in skel.node_names]
        if not feet or prev_last.shape[-1] != skel.n_frame_params \
                or aligned.shape[-1] != skel.n_frame_params:
            return aligned
        idx = [skel.index_of(j) for j in feet]
        pts = np.asarray(sk.fk_positions(
            skel, jnp.asarray(np.stack([prev_last, aligned[0]]),
                              jnp.float32)))
        delta = (pts[0][idx].mean(axis=0) - pts[1][idx].mean(axis=0))
        aligned = aligned.copy()
        aligned[:, 0] += delta[0]
        aligned[:, 2] += delta[2]
        return aligned

    def _maybe_optimize_time(self, steps, action_spans=None):
        """Global time optimization over steps carrying desired_time
        keyframe constraints (reference optimize_time_parameters_over_graph_walk,
        graph_walk_optimizer.py:132-154).

        Per reference semantics the optimization runs once PER ACTION over a
        window of the last `optimized_actions` actions (default 2) — steps
        before the window contribute only a fixed warped-frame offset
        (time_constraints.py:34-41), and later windows see earlier windows'
        optimized gammas."""
        if not self.config.get("use_global_time_optimization", True):
            return
        if not any(s.time_constraints for s in steps):
            return
        from . import global_opt
        skel = self.graph.skeleton
        frame_time = skel.frame_time if skel is not None else 1.0 / 30
        settings = self.config["global_time_optimization_settings"]
        n_actions = max(int(settings.get("optimized_actions", 2)), 1)
        spans = action_spans or [("", 0, len(steps))]

        def warped_len(step) -> float:
            prim = self.graph.nodes[step.node_key].primitive
            gamma = jnp.asarray(step.parameters[prim.n_spatial:], jnp.float32)
            t_can = timewarp.canonical_time_function(
                prim.mean_t_d, prim.eigen_t_d, gamma)
            return float(t_can[-2] + 2.0)  # matches the residual's lengths

        for idx, span in enumerate(spans):
            lo = spans[max(idx - (n_actions - 1), 0)][1]
            hi = span[2]
            window = steps[lo:hi]
            constrained = []
            for i, s in enumerate(window):
                for (kf, t) in s.time_constraints:
                    constrained.append((i, kf, t))
            if not constrained:
                continue
            start_frames = float(sum(warped_len(s) for s in steps[:lo]))
            prims = [self.graph.nodes[s.node_key].primitive for s in window]
            params = [s.parameters for s in window]
            new_params = global_opt.optimize_time_over_steps(
                prims, params, constrained, frame_time,
                quality_scale=float(settings.get("quality_scale_factor", 1e-4)),
                start_frames=start_frames)
            for s, p in zip(window, new_params):
                s.parameters = p

    def _post_process(self, frames, steps):
        """IK edits for user keyframe constraints + motion grounding
        (reference motion_generator.py:281-352 _post_process_motion)."""
        if frames is None or len(frames) == 0:
            return frames
        from . import postprocess
        ik_settings = self.config.get("inverse_kinematics_settings", {})
        constraint_specs = {}
        for i, step in enumerate(steps):
            if step.user_constraints:
                constraint_specs[i] = [
                    (joint, np.asarray(pos), kf,
                     None if ori is None else np.asarray(ori))
                    for joint, pos, kf, ori in step.user_constraints]
        ik_constraints = postprocess.create_ik_constraints(
            self.graph, steps, constraint_specs,
            constrain_place_orientation=bool(
                ik_settings.get("constrain_place_orientation", False))
        ) if constraint_specs else []
        # CA "ik" mode (reference graph_walk.py:247-248): each action's CA
        # trajectories become IK trajectory constraints over the action's
        # OUTPUT frame range (steps carry post-warp start/end_frame here)
        ik_trajectories = []
        skel = self.graph.skeleton
        from ..ops import spline_path
        for trajs, i0, i1 in getattr(self, "_ca_ik_spans", []):
            if i0 >= len(steps) or i1 <= i0:
                continue
            sf = steps[i0].start_frame
            ef = steps[min(i1, len(steps)) - 1].end_frame
            for t in trajs:
                if t.joint not in skel.node_names:
                    continue
                sp = spline_path.build(
                    t.control_points,
                    max_points=compiled.spline_path_max_points(),
                    unconstrained_dims=t.unconstrained_dims)
                ik_trajectories.append(postprocess.IKTrajectoryConstraint(
                    joint=t.joint, spline=sp, start_frame=sf, end_frame=ef,
                    fixed_range=False,
                    unconstrained_dims=tuple(t.unconstrained_dims)))
        return postprocess.post_process_motion(
            self.graph.skeleton, frames, steps, ik_constraints, self.config,
            scene=self.scene_interface, ik_trajectories=ik_trajectories)

    # -- final conversion ----------------------------------------------
    def _convert_with_time_warp(self, steps,
                                complete_motion_vector: bool = False) -> np.ndarray:
        """Re-project every step WITH its time warp and re-concatenate
        (reference graph_walk.py:154-176).  With complete_motion_vector,
        each step's clip is expanded to the full skeleton using that step's
        own animated-joint subset before concatenation."""
        from ..models.skeleton import add_fixed_joint_parameters_to_motion
        skel = self.graph.skeleton
        frames = None
        ss = self.config["smoothing_settings"]
        # reference smoothing_settings.time_smoothing(+_window); the legacy
        # top-level smooth_time_parameters key is honored as a fallback
        smooth_time = bool(ss.get("time_smoothing", False)
                           or self.config.get("smooth_time_parameters", False))
        time_window = int(ss.get("time_smoothing_window", 15))
        # activate_time_variation=False exports at canonical time (reference
        # graph_walk.py:103 use_time_parameters)
        use_time = bool(self.config.get("activate_time_variation", True))
        window = self._smoothing_window()
        for step in steps:
            prim = self.graph.nodes[step.node_key].primitive
            max_frames = _pad_frames(prim.n_canonical_frames * 2)
            f, n, t_fn = prim_mod.back_project(
                prim, jnp.asarray(step.parameters),
                max_frames=max_frames, use_time=use_time)
            n = int(n)
            if use_time and smooth_time and prim.has_time:
                # reference motion_primitive.py:284-285: savgol-filter the
                # sampled time function, then evaluate the spatial spline at
                # the smoothed times.  Padded to the static max_frames (tail
                # repeats the last time) so the eval + align shapes stay
                # constant across steps.
                t_s = timewarp.smooth_time_function_np(np.asarray(t_fn)[:n],
                                                       window=time_window)
                t_pad = np.concatenate(
                    [t_s, np.full(max_frames - n, t_s[-1], t_s.dtype)])
                f = prim_mod.evaluate_at(prim, jnp.asarray(step.parameters),
                                         jnp.asarray(t_pad, jnp.float32))
            if (complete_motion_vector and skel is not None
                    and np.shape(f)[-1] < skel.n_frame_params):
                f = add_fixed_joint_parameters_to_motion(
                    skel, np.asarray(f), prim.animated_joints or None)
            frames = self._append_padded(frames, f, n, window)
            # remap the step onto the warped buffer (consumed by IK,
            # grounding, and the action-range export)
            step.start_frame = len(frames) - n
            step.end_frame = len(frames) - 1
        if frames is None:
            return np.zeros((0, 0), np.float32)
        root_window = int(ss.get("root_filter_window", 0))
        if root_window > 1:
            frames = align.filter_root_np(frames, root_window)
        return frames


def _pad_frames(n: int, multiple: int = 32) -> int:
    """Round up to a multiple to bound the number of jit recompiles."""
    return ((n + multiple - 1) // multiple) * multiple


