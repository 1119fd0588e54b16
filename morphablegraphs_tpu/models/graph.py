"""Motion state graph: nodes, transitions, meta info, loaders, stacked tables.

Host side replaces the reference's `MotionStateGraph{,Node,Group}` +
`MotionStateGraphLoader` + `ZipReader` (reference
motion_model/motion_state_graph*.py, utilities/zip_io.py:36-246).

Device side (`StackedGraph`) is the TPU-native redesign (SURVEY.md §7):
all primitives padded/stacked into one pytree with integer transition
tables, so a graph walk becomes `lax.scan` over step indices and a crowd
of characters vmaps over the leading axis.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
import zipfile
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from . import primitive as prim_mod
from .primitive import MotionPrimitive, load_primitive_json
from .skeleton import Skeleton, load_bvh

# Node types (reference motion_model/__init__.py)
NODE_TYPE_START = "start"
NODE_TYPE_STANDARD = "standard"
NODE_TYPE_END = "end"
NODE_TYPE_SINGLE = "single_primitive"
NODE_TYPE_CYCLE_END = "cycle_end"
NODE_TYPE_IDLE = "idle"

NODE_TYPES = (NODE_TYPE_START, NODE_TYPE_STANDARD, NODE_TYPE_END,
              NODE_TYPE_SINGLE, NODE_TYPE_CYCLE_END, NODE_TYPE_IDLE)
NODE_TYPE_IDS = {t: i for i, t in enumerate(NODE_TYPES)}


@dataclasses.dataclass
class GraphNode:
    """One motion primitive + its outgoing transitions
    (reference motion_state_graph_node.py:45-120)."""

    key: Tuple[str, str]
    primitive: MotionPrimitive
    node_type: str = NODE_TYPE_STANDARD
    outgoing_edges: Dict[Tuple[str, str], str] = dataclasses.field(default_factory=dict)
    average_step_length: float = 0.0
    n_standard_transitions: int = 0
    cluster_tree: Optional[object] = None
    # per-edge conditional-GMM transition models (the reference's GPM slot,
    # motion_state_graph_node.py:232-271; see models/transition_model.py)
    transition_models: Dict[Tuple[str, str], object] = dataclasses.field(
        default_factory=dict)

    @property
    def action_name(self) -> str:
        return self.key[0]

    @property
    def name(self) -> str:
        return self.key[1]

    def edges_of_type(self, transition_type: str) -> List[Tuple[str, str]]:
        return [k for k, t in self.outgoing_edges.items() if t == transition_type]

    def has_transition_model(self, to_key) -> bool:
        """reference motion_state_graph_node.py:232-233."""
        return to_key in self.transition_models

    def predict_gmm(self, to_key, current_parameters):
        """Conditioned mixture over the next node's latent; without a model
        on the edge, falls back to THIS node's unconditional mixture exactly
        like the reference (motion_state_graph_node.py:269-271 returns
        `self.get_gaussian_mixture_model()`)."""
        from . import transition_model as tm
        if to_key in self.transition_models:
            return tm.predict(self.transition_models[to_key],
                              current_parameters)
        return self.primitive.gmm


@dataclasses.dataclass
class NodeGroup:
    """Per-action container + meta info (reference motion_state_group.py:36,
    action_meta_info.py:36)."""

    name: str
    node_keys: List[Tuple[str, str]] = dataclasses.field(default_factory=list)
    start_states: List[str] = dataclasses.field(default_factory=list)
    end_states: List[str] = dataclasses.field(default_factory=list)
    idle_states: List[str] = dataclasses.field(default_factory=list)
    cycle_states: List[str] = dataclasses.field(default_factory=list)
    labeled_frames: Dict[str, dict] = dataclasses.field(default_factory=dict)
    label_to_motion_primitive_map: Dict[str, list] = dataclasses.field(default_factory=dict)
    meta_information: dict = dataclasses.field(default_factory=dict)

    def map_label_to_keyframe(self, mp_name: str, label: str,
                              n_canonical_frames: int) -> Optional[int]:
        """reference motion_state_group.py:219-231 (incl. 'lastFrame'/-1/'middle')."""
        if mp_name in self.labeled_frames and label in self.labeled_frames[mp_name]:
            keyframe = self.labeled_frames[mp_name][label]
            if keyframe in (-1, "lastFrame"):
                keyframe = n_canonical_frames - 1
            elif keyframe == "middle":
                keyframe = n_canonical_frames / 2
            return int(keyframe)
        return None


class MotionStateGraph:
    """Host-side graph of motion primitives (reference motion_state_graph.py:35)."""

    def __init__(self):
        self.nodes: Dict[Tuple[str, str], GraphNode] = {}
        self.node_groups: Dict[str, NodeGroup] = {}
        self.skeleton: Optional[Skeleton] = None
        self.start_node: Optional[Tuple[str, str]] = None
        self.action_definitions: dict = {}
        self.animated_joints: tuple = ()
        # optional zip sections (reference motion_state_graph_loader.py:219
        # hand_pose_generator + mg_state_planner PFNN weights)
        self.hand_pose_generator = None
        self.pfnn_data: Optional[dict] = None

    # -- transitions ------------------------------------------------------

    def add_transition(self, from_key, to_key):
        """reference motion_state_graph_loader.py:255-281 transition typing."""
        self.nodes[from_key].outgoing_edges[to_key] = self._transition_type(from_key, to_key)

    def _transition_type(self, from_key, to_key) -> str:
        t_type = "action_transition"
        if to_key[0] == from_key[0]:
            from_type = self.nodes[from_key].node_type
            to_type = self.nodes[to_key].node_type
            if from_type == NODE_TYPE_IDLE:
                if to_type in (NODE_TYPE_START, NODE_TYPE_IDLE, NODE_TYPE_END):
                    t_type = to_type
            else:
                if to_type in (NODE_TYPE_STANDARD, NODE_TYPE_START,
                               NODE_TYPE_CYCLE_END, NODE_TYPE_IDLE):
                    t_type = to_type
                else:
                    t_type = NODE_TYPE_END
        return t_type

    # -- random walk helpers (reference motion_state_graph.py:52-139) -----

    def get_random_start_node(self, rng: random.Random, action: str):
        group = self.node_groups[action]
        if group.start_states:
            return (action, rng.choice(group.start_states))
        return None

    def random_transition(self, rng: random.Random, node_key, transition_type):
        edges = self.nodes[node_key].edges_of_type(transition_type)
        if edges:
            return edges[rng.randrange(len(edges))]
        return None

    def generate_random_walk(self, key: jax.Array, action: str,
                             number_of_steps: int,
                             rng: Optional[random.Random] = None):
        """Host-level random walk: start state, N standard transitions, one
        end transition; returns [{node_key, parameters}] (reference
        motion_state_graph.py:52-91 + motion_state_group.py:177-215).

        The returned entries are consumable by
        synthesis.graph_walk_io.steps_from_json / rebuild_frames_from_steps.
        For the fully-jitted equivalent use synthesis.walk.random_walk_segments.
        """
        rng = rng or random.Random(0)
        current = self.get_random_start_node(rng, action)
        if current is None:
            current = self.node_groups[action].node_keys[0]
        walk = []
        # entries: start + number_of_steps standard targets + one end target
        for i in range(number_of_steps + 2):
            key, sub = jax.random.split(key)
            params = np.asarray(prim_mod.sample_latent(
                sub, self.nodes[current].primitive, 1)[0])
            walk.append({"node_key": current, "parameters": params})
            if i > number_of_steps:
                break
            t_type = (NODE_TYPE_STANDARD if i < number_of_steps
                      else NODE_TYPE_END)
            nxt = self.random_transition(rng, current, t_type)
            if nxt is None and t_type == NODE_TYPE_STANDARD:
                nxt = self.random_transition(rng, current, NODE_TYPE_END)
            if nxt is None:
                break
            current = nxt
        return walk

    # -- stats ------------------------------------------------------------

    def update_motion_stats(self, key: jax.Array, n_samples: int = 5,
                            method: str = "median", only_missing: bool = True):
        """Median root-path arc length over sampled motions
        (reference motion_state_graph_node.py:183-231), computed with one
        vmapped back-projection per node instead of per-sample Python.

        only_missing keeps packaged/trained stats authoritative — only
        nodes that loaded without an average_step_length are sampled."""
        for node in self.nodes.values():
            node.n_standard_transitions = len(node.edges_of_type(NODE_TYPE_STANDARD))
            if only_missing and node.average_step_length != 0.0:
                continue
            key, sub = jax.random.split(key)
            lengths = np.asarray(_sample_step_lengths(sub, node.primitive, n_samples))
            node.average_step_length = float(
                np.median(lengths) if method == "median" else np.mean(lengths))

    # -- meta info ---------------------------------------------------------

    def apply_meta_information(self, action: str, info: Optional[dict]):
        """reference action_meta_info.py:51-76 + motion_state_group.py:46-61."""
        group = self.node_groups[action]
        if info:
            group.meta_information = info
            group.start_states = list(info.get("start_states", []))
            group.end_states = list(info.get("end_states", []))
            group.idle_states = list(info.get("idle_states", []))
            group.cycle_states = list(info.get("cycle_states", []))
            if "annotations" in info:
                # merge with the keyframes already collected from the model
                # files (replacing would orphan their label-map entries)
                for mp, ann in info["annotations"].items():
                    if isinstance(ann, dict):
                        group.labeled_frames.setdefault(mp, {}).update(ann)
                    else:
                        group.labeled_frames[mp] = ann
            for mp, annotations in group.labeled_frames.items():
                if mp == "all_primitives":
                    continue
                for label in annotations:
                    mps = group.label_to_motion_primitive_map.setdefault(label, [])
                    if mp not in mps:
                        mps.append(mp)
        if len(group.node_keys) == 1:
            self.nodes[group.node_keys[0]].node_type = NODE_TYPE_SINGLE
        else:
            for k in group.start_states:
                self.nodes[(action, k)].node_type = NODE_TYPE_START
            for k in group.end_states:
                self.nodes[(action, k)].node_type = NODE_TYPE_END
            for k in group.cycle_states:
                self.nodes[(action, k)].node_type = NODE_TYPE_CYCLE_END
            for k in group.idle_states:
                self.nodes[(action, k)].node_type = NODE_TYPE_IDLE

        # stats from meta info (reference motion_state_group.py:74-106)
        stats = (group.meta_information or {}).get("stats", {})
        for mp_name, s in stats.items():
            nk = (action, mp_name)
            if nk in self.nodes:
                self.nodes[nk].average_step_length = s.get("average_step_length", 0.0)
                self.nodes[nk].n_standard_transitions = s.get("n_standard_transitions", 0)


def _sample_step_lengths(key: jax.Array, prim: MotionPrimitive, n: int) -> jax.Array:
    lat = prim_mod.sample_latent(key, prim, n)
    frames = jax.vmap(
        lambda s: prim_mod.back_project(prim, s, prim.n_canonical_frames,
                                        use_time=False)[0])(lat)
    root = frames[..., :3]
    seg = jnp.linalg.norm(root[:, 1:] - root[:, :-1], axis=-1)
    return jnp.sum(seg, axis=-1)


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------

def build_graph_from_dict(graph_dict: dict, skeleton: Optional[Skeleton] = None,
                          stats_key: Optional[jax.Array] = None) -> MotionStateGraph:
    """Build a graph from the in-memory dict form produced by the zip reader
    or synthesized in tests:

    {
      "subgraphs": {action: {"name", "info": meta_info,
                             "nodes": {mp_name: {"name", "mm": model_json,
                                                  "stats": ..., ...}}}},
      "transitions": {"action_mp" or "action:mp": [to keys...]},
      "startNode": [action, mp], "actionDefinitions": {...},
    }
    (reference motion_state_graph_loader.py:184-307)
    """
    from ..utils.log import LOG_MODE_DEBUG, write_message_to_log
    graph = MotionStateGraph()
    graph.skeleton = skeleton
    for action, action_data in graph_dict.get("subgraphs", {}).items():
        # reference zip_io.py logs "Load action <name>" per action
        write_message_to_log(f"Load action {action} "
                             f"({len(action_data.get('nodes', {}))} primitives)",
                             LOG_MODE_DEBUG)
        group = NodeGroup(name=action)
        graph.node_groups[action] = group
        for mp_name, desc in action_data.get("nodes", {}).items():
            key = (action, mp_name)
            prim = load_primitive_json(desc["mm"], name=f"{action}_{mp_name}")
            graph.nodes[key] = GraphNode(key=key, primitive=prim)
            group.node_keys.append(key)
            st = desc.get("stats")
            if st:  # packaged <mp>.stats files (reference zip_io _add_stats)
                graph.nodes[key].average_step_length = float(
                    st.get("average_step_length", 0.0))
                graph.nodes[key].n_standard_transitions = int(
                    st.get("n_standard_transitions", 0))
            if "space_partition_json" in desc:
                from ..construct.space_partitioning import (
                    ClusterTree, load_reference_feature_tree_json)
                tj = desc["space_partition_json"]
                if "data" in tj:  # reference FeatureClusterTree layout
                    graph.nodes[key].cluster_tree = \
                        load_reference_feature_tree_json(tj)
                else:  # native ClusterTree.save meta + .data sidecar
                    sidecar = desc.get("space_partition_data")
                    if sidecar is None:
                        raise ValueError(
                            f"cluster tree for node {key} has no 'data' key "
                            "(reference FeatureClusterTree layout) and no "
                            "'.data' sidecar next to its "
                            "'*_cluster_tree.json' in the zip — the native "
                            "ClusterTree.save layout needs both files")
                    graph.nodes[key].cluster_tree = ClusterTree.from_native_json(
                        tj, sidecar)
            elif "space_partition_pickle" in desc:
                # legacy pickled trees (formatVersion < 4 / usePickle
                # packages, reference zip_io.py:210-223)
                from ..construct.space_partitioning import load_reference_pickle_tree
                graph.nodes[key].cluster_tree = load_reference_pickle_tree(
                    desc["space_partition_pickle"])
            # keyframes from model files feed the label maps
            # (reference motion_state_graph_loader.py:292-305)
            kf = desc["mm"].get("keyframes", {})
            if kf:
                group.labeled_frames.setdefault(mp_name, {}).update(kf)
                for label in kf:
                    group.label_to_motion_primitive_map.setdefault(label, []).append(mp_name)
        graph.apply_meta_information(action, action_data.get("info"))
        if action == "walk" and group.idle_states:
            graph.start_node = (action, group.idle_states[0])

    transitions = graph_dict.get("transitions", {})
    if transitions:
        split_key = ":" if ":" in next(iter(transitions)) else "_"
        for from_str, to_list in transitions.items():
            from_key = _resolve_node_key(from_str, split_key, graph.nodes)
            if from_key is None:
                continue
            for to_str in to_list:
                to_key = _resolve_node_key(to_str, split_key, graph.nodes)
                if to_key is not None:
                    graph.add_transition(from_key, to_key)

    # per-edge transition models: entries carry their own from/to keys
    # (reference GPM slot, motion_state_graph_node.py:232-271)
    for entry in graph_dict.get("transition_models", []):
        from . import transition_model as tm_mod
        split_key = ":" if ":" in entry["from"] else "_"
        from_key = _resolve_node_key(entry["from"], split_key, graph.nodes)
        to_key = _resolve_node_key(entry["to"], split_key, graph.nodes)
        if from_key is None or to_key is None:
            from ..utils.log import write_message_to_log
            write_message_to_log(
                f"skipping transition model {entry['from']} -> "
                f"{entry['to']}: unknown node")
            continue
        graph.nodes[from_key].transition_models[to_key] = tm_mod.from_json(
            entry["model"])

    if stats_key is None:
        stats_key = jax.random.PRNGKey(1234)
    # only recompute for nodes whose meta info carried no stats
    needs_stats = [n for n in graph.nodes.values() if n.average_step_length == 0.0]
    if needs_stats:
        graph.update_motion_stats(stats_key)

    if "actionDefinitions" in graph_dict:
        graph.action_definitions = graph_dict["actionDefinitions"]
    if "startNode" in graph_dict:
        graph.start_node = tuple(graph_dict["startNode"])
    if "hand_pose_info" in graph_dict:
        # reference motion_state_graph_loader.py:219-221
        from ..synthesis.hand_pose import HandPoseGenerator
        graph.hand_pose_generator = HandPoseGenerator(graph.skeleton)
        graph.hand_pose_generator.init_from_desc(graph_dict["hand_pose_info"])
    if "pfnn_data" in graph_dict:
        graph.pfnn_data = graph_dict["pfnn_data"]
    return graph


def _resolve_node_key(s: str, split_key: str, nodes: dict):
    """"<action><sep><primitive>" -> a known (action, primitive) key.
    Action/primitive names may contain the separator themselves, so try
    every split position against the node table."""
    pieces = s.split(split_key)
    for i in range(1, len(pieces)):
        key = (split_key.join(pieces[:i]), split_key.join(pieces[i:]))
        if key in nodes:
            return key
    return None


def read_zip(zip_path: str) -> dict:
    """Read a packaged graph zip into the dict form (reference
    utilities/zip_io.py:51-246, format versions 1-4, sans pickle trees)."""
    with zipfile.ZipFile(zip_path, "r") as zf:
        return _read_zip_open(zf)


def _read_zip_open(zf: zipfile.ZipFile) -> dict:
    data = json.loads(zf.read("graph_definition.json").decode("utf-8"))
    version = float(data.get("formatVersion", 1.0))
    names = set(zf.namelist())

    ea_dir = "elementary_action_models"
    ea_prefix = "elementary_action_"
    actions: Dict[str, dict] = {}
    for name in sorted(names):
        parts = name.split("/")
        if version >= 2.0:
            if len(parts) > 2 and parts[0] == ea_dir and parts[2].endswith("mm.json"):
                action_dir, fname = parts[1], parts[2]
            else:
                continue
        else:
            if len(parts) > 1 and parts[1].endswith("mm.json"):
                action_dir, fname = parts[0], parts[1]
            else:
                continue
        # directory name: elementary_action_<name>; action names may
        # themselves contain underscores, so strip the PREFIX, never split
        action_key = (action_dir[len(ea_prefix):]
                      if action_dir.startswith(ea_prefix) else action_dir)
        entry = actions.setdefault(action_key, {"name": action_key, "nodes": {}})
        mp_full = fname[: -len("_mm.json")]  # <action>_<primitive>
        mp_key = (mp_full[len(action_key) + 1:]
                  if mp_full.startswith(action_key + "_")
                  else mp_full[len(mp_full.split("_")[0]) + 1:])
        prefix = (f"{ea_dir}/{action_dir}" if version >= 2.0 else action_dir)
        mm = json.loads(zf.read(name).decode("utf-8"))
        node = {"name": mp_full, "mm": mm}
        stats_path = f"{prefix}/{mp_full}.stats"
        if stats_path in names:
            node["stats"] = json.loads(zf.read(stats_path).decode("utf-8"))
        tree_path = f"{prefix}/{mp_full}_cluster_tree.json"
        data_path = f"{prefix}/{mp_full}_cluster_tree.data"
        pck_path = f"{prefix}/{mp_full}_cluster_tree.pck"
        if tree_path in names:
            node["space_partition_json"] = json.loads(zf.read(tree_path).decode("utf-8"))
            if data_path in names:
                # native ClusterTree.save layout: JSON meta + raw f32
                # sidecar (the mg-tpu cluster-trees CLI output)
                node["space_partition_data"] = zf.read(data_path)
        elif pck_path in names:
            # legacy pickled tree (formatVersion < 4 / usePickle packages,
            # reference zip_io.py:210-223); decoded lazily by the graph
            # builder's restricted unpickler
            node["space_partition_pickle"] = zf.read(pck_path)
        entry["nodes"][mp_key] = node
        meta_path = f"{prefix}/meta_information.json"
        if meta_path in names and "info" not in entry:
            entry["info"] = json.loads(zf.read(meta_path).decode("utf-8"))

    data["subgraphs"] = actions
    # read whatever skeleton the package carries, regardless of version
    # (the reference gates on version, but v3+ packages shipping
    # skeleton.bvh exist and a None skeleton crashes every consumer)
    if "skeleton.bvh" in names:
        data["bvh_skeleton_string"] = zf.read("skeleton.bvh").decode("utf-8")
    if "skeleton.json" in names:
        data["skeleton"] = json.loads(zf.read("skeleton.json").decode("utf-8"))

    # optional hand-pose section (reference zip_io.py:152-166
    # _read_hand_pose_data: info JSON + example skeleton BVHs)
    if "hand_poses/hand_pose_info.json" in names:
        info = json.loads(zf.read("hand_poses/hand_pose_info.json").decode("utf-8"))
        info["skeletonStrings"] = {}
        for n in names:
            parts = n.split("/")
            if len(parts) > 1 and parts[0] == "hand_poses" and n.endswith(".bvh"):
                info["skeletonStrings"][parts[1][:-4]] = zf.read(n).decode("utf-8")
        data["hand_pose_info"] = info

    # optional transition-model section (the reference's transition_models/
    # directory, zip_io.py:40 TRANSITION_MODEL_DIRECTORY — its .GPM blobs
    # are pickled gaussian processes from an unshipped package and cannot
    # be parsed; our conditional-GMM JSONs carry their own from/to keys)
    tm_entries = []
    for n in sorted(names):
        if n.startswith("transition_models/") and n.endswith(".json"):
            tm_entries.append(json.loads(zf.read(n).decode("utf-8")))
        elif n.startswith("transition_models/") and n.endswith(".GPM"):
            from ..utils.log import write_message_to_log
            write_message_to_log(
                f"skipping {n}: reference .GPM transition models are "
                "pickled objects of an unshipped package (the reference "
                "loader cannot load them either); retrain with "
                "models/transition_model.fit_transition_model")
    if tm_entries:
        data["transition_models"] = tm_entries

    # optional PFNN section (reference zip_io.py:96-117; shared reader —
    # raises on a present-but-incomplete section instead of silently
    # disabling PFNN locomotion)
    from .pfnn import read_pfnn_arrays
    pfnn_data = read_pfnn_arrays(zf)
    if pfnn_data is not None:
        data["pfnn_data"] = pfnn_data
    return data


def load_graph(path: str) -> MotionStateGraph:
    """Load a graph from a `.zip` package (reference
    motion_state_graph_loader.py:184-233)."""
    if not path.endswith(".zip"):
        path = path + ".zip"
    data = read_zip(path)
    skeleton = None
    if "bvh_skeleton_string" in data:
        skeleton, _ = load_bvh(data["bvh_skeleton_string"])
    elif "skeleton" in data:
        # v3+ packages ship skeleton.json (reference loader delegates to
        # SkeletonBuilder.load_from_json_data)
        from .skeleton import load_skeleton_json
        skeleton = load_skeleton_json(data["skeleton"])
    if skeleton is not None and not skeleton.joint_weights:
        # pose-constraint joint weights: explicit per-joint values from the
        # package's skeleton JSON if present, else depth-attenuated defaults
        # (anim_utils joint_weight_map weighs proximal joints above distal)
        import dataclasses
        from .skeleton_models import depth_joint_weights
        explicit = (data.get("skeleton") or {}).get("joint_weights")
        weights = (tuple(float(w) for w in explicit) if explicit
                   else depth_joint_weights(skeleton))
        if len(weights) == skeleton.n_animated:
            skeleton = dataclasses.replace(skeleton, joint_weights=weights)
    return build_graph_from_dict(data, skeleton)


# ---------------------------------------------------------------------------
# Stacked device-side representation
# ---------------------------------------------------------------------------

@struct.dataclass
class StackedGraph:
    """All primitives stacked/padded into one pytree + integer tables.

    A graph walk step gathers row `node_id` from every array — no Python
    dispatch inside the scan.  Transition tables are dense [N, N] masks per
    transition type (N = number of nodes, typically < 100).
    """

    # Stacked primitive parameters, padded to graph-wide maxima:
    eigen_s: jax.Array  # [N, D_max, k_s_max]
    mean_s: jax.Array  # [N, D_max]
    knots_s: jax.Array  # [N, n_knots_max]
    mean_t_d: jax.Array  # [N, F_max]
    eigen_t_d: jax.Array  # [N, F_max, k_t_max]
    gmm_weights: jax.Array  # [N, K_max]
    gmm_means: jax.Array  # [N, K_max, L_max]   (L = k_s + k_t latent dim)
    gmm_cov_chol: jax.Array  # [N, K_max, L_max, L_max]
    gmm_prec_chol: jax.Array  # [N, K_max, L_max, L_max]
    # Per-node scalars:
    n_canonical: jax.Array  # [N] int32
    node_n_basis: jax.Array  # [N] int32 (true n_basis per node)
    n_spatial: jax.Array  # [N] int32 (actual k_s per node)
    n_latent: jax.Array  # [N] int32
    avg_step_length: jax.Array  # [N] f32
    node_type: jax.Array  # [N] int32 (NODE_TYPE_IDS)
    # Transition tables:
    transitions: jax.Array  # [T_types, N, N] bool; transitions[t, i, j]=1 iff
    #                         edge i->j with type t exists
    # Static:
    node_keys: tuple = struct.field(pytree_node=False, default=())
    n_dim: int = struct.field(pytree_node=False, default=0)
    n_basis_max: int = struct.field(pytree_node=False, default=0)
    max_canonical: int = struct.field(pytree_node=False, default=0)
    k_s_max: int = struct.field(pytree_node=False, default=0)
    k_t_max: int = struct.field(pytree_node=False, default=0)

    @property
    def n_nodes(self) -> int:
        return len(self.node_keys)

    def node_id(self, key: Tuple[str, str]) -> int:
        return self.node_keys.index(tuple(key))


def stack_graph(graph: MotionStateGraph) -> StackedGraph:
    """Pad & stack every node's primitive into a StackedGraph.

    Padding rules (masks derived from the per-node scalars):
      * eigen_s extra columns are zero -> extra latent dims are ignored;
      * extra basis rows are zero and extra knots repeat the end knot value,
        so padded basis functions evaluate to 0 everywhere;
      * GMM padded components get weight 0 and identity covariance;
      * GMM padded latent dims get variance 1, mean 0 (samples there are
        discarded by the latent mask).
    """
    keys = tuple(sorted(graph.nodes.keys()))
    prims = [graph.nodes[k].primitive for k in keys]
    n = len(keys)
    n_dim = max(p.n_dim for p in prims)
    assert all(p.n_dim == n_dim for p in prims), "mixed skeletons unsupported"
    n_basis_max = max(p.n_basis for p in prims)
    d_max = n_basis_max * n_dim
    f_max = max(p.n_canonical_frames for p in prims)
    k_s_max = max(p.n_spatial for p in prims)
    k_t_max = max(p.n_time for p in prims)
    l_max = k_s_max + k_t_max
    k_max = max(int(p.gmm.n_components) for p in prims)
    n_knots_max = n_basis_max + 4

    eigen_s = np.zeros((n, d_max, k_s_max), np.float32)
    mean_s = np.zeros((n, d_max), np.float32)
    knots_s = np.zeros((n, n_knots_max), np.float32)
    mean_t_d = np.zeros((n, f_max), np.float32)
    eigen_t_d = np.zeros((n, f_max, k_t_max), np.float32)
    gw = np.zeros((n, k_max), np.float32)
    gmu = np.zeros((n, k_max, l_max), np.float32)
    gchol = np.tile(np.eye(l_max, dtype=np.float32), (n, k_max, 1, 1))
    gprec = np.tile(np.eye(l_max, dtype=np.float32), (n, k_max, 1, 1))
    n_can = np.zeros(n, np.int32)
    n_nb = np.zeros(n, np.int32)
    n_sp = np.zeros(n, np.int32)
    n_lat = np.zeros(n, np.int32)
    asl = np.zeros(n, np.float32)
    ntype = np.zeros(n, np.int32)

    for i, (key, p) in enumerate(zip(keys, prims)):
        ds = p.n_basis * p.n_dim
        # reorder coefficient rows into the padded (n_basis_max, n_dim) layout
        es = np.asarray(p.eigen_s).reshape(p.n_basis, p.n_dim, p.n_spatial)
        ms = np.asarray(p.mean_s).reshape(p.n_basis, p.n_dim)
        eigen_s[i, : ds].reshape(p.n_basis, n_dim, k_s_max)[:, :, : p.n_spatial] = es
        mean_s[i, : ds] = ms.reshape(-1)
        kn = np.asarray(p.knots_s)
        knots_s[i, : kn.shape[0]] = kn
        knots_s[i, kn.shape[0]:] = kn[-1]  # repeat end knot: padded basis == 0
        n_can[i] = p.n_canonical_frames
        n_nb[i] = p.n_basis
        mean_t_d[i, : p.n_canonical_frames] = np.asarray(p.mean_t_d)
        # pad temporal tail with large negative -> exp ~ 0 increments? No:
        # keep 0; consumers mask by n_canonical.
        if p.n_time > 0:
            eigen_t_d[i, : p.n_canonical_frames, : p.n_time] = np.asarray(p.eigen_t_d)
        k = int(p.gmm.n_components)
        lat = p.n_latent
        gw[i, :k] = np.asarray(p.gmm.weights)
        # latent layout: alpha dims first, then gamma dims — place alphas in
        # [0:k_s_max) and gammas in [k_s_max : k_s_max + n_time)
        idx = np.concatenate([np.arange(p.n_spatial),
                              k_s_max + np.arange(p.n_time)]).astype(int)
        gmu[i][: k][:, idx] = np.asarray(p.gmm.means)
        gchol[i, :k][:, idx[:, None], idx[None, :]] = np.asarray(p.gmm.cov_chol)
        gprec[i, :k][:, idx[:, None], idx[None, :]] = np.asarray(p.gmm.prec_chol)
        # padded latent dims: identity rows already present from np.tile
        n_sp[i] = p.n_spatial
        n_lat[i] = lat
        node = graph.nodes[key]
        asl[i] = node.average_step_length
        ntype[i] = NODE_TYPE_IDS[node.node_type]

    trans = np.zeros((len(NODE_TYPES) + 1, n, n), bool)  # +1: action_transition
    type_index = dict(NODE_TYPE_IDS)
    type_index["action_transition"] = len(NODE_TYPES)
    for i, key in enumerate(keys):
        for to_key, t_type in graph.nodes[key].outgoing_edges.items():
            j = keys.index(to_key)
            trans[type_index[t_type], i, j] = True

    return StackedGraph(
        eigen_s=jnp.asarray(eigen_s), mean_s=jnp.asarray(mean_s),
        knots_s=jnp.asarray(knots_s), mean_t_d=jnp.asarray(mean_t_d),
        eigen_t_d=jnp.asarray(eigen_t_d),
        gmm_weights=jnp.asarray(gw), gmm_means=jnp.asarray(gmu),
        gmm_cov_chol=jnp.asarray(gchol), gmm_prec_chol=jnp.asarray(gprec),
        n_canonical=jnp.asarray(n_can), node_n_basis=jnp.asarray(n_nb),
        n_spatial=jnp.asarray(n_sp),
        n_latent=jnp.asarray(n_lat), avg_step_length=jnp.asarray(asl),
        node_type=jnp.asarray(ntype), transitions=jnp.asarray(trans),
        node_keys=keys, n_dim=n_dim, n_basis_max=n_basis_max,
        max_canonical=f_max, k_s_max=k_s_max, k_t_max=k_t_max,
    )


TRANSITION_TYPE_IDS = {**NODE_TYPE_IDS, "action_transition": len(NODE_TYPES)}
