"""Latent-space search index: cluster tree + TPU brute-force search.

Replaces reference space_partitioning/ (cluster_tree.py:43-218,
cluster_tree_node.py, kdtree.py, feature_cluster_tree.py:55-357,
clustering.py, features.py).

Two search paths:
  * `search_best_exhaustive` — vmapped objective over ALL stored samples +
    argmin.  On TPU this is one batched matmul chain over 10k candidates and
    is both exact and faster than tree traversal (SURVEY.md §7.8 explicitly
    allows demonstrating this); it is the default.
  * `ClusterTree` — KMeans hierarchy matching the reference's structure
    (n_subdivisions=4, max_level=4, KDTree-free leaf argmin) with beam
    search, kept for behavioral parity and for loading reference-format
    tree JSON; search evaluates each level's cluster means as one batch.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# KMeans (replaces sklearn KMeans in reference clustering.py)
# ---------------------------------------------------------------------------

def kmeans(rng: np.random.Generator, x: np.ndarray, k: int,
           n_iters: int = 25) -> np.ndarray:
    """Lloyd's algorithm with kmeans++ seeding; returns labels [N]."""
    n = x.shape[0]
    centers = [x[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(np.stack([np.sum((x - c) ** 2, axis=1) for c in centers]), axis=0)
        total = d2.sum()
        if total <= 1e-12:  # duplicate rows: probabilities would not sum to 1
            centers.append(x[rng.integers(n)])
            continue
        centers.append(x[rng.choice(n, p=d2 / total)])
    c = np.stack(centers).astype(np.float64)
    xs = np.asarray(x, np.float64)
    # numpy Lloyd iterations: construction-time host work; dispatching tiny
    # per-node kernels to a remote TPU costs more than the compute
    labels = np.zeros(n, np.int64)
    for _ in range(n_iters):
        d = ((xs[:, None, :] - c[None]) ** 2).sum(-1)  # [N, K]
        labels = np.argmin(d, axis=-1)
        for j in range(k):
            m = labels == j
            if m.any():
                c[j] = xs[m].mean(axis=0)
    return labels


# ---------------------------------------------------------------------------
# Exhaustive search (TPU default)
# ---------------------------------------------------------------------------

def search_best_exhaustive(objective_batched: Callable[[jax.Array], jax.Array],
                           data: jax.Array):
    """Evaluate the objective on every stored sample and take the argmin.

    objective_batched: [N, L] -> [N] errors (vmap the per-sample objective).
    Returns (best_error, best_sample).
    """
    errors = objective_batched(data)
    i = jnp.argmin(errors)
    return errors[i], data[i]


def knn_interpolation(objective_batched: Callable[[jax.Array], jax.Array],
                      data: jax.Array, k: int = 50):
    """Blend the k best samples under the objective into a new sample
    (reference space_partitioning/kdtree_wrapper_node.py:58-84
    `knn_interpolation` + `_get_knn_weights`).

    The reference walks a KD-tree for the k best examples and weights the
    first k-1 by normalized influence 1/e_i - 1/e_k; here the k best come
    from one vmapped objective evaluation over ALL samples (exact, and
    faster on TPU than the tree descent). Returns (error, blended_sample);
    like the reference, falls back to the single best sample when its
    weight mass degenerates (k == 1).

    objective_batched: [N, L] -> [N] errors.
    """
    errors = objective_batched(data)
    if k <= 1 or data.shape[0] < 2:
        i = jnp.argmin(errors)
        return errors[i], data[i]
    k = min(k, data.shape[0])
    neg_best, idx = jax.lax.top_k(-errors, k)   # ascending errors
    best = -neg_best
    pts = data[idx]
    # degenerate weight mass: a zero best error (1/0) or all-equal errors
    # (influence sums to 0) would blend to NaN — fall back to the single
    # best sample, like the k == 1 path
    safe = jnp.maximum(best, 1e-12)
    influence = 1.0 / safe[:-1] - 1.0 / safe[-1]
    total = jnp.sum(influence)
    degenerate = (best[0] <= 1e-12) | (total <= 1e-12)
    weights = influence / jnp.where(degenerate, 1.0, total)
    blended = jnp.where(degenerate, pts[0], weights @ pts[:-1])
    err = objective_batched(blended[None])[0]
    return err, blended


# ---------------------------------------------------------------------------
# Cluster tree (parity structure)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TreeNode:
    mean: np.ndarray
    indices: np.ndarray  # indices into the data array
    children: List["TreeNode"]

    @property
    def is_leaf(self) -> bool:
        return not self.children


class ClusterTree:
    """Recursive-KMeans hierarchy (reference cluster_tree.py defaults:
    4 subdivisions x 4 levels; leaves keep their sample indices)."""

    def __init__(self, n_subdivisions: int = 4, max_level: int = 4):
        self.n_subdivisions = n_subdivisions
        self.max_level = max_level
        self.data: Optional[np.ndarray] = None
        self.root: Optional[TreeNode] = None

    # -- construction (reference cluster_tree_node_builder.py:37-209) -----
    def construct(self, data: np.ndarray, seed: int = 0):
        self.data = np.asarray(data, np.float32)
        rng = np.random.default_rng(seed)
        self.root = self._build(rng, np.arange(len(self.data)), 0)

    def _build(self, rng, indices: np.ndarray, level: int) -> TreeNode:
        subset = self.data[indices]
        mean = subset.mean(axis=0)
        if level >= self.max_level or len(indices) <= self.n_subdivisions:
            return TreeNode(mean=mean, indices=indices, children=[])
        labels = kmeans(rng, subset, self.n_subdivisions)
        children = []
        for c in range(self.n_subdivisions):
            sub = indices[labels == c]
            if len(sub) > 0:
                children.append(self._build(rng, sub, level + 1))
        if len(children) <= 1:
            return TreeNode(mean=mean, indices=indices, children=[])
        return TreeNode(mean=mean, indices=indices, children=children)

    # -- search (reference cluster_tree.py:117-149 beam search) -----------
    def _beam_leaf_indices(self, objective_batched,
                           n_candidates: int) -> np.ndarray:
        """Beam-search descent shared by both search entry points: keep the
        n_candidates best clusters per level (means evaluated as one
        batch), return the surviving leaves' sample indices."""
        frontier = [self.root]
        leaves: List[TreeNode] = []
        while frontier:
            children = []
            for node in frontier:
                if node.is_leaf:
                    leaves.append(node)
                else:
                    children.extend(node.children)
            if not children:
                break
            means = jnp.asarray(np.stack([c.mean for c in children]))
            errs = np.asarray(objective_batched(means))
            order = np.argsort(errs)[: self.n_candidates_effective(n_candidates, len(children))]
            frontier = [children[i] for i in order]
        if not leaves:
            leaves = frontier
        return np.concatenate([l.indices for l in leaves])

    def find_best_example(self, objective_batched, n_candidates: int = 4):
        """Beam search: keep the n_candidates best clusters per level by
        evaluating cluster means as one batch; at the leaves evaluate all
        member samples as one batch.  Returns (error, sample)."""
        idx = self._beam_leaf_indices(objective_batched, n_candidates)
        cand = jnp.asarray(self.data[idx])
        errs = np.asarray(objective_batched(cand))
        i = int(np.argmin(errs))
        return float(errs[i]), self.data[idx[i]]

    def find_best_example_knn(self, objective_batched, n_candidates: int = 4,
                              k: int = 50):
        """Beam search to the leaves, then inverse-distance-blend the k best
        leaf samples into a new candidate (reference
        cluster_tree.py:189-215 find_best_example_excluding_search_candidates_knn
        + cluster_tree_node.py:52-61 find_best_example_knn).
        Returns (error, blended_sample)."""
        idx = self._beam_leaf_indices(objective_batched, n_candidates)
        err, blended = knn_interpolation(objective_batched,
                                         jnp.asarray(self.data[idx]), k=k)
        return float(err), np.asarray(blended)

    @staticmethod
    def n_candidates_effective(n_candidates, n_children):
        return min(n_candidates, n_children)

    # -- serialization (reference cluster_tree.py:63-94 json+data layout) --
    def save(self, prefix: str):
        meta = {"n_subdivisions": self.n_subdivisions,
                "max_level": self.max_level,
                "n_dims": int(self.data.shape[1]),
                "root": self._node_to_json(self.root)}
        with open(prefix + "_cluster_tree.json", "w") as f:
            json.dump(meta, f)
        self.data.astype(np.float32).tofile(prefix + "_cluster_tree.data")

    def _node_to_json(self, node: TreeNode) -> dict:
        return {"mean": node.mean.tolist(),
                "indices": node.indices.tolist(),
                "children": [self._node_to_json(c) for c in node.children]}

    @classmethod
    def load(cls, prefix: str, n_dims: Optional[int] = None) -> "ClusterTree":
        with open(prefix + "_cluster_tree.json") as f:
            meta = json.load(f)
        with open(prefix + "_cluster_tree.data", "rb") as f:
            raw = f.read()
        return cls.from_native_json(meta, raw, n_dims)

    @classmethod
    def from_native_json(cls, meta: dict, data_bytes: bytes,
                         n_dims: Optional[int] = None) -> "ClusterTree":
        """Hydrate from this class's own save() layout: JSON meta (with
        n_dims recorded) + the raw f32 .data payload."""
        if n_dims is None:
            if "n_dims" not in meta:
                raise ValueError(
                    "cluster-tree meta JSON has no 'n_dims' (pre-n_dims "
                    "save?) — pass n_dims explicitly to ClusterTree.load/"
                    "from_native_json")
            n_dims = int(meta["n_dims"])
        tree = cls(meta["n_subdivisions"], meta["max_level"])
        tree.data = np.frombuffer(data_bytes, np.float32).reshape(-1, n_dims)
        tree.root = cls._node_from_json(meta["root"])
        return tree

    @classmethod
    def _node_from_json(cls, d: dict) -> TreeNode:
        return TreeNode(mean=np.asarray(d["mean"], np.float32),
                        indices=np.asarray(d["indices"], np.int64),
                        children=[cls._node_from_json(c) for c in d["children"]])


def load_reference_feature_tree_json(tree_data: dict) -> ClusterTree:
    """Load the reference's FeatureClusterTree JSON form
    ({data, features, options, root}, feature_cluster_tree.py:293-348) into
    a ClusterTree over the LATENT data (features are only used to build)."""
    tree = ClusterTree(
        n_subdivisions=tree_data.get("options", {}).get("n_subdivisions_per_level", 4),
        max_level=tree_data.get("options", {}).get("n_levels", 4))
    tree.data = np.asarray(tree_data["data"], np.float32)

    def parse(node) -> TreeNode:
        indices = np.asarray(node.get("indices", []), np.int64)
        mean = (tree.data[indices].mean(axis=0) if len(indices)
                else np.zeros(tree.data.shape[1], np.float32))
        children = [parse(c) for c in node.get("children", [])]
        return TreeNode(mean=mean, indices=indices, children=children)

    tree.root = parse(tree_data["root"])
    return tree


def load_reference_pickle_tree(payload: bytes) -> ClusterTree:
    """Load a legacy pickled ClusterTree (`*_cluster_tree.pck` inside graph
    zips with formatVersion < 4 or usePickle, reference zip_io.py:210-223 +
    cluster_tree.py:81-94) WITHOUT importing the reference package.

    The pickle stream references classes by module path
    (morphablegraphs.space_partitioning.*); a restricted Unpickler maps any
    such class to an attribute-bag stub (the reference classes are plain
    objects with no custom __setstate__), allows numpy's reconstructors,
    and refuses everything else.  The stub tree is then converted to the
    native index-based ClusterTree:

      * ClusterTreeNode stubs -> TreeNode (mean / indices / children);
      * KDTreeWrapper leaves (which store raw point LISTS, not indices,
        kdtree.py:87-89) -> indices recovered by exact row matching against
        the tree's data array (the reference builds them via
        data[indices].tolist(), so rows match bit-for-bit in f64).
    """
    import io
    import pickle

    class _Stub:
        pass

    _stub_cache: dict = {}

    def _stub_class(module: str, name: str):
        key = (module, name)
        if key not in _stub_cache:
            _stub_cache[key] = type(name, (_Stub,), {"__module__": module})
        return _stub_cache[key]

    # NAME-level allowlists: blanket module prefixes are gadget surfaces —
    # builtins.eval/exec would be direct code execution, and e.g.
    # numpy.ctypeslib.load_library reaches the loader during unpickling.
    # These names are exactly what numpy protocol-2 array pickles plus the
    # reference's plain-object trees need (_codecs.encode reconstructs the
    # raw byte payloads).
    _ALLOWED = {
        "builtins": {"object", "list", "dict", "tuple", "set", "frozenset",
                     "slice", "complex", "bytearray", "range"},
        "collections": {"OrderedDict", "defaultdict"},
        "_codecs": {"encode"},
    }
    _ALLOWED_NUMPY_NAMES = frozenset(
        {"ndarray", "dtype", "matrix", "_reconstruct", "scalar",
         "_frombuffer"})

    class _RestrictedUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if ("morphablegraphs" in module or "space_partitioning" in module
                    or "kdtree" in module or "cluster_tree" in module):
                return _stub_class(module, name)
            allowed = _ALLOWED.get(module)
            if allowed is not None and name in allowed:
                return super().find_class(module, name)
            if (module.split(".")[0] == "numpy"
                    and name in _ALLOWED_NUMPY_NAMES):
                return super().find_class(module, name)
            raise pickle.UnpicklingError(
                f"refusing to unpickle {module}.{name} from cluster tree")

    obj = _RestrictedUnpickler(io.BytesIO(payload)).load()
    data = np.asarray(obj.data, np.float64)
    tree = ClusterTree(n_subdivisions=int(getattr(obj, "n_subdivisions", 4)),
                       max_level=int(getattr(obj, "max_level", 4)))
    tree.data = data.astype(np.float32)

    # exact-match index of data rows for KDTreeWrapper point recovery
    row_index = {np.asarray(row, np.float64).tobytes(): i
                 for i, row in enumerate(data)}

    def match_points(points) -> np.ndarray:
        idx = []
        for p in points:
            k = np.asarray(p, np.float64).tobytes()
            if k in row_index:
                idx.append(row_index[k])
        return np.asarray(idx, np.int64)

    def convert(node) -> TreeNode:
        if hasattr(node, "kdtree"):  # KDTreeWrapper leaf
            # data may be a list OR a numpy array (truthiness of a
            # multi-row array raises) — explicit None/size handling
            pts = getattr(node.kdtree, "data", None)
            if pts is None or len(pts) == 0:
                pts = []
            indices = match_points(pts)
            mean = (data[indices].mean(axis=0) if len(indices)
                    else np.zeros(data.shape[1]))
            return TreeNode(mean=np.asarray(mean, np.float32),
                            indices=indices, children=[])
        children = [convert(c) for c in (getattr(node, "clusters", None) or [])]
        indices = getattr(node, "indices", None)
        if indices is None:
            if children:
                indices = np.concatenate([c.indices for c in children]) \
                    if any(len(c.indices) for c in children) else np.asarray([], np.int64)
            else:
                indices = np.asarray([], np.int64)
        indices = np.asarray(indices, np.int64)
        mean = getattr(node, "mean", None)
        if mean is None:
            mean = data[indices].mean(axis=0) if len(indices) else np.zeros(data.shape[1])
        # KD wrappers stay as plain leaf children: beam search evaluates
        # their member samples exactly like the reference's directed
        # kd-tree descent (SURVEY §7.8)
        return TreeNode(mean=np.asarray(mean, np.float32),
                        indices=indices, children=children)

    tree.root = convert(obj.root)
    return tree


# ---------------------------------------------------------------------------
# Builder (reference construction/cluster_tree_builder.py:114-266)
# ---------------------------------------------------------------------------

def build_cluster_tree_for_primitive(key: jax.Array, prim, n_samples: int = 10000,
                                     n_subdivisions: int = 4,
                                     max_level: int = 4,
                                     spatial_only: bool = True,
                                     seed: int = 0) -> ClusterTree:
    """Sample latents from the primitive's GMM and build the tree
    (reference samples 10k and clusters the spatial dims only)."""
    from ..models import primitive as prim_mod
    lat = np.asarray(prim_mod.sample_latent(key, prim, n_samples))
    if spatial_only:
        cluster_data = lat[:, : prim.n_spatial]
    else:
        cluster_data = lat
    tree = ClusterTree(n_subdivisions, max_level)
    # cluster on (possibly reduced) data but store the full latents
    tree.data = lat.astype(np.float32)
    rng = np.random.default_rng(seed)
    tree.root = _build_on_features(tree, rng, cluster_data.astype(np.float32),
                                   np.arange(len(lat)), 0)
    return tree


def _build_on_features(tree: ClusterTree, rng, features: np.ndarray,
                       indices: np.ndarray, level: int) -> TreeNode:
    mean = tree.data[indices].mean(axis=0)
    if level >= tree.max_level or len(indices) <= tree.n_subdivisions:
        return TreeNode(mean=mean, indices=indices, children=[])
    labels = kmeans(rng, features[indices], tree.n_subdivisions)
    children = []
    for c in range(tree.n_subdivisions):
        sub = indices[labels == c]
        if len(sub) > 0:
            children.append(_build_on_features(tree, rng, features, sub, level + 1))
    if len(children) <= 1:
        return TreeNode(mean=mean, indices=indices, children=[])
    return TreeNode(mean=mean, indices=indices, children=children)
