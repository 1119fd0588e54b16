"""Skeleton topology + BVH IO + forward kinematics.

Replaces the anim_utils layer the reference depends on (SURVEY.md §2.9):
`BVHReader/BVHWriter`, `SkeletonBuilder`, per-node `get_global_position`.

Design: the skeleton is split into
  * a host-side description (`Skeleton`): names, parents, channel layout —
    plain numpy / Python, used for IO and to *compile* FK;
  * FK itself (`fk_positions`, `fk_global`), pure jittable functions over a
    static topology: the joint loop unrolls at trace time into a chain of
    batched quaternion ops, so FK over (crowd × frames × joints) is one
    fused XLA computation — no per-frame Python as in the reference.

Quaternion frame layout (matches the reference's anim_utils convention used
throughout, e.g. reference motion_model/motion_spline.py frames):
  frame = [root_tx, root_ty, root_tz, q_joint0 (w,x,y,z), q_joint1, ...]
for the `animated_joints` in skeleton order; length 3 + 4 * n_animated.
"""

from __future__ import annotations

import dataclasses
import functools
import io
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import quat


@dataclasses.dataclass(frozen=True)
class Skeleton:
    """Static skeleton description (host side; hashable for jit closure)."""

    node_names: tuple  # all nodes incl. end sites, depth-first BVH order
    parents: tuple  # parent index per node (-1 for root)
    offsets: np.ndarray  # [n_nodes, 3] local offsets
    node_channels: tuple  # per node: tuple of BVH channel names (may be empty)
    animated_joints: tuple  # names of joints carrying quaternions in frames
    frame_time: float = 1.0 / 30
    # per-animated-joint importance weights (anim_utils skeleton
    # joint_weight_map, consumed by pose constraints); empty = all 1.0
    joint_weights: tuple = ()
    # per-node REST rotations (wxyz tuples) from skeleton.json 'rotation'
    # fields: FK applies them as the local rotation of NON-animated joints
    # (animated joints' frames carry the full rotation).  Empty = identity.
    rest_rotations: tuple = ()

    def __post_init__(self):
        object.__setattr__(self, "offsets", np.asarray(self.offsets, np.float32))

    def __hash__(self):
        return hash((self.node_names, self.parents, self.animated_joints,
                     self.rest_rotations))

    def __eq__(self, other):
        return (isinstance(other, Skeleton)
                and self.node_names == other.node_names
                and self.parents == other.parents
                and np.array_equal(self.offsets, other.offsets)
                and self.animated_joints == other.animated_joints
                and self.rest_rotations == other.rest_rotations)

    @property
    def n_nodes(self) -> int:
        return len(self.node_names)

    @property
    def n_animated(self) -> int:
        return len(self.animated_joints)

    @property
    def n_frame_params(self) -> int:
        return 3 + 4 * self.n_animated

    def index_of(self, name: str) -> int:
        return self.node_names.index(name)

    def animated_index_of(self, name: str) -> int:
        return self.animated_joints.index(name)

    def quat_slice(self, joint_name: str) -> slice:
        """Slice into a quaternion frame for a joint's 4 quaternion params."""
        i = self.animated_index_of(joint_name)
        return slice(3 + 4 * i, 3 + 4 * i + 4)

    @property
    def joint_weight_map(self) -> dict:
        """animated joint name -> weight (anim_utils joint_weight_map)."""
        w = self.joint_weights or (1.0,) * self.n_animated
        return dict(zip(self.animated_joints, w))


def add_fixed_joint_parameters_to_motion(skel: Skeleton, frames: np.ndarray,
                                         animated_subset=None) -> np.ndarray:
    """Expand frames animated over a joint SUBSET to the skeleton's full
    animated set, identity quaternions for unmodelled joints (anim_utils
    Skeleton.add_fixed_joint_parameters_to_motion; called by the reference
    when complete_motion_vector is set, motion_generator.py:281-320 and
    motion_model_constructor.py:101).

    frames: [T, 3 + 4*len(animated_subset)].  animated_subset defaults to
    the first joints of the skeleton's animated set (dimension-inferred).
    """
    frames = np.asarray(frames)
    if animated_subset is None:
        n_sub = (frames.shape[-1] - 3) // 4
        animated_subset = skel.animated_joints[:n_sub]
    if tuple(animated_subset) == skel.animated_joints:
        return frames
    out = np.zeros((frames.shape[0], skel.n_frame_params), frames.dtype)
    out[:, :3] = frames[:, :3]
    out[:, 3::4] = 1.0  # identity w components
    rests = skel.rest_rotations or ()
    sub_index = {name: i for i, name in enumerate(animated_subset)}
    for j, name in enumerate(skel.animated_joints):
        i = sub_index.get(name)
        if i is not None:
            out[:, 3 + 4 * j: 7 + 4 * j] = frames[:, 3 + 4 * i: 7 + 4 * i]
        else:
            ni = skel.index_of(name)
            if ni < len(rests):  # unmodelled joint: its REST pose, not
                out[:, 3 + 4 * j: 7 + 4 * j] = rests[ni]  # identity
    return out


# ---------------------------------------------------------------------------
# BVH parsing / writing (host side, numpy)
# ---------------------------------------------------------------------------

_CHANNEL_NAMES = {"Xposition", "Yposition", "Zposition",
                  "Xrotation", "Yrotation", "Zrotation"}


def _parse_bvh(text: str):
    tokens = text.replace("\t", " ").split()
    pos = 0

    def peek():
        return tokens[pos]

    def take(expect: Optional[str] = None):
        nonlocal pos
        tok = tokens[pos]
        pos += 1
        if expect is not None and tok != expect:
            raise ValueError(f"BVH parse error: expected {expect}, got {tok}")
        return tok

    node_names: List[str] = []
    parents: List[int] = []
    offsets: List[List[float]] = []
    node_channels: List[tuple] = []

    take("HIERARCHY")

    def parse_node(parent_idx: int, kind: str):
        if kind == "End":
            take("Site")
            # unique name for end sites
            name = node_names[parent_idx] + "_EndSite"
        else:
            name = take()
        idx = len(node_names)
        node_names.append(name)
        parents.append(parent_idx)
        take("{")
        take("OFFSET")
        offsets.append([float(take()), float(take()), float(take())])
        chans: tuple = ()
        if peek() == "CHANNELS":
            take()
            n = int(take())
            chans = tuple(take() for _ in range(n))
            for c in chans:
                if c not in _CHANNEL_NAMES:
                    raise ValueError(f"unknown BVH channel {c}")
        node_channels.append(chans)
        while peek() in ("JOINT", "End"):
            kind2 = take()
            parse_node(idx, kind2)
        take("}")

    take("ROOT")
    parse_node(-1, "ROOT")

    take("MOTION")
    take("Frames:")
    n_frames = int(take())
    take("Frame")
    take("Time:")
    frame_time = float(take())
    values = np.array([float(t) for t in tokens[pos:]], dtype=np.float64)
    n_ch = sum(len(c) for c in node_channels)
    if values.size != n_frames * n_ch:
        raise ValueError(f"BVH motion size mismatch: {values.size} != {n_frames}x{n_ch}")
    frames = values.reshape(n_frames, n_ch)
    return node_names, parents, offsets, node_channels, frames, frame_time


def load_bvh(path_or_text: str):
    """Read a BVH file (path or raw string).

    Returns (skeleton, euler_frames [n_frames, n_channels]) where the euler
    frames are the raw BVH channel values.
    """
    if "\nMOTION" in path_or_text or "HIERARCHY" in path_or_text[:64]:
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()
    names, parents, offsets, channels, frames, frame_time = _parse_bvh(text)
    animated = tuple(n for n, c in zip(names, channels)
                     if any(ch.endswith("rotation") for ch in c))
    skel = Skeleton(tuple(names), tuple(parents), np.asarray(offsets, np.float32),
                    tuple(channels), animated, frame_time)
    return skel, frames


def load_skeleton_json(data: dict) -> Skeleton:
    """Build a Skeleton from the package skeleton.json form (anim_utils
    SkeletonBuilder.load_from_json_data, consumed by the reference loader
    for zip format versions > 2, motion_state_graph_loader.py:196).

    Expected shape: {"root": name, "frame_time": s, "animated_joints": [...],
    "nodes": {name: {"offset": [3], "children": [names],
                     "channels": [...] (optional)}}}.
    """
    nodes = data["nodes"]
    root = data.get("root")
    if root is None:  # fall back to the node nobody lists as a child
        children = {c for nd in nodes.values() for c in nd.get("children", ())}
        root = next(n for n in nodes if n not in children)
    names: List[str] = []
    parents: List[int] = []
    offsets: List[list] = []
    channels: List[tuple] = []
    rests: List[tuple] = []
    animated = tuple(data.get("animated_joints", ()))

    def visit(name: str, parent_idx: int):
        nd = nodes[name]
        idx = len(names)
        names.append(name)
        parents.append(parent_idx)
        offsets.append(list(nd.get("offset", (0.0, 0.0, 0.0))))
        # per-node rest rotation (anim_utils skeleton.json 'rotation'):
        # applied by FK as the fixed local rotation of non-animated joints
        rot = nd.get("rotation")
        rests.append(tuple(float(v) for v in rot) if rot is not None
                     else (1.0, 0.0, 0.0, 0.0))
        chans = nd.get("channels")
        if chans is None:
            chans = (("Xposition", "Yposition", "Zposition",
                      "Xrotation", "Yrotation", "Zrotation")
                     if parent_idx < 0 else
                     ("Xrotation", "Yrotation", "Zrotation")
                     if not animated or name in animated else ())
        channels.append(tuple(chans))
        for child in nd.get("children", ()):
            if child in nodes:
                visit(child, idx)

    visit(root, -1)
    if not animated:
        animated = tuple(n for n, c in zip(names, channels)
                         if any(ch.endswith("rotation") for ch in c))
    else:
        animated = tuple(n for n in names if n in animated)  # DFS order
    identity = (1.0, 0.0, 0.0, 0.0)
    rest_tuple = (tuple(rests) if any(r != identity for r in rests) else ())
    return Skeleton(tuple(names), tuple(parents),
                    np.asarray(offsets, np.float32), tuple(channels),
                    animated, float(data.get("frame_time", 1.0 / 30)),
                    rest_rotations=rest_tuple)


def _rotation_order(chans: Sequence[str]) -> str:
    return "r" + "".join(c[0].lower() for c in chans if c.endswith("rotation"))


def _np_from_euler(angles_deg: np.ndarray, order: str) -> np.ndarray:
    """Host-side euler->quat (w-first), matching ops.quat.from_euler.

    Uses scipy's intrinsic-rotation convention, which equals the rotating-
    frame composition qx*qy*qz used by BVH (validated in tests/test_quat.py).
    """
    from scipy.spatial.transform import Rotation
    r = Rotation.from_euler(order[1:].upper(), angles_deg, degrees=True)
    q_xyzw = r.as_quat()
    return np.roll(q_xyzw, 1, axis=-1)


def _np_to_euler(q_wxyz: np.ndarray, order: str) -> np.ndarray:
    from scipy.spatial.transform import Rotation
    r = Rotation.from_quat(np.roll(np.asarray(q_wxyz, np.float64), -1, axis=-1))
    return r.as_euler(order[1:].upper(), degrees=True)


def _np_fix_signs_sequential(quats: np.ndarray) -> np.ndarray:
    """Host-side twin of ops.quat.fix_signs_sequential over axis 0."""
    d = np.sum(quats[1:] * quats[:-1], axis=-1)
    step_sign = np.where(d < 0.0, -1.0, 1.0)
    run = np.cumprod(step_sign, axis=0)
    # explicit length-1 ones: ones_like(run[:1]) is EMPTY for single-frame
    # input (run has length T-1 = 0), which silently dropped every
    # quaternion of 1-frame motions
    run = np.concatenate([np.ones((1,) + run.shape[1:], run.dtype), run],
                         axis=0)
    return quats * run[..., None]


def bvh_to_quat_frames(skel: Skeleton, euler_frames: np.ndarray) -> np.ndarray:
    """BVH channel rows -> quaternion frames [T, 3 + 4*n_animated].

    Root translation is taken from the root's position channels; each animated
    joint's euler triplet converts through `quat.from_euler` with its channel
    order.  Signs are sequentially hemisphere-aligned for blending (reference
    construction/utils.py:162-184 semantics).
    """
    euler_frames = np.asarray(euler_frames, np.float64)
    t = euler_frames.shape[0]
    out = [np.zeros((t, 3), np.float32)]
    col = 0
    root_seen = False
    quats_per_joint = []
    for name, chans in zip(skel.node_names, skel.node_channels):
        n = len(chans)
        if n == 0:
            continue
        vals = euler_frames[:, col: col + n]
        col += n
        pos_cols = [i for i, c in enumerate(chans) if c.endswith("position")]
        rot_cols = [i for i, c in enumerate(chans) if c.endswith("rotation")]
        if pos_cols and not root_seen:
            # map by channel letter, not file order (permuted exports like
            # "Zposition Xposition Yposition" exist; the inverse writer
            # already maps by letter)
            pos = np.zeros((t, 3), np.float32)
            for ci in pos_cols:
                pos[:, "XYZ".index(chans[ci][0].upper())] = vals[:, ci]
            out[0] = pos
            root_seen = True
        if rot_cols and name in skel.animated_joints:
            order = _rotation_order(chans)
            q = _np_from_euler(vals[:, rot_cols], order)
            quats_per_joint.append(q)
    quats = np.stack(quats_per_joint, axis=1)  # [T, J, 4]
    quats = _np_fix_signs_sequential(quats)
    return np.concatenate([out[0], quats.reshape(t, -1)], axis=1).astype(np.float32)


def quat_frames_to_bvh(skel: Skeleton, quat_frames: np.ndarray) -> np.ndarray:
    """Quaternion frames -> BVH channel rows (inverse of bvh_to_quat_frames)."""
    quat_frames = np.asarray(quat_frames)
    t = quat_frames.shape[0]
    cols = []
    rests = skel.rest_rotations or ()
    for ni, (name, chans) in enumerate(zip(skel.node_names,
                                           _export_channels(skel))):
        if len(chans) == 0:
            continue
        rot_chans = [c for c in chans if c.endswith("rotation")]
        vals = np.zeros((t, len(chans)), np.float64)
        if name == skel.node_names[0]:
            for ci, c in enumerate(chans):
                if c.endswith("position"):
                    vals[:, ci] = quat_frames[:, "XYZ".index(c[0])]
        if rot_chans:
            rot_idx = [i for i, c in enumerate(chans) if c.endswith("rotation")]
            if name in skel.animated_joints:
                q = quat_frames[:, skel.quat_slice(name)]
            elif ni < len(rests):
                # fixed joint with a rest rotation: constant channels
                q = np.tile(np.asarray(rests[ni], np.float64), (t, 1))
            else:
                q = np.tile([1.0, 0, 0, 0], (t, 1))
            order = _rotation_order(chans)
            vals[:, rot_idx] = _np_to_euler(q, order)
        cols.append(vals)
    return np.concatenate(cols, axis=1)


def _export_channels(skel: Skeleton) -> tuple:
    """Per-node channel tuples for BVH EXPORT: non-animated joints carrying
    a rest rotation get synthesized rotation channels so the written BVH
    reproduces the same geometry internal FK computes (the rest rotation
    would otherwise be silently dropped — OFFSET-only joints are identity
    to every BVH consumer)."""
    identity = (1.0, 0.0, 0.0, 0.0)
    rests = skel.rest_rotations or ()
    out = []
    for i, chans in enumerate(skel.node_channels):
        has_rot = any(c.endswith("rotation") for c in chans)
        rest = rests[i] if i < len(rests) else identity
        if (not has_rot and tuple(rest) != identity
                and not skel.node_names[i].endswith("_EndSite")):
            chans = tuple(chans) + ("Xrotation", "Yrotation", "Zrotation")
        out.append(tuple(chans))
    return tuple(out)


def write_bvh(skel: Skeleton, quat_frames: np.ndarray,
              path: Optional[str] = None) -> str:
    """Serialize quaternion frames to BVH text (and optionally a file)."""
    buf = io.StringIO()
    buf.write("HIERARCHY\n")
    export_chans = _export_channels(skel)
    children: Dict[int, List[int]] = {}
    for i, p in enumerate(skel.parents):
        children.setdefault(p, []).append(i)

    def emit(idx: int, depth: int):
        indent = "  " * depth
        name = skel.node_names[idx]
        is_end = name.endswith("_EndSite")
        if idx == 0:
            buf.write(f"{indent}ROOT {name}\n")
        elif is_end:
            buf.write(f"{indent}End Site\n")
        else:
            buf.write(f"{indent}JOINT {name}\n")
        buf.write(f"{indent}{{\n")
        o = skel.offsets[idx]
        buf.write(f"{indent}  OFFSET {o[0]:.6f} {o[1]:.6f} {o[2]:.6f}\n")
        chans = export_chans[idx]
        if chans:
            buf.write(f"{indent}  CHANNELS {len(chans)} {' '.join(chans)}\n")
        for c in children.get(idx, []):
            emit(c, depth + 1)
        buf.write(f"{indent}}}\n")

    emit(0, 0)
    rows = quat_frames_to_bvh(skel, quat_frames)
    buf.write("MOTION\n")
    buf.write(f"Frames: {rows.shape[0]}\n")
    buf.write(f"Frame Time: {skel.frame_time:.6f}\n")
    for row in rows:
        buf.write(" ".join(f"{v:.6f}" for v in row) + "\n")
    text = buf.getvalue()
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text


# ---------------------------------------------------------------------------
# Forward kinematics (jittable; topology static)
# ---------------------------------------------------------------------------

def _fk_tables(skel: Skeleton):
    """Static tables for FK: per node, its parent and (if animated) the index
    of its quaternion block in the frame vector, else -1."""
    anim_idx = []
    for name in skel.node_names:
        anim_idx.append(skel.animated_joints.index(name)
                        if name in skel.animated_joints else -1)
    return tuple(anim_idx)


def _rest_table(skel: Skeleton) -> np.ndarray:
    """[n_nodes, 4] rest quaternions (identity when unset); FK uses them as
    the local rotation of NON-animated joints."""
    if not skel.rest_rotations:
        out = np.zeros((skel.n_nodes, 4), np.float32)
        out[:, 0] = 1.0
        return out
    return np.asarray(skel.rest_rotations, np.float32)


@functools.partial(jax.jit, static_argnums=(0,))
def fk_global(skel: Skeleton, frames: jax.Array):
    """Global transforms for every node.

    frames: [..., 3 + 4J] quaternion frames.
    Returns (positions [..., n_nodes, 3], orientations [..., n_nodes, 4]).

    The node loop unrolls at trace time (topology is static), each step a
    batched quaternion rotate + multiply — the whole crowd × time batch flows
    through the VPU with no host round-trips (replaces reference per-frame
    `node.get_global_position`, SURVEY.md §2.9).
    """
    anim_idx = _fk_tables(skel)
    root_t = frames[..., :3]
    quats = frames[..., 3:].reshape(frames.shape[:-1] + (skel.n_animated, 4))

    offsets = jnp.asarray(skel.offsets)
    rest = _rest_table(skel)

    pos_list = []
    ori_list = []
    for i in range(skel.n_nodes):
        parent = skel.parents[i]
        local_q = (quats[..., anim_idx[i], :] if anim_idx[i] >= 0
                   else jnp.broadcast_to(jnp.asarray(rest[i], frames.dtype),
                                         frames.shape[:-1] + (4,)))
        off = jnp.broadcast_to(offsets[i], frames.shape[:-1] + (3,))
        if parent < 0:
            pos = off + root_t
            ori = local_q
        else:
            p_pos, p_ori = pos_list[parent], ori_list[parent]
            pos = p_pos + quat.rotate_vec(p_ori, off)
            ori = quat.multiply(p_ori, local_q)
        pos_list.append(pos)
        ori_list.append(ori)
    return jnp.stack(pos_list, axis=-2), jnp.stack(ori_list, axis=-2)


def fk_positions(skel: Skeleton, frames: jax.Array) -> jax.Array:
    """Global positions only: [..., n_nodes, 3]."""
    return fk_global(skel, frames)[0]


@functools.lru_cache(maxsize=None)
def _chain_tables(skel: Skeleton):
    """Per-node ancestor chains for single-node FK.

    Returns (chain [n_nodes, depth] int32 — ancestors root-first, -1-padded
    after the node itself — and the static max depth).  Host-side; depends
    only on the static topology."""
    chains = []
    for i in range(skel.n_nodes):
        chain = []
        j = i
        while j >= 0:
            chain.append(j)
            j = skel.parents[j]
        chains.append(chain[::-1])
    depth = max(len(c) for c in chains)
    tbl = np.full((skel.n_nodes, depth), -1, np.int32)
    for i, c in enumerate(chains):
        tbl[i, : len(c)] = c
    return tbl, depth


def fk_node(skel: Skeleton, frames: jax.Array, node: jax.Array):
    """Global transform of ONE (traced) node via its ancestor chain.

    frames: [..., 3 + 4J] quaternion frames; node: int array — frames'
    batch shape and node's shape broadcast jointly (e.g. frames [T, 1, F] x
    node [1, N] -> [T, N]).  Returns (pos [..., 3], ori [..., 4]).

    Cost is O(chain depth) gathered quaternion ops instead of fk_global's
    O(n_nodes) full-skeleton pass — the difference between ~6 and ~25
    rotate/multiply pairs per query.  Useful for sparse one-off joint
    queries; as the FK backend of batched constraint evaluation it MEASURES
    WORSE than the dense pass on TPU (see
    constraints/compiled.residuals_from_coeffs `chain_fk` — ties for plain
    scoring, 3.5x slower under LM tangents, where many small gathers lose
    to one big regular FK).  The chain composes local transforms in
    fk_global's order — results agree to fusion-level rounding (XLA may
    contract FMAs differently between the two programs).
    """
    anim_idx = np.asarray(_fk_tables(skel), np.int32)
    tbl, depth = _chain_tables(skel)
    n_anim = skel.n_animated
    node = jnp.asarray(node, jnp.int32)
    batch = jnp.broadcast_shapes(frames.shape[:-1], node.shape)
    frames = jnp.broadcast_to(frames, batch + frames.shape[-1:])

    quats = frames[..., 3:].reshape(batch + (n_anim, 4))
    identity = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0, 0.0], frames.dtype), batch + (1, 4))
    quats_p = jnp.concatenate([quats, identity], axis=-2)  # [-1] = identity
    # per-node index into quats_p (n_anim = the identity row)
    q_of_node = jnp.asarray(np.where(anim_idx >= 0, anim_idx, n_anim))
    offsets = jnp.asarray(skel.offsets)
    rest = jnp.asarray(_rest_table(skel))  # non-animated local rotations
    animated_node = jnp.asarray((anim_idx >= 0))

    node = jnp.broadcast_to(node, batch)
    chain = jnp.asarray(tbl)[node]  # [..., depth]

    def local_q(nd):  # nd [...] -> [..., 4]
        gi = q_of_node[nd]
        ch = jnp.take_along_axis(quats_p, gi[..., None, None],
                                 axis=-2)[..., 0, :]
        return jnp.where(animated_node[nd][..., None], ch, rest[nd])

    # chain[..., 0] is always the root — reuse fk_root (static slice; a
    # local_q gather here would be per-batch-element for a constant index)
    pos, ori = fk_root(skel, frames)
    for d in range(1, depth):
        nd = chain[..., d]
        valid = (nd >= 0)[..., None]
        nd_safe = jnp.maximum(nd, 0)
        off = offsets[nd_safe]
        lq = local_q(nd_safe)
        pos = jnp.where(valid, pos + quat.rotate_vec(ori, off), pos)
        ori = jnp.where(valid, quat.multiply(ori, lq), ori)
    return pos, ori


def fk_root(skel: Skeleton, frames: jax.Array):
    """Global transform of the ROOT node only — no kinematic chain.

    Exactly the root branch of `fk_global` (pos = offset + root translation,
    ori = the root's local channel quaternion).  Used by the locomotion-only
    constraint path, where every active constraint references the root and
    the full per-joint FK chain (and its jacfwd tangents in the LM loop) is
    wasted work.
    Returns (positions [..., 3], orientations [..., 4])."""
    anim_idx = _fk_tables(skel)
    pos = jnp.asarray(skel.offsets)[0] + frames[..., :3]
    if anim_idx[0] >= 0:
        a = anim_idx[0]
        ori = frames[..., 3 + 4 * a: 3 + 4 * a + 4]
    else:
        ori = jnp.broadcast_to(
            jnp.asarray(_rest_table(skel)[0], frames.dtype),
            frames.shape[:-1] + (4,))
    return pos, ori


def fk_point_cloud(skel: Skeleton, frames: jax.Array,
                   normalize: bool = False) -> jax.Array:
    """Point cloud per frame for DTW / pose distance (reference
    construction/utils.py:76-93 `_convert_pose_to_point_cloud`).

    normalize=True zeroes root translation + rotation before FK.
    """
    frames = jnp.asarray(frames)
    if normalize:
        ident = jnp.array([1.0, 0, 0, 0], frames.dtype)
        frames = frames.at[..., :3].set(0.0)
        if skel.node_names[0] in skel.animated_joints:
            a = skel.animated_index_of(skel.node_names[0])
            frames = frames.at[..., 3 + 4 * a: 7 + 4 * a].set(ident)
        # a non-animated root's (constant) rest rotation is the same for
        # every frame and motion, so transform-invariant distances are
        # unaffected — never clobber a real joint's block in its place
    return fk_positions(skel, frames)
