"""Skeleton-to-skeleton motion retargeting.

Replaces the anim_utils `retarget_from_src_to_target` surface consumed by the
reference's REST layer (examples/mg_rest_interface.py:36-82: Rocketbox ->
game-engine joint map, target-skeleton loading with offset scaling, retarget
before export).  SURVEY.md §2.9 lists this as part of the external animation
layer the rebuild must re-provide.

Method: global-orientation copy.  Source global joint orientations come from
one batched FK pass; each mapped target joint's local rotation is solved
top-down so its global orientation equals the source joint's:

    q_local_dst(j) = inv(q_global_dst(parent(j))) * q_global_src(map(j))

Unmapped target joints keep their rest (identity) rotation.  Root translation
is copied and scaled.  This is the standard same-convention-rig retarget (both
rigs share a T-pose convention); whole-crowd batches flow through vectorized
quaternion ops instead of the reference's per-frame Python loops.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import quat
from .skeleton import Skeleton, fk_global, load_bvh

# reference examples/mg_rest_interface.py:36-56
ROCKETBOX_TO_GAME_ENGINE_MAP: Dict[str, str] = {
    "Hips": "pelvis",
    "Spine": "spine_01",
    "Spine_1": "spine_02",
    "Neck": "neck_01",
    "Head": "head",
    "LeftShoulder": "clavicle_l",
    "RightShoulder": "clavicle_r",
    "LeftArm": "upperarm_l",
    "RightArm": "upperarm_r",
    "LeftForeArm": "lowerarm_l",
    "RightForeArm": "lowerarm_r",
    "LeftHand": "hand_l",
    "RightHand": "hand_r",
    "LeftUpLeg": "thigh_l",
    "RightUpLeg": "thigh_r",
    "LeftLeg": "calf_l",
    "RightLeg": "calf_r",
    "LeftFoot": "foot_l",
    "RightFoot": "foot_r",
}
GAME_ENGINE_TO_ROCKETBOX_MAP = {v: k for k, v in
                                ROCKETBOX_TO_GAME_ENGINE_MAP.items()}


def load_target_skeleton(file_path: str, scale_factor: float = 1.0) -> Skeleton:
    """BVH -> Skeleton with offsets scaled (reference
    mg_rest_interface.py:84-93 load_target_skeleton)."""
    import dataclasses
    skel, _ = load_bvh(file_path)
    if scale_factor != 1.0:
        skel = dataclasses.replace(
            skel, offsets=np.asarray(skel.offsets, np.float64) * scale_factor)
    return skel


def retarget_frames(src_skel: Skeleton, frames: np.ndarray,
                    dst_skel: Skeleton,
                    joint_map: Optional[Dict[str, str]] = None,
                    scale_factor: float = 1.0) -> np.ndarray:
    """Retarget quaternion frames [T, 3+4*J_src] -> [T, 3+4*J_dst].

    joint_map maps SOURCE joint names to TARGET joint names (reference
    retarget_motion_vector passes GAME_ENGINE_TO_ROCKETBOX_MAP as the
    src<-dst map; here the src->dst direction is used — invert yours if
    needed).  Defaults to the identity map over shared joint names.
    """
    frames = np.asarray(frames, np.float32)
    if joint_map is None:
        joint_map = {n: n for n in src_skel.animated_joints
                     if n in dst_skel.animated_joints}
    # src animated joint -> dst animated joint indices, for mapped pairs
    dst_to_src = np.full(dst_skel.n_animated, -1, np.int32)
    for src_name, dst_name in joint_map.items():
        if (src_name in src_skel.animated_joints
                and dst_name in dst_skel.animated_joints):
            dst_to_src[dst_skel.animated_index_of(dst_name)] = \
                src_skel.animated_index_of(src_name)

    # dst animated joint -> animated index of its nearest ANIMATED ancestor
    dst_parent = np.full(dst_skel.n_animated, -1, np.int32)
    name_to_anim = {n: i for i, n in enumerate(dst_skel.animated_joints)}
    for i, name in enumerate(dst_skel.animated_joints):
        p = dst_skel.parents[dst_skel.index_of(name)]
        while p >= 0:
            pname = dst_skel.node_names[p]
            if pname in name_to_anim:
                dst_parent[i] = name_to_anim[pname]
                break
            p = dst_skel.parents[p]

    out = np.asarray(_retarget_jit(
        src_skel, jnp.asarray(frames), dst_skel,
        tuple(int(x) for x in dst_to_src),
        tuple(int(x) for x in dst_parent), float(scale_factor)))
    return out


import functools


@functools.partial(jax.jit, static_argnames=("src_skel", "dst_skel",
                                             "dst_to_src", "dst_parent",
                                             "scale_factor"))
def _retarget_jit(src_skel, frames, dst_skel, dst_to_src, dst_parent,
                  scale_factor):
    _, src_glob = fk_global(src_skel, frames)  # [T, n_nodes_src, 4]
    # node index of each src animated joint
    src_anim_nodes = jnp.asarray(
        [src_skel.index_of(n) for n in src_skel.animated_joints], jnp.int32)
    src_glob_anim = src_glob[:, src_anim_nodes]  # [T, J_src, 4]

    t = frames.shape[0]
    identity = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0], frames.dtype),
                                (t, 4))
    # build dst locals top-down; dst joints are listed parents-first in BVH
    # order, so earlier entries are ancestors of later ones
    glob_dst = [None] * dst_skel.n_animated
    locals_dst = [None] * dst_skel.n_animated
    for j in range(dst_skel.n_animated):
        src_j = dst_to_src[j]
        parent = dst_parent[j]
        parent_glob = glob_dst[parent] if parent >= 0 else identity
        if src_j >= 0:
            target_glob = src_glob_anim[:, src_j]
            local = quat.multiply(quat.conjugate(parent_glob), target_glob)
            glob_dst[j] = target_glob
        else:
            local = identity
            glob_dst[j] = quat.multiply(parent_glob, local)
        locals_dst[j] = quat.normalize(local)

    root = frames[:, :3] * scale_factor
    return jnp.concatenate(
        [root] + [locals_dst[j] for j in range(dst_skel.n_animated)], axis=1)
