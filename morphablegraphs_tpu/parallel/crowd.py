"""Crowd synthesis over a device mesh.

The reference has NO distributed backend (SURVEY.md §2.10: a single-process
CPU program whose only parallelism is a process-pool REST server where every
worker loads its own full graph).  The TPU-native scaling story is pure data
parallelism over *characters*:

  * one `Mesh` axis `dp`; per-character inputs (PRNG keys, start nodes,
    constraint sets) are sharded along it;
  * the stacked graph (KB-MB of fPCA/GMM parameters) is replicated — XLA
    broadcasts it over ICI once; there is no cross-character communication,
    so steady-state synthesis needs no collectives at all;
  * scaling to multi-host follows the same spec: `dp` spans all chips, DCN
    is touched only for asset loading and serving IO.

Under a single real chip this code still runs (mesh of one device); the test
suite exercises it on 8 virtual CPU devices, and `__graft_entry__.
dryrun_multichip` is the driver's validation hook.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.graph import StackedGraph
from ..synthesis import walk as walk_mod


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(devices, axis_names=(axis,))


def shard_crowd_inputs(mesh: Mesh, *arrays, axis: str = "dp"):
    """Place per-character arrays with their leading axis split over dp."""
    sh = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate_model(mesh: Mesh, model):
    """Replicate a model pytree (stacked graph / primitive) over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(model, sh)


@functools.partial(jax.jit, static_argnames=("n_steps", "max_step_frames"))
def _crowd_step(g: StackedGraph, keys, start_ids, n_steps: int,
                max_step_frames: int):
    return jax.vmap(lambda k, s: walk_mod.random_walk(
        k, g, s, n_steps=n_steps, max_step_frames=max_step_frames))(keys, start_ids)


def crowd_walk_sharded(mesh: Mesh, g: StackedGraph, key, start_id: int,
                       n_chars: int, n_steps: int = 8,
                       max_step_frames: int = 64):
    """Run a sharded crowd of random graph walks.

    n_chars must be a multiple of the mesh size.  Inputs shard over dp; the
    jitted step inherits the shardings, so XLA partitions the whole scan with
    zero inter-device communication.
    """
    n_dev = mesh.devices.size
    assert n_chars % n_dev == 0, f"{n_chars} characters over {n_dev} devices"
    keys = jax.random.split(key, n_chars)
    start_ids = jnp.full((n_chars,), start_id, jnp.int32)
    keys, start_ids = shard_crowd_inputs(mesh, keys, start_ids)
    g = replicate_model(mesh, g)
    return _crowd_step(g, keys, start_ids, n_steps, max_step_frames)


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_steps", "walk_kw",
                                    "disable_pallas_solve"))
def _constrained_crowd_step(skeleton, g: StackedGraph, keys, paths,
                            start_ids, step_scs, n_steps: int,
                            walk_kw: tuple, disable_pallas_solve: bool):
    """Module-level jit so the sharded serving path reuses ONE compiled
    program across requests (a per-call @jax.jit closure would retrace and
    recompile the ~2-minute crowd program on every batch).

    disable_pallas_solve is STATIC and applied during tracing: multi-device
    meshes must trace a program with no Mosaic ops (no GSPMD partitioning
    rule), and keying on the flag keeps the 1-device and sharded variants
    from sharing a cached jaxpr."""
    import contextlib

    from ..ops import lm as lm_ops
    from ..synthesis import constrained_walk as cw
    kw = dict(walk_kw)
    ctx = (lm_ops.pallas_solve_disabled() if disable_pallas_solve
           else contextlib.nullcontext())
    with ctx:  # trace-time: gates the custom_vmap rule's kernel choice
        return jax.vmap(lambda k, p, s: cw.constrained_walk_full(
            skeleton, k, g, p, s, n_steps=n_steps, step_scs=step_scs,
            **kw))(keys, paths, start_ids)


def constrained_crowd_sharded(mesh: Mesh, skeleton, g: StackedGraph, paths,
                              key, start_ids, n_steps: int,
                              step_scs=None, axis: str = "dp", **walk_kw):
    """Full-constraint crowd synthesis sharded over a device mesh.

    The flagship `constrained_walk_full` vmapped over characters, with
    per-character inputs (PRNG keys, paths, start nodes) sharded along
    `axis` and the stacked graph + constraint pytree replicated — the same
    layout `__graft_entry__.dryrun_multichip` validates on a virtual mesh.
    Character counts that do not divide the mesh are padded (repeating the
    first character) and the padding is sliced back off the outputs.

    Pallas caveat: Mosaic kernels have no GSPMD partitioning rule, so on a
    mesh of MORE than one device this path must not carry Pallas ops —
    `pallas_selection` is rejected, and the crowd Cholesky solve kernel is
    disabled during tracing (the vmapped unrolled solve runs instead; both
    are XLA-partitionable).  A 1-device mesh keeps the kernels.

    paths: a stacked PathSpline pytree with a leading [n_chars] axis;
    start_ids: [n_chars] int32.  Returns (segments, n_frames, node_ids,
    errors) exactly like `constrained_walk_full_crowd`.
    """
    from ..synthesis import constrained_walk as cw

    start_ids = jnp.asarray(start_ids, jnp.int32)
    n_chars = start_ids.shape[0]
    n_dev = mesh.devices.size
    if n_dev > 1 and walk_kw.get("pallas_selection"):
        raise ValueError(
            "pallas_selection under a multi-device mesh: Mosaic kernels "
            "are not GSPMD-partitionable — use the XLA selection path for "
            "sharded crowds (1-device meshes may keep the kernel)")
    pad = (-n_chars) % n_dev
    keys = jax.random.split(key, n_chars + pad)
    if pad:
        start_ids = jnp.concatenate(
            [start_ids, jnp.broadcast_to(start_ids[:1], (pad,))])
        paths = jax.tree.map(
            lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])]), paths)
    if step_scs is None:
        step_scs = cw.default_step_scs(skeleton, n_steps)
    if walk_kw.get("pallas_selection"):
        # same host-side contract check as constrained_walk_full_crowd: the
        # kernel would silently mis-rank any user slot it doesn't score
        cw.check_pallas_selection_contract(skeleton, step_scs,
                                           walk_kw.get("pallas_ee"))
    if walk_kw.get("lm_frozen") and walk_kw.get("frozen_ee") \
            and not walk_kw.get("root_only"):
        # frozen-ee models root slots + ONE position-only ee keyframe in
        # slot 2 (constrained_walk_full_crowd's check, same boundary rule);
        # the frozen-ee program is pure XLA, so it shards fine on a mesh
        from ..constraints import compiled
        if not compiled.step_scs_pallas_ee_only(
                step_scs, skeleton.index_of(walk_kw["frozen_ee"])):
            raise ValueError(
                "lm_frozen+frozen_ee models root slots plus ONE "
                f"position-only keyframe on '{walk_kw['frozen_ee']}' in "
                "slot 2; step_scs carries other user slots — use the "
                "exact LM")

    dp = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    keys, start_ids = (jax.device_put(keys, dp),
                       jax.device_put(start_ids, dp))
    paths = jax.device_put(paths, dp)
    g = jax.device_put(g, repl)
    step_scs = jax.device_put(step_scs, repl)

    # statics passed as KEYWORDS: jit's static_argnames only binds kwargs
    kw_static = tuple(sorted(walk_kw.items()))
    segs, n_frames, node_ids, errors = _constrained_crowd_step(
        skeleton, g, keys, paths, start_ids, step_scs, n_steps=n_steps,
        walk_kw=kw_static, disable_pallas_solve=n_dev > 1)
    if pad:
        segs, n_frames = segs[:n_chars], n_frames[:n_chars]
        node_ids, errors = node_ids[:n_chars], errors[:n_chars]
    return segs, n_frames, node_ids, errors
