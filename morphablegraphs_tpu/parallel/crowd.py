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
