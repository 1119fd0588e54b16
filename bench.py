"""Benchmark: crowd graph-walk synthesis throughput on one chip.

Prints ONE JSON line: frames/sec/chip for a 1024-character vmapped random
graph walk (GMM sample -> fPCA back-projection -> spline eval -> align/concat
all inside one jitted scan).  BASELINE.md config 5 target: >= 10k synthesized
frames/sec/chip on v5e-1; vs_baseline = value / 10000.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from morphablegraphs_tpu.models import graph as graph_mod
    from morphablegraphs_tpu.synthesis import walk as walk_mod
    from morphablegraphs_tpu.utils.synthetic import make_graph_dict

    n_chars = 1024
    n_steps = 8
    max_step_frames = 64

    graph = graph_mod.build_graph_from_dict(make_graph_dict())
    stacked = graph_mod.stack_graph(graph)
    start_id = stacked.node_id(("walk", "beginLeftStance"))

    @jax.jit
    def crowd(g, keys):
        # segment-form walk: scatter-free concatenation (alignment factored
        # into a boundary scan + parallel application)
        return jax.vmap(
            lambda k: walk_mod.random_walk_segments(
                k, g, jnp.asarray(start_id, jnp.int32), n_steps=n_steps,
                max_step_frames=max_step_frames))(keys)

    keys = jax.random.split(jax.random.PRNGKey(0), n_chars)
    # warmup/compile
    buf, n_valid, _, _ = crowd(stacked, keys)
    jax.block_until_ready(buf)

    n_iters = 5
    t0 = time.perf_counter()
    total_frames = 0
    for i in range(n_iters):
        keys = jax.random.split(jax.random.PRNGKey(i + 1), n_chars)
        buf, n_valid, _, _ = crowd(stacked, keys)
        jax.block_until_ready(buf)
        total_frames += int(jnp.sum(n_valid))
    dt = time.perf_counter() - t0

    fps = total_frames / dt
    print(json.dumps({
        "metric": "synthesized_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
