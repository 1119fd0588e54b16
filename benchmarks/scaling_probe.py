"""Crowd-size scaling probe for the headline constrained-walk program.

The roofline receipts put the 1024-character headline at ~12% of HBM peak —
op-overhead/latency bound, not bandwidth bound — so throughput should rise
with crowd size as fixed per-op overheads amortize.  This probe AOT-compiles
the exact bench.py ref workload at several crowd sizes and prints
frames/s/chip for each, to pick the best default for throughput-oriented
serving (the BASELINE config-3 headline stays at 1024 characters — this is
an extras measurement, not the official number).

Run on TPU (slow compiles, ~1-2 min per size):
    python benchmarks/scaling_probe.py [sizes...]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main(sizes):
    from morphablegraphs_tpu.models import graph as graph_mod
    from morphablegraphs_tpu.models import skeleton as sk
    from morphablegraphs_tpu.ops import spline_path
    from morphablegraphs_tpu.synthesis import constrained_walk as cw
    from morphablegraphs_tpu.utils.synthetic import (
        REF_BVH, make_reference_scale_graph_dict)
    from bench import rand_path

    n_steps = 8
    graph = graph_mod.build_graph_from_dict(make_reference_scale_graph_dict())
    skel, _ = sk.load_bvh(REF_BVH)
    stacked = graph_mod.stack_graph(graph)
    start_id = stacked.node_id(("walk", "beginLeftStance"))
    step_scs = cw.default_step_scs(skel, n_steps)

    for n_chars in sizes:
        rng = np.random.default_rng(0)
        paths = cw.stack_paths([rand_path(rng, spline_path)
                                for _ in range(n_chars)])
        start_ids = jnp.full((n_chars,), start_id, jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(0), n_chars)

        @jax.jit
        def crowd(g, ks, sids, paths=paths):
            return jax.vmap(lambda k, p, s: cw.constrained_walk_full(
                skel, k, g, p, s, n_steps=n_steps, step_scs=step_scs,
                max_step_frames=160, n_samples=128, lm_iters=3,
                lm_threshold=5.0, pallas_selection=True, root_only=True,
                lm_frozen=True, lm_frozen_closed=True))(ks, paths, sids)

        t0 = time.perf_counter()
        compiled = crowd.lower(stacked, keys, start_ids).compile()
        tc = time.perf_counter() - t0
        out = compiled(stacked, keys, start_ids)
        jax.block_until_ready(out)
        n_iters = 3
        outs = []
        t0 = time.perf_counter()
        for i in range(n_iters):
            outs.append(compiled(stacked, jax.random.split(
                jax.random.PRNGKey(i + 1), n_chars), start_ids))
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n_iters
        frames = float(jnp.sum(outs[-1][1]))
        print(f"chars={n_chars:5d}  {dt*1e3:7.0f} ms/iter  "
              f"{frames/dt/1e6:6.2f}M frames/s  (compile {tc:.0f}s)",
              flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    main(sizes)
