"""Attribute headline-iteration time to its stages by toggling them off.

Runs the reference-scale crowd program (bench.py workload) in several
variants and prints sec/iter for each; the deltas attribute the cost of the
gated LM refinement, the trajectory residuals, and the Pallas selection
kernel.  Each variant AOT-compiles once (~2 min on the tunnel TPU) — run in
the background.
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


def main():
    from morphablegraphs_tpu.models import graph as graph_mod
    from morphablegraphs_tpu.models import skeleton as sk
    from morphablegraphs_tpu.ops import spline_path
    from morphablegraphs_tpu.synthesis import constrained_walk as cw
    from morphablegraphs_tpu.utils.synthetic import (
        REF_BVH, make_reference_scale_graph_dict)
    from bench import rand_path

    n_chars = 1024
    n_steps = 8

    graph = graph_mod.build_graph_from_dict(make_reference_scale_graph_dict())
    skel, _ = sk.load_bvh(REF_BVH)
    stacked = graph_mod.stack_graph(graph)
    start_id = stacked.node_id(("walk", "beginLeftStance"))

    rng = np.random.default_rng(0)
    paths = cw.stack_paths([rand_path(rng, spline_path)
                            for _ in range(n_chars)])
    start_ids = jnp.full((n_chars,), start_id, jnp.int32)
    step_scs = cw.default_step_scs(skel, n_steps)
    keys = jax.random.split(jax.random.PRNGKey(0), n_chars)

    # the headline (bench.py ref config) runs root_only=True (the ref
    # workload's constraints are all root-referencing) with the
    # frozen-correspondence closed-form LM — variants peel one feature at a
    # time so the deltas attribute cost to the LM form, the trajectory
    # residuals, and the Pallas selection kernel
    variants = [
        ("full (headline: frozen-closed LM)",
         dict(n_samples=128, lm_iters=3, pallas_selection=True,
              root_only=True, lm_frozen=True, lm_frozen_closed=True)),
        ("frozen-linearize LM",
         dict(n_samples=128, lm_iters=3, pallas_selection=True,
              root_only=True, lm_frozen=True, lm_frozen_closed=False)),
        ("exact LM",
         dict(n_samples=128, lm_iters=3, pallas_selection=True,
              root_only=True, lm_frozen=False)),
        ("full, no traj residuals",
         dict(n_samples=128, lm_iters=3, pallas_selection=False,
              use_traj=False, root_only=True, lm_frozen=True,
              lm_frozen_closed=True)),
        ("no LM",
         dict(n_samples=128, lm_iters=0, pallas_selection=True,
              root_only=True)),
        ("no LM, no traj residuals",
         dict(n_samples=128, lm_iters=0, use_traj=False,
              pallas_selection=False, root_only=True)),
        # floor attribution: with ONE candidate there is no ranking work
        # (sampling + selection kernel collapse); what remains is the
        # winner's exact re-score, back-projection, alignment/smoothing,
        # arc advancement, and scan machinery.  Delta vs "no LM"
        # attributes the sampling+selection cost inside the floor.
        ("no LM, 1 sample (floor sans selection)",
         dict(n_samples=1, lm_iters=0, pallas_selection=False,
              root_only=True)),
        # floor decomposition (round 5): peel the advancing closest-point
        # machinery (selection scoring + winner re-score + travelled-arc
        # update all query the table) and the seam smoothing out of the
        # 1-sample floor
        ("no LM, 1 sample, no traj",
         dict(n_samples=1, lm_iters=0, pallas_selection=False,
              use_traj=False, root_only=True)),
        ("no LM, 1 sample, no smoothing",
         dict(n_samples=1, lm_iters=0, pallas_selection=False,
              root_only=True, window=0)),
        # per-iteration LM slope: (3-iter - 1-iter)/2 = marginal cost of
        # one closed-form LM iteration (VJP pass + contractions + solve)
        ("frozen-closed, 1 LM iter",
         dict(n_samples=128, lm_iters=1, pallas_selection=True,
              root_only=True, lm_frozen=True, lm_frozen_closed=True)),
        ("XLA selection (no pallas)",
         dict(n_samples=128, lm_iters=3, pallas_selection=False,
              root_only=True, lm_frozen=True, lm_frozen_closed=True)),
    ]

    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, kw in variants:
        if only and only not in name:
            continue
        @jax.jit
        def crowd(g, ks, sids, kw=kw):
            return jax.vmap(lambda k, p, s: cw.constrained_walk_full(
                skel, k, g, p, s, n_steps=n_steps, step_scs=step_scs,
                max_step_frames=160, lm_threshold=5.0, **kw))(ks, paths, sids)

        t0 = time.perf_counter()
        compiled = crowd.lower(stacked, keys, start_ids).compile()
        tc = time.perf_counter() - t0
        segs, nf, _, errs = compiled(stacked, keys, start_ids)
        jax.block_until_ready(segs)
        n_iters = 3
        outs = []
        t0 = time.perf_counter()
        for i in range(n_iters):
            o = compiled(stacked, jax.random.split(
                jax.random.PRNGKey(i + 1), n_chars), start_ids)
            outs.append(o)
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n_iters
        mean_err = float(jnp.mean(jnp.where(outs[-1][1] > 0, outs[-1][3], 0)))
        print(f"{name:32s} {dt*1e3:7.0f} ms/iter  (compile {tc:.0f}s, "
              f"mean step err {mean_err:.2f})", flush=True)


if __name__ == "__main__":
    main()
