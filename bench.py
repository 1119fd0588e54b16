"""Benchmark: constrained crowd walk synthesis throughput on one chip.

Prints ONE JSON line with the BASELINE.json headline metric: frames/sec/chip
for CONSTRAINED walk synthesis.  The default workload is the REFERENCE-SCALE
model (19 joints -> 79 frame channels, n_basis 16, k_s 25, k_t 3, ~130
canonical frames — the reference's production dimensions, SURVEY.md §2.1)
with the COMPLETE constraint semantics: 1024 vmapped characters each
following their own trajectory spline; per step, best-of-64 GMM candidates
scored under the full compiled constraint set (locomotion goal keyframe +
2D direction + trajectory residuals with advancing closest-point arc) and a
lax.cond-gated Levenberg-Marquardt refinement — all inside one jitted scan
(synthesis/constrained_walk.constrained_walk_full).

Target: >= 10k frames/sec/chip on v5e-1 (BASELINE.md config 3+5);
vs_baseline = value / 10000.

Also reports an estimated-FLOPs roofline line on stderr (XLA cost analysis
of the compiled crowd program vs the chip's nominal peak).

Set MG_BENCH_CONFIG=toy for the round-1 smoke config (4-joint model,
boundary-row-only scoring — kept for regression comparison), or
MG_BENCH_CONFIG=ee for the end-effector variant: every step additionally
carries a non-root RightHand keyframe constraint, so candidate scoring and
the (always-triggered) LM refinement run the full per-joint FK chain — the
heaviest constraint semantics the reference's pick/place actions exercise
(reference motion_primitive_constraints_builder.py:218-230).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# v5e nominal peaks (public spec): 197 TFLOP/s bf16, ~98.5 TFLOP/s f32
# (one MXU pass per f32 product), 819 GB/s HBM.
PEAK_F32_FLOPS = 98.5e12
PEAK_HBM_BYTES = 819e9


def rand_path(rng, spline_path, granularity=256):
    pts = [[0.0, 0.0, 0.0]]
    x, z, h = 0.0, 0.0, rng.uniform(-0.6, 0.6)
    for _ in range(3):
        h += rng.uniform(-0.4, 0.4)
        x += 60 * np.sin(h)
        z += 60 * np.cos(h)
        pts.append([x, 0.0, z])
    # granularity 256 (vs the reference's 1000 default): measured IDENTICAL
    # mean constraint error on these paths at 2.5x throughput (the
    # per-character arc tables dominate bandwidth)
    return spline_path.build(np.asarray(pts, np.float32),
                             unconstrained_dims=(1,), granularity=granularity)


def main():
    from morphablegraphs_tpu.models import graph as graph_mod
    from morphablegraphs_tpu.models import skeleton as sk
    from morphablegraphs_tpu.ops import spline_path
    from morphablegraphs_tpu.synthesis import constrained_walk as cw
    from morphablegraphs_tpu.utils.synthetic import (
        REF_BVH, TEST_BVH, make_graph_dict, make_reference_scale_graph_dict)

    config = os.environ.get("MG_BENCH_CONFIG", "ref")
    n_chars = 1024
    n_steps = 8
    n_samples = 64

    if config == "toy":
        graph = graph_mod.build_graph_from_dict(make_graph_dict())
        bvh = TEST_BVH
    else:
        graph = graph_mod.build_graph_from_dict(
            make_reference_scale_graph_dict())
        bvh = REF_BVH
    skel, _ = sk.load_bvh(bvh)
    stacked = graph_mod.stack_graph(graph)
    start_id = stacked.node_id(("walk", "beginLeftStance"))

    rng = np.random.default_rng(0)
    paths = cw.stack_paths([rand_path(rng, spline_path)
                            for _ in range(n_chars)])
    start_ids = jnp.full((n_chars,), start_id, jnp.int32)
    if config == "ee":
        # a RightHand end-effector keyframe on EVERY step (kf slots 0/1 are
        # the locomotion goals; user slots start at 2): forces the full FK
        # chain into candidate scoring and every LM tangent, and the large
        # world-space error keeps the lax.cond LM gate always on
        from morphablegraphs_tpu.constraints import compiled as cmp
        base = cmp.empty_step_constraints(skel, 0)
        base = cmp.set_keyframe_constraint(
            base, 2, skel, "RightHand", 129.0,
            position=np.array([20.0, 110.0, 80.0], np.float32))
        step_scs = jax.tree.map(
            lambda x: np.broadcast_to(np.asarray(x),
                                      (n_steps,) + np.shape(x)), base)
    else:
        step_scs = cw.default_step_scs(skel, n_steps)

    # the fused Pallas selection kernel (10.1x the XLA candidate scoring at
    # 10k candidates, measured on v5e-1) is the default on TPU; CPU runs and
    # the toy config keep the XLA path.  The ee config also keeps XLA
    # selection: the kernel covers the locomotion family only, and the hand
    # keyframe must participate in selection, not just refinement.
    use_pallas = (jax.default_backend() == "tpu"
                  and config not in ("toy", "ee"))
    if use_pallas:
        n_samples = 128  # lane-width multiple; scoring 128 costs the same

    if config == "toy":
        @jax.jit
        def crowd(g, keys, sids):
            return jax.vmap(lambda k, p, s: cw.constrained_walk(
                k, g, p, s, n_steps=n_steps, max_step_frames=64,
                n_samples=n_samples))(keys, paths, sids)
    else:
        from morphablegraphs_tpu.constraints import compiled
        root_only = compiled.step_scs_root_only(step_scs)
        # frozen-correspondence LM (root-only fast path): the advancing
        # closest-point scan runs once per LM iteration instead of once per
        # jacobian tangent; MG_BENCH_LM_FROZEN=1 opts in (off until the
        # TPU-measured win is recorded)
        lm_frozen = (root_only
                     and os.environ.get("MG_BENCH_LM_FROZEN", "0") == "1")

        @jax.jit
        def crowd(g, keys, sids):
            return jax.vmap(lambda k, p, s: cw.constrained_walk_full(
                skel, k, g, p, s, n_steps=n_steps, step_scs=step_scs,
                max_step_frames=160, n_samples=n_samples,
                lm_iters=3, lm_threshold=5.0,
                pallas_selection=use_pallas,
                root_only=root_only, lm_frozen=lm_frozen))(keys, paths, sids)

    keys = jax.random.split(jax.random.PRNGKey(0), n_chars)
    # AOT: ONE compile serves both the cost analysis and the timed runs
    # (calling the jit wrapper and separately lower().compile() would
    # compile the 2-minute program twice)
    t0 = time.perf_counter()
    compiled = crowd.lower(stacked, keys, start_ids).compile()
    print(f"# compile: {time.perf_counter() - t0:.0f}s", file=sys.stderr)
    try:
        cost = compiled.cost_analysis() or {}
        flops = float(cost.get("flops", 0.0))
        bytes_accessed = float(cost.get("bytes accessed", 0.0))
    except Exception:  # cost analysis is backend-dependent
        flops = bytes_accessed = 0.0
    crowd = compiled
    segs, nf, _, _ = crowd(stacked, keys, start_ids)  # warmup
    jax.block_until_ready(segs)

    n_iters = 5
    # pre-stage per-iteration keys on device: key splitting is host-side
    # bookkeeping, and over the remote-TPU tunnel each extra dispatch adds
    # latency noise that is not part of the synthesis workload
    all_keys = [jax.device_put(jax.random.split(jax.random.PRNGKey(i + 1),
                                                n_chars))
                for i in range(n_iters)]
    jax.block_until_ready(all_keys)
    # pipelined dispatch, one final barrier: the launches are independent
    # and queue on the device, so wall clock covers all n_iters of compute
    # plus a single tunnel round-trip.  Per-iteration host pulls each cost a
    # full round-trip on remote-attached TPUs — measured 3x the device time
    # at this workload size.
    outs = []
    t0 = time.perf_counter()
    for i in range(n_iters):
        segs, nf, _, _ = crowd(stacked, all_keys[i], start_ids)
        outs.append((segs, nf))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    total = int(sum(int(jnp.sum(nf)) for _, nf in outs))

    fps = total / dt
    if flops:
        per_iter = dt / n_iters
        mfu = flops / per_iter / PEAK_F32_FLOPS
        hbm = bytes_accessed / per_iter / PEAK_HBM_BYTES
        print(f"# roofline ({config}): {flops/1e9:.1f} GFLOP/iter, "
              f"{bytes_accessed/1e9:.2f} GB/iter, {per_iter*1e3:.0f} ms/iter "
              f"-> {flops/per_iter/1e12:.2f} TFLOP/s ({100*mfu:.1f}% of f32 "
              f"peak), {bytes_accessed/per_iter/1e9:.0f} GB/s "
              f"({100*hbm:.1f}% of HBM peak)", file=sys.stderr)
    print(json.dumps({
        "metric": "constrained_synthesis_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
