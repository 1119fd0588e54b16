"""Compiler-static evidence for the LM op-overhead analysis.

Counts optimized-HLO instructions (fusions = dispatched kernels on TPU,
total instructions, dots/convs) and XLA cost-analysis flops/bytes for the
reference-scale crowd program under the LM variants docs/architecture.md
discusses (exact vs frozen-correspondence LM, with/without trajectory
residuals).  Instruction counts are shape-light and platform-portable, so
this runs on CPU while TPU wall-clock A/Bs (benchmarks/breakdown.py,
bench.py extras) need the tunnel.

The op-overhead wall (docs/architecture.md Known limits): each LM iteration
of the vmapped crowd walk decomposes into ~1,700 small vector ops; this
script is the receipt for how the frozen path shrinks that and how much
program remains per iteration.
"""

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

# AVX2 codegen baseline BEFORE backend init: this writes into the shared
# test cache, whose AOT entries must stay loadable on every host
_xf = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_max_isa" not in _xf:
    os.environ["XLA_FLAGS"] = (_xf + " --xla_cpu_max_isa=AVX2").strip()

import jax

if __name__ == "__main__":
    # CPU is fine: HLO instruction structure, not wall clock
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mg_tests_avx2")

import jax.numpy as jnp


def count_ops(compiled) -> dict:
    """Instruction histogram of the optimized HLO module."""
    text = compiled.as_text()
    total = fusions = dots = loops = 0
    for line in text.splitlines():
        s = line.strip()
        if "=" not in s or s.startswith(("HloModule", "ENTRY", "//", "%")):
            # count only instruction lines ("x = op(...)"); region headers
            # and module boilerplate don't dispatch
            pass
        if " = " not in s:
            continue
        total += 1
        rhs = s.split(" = ", 1)[1]
        head = rhs.split("(", 1)[0].split()
        op = head[-1] if head else rhs
        if op.startswith("fusion"):
            fusions += 1
        elif op.startswith(("dot", "convolution")):
            dots += 1
        elif op.startswith("while"):
            loops += 1
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", -1))
        bytes_ = float(cost.get("bytes accessed", -1))
    except Exception:
        flops = bytes_ = -1.0
    return {"instructions": total, "fusions": fusions, "dots": dots,
            "while_loops": loops, "flops": flops, "bytes": bytes_}


def main():
    from morphablegraphs_tpu.constraints import compiled as cmp
    from morphablegraphs_tpu.models import graph as graph_mod
    from morphablegraphs_tpu.models import skeleton as sk
    from morphablegraphs_tpu.ops import spline_path
    from morphablegraphs_tpu.synthesis import constrained_walk as cw
    from morphablegraphs_tpu.utils.synthetic import (
        REF_BVH, make_reference_scale_graph_dict)
    from bench import rand_path

    # op counts are independent of the crowd width; small C compiles fast
    n_chars = int(os.environ.get("MG_HLO_CHARS", "64"))
    n_steps = 4

    graph = graph_mod.build_graph_from_dict(make_reference_scale_graph_dict())
    skel, _ = sk.load_bvh(REF_BVH)
    stacked = graph_mod.stack_graph(graph)
    start_id = stacked.node_id(("walk", "beginLeftStance"))
    rng = np.random.default_rng(0)
    paths = cw.stack_paths([rand_path(rng, spline_path)
                            for _ in range(n_chars)])
    start_ids = jnp.full((n_chars,), start_id, jnp.int32)
    step_scs = cw.default_step_scs(skel, n_steps)
    # same static flag bench.py derives for the ref headline: locomotion
    # slots only -> the whole walk (incl. the exact LM) skips per-joint FK,
    # so exact vs frozen isolates the closest-point/tangent chain alone
    root_only = cmp.step_scs_root_only(step_scs)
    keys = jax.random.split(jax.random.PRNGKey(0), n_chars)

    variants = [
        # lm_iters 0 vs 3 isolates the per-iteration LM program; exact vs
        # frozen isolates the advancing-closest-point tangent chain; frozen
        # linearize vs closed isolates the fused value+jacobian iteration
        # (compiled.make_frozen_root_residuals_closed)
        ("no_lm", dict(n_samples=128, lm_iters=0)),
        ("exact_lm3", dict(n_samples=128, lm_iters=3)),
        ("frozen_lm3", dict(n_samples=128, lm_iters=3, lm_frozen=True,
                            lm_frozen_closed=False)),
        ("frozen_closed_lm3", dict(n_samples=128, lm_iters=3,
                                   lm_frozen=True)),
    ]

    results = {}
    for name, kw in variants:
        fn = lambda k, p, s, kw=kw: jax.vmap(
            lambda kk, pp, ss: cw.constrained_walk_full(
                skel, kk, stacked, pp, ss, n_steps=n_steps,
                max_step_frames=160, step_scs=step_scs,
                root_only=root_only, **kw))(k, p, s)
        compiled = jax.jit(fn).lower(keys, paths, start_ids).compile()
        results[name] = count_ops(compiled)
        print(name, json.dumps(results[name]), flush=True)

    if {"no_lm", "exact_lm3", "frozen_lm3"} <= results.keys():
        base = results["no_lm"]["instructions"]
        for v in ("exact_lm3", "frozen_lm3", "frozen_closed_lm3"):
            per_iter = (results[v]["instructions"] - base) / 3.0
            print(f"# {v}: ~{per_iter:.0f} HLO instructions per LM "
                  f"iteration (over the no-LM program)", flush=True)


if __name__ == "__main__":
    main()
