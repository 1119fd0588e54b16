"""End-to-end demo: build a synthetic walk graph, run constrained synthesis
from a constraint-input JSON, export BVH + annotations, and run the crowd
path.

Usage: python examples/run_demo.py [output_dir]
"""

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def main(output_dir="demo_output"):
    from morphablegraphs_tpu.models import graph as graph_mod
    from morphablegraphs_tpu.models import skeleton as sk
    from morphablegraphs_tpu.ops import spline_path
    from morphablegraphs_tpu.serve.export import AnnotatedMotion
    from morphablegraphs_tpu.synthesis import constrained_walk as cw
    from morphablegraphs_tpu.synthesis import walk as walk_mod
    from morphablegraphs_tpu.synthesis.motion_generator import MotionGenerator
    from morphablegraphs_tpu.utils.config import default_config
    from morphablegraphs_tpu.utils.synthetic import TEST_BVH, make_graph_dict

    os.makedirs(output_dir, exist_ok=True)

    # 1. graph (swap for graph_mod.load_graph("your_graph.zip") with real data)
    graph = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    graph.skeleton = skel

    # 2. constrained synthesis from an input file
    with open(os.path.join(os.path.dirname(__file__), "demo_input.json")) as f:
        mg_input = json.load(f)
    cfg = default_config()
    cfg["n_random_samples"] = 50
    gen = MotionGenerator(graph, cfg, seed=0)
    result = gen.generate_motion(mg_input, activate_coordinate_transform=False)
    motion = AnnotatedMotion(skel, result.frames, result.action_ranges)
    motion.export(os.path.join(output_dir, "constrained"))
    print(f"constrained: {len(result.frames)} frames, "
          f"avg error {result.stats['average_error']:.2f} "
          f"-> {output_dir}/constrained.bvh")

    # 3. crowd: 64 characters, each following its own path, one device launch
    stacked = graph_mod.stack_graph(graph)
    start = stacked.node_id(("walk", "beginLeftStance"))
    rng = np.random.default_rng(0)
    paths = cw.stack_paths([
        spline_path.build(np.array(
            [[0, 0, 0],
             [rng.uniform(-30, 30), 0, 60],
             [rng.uniform(-50, 50), 0, 120]], np.float32),
            unconstrained_dims=(1,))
        for _ in range(64)])
    segs, n_frames, ids, errs = cw.constrained_walk_crowd(
        jax.random.PRNGKey(0), stacked, paths, start, n_chars=64, n_steps=6)
    flat0 = walk_mod.flatten_segments(segs[0], n_frames[0])
    sk.write_bvh(skel, flat0, os.path.join(output_dir, "crowd_character0.bvh"))
    total = int(jnp.sum(n_frames))
    print(f"crowd: 64 characters, {total} frames total, "
          f"mean constraint error {float(jnp.mean(errs)):.1f} "
          f"-> {output_dir}/crowd_character0.bvh")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "demo_output")
