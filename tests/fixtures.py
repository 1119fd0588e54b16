"""Test fixtures: re-export the package's synthetic builders."""

from morphablegraphs_tpu.utils.synthetic import (  # noqa: F401
    TEST_BVH, WALK_BVH, N_JOINTS, make_legacy_model_json, make_graph_dict,
    make_multi_action_graph_dict, to_v3_json)
