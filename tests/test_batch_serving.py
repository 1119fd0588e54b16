"""Batched request serving tests (request parallelism, SURVEY.md §2.10)."""

import json
import os

import numpy as np
import pytest

from morphablegraphs_tpu.models import graph as graph_mod
from morphablegraphs_tpu.models import skeleton as sk
from morphablegraphs_tpu.serve.batch import BatchedGenerator
from morphablegraphs_tpu.utils.config import default_config

from fixtures import TEST_BVH, make_graph_dict


def _traj_request(end_x, end_z):
    return {
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [{
            "action": "walk",
            "constraints": [{"joint": "Hips", "trajectoryConstraints": [
                {"position": [0, None, 0]},
                {"position": [end_x / 2, None, end_z / 2]},
                {"position": [end_x, None, end_z]}]}],
        }],
    }


def _keyframe_request():
    return {
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [{
            "action": "walk",
            "constraints": [{"joint": "Hips", "keyframeConstraints": [
                {"position": [5, None, 30], "semanticAnnotation": {"end": True}}]}],
        }],
    }


@pytest.fixture(scope="module")
def graph():
    g = graph_mod.build_graph_from_dict(make_graph_dict())
    skel, _ = sk.load_bvh(TEST_BVH)
    g.skeleton = skel
    return g


def _hand_traj_request():
    """A LeftHand trajectory is NOT a walking path — must not batch."""
    r = _traj_request(10, 100)
    r["elementaryActions"][0]["constraints"][0]["joint"] = "LeftHand"
    return r


def _long_traj_request(n=40):
    """More control points than the padded PathSpline holds — must fall
    back instead of asserting inside the batch."""
    return {
        "startPose": {"position": [0, 0, 0], "orientation": [0, 0, 0]},
        "elementaryActions": [{
            "action": "walk",
            "constraints": [{"joint": "Hips", "trajectoryConstraints": [
                {"position": [5.0 * i, None, 10.0 * i]} for i in range(n)]}],
        }],
    }


def test_split_batchable(graph):
    bg = BatchedGenerator(graph)
    reqs = [_traj_request(10, 100), _keyframe_request(), _traj_request(-10, 80),
            {"garbage": True}, _hand_traj_request(), _long_traj_request()]
    batchable, fallback, parsed = bg.split_batchable(reqs)
    assert batchable == [0, 2]
    assert fallback == [1, 3, 4, 5]
    assert parsed[0] is not None and parsed[2] is not None
    assert parsed[1] is None


def test_generate_batch(graph):
    bg = BatchedGenerator(graph, n_steps=6, n_samples=16)
    reqs = [_traj_request(20, 100), _traj_request(-20, 100),
            _traj_request(0, 120)]
    outs = bg.generate_batch(reqs)
    assert len(outs) == 3
    finals = []
    for frames in outs:
        assert frames.shape[0] > 30
        assert not np.any(np.isnan(frames))
        finals.append(frames[-1][:3])
    # different trajectories -> different final positions
    assert np.std([f[0] for f in finals]) > 3.0


def test_batch_endpoint(graph):
    os.environ["ASYNC_TEST_TIMEOUT"] = "500"
    import tornado.testing
    from morphablegraphs_tpu.serve.rest import MGContext, make_app
    cfg = default_config()
    cfg["n_random_samples"] = 10
    cfg["lm_iterations"] = 2
    ctx = MGContext(graph, cfg)
    # warm jit caches on the main thread via the SAME cached generator the
    # handler will use (see test_serve.test_rest_api note)
    ctx.batched_generator().generate_batch([_traj_request(15, 90)])

    class Case(tornado.testing.AsyncHTTPTestCase):
        def get_app(self):
            return make_app(ctx)

        def test_batch(self):
            body = {"requests": [_traj_request(15, 90), _traj_request(-15, 90)]}
            resp = self.fetch("/run_morphablegraphs_batch", method="POST",
                              body=json.dumps(body), request_timeout=480)
            assert resp.code == 200
            data = json.loads(resp.body)
            assert len(data["results"]) == 2
            for r in data["results"]:
                assert r["batched"] is True
                assert "HIERARCHY" in r["bvh"]

        def test_batch_bad(self):
            resp = self.fetch("/run_morphablegraphs_batch", method="POST",
                              body="[]")
            assert resp.code == 400

    for name in ["test_batch_bad", "test_batch"]:
        case = Case(name)
        case.setUp()
        try:
            getattr(case, name)()
        finally:
            case.tearDown()
