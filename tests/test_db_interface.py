"""serve/db_interface: endpoint payload shapes + session-auth threading
(reference utilities/db_interface.py + examples/utils.py get_session),
exercised against a mocked HTTP transport — no network.
"""

import numpy as np
import pytest

from morphablegraphs_tpu.serve import db_interface as dbi


class _Resp:
    def __init__(self, payload):
        self._payload = payload

    def raise_for_status(self):
        pass

    def json(self):
        return self._payload


@pytest.fixture
def transport(monkeypatch):
    """Record every POST; reply from a route -> payload table."""
    calls = []
    replies = {}

    def fake_post(url, json=None, timeout=None):
        calls.append((url, json))
        route = url.rsplit("/", 1)[-1]
        reply = replies.get(route, {})
        if callable(reply):
            reply = reply(json)
        return _Resp(reply)

    monkeypatch.setattr(dbi.requests, "post", fake_post)
    return calls, replies


def test_authenticate_and_get_session(transport):
    calls, replies = transport
    replies["authenticate"] = {"token": "abc123"}
    session = dbi.get_session("http://db", user="u", password="pw")
    assert session == {"user": "u", "token": "abc123"}
    assert calls[0][0] == "http://db/authenticate"
    assert calls[0][1] == {"username": "u", "password": "pw"}

    # direct token, no request
    n = len(calls)
    session = dbi.get_session("http://db", user="u", token="t9")
    assert session == {"user": "u", "token": "t9"} and len(calls) == n

    # failed auth -> None
    replies["authenticate"] = {"error": "bad"}
    assert dbi.get_session("http://db", user="u", password="x") is None


def test_session_is_merged_into_payloads(transport):
    calls, replies = transport
    session = {"user": "u", "token": "t"}
    replies["get_motion_list"] = [{"id": 7}]
    dbi.get_motion_list_from_remote_db("http://db", 3, "custom", session=session)
    url, payload = calls[-1]
    assert url == "http://db/get_motion_list"
    assert payload["collection_id"] == 3
    assert payload["session"] == session
    # without a session the key is absent (anonymous servers)
    dbi.download_motion_from_remote_db("http://db", 7)
    assert "session" not in calls[-1][1]


def test_db_backed_training_pipeline(transport):
    """create_motion_model_in_db: list -> download each -> train -> upload."""
    import jax
    from morphablegraphs_tpu.models import primitive as prim_mod
    from morphablegraphs_tpu.models import skeleton as sk
    from morphablegraphs_tpu.utils.synthetic import TEST_BVH, make_legacy_model_json

    calls, replies = transport
    skel, _ = sk.load_bvh(TEST_BVH)
    src = prim_mod.load_primitive_json(make_legacy_model_json(seed=3, n_joints=4))
    clips = {}
    for i in range(4):
        s = prim_mod.sample_latent(jax.random.PRNGKey(i), src, 1)[0]
        frames, n, _ = prim_mod.back_project(src, s, 96)
        clips[i] = np.asarray(frames)[: int(n)].tolist()
    replies["get_motion_list"] = [{"id": i} for i in range(4)]
    replies["download_motion"] = lambda p: {"frames": clips[p["motion_id"]]}
    model = dbi.create_motion_model_in_db(
        "http://db", 3, "custom", skel, "walk_leftStance", version=3,
        config={"max_gmm_components": 2, "npc_temporal": 2},
        session={"user": "u", "token": "t"})
    assert "sspm" in model
    routes = [u.rsplit("/", 1)[-1] for u, _ in calls]
    assert routes[0] == "get_motion_list"
    assert routes.count("download_motion") == 4
    assert routes[-1] == "upload_motion_model"
    # session threaded through every call of the pipeline
    assert all(p.get("session") == {"user": "u", "token": "t"}
               for _, p in calls)
