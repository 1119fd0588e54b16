"""Remote motion-database interface.

Replaces reference utilities/db_interface.py: HTTP client for the motion DB
used to download clips/skeletons/graphs, upload trained models, and run the
training/alignment pipelines against DB-hosted data
(motion_state_graph_loader.py:76-180 build_from_database consumes these).

All endpoints follow the reference's REST shape (POST with JSON bodies to
<url>/<route>).  Network access is isolated here so everything else stays
testable offline.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
import requests


def authenticate(url: str, user: str, password: str) -> dict:
    """POST /authenticate and return the server reply (contains "token" on
    success) — reference motion_db_interface.authenticate used by
    examples/utils.py get_session."""
    return _post(url, "authenticate", {"username": user, "password": password})


def get_session(url: str, user: Optional[str] = None,
                password: Optional[str] = None,
                token: Optional[str] = None) -> Optional[dict]:
    """Session dict for DB requests (reference examples/utils.py:3-11):
    user+password -> authenticate for a token; user+token -> use directly."""
    if user is not None and password is not None:
        result = authenticate(url, user, password)
        if isinstance(result, dict) and "token" in result:
            return {"user": user, "token": result["token"]}
        return None
    if user is not None and token is not None:
        return {"user": user, "token": token}
    return None


def _post(url: str, route: str, data: dict, timeout: float = 60.0,
          session: Optional[dict] = None):
    if session is not None:
        data = dict(data, session=session)
    resp = requests.post(url.rstrip("/") + "/" + route, json=data,
                         timeout=timeout)
    resp.raise_for_status()
    try:
        return resp.json()
    except json.JSONDecodeError:
        return resp.text


def get_skeleton_from_remote_db(url: str, skeleton_name: str, session=None):
    return _post(url, "get_skeleton", {"skeleton_name": skeleton_name}, session=session)


def get_skeleton_model_from_remote_db(url: str, skeleton_name: str, session=None):
    return _post(url, "get_skeleton_model", {"skeleton_name": skeleton_name}, session=session)


def download_graph_from_remote_db(url: str, graph_id, session=None):
    return _post(url, "download_graph", {"graph_id": graph_id}, session=session)


def download_motion_model_from_remote_db(url: str, model_id, session=None):
    return _post(url, "download_motion_model", {"model_id": model_id}, session=session)


def download_cluster_tree_from_remote_db(url: str, model_id, session=None):
    try:
        return _post(url, "download_cluster_tree", {"model_id": model_id},
                     session=session)
    except requests.RequestException:
        return None


def get_motion_list_from_remote_db(url: str, collection_id, skeleton_name: str,
                                  session=None):
    return _post(url, "get_motion_list", {"collection_id": collection_id,
                                          "skeleton": skeleton_name},
                 session=session)


def download_motion_from_remote_db(url: str, motion_id, session=None):
    return _post(url, "download_motion", {"motion_id": motion_id}, session=session)


def upload_motion_model(url: str, name: str, collection_id, skeleton_name: str,
                        model_data: dict, session=None):
    return _post(url, "upload_motion_model",
                 {"name": name, "collection": collection_id,
                  "skeleton": skeleton_name, "data": model_data},
                 session=session)


def upload_cluster_tree(url: str, model_id, tree_data: dict, session=None):
    return _post(url, "upload_cluster_tree",
                 {"model_id": model_id, "cluster_tree_data": tree_data},
                 session=session)


# ---------------------------------------------------------------------------
# DB-backed pipelines (reference db_interface.py:178-430)
# ---------------------------------------------------------------------------

def align_motion_data_in_db(url: str, collection_id, skeleton_name: str,
                            skeleton, constructor_config: Optional[dict] = None,
                            session: Optional[dict] = None):
    """Download a collection's motions, run spatial+temporal alignment, and
    return the aligned frames + warps (reference align_motion_data :178).

    constructor_config: optional {"ref_orientation": (x, z),
    "mean_key": motion id} alignment options."""
    from ..construct.constructor import (align_frames_spatially,
                                         align_frames_temporally)
    motion_list = get_motion_list_from_remote_db(url, collection_id, skeleton_name,
                                                 session=session)
    motions = {}
    for entry in motion_list or []:
        m = download_motion_from_remote_db(url, entry["id"], session=session)
        if m is not None:
            motions[entry["id"]] = np.asarray(m["frames"], np.float64)
    if not motions:
        return None, None
    cfg = constructor_config or {}
    aligned = align_frames_spatially(
        motions, ref_orientation=cfg.get("ref_orientation", (0.0, -1.0)))
    return align_frames_temporally(skeleton, aligned,
                                   mean_key=cfg.get("mean_key"))


def create_motion_model_in_db(url: str, collection_id, skeleton_name: str,
                              skeleton, name: str, version: int = 3,
                              config: Optional[dict] = None,
                              session: Optional[dict] = None):
    """Train a model on a DB collection and upload it (reference
    create_motion_model_in_db :274)."""
    from ..construct.constructor import MotionModelConstructor
    motion_list = get_motion_list_from_remote_db(url, collection_id, skeleton_name,
                                                 session=session)
    motions = {}
    for entry in motion_list or []:
        m = download_motion_from_remote_db(url, entry["id"], session=session)
        if m is not None:
            motions[entry["id"]] = np.asarray(m["frames"], np.float64)
    if not motions:
        raise ValueError("no motions in collection")
    c = MotionModelConstructor(skeleton, config)
    c.set_motions(motions)
    model = c.construct_model(name, version=version)
    upload_motion_model(url, name, collection_id, skeleton_name, model,
                        session=session)
    return model


def create_cluster_tree_for_model_in_db(url: str, model_id, n_samples: int = 10000,
                                        session: Optional[dict] = None):
    """Build + upload a cluster tree for a DB-hosted model (reference
    create_cluster_tree_from_model :45)."""
    import jax
    from ..construct.space_partitioning import build_cluster_tree_for_primitive
    from ..models.primitive import load_primitive_json
    model_data = download_motion_model_from_remote_db(url, model_id,
                                                      session=session)
    prim = load_primitive_json(model_data)
    tree = build_cluster_tree_for_primitive(jax.random.PRNGKey(0), prim,
                                            n_samples=n_samples)
    tree_json = {"data": tree.data.tolist(),
                 "options": {"n_subdivisions_per_level": tree.n_subdivisions,
                             "n_levels": tree.max_level},
                 "root": tree._node_to_json(tree.root)}
    upload_cluster_tree(url, model_id, tree_json, session=session)
    return tree
