"""REST service: constrained synthesis over HTTP.

Replaces reference examples/mg_rest_interface.py:98-423 (Tornado app with
POST /run_morphablegraphs, /generate_motion, /get_skeleton,
/set_configuration).  The reference's *parallel* variant forks one process
per core, each with its own graph (mg_rest_interface_parallel.py:10-265);
on TPU the equivalent scaling story is batching requests into the vmapped
generator, so this server keeps one model instance and serves sequentially,
with the crowd path available for bulk requests.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
import tornado.ioloop
import tornado.web

from ..constraints.input_reader import read_input
from ..models.graph import MotionStateGraph, load_graph
from ..models.skeleton import write_bvh
from ..synthesis.motion_generator import MotionGenerator
from ..utils.config import default_config
from .export import AnnotatedMotion, events_from_result


class MGContext:
    """Shared state: graph + generator + config (reference MGRestApplication)."""

    def __init__(self, graph: MotionStateGraph, config: Optional[dict] = None,
                 activate_joint_mapping: bool = False,
                 activate_coordinate_transform: bool = False,
                 target_skeleton=None, joint_name_map: Optional[dict] = None,
                 retarget_scale: float = 1.0,
                 create_ca_vis_data: bool = False,
                 add_rotate_events: bool = False):
        self.graph = graph
        self.config = config or default_config()
        self.generator = MotionGenerator(graph, self.config)
        self.activate_joint_mapping = activate_joint_mapping
        self.activate_coordinate_transform = activate_coordinate_transform
        # reference GraphWalk(create_ca_vis_data) + KeyframeEventList
        # (keyframe_event_list.py:32-39,:47-49,:110-142); rotate events are
        # additionally gated on NOT constrain_place_orientation
        self.create_ca_vis_data = create_ca_vis_data
        self.add_rotate_events = add_rotate_events
        # optional output retargeting (reference mg_rest_interface.py:70-93,
        # :133-136: retarget to a game-engine skeleton before export)
        self.target_skeleton = target_skeleton
        self.joint_name_map = joint_name_map
        self.retarget_scale = retarget_scale
        self._batched_generator = None

    def batched_generator(self):
        """Lazily-built, cached BatchedGenerator (stacking the graph and
        uploading it to device once, not per request)."""
        if self._batched_generator is None:
            from .batch import BatchedGenerator
            self._batched_generator = BatchedGenerator(self.graph, self.config)
        return self._batched_generator

    def run(self, mg_input: dict, output_mode: str = "bvh") -> dict:
        result = self.generator.generate_motion(
            mg_input,
            activate_joint_mapping=self.activate_joint_mapping,
            activate_coordinate_transform=self.activate_coordinate_transform)
        out_skeleton = self.graph.skeleton
        out_frames = result.frames
        if self.target_skeleton is not None:
            from ..models.retarget import retarget_frames
            out_frames = retarget_frames(self.graph.skeleton, result.frames,
                                         self.target_skeleton,
                                         self.joint_name_map,
                                         self.retarget_scale)
            out_skeleton = self.target_skeleton
        parsed = read_input(
            mg_input,
            activate_coordinate_transform=self.activate_coordinate_transform)
        annotations_per_action = [a.annotations for a in parsed.actions]
        add_rotate = (self.add_rotate_events
                      and not self.config["inverse_kinematics_settings"]
                      .get("constrain_place_orientation", False))
        events = events_from_result(
            self.graph, result, annotations_per_action,
            add_rotate_events=add_rotate,
            constraints_per_action=[a.keyframe_constraints
                                    for a in parsed.actions])
        collision = None
        if self.create_ca_vis_data:
            from .export import collision_vis_data_from_result
            collision = collision_vis_data_from_result(self.graph.skeleton,
                                                       result)
        motion = AnnotatedMotion(out_skeleton, out_frames,
                                 result.action_ranges, events, mg_input,
                                 collision_content=collision)
        if output_mode == "Unity":
            return motion.to_unity_format()
        return {
            "bvh": motion.generate_bvh_string(),
            "annotation": motion.keyframe_events_dict(),
            "event_list": motion.frame_annotation(),
        }


class _Handler(tornado.web.RequestHandler):
    def initialize(self, ctx: MGContext):
        self.ctx = ctx


class GenerateMotionHandler(_Handler):
    """POST /run_morphablegraphs and /generate_motion
    (reference mg_rest_interface.py:98-163)."""

    def post(self):
        try:
            mg_input = json.loads(self.request.body)
        except json.JSONDecodeError:
            self.set_status(400)
            self.write({"error": "invalid JSON"})
            return
        if not isinstance(mg_input, dict):
            # valid JSON but not an object would AttributeError into a 500
            self.set_status(400)
            self.write({"error": "expected a JSON object"})
            return
        try:
            output_mode = mg_input.get("outputMode", "bvh")
            result = self.ctx.run(mg_input, output_mode)
            self.write(json.dumps(result))
        except (KeyError, ValueError, RuntimeError) as e:
            # RuntimeError covers SynthesisError/PathSearchError from the
            # generator (utils/exceptions.py)
            self.set_status(400)
            self.write({"error": str(e)})


class GenerateMotionBatchHandler(_Handler):
    """POST /run_morphablegraphs_batch: {"requests": [mg_input, ...]} ->
    {"results": [{"bvh": ...}, ...]}.  Batchable locomotion requests run in
    ONE vmapped device launch; the rest fall back to the sequential path
    (the TPU replacement for the reference's process-per-core server)."""

    def post(self):
        try:
            body = json.loads(self.request.body)
            requests_list = body["requests"]
        except (json.JSONDecodeError, KeyError, TypeError):
            self.set_status(400)
            self.write({"error": "expected {\"requests\": [...]}"})
            return
        if not isinstance(requests_list, list):
            self.set_status(400)
            self.write({"error": "expected {\"requests\": [...]}"})
            return
        from ..models.skeleton import write_bvh
        # the BatchedGenerator (stacked pytree on device) is built once and
        # cached on the context — rebuilding per request re-uploaded the
        # whole model every POST
        bg = self.ctx.batched_generator()
        batchable, fallback, parsed = bg.split_batchable(
            requests_list, self.ctx.activate_coordinate_transform)
        results = [None] * len(requests_list)
        if batchable:
            try:
                frames_list = bg.generate_batch(
                    [requests_list[i] for i in batchable],
                    self.ctx.activate_coordinate_transform,
                    parsed_list=[parsed[i] for i in batchable])
                for i, frames in zip(batchable, frames_list):
                    results[i] = {"bvh": write_bvh(self.ctx.graph.skeleton,
                                                   frames),
                                  "batched": True}
            except (KeyError, ValueError, RuntimeError):
                # batch failure degrades to the sequential path
                fallback = sorted(set(fallback) | set(batchable))
        for i in fallback:
            try:
                results[i] = {**self.ctx.run(requests_list[i]), "batched": False}
            except (KeyError, ValueError, RuntimeError) as e:
                results[i] = {"error": str(e)}
        self.write(json.dumps({"results": results}))


class GetSkeletonHandler(_Handler):
    """GET /get_skeleton -> skeleton BVH string (reference :165-180)."""

    def get(self):
        skel = self.ctx.graph.skeleton
        rest = np.zeros((1, skel.n_frame_params), np.float32)
        for j in range(skel.n_animated):
            rest[0, 3 + 4 * j] = 1.0
        self.write(write_bvh(skel, rest))

    def post(self):
        self.get()


class SetConfigurationHandler(_Handler):
    """POST /set_configuration -> merge algorithm config at runtime
    (reference :204-233)."""

    def post(self):
        try:
            update = json.loads(self.request.body)
        except json.JSONDecodeError:
            self.set_status(400)
            self.write({"error": "invalid JSON"})
            return
        from ..utils.config import _merge
        _merge(self.ctx.config, update)
        self.ctx.generator.config = self.ctx.config
        # the cached BatchedGenerator baked the old config — rebuild lazily
        self.ctx._batched_generator = None
        self.write({"success": True})


def set_height_map(ctx: MGContext, data: dict) -> bool:
    """Install a terrain height map on the generator's scene interface
    (reference mg_rest_interface_parallel.py:154-191 set_height_map):
    either {"image_path", "width", "depth", "height_scale"[, "scale"]} or
    {"image": base64, "size", "mode", ...}; additionally accepts
    {"height_map": [[...]], "width", "depth"} as a pixel array with the
    image semantics, or {"height_map": [[...]]} alone as a plain grid of
    TRUE world heights (origin/scale texel mapping)."""
    from ..utils.height_map import ImageHeightMap
    scale = data.get("scale", [1.0, 1.0])
    if "image_path" in data:
        import os
        if not os.path.isfile(data["image_path"]):
            return False
        from PIL import Image
        with open(data["image_path"], "rb") as f:
            img = Image.open(f)
            pixels = np.asarray(img)
        hm = ImageHeightMap(pixels, data["width"], data["depth"], scale,
                            data["height_scale"])
    elif "image" in data:
        import base64
        from PIL import Image
        raw = base64.b64decode(data["image"])
        img = Image.frombytes(data["mode"], tuple(data["size"]), raw)
        hm = ImageHeightMap(np.asarray(img), data["width"], data["depth"],
                            scale, data["height_scale"])
    elif "height_map" in data and "width" in data and "depth" in data:
        # pixel-array form with the image semantics (values/255*height_scale
        # over a width x depth extent)
        hm = ImageHeightMap(np.asarray(data["height_map"], np.float64),
                            data["width"], data["depth"], scale,
                            data.get("height_scale", 1.0))
    elif "height_map" in data:
        # plain height GRID: values are world heights (origin/scale texel
        # mapping, no /255 pixel semantics)
        from ..utils.height_map import HeightMapInterface
        hm = HeightMapInterface(
            np.asarray(data["height_map"], np.float64),
            origin=tuple(data.get("origin", (0.0, 0.0))),
            scale=float(scale[0]) if hasattr(scale, "__len__") else float(scale),
            height_scale=float(data.get("height_scale", 1.0)))
    else:
        return False
    ctx.generator.scene_interface.set_scene(hm)
    return True


class SetHeightMapHandler(_Handler):
    """POST /set_height_map (reference mg_rest_interface_parallel.py:193-214)."""

    def post(self):
        try:
            data = json.loads(self.request.body)
        except json.JSONDecodeError:
            self.set_status(400)
            self.write({"error": "invalid JSON"})
            return
        try:
            ok = set_height_map(self.ctx, data)
        except (KeyError, ValueError, OSError) as e:
            self.set_status(400)
            self.write({"error": str(e)})
            return
        self.write(json.dumps({"success": bool(ok)}))


def make_app(ctx: MGContext) -> tornado.web.Application:
    return tornado.web.Application([
        (r"/run_morphablegraphs", GenerateMotionHandler, {"ctx": ctx}),
        (r"/run_morphablegraphs_batch", GenerateMotionBatchHandler, {"ctx": ctx}),
        (r"/generate_motion", GenerateMotionHandler, {"ctx": ctx}),
        (r"/get_skeleton", GetSkeletonHandler, {"ctx": ctx}),
        (r"/set_configuration", SetConfigurationHandler, {"ctx": ctx}),
        (r"/set_height_map", SetHeightMapHandler, {"ctx": ctx}),
    ])


def load_service_config(path: str) -> dict:
    """Service config schema of the reference's examples/config/service.config
    (port, model path, algorithm preset, joint-map / coordinate flags)."""
    with open(path) as f:
        return json.load(f)


def main(graph_path: Optional[str] = None, port: int = 8889,
         config: Optional[dict] = None, service_config: Optional[str] = None):
    """reference mg_rest_interface.py:381-423 main: load graph zip, serve."""
    joint_map = False
    coord_transform = False
    target_skeleton = None
    retarget_scale = 1.0
    if service_config is not None:
        svc = load_service_config(service_config)
        # write_log / log_file / log_level (reference service.config keys)
        from ..utils.log import configure_from_service_config
        configure_from_service_config(svc)
        graph_path = graph_path or svc.get("model_data")
        port = svc.get("port", port)
        joint_map = svc.get("activate_joint_map", False)
        coord_transform = svc.get("activate_coordinate_transform", False)
        # output retargeting to a game-engine rig (reference main
        # target_skeleton_file + scale, mg_rest_interface.py:385-401)
        target_path = svc.get("target_skeleton")
        retarget_scale = float(svc.get("retarget_scale", 1.0))
        if target_path:
            from ..models.retarget import load_target_skeleton
            target_skeleton = load_target_skeleton(target_path, retarget_scale)
        preset = svc.get("algorithm_settings")
        if preset and config is None:
            from ..utils.config import load_config
            import os
            preset_path = os.path.join(os.path.dirname(service_config),
                                       f"{preset}_algorithm.config")
            if os.path.exists(preset_path):
                config = load_config(preset_path)
    graph = load_graph(graph_path)
    ctx = MGContext(graph, config, activate_joint_mapping=joint_map,
                    activate_coordinate_transform=coord_transform,
                    target_skeleton=target_skeleton,
                    retarget_scale=retarget_scale)
    app = make_app(ctx)
    app.listen(port)
    from ..utils.log import write_message_to_log
    write_message_to_log(f"serving morphablegraphs on :{port}")
    print(f"serving morphablegraphs on :{port}")
    tornado.ioloop.IOLoop.current().start()


if __name__ == "__main__":
    import sys
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 8889)
