"""Model layer: skeleton/BVH IO, motion-primitive pytrees, state-graph tables."""

from .skeleton import Skeleton, load_bvh, write_bvh, bvh_to_quat_frames, quat_frames_to_bvh
from .primitive import MotionPrimitive, load_primitive, load_primitive_json
