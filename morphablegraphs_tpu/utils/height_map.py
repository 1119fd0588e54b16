"""Terrain height queries from a height map.

Replaces reference utilities/height_map_interface.py:24-66 (image-based
terrain height): a 2D array of heights over an XZ extent with bilinear
interpolation, pluggable into the grounding SceneInterface.
"""

from __future__ import annotations

import numpy as np


class HeightMapInterface:
    def __init__(self, height_map: np.ndarray, origin=(0.0, 0.0),
                 scale: float = 1.0, height_scale: float = 1.0,
                 default_height: float = 0.0):
        """height_map: [H, W] heights; world x maps to columns, z to rows;
        `scale` is world units per texel."""
        self.map = np.asarray(height_map, np.float64)
        self.origin = np.asarray(origin, np.float64)
        self.scale = float(scale)
        self.height_scale = float(height_scale)
        self.default_height = float(default_height)

    def get_height(self, x: float, z: float) -> float:
        u = (x - self.origin[0]) / self.scale
        v = (z - self.origin[1]) / self.scale
        h, w = self.map.shape
        if not (0 <= u < w - 1 and 0 <= v < h - 1):
            return self.default_height
        u0, v0 = int(u), int(v)
        fu, fv = u - u0, v - v0
        top = self.map[v0, u0] * (1 - fu) + self.map[v0, u0 + 1] * fu
        bot = self.map[v0 + 1, u0] * (1 - fu) + self.map[v0 + 1, u0 + 1] * fu
        return float((top * (1 - fv) + bot * fv) * self.height_scale)

    def __call__(self, x: float, z: float) -> float:
        return self.get_height(x, z)
