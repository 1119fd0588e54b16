"""Phase-functioned neural network runtime.

The reference optionally ships PFNN weights inside the graph zip
(utilities/zip_io.py:46-117: W0..W2, b0..b2 binaries + Xmean/Ymean/Xstd/Ystd)
and routes locomotion through a PFNN wrapper in the interactive planner
(mg_state_planner.py:855).  This module provides the TPU-native runtime:
weights carry a leading phase-control axis (4 control points, Catmull-Rom
interpolated at the current phase — Holden et al. 2017), and the 3-layer ELU
network evaluates as one jitted computation, vmappable over a crowd.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class PFNN(NamedTuple):
    w0: jax.Array  # [P, H, X]
    b0: jax.Array  # [P, H]
    w1: jax.Array  # [P, H, H]
    b1: jax.Array  # [P, H]
    w2: jax.Array  # [P, Y, H]
    b2: jax.Array  # [P, Y]
    x_mean: jax.Array  # [X]
    x_std: jax.Array  # [X]
    y_mean: jax.Array  # [Y]
    y_std: jax.Array  # [Y]

    @property
    def n_controls(self) -> int:
        return self.w0.shape[0]


def load_from_arrays(weights: Dict[str, np.ndarray],
                     means: Dict[str, np.ndarray],
                     n_controls: int = 4, hidden: int = 512) -> PFNN:
    """Reshape the zip's flat binaries (reference PFNN_WEIGHT_KEYS /
    PFNN_MEAN_KEYS) into phase-indexed tensors."""
    x_dim = means["Xmean"].shape[0]
    y_dim = means["Ymean"].shape[0]

    def shape(flat, *dims):
        return jnp.asarray(np.asarray(flat, np.float32).reshape(*dims))

    return PFNN(
        w0=shape(weights["W0"], n_controls, hidden, x_dim),
        b0=shape(weights["b0"], n_controls, hidden),
        w1=shape(weights["W1"], n_controls, hidden, hidden),
        b1=shape(weights["b1"], n_controls, hidden),
        w2=shape(weights["W2"], n_controls, y_dim, hidden),
        b2=shape(weights["b2"], n_controls, y_dim),
        x_mean=jnp.asarray(means["Xmean"], jnp.float32),
        x_std=jnp.asarray(np.maximum(means["Xstd"], 1e-8), jnp.float32),
        y_mean=jnp.asarray(means["Ymean"], jnp.float32),
        y_std=jnp.asarray(means["Ystd"], jnp.float32),
    )


def _catmull_rom_weights(model: PFNN, phase: jax.Array):
    """Cubic Catmull-Rom interpolation of the phase-control weights at
    phase in [0, 1) (Holden et al. 2017 cubic variant)."""
    p = model.n_controls
    pscaled = phase * p
    k1 = jnp.floor(pscaled).astype(jnp.int32) % p
    k0 = (k1 - 1) % p
    k2 = (k1 + 1) % p
    k3 = (k1 + 2) % p
    w = pscaled - jnp.floor(pscaled)

    def interp(arr):
        a0, a1, a2, a3 = arr[k0], arr[k1], arr[k2], arr[k3]
        return (a1
                + w * (0.5 * a2 - 0.5 * a0)
                + w * w * (a0 - 2.5 * a1 + 2.0 * a2 - 0.5 * a3)
                + w * w * w * (1.5 * a1 - 1.5 * a2 + 0.5 * a3 - 0.5 * a0))

    return (interp(model.w0), interp(model.b0), interp(model.w1),
            interp(model.b1), interp(model.w2), interp(model.b2))


@jax.jit
def forward(model: PFNN, x: jax.Array, phase: jax.Array) -> jax.Array:
    """One PFNN step: normalized input -> ELU MLP with phase-interpolated
    weights -> denormalized output."""
    w0, b0, w1, b1, w2, b2 = _catmull_rom_weights(model, phase)
    h = (x - model.x_mean) / model.x_std
    h = jax.nn.elu(w0 @ h + b0)
    h = jax.nn.elu(w1 @ h + b1)
    y = w2 @ h + b2
    return y * model.y_std + model.y_mean


def forward_crowd(model: PFNN, xs: jax.Array, phases: jax.Array) -> jax.Array:
    """vmapped step for many characters: xs [N, X], phases [N] -> [N, Y]."""
    return jax.vmap(lambda x, p: forward(model, x, p))(xs, phases)


PFNN_WEIGHT_KEYS = ("W0", "W1", "W2", "b0", "b1", "b2")
PFNN_MEAN_KEYS = ("Xmean", "Ymean", "Xstd", "Ystd")


def read_pfnn_arrays(zf) -> "dict | None":
    """Raw {weights, means} arrays from an open graph-zip's pfnn/ section
    (reference zip_io.py get_pfnn_data :99-117).  Returns None when the
    section is absent; raises ValueError listing the missing binaries when
    it is present but incomplete (a silent None would disable PFNN
    locomotion with no diagnostic)."""
    names = set(zf.namelist())
    if not any(n.startswith("pfnn/") for n in names):
        return None
    paths = {k: f"pfnn/weights/{k}.bin" for k in PFNN_WEIGHT_KEYS}
    paths.update({k: f"pfnn/means/{k}.bin" for k in PFNN_MEAN_KEYS})
    missing = [p for p in paths.values() if p not in names]
    if missing:
        raise ValueError(f"incomplete pfnn/ section in graph zip: missing {missing}")
    weights = {k: np.frombuffer(zf.read(paths[k]), np.float32)
               for k in PFNN_WEIGHT_KEYS}
    means = {k: np.frombuffer(zf.read(paths[k]), np.float32)
             for k in PFNN_MEAN_KEYS}
    return {"weights": weights, "means": means}


def read_pfnn_from_zip(zip_path: str, n_controls: int = 4,
                       hidden: int = 512):
    """Load a PFNN model from a graph zip if present.  Returns None when
    absent."""
    import zipfile
    with zipfile.ZipFile(zip_path, "r") as zf:
        data = read_pfnn_arrays(zf)
    if data is None:
        return None
    return load_from_arrays(data["weights"], data["means"], n_controls, hidden)


class PFNNWrapper:
    """Minimal phase-stepping controller exposing the surface MGStatePlanner
    consumes: reset(position, phase, direction) / get_next_frame(target_dir)
    (reference mg_state_planner.py:855-930 drives an externally-constructed
    pfnn_wrapper with exactly these two calls; the full trajectory-window
    controller lives in the external mg_server, not in morphablegraphs).

    encode_fn(state, target_dir) -> network input [X];
    decode_fn(y, state) -> (quaternion frame, new position, phase advance).
    The encode/decode pair pins down the trained network's I/O layout, which
    the weight blobs alone do not define.
    """

    def __init__(self, model: PFNN, encode_fn, decode_fn):
        self.model = model
        self.encode_fn = encode_fn
        self.decode_fn = decode_fn
        self.position = np.zeros(3)
        self.phase = 0.0
        self.direction = np.array([0.0, 0.0, 1.0])

    def reset(self, position, phase, direction):
        self.position = np.asarray(position, np.float64)
        self.phase = float(phase)
        self.direction = np.asarray(direction, np.float64)

    def get_next_frame(self, target_dir) -> np.ndarray:
        x = self.encode_fn(self, np.asarray(target_dir, np.float64))
        y = np.asarray(forward(self.model, jnp.asarray(x, jnp.float32),
                               jnp.asarray(self.phase, jnp.float32)))
        frame, self.position, dphase = self.decode_fn(y, self)
        self.phase = float((self.phase + dphase) % 1.0)
        return np.asarray(frame, np.float32)
