"""Conditional-GMM transition models (the reference's GPM slot, TPU-first).

The reference reserves a per-edge `transition_model` whose interface is
`predict(prev_latent) -> gmm` / `predict + sample` (reference
motion_model/motion_state_graph_node.py:232-271 `has_transition_model` /
`predict_parameters` / `predict_gmm`, consumed by
motion_primitive_generator.py:190-214 when `use_transition_model` is set).
The reference's own implementation is a Gaussian-process mixture from an
external `gp` package that never shipped — the loader always passes
`transition_model=None` (motion_state_graph_loader.py:278-281), so the path
is dead there.

Here the same contract is filled with conditional-GMM regression: fit ONE
full-covariance joint mixture over concatenated (prev latent, next latent)
pairs at construction time, then condition per component at runtime —

    mean_y|x   = mu_y + Sigma_yx Sigma_xx^-1 (x - mu_x)
    Sigma_y|x  = Sigma_yy - Sigma_yx Sigma_xx^-1 Sigma_xy   (constant!)
    w_k|x     ∝ w_k N(x; mu_x_k, Sigma_xx_k)

Everything x-dependent is a batched matmul + the existing mixture log-prob
kernel, so `predict` jits and vmaps over whole candidate batches — no
per-query GP solves, no host round-trips.  The conditional covariances and
every Cholesky factor are precomputed once at fit/load time.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import gmm as gmm_ops


class ConditionalGMM(NamedTuple):
    """Joint GMM over (x, y) pairs, pre-factored for conditioning on x.

    weights:        [K]
    mu_x:           [K, Dx]
    mu_y:           [K, Dy]
    cov_chol_x:     [K, Dx, Dx]  lower Cholesky of Sigma_xx (reweighting)
    prec_chol_x:    [K, Dx, Dx]  W with Sigma_xx^-1 = W W^T
    reg:            [K, Dy, Dx]  Sigma_yx Sigma_xx^-1 (the regression map)
    cond_cov_chol:  [K, Dy, Dy]  lower Cholesky of Sigma_y|x
    cond_prec_chol: [K, Dy, Dy]  precision factor of Sigma_y|x
    """

    weights: jax.Array
    mu_x: jax.Array
    mu_y: jax.Array
    cov_chol_x: jax.Array
    prec_chol_x: jax.Array
    reg: jax.Array
    cond_cov_chol: jax.Array
    cond_prec_chol: jax.Array

    @property
    def n_components(self) -> int:
        return self.weights.shape[-1]

    @property
    def n_in(self) -> int:
        return self.mu_x.shape[-1]

    @property
    def n_out(self) -> int:
        return self.mu_y.shape[-1]


def _prec_chol(cov_chol: np.ndarray) -> np.ndarray:
    """sklearn-style precision factor W = L^-T per component."""
    d = cov_chol.shape[-1]
    eye = np.eye(d)
    return np.stack([np.linalg.solve(l, eye).T for l in cov_chol])


def from_joint(weights, means, covars, n_in: int) -> ConditionalGMM:
    """Pre-factor a joint mixture (x ++ y layout) for conditioning on the
    first `n_in` dims.  Host-side numpy (load/fit time)."""
    weights = np.asarray(weights, np.float64)
    means = np.asarray(means, np.float64)
    covars = np.asarray(covars, np.float64)
    mu_x, mu_y = means[:, :n_in], means[:, n_in:]
    s_xx = covars[:, :n_in, :n_in]
    s_yx = covars[:, n_in:, :n_in]
    s_yy = covars[:, n_in:, n_in:]
    d_y = s_yy.shape[-1]
    reg = np.stack([np.linalg.solve(s_xx[k].T, s_yx[k].T).T
                    for k in range(len(weights))])  # Sigma_yx Sigma_xx^-1
    cond = s_yy - np.einsum("kij,klj->kil", reg, s_yx)
    # symmetrize + regularize before factoring (f64 solve noise)
    cond = 0.5 * (cond + np.swapaxes(cond, -1, -2)) + 1e-6 * np.eye(d_y)
    s_xx = 0.5 * (s_xx + np.swapaxes(s_xx, -1, -2)) + 1e-6 * np.eye(n_in)
    cov_chol_x = np.linalg.cholesky(s_xx)
    cond_chol = np.linalg.cholesky(cond)
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    return ConditionalGMM(
        weights=f32(weights), mu_x=f32(mu_x), mu_y=f32(mu_y),
        cov_chol_x=f32(cov_chol_x), prec_chol_x=f32(_prec_chol(cov_chol_x)),
        reg=f32(reg), cond_cov_chol=f32(cond_chol),
        cond_prec_chol=f32(_prec_chol(cond_chol)))


def fit_transition_model(x: np.ndarray, y: np.ndarray, n_components: int = 0,
                         max_k: int = 8, seed: int = 0) -> ConditionalGMM:
    """Fit from (prev latent, next latent) training pairs.

    x: [N, Dx]; y: [N, Dy].  n_components=0 selects K by BIC up to max_k
    (the same EM + BIC machinery as the per-primitive mixtures,
    construct/gmm_trainer.py)."""
    from ..construct import gmm_trainer
    joint = np.concatenate([np.asarray(x, np.float64),
                            np.asarray(y, np.float64)], axis=1)
    if n_components > 0:
        w, mu, cov, _ = gmm_trainer.fit_gmm(joint, n_components, seed=seed)
    else:
        fields = gmm_trainer.train(joint, max_k=max_k, seed=seed)
        w, mu, cov = (fields["gmm_weights"], fields["gmm_means"],
                      fields["gmm_covars"])
    return from_joint(w, mu, cov, n_in=np.asarray(x).shape[1])


@jax.jit
def predict(model: ConditionalGMM, x: jax.Array) -> gmm_ops.GMM:
    """Condition the joint mixture on x [Dx] -> GMM over y.

    Matches the reference contract `transition_model.predict(parameters)`
    returning a sampleable/scoreable mixture
    (motion_state_graph_node.py:255-271)."""
    x = jnp.asarray(x, jnp.float32)
    # responsibilities of x under the marginal mixture over x
    marg = gmm_ops.GMM(model.weights, model.mu_x, model.cov_chol_x,
                       model.prec_chol_x)
    log_w = (gmm_ops.log_prob_components(marg, x)
             + jnp.log(jnp.maximum(model.weights, 1e-30)))  # [K]
    log_w = log_w - jax.scipy.special.logsumexp(log_w)
    means = model.mu_y + jnp.einsum(
        "kij,kj->ki", model.reg, x[None, :] - model.mu_x,
        precision=jax.lax.Precision.HIGHEST)  # [K, Dy]
    return gmm_ops.GMM(jnp.exp(log_w), means, model.cond_cov_chol,
                       model.cond_prec_chol)


@functools.partial(jax.jit, static_argnames=("n",))
def predict_parameters(key: jax.Array, model: ConditionalGMM, x: jax.Array,
                       n: int = 1) -> jax.Array:
    """Sample n next-step latents from the conditioned mixture (reference
    predict_parameters draws one; the generator's best-of-N draws many)."""
    return gmm_ops.sample(key, predict(model, x), n)


# ---------------------------------------------------------------------------
# (De)serialization — JSON-friendly dict for graph/zip storage.  The
# reference's .GPM files are pickled gaussian-process objects from the
# unshipped `gp` package and cannot be parsed (its own loader can't either);
# this format is the native replacement.
# ---------------------------------------------------------------------------

def to_json(model: ConditionalGMM) -> dict:
    return {
        "type": "conditional_gmm",
        "n_in": int(model.n_in),
        "weights": np.asarray(model.weights).tolist(),
        "mu_x": np.asarray(model.mu_x).tolist(),
        "mu_y": np.asarray(model.mu_y).tolist(),
        "cov_chol_x": np.asarray(model.cov_chol_x).tolist(),
        "reg": np.asarray(model.reg).tolist(),
        "cond_cov_chol": np.asarray(model.cond_cov_chol).tolist(),
    }


def from_json(data: dict) -> ConditionalGMM:
    if data.get("type") != "conditional_gmm":
        raise ValueError(f"unknown transition model type {data.get('type')!r}"
                         " (the reference's pickled .GPM blobs depend on an"
                         " unshipped package and cannot be loaded)")
    cov_chol_x = np.asarray(data["cov_chol_x"], np.float64)
    cond_chol = np.asarray(data["cond_cov_chol"], np.float64)
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    return ConditionalGMM(
        weights=f32(np.asarray(data["weights"])),
        mu_x=f32(np.asarray(data["mu_x"])),
        mu_y=f32(np.asarray(data["mu_y"])),
        cov_chol_x=f32(cov_chol_x), prec_chol_x=f32(_prec_chol(cov_chol_x)),
        reg=f32(np.asarray(data["reg"])),
        cond_cov_chol=f32(cond_chol),
        cond_prec_chol=f32(_prec_chol(cond_chol)))


@jax.jit
def _match_boundary_poses(xe: jax.Array, yst: jax.Array) -> jax.Array:
    """argmin_j ||xe_i - yst_j||^2 via the matmul expansion — one [N, N]
    grid instead of an eagerly materialized [N, N, C] broadcast difference
    (~1.2 GB at the n_pairs=2000 default on reference-scale channels), and
    jitted so the whole pairing is one dispatch per edge."""
    d = (jnp.sum(xe * xe, axis=1)[:, None]
         + jnp.sum(yst * yst, axis=1)[None, :]
         - 2.0 * xe @ yst.T)
    return jnp.argmin(d, axis=1)


def fit_transition_models_for_graph(graph, n_pairs: int = 2000,
                                    n_components: int = 4, seed: int = 0,
                                    window: int = 20):
    """Fit a transition model for every standard edge of a graph from
    SELF-SUPERVISED pairs: sample a prev latent from the source node's
    mixture, then find the target-node latent whose motion best continues
    it (closest first-frame pose after 2D alignment, which is how steps are
    actually stitched).  Writes into node.transition_models.

    The reference trained its GPs offline from temporally-adjacent segment
    pairs in the motion database; when such pairs are available, call
    `fit_transition_model(x, y)` with them directly instead.
    """
    from ..models import primitive as prim_mod
    from ..models.graph import NODE_TYPE_STANDARD

    key = jax.random.PRNGKey(seed)
    for from_key, node in graph.nodes.items():
        for to_key in node.edges_of_type(NODE_TYPE_STANDARD):
            to_node = graph.nodes[to_key]
            key, k1, k2 = jax.random.split(key, 3)
            xs = prim_mod.sample_latent(k1, node.primitive, n_pairs)
            ys = prim_mod.sample_latent(k2, to_node.primitive, n_pairs)
            # pair each x with the y whose (normalized) start pose best
            # matches x's end pose: evaluate boundary frames via the spatial
            # spline (clamped basis -> first/last coefficient rows)
            x_end = jax.vmap(lambda s: prim_mod.evaluate_at(
                node.primitive, s,
                jnp.asarray([node.primitive.n_canonical_frames - 1.0]))[0])(xs)
            y_start = jax.vmap(lambda s: prim_mod.evaluate_at(
                to_node.primitive, s, jnp.asarray([0.0]))[0])(ys)
            # compare pose shape only (root-relative channels)
            match = _match_boundary_poses(x_end[:, 3:], y_start[:, 3:])
            node.transition_models[to_key] = fit_transition_model(
                np.asarray(xs), np.asarray(ys)[np.asarray(match)],
                n_components=n_components, seed=seed)
    return graph
