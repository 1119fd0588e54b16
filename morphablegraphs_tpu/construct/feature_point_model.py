"""Statistical models over feature points and per-semantic-class GMMs.

Replaces reference construction/feature_point_model.py:41-225
(`FeaturePointModel{,Builder}`: a GMM over end-effector / root feature
points used to score target reachability) and
construction/motion_primitive/semantic_statistical_model.py
(`SemanticStatisticalModel`: one GMM per semantic class over the latent
space).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.skeleton import Skeleton, fk_positions
from ..ops import gmm as gmm_ops
from . import gmm_trainer


class FeaturePointModel:
    """GMM over a joint's positions across training clips; scores how
    reachable a target position is (reference feature_point_model.py)."""

    def __init__(self, skeleton: Skeleton, joint: str):
        self.skeleton = skeleton
        self.joint = joint
        self.gmm: Optional[gmm_ops.GMM] = None

    def fit(self, motions: List[np.ndarray], keyframe: int = -1,
            max_k: int = 10):
        """Collect the joint's position at the keyframe of every clip and
        fit a GMM with BIC selection."""
        points = []
        for m in motions:
            frame = np.asarray(m)[keyframe]
            pos = np.asarray(fk_positions(self.skeleton,
                                          jnp.asarray(frame, jnp.float32)))
            points.append(pos[self.skeleton.index_of(self.joint)])
        data = np.stack(points)
        model = gmm_trainer.train(data, max_k=min(max_k, len(points) - 1 or 1))
        self.gmm = gmm_ops.from_covars(model["gmm_weights"],
                                       model["gmm_means"],
                                       model["gmm_covars"])
        return self

    def score_target(self, position) -> float:
        """Log-likelihood of a target point under the model — the
        reachability score."""
        assert self.gmm is not None, "fit first"
        return float(gmm_ops.log_prob(self.gmm,
                                      jnp.asarray(position, jnp.float32)))

    def sample(self, key, n: int = 1) -> np.ndarray:
        assert self.gmm is not None, "fit first"
        return np.asarray(gmm_ops.sample(key, self.gmm, n))


class SemanticStatisticalModel:
    """Per-semantic-class GMMs over latent parameters (reference
    semantic_statistical_model.py): sample/score conditioned on a class."""

    def __init__(self):
        self.class_gmms: Dict[str, gmm_ops.GMM] = {}

    def fit(self, latent_by_class: Dict[str, np.ndarray], max_k: int = 10):
        for label, data in latent_by_class.items():
            data = np.asarray(data)
            model = gmm_trainer.train(data, max_k=min(max_k, max(len(data) - 1, 1)))
            self.class_gmms[label] = gmm_ops.from_covars(
                model["gmm_weights"], model["gmm_means"], model["gmm_covars"])
        return self

    def sample(self, key, label: str, n: int = 1) -> np.ndarray:
        return np.asarray(gmm_ops.sample(key, self.class_gmms[label], n))

    def score(self, label: str, s) -> float:
        return float(gmm_ops.log_prob(self.class_gmms[label],
                                      jnp.asarray(s, jnp.float32)))

    def classify(self, s) -> str:
        """Most likely semantic class for a latent vector."""
        best, best_ll = None, -np.inf
        for label, g in self.class_gmms.items():
            ll = float(gmm_ops.log_prob(g, jnp.asarray(s, jnp.float32)))
            if ll > best_ll:
                best, best_ll = label, ll
        return best
