"""Numpy/scipy oracle replicating the reference's sample->frames math
(reference motion_model/motion_primitive.py:206-318 + motion_spline.py:71-86)
for golden comparisons.  Deliberately independent of the JAX implementation."""

import numpy as np
import scipy.interpolate as si


class OracleMotionPrimitive:
    def __init__(self, data):
        self.n_canonical_frames = data["n_canonical_frames"]
        self.translation_maxima = np.asarray(data["translation_maxima"], float)
        self.eigen_s = np.asarray(data["eigen_vectors_spatial"], float).T
        self.mean_s = np.asarray(data["mean_spatial_vector"], float)
        self.n_basis = int(data["n_basis_spatial"])
        self.n_dim = int(data["n_dim_spatial"])
        self.knots_s = np.asarray(data["b_spline_knots_spatial"], float)
        self.k_s = self.eigen_s.shape[1]
        if "eigen_vectors_time" in data:
            self.t_eigen = np.asarray(data["eigen_vectors_time"], float)
            self.t_mean = np.asarray(data["mean_time_vector"], float)
            self.knots_t = np.asarray(data["b_spline_knots_time"], float)
            self.k_t = self.t_eigen.shape[1]
        else:
            self.t_eigen = None
            self.k_t = 0

    def back_project_spatial_coeffs(self, alpha):
        coeffs = self.eigen_s @ alpha + self.mean_s
        coeffs = coeffs.reshape(self.n_basis, self.n_dim)
        coeffs[:, :3] *= self.translation_maxima
        return coeffs

    def canonical_time_function(self, gamma):
        rng = np.arange(self.n_canonical_frames)
        mean_t = si.splev(rng, (self.knots_t, self.t_mean, 3))
        eig_d = np.stack([si.splev(rng, (self.knots_t, self.t_eigen[:, i], 3))
                          for i in range(self.k_t)], axis=1)
        t = [0.0]
        for i in range(self.n_canonical_frames):
            t.append(t[-1] + np.exp(mean_t[i] + eig_d[i] @ gamma))
        return np.asarray(t[1:]) - 1.0

    def time_function(self, gamma, speed=1.0):
        t_can = self.canonical_time_function(gamma)
        x_sample = np.arange(self.n_canonical_frames)
        tck = si.splrep(t_can, x_sample, w=None, k=3)
        num = int(np.round(t_can[-2]) * (1.0 / speed))
        frames = np.linspace(1, t_can[-2], num)
        out = si.splev(frames, tck)
        out = np.insert(out, 0, 0)
        out = np.insert(out, len(out), self.n_canonical_frames - 1)
        return out

    def frames(self, s, use_time=True, speed=1.0):
        alpha = s[: self.k_s]
        coeffs = self.back_project_spatial_coeffs(np.asarray(alpha, float))
        if use_time and self.t_eigen is not None:
            tf = self.time_function(np.asarray(s[self.k_s: self.k_s + self.k_t], float), speed)
        else:
            tf = np.linspace(0, self.n_canonical_frames,
                             int(self.n_canonical_frames * (1.0 / speed)))
            tf = np.minimum(tf, self.n_canonical_frames - 1)
        ct = coeffs.T
        return np.stack([si.splev(tf, (self.knots_s, ct[i], 3))
                         for i in range(self.n_dim)], axis=1), tf
