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


class OracleGMM:
    """Numpy mixture (reference ExtendedMGRDMixtureModel surface): sampling
    + log density, independent of ops/gmm.py."""

    def __init__(self, weights, means, covars):
        self.weights = np.asarray(weights, float)
        self.means = np.asarray(means, float)
        self.covars = np.asarray(covars, float)
        self._chols = np.linalg.cholesky(self.covars)
        self._log_norm = []
        d = self.means.shape[1]
        for c in self.covars:
            sign, logdet = np.linalg.slogdet(c)
            self._log_norm.append(-0.5 * (d * np.log(2 * np.pi) + logdet))
        self._log_norm = np.asarray(self._log_norm)

    def sample(self, n, rng):
        comp = rng.choice(len(self.weights), size=n, p=self.weights)
        z = rng.standard_normal((n, self.means.shape[1]))
        return self.means[comp] + np.einsum("nij,nj->ni", self._chols[comp], z)

    def logpdf(self, x):
        logps = []
        for k in range(len(self.weights)):
            diff = np.asarray(x, float) - self.means[k]
            sol = np.linalg.solve(self.covars[k], diff)
            logps.append(np.log(self.weights[k]) + self._log_norm[k]
                         - 0.5 * diff @ sol)
        m = max(logps)
        return m + np.log(sum(np.exp(lp - m) for lp in logps))


def oracle_constrained_step(model_data, goal, dir_xz, end_kf,
                            n_samples=50, seed=0, error_scale=1.0,
                            quality_scale=0.1, refine=True,
                            max_iterations=500, pool=None):
    """Reference-equivalent constrained step: numpy best-of-N over GMM
    samples + scipy leastsq refinement with reference residual semantics
    (reference motion_primitive_generator.py:109-190 generate_constrained
    _sample + objective_functions.py:239-267 obj_spatial_error_sum_and_
    naturalness; GlobalTransformConstraint = euclidean distance over the
    constrained components, Direction2DConstraint = heading angle error in
    degrees, each residual + quality_scale * negative log likelihood).

    goal: [3] with NaN = unconstrained component; dir_xz: [2] normalized
    target heading; end_kf: canonical keyframe of the goal.  Alignment is
    the identity start pose (start (0,0,0), orientation 0) — pass
    pre-transformed goals for other poses.

    Returns (best_latent, best_error) where best_error is the plain
    constraint error (no naturalness), the quantity the repo's
    MotionResult.stats["average_error"] reports.
    """
    import scipy.optimize as so

    prim = OracleMotionPrimitive(model_data)
    gmm = OracleGMM(model_data["gmm_weights"], model_data["gmm_means"],
                    model_data["gmm_covars"])
    rng = np.random.RandomState(seed)
    goal = np.asarray(goal, float)
    mask = ~np.isnan(goal)
    target_dir = np.asarray(dir_xz, float)
    target_dir = target_dir / np.linalg.norm(target_dir)

    def constraint_errors(s):
        coeffs = prim.back_project_spatial_coeffs(
            np.asarray(s[: prim.k_s], float))
        ct = coeffs.T
        pos = np.array([si.splev(end_kf, (prim.knots_s, ct[i], 3))
                        for i in range(3)])
        q = np.array([si.splev(end_kf, (prim.knots_s, ct[3 + i], 3))
                      for i in range(4)])
        q = q / max(np.linalg.norm(q), 1e-10)
        # heading = root quat applied to [0,0,1], projected to xz
        w, x, y, z = q
        fwd = np.array([2 * (x * z + w * y), 1 - 2 * (x * x + y * y)])
        fwd = fwd / max(np.linalg.norm(fwd), 1e-10)
        pos_err = np.linalg.norm((pos - np.where(mask, goal, pos))[mask]) \
            if mask.any() else 0.0
        cos_a = float(np.clip(np.dot(target_dir, fwd), -1.0, 1.0))
        dir_err = abs(np.degrees(np.arccos(cos_a)))
        return np.array([pos_err, dir_err])

    def residuals(s):
        nll = -gmm.logpdf(s)
        return error_scale * constraint_errors(s) + quality_scale * nll

    # pool: optional explicit candidate set [N, L] — lets a benchmark hand
    # the SAME pool to the oracle and the repo so the comparison measures
    # selection + optimization machinery, not RNG luck (min-of-N constraint
    # error is a high-variance statistic; with independent numpy/JAX draws
    # the anchored ratio swings by centimeters on pool luck alone)
    samples = gmm.sample(n_samples, rng) if pool is None \
        else np.asarray(pool, float)
    sums = [float(np.sum(residuals(s))) for s in samples]
    best = samples[int(np.argmin(sums))]
    if refine:
        # the reference's obj_spatial_error_sum_and_naturalness is a SCALAR
        # sum minimized numerically (objective_functions.py:239-267);
        # MINPACK leastsq needs M >= N, so the scalar path uses minimize
        if len(residuals(best)) >= len(best):
            best, _ = so.leastsq(residuals, best, maxfev=int(max_iterations))
        else:
            r = so.minimize(lambda s: float(np.sum(residuals(s))), best,
                            method="L-BFGS-B",
                            options={"maxiter": int(max_iterations)})
            best = r.x
    return best, float(np.sum(constraint_errors(best)))


# ---------------------------------------------------------------------------
# Oracle concatenation: reference align_and_concatenate semantics in numpy
# ---------------------------------------------------------------------------

def _oracle_heading(q):
    """XZ heading angle of the root quaternion (reference
    motion_generator/utils.py get_orientation_vector: rotate [0,0,1],
    project to XZ)."""
    w, x, y, z = q / max(np.linalg.norm(q), 1e-10)
    # rotate [0,0,1] by q (standard quaternion rotation, written out)
    vx = 2.0 * (x * z + w * y)
    vz = 1.0 - 2.0 * (x * x + y * y)
    return np.arctan2(vx, vz)


def _oracle_rot_y(frames, theta):
    """Rotate quaternion frames about world Y by theta: root XZ positions
    rotated, every joint quaternion premultiplied by the y-rotation."""
    out = np.array(frames, dtype=float, copy=True)
    c, s = np.cos(theta), np.sin(theta)
    x, z = out[:, 0].copy(), out[:, 2].copy()
    out[:, 0] = c * x + s * z
    out[:, 2] = -s * x + c * z
    # only the ROOT quaternion carries the global rotation (children are
    # parent-local; reference transform_quaternion_frames)
    qw, qy = np.cos(theta / 2.0), np.sin(theta / 2.0)
    w = out[:, 3].copy()
    xq = out[:, 4].copy()
    yq = out[:, 5].copy()
    zq = out[:, 6].copy()
    # (qw, 0, qy, 0) * (w, x, y, z)
    out[:, 3] = qw * w - qy * yq
    out[:, 4] = qw * xq + qy * zq
    out[:, 5] = qw * yq + qy * w
    out[:, 6] = qw * zq - qy * xq
    return out


def oracle_align_concat(clips, window=20):
    """Reference graph-walk concatenation in numpy (anim_utils
    align_and_concatenate_frames + smooth_quaternion_frames2 semantics,
    reference motion_generator/utils.py:101-148): per clip, 2D-align to the
    previous last frame (heading-angle y-rotation + XZ translation), then
    one-sided offset decay over `window` frames with per-joint quaternion
    hemisphere alignment.  Independent of the JAX implementation — used as
    the seam-quality oracle for BASELINE config 2."""
    out = np.array(clips[0], dtype=float, copy=True)
    for clip in clips[1:]:
        prev = out[-1]
        clip = np.asarray(clip, dtype=float)
        dth = _oracle_heading(prev[3:7]) - _oracle_heading(clip[0][3:7])
        aligned = _oracle_rot_y(clip, dth)
        delta = prev[:3] - aligned[0, :3]
        delta[1] = 0.0
        aligned[:, :3] += delta
        # smooth_quaternion_frames2: hemisphere-fix against prev, then add
        # the first-frame offset scaled by a linear decay over the window
        d = aligned.shape[1]
        for q0 in range(3, d - 3 + 1, 4):
            flip = np.dot(prev[q0:q0 + 4], aligned[0, q0:q0 + 4]) < 0
            if flip:
                aligned[:, q0:q0 + 4] = -aligned[:, q0:q0 + 4]
        magnitude = prev - aligned[0]
        t = np.arange(len(aligned), dtype=float)
        factors = np.where(t <= window, 1.0 - t / max(window, 1), 0.0)
        aligned = aligned + factors[:, None] * magnitude[None, :]
        out = np.concatenate([out, aligned], axis=0)
    return out
