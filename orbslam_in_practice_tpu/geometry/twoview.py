"""Two-view epipolar geometry: normalized 8-point, H-DLT, decompositions.

Implements the intended semantics of the reference's Initializer math
(src/Initializer.cpp): point normalization (:235-277), 8-point fundamental
(:197-233), homography DLT (:315-348), chi-square symmetric-transfer scoring
(:119-195, :350-402), E decomposition (:404-519), Faugeras H decomposition
(:637-763), and CheckRT gating (:521-615) — with the reference's defects
fixed (SURVEY.md §2.4: wrong-point A-matrix rows, missing V transpose,
sticky inlier flags, SVD flag typos).

Everything is batched and jit-safe; RANSAC vmaps over hypothesis batches.
Null-space extraction uses eigh(A^T A) (TPU-friendly) rather than SVD.
"""

from __future__ import annotations

import jax.numpy as jnp

from orbslam_in_practice_tpu.geometry.triangulate import triangulate_dlt

# Chi-square thresholds at 95% for 1 and 2 DoF (reference uses these for
# F point-line and H transfer errors respectively).
CHI2_1DOF = 3.841
CHI2_2DOF = 5.991


def normalize_points(pts: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Mean / mean-absolute-deviation normalization (ref :235-277).

    Args:
      pts: (N, 2) points.
      mask: optional (N,) validity; invalid points get zero weight.

    Returns:
      (pts_norm (N, 2), T (3, 3)) with pts_norm = T @ [pts; 1].
    """
    if mask is None:
        mask = jnp.ones(pts.shape[:-1], dtype=bool)
    w = mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[..., None], axis=0) / n
    dev = jnp.sum(jnp.abs(pts - mean) * w[..., None], axis=0) / n
    s = 1.0 / jnp.maximum(dev, 1e-8)
    pts_norm = (pts - mean) * s
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=pts.dtype
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return pts_norm, T


def _min_eigvec(AtA: jnp.ndarray) -> jnp.ndarray:
    """Smallest-eigenvalue eigenvector of a symmetric matrix (..., n, n)."""
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., :, 0]


def eight_point(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Fundamental matrix from >= 8 normalized correspondences.

    Args:
      x1, x2: (..., N, 2) already-normalized points in image 1 / image 2.
      w: optional (..., N) weights (e.g. RANSAC sample one-hot masks).

    Returns:
      (..., 3, 3) rank-2 fundamental with x2' F x1 = 0.

    Fixes ref defects: A built from the correct images' coordinates
    (src/Initializer.cpp:213 used Pts1 for u_ba), literal `2` in F assembly
    (:221), missing V transpose (:232).
    """
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )  # (..., N, 9)
    if w is not None:
        A = A * w[..., None]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    f = _min_eigvec(AtA)
    F = f.reshape(f.shape[:-1] + (3, 3))
    # Enforce rank 2: zero the smallest singular value.
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return (U * S[..., None, :]) @ Vt


def homography_dlt(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Homography H21 (x2 ~ H x1) from >= 4 normalized correspondences.

    Args:
      x1, x2: (..., N, 2); w: optional (..., N) weights.
    """
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    row1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    row2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([row1, row2], axis=-2)  # (..., 2N, 9)
    if w is not None:
        w2 = jnp.concatenate([w, w], axis=-1)
        A = A * w2[..., None]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    h = _min_eigvec(AtA)
    return h.reshape(h.shape[:-1] + (3, 3))


def score_fundamental(
    F: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    mask: jnp.ndarray,
    sigma: float = 1.0,
) -> tuple:
    """Symmetric epipolar-transfer chi2 score (ref CheckFundamental :119-195).

    Per-point (not sticky — fixes the `isIniPts` defect): a point is an
    inlier iff BOTH directed chi2 errors pass CHI2_1DOF; the score sums
    (CHI2_2DOF - chi2) for each passing direction.

    Returns (score, inlier_mask).
    """
    inv_s2 = 1.0 / (sigma * sigma)
    ones = jnp.ones_like(p1[..., :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)  # (N, 3)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    # line in image 2: l2 = F h1 ; distance of p2 to l2
    l2 = h1 @ jnp.swapaxes(F, -1, -2)  # (N, 3)
    num2 = jnp.sum(l2 * h2, axis=-1)
    den2 = l2[..., 0] ** 2 + l2[..., 1] ** 2
    chi2_2 = (num2 * num2 / jnp.maximum(den2, 1e-12)) * inv_s2
    # line in image 1: l1 = F^T h2
    l1 = h2 @ F
    num1 = jnp.sum(l1 * h1, axis=-1)
    den1 = l1[..., 0] ** 2 + l1[..., 1] ** 2
    chi2_1 = (num1 * num1 / jnp.maximum(den1, 1e-12)) * inv_s2
    ok2 = chi2_2 <= CHI2_1DOF
    ok1 = chi2_1 <= CHI2_1DOF
    score = jnp.sum(
        jnp.where(mask & ok2, CHI2_2DOF - chi2_2, 0.0)
        + jnp.where(mask & ok1, CHI2_2DOF - chi2_1, 0.0),
        axis=-1,
    )
    inliers = mask & ok1 & ok2
    return score, inliers


def score_homography(
    H21: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    mask: jnp.ndarray,
    sigma: float = 1.0,
) -> tuple:
    """Symmetric transfer chi2 score for H (ref CheckHomography :350-402).

    Fixes: per-point inlier flags (not sticky), correct match indexing.
    Returns (score, inlier_mask).
    """
    inv_s2 = 1.0 / (sigma * sigma)
    H12 = jnp.linalg.inv(H21)
    ones = jnp.ones_like(p1[..., :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    # project 1 -> 2
    q2 = h1 @ jnp.swapaxes(H21, -1, -2)
    q2 = q2[..., :2] / jnp.where(jnp.abs(q2[..., 2:3]) < 1e-12, 1e-12, q2[..., 2:3])
    chi2_2 = jnp.sum((p2 - q2) ** 2, axis=-1) * inv_s2
    # project 2 -> 1
    q1 = h2 @ jnp.swapaxes(H12, -1, -2)
    q1 = q1[..., :2] / jnp.where(jnp.abs(q1[..., 2:3]) < 1e-12, 1e-12, q1[..., 2:3])
    chi2_1 = jnp.sum((p1 - q1) ** 2, axis=-1) * inv_s2
    ok2 = chi2_2 <= CHI2_2DOF
    ok1 = chi2_1 <= CHI2_2DOF
    score = jnp.sum(
        jnp.where(mask & ok2, CHI2_2DOF - chi2_2, 0.0)
        + jnp.where(mask & ok1, CHI2_2DOF - chi2_1, 0.0),
        axis=-1,
    )
    inliers = mask & ok1 & ok2
    return score, inliers


def decompose_E(E: jnp.ndarray) -> tuple:
    """Essential matrix -> 4 (R, t) hypotheses (ref DecomposeEtoRT :497-519).

    Returns (R (4, 3, 3), t (4, 3) unit-norm).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # ensure rotations proper
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = U[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2], axis=0)
    ts = jnp.stack([t, -t, t, -t], axis=0)
    return Rs, ts


def decompose_H(H21: jnp.ndarray, K: jnp.ndarray) -> tuple:
    """Faugeras SVD-based homography decomposition -> 8 (R, t, n) hypotheses.

    Intended semantics of ref DecomposeHmatrix (src/Initializer.cpp:637-763).
    Returns (R (8, 3, 3), t (8, 3) unit-norm, n (8, 3)).
    """
    A = jnp.linalg.inv(K) @ H21 @ K
    U, d, Vt = jnp.linalg.svd(A)
    V = jnp.swapaxes(Vt, -1, -2)
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = d[0], d[1], d[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    # case d' = d2
    aux_st = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    sts = jnp.array([1.0, -1.0, -1.0, 1.0]) * aux_st

    def make_case_pos(x1, x3, st):
        Rp = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=H21.dtype
        )
        Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-st).at[2, 0].set(st).at[2, 2].set(ct)
        R = s * (U @ Rp @ Vt)
        tp = jnp.stack([x1, jnp.zeros_like(x1), -x3]) * (d1 - d3)
        t = U @ tp
        n = V @ jnp.stack([x1, jnp.zeros_like(x1), x3])
        return R, t, n

    # case d' = -d2
    aux_sp = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sps = jnp.array([1.0, -1.0, -1.0, 1.0]) * aux_sp

    def make_case_neg(x1, x3, sp):
        Rp = jnp.zeros((3, 3), dtype=H21.dtype)
        Rp = (
            Rp.at[0, 0].set(cp)
            .at[0, 2].set(sp)
            .at[1, 1].set(-1.0)
            .at[2, 0].set(sp)
            .at[2, 2].set(-cp)
        )
        R = s * (U @ Rp @ Vt)
        tp = jnp.stack([x1, jnp.zeros_like(x1), x3]) * (d1 + d3)
        t = U @ tp
        n = V @ jnp.stack([x1, jnp.zeros_like(x1), x3])
        return R, t, n

    Rs, ts, ns = [], [], []
    for i in range(4):
        R, t, n = make_case_pos(x1s[i], x3s[i], sts[i])
        Rs.append(R)
        ts.append(t)
        ns.append(n)
    for i in range(4):
        R, t, n = make_case_neg(x1s[i], x3s[i], sps[i])
        Rs.append(R)
        ts.append(t)
        ns.append(n)
    R8 = jnp.stack(Rs)
    t8 = jnp.stack(ts)
    n8 = jnp.stack(ns)
    t8 = t8 / jnp.maximum(jnp.linalg.norm(t8, axis=-1, keepdims=True), 1e-12)
    # flip normals to face the camera
    n8 = n8 * jnp.where(n8[..., 2:3] < 0, -1.0, 1.0)
    return R8, t8, n8


def check_rt(
    R: jnp.ndarray,
    t: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    mask: jnp.ndarray,
    K: jnp.ndarray,
    sigma2: float = 1.0,
    min_parallax_cos: float = 0.99998,
) -> tuple:
    """Cheirality / parallax / reprojection gating of an (R, t) hypothesis.

    Intended semantics of ref CheckRT (src/Initializer.cpp:521-615):
    triangulate every masked match, require finite points, parallax cosine
    below threshold, positive depth in both views, and squared reprojection
    error < 4*sigma2 in both views.

    Args:
      R: (3, 3), t: (3,), p1/p2: (N, 2) undistorted pixels, mask: (N,) bool.

    Returns:
      (n_good, good_mask (N,), points3d (N, 3) in camera-1 frame,
       median_parallax_cos_of_good).
    """
    P1 = K @ jnp.concatenate([jnp.eye(3, dtype=K.dtype), jnp.zeros((3, 1), K.dtype)], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate_dlt(P1[None], P2[None], p1, p2)  # (N, 3) in cam-1 frame

    finite = jnp.all(jnp.isfinite(X), axis=-1)
    # parallax between the two viewing rays
    O2 = -R.T @ t  # camera-2 center in cam-1 frame
    ray1 = X
    ray2 = X - O2
    cos_par = jnp.sum(ray1 * ray2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-12
    )
    # depths
    z1 = X[..., 2]
    X2 = X @ R.T + t
    z2 = X2[..., 2]
    has_parallax = cos_par < min_parallax_cos
    cheirality = (z1 > 0) & (z2 > 0)
    # reprojection errors
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u1 = fx * X[..., 0] / jnp.maximum(z1, 1e-12) + cx
    v1 = fy * X[..., 1] / jnp.maximum(z1, 1e-12) + cy
    e1 = (u1 - p1[..., 0]) ** 2 + (v1 - p1[..., 1]) ** 2
    u2 = fx * X2[..., 0] / jnp.maximum(z2, 1e-12) + cx
    v2 = fy * X2[..., 1] / jnp.maximum(z2, 1e-12) + cy
    e2 = (u2 - p2[..., 0]) ** 2 + (v2 - p2[..., 1]) ** 2
    th2 = 4.0 * sigma2
    good = (
        mask
        & finite
        & cheirality
        & has_parallax
        & (e1 < th2)
        & (e2 < th2)
    )
    n_good = jnp.sum(good)
    # representative parallax: a low quantile of cos over good points
    # (smaller cos = more parallax). The reference takes the 50th good point's
    # parallax after sorting; a median over good points is the same intent.
    big = jnp.where(good, cos_par, 1.0)
    order = jnp.sort(big)
    idx = jnp.clip(jnp.minimum(50, n_good - 1), 0, p1.shape[0] - 1)
    parallax_cos = order[idx]
    return n_good, good, X, parallax_cos
