"""Vectorised RANSAC fundamental-matrix estimation (normalised 8-point).

Replaces ``cv.findFundamentalMat(..., cv.FM_RANSAC, 1, 0.99999)``
(``computer_code/api/index.py:246``).

TPU-first design: RANSAC's data-dependent trial loop becomes a *fixed*
number of trials evaluated as one batch — sample (iters, 8) correspondence
subsets with one PRNG call, solve all 8-point systems as a batched 9x9
symmetric eigenproblem, score all candidate F's against all points with one
einsum, argmax inliers, then refit on the winning inlier set.  No
data-dependent shapes anywhere; confidence-based early exit is replaced by
a trial count high enough for the target confidence (512 trials ≈ 0.99999
confidence at 50% outliers for 8-point sampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.ops.epipolar import sampson_distance


def _normalise(pts, mask):
    """Hartley normalisation: zero-mean, sqrt(2) RMS. Returns (pts_n, T)."""
    m = mask.astype(pts.dtype)[:, None]
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(pts * m, axis=0) / n
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * mask) / n, 1e-12)
    T = jnp.array(
        [[1.0, 0.0, -mean[0]], [0.0, 1.0, -mean[1]], [0.0, 0.0, 1.0 / scale]],
        pts.dtype,
    ) * scale
    T = T.at[2, 2].set(1.0)
    return (pts - mean) * scale, T


def _eight_point(p1, p2, w):
    """Weighted 8-point: F from correspondences.

    p1, p2: (M, 2); w: (M,) weights (0/1 mask ok).  Returns (3, 3) rank-2 F.
    Solves min |A f| via the smallest eigenvector of A^T A, then projects to
    rank 2 — all batched-friendly (9x9 eigh + 3x3 svd).
    """
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (M, 9)
    A = A * w[:, None]
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    F = vecs[:, 0].reshape(3, 3)
    U, s, Vh = jnp.linalg.svd(F)
    s = s.at[2].set(0.0)
    return (U * s[None, :]) @ Vh


def ransac_fundamental(key, pts1, pts2, mask, iters: int = 512,
                       threshold_px: float = 1.0):
    """Robust F between two views.

    pts1, pts2: (N, 2) correspondences; mask: (N,) validity.
    Returns (F (3,3), inliers (N,) bool).
    """
    N = pts1.shape[0]
    p1n, T1 = _normalise(pts1, mask)
    p2n, T2 = _normalise(pts2, mask)

    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.choice(key, N, shape=(iters, 8), p=probs)  # (I, 8)

    samp_w = jnp.ones((iters, 8), pts1.dtype)
    Fs = jax.vmap(_eight_point)(p1n[idx], p2n[idx], samp_w)     # (I, 3, 3)

    # score every candidate against every point (normalised coords; the
    # threshold maps through the normalisation scale of image 2)
    d = jax.vmap(lambda F: sampson_distance(p1n, p2n, F))(Fs)   # (I, N)
    scale2 = T2[0, 0]
    thr = (threshold_px * scale2) ** 2
    inl = (d < thr) & mask[None, :]
    counts = inl.sum(axis=1)
    best = jnp.argmax(counts)

    # refit on the winner's inliers (least-squares over all inliers)
    w = inl[best].astype(pts1.dtype)
    F_n = _eight_point(p1n, p2n, w)
    F = T2.T @ F_n @ T1
    # final inlier set under the refit F, in pixel units
    d_px = sampson_distance(pts1, pts2, F)
    inliers = (d_px < threshold_px**2) & mask
    F = F / jnp.where(jnp.abs(F[2, 2]) < 1e-12, 1.0, F[2, 2])
    return F, inliers
