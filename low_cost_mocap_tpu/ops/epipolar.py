"""Epipolar geometry: F/E relations, epilines, motion from essential.

Replaces the reference's OpenCV-sfm contrib calls:
  - ``cv.sfm.fundamentalFromProjections`` (``computer_code/api/helpers.py:362``)
  - ``cv.computeCorrespondEpilines``     (``computer_code/api/helpers.py:363``)
  - ``cv.sfm.essentialFromFundamental``  (``computer_code/api/index.py:247``)
  - ``cv.sfm.motionFromEssential``       (``computer_code/api/index.py:248``)

All functions are pure JAX, batch over leading axes, and use only static
shapes, so the whole rig's pairwise geometry evaluates as a handful of fused
XLA ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from low_cost_mocap_tpu.ops.rotations import hat


def fundamental_from_projections(P1, P2):
    """F mapping points in image 1 to epilines in image 2.

    Determinant construction: with X_j = the cyclic row pair of P1 omitting
    row j and Y_i likewise for P2, F[i, j] = det([X_j; Y_i]).  This is the
    same algorithm ``cv.sfm.fundamentalFromProjections`` uses and is exact
    (four 4x4 determinants per entry, no SVD/pinv), so it stays accurate in
    float32 on TPU.

    P1, P2: (..., 3, 4).  Returns (..., 3, 3).
    """
    # cyclic row pairs: pair k = (rows k+1, k+2 mod 3)
    def pairs(P):
        return jnp.stack(
            [
                jnp.stack([P[..., 1, :], P[..., 2, :]], axis=-2),
                jnp.stack([P[..., 2, :], P[..., 0, :]], axis=-2),
                jnp.stack([P[..., 0, :], P[..., 1, :]], axis=-2),
            ],
            axis=-3,
        )  # (..., 3, 2, 4)

    X = pairs(P1)
    Y = pairs(P2)
    # M[i, j] = [X_j ; Y_i] : (..., 3, 3, 4, 4)
    Xb = jnp.broadcast_to(X[..., None, :, :, :], X.shape[:-3] + (3, 3, 2, 4))
    Yb = jnp.broadcast_to(Y[..., :, None, :, :], Y.shape[:-3] + (3, 3, 2, 4))
    M = jnp.concatenate([Xb, Yb], axis=-2)
    return jnp.linalg.det(M)


def epiline(points_px, F):
    """Epipolar line in image 2 for points in image 1, unit-normalised.

    points_px: (..., 2); F: (3, 3) or broadcastable.  Returns (..., 3) line
    coefficients (a, b, c) with a^2 + b^2 = 1 (the same normalisation
    ``cv.computeCorrespondEpilines`` uses).
    """
    ph = jnp.concatenate([points_px, jnp.ones_like(points_px[..., :1])], axis=-1)
    line = jnp.einsum("...ij,...j->...i", F, ph)
    n = jnp.sqrt(line[..., 0] ** 2 + line[..., 1] ** 2)
    return line / jnp.maximum(n[..., None], 1e-12)


def point_line_distance(points_px, line):
    """|a x + b y + c| / sqrt(a²+b²) — the reference's 5 px gate metric
    (``computer_code/api/helpers.py:373``)."""
    a, b, c = line[..., 0], line[..., 1], line[..., 2]
    d = jnp.abs(a * points_px[..., 0] + b * points_px[..., 1] + c)
    return d / jnp.maximum(jnp.sqrt(a * a + b * b), 1e-12)


def essential_from_fundamental(F, K1, K2):
    """E = K2^T F K1 (``cv.sfm.essentialFromFundamental`` semantics)."""
    return K2.swapaxes(-1, -2) @ F @ K1


def motion_from_essential(E):
    """Four (R, t) candidates from an essential matrix.

    Returns (Rs, ts): (4, 3, 3) and (4, 3).  Same candidate set as
    ``cv.sfm.motionFromEssential`` (``computer_code/api/index.py:248``); the
    caller disambiguates by cheirality exactly as the reference does
    (``computer_code/api/index.py:250-262``).
    """
    U, _, Vh = jnp.linalg.svd(E)
    # Enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vh = Vh * jnp.sign(jnp.linalg.det(Vh))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = U @ W @ Vh
    Rb = U @ W.T @ Vh
    t = U[..., :, 2]
    Rs = jnp.stack([Ra, Ra, Rb, Rb])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def sampson_distance(pts1, pts2, F):
    """Squared Sampson distance of correspondences under F.

    pts1, pts2: (..., 2); F: (3, 3).  Used as the RANSAC inlier metric
    (replacing ``cv.findFundamentalMat``'s internal error,
    ``computer_code/api/index.py:246``).
    """
    p1 = jnp.concatenate([pts1, jnp.ones_like(pts1[..., :1])], axis=-1)
    p2 = jnp.concatenate([pts2, jnp.ones_like(pts2[..., :1])], axis=-1)
    Fp1 = jnp.einsum("ij,...j->...i", F, p1)
    Ftp2 = jnp.einsum("ji,...j->...i", F, p2)
    num = jnp.einsum("...i,...i->...", p2, Fp1) ** 2
    den = Fp1[..., 0] ** 2 + Fp1[..., 1] ** 2 + Ftp2[..., 0] ** 2 + Ftp2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)
