"""Batched masked DLT triangulation + reprojection errors.

Replaces the reference's per-point Python DLT
(``computer_code/api/helpers.py:293-336``) and reprojection-error loop
(``computer_code/api/helpers.py:203-241``).

Reference math (kept exactly):
  - per visible camera append rows [y*P2 - P1, P0 - x*P2] to A
    (``computer_code/api/helpers.py:314-316``)
  - B = A^T A, X = last right-singular vector dehomogenised
    (``computer_code/api/helpers.py:318-321``)
  - error = mean of squared pixel-residual components over visible cameras
    (``computer_code/api/helpers.py:239-241``)

TPU-first design: instead of deleting ``[None, None]`` rows
(``computer_code/api/helpers.py:296-298``), visibility is a boolean mask and
masked camera rows of A are zeroed — zero rows leave A^T A unchanged, so the
result is bit-identical to row deletion.  The 4x4 symmetric eigenproblem is
solved with batched ``eigh`` (smallest eigenvector == smallest right-singular
vector of the PSD matrix B).  Everything vmaps over an arbitrary leading
batch of points, so the whole frame triangulates as one fused XLA op.
"""

from __future__ import annotations

import jax.numpy as jnp


def _dlt_system(points_px, Ps, mask):
    """Build masked A^T A for the DLT system.

    points_px: (..., C, 2) observed pixels per camera.
    Ps:        (..., C, 3, 4) projection matrices.
    mask:      (..., C) bool visibility.
    Returns (..., 4, 4).
    """
    x = points_px[..., 0:1]  # (..., C, 1)
    y = points_px[..., 1:2]
    P0 = Ps[..., 0, :]  # (..., C, 4)
    P1 = Ps[..., 1, :]
    P2 = Ps[..., 2, :]
    r1 = y * P2 - P1           # (..., C, 4)
    r2 = P0 - x * P2
    m = mask[..., None].astype(Ps.dtype)
    A = jnp.concatenate([r1 * m, r2 * m], axis=-2)  # (..., 2C, 4)
    return jnp.einsum("...ki,...kj->...ij", A, A)


def triangulate_points(points_px, Ps, mask):
    """Triangulate a batch of points from multi-camera observations.

    points_px: (N, C, 2), Ps: (C, 3, 4), mask: (N, C) bool.
    Returns (X, valid): X (N, 3) world points (zeros where invalid),
    valid (N,) bool — requires >= 2 visible cameras
    (``computer_code/api/helpers.py:300-301``).
    """
    B = _dlt_system(points_px, Ps[None], mask)          # (N, 4, 4)
    _, vecs = jnp.linalg.eigh(B)                        # ascending eigenvalues
    h = vecs[..., :, 0]                                 # (N, 4) smallest
    w = h[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1.0, w)
    X = h[..., :3] / w_safe[..., None]
    valid = jnp.sum(mask, axis=-1) >= 2
    return jnp.where(valid[..., None], X, 0.0), valid


def reprojection_errors(points_px, X, Ps, mask):
    """Mean squared pixel residual per point (reference error metric).

    points_px: (N, C, 2); X: (N, 3); Ps: (C, 3, 4); mask: (N, C).
    Returns (N,) = mean over 2*n_visible squared residual components,
    matching ``computer_code/api/helpers.py:227-241``.  Invalid points get
    +inf so downstream argmins never select them.
    """
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)  # (N, 4)
    proj = jnp.einsum("cij,nj->nci", Ps, Xh)                       # (N, C, 3)
    z = proj[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    uv = proj[..., :2] / z_safe[..., None]
    sq = jnp.sum((uv - points_px) ** 2, axis=-1)                   # (N, C)
    m = mask.astype(sq.dtype)
    n_vis = jnp.sum(m, axis=-1)
    # mean over the 2*n_visible squared scalar components
    err = jnp.sum(sq * m, axis=-1) / jnp.maximum(2.0 * n_vis, 1.0)
    valid = n_vis >= 2
    return jnp.where(valid, err, jnp.inf)


def reproject(X, Ps):
    """Project (N, 3) world points through (C, 3, 4) -> (N, C, 2) pixels."""
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    proj = jnp.einsum("cij,nj->nci", Ps, Xh)
    z = proj[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    return proj[..., :2] / z_safe[..., None]
