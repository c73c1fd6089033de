"""Camera model: projection, distortion, undistortion, projection matrices.

Replaces the reference's OpenCV camera calls — ``cv.projectPoints``
(``computer_code/api/helpers.py:231-237``) and ``cv.undistort``
(``computer_code/api/helpers.py:74``) — with pure JAX kernels.

TPU-first design notes:

- The reference undistorts whole frames before blob detection.  Dewarping a
  frame is a bandwidth-bound gather; dewarping a *centroid* is ~10 flops.  The
  engine therefore detects blobs on raw frames and undistorts the K centroid
  coordinates analytically (``undistort_points``), which is mathematically
  equivalent for point features and removes a full-frame gather from the hot
  loop.  A full-image remap (``undistort_image`` + ``build_undistort_map``)
  is still provided for the MJPEG display path.
- Everything is batched: cameras stack along a leading axis so one call
  handles the whole rig; shapes are static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Distortion model (OpenCV 5-term: k1, k2, p1, p2, k3)
# ---------------------------------------------------------------------------


def distort_normalized(xy, dist):
    """Apply radial/tangential distortion to normalized coords.

    xy: (..., 2) normalized image coordinates (x/z, y/z).
    dist: (..., 5) [k1, k2, p1, p2, k3] (broadcastable against xy's batch).
    Returns distorted normalized coordinates, same shape as xy.
    """
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    x_t = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    y_t = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([x * radial + x_t, y * radial + y_t], axis=-1)


def undistort_normalized(xy_d, dist, iters: int = 8):
    """Invert the distortion map by fixed-point iteration (jit-friendly).

    Matches ``cv.undistortPoints`` to sub-1e-4 px for PS3-Eye-scale
    distortion.  ``iters`` is static so the loop unrolls into straight-line
    VPU code.
    """
    def body(_, xy):
        k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        x_t = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        y_t = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x_new = (xy_d[..., 0] - x_t) / radial
        y_new = (xy_d[..., 1] - y_t) / radial
        return jnp.stack([x_new, y_new], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xy_d)


# ---------------------------------------------------------------------------
# Pixel <-> normalized
# ---------------------------------------------------------------------------


def pixels_to_normalized(px, K):
    """(..., 2) pixels -> normalized coords given (..., 3, 3) intrinsics."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack([(px[..., 0] - cx) / fx, (px[..., 1] - cy) / fy], axis=-1)


def normalized_to_pixels(xy, K):
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack([xy[..., 0] * fx + cx, xy[..., 1] * fy + cy], axis=-1)


def undistort_points(px, K, dist, iters: int = 8):
    """Undistort pixel coords; output is pixels under the same K.

    Equivalent to detecting on a ``cv.undistort``-ed frame
    (``computer_code/api/helpers.py:74``) for point features.
    """
    xy_d = pixels_to_normalized(px, K)
    xy = undistort_normalized(xy_d, dist, iters=iters)
    return normalized_to_pixels(xy, K)


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------


def project_points(X, R, t, K, dist=None):
    """Project world points into a camera.

    X: (..., N, 3) points; R: (..., 3, 3); t: (..., 3); K: (..., 3, 3);
    dist: optional (..., 5).  Returns (..., N, 2) pixel coords.

    With ``dist=None`` this matches the reference's reprojection-error
    projection, which passes an empty distortion vector to
    ``cv.projectPoints`` (``computer_code/api/helpers.py:231-237``).
    """
    Xc = jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]
    xy = Xc[..., :2] / Xc[..., 2:3]
    if dist is not None:
        xy = distort_normalized(xy, dist[..., None, :])
    return normalized_to_pixels(xy, K[..., None, :, :])


def projection_matrix(K, R, t):
    """P = K [R | t] : (..., 3, 4) from (..., 3, 3), (..., 3, 3), (..., 3).

    Mirrors ``computer_code/api/helpers.py:305-308``.
    """
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return K @ Rt


# ---------------------------------------------------------------------------
# Full-frame undistortion (display path only)
# ---------------------------------------------------------------------------


def build_undistort_map(K, dist, height: int, width: int):
    """Precompute the source-pixel sampling grid for frame undistortion.

    Returns (H, W, 2) float32 map of (x_src, y_src) per destination pixel,
    computed once at startup — the per-frame cost is only the gather in
    ``undistort_image``.
    """
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    px = jnp.stack([gx, gy], axis=-1)
    xy = pixels_to_normalized(px, K)
    xy_d = distort_normalized(xy, dist)
    return normalized_to_pixels(xy_d, K)


def undistort_image(img, smap):
    """Bilinear resample ``img`` (H, W[, C]) at source map ``smap`` (H, W, 2)."""
    H, W = img.shape[0], img.shape[1]
    x = jnp.clip(smap[..., 0], 0.0, W - 1.0)
    y = jnp.clip(smap[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (x - x0.astype(x.dtype))[..., None] if img.ndim == 3 else (x - x0)
    wy = (y - y0.astype(y.dtype))[..., None] if img.ndim == 3 else (y - y0)
    f = img.astype(jnp.float32)
    v00 = f[y0, x0]
    v01 = f[y0, x1]
    v10 = f[y1, x0]
    v11 = f[y1, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
