"""Intrinsic calibration from planar-target views (Zhang's method).

The reference never calibrates intrinsics — it *loads* them from
``computer_code/api/camera-params.json`` (``computer_code/api/helpers.py:19-22``)
and tells the operator to produce that file with an external tool.  A user
switching to this framework would hit that gap on day one, so intrinsics
calibration is a first-class op here: observe a planar dot-grid target (the
same IR blobs the detector already finds) in V poses, and recover
``K = [[fx,0,cx],[0,fy,cy],[0,0,1]]`` plus the OpenCV 5-term distortion
``[k1,k2,p1,p2,k3]`` (the model in ``ops/camera.py``).

Method (Zhang, "A Flexible New Technique for Camera Calibration", PAMI 2000):

1. per view, a Hartley-normalised DLT homography board->image (batched
   ``vmap`` SVD — V tiny 9x9 problems);
2. closed-form K from the image of the absolute conic: each H contributes
   two linear constraints on ``B = K^-T K^-1``; the stacked (2V, 6) system's
   smallest right singular vector gives B, and K follows in closed form;
3. per-view extrinsics from ``K^-1 H`` columns (polar-orthogonalised);
4. joint Levenberg-Marquardt over ``[fx, fy, cx, cy, k1, k2, p1, p2, k3]``
   + per-view ``(rotvec, t)`` minimising reprojection error — the same
   explicit accept/reject LM scan as ``ops/ba.py`` (one XLA program,
   static shapes; masked slots support views with missing points).

Everything is offline/calibration-path code: batched ``jnp.linalg.svd`` is
fine here (the no-custom-calls rule guards the per-frame hot loop only).

``order_grid`` turns the detector's *unordered* blob set for a (rows, cols)
dot-grid into grid-indexed correspondences, so the existing blob pipeline
doubles as the calibration-target front-end (no corner detector needed).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from low_cost_mocap_tpu.ops import camera as cam_ops
from low_cost_mocap_tpu.ops import rotations as rot_ops


class IntrinsicsResult(NamedTuple):
    K: jnp.ndarray          # (3, 3)
    dist: jnp.ndarray       # (5,) [k1, k2, p1, p2, k3]
    Rs: jnp.ndarray         # (V, 3, 3) board->camera per view
    ts: jnp.ndarray         # (V, 3)
    rms_px: jnp.ndarray     # per-point reprojection RMS over valid points,
    #                         sqrt(mean ||e||^2) — cv2.calibrateCamera's convention
    iters: jnp.ndarray      # accepted LM steps


# ---------------------------------------------------------------------------
# 1. Homographies (batched, Hartley-normalised DLT)
# ---------------------------------------------------------------------------


def _normalise(pts, w):
    """Similarity transform taking weighted pts to mean 0 / RMS sqrt(2)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / wsum, 1e-9)
    T = jnp.array([[1.0, 0.0, -mean[0]],
                   [0.0, 1.0, -mean[1]],
                   [0.0, 0.0, 1.0 / scale]]) * scale
    T = T.at[2, 2].set(1.0)
    return (pts - mean) * scale, T


def homography_dlt(board_xy, img_xy, w):
    """Single-view DLT homography board(N,2) -> image(N,2), weights w(N,).

    Returns H (3,3) with H[2,2] ~ 1.  Masked points get zero rows.
    """
    bn, Tb = _normalise(board_xy, w)
    imn, Ti = _normalise(img_xy, w)
    x, y = bn[:, 0], bn[:, 1]
    u, v = imn[:, 0], imn[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # (2N, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    Hn = Vt[-1].reshape(3, 3)
    H = jnp.linalg.solve(Ti, Hn) @ Tb
    return H / H[2, 2]


# ---------------------------------------------------------------------------
# 2. Closed-form K (image of the absolute conic)
# ---------------------------------------------------------------------------


def _vij(H, i, j):
    """Zhang's v_ij row: constraint h_i^T B h_j in the 6-vector basis."""
    h_i, h_j = H[:, i], H[:, j]
    return jnp.stack([
        h_i[0] * h_j[0],
        h_i[0] * h_j[1] + h_i[1] * h_j[0],
        h_i[1] * h_j[1],
        h_i[2] * h_j[0] + h_i[0] * h_j[2],
        h_i[2] * h_j[1] + h_i[1] * h_j[2],
        h_i[2] * h_j[2],
    ])


def intrinsics_from_homographies(Hs, view_ok=None):
    """Closed-form K (zero final skew) from (V, 3, 3) homographies, V >= 3.

    ``view_ok``: optional (V,) weights; a view with too few valid points
    yields a garbage homography, and zero-weighting its constraint rows
    keeps it out of the conic estimate (shapes stay static)."""
    rows01 = jax.vmap(lambda H: _vij(H, 0, 1))(Hs)                 # (V, 6)
    rows00_11 = jax.vmap(lambda H: _vij(H, 0, 0) - _vij(H, 1, 1))(Hs)
    if view_ok is not None:
        rows01 = rows01 * view_ok[:, None]
        rows00_11 = rows00_11 * view_ok[:, None]
    A = jnp.concatenate([rows01, rows00_11], axis=0)               # (2V, 6)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    b = Vt[-1]
    B11, B12, B22, B13, B23, B33 = b
    v0 = (B12 * B13 - B11 * B23) / (B11 * B22 - B12 * B12)
    lam = B33 - (B13 * B13 + v0 * (B12 * B13 - B11 * B23)) / B11
    alpha = jnp.sqrt(jnp.abs(lam / B11))
    beta = jnp.sqrt(jnp.abs(lam * B11 / (B11 * B22 - B12 * B12)))
    gamma = -B12 * alpha * alpha * beta / lam
    u0 = gamma * v0 / beta - B13 * alpha * alpha / lam
    # drop the (tiny, noise-level) skew from the final model: the refine
    # stage and ops/camera.py both assume K[0,1] == 0, as does OpenCV
    return jnp.array([[alpha, 0.0, u0],
                      [0.0, beta, v0],
                      [0.0, 0.0, 1.0]], dtype=Hs.dtype)


def extrinsics_from_homography(H, K):
    """Board pose (R, t) from one homography and K (Zhang sec. 3.1)."""
    A = jnp.linalg.solve(K, H)                                     # K^-1 H
    lam = 1.0 / jnp.maximum(jnp.linalg.norm(A[:, 0]), 1e-12)
    # cheirality: board must sit in front of the camera (t_z > 0)
    lam = lam * jnp.sign(A[2, 2] + 1e-30)
    r1, r2, t = lam * A[:, 0], lam * A[:, 1], lam * A[:, 2]
    Q = jnp.stack([r1, r2, jnp.cross(r1, r2)], axis=-1)
    U, _, Vt = jnp.linalg.svd(Q)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))                            # proper
    return R, t


# ---------------------------------------------------------------------------
# 3. Joint LM refinement
# ---------------------------------------------------------------------------


def _unpack(p, V):
    fx, fy, cx, cy = p[0], p[1], p[2], p[3]
    dist = p[4:9]
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]],
                  dtype=p.dtype)
    pv = p[9:].reshape(V, 6)
    Rs = jax.vmap(rot_ops.rotvec_to_matrix)(pv[:, :3])
    return K, dist, Rs, pv[:, 3:]


def _residuals(p, board3, img_pts, w, V):
    K, dist, Rs, ts = _unpack(p, V)
    uv = cam_ops.project_points(board3, Rs, ts, K[None].repeat(V, 0),
                                dist[None].repeat(V, 0))     # (V, N, 2)
    return ((uv - img_pts) * w[..., None]).reshape(-1)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def refine(board_xy, img_pts, w, K0, Rs0, ts0, *, max_iters: int = 48):
    """Joint LM over intrinsics + distortion + per-view poses.

    board_xy: (N, 2) planar target points (z = 0 plane, metres).
    img_pts:  (V, N, 2) observed pixels; w: (V, N) validity weights.
    Returns (K, dist, Rs, ts, rms_px, accepted_iters).
    """
    V = img_pts.shape[0]
    # masked slots may carry NaN sentinels; 0 * NaN = NaN would otherwise
    # poison the weighted residuals (and every LM step with them)
    img_pts = jnp.where(w[..., None] > 0, img_pts, 0.0)
    board3 = jnp.concatenate(
        [board_xy, jnp.zeros_like(board_xy[:, :1])], axis=-1)
    rv0 = jax.vmap(rot_ops.matrix_to_rotvec)(Rs0)
    p0 = jnp.concatenate([
        jnp.array([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2]], K0.dtype),
        jnp.zeros((5,), K0.dtype),
        jnp.concatenate([rv0, ts0], axis=-1).reshape(-1),
    ])
    nparam = p0.shape[0]
    res_fn = lambda p: _residuals(p, board3, img_pts, w, V)

    def cost_of(r):
        return 0.5 * jnp.sum(r * r)

    def step(carry, _):
        p, lam, cost, done = carry
        r = res_fn(p)
        J = jax.jacfwd(res_fn)(p)                          # (M, P)
        H = J.T @ J
        g = J.T @ r
        I = jnp.eye(nparam, dtype=p.dtype)
        # Marquardt damping with a unit floor: a fully-masked view zeroes
        # its 6-param block of H, and damping proportional to diag(H) alone
        # would leave that block ~singular (solve -> NaN, every step
        # rejected).  Flooring the damped diagonal at lam keeps the system
        # well-posed; the masked block's gradient is zero so its params
        # simply stay put.
        damp = jnp.maximum(jnp.diag(H), 1.0)
        delta = jnp.linalg.solve(H + lam * (I * damp), -g)
        p1 = p + delta
        c1 = cost_of(res_fn(p1))
        accept = c1 < cost
        new_p = jnp.where(accept, p1, p)
        new_lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-12), lam * 5.0)
        new_cost = jnp.where(accept, c1, cost)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-18)
        new_done = done | (accept & (rel < 1e-10))
        new_p = jnp.where(done, p, new_p)
        new_cost = jnp.where(done, cost, new_cost)
        return (new_p, new_lam, new_cost, new_done), accept & ~done

    c0 = cost_of(res_fn(p0))
    (p, _, cost, _), accepts = jax.lax.scan(
        step, (p0, jnp.asarray(1e-3, p0.dtype), c0, jnp.asarray(False)),
        None, length=max_iters)
    K, dist, Rs, ts = _unpack(p, V)
    n_valid = jnp.maximum(jnp.sum(w), 1.0)
    # OpenCV calibrateCamera convention: per-POINT RMS,
    # sqrt(sum ||e_i||^2 / n_points) — directly comparable to its return
    rms = jnp.sqrt(2.0 * cost / n_valid)
    return K, dist, Rs, ts, rms, jnp.sum(accepts)


def calibrate_intrinsics(board_xy, img_pts, mask=None, *,
                         max_iters: int = 48) -> IntrinsicsResult:
    """Full Zhang pipeline: homographies -> closed-form K -> joint LM.

    board_xy: (N, 2) target layout (metres, z = 0); img_pts: (V, N, 2)
    pixels per view; mask: optional (V, N) bool validity (default all).
    Needs V >= 3 views with the target at genuinely different orientations.
    """
    board_xy = jnp.asarray(board_xy, jnp.float32)
    img_pts = jnp.asarray(img_pts, jnp.float32)
    V, N = img_pts.shape[0], img_pts.shape[1]
    if V < 3:
        raise ValueError(f"need >= 3 views for intrinsics, got {V}")
    w = (jnp.ones((V, N), jnp.float32) if mask is None
         else jnp.asarray(mask, jnp.float32))
    # masked slots may carry NaN sentinels (the natural encoding for
    # missing detections) — zero them before they touch any weighted sum
    img_pts = jnp.where(w[..., None] > 0, img_pts, 0.0)
    Hs = jax.vmap(lambda im, ww: homography_dlt(board_xy, im, ww))(
        img_pts, w)
    # a view needs >= 4 points for a homography; under that, its H is
    # noise — keep it out of the closed-form conic system (the LM stage
    # already ignores it through the weights)
    view_ok = (jnp.sum(w, axis=1) >= 4).astype(jnp.float32)
    K0 = intrinsics_from_homographies(Hs, view_ok)
    Rs0, ts0 = jax.vmap(lambda H: extrinsics_from_homography(H, K0))(Hs)
    # degenerate views can decompose to non-finite poses; even with zero
    # residual weight, NaN * 0 = NaN would sink the whole LM cost.
    # Substitute a benign placeholder pose (its residuals are weighted out).
    good = (view_ok > 0) & jnp.isfinite(Rs0).all(axis=(-2, -1)) \
        & jnp.isfinite(ts0).all(axis=-1)
    Rs0 = jnp.where(good[:, None, None], Rs0, jnp.eye(3, dtype=Rs0.dtype))
    ts0 = jnp.where(good[:, None], ts0,
                    jnp.asarray([0.0, 0.0, 1.0], ts0.dtype))
    K, dist, Rs, ts, rms, iters = refine(
        board_xy, img_pts, w, K0, Rs0, ts0, max_iters=max_iters)
    return IntrinsicsResult(K, dist, Rs, ts, rms, iters)


# ---------------------------------------------------------------------------
# Dot-grid ordering: unordered detector blobs -> grid-indexed points
# ---------------------------------------------------------------------------


def make_grid(rows: int, cols: int, spacing: float) -> np.ndarray:
    """(rows*cols, 2) planar target layout, row-major, metres."""
    jj, ii = np.meshgrid(np.arange(cols), np.arange(rows))
    return np.stack([jj.reshape(-1), ii.reshape(-1)],
                    axis=-1).astype(np.float32) * spacing


def order_grid(points: np.ndarray, rows: int, cols: int,
               max_resid: float = 0.25):
    """Order an unordered (rows*cols, 2) point set into grid-major order.

    Host-side numpy helper (calibration path): estimates the projective
    frame from the set's extreme corners, maps every point into grid
    coordinates, and snaps to integer nodes.  Tries all 8 corner labelings
    (4 rotations x mirror) and keeps the one whose snap is a bijection with
    the lowest residual.  Returns (order, resid) where ``points[order][k]``
    is grid node (k // cols, k % cols), or (None, inf) when no labeling
    yields a consistent grid (e.g. wrong blob count upstream, extreme
    perspective).  ``max_resid`` is the mean snap distance gate in grid
    units (node pitch == 1).
    """
    pts = np.asarray(points, np.float64)
    n = rows * cols
    if pts.shape != (n, 2):
        return None, float("inf")
    ctr = pts.mean(axis=0)
    q = pts - ctr
    # corner candidates: extremes of the two diagonal axes of the set's
    # principal frame (robust to rotation of the board in the image)
    _, _, vt = np.linalg.svd(q, full_matrices=False)
    pq = q @ vt.T
    cands = [pts[int(np.argmax(a))] for a in
             (pq[:, 0] + pq[:, 1], pq[:, 0] - pq[:, 1],
              -pq[:, 0] - pq[:, 1], -pq[:, 0] + pq[:, 1])]
    corners_img = np.asarray(cands)                     # some cyclic order
    grid_corners = np.array([[0.0, 0.0], [cols - 1.0, 0.0],
                             [cols - 1.0, rows - 1.0], [0.0, rows - 1.0]])
    best = (None, float("inf"))
    for mirror in (False, True):
        ci = corners_img[::-1] if mirror else corners_img
        for shift in range(4):
            quad = np.roll(ci, shift, axis=0)
            H = _homography_np(grid_corners, quad)
            if H is None:
                continue
            inv = np.linalg.inv(H)
            ph = np.concatenate([pts, np.ones((n, 1))], axis=-1) @ inv.T
            g = ph[:, :2] / ph[:, 2:3]                  # grid coords
            snap = np.rint(g)
            resid = float(np.linalg.norm(g - snap, axis=-1).mean())
            idx = snap[:, 1].astype(int) * cols + snap[:, 0].astype(int)
            ok = (snap[:, 0] >= 0).all() and (snap[:, 0] < cols).all() \
                and (snap[:, 1] >= 0).all() and (snap[:, 1] < rows).all() \
                and len(set(idx.tolist())) == n
            if ok and resid < best[1]:
                order = np.empty(n, int)
                order[idx] = np.arange(n)
                best = (order, resid)
    if best[0] is None or best[1] > max_resid:
        return None, best[1]
    return best


def _homography_np(src, dst):
    """Exact 4-point homography (numpy, host path)."""
    A = []
    for (x, y), (u, v) in zip(src, dst):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
    A = np.asarray(A, np.float64)
    _, s, vt = np.linalg.svd(A)
    if s[-2] < 1e-12:                                   # degenerate quad
        return None
    H = vt[-1].reshape(3, 3)
    if abs(H[2, 2]) < 1e-12:
        return None
    return H / H[2, 2]
