"""Extrinsics auto-calibration: pairwise pose bootstrap + bundle adjustment.

Rebuilds the reference's ``calculate-camera-pose`` workflow
(``computer_code/api/index.py:229-277``):

  1. for each adjacent camera pair, robustly estimate F (RANSAC), lift to
     E, decompose into 4 motion candidates
     (``computer_code/api/index.py:246-248``);
  2. disambiguate by cheirality — the candidate that puts the most
     triangulated points in front of both cameras wins
     (``computer_code/api/index.py:250-262``);
  3. chain pair poses into the camera-0 frame
     (``computer_code/api/index.py:264-270``);
  4. refine everything with bundle adjustment (``ops/ba.py``).

Divergence from the reference (deliberate, documented): the reference reads
cameras 0/1's intrinsics for *every* pair (``computer_code/api/index.py:247``)
and triangulates cheirality candidates in a mixed frame
(``computer_code/api/index.py:254``); here each pair uses its own intrinsics
and cheirality is tested in the canonical two-view frame [I|0], [R|t] —
strictly more correct, and BA cleans up either way.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.ops import ba as ba_ops
from low_cost_mocap_tpu.ops import epipolar as epi
from low_cost_mocap_tpu.ops import ransac as ransac_ops
from low_cost_mocap_tpu.ops import triangulate as tri
from low_cost_mocap_tpu.ops.camera import projection_matrix


class CalibrationResult(NamedTuple):
    Rs: jnp.ndarray       # (C, 3, 3) world->camera rotations (camera 0 frame)
    ts: jnp.ndarray       # (C, 3)
    focals: jnp.ndarray   # (C,) refined focal lengths
    mean_error: jnp.ndarray  # mean reprojection error (reference metric,
                             # computer_code/api/index.py:274-275)
    ba_cost: jnp.ndarray
    ba_iters: jnp.ndarray


def _pair_relative_pose(key, pts1, pts2, pair_mask, K1, K2, ransac_iters,
                        threshold_px):
    """Relative pose (R, t) of camera b w.r.t. camera a from correspondences."""
    F, inliers = ransac_ops.ransac_fundamental(
        key, pts1, pts2, pair_mask, iters=ransac_iters,
        threshold_px=threshold_px)
    E = epi.essential_from_fundamental(F, K1, K2)
    Rcands, tcands = epi.motion_from_essential(E)

    # cheirality: triangulate inliers under [I|0], [R|t]; count points with
    # positive depth in both views (computer_code/api/index.py:250-262)
    eye_R = jnp.eye(3, dtype=pts1.dtype)
    zero_t = jnp.zeros(3, dtype=pts1.dtype)

    def count_in_front(Rc, tc):
        Ps = projection_matrix(
            jnp.stack([K1, K2]), jnp.stack([eye_R, Rc]), jnp.stack([zero_t, tc]))
        pc = jnp.stack([pts1, pts2], axis=1)            # (N, 2, 2)
        m = jnp.stack([inliers, inliers], axis=1)
        X, valid = tri.triangulate_points(pc, Ps, m)
        z1 = X[:, 2]
        z2 = (X @ Rc.T + tc)[:, 2]
        ok = valid & inliers
        return jnp.sum((z1 > 0) * ok) + jnp.sum((z2 > 0) * ok)

    counts = jax.vmap(count_in_front)(Rcands, tcands)
    best = jnp.argmax(counts)
    return Rcands[best], tcands[best], inliers


def bootstrap_poses(key, pts, mask, K_stack, ransac_iters: int = 512,
                    threshold_px: float = 1.0):
    """Chain pairwise poses into the camera-0 frame.

    pts: (N, C, 2) shared image points over N frames; mask: (N, C).
    Returns (Rs (C,3,3), ts (C,3)) with camera 0 at identity, translation
    scale arbitrary per pair (fixed later by BA + the scale wand, as in the
    reference).  Chaining follows ``computer_code/api/index.py:264-270``:
    R_b = R_rel @ R_a ;  t_b = t_a + R_a @ t_rel.
    """
    C = pts.shape[1]
    Rs = [jnp.eye(3, dtype=pts.dtype)]
    ts = [jnp.zeros(3, dtype=pts.dtype)]
    keys = jax.random.split(key, C - 1)
    for i in range(C - 1):
        pair_mask = mask[:, i] & mask[:, i + 1]
        R_rel, t_rel, _ = _pair_relative_pose(
            keys[i], pts[:, i], pts[:, i + 1], pair_mask,
            K_stack[i], K_stack[i + 1], ransac_iters, threshold_px)
        R_b = R_rel @ Rs[-1]
        t_b = ts[-1] + Rs[-1] @ t_rel
        Rs.append(R_b)
        ts.append(t_b)
    return jnp.stack(Rs), jnp.stack(ts)


def calibrate(key, pts, mask, K_stack, *, ransac_iters: int = 512,
              threshold_px: float = 1.0, ba_iters: int = 64,
              ba_mode: str = "pixel", progress_cb=None,
              progress_chunk: int = 8) -> CalibrationResult:
    """Full extrinsics calibration from captured image points.

    The reference's whole ``calculate-camera-pose`` handler
    (``computer_code/api/index.py:229-277``) as one function.

    ``progress_cb(Rs, ts, iters_done)``: when given, BA runs in chunks of
    ``progress_chunk`` iterations and the callback fires between chunks —
    the reference streams intermediate poses to the UI on every residual
    evaluation (``computer_code/api/helpers.py:274``); chunked solves keep
    that operator feedback without host round-trips inside the solver.
    """
    C = pts.shape[1]
    Rs0, ts0 = bootstrap_poses(key, pts, mask, K_stack,
                               ransac_iters=ransac_iters,
                               threshold_px=threshold_px)
    if progress_cb is None:
        res = ba_ops.bundle_adjust(pts, mask, K_stack, Rs0, ts0,
                                   num_cameras=C, max_iters=ba_iters,
                                   mode=ba_mode)
    else:
        import numpy as np

        Rs_c, ts_c = Rs0, ts0
        done = 0
        res = None
        while done < ba_iters:
            n = min(progress_chunk, ba_iters - done)
            res = ba_ops.bundle_adjust(pts, mask, K_stack, Rs_c, ts_c,
                                       num_cameras=C, max_iters=n,
                                       mode=ba_mode)
            Rs_c, ts_c = res.Rs, res.ts
            done += n
            progress_cb(np.asarray(res.Rs), np.asarray(res.ts), done)
    K = ba_ops._apply_focals(K_stack, res.focals)
    Ps = projection_matrix(K, res.Rs, res.ts)
    X, _ = tri.triangulate_points(pts, Ps, mask)
    errs = tri.reprojection_errors(pts, X, Ps, mask)
    finite = jnp.isfinite(errs)
    mean_err = jnp.sum(jnp.where(finite, errs, 0.0)) / jnp.maximum(
        jnp.sum(finite), 1)
    return CalibrationResult(res.Rs, res.ts, res.focals, mean_err,
                             res.cost, res.n_iters)
