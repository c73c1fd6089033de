"""Cross-view correspondence: epipolar gating + hypothesis scoring.

Replaces ``find_point_correspondance_and_object_points``
(``computer_code/api/helpers.py:339-421``) with a fixed-shape tensor
formulation.

Reference algorithm (kept semantically):
  1. points of camera 0 seed "root" tracks (``helpers.py:349,357``);
  2. for each later camera, candidates within a 5 px point-to-epiline gate
     extend every root's hypothesis set (cartesian expansion,
     ``helpers.py:370-400``); roots whose gate is empty get a "missing"
     observation (``helpers.py:387-389``);
  3. points that are not the closest match of any epiline become new roots
     (``helpers.py:391-406``);
  4. every hypothesis is triangulated and the minimum-reprojection-error one
     wins per root (``helpers.py:408-419``).

TPU-first redesign: the unbounded hypothesis lists become a static
enumeration — per root and per later camera we keep the top
``max_candidates`` gated candidates (sorted by epipolar distance, as the
reference sorts, ``helpers.py:383-385``) plus the "missing" option, giving
``(max_candidates+1)^(num_cameras-1-root_cam)`` hypotheses per root.  All
hypotheses for all roots triangulate in ONE batched DLT + error evaluation,
and an argmin picks the winner — the keep-all-then-argmin structure of the
reference is exactly what makes this tensorisation faithful.

Roots live in fixed (num_cameras, max_blobs) slot tables, so the whole
matcher is one jittable, vmappable function with static shapes.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from low_cost_mocap_tpu.ops import epipolar as epi
from low_cost_mocap_tpu.ops import triangulate as tri

_INF = jnp.inf


def _pairwise_fundamentals(Ps):
    """F[a, b]: lines in image b for points in image a.  (C, C, 3, 3)."""
    C = Ps.shape[0]
    Pa = jnp.repeat(Ps[:, None], C, axis=1).reshape(C * C, 3, 4)
    Pb = jnp.repeat(Ps[None, :], C, axis=0).reshape(C * C, 3, 4)
    F = jax.vmap(epi.fundamental_from_projections)(Pa, Pb)
    return F.reshape(C, C, 3, 3)


def _epipolar_distances(pts, valid, Ps, gate_px):
    """d[a, k, b, j] = distance of point (b, j) to epiline of point (a, k).

    Returns (d, gated) with shape (C, K, C, K); ``gated`` includes validity
    of both endpoints and the gate threshold
    (``computer_code/api/helpers.py:375``).
    """
    C, K, _ = pts.shape
    F = _pairwise_fundamentals(Ps)                       # (C, C, 3, 3)
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)  # (C,K,3)
    # lines[a, k, b, :] = F[a, b] @ ph[a, k]
    lines = jnp.einsum("abij,akj->akbi", F, ph)          # (C, K, C, 3)
    n = jnp.sqrt(lines[..., 0] ** 2 + lines[..., 1] ** 2)
    lines = lines / jnp.maximum(n[..., None], 1e-12)
    # distance to every point j of camera b
    d = jnp.abs(
        jnp.einsum("akbi,bji->akbj", lines[..., :2], pts) + lines[..., 2:3]
    )                                                    # (C, K, C, K)
    gated = (d < gate_px) & valid[None, None, :, :] & valid[:, :, None, None]
    return d, gated


def _compute_roots(d, gated, valid):
    """Which (camera, slot) points seed tracks.

    Camera 0's valid points always do (``helpers.py:349``).  A later
    camera's point seeds a track unless it is the *closest* gated candidate
    of some earlier root (``helpers.py:391-403``).  Static unrolled loop over
    the (small, static) camera count.
    """
    C, K = valid.shape
    root = [valid[0]] + [None] * (C - 1)
    for b in range(1, C):
        claimed = jnp.zeros((K,), bool)
        for a in range(b):
            da = jnp.where(gated[a, :, b, :], d[a, :, b, :], _INF)  # (K, K)
            jstar = jnp.argmin(da, axis=-1)                         # (K,)
            has = jnp.any(gated[a, :, b, :], axis=-1) & root[a]
            claim_a = jnp.zeros((K,), bool).at[jstar].max(has)
            claimed = claimed | claim_a
        root[b] = valid[b] & ~claimed
    return jnp.stack(root)  # (C, K) bool


@functools.lru_cache(maxsize=32)
def _combo_table(num_later: int, n_opt: int, h_max: int) -> np.ndarray:
    """(h_max, num_later) static table of candidate choices, padded.

    Choice values: 0..n_opt-2 = candidate rank, n_opt-1 = missing.
    """
    combos = list(itertools.product(range(n_opt), repeat=num_later))
    out = np.full((h_max, max(num_later, 1)), n_opt - 1, dtype=np.int32)
    for i, c in enumerate(combos):
        out[i, : len(c)] = c
    return out


def match_points(pts, valid, Ps, gate_px: float = 5.0, max_candidates: int = 2,
                 dedupe_eps: float = 0.02):
    """Full-frame correspondence + triangulation.

    pts: (C, K, 2) detected blob centroids; valid: (C, K); Ps: (C, 3, 4).
    Returns dict with ``object_points`` (C*K, 3), ``errors`` (C*K,),
    ``valid`` (C*K,) — one output slot per potential root, matching the
    reference's per-root winner selection (``helpers.py:408-419``).

    Improvement over the reference (documented): when two roots reconstruct
    near-coincident 3D points (ghost duplicates from unclaimed detections —
    the "garbage points" the reference's own comment acknowledges,
    ``helpers.py:377-380``), only the lower-reprojection-error one survives.
    ``dedupe_eps`` (metres) bounds "coincident"; set 0 to disable.
    """
    C, K, _ = pts.shape
    n_opt = max_candidates + 1                 # ranks + "missing"
    h_max = n_opt ** (C - 1)

    d, gated = _epipolar_distances(pts, valid, Ps, gate_px)
    root_mask = _compute_roots(d, gated, valid)

    # top-`max_candidates` gated candidate slots per (root, later camera)
    d_masked = jnp.where(gated, d, _INF)                    # (C, K, C, K)
    neg_top, cand_idx = jax.lax.top_k(-d_masked, max_candidates)
    cand_valid = jnp.isfinite(-neg_top)                     # (C, K, C, R)

    out_pts, out_err, out_ok = [], [], []
    for rc in range(C):
        later = list(range(rc + 1, C))
        combos = jnp.asarray(_combo_table(len(later), n_opt, h_max))  # (H, L)

        def per_root(k, combos=combos, later=later, rc=rc):
            # selected observation per hypothesis per camera
            sel = jnp.zeros((h_max, C, 2), pts.dtype)
            msk = jnp.zeros((h_max, C), bool)
            ok = jnp.ones((h_max,), bool)
            # own camera: always the root point itself
            sel = sel.at[:, rc].set(pts[rc, k])
            msk = msk.at[:, rc].set(True)
            for li, b in enumerate(later):
                choice = combos[:, li]                       # (H,)
                is_miss = choice == n_opt - 1
                rank = jnp.minimum(choice, max_candidates - 1)
                j = cand_idx[rc, k, b, rank]                 # (H,)
                cv = cand_valid[rc, k, b, rank]
                sel = sel.at[:, b].set(pts[b, j])
                msk = msk.at[:, b].set(~is_miss)
                ok = ok & (is_miss | cv)
            X, _ = tri.triangulate_points(sel, Ps, msk)
            err = tri.reprojection_errors(sel, X, Ps, msk)
            err = jnp.where(ok, err, _INF)
            best = jnp.argmin(err)
            return X[best], err[best], jnp.isfinite(err[best])

        Xr, er, okr = jax.vmap(per_root)(jnp.arange(K))
        out_pts.append(Xr)
        out_err.append(er)
        out_ok.append(okr & root_mask[rc])

    object_points = jnp.concatenate(out_pts)            # (C*K, 3)
    errors = jnp.concatenate(out_err)
    ok = jnp.concatenate(out_ok)
    errors = jnp.where(ok, errors, _INF)

    if dedupe_eps > 0:
        # drop a point when a strictly better (or equal-error, lower-index)
        # valid point lies within dedupe_eps
        diff = object_points[:, None, :] - object_points[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        n = errors.shape[0]
        i_idx = jnp.arange(n)
        better = (errors[None, :] < errors[:, None]) | (
            (errors[None, :] == errors[:, None]) & (i_idx[None, :] < i_idx[:, None]))
        clash = (d2 < dedupe_eps**2) & ok[None, :] & better
        ok = ok & ~jnp.any(clash, axis=1)
        errors = jnp.where(ok, errors, _INF)

    object_points = jnp.where(ok[:, None], object_points, 0.0)
    return {"object_points": object_points, "errors": errors, "valid": ok}
