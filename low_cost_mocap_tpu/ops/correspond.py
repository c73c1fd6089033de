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


def _epipolar_distances(pts, valid, Ps, gate_px, Fs=None):
    """d[a, k, b, j] = distance of point (b, j) to epiline of point (a, k).

    Returns (d, gated) with shape (C, K, C, K); ``gated`` includes validity
    of both endpoints and the gate threshold
    (``computer_code/api/helpers.py:375``).
    """
    C, K, _ = pts.shape
    F = _pairwise_fundamentals(Ps) if Fs is None else Fs  # (C, C, 3, 3)
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)  # (C,K,3)
    # lines[a, k, b, :] = F[a, b] @ ph[a, k] — full-f32: these distances
    # seed/gate the correspondence argmins, and bf16-truncated pixels
    # flip borderline groupings (few-mm spikes on occasional frames,
    # measured with the on-chip vs-reference differential)
    lines = jnp.einsum("abij,akj->akbi", F, ph,
                       precision=jax.lax.Precision.HIGH)  # (C, K, C, 3)
    n = jnp.sqrt(lines[..., 0] ** 2 + lines[..., 1] ** 2)
    lines = lines / jnp.maximum(n[..., None], 1e-12)
    # distance to every point j of camera b
    d = jnp.abs(
        jnp.einsum("akbi,bji->akbj", lines[..., :2], pts,
                   precision=jax.lax.Precision.HIGH) + lines[..., 2:3]
    )                                                    # (C, K, C, K)
    # Mask the same-camera diagonal explicitly: F[a, a] is built from
    # duplicated projection rows, so d[a, k, a, j] is ~0 up to float32
    # rounding noise in the determinant construction — without this mask the
    # assoc seed argmin could pair a root with a blob of its OWN camera and
    # emit a ghost point on the root's ray.
    same_cam = jnp.eye(C, dtype=bool)[:, None, :, None]      # (C,1,C,1)
    gated = ((d < gate_px) & ~same_cam
             & valid[None, None, :, :] & valid[:, :, None, None])
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


@functools.lru_cache(maxsize=32)
def _hypothesis_tables(C: int, n_opt: int):
    """Static RAGGED hypothesis tables for the all-roots one-hot matcher.

    Hypotheses for every root camera are flattened into ONE axis of
    length H_tot = sum_rc n_opt^(C-1-rc) — no all-missing padding rows
    (a (C, n_opt^(C-1)) rectangle wastes 2.7x the DLT work at C=4).
    Per hypothesis ``h`` (root camera rc(h)) and camera ``b``:
      - ``onehot`` (H_tot, C_root, C, R) f32: one-hot of (root camera,
        candidate rank) the combo picks (all-zero when missing/self) —
        hypothesis observations are *contracted* out of the
        (C_root, K, C, R) candidate tensor with this instead of gathered
        (TPU gathers are row-serial; a tiny einsum is pure VPU);
      - ``use_tab`` (H_tot, C) bool: b is a later camera with a candidate
        picked (vs "missing", reference ``helpers.py:387-389``);
      - ``self_tab`` (H_tot, C) bool: b == rc(h) (the root's own point);
      - ``rc_onehot`` (C_root, H_tot) f32 + ``rc_of_h`` (H_tot,) int32:
        ownership of hypotheses by root camera (for per-root argmin).
    Hypothesis order within a root camera is exactly ``_combo_table``'s
    (itertools.product), preserving the reference's tie-break order.
    """
    R = n_opt - 1
    counts = [n_opt ** (C - 1 - rc) for rc in range(C)]
    H_tot = sum(counts)
    onehot = np.zeros((H_tot, C, C, R), np.float32)
    use_tab = np.zeros((H_tot, C), bool)
    self_tab = np.zeros((H_tot, C), bool)
    rc_of_h = np.zeros((H_tot,), np.int32)
    h0 = 0
    for rc in range(C):
        later = list(range(rc + 1, C))
        n_h = counts[rc]
        combos = _combo_table(len(later), n_opt, n_h)
        sl = slice(h0, h0 + n_h)
        rc_of_h[sl] = rc
        self_tab[sl, rc] = True
        for li, b in enumerate(later):
            choice = combos[:, li]
            miss = choice == n_opt - 1
            use_tab[sl, b] = ~miss
            rank = np.minimum(choice, R - 1)
            onehot[h0 + np.arange(n_h), rc, b, rank] = \
                (~miss).astype(np.float32)
        h0 += n_h
    rc_onehot = np.zeros((C, H_tot), np.float32)
    rc_onehot[rc_of_h, np.arange(H_tot)] = 1.0
    return onehot, use_tab, self_tab, rc_onehot, rc_of_h


def match_points(pts, valid, Ps, gate_px: float = 5.0, max_candidates: int = 2,
                 dedupe_eps: float = 0.02, mode: str = "auto",
                 beam_width: int = 0, miss_penalty_px: float = -1.0,
                 Fs=None, with_obs: bool = False):
    """Full-frame correspondence + triangulation.

    pts: (C, K, 2) detected blob centroids; valid: (C, K); Ps: (C, 3, 4).
    Returns dict with ``object_points`` (C*K, 3), ``errors`` (C*K,),
    ``valid`` (C*K,) — one output slot per potential root, matching the
    reference's per-root winner selection (``helpers.py:408-419``).

    ``mode``: "exact" enumerates every candidate combination (the
    reference's cartesian expansion, ``helpers.py:394-400`` — exponential in
    camera count); "assoc" seeds each root from its best epipolar pair and
    converges by reproject-associate-retriangulate (constant sequential
    depth, fully batched — the large-rig fast path: measured 7.7x faster
    than beam at 16 cameras, 650 us vs 5.0 ms on TPU v5e); "beam" grows
    hypotheses camera-by-camera keeping the
    ``beam_width`` lowest-reprojection-error partial assemblies (closest
    to the reference's semantics at large C, but sequential in cameras).
    "auto" picks exact for <= 5 cameras, else assoc.
    Default ``beam_width`` is ``(max_candidates+1)^2`` so the first two
    expansion levels (where 2-view errors are uninformative) are unpruned.

    Hypothesis selection scores missing views as ``miss_penalty_px``-sized
    residuals (default: the epipolar gate).  The reference's bare
    mean-error argmin (``helpers.py:418``) prefers a perfect 2-view fit
    over an honest all-view fit, which costs accuracy on large rigs; the
    penalty makes "use a within-gate view" always beat "drop it".  Reported
    ``errors`` remain the raw mean of the winner (the UI contract).  Set 0
    to restore the reference's selection rule exactly.

    Improvement over the reference (documented): when two roots reconstruct
    near-coincident 3D points (ghost duplicates from unclaimed detections —
    the "garbage points" the reference's own comment acknowledges,
    ``helpers.py:377-380``), only the lower-reprojection-error one survives.
    ``dedupe_eps`` (metres) bounds "coincident"; set 0 to disable.  In
    exact mode the dedupe is additionally RE-SELECTION-aware: a camera-0
    root whose winner collides with a better camera-0 winner (two objects
    aligned in one view — the partial-occlusion ghost geometry) falls back
    to its best non-duplicate >= 3-view sub-gate hypothesis instead of
    losing its detection (see the inline block; measured on the
    vs-reference differential's occlusion scenes).
    """
    C, K, _ = pts.shape
    n_opt = max_candidates + 1                 # ranks + "missing"
    if mode == "auto":
        mode = "exact" if C <= 5 else "assoc"
    if beam_width <= 0:
        beam_width = n_opt * n_opt
    if miss_penalty_px < 0:
        miss_penalty_px = gate_px
    tau2 = miss_penalty_px * miss_penalty_px

    def selection_score(err, msk, rc):
        """err = raw mean sq px error; penalise later-camera misses."""
        n_vis = jnp.sum(msk, axis=-1).astype(err.dtype)
        n_later = float(C - rc - 1)
        n_miss = jnp.maximum(n_later - (n_vis - 1.0), 0.0)
        return (err * n_vis + n_miss * tau2) / jnp.maximum(
            n_vis + n_miss, 1.0)

    d, gated = _epipolar_distances(pts, valid, Ps, gate_px, Fs)
    root_mask = _compute_roots(d, gated, valid)

    if mode == "assoc":
        return _match_assoc(pts, valid, Ps, d, gated, root_mask,
                            gate_px, dedupe_eps, with_obs)

    # top-`max_candidates` gated candidate slots per (root, later camera)
    d_masked = jnp.where(gated, d, _INF)                    # (C, K, C, K)
    neg_top, cand_idx = jax.lax.top_k(-d_masked, max_candidates)
    cand_valid = jnp.isfinite(-neg_top)                     # (C, K, C, R)

    if mode == "exact":
        # All roots x all hypotheses evaluated at once: pre-gather the tiny
        # (C, K, C, R) candidate-observation tensor, then *contract* each
        # hypothesis's observations out of it with a static RAGGED one-hot
        # table (one flattened hypothesis axis, no all-missing padding) and
        # run ONE batched DLT over every (root, hypothesis).  No Python
        # loop over root cameras, no scatters, and no large gathers (TPU
        # gathers are row-serial; these einsums are pure VPU work).
        onehot_np, use_np, self_np, rc_oh_np, rc_of_h = \
            _hypothesis_tables(C, n_opt)
        onehot = jnp.asarray(onehot_np)                     # (H, C, C, R)
        use_tab = jnp.asarray(use_np)                       # (H, C)
        self_tab = jnp.asarray(self_np)                     # (H, C)
        rc_onehot = jnp.asarray(rc_oh_np)                   # (C, H)
        H = onehot_np.shape[0]

        # candidate observations: obs_cand[a, k, b, r] = pts[b, cand_idx[a,k,b,r]]
        b_idx = jnp.arange(C)[None, None, :, None]
        obs_cand = pts[b_idx, cand_idx]                     # (C, K, C, R, 2)

        # hypothesis selections via one-hot contraction
        obs = jnp.einsum("habr,akbrx->khbx", onehot, obs_cand,
                         precision=jax.lax.Precision.HIGH)
        cv_miss = jnp.einsum("habr,akbr->khb", onehot,
                             (~cand_valid).astype(onehot.dtype))
        self_pts = jnp.einsum("ah,akx->khx", rc_onehot, pts,
                              precision=jax.lax.Precision.HIGHEST)  # (K, H, 2)
        sel = jnp.where(self_tab[None, :, :, None],
                        self_pts[:, :, None, :], obs)      # (K, H, C, 2)
        msk = jnp.broadcast_to((self_tab | use_tab)[None], (K, H, C))
        ok = jnp.sum(cv_miss, axis=-1) < 0.5                # (K, H)

        sel_f = sel.reshape(K * H, C, 2)
        msk_f = msk.reshape(K * H, C)
        X, _ = tri.triangulate_points(sel_f, Ps, msk_f)     # (KH, 3)
        err = tri.reprojection_errors(sel_f, X, Ps, msk_f)
        X = X.reshape(K, H, 3)
        err = jnp.where(ok, err.reshape(K, H), _INF)

        # selection score with per-root-camera miss penalty
        n_vis = jnp.sum(msk, axis=-1).astype(err.dtype)     # (K, H)
        n_later = jnp.asarray((C - 1 - rc_of_h).astype(np.float32))[None]
        n_miss = jnp.maximum(n_later - (n_vis - 1.0), 0.0)
        score = (err * n_vis + n_miss * tau2) / jnp.maximum(
            n_vis + n_miss, 1.0)
        score = jnp.where(ok, score, _INF)

        # per-root-camera winner: hypotheses are contiguous per rc, so the
        # argmin runs over static slices (rc-major output order preserved)
        sel = sel.reshape(K, H, C, 2)
        out_pts, out_err, out_obs, out_om = [], [], [], []
        h0 = 0
        for rc in range(C):
            n_h = n_opt ** (C - 1 - rc)
            s = score[:, h0:h0 + n_h]                       # (K, n_h)
            best = jnp.argmin(s, axis=-1)                   # (K,)
            out_pts.append(jnp.take_along_axis(
                X[:, h0:h0 + n_h], best[:, None, None], axis=1)[:, 0])
            out_err.append(jnp.take_along_axis(
                err[:, h0:h0 + n_h], best[:, None], axis=1)[:, 0])
            if with_obs:
                out_obs.append(jnp.take_along_axis(
                    sel[:, h0:h0 + n_h], best[:, None, None, None],
                    axis=1)[:, 0])
                out_om.append(jnp.take_along_axis(
                    msk[:, h0:h0 + n_h], best[:, None, None], axis=1)[:, 0])
            h0 += n_h
        object_points = jnp.concatenate(out_pts)            # (C*K, 3)
        errors = jnp.concatenate(out_err)
        ok = jnp.isfinite(errors) & root_mask.reshape(C * K)
        errors = jnp.where(ok, errors, _INF)
        obs_cat = jnp.concatenate(out_obs) if with_obs else None
        om_cat = jnp.concatenate(out_om) if with_obs else None

        if dedupe_eps > 0:
            # Dedupe-aware winner RE-SELECTION (improvement over the
            # reference, documented): when a root's winning hypothesis
            # reconstructs (within dedupe_eps) a point a BETTER root
            # already explains, that winner is a ghost the dedupe pass
            # will delete — taking the root's detection with it.  This is
            # exactly the partial-occlusion failure measured by the
            # vs-reference differential (utils/differential.py): with one
            # camera occluded, a cross-object assembly with all-view
            # support outscores the honest fewer-view assembly (miss
            # penalty), collides with the other object's winner, and the
            # occluded object's markers vanish — the reference loses the
            # whole window (helpers.py:385-399 cannot even represent the
            # miss), and the first-pass argmin here loses part of it.
            # Scope — deliberately narrow so clean scenes are untouched
            # (re-selecting for EVERY killed root measurably perturbed
            # clean-scene parity: later-camera ghost roots kept finding
            # loose "qualifying" alternatives): only a CAMERA-0 root
            # killed by another CAMERA-0 root's winner re-selects.  Two
            # distinct camera-0 detections reconstructing one 3D point is
            # precisely the two-objects-aligned-in-one-view geometry of
            # the occlusion failure; ordinary ghost duplicates (unclaimed
            # later-camera roots re-explaining a point) keep dying
            # silently as before.  The fallback must (a) NOT be near any
            # better winner, (b) have >= 3-view consensus, (c) reproject
            # below the gate.
            N = C * K
            i_idx = jnp.arange(N)
            btr = ((errors[None, :] < errors[:, None])
                   | ((errors[None, :] == errors[:, None])
                      & (i_idx[None, :] < i_idx[:, None]))) & ok[None, :]
            dW = jnp.sum((object_points[:, None]
                          - object_points[None]) ** 2, -1)
            clash = (dW < dedupe_eps ** 2) & btr             # (N, N)
            # camera-0 roots are output slots 0..K-1 (rc-major order)
            cam0 = i_idx < K
            killed0 = (ok & cam0
                       & jnp.any(clash & cam0[None, :], axis=1))  # (N,)
            H0 = n_opt ** (C - 1)        # rc = 0 hypothesis count
            near0 = (jnp.sum((X[:, :H0, None, :]
                              - object_points[None, None]) ** 2, -1)
                     < dedupe_eps ** 2)                      # (K, H0, N)
            btr0 = btr[:K]                                   # (K, N)
            bad0 = jnp.any(near0 & btr0[:, None, :], -1)     # (K, H0)
            qual0 = (jnp.isfinite(err[:, :H0]) & (n_vis[:, :H0] >= 3.0)
                     & (err[:, :H0] < gate_px * gate_px) & ~bad0)
            s2 = jnp.where(qual0, score[:, :H0], _INF)
            best2 = jnp.argmin(s2, axis=-1)                  # (K,)
            a_pts = jnp.take_along_axis(
                X[:, :H0], best2[:, None, None], axis=1)[:, 0]
            a_err = jnp.take_along_axis(
                err[:, :H0], best2[:, None], axis=1)[:, 0]
            use0 = killed0[:K] & jnp.isfinite(a_err)         # (K,)
            use_alt = jnp.concatenate(
                [use0, jnp.zeros(N - K, bool)])
            pad = jnp.zeros((N - K, 3), a_pts.dtype)
            object_points = jnp.where(
                use_alt[:, None],
                jnp.concatenate([a_pts, pad]), object_points)
            errors = jnp.where(
                use_alt, jnp.concatenate([a_err, jnp.full(N - K, _INF)]),
                errors)
            if with_obs:
                a_obs = jnp.take_along_axis(
                    sel[:, :H0], best2[:, None, None, None], axis=1)[:, 0]
                a_om = jnp.take_along_axis(
                    msk[:, :H0], best2[:, None, None], axis=1)[:, 0]
                obs_cat = jnp.where(
                    use_alt[:, None, None],
                    jnp.concatenate([a_obs, jnp.zeros_like(
                        obs_cat[K:])]), obs_cat)
                om_cat = jnp.where(
                    use_alt[:, None],
                    jnp.concatenate([a_om, jnp.zeros_like(om_cat[K:])]),
                    om_cat)

        return _finalize(object_points, errors, ok, dedupe_eps,
                         obs_cat, om_cat)

    out_pts, out_err, out_ok, out_obs, out_om = [], [], [], [], []
    for rc in range(C):
        later = list(range(rc + 1, C))
        B = beam_width
        choice_vec = jnp.arange(n_opt)

        def per_root(k, later=later, rc=rc, B=B):
            sel = jnp.zeros((B, C, 2), pts.dtype)
            msk = jnp.zeros((B, C), bool)
            ok = jnp.zeros((B,), bool).at[0].set(True)  # one live seed
            sel = sel.at[:, rc].set(pts[rc, k])
            msk = msk.at[:, rc].set(True)
            for b in later:
                is_miss = choice_vec == n_opt - 1        # (n_opt,)
                rank = jnp.minimum(choice_vec, max_candidates - 1)
                j = cand_idx[rc, k, b, rank]             # (n_opt,)
                cv = cand_valid[rc, k, b, rank]
                # expand: (B, n_opt, ...) then flatten
                sel_e = jnp.broadcast_to(sel[:, None], (B, n_opt, C, 2))
                sel_e = sel_e.at[:, :, b].set(
                    jnp.broadcast_to(pts[b, j], (B, n_opt, 2)))
                msk_e = jnp.broadcast_to(msk[:, None], (B, n_opt, C))
                msk_e = msk_e.at[:, :, b].set(
                    jnp.broadcast_to(~is_miss, (B, n_opt)))
                ok_e = ok[:, None] & (is_miss | cv)[None, :]
                sel_f = sel_e.reshape(B * n_opt, C, 2)
                msk_f = msk_e.reshape(B * n_opt, C)
                ok_f = ok_e.reshape(B * n_opt)
                X, _ = tri.triangulate_points(sel_f, Ps, msk_f)
                err = tri.reprojection_errors(sel_f, X, Ps, msk_f)
                # partials with <2 views rank at zero raw error
                nvis = jnp.sum(msk_f, axis=-1)
                err = jnp.where(nvis >= 2, err, 0.0)
                score = selection_score(err, msk_f, rc)
                score = jnp.where(ok_f, score, _INF)
                _, keep = jax.lax.top_k(-score, B)
                sel = sel_f[keep]
                msk = msk_f[keep]
                ok = ok_f[keep]
            X, _ = tri.triangulate_points(sel, Ps, msk)
            err = tri.reprojection_errors(sel, X, Ps, msk)
            err = jnp.where(ok, err, _INF)
            score = jnp.where(ok, selection_score(err, msk, rc), _INF)
            best = jnp.argmin(score)
            return (X[best], err[best], jnp.isfinite(err[best]),
                    sel[best], msk[best])

        Xr, er, okr, obr, omr = jax.vmap(per_root)(jnp.arange(K))
        out_pts.append(Xr)
        out_err.append(er)
        out_ok.append(okr & root_mask[rc])
        out_obs.append(obr)
        out_om.append(omr)

    object_points = jnp.concatenate(out_pts)            # (C*K, 3)
    errors = jnp.concatenate(out_err)
    ok = jnp.concatenate(out_ok)
    errors = jnp.where(ok, errors, _INF)
    return _finalize(object_points, errors, ok, dedupe_eps,
                     jnp.concatenate(out_obs) if with_obs else None,
                     jnp.concatenate(out_om) if with_obs else None)


def _match_assoc(pts, valid, Ps, d, gated, root_mask, gate_px,
                 dedupe_eps, with_obs=False):
    """Constant-depth large-rig matcher: seed, associate, re-triangulate.

    Each root seeds a 2-view triangulation with its single best epipolar
    candidate (over ALL other cameras), then converges by two rounds of
    reproject -> nearest-blob association (gated at ``gate_px``) ->
    re-triangulate.  Every stage is one batched op over all C*K roots —
    sequential depth is 3 triangulations regardless of camera count
    (the beam path is sequential in cameras: 5.0 ms vs 650 us at C=16
    on TPU v5e).
    Association may use EARLIER cameras too (geometrically correct for
    unclaimed roots; coincident duplicates die in the dedupe pass).
    """
    C, K, _ = pts.shape
    N = C * K
    cam_ids = jnp.arange(C)

    # seed pair: best gated candidate over all (camera, blob)
    d_flat = jnp.where(gated, d, _INF).reshape(C, K, C * K)
    best = jnp.argmin(d_flat, axis=-1)                       # (C, K)
    has_seed = jnp.isfinite(jnp.min(d_flat, axis=-1))
    b_star = best // K
    j_star = best % K
    seed_obs = pts[b_star, j_star]                           # (C, K, 2)

    own_oh = (cam_ids[:, None, None] == cam_ids[None, None, :])  # (C, 1, C)
    seed_oh = b_star[..., None] == cam_ids[None, None, :]        # (C, K, C)
    sel0 = jnp.where(own_oh[..., None], pts[:, :, None, :], 0.0)
    sel0 = jnp.where(seed_oh[..., None], seed_obs[:, :, None, :], sel0)
    msk0 = (own_oh | (seed_oh & has_seed[..., None])).reshape(N, C)
    own_row = jnp.broadcast_to(own_oh, (C, K, C)).reshape(N, C)
    own_pts = jnp.broadcast_to(pts[:, :, None, :], (C, K, C, 2)
                               ).reshape(N, C, 2)

    X, _ = tri.triangulate_points(sel0.reshape(N, C, 2), Ps, msk0)

    def associate_and_fit(X, _):
        uv = tri.reproject(X, Ps)                            # (N, C, 2)
        diff = uv[:, :, None, :] - pts[None, :, :, :]
        dist2 = jnp.sum(diff * diff, axis=-1)                # (N, C, K)
        dist2 = jnp.where(valid[None], dist2, _INF)
        nearest = jnp.argmin(dist2, axis=-1)                 # (N, C)
        nd2 = jnp.min(dist2, axis=-1)
        hit = nd2 < gate_px * gate_px
        # gather-free blob lookup: one-hot over the K blob slots
        oh = (nearest[..., None] == jnp.arange(K)).astype(pts.dtype)
        # HIGH precision: one-hot selection of PIXEL observations — the
        # 0/1 selectors are exact in bf16 but the pts operand would be
        # truncated to ~1 px at default precision (same defect class as
        # the exact-mode selection einsums above)
        obs = jnp.einsum("nck,ckx->ncx", oh, pts,
                         precision=jax.lax.Precision.HIGH)   # (N, C, 2)
        sel = jnp.where(own_row[..., None], own_pts, obs)
        msk = hit | own_row
        X2, _ = tri.triangulate_points(sel, Ps, msk)
        return X2, (sel, msk)

    X, _ = associate_and_fit(X, None)
    X, (sel, msk) = associate_and_fit(X, None)

    err = tri.reprojection_errors(sel, X, Ps, msk)
    ok = jnp.isfinite(err) & root_mask.reshape(N) & has_seed.reshape(N)
    err = jnp.where(ok, err, _INF)
    return _finalize(X, err, ok, dedupe_eps,
                     *((sel, msk) if with_obs else (None, None)))


def _finalize(object_points, errors, ok, dedupe_eps, obs=None,
              obs_mask=None):
    """Ghost dedupe + output packaging shared by all matcher modes.

    ``obs``/``obs_mask`` (optional, ``with_obs=True``): the winner's
    per-camera 2D observations ((C*K, C, 2), (C*K, C)) — the
    correspondence-resolved measurements a downstream refinement
    (live recalibration BA) needs."""
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
    out = {"object_points": object_points, "errors": errors, "valid": ok}
    if obs is not None:
        obs_mask = obs_mask & ok[:, None]
        out["obs"] = jnp.where(obs_mask[..., None], obs, 0.0)
        out["obs_mask"] = obs_mask
    return out
