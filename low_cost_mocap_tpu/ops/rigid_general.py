"""Generalized rigid-body tracking: arbitrary M-marker templates.

The reference can only locate its hardcoded 3-LED drone triple
(``computer_code/api/helpers.py:424-480``: two distance gates + a side
test).  This module generalizes the capability to ANY rigid marker
constellation — the standard mocap "rigid body" / "prop" feature — with a
TPU-first fixed-shape design:

  1. *anchor enumeration*: candidate point pairs matching the template's
     most discriminative edge are taken with a fixed ``pair_budget``
     (top-k by edge-length deviation, the tensor analogue of the
     reference's distance gate);
  2. a third anchor completes each hypothesis by minimum distance-signature
     deviation;
  3. each anchor triple yields a closed-form absolute-orientation estimate
     (Horn's quaternion method, solved QCP-style: Newton on the quartic
     characteristic polynomial + adjugate null-space eigenvector — pure
     VPU arithmetic, no ``eigh`` custom call);
  4. all template markers are associated to nearest triangulated points,
     distance-inconsistent associations are trimmed, the pose is re-fit on
     every matched marker (weighted Kabsch via the same quaternion solve),
     and the lowest-scoring hypothesis wins.

Everything is batched over hypotheses and jit-compatible: the per-frame
cost is a handful of (budget, M, N) tensor contractions.  Multiple
instances of the same template are extracted greedily
(``locate_bodies``), consuming matched markers like the reference's
consumed-root loop.

Known limitation: when a marker is occluded AND a ghost point lands so
that another marker subset + ghost forms a template-consistent
constellation, the fit can lock onto the wrong interpretation with a low
RMS (measured: 2/64 frames on a 4-marker body in a ghost-prone synthetic
scene).  Raise ``min_markers`` (e.g. to M) or tighten ``edge_tol`` for
ambiguity-critical captures; ``ops/body_tracker.py`` is the principled
fix — its motion gate rejects fits that teleport off the track
prediction, and both the live engine and the offline path run it on top
of these per-frame fits.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BodyTemplate(NamedTuple):
    """Static description of a rigid marker constellation.

    markers: ((x, y, z), ...) — marker positions in the body frame, stored
        as nested tuples so the template is hashable (it is a static jit
        argument; use ``marker_array()`` for the (M, 3) ndarray).
    seeds: ((a, b, c), ...) — anchor triples used for hypothesis seeding
        (chosen by ``make_template``): multiple seed edges (a, b) and
        alternate third anchors c, so that no single occluded marker can
        take every seed down (M >= 4).
    """

    markers: tuple
    seeds: tuple[tuple[int, int, int], ...]

    def marker_array(self) -> np.ndarray:
        return np.asarray(self.markers, np.float32)


def make_template(markers, n_alt_anchors: int = 2) -> BodyTemplate:
    """Build a template; picks the seed triples at trace time (numpy).

    Seed edges: the most-separated marker pair (the most discriminative
    edge), plus — when M >= 4 — the longest edge *disjoint* from it, so
    losing any single marker (occlusion, optical merge) still leaves a
    complete seed edge.  Per edge, up to ``n_alt_anchors`` alternate third
    anchors in decreasing triangle area (best-conditioned seeds; more than
    one so a missing third anchor cannot take the seed down either).
    """
    markers = np.asarray(markers, np.float32)
    M = markers.shape[0]
    if M < 3:
        raise ValueError(f"a rigid body needs >= 3 markers, got {M}")
    D = np.linalg.norm(markers[:, None] - markers[None, :], axis=-1)
    a, b = map(int, np.unravel_index(np.argmax(D), D.shape))
    edges = [(a, b)]
    if M >= 4:
        D2 = D.copy()
        D2[[a, b], :] = -1.0
        D2[:, [a, b]] = -1.0
        a2, b2 = map(int, np.unravel_index(np.argmax(D2), D2.shape))
        if D2[a2, b2] > 0:
            edges.append((a2, b2))

    seeds = []
    for (ea, eb) in edges:
        ab = markers[eb] - markers[ea]
        area = np.linalg.norm(np.cross(ab[None], markers - markers[ea]),
                              axis=-1)
        area[[ea, eb]] = -1.0
        order = np.argsort(-area)
        seeds += [(ea, eb, int(c)) for c in order[:n_alt_anchors]
                  if area[c] > 1e-9]
    if not seeds:
        raise ValueError("template markers are collinear; pose would be "
                         "ambiguous about the axis")
    return BodyTemplate(markers=tuple(map(tuple, markers.tolist())),
                        seeds=tuple(seeds))


class BodyFit(NamedTuple):
    R: jnp.ndarray          # (3, 3) body->world rotation
    t: jnp.ndarray          # (3,) body->world translation
    rms: jnp.ndarray        # () RMS residual over matched markers (m)
    matched: jnp.ndarray    # (M,) bool — template markers with a point
    point_idx: jnp.ndarray  # (M,) int32 — matched point per marker (or -1)
    valid: jnp.ndarray      # () bool


def _largest_eigvec_sym4(K, newton_iters: int = 30):
    """Largest-eigenvalue eigenvector of symmetric (..., 4, 4), QCP-style.

    Iterative eigensolvers (power/inverse iteration) stall on Horn
    matrices from (near-)coplanar marker sets, whose eigengap collapses.
    Instead, as in Theobald's quaternion characteristic polynomial method:
    Newton's iteration on det(K - x I) = x^4 + c2 x^2 + c1 x + c0
    (trace(K) = 0 for Horn matrices; coefficients from trace power sums)
    starting at the Frobenius norm — an upper bound on every eigenvalue,
    from which Newton descends monotonically and quadratically onto the
    largest root — then the eigenvector as the largest column of
    adj(K - x* I), whose columns span the null space.  Exact closed-form
    arithmetic, branch-free, no ``eigh`` custom call (TPU hot-loop safe).
    """
    from low_cost_mocap_tpu.ops.triangulate import _adjugate4

    K2 = jnp.einsum("...ij,...jk->...ik", K, K, precision=jax.lax.Precision.HIGHEST)
    p2 = jnp.trace(K2, axis1=-2, axis2=-1)
    p3 = jnp.einsum("...ij,...ji->...", K2, K, precision=jax.lax.Precision.HIGHEST)
    p4 = jnp.sum(K2 * jnp.swapaxes(K2, -1, -2), axis=(-2, -1))
    # Newton's identities with e1 = trace = 0:
    c2 = -p2 / 2.0                       # e2
    c1 = -p3 / 3.0                       # -e3
    c0 = (p2 * p2 / 2.0 - p4) / 4.0      # e4  (e4 = (-e2 p2 - p4)/4)

    x = jnp.sqrt(jnp.maximum(p2, 0.0))   # Frobenius norm >= lambda_max
    for _ in range(newton_iters):
        f = ((x * x + c2) * x + c1) * x + c0
        df = (4.0 * x * x + 2.0 * c2) * x + c1
        x = x - f / jnp.where(jnp.abs(df) < 1e-20, 1e-20, df)

    M = K - x[..., None, None] * jnp.eye(4, dtype=K.dtype)
    adj = _adjugate4(M)                  # columns span the null space
    norms = jnp.sum(adj * adj, axis=-2)  # (..., 4) column norms
    pick = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(adj, pick[..., None, None], axis=-1)[..., 0]
    # degenerate fallback (eigenvalue multiplicity): any unit vector works
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = jnp.where(n > 1e-20, v / jnp.maximum(n, 1e-30),
                  jnp.concatenate([jnp.ones_like(v[..., :1]),
                                   jnp.zeros_like(v[..., 1:])], axis=-1))
    return v


def _quat_to_rot(q):
    """(..., 4) unit quaternion (w, x, y, z) -> (..., 3, 3) rotation."""
    from low_cost_mocap_tpu.ops.rotations import quat_to_matrix

    return quat_to_matrix(q)


def weighted_absolute_orientation(P, Q, w):
    """Closed-form weighted Kabsch: R, t minimizing sum_i w_i |R p_i + t - q_i|^2.

    P: (..., M, 3) body-frame points; Q: (..., M, 3) world points;
    w: (..., M) non-negative weights.  Horn's quaternion method
    (no SVD/eigh custom calls — TPU hot-loop safe).
    """
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    wn = w / wsum
    pc = jnp.einsum("...m,...mi->...i", wn, P, precision=jax.lax.Precision.HIGHEST)
    qc = jnp.einsum("...m,...mi->...i", wn, Q, precision=jax.lax.Precision.HIGHEST)
    Pc = P - pc[..., None, :]
    Qc = Q - qc[..., None, :]
    S = jnp.einsum("...m,...mi,...mj->...ij", wn, Pc, Qc, precision=jax.lax.Precision.HIGHEST)  # (..., 3, 3)
    s = lambda i, j: S[..., i, j]
    K = jnp.stack([
        jnp.stack([s(0, 0) + s(1, 1) + s(2, 2), s(1, 2) - s(2, 1),
                   s(2, 0) - s(0, 2), s(0, 1) - s(1, 0)], axis=-1),
        jnp.stack([s(1, 2) - s(2, 1), s(0, 0) - s(1, 1) - s(2, 2),
                   s(0, 1) + s(1, 0), s(2, 0) + s(0, 2)], axis=-1),
        jnp.stack([s(2, 0) - s(0, 2), s(0, 1) + s(1, 0),
                   -s(0, 0) + s(1, 1) - s(2, 2), s(1, 2) + s(2, 1)], axis=-1),
        jnp.stack([s(0, 1) - s(1, 0), s(2, 0) + s(0, 2), s(1, 2) + s(2, 1),
                   -s(0, 0) - s(1, 1) + s(2, 2)], axis=-1),
    ], axis=-2)
    q = _largest_eigvec_sym4(K)
    R = _quat_to_rot(q)
    t = qc - jnp.einsum("...ij,...j->...i", R, pc, precision=jax.lax.Precision.HIGHEST)
    return R, t


@functools.partial(jax.jit, static_argnames=(
    "template", "pair_budget", "refine_iters", "seed_weight"))
def fit_body(points, valid, template: BodyTemplate, *,
             edge_tol: float = 0.02, assoc_tol: float = 0.03,
             pair_budget: int = 8, refine_iters: int = 2,
             min_markers: int = 3, seed_R=None, seed_t=None,
             seed_ok=None, seed_weight: float = 1e-4) -> BodyFit:
    """Fit ONE instance of ``template`` to triangulated points.

    points: (N, 3) world points; valid: (N,) bool.  Static-shape hypothesis
    search (see module docstring).  ``edge_tol`` gates anchor edges (m);
    ``assoc_tol`` gates marker-to-point association (m); a fit is valid
    when >= ``min_markers`` markers matched.

    ``seed_R``/``seed_t``/``seed_ok`` ((S, 3, 3), (S, 3), (S,)): optional
    predicted poses (e.g. the body tracker's constant-velocity
    predictions) injected as extra hypotheses — the joint temporal fit.
    They enter at the associate-refit stage, so a body whose anchor edges
    are occluded this frame can still be fit from its track, and
    ``seed_weight`` adds a gentle distance-to-prediction tie-break
    (score += seed_weight * min_s |t_hyp - seed_t_s|^2, applied only when
    any seed is valid) that resolves the geometrically-consistent-but-
    wrong interpretations a single frame cannot (module docstring's known
    limitation).  The default weight is small enough that a genuinely
    better fit (>~5 mm RMS difference) always beats track proximity.
    """
    tmpl = jnp.asarray(template.markers)            # (M, 3)
    M = tmpl.shape[0]
    N = points.shape[0]
    Dt = jnp.linalg.norm(tmpl[:, None] - tmpl[None, :], axis=-1)

    diff = points[:, None, :] - points[None, :, :]
    D = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))  # (N, N)
    vv = valid[:, None] & valid[None, :]
    off_diag = ~jnp.eye(N, dtype=bool)

    # 1+2. per seed triple (a, b, c): candidate (i, j) pairs closest to the
    #    (a, b) edge length (ordered pairs, so both orientations are
    #    hypotheses), each completed by the minimum-distance-signature
    #    third point
    pair_cache: dict = {}   # edge -> (pi, pj, pair_ok, k_bad)
    pi_l, pj_l, pk_l, ok_l, P3_l = [], [], [], [], []
    for (a, b, c) in template.seeds:
        if (a, b) not in pair_cache:
            pair_dev = jnp.where(vv & off_diag, jnp.abs(D - Dt[a, b]),
                                 jnp.inf)
            neg_dev, flat_idx = jax.lax.top_k(-pair_dev.reshape(-1),
                                              pair_budget)
            pi = flat_idx // N                       # (Bp,)
            pj = flat_idx % N
            k_bad = (~valid[None, :]) \
                | (jnp.arange(N)[None] == pi[:, None]) \
                | (jnp.arange(N)[None] == pj[:, None])
            pair_cache[(a, b)] = (pi, pj, (-neg_dev) < edge_tol, k_bad)
        pi, pj, pair_ok, k_bad = pair_cache[(a, b)]
        k_dev = jnp.abs(D[pi] - Dt[a, c]) + jnp.abs(D[pj] - Dt[b, c])
        k_dev = jnp.where(k_bad, jnp.inf, k_dev)     # (Bp, N)
        pk = jnp.argmin(k_dev, axis=-1)              # (Bp,)
        k_ok = jnp.take_along_axis(
            k_dev, pk[:, None], axis=-1)[:, 0] < 2.0 * edge_tol
        pi_l.append(pi)
        pj_l.append(pj)
        pk_l.append(pk)
        ok_l.append(pair_ok & k_ok)
        P3_l.append(jnp.broadcast_to(tmpl[jnp.asarray([a, b, c])],
                                     (pair_budget, 3, 3)))
    pi = jnp.concatenate(pi_l)                       # (B,) B = Bp * n_seeds
    pj = jnp.concatenate(pj_l)
    pk = jnp.concatenate(pk_l)
    hyp_ok = jnp.concatenate(ok_l)
    P3 = jnp.concatenate(P3_l)                       # (B, 3, 3)
    B = pair_budget * len(template.seeds)

    # 3. seed pose from each anchor triple (batched quaternion Kabsch)
    Q3 = points[jnp.stack([pi, pj, pk], axis=-1)]    # (B, 3, 3)
    R, t = weighted_absolute_orientation(P3, Q3, jnp.ones((B, 3), tmpl.dtype))

    # 3b. track-prediction hypotheses (joint temporal fit): enter directly
    # at the associate-refit stage, bypassing anchor enumeration
    if seed_t is not None:
        seed_R = jnp.asarray(seed_R, tmpl.dtype)
        seed_t = jnp.asarray(seed_t, tmpl.dtype)
        if seed_ok is None:
            seed_ok = jnp.ones(seed_t.shape[0], bool)
        R = jnp.concatenate([R, seed_R])
        t = jnp.concatenate([t, seed_t])
        hyp_ok = jnp.concatenate([hyp_ok, seed_ok])
        B = B + seed_t.shape[0]

    # 4. associate every template marker, trim, re-fit, iterate
    def assoc_and_fit(R, t):
        Y = jnp.einsum("bij,mj->bmi", R, tmpl, precision=jax.lax.Precision.HIGHEST) + t[:, None, :]  # (B, M, 3)
        d2 = jnp.sum((Y[:, :, None, :] - points[None, None, :, :]) ** 2,
                     axis=-1)                                   # (B, M, N)
        d2 = jnp.where(valid[None, None, :], d2, jnp.inf)
        nearest = jnp.argmin(d2, axis=-1)                       # (B, M)
        nd2 = jnp.min(d2, axis=-1)
        matched = nd2 < assoc_tol * assoc_tol                   # (B, M)
        Q = points[nearest]                                     # (B, M, 3)

        # distance-consistency trim: a wrong association (e.g. a missing
        # ANCHOR marker pulled a neighbour's point into the seed) passes
        # the nearest gate but disagrees with the template's pairwise
        # distances.  Drop the single worst-mean-deviation marker; the
        # next associate pass re-homes the freed point correctly.
        Dp = jnp.linalg.norm(Q[:, :, None, :] - Q[:, None, :, :] + 1e-12,
                             axis=-1)                           # (B, M, M)
        both = matched[:, :, None] & matched[:, None, :] \
            & ~jnp.eye(M, dtype=bool)
        dev = jnp.where(both, jnp.abs(Dp - Dt), 0.0)
        n_part = jnp.maximum(jnp.sum(both, axis=-1), 1)
        mean_dev = jnp.sum(dev, axis=-1) / n_part               # (B, M)
        max_dev = jnp.max(dev, axis=-1)
        worst = jnp.max(jnp.where(matched, mean_dev, -1.0), axis=-1,
                        keepdims=True)
        drop = matched & (mean_dev >= worst) & (max_dev > edge_tol)
        matched = matched & ~drop

        w = matched.astype(tmpl.dtype)
        # guard: <3 matches make the solve degenerate; fall back to anchors
        enough = jnp.sum(matched, axis=-1) >= 3
        R2, t2 = weighted_absolute_orientation(
            jnp.broadcast_to(tmpl, (B, M, 3)), Q, w + 1e-9)
        R2 = jnp.where(enough[:, None, None], R2, R)
        t2 = jnp.where(enough[:, None], t2, t)
        return R2, t2, matched, nearest, Q

    for _ in range(max(refine_iters, 1)):
        R, t, matched, nearest, Q = assoc_and_fit(R, t)

    # 5. score: RMS over matched markers + penalty per unmatched marker
    Y = jnp.einsum("bij,mj->bmi", R, tmpl, precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
    res2 = jnp.sum((Y - Q) ** 2, axis=-1)            # (B, M)
    w = matched.astype(res2.dtype)
    n_match = jnp.sum(w, axis=-1)
    mse = jnp.sum(res2 * w, axis=-1) / jnp.maximum(n_match, 1.0)
    n_miss = M - n_match
    score = (jnp.sum(res2 * w, axis=-1) + n_miss * assoc_tol ** 2) \
        / jnp.maximum(n_match + n_miss, 1.0)
    if seed_t is not None and seed_weight > 0:
        # gentle proximity-to-prediction tie-break (active only when a
        # track prediction exists): distinguishes between near-equal-RMS
        # interpretations without ever overruling a clearly better fit
        d2s = jnp.sum((t[:, None, :] - seed_t[None, :, :]) ** 2, axis=-1)
        d2s = jnp.where(seed_ok[None, :], d2s, jnp.inf)
        d2min = jnp.min(d2s, axis=-1)
        score = score + jnp.where(jnp.isfinite(d2min),
                                  seed_weight * d2min, 0.0)
    score = jnp.where(hyp_ok & (n_match >= min_markers), score, jnp.inf)

    best = jnp.argmin(score)
    ok = jnp.isfinite(score[best])
    return BodyFit(
        R=jnp.where(ok, R[best], jnp.eye(3, dtype=tmpl.dtype)),
        t=jnp.where(ok, t[best], 0.0),
        rms=jnp.where(ok, jnp.sqrt(mse[best]), jnp.inf),
        matched=matched[best] & ok,
        point_idx=jnp.where(matched[best] & ok, nearest[best], -1)
            .astype(jnp.int32),
        valid=ok,
    )


class LocatedBodies(NamedTuple):
    R: jnp.ndarray          # (I, 3, 3)
    t: jnp.ndarray          # (I, 3)
    rms: jnp.ndarray        # (I,)
    valid: jnp.ndarray      # (I,)


@functools.partial(jax.jit, static_argnames=(
    "template", "max_instances", "pair_budget", "refine_iters",
    "return_live", "seed_weight"))
def locate_bodies(points, valid, template: BodyTemplate, *,
                  max_instances: int = 2, edge_tol: float = 0.02,
                  assoc_tol: float = 0.03, pair_budget: int = 8,
                  refine_iters: int = 2, min_markers: int = 3,
                  return_live: bool = False, seed_R=None, seed_t=None,
                  seed_ok=None, seed_weight: float = 1e-4):
    """Greedily extract up to ``max_instances`` bodies of one template.

    Each accepted fit consumes its matched points (the tensor analogue of
    the reference's consumed-root greedy loop, ``helpers.py:436-438``).

    ``return_live=True`` additionally returns the (N,) mask of points NOT
    consumed by any accepted fit — the multi-template path chains each
    template over the previous one's leftovers.

    ``seed_R``/``seed_t``/``seed_ok``: track-prediction hypotheses handed
    to every instance's ``fit_body`` (already-extracted instances'
    predictions are harmless — their points are consumed).
    """
    N = points.shape[0]

    def body(live, _):
        fit = fit_body(points, live, template, edge_tol=edge_tol,
                       assoc_tol=assoc_tol, pair_budget=pair_budget,
                       refine_iters=refine_iters, min_markers=min_markers,
                       seed_R=seed_R, seed_t=seed_t, seed_ok=seed_ok,
                       seed_weight=seed_weight)
        # unmatched markers carry point_idx == -1, which jnp scatters WRAP
        # to N-1 rather than drop — route them to index N so mode="drop"
        # actually discards them (a wrapped False write raced the real
        # slot-(N-1) marker's True and could leave it unconsumed)
        idx = jnp.where(fit.matched, fit.point_idx, N)
        used = jnp.zeros((N,), bool).at[idx].set(True, mode="drop")
        live2 = live & ~(used & fit.valid)
        return live2, (fit.R, fit.t, fit.rms, fit.valid)

    live, (Rs, ts, rms, ok) = jax.lax.scan(
        body, valid, None, length=max_instances)
    out = LocatedBodies(R=Rs, t=ts, rms=rms, valid=ok)
    return (out, live) if return_live else out


def learn_template(points_seq, valid_seq, *, edge_tol: float = 0.02,
                   assoc_tol: float = 0.03, refine_rounds: int = 2,
                   min_frames: int = 3) -> BodyTemplate:
    """Learn a rigid-body template from a capture of the body moving.

    The standard mocap "create rigid body from selection" workflow: record
    a short sequence where ONE body (and possibly clutter/ghosts) is
    visible, and derive the marker constellation automatically instead of
    hand-measuring it.  points_seq: (T, N, 3) triangulated world points
    (e.g. ``SequenceResult.object_points``); valid_seq: (T, N).

    Method: the frame with the most valid points seeds a template (its
    points, centroid-centered, principal-axes-aligned for determinism);
    every frame is then 6-DoF-fit against it (``fit_body``, vmapped over
    time) and each matched marker's body-frame coordinate
    R^T (p - t) is averaged across frames — ghosts and occlusions drop
    out through the fit's own gating.  Two rounds converge.  Markers never
    visible in the seed frame cannot be discovered: capture a segment
    where the whole constellation is seen at least once.

    Returns the learned template; raises if fewer than ``min_frames``
    frames fit the evolving template (e.g. the "body" was not rigid).
    """
    pts = np.asarray(points_seq, np.float32)
    vld = np.asarray(valid_seq, bool)
    T = pts.shape[0]

    # ---- seed: most-visible frame, canonicalized for determinism
    t0 = int(np.argmax(vld.sum(axis=1)))
    seed = pts[t0][vld[t0]]
    if seed.shape[0] < 3:
        raise ValueError("no frame with >= 3 valid points to seed from")
    seed = seed - seed.mean(axis=0)
    cov = seed.T @ seed
    _, eigvecs = np.linalg.eigh(cov)
    axes = eigvecs[:, ::-1]                  # principal axes, major first
    if np.linalg.det(axes) < 0:
        axes[:, 2] = -axes[:, 2]
    seed = seed @ axes
    tmpl = make_template(seed)

    counts = None
    for _ in range(max(refine_rounds, 1)):
        fits = jax.vmap(lambda p, v: fit_body(
            p, v, tmpl, edge_tol=edge_tol, assoc_tol=assoc_tol))(
                jnp.asarray(pts), jnp.asarray(vld))
        ok = np.asarray(fits.valid)
        if ok.sum() < min_frames:
            raise ValueError(
                f"only {int(ok.sum())}/{T} frames fit the template — "
                "is the capture a single rigid body?")
        R = np.asarray(fits.R)[ok]           # (F, 3, 3)
        tr = np.asarray(fits.t)[ok]
        matched = np.asarray(fits.matched)[ok]          # (F, M)
        pidx = np.asarray(fits.point_idx)[ok]           # (F, M)
        frame_pts = pts[ok]                              # (F, N, 3)
        M = matched.shape[1]
        acc = np.zeros((M, 3), np.float64)
        counts = np.zeros((M,), np.int64)
        for f in range(matched.shape[0]):
            for m in range(M):
                if matched[f, m]:
                    body_p = R[f].T @ (frame_pts[f, pidx[f, m]] - tr[f])
                    acc[m] += body_p
                    counts[m] += 1
        keep = counts >= min_frames
        if keep.sum() < 3:
            raise ValueError("fewer than 3 markers observed consistently")
        markers = (acc[keep] / counts[keep, None]).astype(np.float32)
        tmpl = make_template(markers)
    return tmpl
