"""Bundle adjustment: robust Levenberg–Marquardt, written out explicitly.

Replaces the reference's ``scipy.optimize.least_squares(residual,
loss="cauchy", ftol=1e-2)`` black box (``computer_code/api/helpers.py:287-289``)
with an explicit, jittable LM solver whose normal equations are formed on
the MXU.

Parameterisation (identical to ``computer_code/api/helpers.py:247-262``):
camera 0 is gauge-fixed at identity; the parameter vector is
``[f_0, (f_i, rotvec_i(3), t_i(3)) for i = 1..C-1]`` — focal length per
camera (fx == fy), rotation vector, translation.

Residual (identical to ``computer_code/api/helpers.py:264-276``): points are
*re-triangulated* from the current poses every evaluation (they are not free
variables), then each point contributes its mean squared pixel error.  Two
residual modes:

- ``mode="reference"`` — one residual per point = its mean squared pixel
  error, exactly the reference's vector (quirky units, kept for parity);
- ``mode="pixel"`` (default) — one residual per observed pixel coordinate,
  the statistically sound choice and better conditioned.

Robustness: Cauchy loss via IRLS weights w = 1/(1 + r²/c²) folded into the
normal equations.  The LM loop is a fixed-length ``lax.scan`` with
accept/reject damping — fully static shapes, no host round-trips, so the
whole solve is ONE XLA program.

The mesh-distributed Schur-complement variant for free-point BA lives in
``parallel/dist_ba.py``; this module is the single-chip path that matches
the reference's behaviour.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.ops import rotations as rot
from low_cost_mocap_tpu.ops import triangulate as tri
from low_cost_mocap_tpu.ops.camera import projection_matrix


class BAResult(NamedTuple):
    Rs: jnp.ndarray          # (C, 3, 3)
    ts: jnp.ndarray          # (C, 3)
    focals: jnp.ndarray      # (C,)
    cost: jnp.ndarray        # final robust cost
    n_iters: jnp.ndarray     # accepted iterations


def pack_params(Rs, ts, focals):
    """Poses -> parameter vector (reference layout, helpers.py:278-285)."""
    rvecs = rot.matrix_to_rotvec(Rs[1:])
    parts = [focals[:1]]
    for i in range(Rs.shape[0] - 1):
        parts.append(focals[i + 1 : i + 2])
        parts.append(rvecs[i])
        parts.append(ts[i + 1])
    return jnp.concatenate(parts)


def unpack_params(params, num_cameras: int):
    """Parameter vector -> (Rs, ts, focals) (reference helpers.py:247-262)."""
    focals = [params[0]]
    Rs = [jnp.eye(3, dtype=params.dtype)]
    ts = [jnp.zeros(3, dtype=params.dtype)]
    for i in range(num_cameras - 1):
        base = 1 + i * 7
        focals.append(params[base])
        Rs.append(rot.rotvec_to_matrix(params[base + 1 : base + 4]))
        ts.append(params[base + 4 : base + 7])
    return jnp.stack(Rs), jnp.stack(ts), jnp.stack(focals)


def _apply_focals(K_stack, focals):
    """Override fx, fy with per-camera focal (helpers.py:266-269)."""
    K = K_stack
    K = K.at[:, 0, 0].set(focals)
    K = K.at[:, 1, 1].set(focals)
    return K


def residuals(params, pts, mask, K_stack, num_cameras: int, mode: str):
    """BA residual vector.

    pts: (N, C, 2) image points; mask: (N, C) visibility.
    """
    Rs, ts, focals = unpack_params(params, num_cameras)
    K = _apply_focals(K_stack, focals)
    Ps = projection_matrix(K, Rs, ts)
    X, _ = tri.triangulate_points(pts, Ps, mask)
    if mode == "reference":
        err = tri.reprojection_errors(pts, X, Ps, mask)  # (N,) mean sq px
        n_vis = jnp.sum(mask, axis=-1)
        return jnp.where(n_vis >= 2, err, 0.0)
    # pixel mode: individual residual components, masked to 0
    uv = tri.reproject(X, Ps)                            # (N, C, 2)
    r = (uv - pts) * mask[..., None]
    n_vis = jnp.sum(mask, axis=-1)
    r = jnp.where((n_vis >= 2)[:, None, None], r, 0.0)
    return r.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("num_cameras", "max_iters", "mode", "freeze_focals"))
def bundle_adjust(pts, mask, K_stack, Rs0, ts0, *, num_cameras: int,
                  max_iters: int = 64, ftol: float = 1e-2,
                  cauchy_c: float = 1.0, mode: str = "pixel",
                  freeze_focals: bool = False) -> BAResult:
    """Robust LM bundle adjustment from an initial pose chain.

    One compiled XLA program: jacfwd over the (small) parameter vector gives
    a tall J; JᵀWJ/JᵀWr are MXU matmuls; a fixed-length accept/reject LM
    scan replaces scipy's trust-region loop (helpers.py:287-289).

    ``freeze_focals``: keep per-camera focal lengths pinned at K_stack's
    values (extrinsics-only refinement — used by live recalibration, where
    applying refined extrinsics against the ORIGINAL intrinsics would
    otherwise be inconsistent).
    """
    focals0 = K_stack[:, 0, 0]
    p0 = pack_params(Rs0, ts0, focals0)
    nparam = p0.shape[0]
    free_mask = jnp.ones((nparam,), p0.dtype)
    if freeze_focals:
        focal_pos = [0] + [1 + i * 7 for i in range(num_cameras - 1)]
        free_mask = free_mask.at[jnp.asarray(focal_pos)].set(0.0)

    res_fn = lambda p: residuals(p, pts, mask, K_stack, num_cameras, mode)

    def robust_cost(r):
        # Cauchy: sum c²/2 · log(1 + (r/c)²)  (scipy loss="cauchy")
        return 0.5 * cauchy_c**2 * jnp.sum(jnp.log1p((r / cauchy_c) ** 2))

    def step(carry, _):
        p, lam, cost, done = carry
        r = res_fn(p)
        J = jax.jacfwd(res_fn)(p)                        # (M, P)
        w = 1.0 / (1.0 + (r / cauchy_c) ** 2)            # IRLS cauchy weights
        Jw = J * w[:, None]
        H = Jw.T @ J                                     # (P, P) MXU
        g = Jw.T @ r
        if freeze_focals:
            # constrain BEFORE the solve: zero frozen rows/cols of H (unit
            # diagonal) and frozen gradient entries, so the free-parameter
            # delta is the true constrained Newton step — masking only the
            # solved delta would let focal coupling contaminate the
            # extrinsic step and stall LM exactly when focals disagree
            # with the observations
            H = H * (free_mask[:, None] * free_mask[None, :]) \
                + jnp.diag(1.0 - free_mask)
            g = g * free_mask
        I = jnp.eye(nparam, dtype=p.dtype)

        def try_lambda(lam):
            delta = jnp.linalg.solve(H + lam * I, -g) * free_mask
            new_p = p + delta
            new_cost = robust_cost(res_fn(new_p))
            return new_p, new_cost

        p1, c1 = try_lambda(lam)
        accept = c1 < cost
        new_p = jnp.where(accept, p1, p)
        new_lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-10), lam * 4.0)
        new_cost = jnp.where(accept, c1, cost)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-12)
        new_done = done | (accept & (rel < ftol * 1e-2))
        # freeze once converged (keeps the scan static-length but cheap-ish)
        new_p = jnp.where(done, p, new_p)
        new_cost = jnp.where(done, cost, new_cost)
        return (new_p, new_lam, new_cost, new_done), accept & ~done

    r0 = res_fn(p0)
    c0 = robust_cost(r0)
    (p, _, cost, _), accepts = jax.lax.scan(
        step, (p0, jnp.asarray(1e-3, p0.dtype), c0, jnp.asarray(False)),
        None, length=max_iters)
    Rs, ts, focals = unpack_params(p, num_cameras)
    return BAResult(Rs, ts, focals, cost, jnp.sum(accepts))
