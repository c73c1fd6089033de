"""Free-point bundle adjustment with distributed Schur complement.

``ops/ba.py`` reproduces the reference's formulation (points re-triangulated
from camera parameters every evaluation, ``computer_code/api/helpers.py:271``).
This module is the *scalable* formulation the TPU build adds on top
(SURVEY.md §2.4): 3D points are free variables, and the classic sparse BA
structure is exploited explicitly:

- per-point landmark blocks Hpp are 3x3 and block-diagonal -> inverted in
  closed form, locally, on the device that owns the point shard;
- the camera system is reduced by the Schur complement
  S = Hcc - Hcp Hpp^-1 Hpc, accumulated with ONE ``psum`` over the
  ``point`` mesh axis per LM iteration (S is tiny: (1+7(C-1))^2);
- the reduced solve runs replicated; point updates
  dX_i = -Hpp_i^-1 (gp_i + Hcp_i^T dc) happen locally with zero further
  communication.

Per-iteration comms cost is O(P^2) bytes independent of point count — the
solver scales to arbitrarily many landmarks by adding devices to the
``point`` axis.  Jacobians come from forward-mode AD of the per-point
residual (vmapped), and every contraction is an MXU matmul.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from low_cost_mocap_tpu.ops import ba as ba_ops
from low_cost_mocap_tpu.ops import triangulate as tri
from low_cost_mocap_tpu.ops.camera import projection_matrix


class SchurBAResult(NamedTuple):
    Rs: jnp.ndarray
    ts: jnp.ndarray
    focals: jnp.ndarray
    points: jnp.ndarray     # (N, 3) refined landmarks
    cost: jnp.ndarray
    n_iters: jnp.ndarray


def _point_residual(cam_p, X_i, obs_i, mask_i, K_stack, num_cameras):
    """Masked pixel residual of ONE landmark: (2C,)."""
    Rs, ts, focals = ba_ops.unpack_params(cam_p, num_cameras)
    K = ba_ops._apply_focals(K_stack, focals)
    Ps = projection_matrix(K, Rs, ts)          # (C, 3, 4)
    Xh = jnp.concatenate([X_i, jnp.ones((1,), X_i.dtype)])
    proj = jnp.einsum("cij,j->ci", Ps, Xh)
    z = proj[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uv = proj[:, :2] / z_safe[:, None]
    r = (uv - obs_i) * mask_i[:, None]
    return r.reshape(-1)


def _lm_schur(pts_obs, mask, K_stack, p0, X0, *, num_cameras, max_iters,
              ftol, cauchy_c, axis):
    nparam = p0.shape[0]
    res_one = functools.partial(_point_residual, K_stack=K_stack,
                                num_cameras=num_cameras)

    def local_cost(cam_p, X):
        r = jax.vmap(lambda x, o, m: res_one(cam_p, x, o, m))(X, pts_obs, mask)
        return 0.5 * cauchy_c**2 * jnp.sum(jnp.log1p((r / cauchy_c) ** 2))

    def global_cost(cam_p, X):
        return jax.lax.psum(local_cost(cam_p, X), axis)

    def step(carry, _):
        cam_p, X, lam, cost, done = carry

        def blocks_one(X_i, obs_i, mask_i):
            r = res_one(cam_p, X_i, obs_i, mask_i)
            Jc = jax.jacfwd(lambda p: res_one(p, X_i, obs_i, mask_i))(cam_p)
            Jp = jax.jacfwd(lambda x: res_one(cam_p, x, obs_i, mask_i))(X_i)
            w = 1.0 / (1.0 + (r / cauchy_c) ** 2)
            Jcw = Jc * w[:, None]
            Jpw = Jp * w[:, None]
            Hcc_i = Jcw.T @ Jc                     # (P, P)
            Hpp_i = Jpw.T @ Jp                     # (3, 3)
            Hcp_i = Jcw.T @ Jp                     # (P, 3)
            gc_i = Jcw.T @ r
            gp_i = Jpw.T @ r
            return Hcc_i, Hpp_i, Hcp_i, gc_i, gp_i

        Hcc, Hpp, Hcp, gc, gp = jax.vmap(blocks_one)(X, pts_obs, mask)

        # damp + invert the 3x3 landmark blocks in closed form (locally)
        lamI3 = lam * jnp.eye(3, dtype=X.dtype)
        Hpp_inv = jnp.linalg.inv(Hpp + lamI3[None])      # (n, 3, 3)

        # local Schur contributions, then the ONE collective
        S_loc = jnp.sum(Hcc, axis=0) - jnp.einsum(
            "nij,njk,nlk->il", Hcp, Hpp_inv, Hcp)
        rhs_loc = jnp.sum(gc, axis=0) - jnp.einsum(
            "nij,njk,nk->i", Hcp, Hpp_inv, gp)
        S = jax.lax.psum(S_loc, axis)
        rhs = jax.lax.psum(rhs_loc, axis)

        I = jnp.eye(nparam, dtype=cam_p.dtype)
        dc = jnp.linalg.solve(S + lam * I, -rhs)
        # back-substitute landmark updates locally:
        # dX_i = -Hpp_i^-1 (gp_i + Hcp_i^T dc)
        dX = -jnp.einsum("nij,nj->ni", Hpp_inv,
                         gp + jnp.einsum("nij,i->nj", Hcp, dc))

        cam_p1 = cam_p + dc
        X1 = X + dX
        c1 = global_cost(cam_p1, X1)
        accept = c1 < cost
        new_cam = jnp.where(accept, cam_p1, cam_p)
        new_X = jnp.where(accept, X1, X)
        new_lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-10), lam * 4.0)
        new_cost = jnp.where(accept, c1, cost)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-12)
        new_done = done | (accept & (rel < ftol * 1e-2))
        new_cam = jnp.where(done, cam_p, new_cam)
        new_X = jnp.where(done, X, new_X)
        new_cost = jnp.where(done, cost, new_cost)
        return (new_cam, new_X, new_lam, new_cost, new_done), accept & ~done

    c0 = global_cost(p0, X0)
    (cam_p, X, _, cost, _), accepts = jax.lax.scan(
        step, (p0, X0, jnp.asarray(1e-3, p0.dtype), c0, jnp.asarray(False)),
        None, length=max_iters)
    return cam_p, X, cost, jnp.sum(accepts)


@functools.lru_cache(maxsize=32)
def _compiled_schur(mesh: Mesh, axis: str, num_cameras: int, max_iters: int,
                    ftol: float, cauchy_c: float):
    """Cache the jitted shard_mapped solver per (mesh, config).

    Rebuilding jit(shard_map(...)) inline made every call retrace and
    recompile — 0.5 s/call on the tunneled TPU even for tiny problems; the
    jit executable cache only helps when the callable object is reused.
    """
    fn = functools.partial(_lm_schur, num_cameras=num_cameras,
                           max_iters=max_iters, ftol=ftol,
                           cauchy_c=cauchy_c, axis=axis)
    return jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(axis)),
        out_specs=(P(), P(axis), P(), P()),
        check_vma=False))


def schur_bundle_adjust(mesh: Mesh, pts, mask, K_stack, Rs0, ts0, *,
                        axis: str = "point", max_iters: int = 64,
                        ftol: float = 1e-2, cauchy_c: float = 1.0
                        ) -> SchurBAResult:
    """Distributed free-point BA.

    pts: (N, C, 2), N divisible by the ``axis`` size; mask: (N, C).
    Landmarks initialise from DLT triangulation under the initial poses
    (the reference's implicit initialisation, helpers.py:271).
    """
    num_cameras = pts.shape[1]
    p0 = ba_ops.pack_params(Rs0, ts0, K_stack[:, 0, 0])
    Ps0 = projection_matrix(K_stack, Rs0, ts0)
    X0, _ = tri.triangulate_points(pts, Ps0, mask)

    sharded = _compiled_schur(mesh, axis, num_cameras, max_iters, ftol,
                              cauchy_c)
    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    cam_p, X, cost, iters = sharded(
        put(pts, P(axis)), put(mask, P(axis)), K_stack, p0, put(X0, P(axis)))
    Rs, ts, focals = ba_ops.unpack_params(cam_p, num_cameras)
    return SchurBAResult(Rs, ts, focals, X, cost, iters)
