"""Mesh-distributed bundle adjustment: point-sharded normal equations.

The reference's BA residual loop re-evaluates triangulation + reprojection
over ALL captured frames on one CPU inside scipy's trust region
(``computer_code/api/helpers.py:264-289``) — its biggest compute sink
(SURVEY.md §3.2).  Here the residual/Jacobian work distributes over the
mesh's ``point`` axis:

- each device holds a shard of the captured image points;
- per LM iteration every device computes its local residuals r_i, Jacobian
  block J_i (forward-mode, parameter dim is tiny), and the local Gauss
  normal contributions H_i = J_iᵀW J_i and g_i = J_iᵀW r_i — pure MXU work;
- ONE ``psum`` over the ``point`` axis reduces (H, g, cost) — the only
  communication per iteration: O(P²) bytes, independent of point count;
- the (tiny) damped solve runs replicated on every device; accept/reject
  LM damping proceeds in lockstep.

This is the Schur-complement structure specialised to the reference's
parameterisation: the reference re-triangulates points from camera params
every evaluation (points are NOT free variables, ``helpers.py:271``), which
means the point blocks are *implicitly* eliminated — the camera system that
remains is exactly what we ``psum``.  The whole solver compiles to one SPMD
XLA program via ``shard_map``; scaling to multi-host pods changes nothing
but the mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from low_cost_mocap_tpu.ops import ba as ba_ops


def _lm_sharded(pts, mask, K_stack, p0, *, num_cameras: int, max_iters: int,
                ftol: float, cauchy_c: float, mode: str, axis: str):
    """LM loop body executed per-device on a point shard (inside shard_map)."""
    nparam = p0.shape[0]

    def res_fn(p):
        return ba_ops.residuals(p, pts, mask, K_stack, num_cameras, mode)

    def robust_cost_local(r):
        return 0.5 * cauchy_c**2 * jnp.sum(jnp.log1p((r / cauchy_c) ** 2))

    def global_cost(p):
        return jax.lax.psum(robust_cost_local(res_fn(p)), axis)

    def step(carry, _):
        p, lam, cost, done = carry
        r = res_fn(p)
        J = jax.jacfwd(res_fn)(p)
        w = 1.0 / (1.0 + (r / cauchy_c) ** 2)
        Jw = J * w[:, None]
        H_local = Jw.T @ J
        g_local = Jw.T @ r
        # the ONE collective per iteration
        H = jax.lax.psum(H_local, axis)
        g = jax.lax.psum(g_local, axis)

        I = jnp.eye(nparam, dtype=p.dtype)
        delta = jnp.linalg.solve(H + lam * I, -g)
        p1 = p + delta
        c1 = global_cost(p1)

        accept = c1 < cost
        new_p = jnp.where(accept, p1, p)
        new_lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-10), lam * 4.0)
        new_cost = jnp.where(accept, c1, cost)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-12)
        new_done = done | (accept & (rel < ftol * 1e-2))
        new_p = jnp.where(done, p, new_p)
        new_cost = jnp.where(done, cost, new_cost)
        return (new_p, new_lam, new_cost, new_done), accept & ~done

    c0 = global_cost(p0)
    (p, _, cost, _), accepts = jax.lax.scan(
        step, (p0, jnp.asarray(1e-3, p0.dtype), c0, jnp.asarray(False)),
        None, length=max_iters)
    return p, cost, jnp.sum(accepts)


@functools.lru_cache(maxsize=32)
def _compiled_dist(mesh: Mesh, axis: str, num_cameras: int, max_iters: int,
                   ftol: float, cauchy_c: float, mode: str):
    """Cache the jitted shard_mapped solver per (mesh, config) — see
    ``schur_ba._compiled_schur`` for why (inline jit retraces per call)."""
    fn = functools.partial(
        _lm_sharded, num_cameras=num_cameras, max_iters=max_iters,
        ftol=ftol, cauchy_c=cauchy_c, mode=mode, axis=axis)
    return jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ))


def dist_bundle_adjust(mesh: Mesh, pts, mask, K_stack, Rs0, ts0, *,
                       axis: str = "point", max_iters: int = 64,
                       ftol: float = 1e-2, cauchy_c: float = 1.0,
                       mode: str = "pixel") -> ba_ops.BAResult:
    """Distributed BA over a device mesh.

    pts: (N, C, 2) with N divisible by the mesh ``axis`` size; mask: (N, C).
    Returns the same ``BAResult`` as the single-device solver.
    """
    num_cameras = pts.shape[1]
    p0 = ba_ops.pack_params(Rs0, ts0, K_stack[:, 0, 0])

    sharded = _compiled_dist(mesh, axis, num_cameras, max_iters, ftol,
                             cauchy_c, mode)
    pts_s = jax.device_put(pts, NamedSharding(mesh, P(axis)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P(axis)))
    p, cost, iters = sharded(pts_s, mask_s, K_stack, p0)
    Rs, ts, focals = ba_ops.unpack_params(p, num_cameras)
    return ba_ops.BAResult(Rs, ts, focals, cost, iters)
