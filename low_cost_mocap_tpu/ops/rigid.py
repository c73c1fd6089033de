"""Rigid-body ("drone") locator: marker-triple fit on triangulated points.

Replaces ``locate_objects`` (``computer_code/api/helpers.py:424-480``).

Reference semantics (kept exactly):
  - pairwise distance matrix over candidate points (``helpers.py:432-434``);
  - a drone is a point i with >= 2 neighbours at ``dist1`` (0.095 m ± 0.025)
    whose neighbour pair sits ``dist2`` (0.15 m ± 0.025) apart
    (``helpers.py:440-448``);
  - greedy over i in index order, skipping already-consumed roots
    (``helpers.py:436-438``); the first qualifying (j, k) pair in cartesian
    order wins (``helpers.py:444-478``);
  - position = midpoint of the arm pair; heading = atan2 of the arm vector
    wrapped to [-pi/2, pi/2] and negated (``helpers.py:458-466``);
  - drone index = which side of the arm axis the third LED sits
    (``helpers.py:469``).

TPU-first: the nested Python loops become one (N, N, N) boolean candidate
tensor + a ``lax.fori_loop`` over roots carrying the consumed mask — fixed
shapes, one XLA program, vmappable over batches of frames for offline runs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LocatedObjects(NamedTuple):
    pos: jnp.ndarray       # (N, 3) drone positions (midpoint of arm pair)
    heading: jnp.ndarray   # (N,)
    error: jnp.ndarray     # (N,) mean reprojection error of the 3 markers
    index: jnp.ndarray     # (N,) drone index (0/1 by third-LED side)
    valid: jnp.ndarray     # (N,) slot validity


@functools.partial(jax.jit, static_argnames=("ax_h1", "ax_h2"))
def locate_objects(points, errors, valid,
                   dist1: float = 0.095, dist2: float = 0.15,
                   tol: float = 0.025, ax_h1: int = 0,
                   ax_h2: int = 1, side_min: float = 0.0) -> LocatedObjects:
    """Find drone marker triples among triangulated points.

    points: (N, 3); errors: (N,); valid: (N,) — the correspondence output.
    Constants default to the reference's marker geometry
    (``computer_code/api/helpers.py:425-426``).

    ``ax_h1``/``ax_h2`` select the two components used for heading and the
    third-LED side test.  The reference hardcodes components (0, 1)
    (``helpers.py:463,469``), but in the engine's world convention
    component 1 is the UP axis (the final y/z swap of ``helpers.py:102``
    puts height there), which would make heading a pitch angle and the
    drone-index side test pure noise for a flat marker layout — so the
    pipeline passes the horizontal pair (0, 2).

    ``side_min`` (improvement over the reference, documented): reject a
    triple whose "third LED" sits within ``side_min`` of the arm axis along
    ``ax_h2``.  When two arm LEDs optically merge in one view, their merged
    centroid passes the distance gates as a phantom third LED ON the axis,
    and the reference's bare sign test then assigns a coin-flip identity;
    a genuine third LED sits sqrt(dist1² - (dist2/2)²) ≈ 58 mm off-axis, so
    a small floor (the pipeline uses 20 mm) kills the flap without touching
    real fits (identity is inherently ambiguous near |yaw| = 90° either way).
    """
    N = points.shape[0]
    diff = points[:, None, :] - points[None, :, :]
    D = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))  # (N, N)

    vv = valid[:, None] & valid[None, :]
    near1 = (jnp.abs(D - dist1) < tol) & vv          # root->arm candidates
    pair_ok = jnp.abs(D - dist2) <= tol              # arm pair geometry
    # cand[i, j, k]: i is root, (j, k) its arm pair (reference cartesian
    # product includes ordered pairs; first hit in row-major order wins)
    cand = near1[:, :, None] & near1[:, None, :] & pair_ok[None, :, :]
    # exclude degenerate j == k (D[j,j]=0 fails pair_ok anyway, but be safe)
    eye = jnp.eye(N, dtype=bool)
    cand = cand & ~eye[None, :, :]

    def body(i, carry):
        consumed, out_pos, out_heading, out_err, out_idx, out_valid = carry
        row = cand[i] & valid[i] & ~consumed[i]      # (N, N)
        flat = row.reshape(-1)
        hit = jnp.any(flat)
        jk = jnp.argmax(flat)                        # first True (row-major)
        j = jk // N
        k = jk % N

        pj = points[j]
        pk = points[k]
        loc = (pj + pk) / 2.0
        hv = pj - pk
        hv = hv / jnp.maximum(jnp.linalg.norm(hv), 1e-12)
        heading = jnp.arctan2(hv[ax_h2], hv[ax_h1])
        heading = jnp.where(heading > jnp.pi / 2, heading - jnp.pi, heading)
        heading = jnp.where(heading < -jnp.pi / 2, heading + jnp.pi, heading)
        err = (errors[i] + errors[j] + errors[k]) / 3.0
        side = (points[i] - loc)[ax_h2]
        drone_idx = jnp.where(side > 0, 0, 1)
        hit = hit & (jnp.abs(side) >= side_min)

        consumed = consumed.at[i].set(consumed[i] | hit)
        consumed = consumed.at[j].set(consumed[j] | hit)
        consumed = consumed.at[k].set(consumed[k] | hit)
        out_pos = out_pos.at[i].set(jnp.where(hit, loc, 0.0))
        out_heading = out_heading.at[i].set(jnp.where(hit, -heading, 0.0))
        out_err = out_err.at[i].set(jnp.where(hit, err, jnp.inf))
        out_idx = out_idx.at[i].set(jnp.where(hit, drone_idx, -1))
        out_valid = out_valid.at[i].set(hit)
        return consumed, out_pos, out_heading, out_err, out_idx, out_valid

    init = (
        jnp.zeros((N,), bool),
        jnp.zeros((N, 3), points.dtype),
        jnp.zeros((N,), points.dtype),
        jnp.full((N,), jnp.inf, points.dtype),
        jnp.full((N,), -1, jnp.int32),
        jnp.zeros((N,), bool),
    )
    _, pos, heading, err, idx, ok = jax.lax.fori_loop(0, N, body, init)
    return LocatedObjects(pos, heading, err, idx, ok)
