"""Temporal 6-DoF rigid-body tracking over per-frame fits.

The drone path pairs its per-frame locator with a Kalman bank
(``computer_code/api/KalmanFilter.py`` — nearest-neighbour association +
filtering); this is the same role for generalized rigid bodies
(``ops/rigid_general.py``): per-frame 6-DoF fits are associated to
persistent tracks, gated against the motion prediction (which rejects the
geometrically-consistent-but-wrong interpretations a single frame cannot
disambiguate — see rigid_general's "known limitation"), and smoothed.

Fixed-shape design: ``max_bodies`` track slots; greedy nearest-neighbour
association as a statically unrolled loop over slots (slot counts are
small); alpha-beta filtering on position/velocity and sign-aligned
quaternion low-pass on orientation.  ``update`` is jit/scan-compatible:
the offline path scans it over a recording, the live path runs it inside
the per-frame compiled step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class BodyTrackState(NamedTuple):
    pos: jnp.ndarray      # (I, 3)
    vel: jnp.ndarray      # (I, 3)
    quat: jnp.ndarray     # (I, 4) body->world (w, x, y, z)
    active: jnp.ndarray   # (I,) bool
    missed: jnp.ndarray   # (I,) int32 consecutive missed frames


class TrackedBodies(NamedTuple):
    pos: jnp.ndarray      # (I, 3) filtered positions
    vel: jnp.ndarray      # (I, 3)
    quat: jnp.ndarray     # (I, 4)
    valid: jnp.ndarray    # (I,)


def init_state(max_bodies: int) -> BodyTrackState:
    I = max_bodies
    q0 = jnp.zeros((I, 4), jnp.float32).at[:, 0].set(1.0)
    return BodyTrackState(
        pos=jnp.zeros((I, 3), jnp.float32),
        vel=jnp.zeros((I, 3), jnp.float32),
        quat=q0,
        active=jnp.zeros((I,), bool),
        missed=jnp.zeros((I,), jnp.int32),
    )


def rot_to_quat(R):
    """(..., 3, 3) rotation -> (..., 4) unit quaternion (w, x, y, z)."""
    from low_cost_mocap_tpu.ops.rotations import matrix_to_quat

    return matrix_to_quat(R)


def quat_to_rot(q):
    """(..., 4) unit quaternion -> (..., 3, 3) rotation."""
    from low_cost_mocap_tpu.ops.rotations import quat_to_matrix

    return quat_to_matrix(q)


@functools.partial(jax.jit, static_argnames=("max_missed",))
def update(state: BodyTrackState, fit_t, fit_R, fit_rms, fit_valid, dt, *,
           gate_m: float = 0.15, rms_max: float = 0.02,
           max_missed: int = 8, pos_gain: float = 0.6,
           vel_gain: float = 0.4, quat_gain: float = 0.5
           ) -> tuple[BodyTrackState, TrackedBodies]:
    """One tracker step over a frame's body fits.

    fit_t: (F, 3); fit_R: (F, 3, 3); fit_rms/fit_valid: (F,) — the outputs
    of ``rigid_general.locate_bodies`` for one frame.  Association is
    greedy nearest-neighbour per track slot inside a ``gate_m`` radius of
    the constant-velocity prediction (the gate is what rejects wrong-but-
    consistent single-frame interpretations); unmatched fits seed tracks
    in inactive slots; tracks coast for up to ``max_missed`` frames.
    """
    I = state.pos.shape[0]
    F = fit_t.shape[0]
    meas_ok = fit_valid & (fit_rms < rms_max)
    meas_q = rot_to_quat(fit_R)

    pred_pos = state.pos + state.vel * dt
    d = jnp.linalg.norm(pred_pos[:, None, :] - fit_t[None, :, :], axis=-1)
    d = jnp.where(meas_ok[None, :], d, jnp.inf)          # (I, F)

    if max(I, F) <= 8:
        # globally optimal track<->fit matching (ops/assignment.py): the
        # greedy order can swap identities when two bodies approach; the
        # exhaustive matcher is exact and one einsum at these sizes
        from low_cost_mocap_tpu.ops.assignment import assign

        S = max(I, F)
        # Unmatchable-pair cost: must dominate any achievable real total
        # (S * gate_m) so permutations with fewer unmatched pairs always
        # win, but must stay SMALL — the permutation totals are float32
        # sums, and a huge sentinel (e.g. 1e9) swamps the real distances
        # entirely (ulp(1e9) = 64), making every partial-visibility frame
        # tie and resolve by table order instead of distance.  64 keeps
        # sub-0.1 mm resolution (ulp(S * 64) ~ 6e-5) at default gates.
        BIG = jnp.asarray(max(64.0, 8.0 * S * gate_m), d.dtype)
        cost = jnp.full((S, S), BIG, d.dtype)
        d_gated = jnp.where(jnp.isfinite(d) & state.active[:, None]
                            & (d < gate_m), d, BIG)
        cost = cost.at[:I, :F].set(d_gated)
        col, _ = assign(cost)
        col = col[:I]
        ok = state.active & (col < F) & (
            cost[jnp.arange(I), col] < gate_m)
        match_idx = jnp.where(ok, col.astype(jnp.int32), -1)
        claimed = jnp.zeros((F,), bool).at[
            jnp.where(ok, col, F)].set(True, mode="drop")
    else:
        # greedy association, active tracks first (statically unrolled)
        claimed = jnp.zeros((F,), bool)
        match_idx = jnp.full((I,), -1, jnp.int32)
        for i in range(I):
            di = jnp.where(claimed, jnp.inf, d[i])
            j = jnp.argmin(di)
            ok = state.active[i] & (di[j] < gate_m)
            match_idx = match_idx.at[i].set(jnp.where(ok, j, -1))
            claimed = claimed | (jnp.zeros((F,), bool).at[j].set(ok))

    matched = match_idx >= 0
    j_safe = jnp.maximum(match_idx, 0)
    meas_pos = fit_t[j_safe]                             # (I, 3)
    meas_quat = meas_q[j_safe]

    # alpha-beta update on position/velocity
    resid = meas_pos - pred_pos
    new_pos = jnp.where(matched[:, None],
                        pred_pos + pos_gain * resid, pred_pos)
    new_vel = jnp.where(matched[:, None],
                        state.vel + vel_gain * resid / jnp.maximum(dt, 1e-4),
                        state.vel)
    # sign-aligned quaternion low-pass (q and -q are the same rotation)
    sign = jnp.sign(jnp.sum(meas_quat * state.quat, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    q_mix = state.quat + quat_gain * (sign * meas_quat - state.quat)
    q_mix = q_mix / jnp.maximum(
        jnp.linalg.norm(q_mix, axis=-1, keepdims=True), 1e-12)
    new_quat = jnp.where(matched[:, None], q_mix, state.quat)

    new_missed = jnp.where(matched, 0, state.missed + 1)
    still_active = state.active & (new_missed <= max_missed)

    # spawn unclaimed valid fits into inactive slots (statically unrolled)
    free = ~still_active
    spawnable = meas_ok & ~claimed
    pos_s, vel_s, quat_s = new_pos, new_vel, new_quat
    active_s, missed_s = still_active, new_missed
    for i in range(I):
        j = jnp.argmax(spawnable)
        do = free[i] & jnp.any(spawnable)
        pos_s = pos_s.at[i].set(jnp.where(do, fit_t[j], pos_s[i]))
        vel_s = vel_s.at[i].set(jnp.where(do, 0.0, vel_s[i]))
        quat_s = quat_s.at[i].set(jnp.where(do, meas_q[j], quat_s[i]))
        active_s = active_s.at[i].set(active_s[i] | do)
        missed_s = missed_s.at[i].set(jnp.where(do, 0, missed_s[i]))
        spawnable = spawnable & ~(jnp.zeros((F,), bool).at[j].set(do))
        free = free.at[i].set(free[i] & ~do)

    new_state = BodyTrackState(pos=pos_s, vel=vel_s, quat=quat_s,
                               active=active_s, missed=missed_s)
    return new_state, TrackedBodies(pos=pos_s, vel=vel_s, quat=quat_s,
                                    valid=active_s)
