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


@functools.partial(jax.jit, static_argnames=(
    "max_missed", "return_meas", "gate_m", "rms_max", "pos_gain",
    "vel_gain", "quat_gain"))
def update(state: BodyTrackState, fit_t, fit_R, fit_rms, fit_valid, dt, *,
           gate_m: float = 0.15, rms_max: float = 0.02,
           max_missed: int = 8, pos_gain: float = 0.6,
           vel_gain: float = 0.4, quat_gain: float = 0.5,
           return_meas: bool = False
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
    tracked = TrackedBodies(pos=pos_s, vel=vel_s, quat=quat_s,
                            valid=active_s)
    if return_meas:
        # the ASSOCIATED raw measurement per slot (offline smoothing input):
        # a spawned slot's first fit counts as its measurement too
        spawn_meas = active_s & (~state.active) & ~matched
        # recover which fit seeded each spawned slot: nearest fit to pos_s
        d_sp = jnp.linalg.norm(pos_s[:, None, :] - fit_t[None, :, :],
                               axis=-1)
        j_sp = jnp.argmin(jnp.where(meas_ok[None, :], d_sp, jnp.inf),
                          axis=1)
        m_ok = matched | spawn_meas
        m_pos = jnp.where(matched[:, None], meas_pos, fit_t[j_sp])
        m_quat = jnp.where(matched[:, None], meas_quat, meas_q[j_sp])
        return new_state, (tracked, (m_pos, m_quat, m_ok))
    return new_state, tracked


# ---------------------------------------------------------------------------
# Offline fixed-interval smoothing of 6-DoF body tracks
# ---------------------------------------------------------------------------
#
# The drone bank has an offline RTS smoother (ops/kalman.rts_smooth); this
# is the same acausal capability for generalized rigid bodies: a
# constant-velocity Kalman forward pass over the ASSOCIATED per-frame fit
# positions (association by the causal tracker above), an RTS backward
# pass, and time-parameterised quaternion SLERP through occlusion gaps.
# No reference analogue (SURVEY.md §5 — the reference keeps no history).


class SmoothedBodies(NamedTuple):
    pos: jnp.ndarray    # (T, I, 3) smoothed positions
    vel: jnp.ndarray    # (T, I, 3)
    quat: jnp.ndarray   # (T, I, 4) sign-aligned, gap-SLERPed
    valid: jnp.ndarray  # (T, I) inside the track's [first, last] sighting


def _F6(dt, dtype):
    F = jnp.eye(6, dtype=dtype)
    return F.at[:3, 3:].set(dt * jnp.eye(3, dtype=dtype))


def _cv_forward(z, ok, dts, process_noise, meas_noise):
    """Per-slot constant-velocity Kalman filter, one predict per frame.

    z: (T, I, 3) associated measurements; ok: (T, I); dts: (T,).
    Returns committed (xs (T, I, 6), Ps (T, I, 6, 6), inited (T, I)).
    """
    dtype = z.dtype
    I6 = jnp.eye(6, dtype=dtype)
    H = jnp.zeros((3, 6), dtype).at[:, :3].set(jnp.eye(3, dtype=dtype))
    R = jnp.eye(3, dtype=dtype) * meas_noise
    Q = I6 * process_noise
    n_slots = z.shape[1]

    def step(carry, inp):
        x, P, inited = carry                    # (I, 6), (I, 6, 6), (I,)
        zt, okt, dt = inp
        F = _F6(dt, dtype)
        x_pre = jnp.einsum("ij,oj->oi", F, x)
        P_pre = jnp.einsum("ij,ojk,lk->oil", F, P, F) + Q
        need = okt & ~inited
        x_pre = jnp.where(need[:, None],
                          jnp.concatenate([zt, jnp.zeros_like(zt)], -1),
                          x_pre)
        P_pre = jnp.where(need[:, None, None], I6, P_pre)
        inited2 = inited | okt
        S = jnp.einsum("ij,ojk,lk->oil", H, P_pre, H) + R
        K = jnp.einsum("oij,kj,okl->oil", P_pre, H, jnp.linalg.inv(S))
        resid = zt - jnp.einsum("ij,oj->oi", H, x_pre)
        x_post = x_pre + jnp.einsum("oij,oj->oi", K, resid)
        P_post = P_pre - jnp.einsum("oij,jk,okl->oil", K, H, P_pre)
        x_new = jnp.where(okt[:, None], x_post, x_pre)
        P_new = jnp.where(okt[:, None, None], P_post, P_pre)
        # uninitialized slots stay frozen
        x_new = jnp.where(inited2[:, None], x_new, x)
        P_new = jnp.where(inited2[:, None, None], P_new, P)
        return (x_new, P_new, inited2), (x_new, P_new, inited2)

    x0 = jnp.zeros((n_slots, 6), dtype)
    P0 = jnp.tile(I6, (n_slots, 1, 1))
    _, (xs, Ps, inited) = jax.lax.scan(
        step, (x0, P0, jnp.zeros((n_slots,), bool)), (z, ok, dts))
    return xs, Ps, inited


def _cv_rts(xs, Ps, dts, process_noise):
    """RTS backward pass for the CV model (mirror of kalman.rts_smooth)."""
    dtype = xs.dtype
    Q = jnp.eye(6, dtype=dtype) * process_noise

    def backward(carry, inp):
        x_next_s, P_next_s = carry
        x_k, P_k, dt_next = inp
        F = _F6(dt_next, dtype)
        x_pred = jnp.einsum("ij,oj->oi", F, x_k)
        P_pred = jnp.einsum("ij,ojk,lk->oil", F, P_k, F) + Q
        C = jnp.einsum("oij,kj,okl->oil", P_k, F, jnp.linalg.inv(P_pred))
        x_s = x_k + jnp.einsum("oij,oj->oi", C, x_next_s - x_pred)
        P_s = P_k + jnp.einsum("oij,ojk,olk->oil", C, P_next_s - P_pred, C)
        return (x_s, P_s), (x_s, P_s)

    (_, _), (xs_s, Ps_s) = jax.lax.scan(
        backward, (xs[-1], Ps[-1]), (xs[:-1], Ps[:-1], dts[1:]),
        reverse=True)
    xs_s = jnp.concatenate([xs_s, xs[-1:]], axis=0)
    Ps_s = jnp.concatenate([Ps_s, Ps[-1:]], axis=0)
    return xs_s, Ps_s


def _slerp(q0, q1, w):
    """Batched SLERP with sign alignment; w broadcastable to (..., 1)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.clip(jnp.abs(d), 0.0, 1.0)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    small = sin_t < 1e-5
    s0 = jnp.where(small, 1.0 - w, jnp.sin((1.0 - w) * theta)
                   / jnp.where(small, 1.0, sin_t))
    s1 = jnp.where(small, w, jnp.sin(w * theta)
                   / jnp.where(small, 1.0, sin_t))
    q = s0 * q0 + s1 * q1
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                           1e-12)


def _quat_gap_interp(quats, ok):
    """Per-slot time interpolation of measured quaternions.

    quats: (T, I, 4) raw measured orientations (garbage where ~ok);
    ok: (T, I).  Each frame's orientation is the SLERP between its nearest
    measured neighbours (clamped at the edges) — the acausal counterpart
    of the live tracker's one-sided low-pass.
    """
    T = quats.shape[0]

    # sequential sign alignment along time (q and -q are the same rotation)
    def align(carry, inp):
        q, okt = inp
        s = jnp.sign(jnp.sum(q * carry, axis=-1, keepdims=True))
        s = jnp.where(s == 0, 1.0, s)
        q2 = jnp.where(okt[:, None], s * q, carry)
        return q2, q2

    q0 = quats[0]
    _, qa = jax.lax.scan(align, q0, (quats, ok))

    idx = jnp.arange(T)[:, None]                          # (T, 1)
    prev = jax.lax.cummax(jnp.where(ok, idx, -1), axis=0)         # (T, I)
    nxt = jax.lax.cummin(jnp.where(ok, idx, T), axis=0, reverse=True)
    prev_c = jnp.clip(prev, 0, T - 1)
    nxt_c = jnp.clip(nxt, 0, T - 1)
    q_prev = jnp.take_along_axis(qa, prev_c[..., None], axis=0)
    q_next = jnp.take_along_axis(qa, nxt_c[..., None], axis=0)
    has_prev = prev >= 0
    has_next = nxt <= T - 1
    q_prev = jnp.where(has_prev[..., None], q_prev, q_next)
    q_next = jnp.where(has_next[..., None], q_next, q_prev)
    span = jnp.maximum((nxt_c - prev_c).astype(quats.dtype), 1.0)
    w = jnp.where(has_prev & has_next,
                  (idx - prev_c).astype(quats.dtype) / span, 0.0)
    return _slerp(q_prev, q_next, w[..., None])


def smooth_body_sequence(fit_t, fit_R, fit_rms, fit_valid, dts,
                         max_bodies: int, *, process_noise: float = 1e-2,
                         meas_noise: float = 1e-4, gate_m: float = 0.15,
                         rms_max: float = 0.02, max_missed: int = 30,
                         ) -> SmoothedBodies:
    """Offline fixed-interval smoothing of 6-DoF body tracks.

    fit_*: (T, F, ...) per-frame outputs of ``rigid_general.locate_bodies``
    over a recording; dts: (T,).  Three passes, all jit/scan-compatible:

    1. the causal tracker above associates fits to ``max_bodies`` track
       slots (``max_missed`` defaults high — offline, coasting through a
       long occlusion and re-associating beats spawning a new slot);
    2. constant-velocity Kalman forward + RTS backward over the associated
       positions — occlusion-gap frames carry smoothly interpolated
       (not frozen or zeroed) states, like ``kalman.smooth_sequence``
       does for drones;
    3. quaternion SLERP between nearest measured orientations per frame.

    ``valid`` marks frames within a track's [first, last] sighting — gap
    frames in between are valid BY DESIGN (interpolation is the point).
    """
    def astep(st, inp):
        ft, fR, frms, fv, dt = inp
        st2, (_, meas) = update(st, ft, fR, frms, fv, dt,
                                gate_m=gate_m, rms_max=rms_max,
                                max_missed=max_missed, return_meas=True)
        return st2, meas

    _, (m_pos, m_quat, m_ok) = jax.lax.scan(
        astep, init_state(max_bodies), (fit_t, fit_R, fit_rms,
                                        fit_valid, dts))

    m_pos = jnp.where(m_ok[..., None], m_pos, 0.0)
    xs, Ps, inited = _cv_forward(m_pos, m_ok, dts, process_noise,
                                 meas_noise)
    xs_s, _ = _cv_rts(xs, Ps, dts, process_noise)
    quat_s = _quat_gap_interp(m_quat, m_ok)

    seen_fwd = inited                                   # first sighting on
    seen_bwd = jnp.flip(jnp.cumsum(jnp.flip(m_ok, 0), axis=0), 0) > 0
    valid = seen_fwd & seen_bwd
    return SmoothedBodies(
        pos=jnp.where(valid[..., None], xs_s[..., :3], 0.0),
        vel=jnp.where(valid[..., None], xs_s[..., 3:], 0.0),
        quat=quat_s,
        valid=valid)
