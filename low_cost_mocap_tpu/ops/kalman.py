"""Batched constant-acceleration Kalman bank + low-pass post-filtering.

Replaces ``KalmanFilter`` (``computer_code/api/KalmanFilter.py``), which
wraps one ``cv.KalmanFilter`` per drone, with a functional, fully batched
filter bank: state is a pytree, the update is one jitted function vmapped
over the object axis, and an offline ``lax.scan`` driver smooths whole
recorded sequences on device.

Model (identical to the reference):
  - 9-state [pos(3), vel(3), acc(3)] constant-acceleration model, 6-dim
    [pos, vel] measurement (``KalmanFilter.py:7-9,35-40``);
  - per-step dt rewritten into F (``KalmanFilter.py:65-67``);
  - Q = 1e-2 I, R = 1 I (``KalmanFilter.py:33-34``);
  - lazy init from the first candidate position (``KalmanFilter.py:69-73``);
  - nearest-neighbour association of candidate detections to the prediction
    (``KalmanFilter.py:75-78``);
  - velocity measured by finite difference against the previous associated
    position (``KalmanFilter.py:79``);
  - the reported pose is the *predicted* state (statePre), not the corrected
    one — a reference quirk kept for parity (``KalmanFilter.py:83,94``);
  - heading and velocity pass through order-5 Butterworth low-pass filters
    (``KalmanFilter.py:85-91``) — here the O(1) streaming bank of
    ``ops/lowpass.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.ops import lowpass


class KalmanState(NamedTuple):
    x: jnp.ndarray            # (O, 9) statePost
    P: jnp.ndarray            # (O, 9, 9) errorCovPost
    initialized: jnp.ndarray  # (O,) bool
    prev_pos: jnp.ndarray     # (O, 3)
    lpf_heading: jnp.ndarray  # (O, 5)
    lpf_vel: jnp.ndarray      # (O, 3, 5)
    age: jnp.ndarray          # (O,) seconds since last detection


class TrackedObjects(NamedTuple):
    pos: jnp.ndarray       # (O, 3)
    vel: jnp.ndarray       # (O, 3) low-passed
    heading: jnp.ndarray   # (O,) low-passed
    valid: jnp.ndarray     # (O,) bool — object had a detection this frame


def init_state(num_objects: int, dtype=jnp.float32) -> KalmanState:
    return KalmanState(
        x=jnp.zeros((num_objects, 9), dtype),
        P=jnp.tile(jnp.eye(9, dtype=dtype), (num_objects, 1, 1)),
        initialized=jnp.zeros((num_objects,), bool),
        prev_pos=jnp.zeros((num_objects, 3), dtype),
        lpf_heading=jnp.zeros((num_objects, 5), dtype),
        lpf_vel=jnp.zeros((num_objects, 3, 5), dtype),
        age=jnp.zeros((num_objects,), dtype),
    )


def _transition(dt, dtype):
    F = jnp.eye(9, dtype=dtype)
    I3 = jnp.eye(3, dtype=dtype)
    F = F.at[0:3, 3:6].set(dt * I3)
    F = F.at[3:6, 6:9].set(dt * I3)
    F = F.at[0:3, 6:9].set(0.5 * dt * dt * I3)
    return F


@functools.partial(jax.jit, static_argnames=("process_noise", "meas_noise",
                                             "gap_reset_s", "report",
                                             "advance_on_miss",
                                             "return_cov"))
def update(state: KalmanState, cand_pos, cand_heading, cand_index, cand_valid,
           dt, *, process_noise: float = 1e-2, meas_noise: float = 1.0,
           gap_reset_s: float = 0.5, report: str = "pre",
           advance_on_miss: bool = False, return_cov: bool = False):
    """One tracking step for the whole bank.

    cand_*: (M,) candidate detections from ``ops.rigid.locate_objects``
    (pos (M, 3), heading (M,), index (M,), valid (M,)).
    Returns (new_state, TrackedObjects).

    Velocity measurement (improvement over the reference, documented): the
    finite difference divides by the per-object time since its LAST
    detection, not the global frame dt — the reference's ``(new - prev) /
    dt`` (KalmanFilter.py:79) multiplies the true velocity by the number of
    frames the object went undetected (a single missed frame doubles it),
    which can slam the drone's velocity PID.  After a gap longer than
    ``gap_reset_s`` the measurement re-seeds to zero instead.

    ``report``: "pre" reports the PREDICTED state (the reference's
    statePre quirk, KalmanFilter.py:83,94 — the report never includes the
    current frame's measurement); "post" reports the corrected state
    (measured: steady-state tracked ATE 3.0 -> 2.5 mm on the synthetic
    orbit rig — the CA model predicts well, so the prediction-only lag is
    a fraction of the total).  Default "pre" for reference parity.

    ``advance_on_miss``: on frames with no detection for an object, commit
    the PREDICTED (x_pre, P_pre) instead of freezing the state (the live
    default, which mirrors the reference's no-measurement ``continue``).
    Every frame then carries exactly one predict(dt) step, which is the
    precondition for exact fixed-interval smoothing (``rts_smooth``) —
    and the principled offline behavior: covariance grows through gaps.

    ``return_cov``: additionally return the per-frame committed
    (x (O, 9), P (O, 9, 9)) — the inputs ``rts_smooth`` consumes.
    """
    if report not in ("pre", "post"):
        raise ValueError(f"report must be 'pre' or 'post', got {report!r}")
    O = state.x.shape[0]
    dtype = state.x.dtype
    dt = jnp.asarray(dt, dtype)
    Q = jnp.eye(9, dtype=dtype) * process_noise
    meas_noise = jnp.asarray(meas_noise, dtype)   # R = meas_noise * I6
    b, a = lowpass.butter_coeffs()

    def per_object(o, xs):
        x, P, inited, prev_pos, lh, lv, age = xs
        mine = cand_valid & (cand_index == o)
        any_mine = jnp.any(mine)

        # lazy init from the first (lowest-slot) candidate
        first = jnp.argmax(mine)
        init_pos = cand_pos[first]
        need_init = any_mine & ~inited
        x = jnp.where(need_init, x.at[:3].set(init_pos), x)
        # also seed prev_pos, so the first finite-difference velocity is 0.
        # (Deliberate divergence: the reference leaves prev at the origin,
        # so its first velocity measurement is the garbage (pos - 0)/dt —
        # computer_code/api/KalmanFilter.py:21,79.)
        prev_pos = jnp.where(need_init, init_pos, prev_pos)
        inited = inited | need_init

        # predict — F is the CA-model block matrix (identity + dt blocks),
        # so every product with F/F.T is three shifted-slice adds instead
        # of a 9x9 matmul.  Like the H-slicing below: bit-identical to the
        # matmuls under exact precision; under TPU-default reduced-f32
        # matmul precision the slice form is the MORE accurate of the two.
        # Fewer MXU ops per scan iteration in batched serving.
        hdt2 = 0.5 * dt * dt

        def f_rows(m):
            # F @ m for m of shape (9, ...): rows 0:3 += dt*rows 3:6 + ...
            return jnp.concatenate([
                (m[0:3] + dt * m[3:6]) + hdt2 * m[6:9],
                m[3:6] + dt * m[6:9],
                m[6:9],
            ], axis=0)

        x_pre = f_rows(x)
        FP = f_rows(P)                                   # F @ P
        # (F @ P) @ F.T: same combination on columns
        P_pre = jnp.concatenate([
            (FP[:, 0:3] + dt * FP[:, 3:6]) + hdt2 * FP[:, 6:9],
            FP[:, 3:6] + dt * FP[:, 6:9],
            FP[:, 6:9],
        ], axis=1) + Q

        # associate: nearest candidate to predicted position
        d2 = jnp.sum((cand_pos - x_pre[:3]) ** 2, axis=-1)
        d2 = jnp.where(mine, d2, jnp.inf)
        ci = jnp.argmin(d2)
        new_pos = cand_pos[ci]
        # finite-difference velocity over the object's true elapsed time;
        # after a long tracking gap the previous position is meaningless
        elapsed = age + dt
        reseed = elapsed > gap_reset_s
        vel_base = jnp.where(reseed, new_pos, prev_pos)
        new_vel = (new_pos - vel_base) / jnp.maximum(elapsed, 1e-6)

        # correct — H selects the first 6 state components, so every
        # product with H/H.T is a slice (or zero-pad) of the operand:
        # bit-identical to the explicit matmuls under exact matmul
        # precision (one-hot dot products are exact for finite values);
        # under TPU-default reduced f32 matmul precision the old H@P
        # matmuls were NOT exact, so the slice is the more accurate of
        # the two on-chip.  Several 9x9 matmuls cheaper per scan
        # iteration in batched serving; batched-vs-per-frame parity is
        # unaffected (both modes share this code).
        z = jnp.concatenate([new_pos, new_vel])
        # correct via SIX SEQUENTIAL SCALAR updates: R = meas_noise * I is
        # diagonal and H = [I6 | 0] selects components, so processing one
        # measurement component at a time (the textbook sequential Kalman
        # form) yields the SAME posterior as the batch update — with no
        # 6x6 matrix inverse.  jnp.linalg.inv lowers to an LU custom call
        # on TPU; inside the batched-serving lax.scan those custom calls
        # were ~5 us of the ~17 us/frame scan body (profiler-traced,
        # benchmarks/SCALING.md §2).  This form is pure VPU arithmetic
        # (rank-1 outer products), fuses into the scan body, and needs no
        # matmul-precision overrides at all (elementwise ops are exact
        # f32 — stronger than the HIGHEST-precision matmuls it replaces).
        x_post, P_post = x_pre, P_pre
        for i in range(6):
            Pi = P_post[:, i]                       # P @ h_i^T
            Kv = Pi / (Pi[i] + meas_noise)          # gain column (9,)
            x_post = x_post + Kv * (z[i] - x_post[i])
            P_post = P_post - jnp.outer(Kv, P_post[i, :])

        # long-gap reacquisition: after ``gap_reset_s`` without a detection
        # the frozen prior is meaningless, so re-seed the filter from the
        # measurement (position = z, vel/acc = 0, P = I — the lazy-init
        # state).  Without this the stale steady-state covariance keeps the
        # gain small and the bank drags toward the reappeared object over
        # dozens of frames (the reference reconverges FASTER there by
        # accident: its velocity measurement (new-prev)/dt over a one-frame
        # dt spikes by the gap length, KalmanFilter.py:79, kicking its
        # state toward the measurement — measured 34 mm vs its 10.6 mm
        # post-gap RMS on the dropout differential before this re-seed).
        reseed_all = reseed & inited
        x_post = jnp.where(reseed_all,
                           jnp.zeros_like(x).at[:3].set(new_pos), x_post)
        P_post = jnp.where(reseed_all, jnp.eye(9, dtype=dtype), P_post)

        x_rep = x_pre if report == "pre" else x_post
        # on the reacquisition frame itself the prediction is the stale
        # pre-gap pose — report the re-seeded state (documented divergence:
        # the reference reports its statePre here too, which is why its
        # first post-gap report is off by the whole gap distance)
        x_rep = jnp.where(reseed_all, x_post, x_rep)
        # low-pass heading + reported-state velocity
        lh2, heading_f = lowpass.lpf_step(lh, cand_heading[ci], b, a)
        lv2, vel_f = lowpass.lpf_step(lv, x_rep[3:6], b, a)

        # commit only when this object had a detection (reference `continue`)
        # — unless advance_on_miss: then an initialized object commits its
        # prediction through the gap (one predict(dt) per frame, exactly)
        upd = lambda new, old: jnp.where(any_mine, new, old)
        if advance_on_miss:
            x_commit = jnp.where(any_mine, x_post,
                                 jnp.where(inited, x_pre, x))
            P_commit = jnp.where(any_mine, P_post,
                                 jnp.where(inited, P_pre, P))
        else:
            x_commit = upd(x_post, x)
            P_commit = upd(P_post, P)
        new_age = jnp.where(any_mine, 0.0, age + dt)
        out = (
            x_commit,
            P_commit,
            inited,
            upd(new_pos, prev_pos),
            upd(lh2, lh),
            upd(lv2, lv),
            new_age,
        )
        # reported pose/vel: predicted (reference statePre quirk) or
        # corrected state per the `report` option
        return out, (x_rep[:3], vel_f, heading_f, any_mine)

    ids = jnp.arange(O)
    xs = (state.x, state.P, state.initialized, state.prev_pos,
          state.lpf_heading, state.lpf_vel, state.age)
    new_xs, (pos, vel, heading, ok) = jax.vmap(per_object)(ids, xs)
    new_state = KalmanState(*new_xs)
    pos = jnp.where(ok[:, None], pos, 0.0)
    vel = jnp.where(ok[:, None], vel, 0.0)
    heading = jnp.where(ok, heading, 0.0)
    tracked = TrackedObjects(pos, vel, heading, ok)
    if return_cov:
        return new_state, (tracked, new_state.x, new_state.P)
    return new_state, tracked


def track_sequence(state: KalmanState, cand_pos_seq, cand_heading_seq,
                   cand_index_seq, cand_valid_seq, dts, **kw):
    """Offline filtering of a recorded sequence via one lax.scan.

    cand_*_seq: (T, M, ...) per-frame candidate tensors; dts: (T,).
    """
    def step(s, inputs):
        cp, ch, ci, cv, dt = inputs
        s2, out = update(s, cp, ch, ci, cv, dt, **kw)
        return s2, out

    return jax.lax.scan(
        step, state,
        (cand_pos_seq, cand_heading_seq, cand_index_seq, cand_valid_seq, dts))


def rts_smooth(xs, Ps, dts, *, process_noise: float = 1e-2):
    """Fixed-interval Rauch-Tung-Striebel smoother over filtered states.

    The live tracker is causal, so its estimate lags the true trajectory
    by construction (the dominant term of the measured ~3 mm tracked ATE);
    offline, the whole recording is known and the backward RTS pass
    removes that lag.  No reference analogue (SURVEY.md §5 — the
    reference keeps no server-side history at all).

    xs: (T, O, 9) filtered means, Ps: (T, O, 9, 9) filtered covariances —
    the ``return_cov`` outputs of a forward pass that performed exactly
    one predict(dts[k]) per frame (``advance_on_miss=True``); dts[k] is
    the interval between frames k-1 and k.
    Returns (xs_smooth (T, O, 9), Ps_smooth (T, O, 9, 9)).

    Recursion (k = T-2 .. 0), per object:
        P_pred  = F_k P_k F_k' + Q        with F_k = F(dts[k+1])
        C_k     = P_k F_k' P_pred^{-1}
        x_s[k]  = x[k] + C_k (x_s[k+1] - F_k x[k])
        P_s[k]  = P_k + C_k (P_s[k+1] - P_pred) C_k'
    One backward lax.scan, batched over the object axis.
    """
    dtype = xs.dtype
    Q = jnp.eye(9, dtype=dtype) * process_noise

    def backward(carry, inp):
        x_next_s, P_next_s = carry           # smoothed k+1, (O, 9)/(O, 9, 9)
        x_k, P_k, dt_next = inp              # filtered k, dt of step k->k+1
        F = _transition(dt_next, dtype)
        x_pred = jnp.einsum("ij,oj->oi", F, x_k, precision=jax.lax.Precision.HIGHEST)
        P_pred = jnp.einsum("ij,ojk,lk->oil", F, P_k, F, precision=jax.lax.Precision.HIGHEST) + Q
        C = jnp.einsum("oij,kj,okl->oil", P_k, F,
                       jnp.linalg.inv(P_pred), precision=jax.lax.Precision.HIGHEST)
        x_s = x_k + jnp.einsum("oij,oj->oi", C, x_next_s - x_pred, precision=jax.lax.Precision.HIGHEST)
        P_s = P_k + jnp.einsum("oij,ojk,olk->oil", C, P_next_s - P_pred, C, precision=jax.lax.Precision.HIGHEST)
        return (x_s, P_s), (x_s, P_s)

    (_, _), (xs_s, Ps_s) = jax.lax.scan(
        backward, (xs[-1], Ps[-1]), (xs[:-1], Ps[:-1], dts[1:]),
        reverse=True)
    xs_s = jnp.concatenate([xs_s, xs[-1:]], axis=0)
    Ps_s = jnp.concatenate([Ps_s, Ps[-1:]], axis=0)
    return xs_s, Ps_s


def rts_smooth_assoc(xs, Ps, dts, *, process_noise: float = 1e-2):
    """Temporally-PARALLEL RTS smoother via ``lax.associative_scan``.

    Same inputs/outputs as ``rts_smooth``.  The backward recursion is the
    repeated application of per-step affine maps

        x_s[k] = E_k x_s[k+1] + g_k   (+ noise with covariance L_k)

    with E_k = C_k (the smoother gain), g_k = x_f[k] - C_k F_k x_f[k],
    L_k = P_f[k] - C_k P_pred[k+1] C_k'.  Affine-map composition is
    ASSOCIATIVE, so the suffix products a_k o a_{k+1} o ... o a_{T-2}
    evaluate in O(log T) depth instead of a length-T sequential scan
    (Sarkka & Garcia-Fernandez, "Temporal Parallelization of Bayesian
    Smoothers", IEEE TAC 2021) — and under a time-sharded input the
    log-depth combine tree partitions across the mesh's ``time`` axis,
    which a sequential scan cannot (SURVEY.md §5's temporal-sharding
    axis).  Matches ``rts_smooth`` to float precision (tested).
    """
    dtype = xs.dtype
    Q = jnp.eye(9, dtype=dtype) * process_noise
    F = jax.vmap(lambda dt: _transition(dt, dtype))(dts[1:])  # (T-1, 9, 9)
    x_pred = jnp.einsum("tij,toj->toi", F, xs[:-1], precision=jax.lax.Precision.HIGHEST)
    P_pred = jnp.einsum("tij,tojk,tlk->toil", F, Ps[:-1], F, precision=jax.lax.Precision.HIGHEST) + Q
    C = jnp.einsum("toij,tkj,tokl->toil", Ps[:-1], F,
                   jnp.linalg.inv(P_pred), precision=jax.lax.Precision.HIGHEST)
    E = C                                                    # (T-1, O, 9, 9)
    g = xs[:-1] - jnp.einsum("toij,toj->toi", C, x_pred, precision=jax.lax.Precision.HIGHEST)
    L = Ps[:-1] - jnp.einsum("toij,tojk,tolk->toil", C, P_pred, C, precision=jax.lax.Precision.HIGHEST)

    def combine(a, b):
        # jax flips the sequence for reverse=True, so the LEFT operand is
        # the LATER-in-time combined suffix; composition applies the
        # earlier element (b) outermost: (b o a)(x) = b(a(x))
        Ea, ga, La = a
        Eb, gb, Lb = b
        return (jnp.einsum("toij,tojk->toik", Eb, Ea, precision=jax.lax.Precision.HIGHEST),
                jnp.einsum("toij,toj->toi", Eb, ga, precision=jax.lax.Precision.HIGHEST) + gb,
                jnp.einsum("toij,tojk,tolk->toil", Eb, La, Eb, precision=jax.lax.Precision.HIGHEST) + Lb)

    Es, gs, Ls = jax.lax.associative_scan(combine, (E, g, L), reverse=True)
    xs_s = jnp.einsum("toij,oj->toi", Es, xs[-1], precision=jax.lax.Precision.HIGHEST) + gs
    Ps_s = jnp.einsum("toij,ojk,tolk->toil", Es, Ps[-1], Es, precision=jax.lax.Precision.HIGHEST) + Ls
    xs_s = jnp.concatenate([xs_s, xs[-1:]], axis=0)
    Ps_s = jnp.concatenate([Ps_s, Ps[-1:]], axis=0)
    return xs_s, Ps_s


def smooth_sequence(state: KalmanState, cand_pos_seq, cand_heading_seq,
                    cand_index_seq, cand_valid_seq, dts, *,
                    process_noise: float = 1e-2, **kw):
    """Forward filter + RTS backward pass over a recorded sequence.

    Returns (TrackedObjects with (T, O, ...) smoothed pos/vel,
    xs_smooth (T, O, 9)).  The forward pass runs ``advance_on_miss=True``
    + ``report="post"`` (each frame = one predict+commit, the smoother's
    precondition); all inside jit-compatible scans.

    ``valid`` in the result marks frames where the track is INITIALIZED
    (first detection seen) — NOT per-frame detection: the whole point of
    the smoother is that occlusion-gap frames between detections carry
    interpolated (not zeroed) states.  The causal per-frame detection
    flags are the ``tracked.valid`` of the plain filtering path.
    """
    def step(s, inputs):
        cp, ch, ci, cv, dt = inputs
        s2, (out, x, P) = update(s, cp, ch, ci, cv, dt,
                                 process_noise=process_noise,
                                 report="post", advance_on_miss=True,
                                 return_cov=True, **kw)
        return s2, (out, x, P, s2.initialized)

    _, (tracked, xs, Ps, inited) = jax.lax.scan(
        step, state,
        (cand_pos_seq, cand_heading_seq, cand_index_seq, cand_valid_seq,
         dts))
    xs_s, _ = rts_smooth(xs, Ps, dts, process_noise=process_noise)
    smoothed = TrackedObjects(
        pos=jnp.where(inited[..., None], xs_s[..., :3], 0.0),
        vel=jnp.where(inited[..., None], xs_s[..., 3:6], 0.0),
        heading=tracked.heading,
        valid=inited)
    return smoothed, xs_s
