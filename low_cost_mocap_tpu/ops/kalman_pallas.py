"""Fused Pallas TPU kernel for the sequential Kalman-bank scan.

The batched-dispatch serving program vmaps all frame-independent geometry
over the batch and runs ONLY the Kalman bank as a ``lax.scan``
(``models/pipeline.scan_track_from_blobs``).  That scan body is ~90 tiny
XLA ops per iteration (predict slices, one-hot association, six
sequential scalar measurement updates, two Butterworth banks) — measured
25.5 us/iteration in isolation on TPU v5e, of which 0.38 us is loop
overhead: the cost is per-op dispatch, not math.  This kernel fuses the
whole per-frame bank update into ONE Pallas program with a sequential
grid over the batch: filter state lives in VMEM output refs across grid
steps, each step runs the identical update formulas
(``ops/kalman.update``'s serving path, same operation order), and kernel
launch overhead is paid once per batch instead of ~90 ops per frame.

Scope (the batched serving scan only): ``report`` "pre"/"post",
``advance_on_miss=False``, ``return_cov=False`` — exactly what
``scan_track_from_blobs`` uses.  Callers outside this envelope (the
per-frame step, RTS forward pass, CPU tests, vmapped multi-rig serving,
mesh-sharded tails) use the XLA path in ``ops/kalman.py``.  The
PER-FRAME program deliberately keeps the XLA bank: a pallas call is a
custom call, and custom calls serialize the tunnel's async dispatch
pipelining (measured per-frame 1,113 -> 559 fps with the kernel
inlined) — while in the batched program ONE kernel per 128 frames is
free.

Numerics: the kernel is BITWISE identical to the XLA per-step chain
given identical inputs (same formulas, same operation order; verified
on-chip over 512 random frames including dropouts, association ties
and gap re-seeds — asserted by benchmarks/onchip_differential.py), so
swapping it into the batched scan adds ZERO divergence between serving
modes; the modes' remaining on-TPU float difference is the pre-existing
vmapped-vs-inline GEOMETRY fusion (~1e-5), and they stay bitwise
identical on CPU where the product guarantee is pinned
(tests/test_host_detect.py::test_dispatch_batch_bit_identical_to_per_frame).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.ops import lowpass
from low_cost_mocap_tpu.ops.kalman import KalmanState, TrackedObjects


def _bank_kernel(cand_pos_ref, cand_h_ref, cand_i_ref, cand_v_ref,
                 dts_ref, ba_ref,
                 x0_ref, P0_ref, init0_ref, prev0_ref, lh0_ref, lv0_ref,
                 age0_ref,
                 pos_out, vel_out, head_out, valid_out,
                 x_ref, P_ref, init_ref, prev_ref, lh_ref, lv_ref, age_ref,
                 *, O, M, process_noise, meas_noise, gap_reset_s, report):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _seed():
        x_ref[...] = x0_ref[...]
        P_ref[...] = P0_ref[...]
        init_ref[...] = init0_ref[...]
        prev_ref[...] = prev0_ref[...]
        lh_ref[...] = lh0_ref[...]
        lv_ref[...] = lv0_ref[...]
        age_ref[...] = age0_ref[...]

    dt = dts_ref[i]
    hdt2 = 0.5 * dt * dt
    b = ba_ref[0, :]                                   # (6,)
    a = ba_ref[1, :]
    cp = cand_pos_ref[i]                               # (M, 3)
    ch = cand_h_ref[i]                                 # (M,)
    ci = cand_i_ref[i]                                 # (M,)
    cv = cand_v_ref[i] > 0.5                           # (M,)
    # TPU Mosaic requires >= 2D INTEGER iota; build 2D int, cast, take row
    iota_m = jax.lax.broadcasted_iota(
        jnp.int32, (1, M), 1).astype(jnp.float32)[0]
    big = jnp.float32(1e30)

    for o in range(O):
        x = x_ref[o]                                   # (9,)
        P = P_ref[o]                                   # (9, 9)
        inited = init_ref[o] > 0.5
        prev = prev_ref[o]                             # (3,)
        age = age_ref[o]

        mine = cv & (ci == o)
        any_mine = jnp.any(mine)

        # lazy init from the first (lowest-slot) candidate — one-hot of
        # the first True (argmax semantics of kalman.update)
        first_pos = jnp.min(jnp.where(mine, iota_m, big))
        first_oh = jnp.where(
            mine & (iota_m == first_pos), 1.0, 0.0)    # (M,)
        has_first = jnp.any(mine)
        first_oh = jnp.where(has_first, first_oh,
                             jnp.where(iota_m == 0.0, 1.0, 0.0))
        init_pos = jnp.sum(first_oh[:, None] * cp, axis=0)   # (3,)
        need_init = any_mine & ~inited
        x = jnp.where(need_init,
                      jnp.concatenate([init_pos, x[3:]]), x)
        prev = jnp.where(need_init, init_pos, prev)
        inited = inited | need_init

        # predict: F = I + dt blocks (same slice arithmetic as
        # kalman.update's f_rows)
        x_pre = jnp.concatenate([
            (x[0:3] + dt * x[3:6]) + hdt2 * x[6:9],
            x[3:6] + dt * x[6:9],
            x[6:9],
        ])
        FP = jnp.concatenate([
            (P[0:3] + dt * P[3:6]) + hdt2 * P[6:9],
            P[3:6] + dt * P[6:9],
            P[6:9],
        ], axis=0)
        P_pre = jnp.concatenate([
            (FP[:, 0:3] + dt * FP[:, 3:6]) + hdt2 * FP[:, 6:9],
            FP[:, 3:6] + dt * FP[:, 6:9],
            FP[:, 6:9],
        ], axis=1) + process_noise * jnp.eye(9, dtype=jnp.float32)

        # associate: nearest candidate to the prediction (first-min
        # one-hot replaces argmin+gather)
        d2 = jnp.sum((cp - x_pre[:3]) ** 2, axis=-1)   # (M,)
        score = jnp.where(mine, d2, big)
        smin = jnp.min(score)
        cand_first = jnp.min(jnp.where(score == smin, iota_m, big))
        oh = jnp.where(iota_m == cand_first, 1.0, 0.0)  # (M,)
        new_pos = jnp.sum(oh[:, None] * cp, axis=0)     # (3,)
        sel_heading = jnp.sum(oh * ch)

        elapsed = age + dt
        reseed = elapsed > gap_reset_s
        vel_base = jnp.where(reseed, new_pos, prev)
        new_vel = (new_pos - vel_base) / jnp.maximum(elapsed, 1e-6)
        z = jnp.concatenate([new_pos, new_vel])         # (6,)

        # correct: six sequential scalar measurement updates
        # (H = [I6|0], R = meas_noise * I — same form as kalman.update)
        x_post, P_post = x_pre, P_pre
        for k in range(6):
            Pk = P_post[:, k]                           # (9,)
            Kv = Pk / (Pk[k] + meas_noise)
            x_post = x_post + Kv * (z[k] - x_post[k])
            P_post = P_post - Kv[:, None] * P_post[k, :][None, :]

        # long-gap reacquisition re-seed (kalman.update's reseed_all)
        reseed_all = reseed & inited
        x_seed = jnp.concatenate([new_pos, jnp.zeros((6,), jnp.float32)])
        x_post = jnp.where(reseed_all, x_seed, x_post)
        P_post = jnp.where(reseed_all,
                           jnp.eye(9, dtype=jnp.float32), P_post)

        x_rep = x_pre if report == "pre" else x_post
        x_rep = jnp.where(reseed_all, x_post, x_rep)

        # low-pass banks (lowpass.lpf_step recurrence, order 5)
        lh = lh_ref[o]                                  # (5,)
        lv = lv_ref[o]                                  # (3, 5)

        def lpf(state, xval):
            y = b[0] * xval + state[..., 0]
            new = [b[k + 1] * xval + state[..., k + 1] - a[k + 1] * y
                   for k in range(4)]
            new.append(b[5] * xval - a[5] * y)
            return jnp.stack(new, axis=-1), y

        lh2, heading_f = lpf(lh, sel_heading)
        lv2, vel_f = lpf(lv, x_rep[3:6])

        # commit only on detection (reference `continue` semantics).
        # Scalar state/outputs store as 1-element vectors (Mosaic cannot
        # store scalars to VMEM).
        x_ref[o] = jnp.where(any_mine, x_post, x)
        P_ref[o] = jnp.where(any_mine, P_post, P)
        init_ref[o:o + 1] = jnp.where(inited, 1.0, 0.0)[None]
        prev_ref[o] = jnp.where(any_mine, new_pos, prev)
        lh_ref[o] = jnp.where(any_mine, lh2, lh)
        lv_ref[o] = jnp.where(any_mine, lv2, lv)
        age_ref[o:o + 1] = jnp.where(any_mine, 0.0, age + dt)[None]

        amf = jnp.where(any_mine, 1.0, 0.0)
        pos_out[i, o] = amf * x_rep[:3]
        vel_out[i, o] = amf * vel_f
        head_out[i, o:o + 1] = (amf * heading_f)[None]
        valid_out[i, o:o + 1] = amf[None]


@functools.partial(jax.jit, static_argnames=(
    "process_noise", "meas_noise", "gap_reset_s", "report", "interpret"))
def kalman_scan(state: KalmanState, cand_pos_seq, cand_heading_seq,
                cand_index_seq, cand_valid_seq, dts, *,
                process_noise: float = 1e-2, meas_noise: float = 1.0,
                gap_reset_s: float = 0.5, report: str = "pre",
                interpret: bool = False):
    """Run B sequential bank updates in ONE fused kernel.

    Equivalent to scanning ``kalman.update`` over the (B, ...) candidate
    sequences with the serving options (advance_on_miss=False,
    return_cov=False).  Returns (new_state, TrackedObjects with (B, O,
    ...) leaves).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if report not in ("pre", "post"):
        raise ValueError(f"report must be 'pre' or 'post', got {report!r}")
    B, M, _ = cand_pos_seq.shape
    O = state.x.shape[0]
    f32 = jnp.float32
    b, a = lowpass.butter_coeffs()
    ba = jnp.stack([jnp.asarray(b, f32), jnp.asarray(a, f32)])

    kernel = functools.partial(
        _bank_kernel, O=O, M=M,
        process_noise=float(process_noise), meas_noise=float(meas_noise),
        gap_reset_s=float(gap_reset_s), report=report)

    out_shapes = (
        jax.ShapeDtypeStruct((B, O, 3), f32),    # pos
        jax.ShapeDtypeStruct((B, O, 3), f32),    # vel
        jax.ShapeDtypeStruct((B, O), f32),       # heading
        jax.ShapeDtypeStruct((B, O), f32),       # valid (0/1)
        jax.ShapeDtypeStruct((O, 9), f32),       # x
        jax.ShapeDtypeStruct((O, 9, 9), f32),    # P
        jax.ShapeDtypeStruct((O,), f32),         # initialized
        jax.ShapeDtypeStruct((O, 3), f32),       # prev_pos
        jax.ShapeDtypeStruct((O, 5), f32),       # lpf_heading
        jax.ShapeDtypeStruct((O, 3, 5), f32),    # lpf_vel
        jax.ShapeDtypeStruct((O,), f32),         # age
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vmem, vmem, vmem, vmem, smem1, vmem,
                  vmem, vmem, vmem, vmem, vmem, vmem, vmem],
        out_specs=tuple([vmem] * len(out_shapes)),
        out_shape=out_shapes,
        interpret=interpret,
    )(
        cand_pos_seq.astype(f32),
        cand_heading_seq.astype(f32),
        cand_index_seq.astype(jnp.int32),
        cand_valid_seq.astype(f32),
        dts.astype(f32),
        ba,
        state.x.astype(f32),
        state.P.astype(f32),
        state.initialized.astype(f32),
        state.prev_pos.astype(f32),
        state.lpf_heading.astype(f32),
        state.lpf_vel.astype(f32),
        state.age.astype(f32),
    )
    pos, vel, heading, valid = outs[:4]
    new_state = KalmanState(
        x=outs[4], P=outs[5], initialized=outs[6] > 0.5,
        prev_pos=outs[7], lpf_heading=outs[8], lpf_vel=outs[9],
        age=outs[10])
    tracked = TrackedObjects(pos=pos, vel=vel, heading=heading,
                             valid=valid > 0.5)
    return new_state, tracked
