"""Benchmark: end-to-end mocap frames/s per chip at 4 cameras.

Measures the flagship per-frame step (blob detect -> epipolar correspond ->
DLT triangulate -> rigid-body fit -> Kalman) on whatever accelerator JAX
gives us, including per-frame host-side thresholding + host->device
transfer (the realistic ingest path).  The reference's operational target
is its 150 Hz loop cap on CPU (``computer_code/api/index.py:40-41``);
``vs_baseline`` is measured fps against that 150 fps north star
(BASELINE.json).

Ingest is the engine's production fast path (runtime/engine.py): host-side
threshold + bit-pack (native SIMD) + native connected-component centroids
(control/native/detect.cc, bit-identical to the device detector) — the
device step starts at track_from_blobs with a ~100-byte centroid upload
that rides the dispatch RPC (no separate device_put; jax's async dispatch
pipelines consecutive frames).

Timing: "value" (per-frame mode) is the max of THREE best-of-5x200-frame
passes and "batched_value" the max of THREE best-of-5x32-dispatch passes,
the passes spread across the bench timeline (compile gaps plus a 45 s
idle gap, skipped under LCM_BENCH_FAST=1) — tunnel congestion comes in
minutes-long bursts, so time-separated passes sample different windows
and min-time/max-rate is the standard estimator under one-sided noise.
"spread"/"batched_spread" report (max-min)/max across the passes, so a
congestion-free figure is distinguishable from a lucky one.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"spread", "batched_value", "batched_unit", "dispatch_batch",
"batched_vs_baseline", "batched_spread"} plus the congestion
decomposition {"dispatch_floor_us", "device_tail_us", "host_ingest_us",
"per_frame_bound", "batched_device_us", "batched_bound"}: per-frame
fps ~= 1/(host_ingest + max(dispatch_floor, device_tail)) and batched
fps ~= 1/max(host_ingest, batched_device).  ``device_tail_us`` is a
scan-derived UPPER bound (a lax.scan of whole steps serializes inter-op
parallelism the flat program overlaps — see SCALING.md §2), so
``per_frame_bound`` is conservative; ``batched_device_us`` includes
per-dispatch issue and reproduces the sustained figure (reconciled
against a profiler trace of on-device exec, SCALING.md §2 round 5).
The floor balloons 3-10x under tunnel congestion while the device terms
never move, so the artifact itself distinguishes weather from
regression even when every throughput pass was congested.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, args = entry()
    state, frames, dt, Ps, K, dist, M, Fs = args
    frames_np = np.asarray(frames)

    from low_cost_mocap_tpu.control.bindings import ingest_detect_packed
    from low_cost_mocap_tpu.models.pipeline import (pack_outputs,
                                                    track_from_blobs)
    from low_cost_mocap_tpu.ops.detect import threshold_cutoff

    C, H, W = frames_np.shape
    # tail kwargs come from the entry() partial so bench stays in sync
    tail_keys = ("gate_px", "max_candidates", "marker_dist1", "marker_dist2",
                 "marker_tol", "marker_side_min")
    tail_kw = {k: fn.keywords[k] for k in tail_keys}
    max_blobs = fn.keywords["max_blobs"]
    threshold = fn.keywords["threshold"]

    def tail(state, packed, *args, **kw):
        # ONE (C, K, 3) upload: xy centroids + validity channel; outputs
        # packed into ONE vector (the engine's production readback layout —
        # ~25 output leaves cost ~3.5 us each of client bookkeeping through
        # the tunnel, measured 85 us/frame saved)
        st, out = track_from_blobs(state, packed[..., :2],
                                   packed[..., 2] > 0.5, *args, **kw)
        return st, pack_outputs(out)

    step = jax.jit(functools.partial(tail, **tail_kw), donate_argnums=(0,))

    cutoff = threshold_cutoff(float(threshold))

    def ingest():
        # fused native threshold+pack+CC straight into the (C, K, 3)
        # device-upload layout — ONE FFI crossing per frame set, no
        # Python-side packing (control/native/detect.cc
        # lcm_ingest_detect_packed).  The host numpy result goes STRAIGHT
        # into the jitted call: the transfer rides the dispatch RPC.  A
        # separate device_put costs a whole extra round trip through the
        # tunnel (~315 us, measured) for a 384-byte payload.
        return ingest_detect_packed(frames_np, cutoff, max_blobs)

    state, out = step(state, ingest(), dt, Ps, K, dist, M, Fs)
    jax.block_until_ready(out)
    # (no separate double-buffer stage: with the transfer riding the
    # dispatch, per-frame cost is one RPC + device compute, pipelined by
    # jax's async dispatch)

    def run_window(state, n_iters):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, out = step(state, ingest(), dt, Ps, K, dist, M, Fs)
        jax.block_until_ready(out)
        return state, time.perf_counter() - t0

    def measure_perframe(state):
        # best-of-5 windows; the pass repeats at several points across the
        # bench's timeline (separated by the batched compile and a
        # deliberate idle gap) so the estimate samples multiple congestion
        # windows of the shared tunnel (bursts last minutes — best-of
        # within one burst can't escape it)
        n_iters, best = 200, float("inf")
        for _ in range(5):
            state, elapsed = run_window(state, n_iters)
            best = min(best, elapsed)
        return state, n_iters / best

    pf_samples = []
    state, fps1 = measure_perframe(state)
    pf_samples.append(fps1)

    # ---- batched-dispatch serving mode (EngineConfig.dispatch_batch) ----
    # ONE XLA program per B frames (models/pipeline.scan_track_from_blobs):
    # the frame-independent geometry (undistort -> match -> DLT -> rigid
    # fit) runs vmapped over the whole batch as large batched ops; only
    # the tiny Kalman bank update rides a lax.scan.  One dispatch + one
    # packed (B, L) readback amortises the ~250 us RPC floor, at B frames
    # of latency.  Host detection still runs per frame (honest per-frame
    # ingest cost) via the packed native entry — straight into the batch
    # buffer, no Python-side packing.  (Measured on-chip round 3: the
    # vmap+scan split beats a scan of whole per-frame steps 1.6x; B=128
    # beats 64; serial ingest beats a 2-worker pool on this 2-core host.)
    B = 128

    from low_cost_mocap_tpu.models.pipeline import scan_track_from_blobs

    def tail_scan(state, packed_b, dt, Ps, K, dist, M, Fs, **kw):
        # the production batched step (frame-parallel geometry vmapped
        # over B, only the Kalman bank scanned — see
        # models/pipeline.scan_track_from_blobs)
        dts = jnp.broadcast_to(jnp.asarray(dt), (packed_b.shape[0],))
        return scan_track_from_blobs(
            state, packed_b[..., :2], packed_b[..., 2] > 0.5, dts,
            Ps, K, dist, M, Fs, **kw)

    scan_step = jax.jit(functools.partial(tail_scan, **tail_kw),
                        donate_argnums=(0,))

    def ingest_b():
        # one frame-set-sized native call per frame (matching the engine,
        # where frame sets arrive one at a time), written straight into a
        # fresh (B, C, K, 3) batch buffer — no np.stack, no per-frame
        # Python packing
        out = np.empty((B, C, max_blobs, 3), np.float32)
        for i in range(B):
            ingest_detect_packed(frames_np, cutoff, max_blobs, out=out[i])
        return out

    bstate, bout = scan_step(state, ingest_b(), dt, Ps, K, dist, M, Fs)
    jax.block_until_ready(bout)

    def run_window_b(st, n_disp):
        nxt = ingest_b()
        t0 = time.perf_counter()
        for _ in range(n_disp):
            st, out = scan_step(st, nxt, dt, Ps, K, dist, M, Fs)
            nxt = ingest_b()     # host detects batch N+1 while the device
            #                      runs batch N (async dispatch)
        jax.block_until_ready(out)
        return st, time.perf_counter() - t0

    def measure_batched(st):
        n_disp, best = 32, float("inf")
        for _ in range(5):
            st, elapsed = run_window_b(st, n_disp)
            best = min(best, elapsed)
        return st, n_disp * B / best

    # Sample each mode at several points across the bench timeline —
    # congestion bursts on the shared tunnel last minutes, so passes are
    # spread over the compile gaps plus one deliberate idle gap.  The
    # reported value is the max across passes (min-time estimator under
    # one-sided noise); ``spread``/``batched_spread`` report
    # (max-min)/max across passes so a congestion-free run is
    # distinguishable from a lucky one (spread small == the figure is
    # reproducible, BENCH_r0N should land within it).
    b_samples = []
    bstate, fb1 = measure_batched(bstate)
    b_samples.append(fb1)

    bstate, fps2 = measure_perframe(bstate)
    pf_samples.append(fps2)

    bstate, fb2 = measure_batched(bstate)
    b_samples.append(fb2)

    if not os.environ.get("LCM_BENCH_FAST"):
        time.sleep(45.0)   # step past a possible congestion burst edge

    bstate, fb3 = measure_batched(bstate)
    b_samples.append(fb3)
    bstate, fps3 = measure_perframe(bstate)
    pf_samples.append(fps3)

    fps = max(pf_samples)
    fps_b = max(b_samples)

    # ---- congestion decomposition (benchmarks/bigrig.py's method) ----
    # per-frame fps ~ 1/(host_ingest + max(dispatch_floor, device_tail)):
    # ingest is serial host work before each dispatch; the RPC issue and
    # device compute pipeline against each other.  batched fps
    # ~ 1/max(host_ingest, batched_device + floor/B).  The floor balloons
    # 3-10x under tunnel congestion; the device terms never move — so
    # this block makes the artifact self-explanatory under bad weather.
    trivial = jax.jit(lambda x: x + 1.0)
    z = trivial(jnp.zeros(())).block_until_ready()
    best_fl = float("inf")
    for _ in range(3):
        n = 300
        t0 = time.perf_counter()
        for _ in range(n):
            z = trivial(z)
        jax.block_until_ready(z)
        best_fl = min(best_fl, (time.perf_counter() - t0) / n)
    dispatch_floor_us = best_fl * 1e6

    best_in = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(200):
            ingest()
        best_in = min(best_in, (time.perf_counter() - t0) / 200)
    host_ingest_us = best_in * 1e6

    # device tail: S whole per-frame steps scanned in ONE dispatch
    # (sequential semantics, same HLOs as the per-frame program), floor
    # subtracted
    S = 64
    packed_dev = jnp.asarray(ingest())

    def whole(st, _):
        st, _out = tail(st, packed_dev, dt, Ps, K, dist, M, Fs, **tail_kw)
        return st, None

    scan_whole = jax.jit(
        lambda st: jax.lax.scan(whole, st, None, length=S)[0])
    dstate = scan_whole(bstate)     # scan_whole does not donate bstate
    jax.block_until_ready(dstate)
    best_d = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        dstate = scan_whole(dstate)
        jax.block_until_ready(dstate)
        best_d = min(best_d, time.perf_counter() - t0)
    device_tail_us = max(best_d * 1e6 - dispatch_floor_us, 0.0) / S

    # batched device time (exec + per-dispatch issue): chained dispatches
    # of the production batched step on a device-resident batch.  The
    # chain must be LONG (32) so the trailing block_until_ready — a full
    # tunnel round trip — amortizes out: at n=8 it inflated the estimate
    # 67 vs 48 us/frame (profiler-traced device exec is 40.8; see
    # SCALING.md §2 round-5 reconciliation).
    batch_dev = jnp.asarray(ingest_b())
    bd_state = scan_step(bstate, batch_dev, dt, Ps, K, dist, M, Fs)[0]
    jax.block_until_ready(bd_state)
    best_bd = float("inf")
    for _ in range(3):
        n_bd = 32
        t0 = time.perf_counter()
        for _ in range(n_bd):
            bd_state, bd_out = scan_step(bd_state, batch_dev, dt,
                                         Ps, K, dist, M, Fs)
        jax.block_until_ready(bd_out)
        best_bd = min(best_bd, (time.perf_counter() - t0) / n_bd)
    batched_device_us = best_bd * 1e6 / B

    pf_bound = 1e6 / (host_ingest_us
                      + max(dispatch_floor_us, device_tail_us))
    b_bound = 1e6 / max(host_ingest_us, batched_device_us)

    def spread(samples):
        return round((max(samples) - min(samples)) / max(samples), 3)

    print(json.dumps({
        "metric": "mocap_frames_per_s_per_chip_4cam_320px",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 150.0, 3),
        "spread": spread(pf_samples),
        "batched_value": round(fps_b, 2),
        "batched_unit": "frames/s",
        "dispatch_batch": B,
        "batched_vs_baseline": round(fps_b / 150.0, 3),
        "batched_spread": spread(b_samples),
        "dispatch_floor_us": round(dispatch_floor_us, 1),
        "device_tail_us": round(device_tail_us, 1),
        "host_ingest_us": round(host_ingest_us, 1),
        "per_frame_bound": round(pf_bound, 1),
        "batched_device_us": round(batched_device_us, 1),
        "batched_bound": round(b_bound, 1),
    }))


if __name__ == "__main__":
    main()
