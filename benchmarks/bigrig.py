"""Large-rig serving throughput: 16 cameras, per-frame and batched.

The reference tops out at 4 PS3-Eye cameras on one USB host
(``computer_code/api/helpers.py:40-44`` enumerates a fixed camera list);
commercial rigs run 12-32.  This measures the full live pipeline at
16 x 320x320 cameras — native host detection, the constant-depth
``assoc`` correspondence matcher (the >5-camera default,
``ops/correspond.py:209``), rigid fit, Kalman — in both serving modes:

- per-frame dispatch (closed-loop mode): one RPC per frame, so the
  tunnel's ~250 us dispatch floor dominates on this link;
- batched dispatch (``EngineConfig.dispatch_batch``): ONE XLA program
  per B frames — geometry vmapped over the batch, Kalman bank scanned
  (``models/pipeline.scan_track_from_blobs``).

Prints one JSON line with both figures.  Accuracy of the assoc path is
validated end-to-end in ``benchmarks/accuracy.py`` (SCALING.md §5); this
file is throughput only.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CAMS = 16
B = 128


def main():
    import jax
    import jax.numpy as jnp

    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.control.bindings import ingest_detect_packed
    from low_cost_mocap_tpu.models.pipeline import (make_init_state,
                                                    pack_outputs,
                                                    scan_track_from_blobs,
                                                    track_from_blobs)
    from low_cost_mocap_tpu.ops import camera as cam_ops
    from low_cost_mocap_tpu.ops.correspond import _pairwise_fundamentals
    from low_cost_mocap_tpu.ops.detect import threshold_cutoff
    from low_cost_mocap_tpu.utils import synthetic as syn

    Rs, ts, rig = syn.ring_rig(num_cameras=N_CAMS)
    e = EngineConfig()
    rng = np.random.default_rng(0)
    X = syn.random_points(rng, 8)
    pts, mask = syn.observe(X, Rs, ts, rig)
    frames = np.asarray(
        syn.render_frames(pts, mask, rig.image_size, sigma=0.8))
    frames_u8 = (frames * 255).astype(np.uint8)
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    Fs = _pairwise_fundamentals(Ps)
    M = jnp.eye(4, dtype=jnp.float32)
    tail = dict(gate_px=e.epipolar_gate_px,
                max_candidates=e.max_candidates_per_cam,
                marker_dist1=rig.marker_dist_short,
                marker_dist2=rig.marker_dist_long,
                marker_tol=rig.marker_dist_tol,
                marker_side_min=rig.marker_side_min)
    cutoff = threshold_cutoff(e.detect_threshold)
    kb = e.max_blobs

    def step_fn(state, packed, dt, *a, **kw):
        st, out = track_from_blobs(state, packed[..., :2],
                                   packed[..., 2] > 0.5, dt, *a, **kw)
        return st, pack_outputs(out)

    step = jax.jit(functools.partial(step_fn, **tail), donate_argnums=(0,))

    def scan_fn(state, packed_b, dts, *a, **kw):
        return scan_track_from_blobs(state, packed_b[..., :2],
                                     packed_b[..., 2] > 0.5, dts, *a, **kw)

    scan_step = jax.jit(functools.partial(scan_fn, **tail),
                        donate_argnums=(0,))

    def ingest():
        return ingest_detect_packed(frames_u8, cutoff, kb)

    dt = jnp.asarray(1.0 / 60.0)
    state = make_init_state(rig)
    state, out = step(state, ingest(), dt, Ps, K, dist, M, Fs)
    jax.block_until_ready(out)

    n_iters, best = 200, float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, out = step(state, ingest(), dt, Ps, K, dist, M, Fs)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    fps = n_iters / best

    def ingest_b():
        out = np.empty((B, N_CAMS, kb, 3), np.float32)
        for i in range(B):
            ingest_detect_packed(frames_u8, cutoff, kb, out=out[i])
        return out

    dts = np.full((B,), 1.0 / 60.0, np.float32)
    bstate = make_init_state(rig)
    bstate, bout = scan_step(bstate, ingest_b(), dts, Ps, K, dist, M, Fs)
    jax.block_until_ready(bout)

    n_disp, best_b = 16, float("inf")
    for _ in range(5):
        nxt = ingest_b()
        t0 = time.perf_counter()
        for _ in range(n_disp):
            bstate, bout = scan_step(bstate, nxt, dts, Ps, K, dist, M, Fs)
            nxt = ingest_b()
        jax.block_until_ready(bout)
        best_b = min(best_b, time.perf_counter() - t0)
    fps_b = n_disp * B / best_b

    # ---- decomposition: where does the per-frame number come from? ----
    # per-frame fps ~ 1 / (host_ingest + max(dispatch_floor, device_tail)):
    # ingest is serial host work before each dispatch; the RPC issue and
    # device compute pipeline against each other.  Separating the three
    # terms makes a congested run self-explanatory (the floor balloons
    # 3-10x under tunnel congestion; the device tail never moves).
    import jax.numpy as _jnp

    trivial = jax.jit(lambda x: x + 1.0)
    z = trivial(_jnp.zeros(())).block_until_ready()
    n = 300
    t0 = time.perf_counter()
    for _ in range(n):
        z = trivial(z)
    jax.block_until_ready(z)
    dispatch_floor_us = (time.perf_counter() - t0) / n * 1e6

    t0 = time.perf_counter()
    for _ in range(200):
        ingest()
    host_ingest_us = (time.perf_counter() - t0) / 200 * 1e6

    # device tail: S per-frame steps scanned in ONE dispatch (sequential
    # semantics, same HLOs as the per-frame program), floor subtracted
    S = 64
    packed_dev = _jnp.asarray(ingest())

    def whole(st, _):
        st, _out = track_from_blobs(st, packed_dev[..., :2],
                                    packed_dev[..., 2] > 0.5, dt,
                                    Ps, K, dist, M, Fs, **tail)
        return st, None

    scan_whole = jax.jit(
        lambda st: jax.lax.scan(whole, st, None, length=S)[0])
    dstate = make_init_state(rig)
    dstate = scan_whole(dstate)
    jax.block_until_ready(dstate)
    best_d = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        dstate = scan_whole(dstate)
        jax.block_until_ready(dstate)
        best_d = min(best_d, time.perf_counter() - t0)
    device_tail_us = max(best_d * 1e6 - dispatch_floor_us, 0.0) / S

    bound = (host_ingest_us
             + max(dispatch_floor_us, device_tail_us)) / 1e6
    print(json.dumps({
        "metric": "bigrig_16cam_frames_per_s",
        "per_frame": round(fps, 1),
        "batched": round(fps_b, 1),
        "dispatch_batch": B,
        "matcher": "assoc",
        "dispatch_floor_us": round(dispatch_floor_us, 1),
        "device_tail_us": round(device_tail_us, 1),
        "host_ingest_us": round(host_ingest_us, 1),
        "per_frame_bound": round(1.0 / bound, 1),
    }))


if __name__ == "__main__":
    main()
