"""Offline (recorded-sequence) processing throughput on the current backend.

The live loop is dispatch-bound on tunneled links (~1.2 ms/frame of pure
round-trip overhead); recorded sequences amortise dispatch to zero by
mapping the whole (T, C, H, W) recording through vision stages and scanning
the tracker inside ONE jit (models/offline.py).  This measures that mode's
frames/s — the number that matters for batch reprocessing of capture
sessions.

Usage: python benchmarks/offline_throughput.py [T]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(T: int = 512):
    import jax
    import jax.numpy as jnp

    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.models.offline import (detect_recording_host,
                                                   process_recording)
    from low_cost_mocap_tpu.ops import camera as cam_ops
    from low_cost_mocap_tpu.utils import synthetic as syn

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    rng = np.random.default_rng(0)

    # a moving marker cloud rendered into T frame-sets
    X0 = syn.random_points(rng, 8)
    frames = []
    for t in range(T):
        X = X0 + 0.2 * np.sin(2 * np.pi * t / T + np.arange(8)[:, None])
        pts, mask = syn.observe(X.astype(np.float32), Rs, ts, rig)
        frames.append(syn.render_frames(pts, mask, rig.image_size, sigma=0.8))
    frames_u8 = (np.stack(frames) * 255).astype(np.uint8)   # (T, C, H, W)

    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    M = jnp.eye(4, dtype=jnp.float32)

    def run(fr):
        # production offline path: native host detection (one FFI call for
        # the whole recording), device program starts at undistort+match
        blobs, bvalid = detect_recording_host(
            fr, cfg.detect_threshold, cfg.max_blobs)
        return process_recording((jnp.asarray(blobs), jnp.asarray(bvalid)),
                                 Ps, K, dist, M, rig, cfg)

    res = run(frames_u8)                     # compile + warm
    jax.block_until_ready(res.object_points)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = run(frames_u8)
        jax.block_until_ready(res.object_points)
        best = min(best, time.perf_counter() - t0)
    dev = jax.devices()[0]
    print(f"offline throughput ({dev.platform}/{dev.device_kind}): "
          f"{T / best:.0f} frames/s  (T={T}, 4 cams, "
          f"{rig.image_size}x{rig.image_size}, incl. host detect + "
          f"host->device transfer)")

    # block-streamed mode: bounded memory (O(block)), tracker state carried
    # across dispatches, host detect of block i+1 overlapped with block i's
    # device program (models/offline.stream_recording)
    from low_cost_mocap_tpu.models.offline import stream_recording

    for block in (64, 128):
        got, _ = stream_recording(frames_u8, Ps, K, dist, M, rig, cfg,
                                  block=block)                 # warm
        jax.block_until_ready(got.object_points)
        best_s = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            got, _ = stream_recording(frames_u8, Ps, K, dist, M, rig, cfg,
                                      block=block)
            jax.block_until_ready(got.object_points)
            best_s = min(best_s, time.perf_counter() - t0)
        print(f"streamed  throughput (block={block}): "
              f"{T / best_s:.0f} frames/s  (carried state, "
              f"host detect overlapped)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
