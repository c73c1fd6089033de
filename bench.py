"""Benchmark: end-to-end mocap frames/s per chip at 4 cameras.

Measures the flagship per-frame step (blob detect -> epipolar correspond ->
DLT triangulate -> rigid-body fit -> Kalman) on whatever accelerator JAX
gives us, including per-frame host-side thresholding + host->device
transfer (the realistic ingest path).  The reference's operational target
is its 150 Hz loop cap on CPU (``computer_code/api/index.py:40-41``);
``vs_baseline`` is measured fps against that 150 fps north star
(BASELINE.json).

Ingest is the engine's production fast path (runtime/engine.py): host-side
threshold (native SIMD) + lit-pixel index extraction — 4*budget bytes per
frame-set regardless of resolution — scattered back to a dense binary
image on device, bit-exact vs on-device thresholding.  Transfers are
double-buffered so host->device latency rides under device compute.

Timing: best of 5 windows x 200 frames (the chip-capability number; the
device sits behind a shared tunnel whose congestion jitters individual
windows by 2x, and min-time-per-window is the standard estimator under
one-sided noise).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
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

    from low_cost_mocap_tpu.ops.detect import sparse_ingest

    BUDGET = 2048  # EngineConfig.sparse_budget
    use_pallas = jax.default_backend() != "cpu"
    C, H, W = frames_np.shape
    step = jax.jit(functools.partial(fn, sparse_input=True,
                                     image_shape=(C, H, W),
                                     use_pallas=use_pallas),
                   donate_argnums=(0,))

    def ingest():
        idx, ok, _ = sparse_ingest(frames_np, 0.2, BUDGET)
        assert ok, "benchmark scene exceeded the sparse ingest budget"
        return jax.device_put(idx)

    state, out = step(state, ingest(), dt, Ps, K, dist, M, Fs)
    jax.block_until_ready(out)

    def run_window(state, n_iters):
        # Double-buffered ingest: threshold + start the async host->device
        # transfer of frame n+1 BEFORE dispatching the step on frame n, so
        # transfer latency overlaps the previous frame's device compute.
        t0 = time.perf_counter()
        nxt = ingest()
        for _ in range(n_iters - 1):
            cur = nxt
            nxt = ingest()
            state, out = step(state, cur, dt, Ps, K, dist, M, Fs)
        state, out = step(state, nxt, dt, Ps, K, dist, M, Fs)
        jax.block_until_ready(out)
        return state, time.perf_counter() - t0

    n_iters, best = 200, float("inf")
    for _ in range(5):
        state, elapsed = run_window(state, n_iters)
        best = min(best, elapsed)

    fps = n_iters / best
    print(json.dumps({
        "metric": "mocap_frames_per_s_per_chip_4cam_320px",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 150.0, 3),
    }))


if __name__ == "__main__":
    main()
