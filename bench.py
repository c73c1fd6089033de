"""Benchmark: end-to-end mocap frames/s per chip at 4 cameras.

Measures the flagship per-frame step (blob detect -> epipolar correspond ->
DLT triangulate -> rigid-body fit -> Kalman) on whatever accelerator JAX
gives us, including per-frame host->device frame transfer (the realistic
ingest path).  The reference's operational target is its 150 Hz loop cap on
CPU (``computer_code/api/index.py:40-41``); ``vs_baseline`` is measured fps
against that 150 fps north star (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, args = entry()
    step = jax.jit(fn, donate_argnums=(0,))
    state, frames, dt, Ps, K, dist, M = args
    frames_np = np.asarray(frames)

    # compile + warm up
    state, out = step(state, jnp.asarray(frames_np), dt, Ps, K, dist, M)
    jax.block_until_ready(out)

    n_iters = 300
    t0 = time.perf_counter()
    for _ in range(n_iters):
        fr = jax.device_put(frames_np)          # realistic per-frame ingest
        state, out = step(state, fr, dt, Ps, K, dist, M)
    jax.block_until_ready(out)
    t1 = time.perf_counter()

    fps = n_iters / (t1 - t0)
    print(json.dumps({
        "metric": "mocap_frames_per_s_per_chip_4cam_320px",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 150.0, 3),
    }))


if __name__ == "__main__":
    main()
