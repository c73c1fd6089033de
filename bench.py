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
    import functools

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, args = entry()
    state, frames, dt, Ps, K, dist, M = args
    frames_np = np.asarray(frames)

    # Production ingest: host/camera-side threshold + bit-pack (1 bit/px,
    # done inside the timed loop), detection and everything downstream on
    # device.  Host->device bandwidth is the live bottleneck; this is the
    # same trick commercial mocap cameras use (on-camera thresholding).
    from low_cost_mocap_tpu.ops.detect import pack_frames

    use_pallas = jax.default_backend() != "cpu"
    step = jax.jit(functools.partial(fn, packed_input=True,
                                     use_pallas=use_pallas),
                   donate_argnums=(0,))

    packed0 = pack_frames(frames_np, 0.2)
    state, out = step(state, jnp.asarray(packed0), dt, Ps, K, dist, M)
    jax.block_until_ready(out)

    n_iters = 500
    t0 = time.perf_counter()
    for _ in range(n_iters):
        packed = pack_frames(frames_np, 0.2)               # host-side, timed
        state, out = step(state, packed, dt, Ps, K, dist, M)
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
