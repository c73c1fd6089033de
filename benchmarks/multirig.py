"""Multi-rig serving throughput: R capture volumes batched per dispatch.

The live per-frame device tail is ~50 us while one dispatch through a
remote device link costs ~250 us — so a single chip serving ONE rig at
camera rate idles >80 % of the time.  ``batched_track_from_blobs`` runs R
rigs' steps in one compiled program: host ingest (native detection) stays
per-rig, the dispatch is shared.  This measures aggregate frames/s and
the per-rig rate as R grows.

Usage: python benchmarks/multirig.py [R ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(rig_counts):
    import jax
    import jax.numpy as jnp

    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.control.bindings import ingest_detect_packed
    from low_cost_mocap_tpu.models.pipeline import (
        batched_track_from_blobs, make_init_state)
    from low_cost_mocap_tpu.ops import camera as cam_ops
    from low_cost_mocap_tpu.ops.correspond import _pairwise_fundamentals
    from low_cost_mocap_tpu.ops.detect import threshold_cutoff
    from low_cost_mocap_tpu.utils import synthetic as syn

    cfg = EngineConfig()
    dev = jax.devices()[0]

    for R in rig_counts:
        rigs = []
        for r in range(R):
            Rs, ts, rig = syn.ring_rig(num_cameras=4,
                                       radius=1.8 + 0.1 * (r % 4))
            rng = np.random.default_rng(r)
            X = syn.random_points(rng, 8)
            pts, mask = syn.observe(X, Rs, ts, rig)
            frames = (np.asarray(syn.render_frames(
                pts, mask, rig.image_size, sigma=0.8)) * 255).astype(np.uint8)
            K = jnp.asarray(rig.K_stack())
            dist = jnp.asarray(rig.dist_stack())
            Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs),
                                           jnp.asarray(ts))
            rigs.append((rig, frames, Ps, K, dist,
                         _pairwise_fundamentals(Ps)))
        rig0 = rigs[0][0]
        C, H, W = rigs[0][1].shape
        kw = dict(gate_px=cfg.epipolar_gate_px,
                  max_candidates=cfg.max_candidates_per_cam,
                  marker_dist1=rig0.marker_dist_short,
                  marker_dist2=rig0.marker_dist_long,
                  marker_tol=rig0.marker_dist_tol,
                  marker_side_min=rig0.marker_side_min)
        step = jax.jit(functools.partial(
            lambda st, p, *a, **k: batched_track_from_blobs(
                st, p[..., :2], p[..., 2] > 0.5, *a, **k), **kw),
            donate_argnums=(0,))

        frames_all = np.stack([f for _, f, *_ in rigs])  # (R, C, H, W)

        cutoff = threshold_cutoff(cfg.detect_threshold)

        def ingest():
            # fused native detection straight into the (R, C, K, 3)
            # upload layout — one FFI call for all R rigs' frame sets
            return ingest_detect_packed(frames_all, cutoff, cfg.max_blobs)

        states = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[make_init_state(rig0) for _ in range(R)])
        stack = lambda i: jnp.stack([rg[i] for rg in rigs])
        Ms = jnp.tile(jnp.eye(4, dtype=jnp.float32), (R, 1, 1))
        dts = jnp.full((R,), 1.0 / 60.0)
        args = (stack(2), stack(3), stack(4), Ms, stack(5))

        states, out = step(states, ingest(), dts, *args)
        jax.block_until_ready(out)
        N, best = 200, float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(N):
                states, out = step(states, ingest(), dts, *args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / N)
        print(f"R={R:3d} rigs ({dev.platform}/{dev.device_kind}): "
              f"{1.0 / best:7.0f} dispatches/s -> "
              f"{R / best:8.0f} aggregate frames/s "
              f"({R / best / R:6.0f} fps/rig)")


if __name__ == "__main__":
    main([int(x) for x in sys.argv[1:]] or [1, 4, 16, 64])
