"""Reconstruction + tracking accuracy on the synthetic 4-camera rig.

Reproduces the accuracy numbers cited in README.md / benchmarks/SCALING.md
in one run: raw triangulated-marker error, causal tracked-drone ATE with
the reference's statePre reporting ("pre"), with posterior reporting
("post"), and the offline RTS-smoothed ATE — plus the raw-marker error
with intensity-weighted sub-pixel centroids.

Ground truth is exact (synthetic rig, known drone poses); the drone orbits
at ~0.3 m/s at 60 fps, a realistic indoor speed.  Runs on CPU or TPU
(pure accuracy — no timing).

Usage: python benchmarks/accuracy.py [T]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(T: int = 600):
    import jax.numpy as jnp

    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.models import offline
    from low_cost_mocap_tpu.ops import camera as cam_ops
    from low_cost_mocap_tpu.ops import world as world_ops
    from low_cost_mocap_tpu.utils import metrics
    from low_cost_mocap_tpu.utils import synthetic as syn

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    dt = 1.0 / 60.0

    def drone_pos(t):
        return np.array([0.3 * np.cos(t * dt), 0.3 * np.sin(t * dt), 0.6],
                        np.float32)

    frames, centres_w, markers_w = [], [], []
    for t in range(T):
        X = syn.drone_markers(drone_pos(t), 0.0, rig)
        pts, mask = syn.observe(X, Rs, ts, rig)
        frames.append(syn.render_frames(pts, mask, rig.image_size,
                                        sigma=0.8))
        w = np.asarray(world_ops.to_world(jnp.asarray(X), jnp.eye(4)))
        markers_w.append(w)
        centres_w.append((w[0] + w[1]) / 2)
    frames_u8 = (np.stack(frames) * 255).astype(np.uint8)
    centres_w = np.stack(centres_w)
    markers_w = np.stack(markers_w)

    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    M = jnp.eye(4, dtype=jnp.float32)
    dts = jnp.full((T,), dt)

    def marker_err(res):
        """Mean nearest-marker 3D error over valid reconstructed points."""
        es = []
        pv = np.asarray(res.point_valid)
        pw = np.asarray(res.object_points)
        for t in range(T):
            got = pw[t][pv[t]]
            if len(got):
                d = np.linalg.norm(got[:, None] - markers_w[t][None],
                                   axis=-1).min(axis=1)
                es.append(d.mean())
        return float(np.mean(es))

    def tracked_ate(pos, valid):
        d = int(np.argmax(np.asarray(valid).sum(axis=0)))
        v = np.asarray(valid)[10:, d]
        return metrics.ate(np.asarray(pos)[10:, d], centres_w[10:],
                           valid=v)["rmse"]

    cfg = EngineConfig()
    blobs, valid = offline.detect_recording_host(
        frames_u8, cfg.detect_threshold, cfg.max_blobs)
    res = offline.process_recording(
        (jnp.asarray(blobs), jnp.asarray(valid)), Ps, K, dist, M,
        rig, cfg, dts=dts, smooth=True)
    res_post = offline.process_recording(
        (jnp.asarray(blobs), jnp.asarray(valid)), Ps, K, dist, M,
        rig, EngineConfig(kalman_report="post"), dts=dts)

    rows = [
        ("raw markers [binary centroids]", marker_err(res) * 1000,
         "mm mean"),
        ("tracked ATE [kalman_report=pre, reference parity]",
         tracked_ate(res.tracked.pos, res.tracked.valid) * 1000,
         "mm rmse"),
        ("tracked ATE [kalman_report=post]",
         tracked_ate(res_post.tracked.pos, res_post.tracked.valid) * 1000,
         "mm rmse"),
        ("smoothed ATE [offline RTS]",
         tracked_ate(res.smoothed.pos, res.smoothed.valid) * 1000,
         "mm rmse"),
    ]

    # weighted sub-pixel centroids (host-detect path option)
    cfgw = EngineConfig(weighted_centroids=True)
    blobs, valid = offline.detect_recording_host(
        frames_u8, cfgw.detect_threshold, cfgw.max_blobs, weighted=True)
    resw = offline.process_recording(
        (jnp.asarray(blobs), jnp.asarray(valid)), Ps, K, dist, M, rig,
        cfgw, dts=dts)
    rows.append(("raw markers [weighted sub-pixel centroids]",
                 marker_err(resw) * 1000, "mm mean"))

    print(f"accuracy (synthetic 4-cam rig, T={T} @60fps, 0.3 m/s orbit):")
    for name, val, unit in rows:
        print(f"  {name:55s} {val:7.3f} {unit}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600)
