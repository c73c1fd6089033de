"""Offline sequence processing: whole recordings through the pipeline on
device, in one compiled program.

The reference is purely streaming (SURVEY.md §5 — no server-side history);
this module adds the recorded-sequence mode the BASELINE configs evaluate:
a (T, C, H, W) recording maps through the per-frame vision stages with
``vmap`` (frame-parallel) and through the stateful tracker with
``lax.scan`` (sequential), all inside a single jit — no per-frame Python.
For multi-host scale, the vmapped stage shards over a ``time`` mesh axis
(``parallel.temporal.process_sequence``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.config import EngineConfig, RigConfig
from low_cost_mocap_tpu.ops import camera as cam_ops
from low_cost_mocap_tpu.ops import correspond, detect, kalman, rigid, world


class SequenceResult(NamedTuple):
    object_points: jnp.ndarray  # (T, N, 3) world-frame points
    point_valid: jnp.ndarray    # (T, N)
    point_errors: jnp.ndarray   # (T, N)
    objects_pos: jnp.ndarray    # (T, N, 3) raw rigid-body fits
    objects_valid: jnp.ndarray  # (T, N)
    tracked: kalman.TrackedObjects  # (T, O, ...) smoothed drone tracks


def process_recording(frames_seq, Ps, K, dist, to_world_matrix, rig: RigConfig,
                      cfg: EngineConfig, dts=None, packed: bool = False):
    """Run a full recording through vision + tracking in one jit.

    frames_seq: (T, C, H, W) uint8 (or (T, C, H, W//8) when ``packed``).
    dts: (T,) frame intervals (default: 1/target_fps).
    """
    T = frames_seq.shape[0]
    if dts is None:
        dts = jnp.full((T,), 1.0 / cfg.target_fps, jnp.float32)

    def vision(frames):
        if packed:
            f = detect.unpack_bits(frames)
            thr = 0.5
        else:
            f = frames.astype(jnp.float32) * (1.0 / 255.0)
            thr = cfg.detect_threshold
        blobs, bvalid, _ = detect.find_blobs_multi(
            f, thr, cfg.max_blobs, cc_iters=cfg.cc_iters)
        blobs_u = cam_ops.undistort_points(blobs, K[:, None], dist[:, None])
        blobs_u = jnp.where(bvalid[..., None], blobs_u, 0.0)
        m = correspond.match_points(blobs_u, bvalid, Ps,
                                    gate_px=cfg.epipolar_gate_px,
                                    max_candidates=cfg.max_candidates_per_cam)
        pts_w = world.to_world(m["object_points"], to_world_matrix)
        pts_w = jnp.where(m["valid"][:, None], pts_w, 0.0)
        loc = rigid.locate_objects(pts_w, m["errors"], m["valid"],
                                   dist1=rig.marker_dist_short,
                                   dist2=rig.marker_dist_long,
                                   tol=rig.marker_dist_tol,
                                   side_min=rig.marker_side_min,
                                   ax_h1=0, ax_h2=2)
        return pts_w, m["valid"], m["errors"], loc

    @jax.jit
    def run(frames_seq, dts):
        pts_w, pvalid, perr, loc = jax.vmap(vision)(frames_seq)
        st0 = kalman.init_state(rig.num_objects)

        def track_step(st, inp):
            l_pos, l_head, l_idx, l_valid, dt = inp
            st2, out = kalman.update(st, l_pos, l_head, l_idx, l_valid, dt)
            return st2, out

        _, tracked = jax.lax.scan(
            track_step, st0,
            (loc.pos, loc.heading, loc.index, loc.valid, dts))
        return SequenceResult(pts_w, pvalid, perr, loc.pos, loc.valid, tracked)

    return run(frames_seq, dts)
