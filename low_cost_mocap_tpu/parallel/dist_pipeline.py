"""Camera-sharded LIVE pipeline: the multi-chip per-frame step.

Frames are the big data in this system (C x H x W per frame-set); every
later stage works on a few hundred floats.  So the multi-chip layout for
the live path is: shard the frame tensor and blob detection over a
``cam`` mesh axis (each device ingests + detects only its cameras —
per-device HBM traffic and host->device bandwidth drop by the axis
size), ``all_gather`` the detected centroids (C*K*3 floats — tens of
microseconds of ICI), and run the tiny correspondence/fit/tracker tail
replicated on every device (cheaper than the collectives a sharded tail
would need; outputs come out replicated, so any host can read them).

This is the live-path counterpart of the distributed BA
(``parallel/schur_ba.py``) and temporal sharding (``parallel/temporal``):
SURVEY.md §2.4's "camera-sharded frame pipeline" row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from low_cost_mocap_tpu.config import EngineConfig, RigConfig
from low_cost_mocap_tpu.models.pipeline import track_from_blobs
from low_cost_mocap_tpu.ops import detect


@functools.lru_cache(maxsize=16)
def _compiled_dist_step(mesh: Mesh, axis: str, rig: RigConfig,
                        cfg: EngineConfig, packed: bool, use_pallas: bool,
                        with_obs: bool = False, pack: bool = False):
    """Cache the jitted shard_mapped step per (mesh, rig, cfg, mode).

    ``with_obs``/``pack``: the engine's serving contract — matcher
    observations for live recalibration, outputs packed into one vector
    for the single-transfer readback path."""

    def step(state, frames_local, dt, Ps, K, dist, M, Fs):
        # frames_local: this shard's (C/d, H, W) cameras
        if packed:
            f = detect.unpack_bits(frames_local)
            thr = 0.5
        else:
            f = frames_local.astype(jnp.float32) * (1.0 / 255.0)
            thr = cfg.detect_threshold
        if use_pallas:
            from low_cost_mocap_tpu.ops.detect_pallas import find_blobs_pallas

            blobs_l, valid_l, _ = find_blobs_pallas(
                f, thr, cfg.max_blobs, cc_iters=cfg.cc_iters)
        else:
            blobs_l, valid_l, _ = detect.find_blobs_multi(
                f, thr, cfg.max_blobs, cc_iters=cfg.cc_iters)
        # the ONE collective: centroids + masks for all cameras
        blobs = jax.lax.all_gather(blobs_l, axis, axis=0, tiled=True)
        valid = jax.lax.all_gather(valid_l, axis, axis=0, tiled=True)
        st, out = track_from_blobs(
            state, blobs, valid, dt, Ps, K, dist, M, Fs,
            gate_px=cfg.epipolar_gate_px,
            max_candidates=cfg.max_candidates_per_cam,
            marker_dist1=rig.marker_dist_short,
            marker_dist2=rig.marker_dist_long,
            marker_tol=rig.marker_dist_tol,
            marker_side_min=rig.marker_side_min,
            body_sets=rig.body_sets_resolved(),
            kalman_report=cfg.kalman_report,
            with_obs=with_obs)
        if pack:
            from low_cost_mocap_tpu.models.pipeline import pack_outputs

            return st, pack_outputs(out)
        return st, out

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(), P(), P(), P()),
        out_specs=P(), check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))


def dist_frame_step(mesh: Mesh, state, frames, dt, Ps, K, dist,
                    to_world_matrix, Fs, rig: RigConfig, cfg: EngineConfig,
                    *, axis: str = "cam", packed: bool = False,
                    use_pallas: bool = False):
    """One camera-sharded frame step over ``mesh``.

    frames: (C, H, W) uint8 (or (C, H, W//8) when ``packed``); C must be
    divisible by the ``axis`` size.  Every other argument is replicated.
    Returns the same (state, FrameOutputs) as ``models.pipeline
    .frame_step``, replicated across the mesh.
    """
    step = _compiled_dist_step(mesh, axis, rig, cfg, packed, use_pallas)
    frames_s = jax.device_put(frames, NamedSharding(mesh, P(axis)))
    return step(state, frames_s, dt, Ps, K, dist, to_world_matrix, Fs)


@functools.lru_cache(maxsize=16)
def _compiled_dist_scan_step(mesh: Mesh, axis: str, rig: RigConfig,
                             cfg: EngineConfig, packed: bool,
                             use_pallas: bool = False,
                             with_obs: bool = False):
    """Batched-dispatch x camera-sharded: B frames per program over the
    ``cam`` axis.

    Composition of the two serving scalings: each device ingests +
    detects only its cameras for the WHOLE batch (the (B, C/d) leading
    dims fold into one frame axis, so either detector runs over B*C/d
    frames unvmapped — the Pallas fast path included), ONE pair of
    all_gathers moves the (B, C, K, ...) centroids (still tiny), and the
    replicated tail is ``models.pipeline.scan_track_from_blobs`` —
    frame-parallel geometry, scanned Kalman bank, packed (B, L) rows
    out.  Bit-identical to the single-device batched step (tested)."""
    from low_cost_mocap_tpu.models.pipeline import scan_track_from_blobs

    def step(state, frames_local, dts, Ps, K, dist, M, Fs):
        # frames_local: this shard's (B, C/d, H, W) cameras
        if packed:
            f = detect.unpack_bits(frames_local)
            thr = 0.5
        else:
            f = frames_local.astype(jnp.float32) * (1.0 / 255.0)
            thr = cfg.detect_threshold
        B, Cl, H, W = f.shape
        f = f.reshape(B * Cl, H, W)
        if use_pallas:
            from low_cost_mocap_tpu.ops.detect_pallas import \
                find_blobs_pallas

            blobs_l, valid_l, _ = find_blobs_pallas(
                f, thr, cfg.max_blobs, cc_iters=cfg.cc_iters)
        else:
            blobs_l, valid_l, _ = detect.find_blobs_multi(
                f, thr, cfg.max_blobs, cc_iters=cfg.cc_iters)
        blobs_l = blobs_l.reshape(B, Cl, *blobs_l.shape[1:])
        valid_l = valid_l.reshape(B, Cl, *valid_l.shape[1:])
        # the ONE collective pair: whole batch's centroids + masks
        blobs = jax.lax.all_gather(blobs_l, axis, axis=1, tiled=True)
        valid = jax.lax.all_gather(valid_l, axis, axis=1, tiled=True)
        return scan_track_from_blobs(
            state, blobs, valid, dts, Ps, K, dist, M, Fs,
            gate_px=cfg.epipolar_gate_px,
            max_candidates=cfg.max_candidates_per_cam,
            marker_dist1=rig.marker_dist_short,
            marker_dist2=rig.marker_dist_long,
            marker_tol=rig.marker_dist_tol,
            marker_side_min=rig.marker_side_min,
            body_sets=rig.body_sets_resolved(),
            kalman_report=cfg.kalman_report,
            with_obs=with_obs)

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(None, axis), P(), P(), P(), P(), P(), P()),
        out_specs=P(), check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))


def dist_scan_frame_step(mesh: Mesh, state, frames_b, dts, Ps, K, dist,
                         to_world_matrix, Fs, rig: RigConfig,
                         cfg: EngineConfig, *, axis: str = "cam",
                         packed: bool = False, use_pallas: bool = False,
                         with_obs: bool = False):
    """B camera-sharded frames in ONE program (see _compiled_dist_scan_step).

    frames_b: (B, C, H, W) uint8 (or (B, C, H, W//8) when ``packed``);
    C divisible by the axis size; dts: (B,).  Returns (state, packed
    (B, L) rows) decodable by ``models.pipeline.unpack_outputs`` —
    replicated across the mesh.
    """
    step = _compiled_dist_scan_step(mesh, axis, rig, cfg, packed,
                                    use_pallas, with_obs)
    frames_s = jax.device_put(frames_b,
                              NamedSharding(mesh, P(None, axis)))
    return step(state, frames_s, dts, Ps, K, dist, to_world_matrix, Fs)
