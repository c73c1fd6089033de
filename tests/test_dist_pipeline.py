"""Camera-sharded live step (parallel/dist_pipeline.py) on a virtual mesh."""

import pytest
import functools

import numpy as np
import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.config import EngineConfig, RigConfig
from low_cost_mocap_tpu.models.pipeline import (frame_step, make_init_state)
from low_cost_mocap_tpu.ops.correspond import _pairwise_fundamentals
from low_cost_mocap_tpu.ops import camera as cam_ops
from low_cost_mocap_tpu.parallel import mesh as mesh_lib
from low_cost_mocap_tpu.parallel.dist_pipeline import dist_frame_step
from low_cost_mocap_tpu.utils import synthetic as syn


@pytest.mark.slow
def test_cam_sharded_step_matches_single_device():
    Rs, ts, rig = syn.ring_rig(num_cameras=8)
    cfg = EngineConfig()
    rng = np.random.default_rng(0)
    X = np.concatenate([
        syn.drone_markers(np.array([0.1, -0.1, 0.9], np.float32), 0.4, rig),
        syn.random_points(rng, 3),
    ])
    pts, mask = syn.observe(X, Rs, ts, rig)
    frames = syn.render_frames(pts, mask, rig.image_size, sigma=0.8)
    frames_u8 = (np.asarray(frames) * 255).astype(np.uint8)
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    Fs = _pairwise_fundamentals(Ps)
    M = jnp.eye(4, dtype=jnp.float32)
    dt = jnp.asarray(1.0 / 60.0)

    # single-device reference
    ref_fn = jax.jit(functools.partial(
        frame_step,
        threshold=cfg.detect_threshold, max_blobs=cfg.max_blobs,
        cc_iters=cfg.cc_iters, gate_px=cfg.epipolar_gate_px,
        max_candidates=cfg.max_candidates_per_cam,
        marker_dist1=rig.marker_dist_short,
        marker_dist2=rig.marker_dist_long,
        marker_tol=rig.marker_dist_tol,
        marker_side_min=rig.marker_side_min, do_preprocess=False))
    _, ref = ref_fn(make_init_state(rig), jnp.asarray(frames_u8), dt,
                    Ps, K, dist, M, Fs)

    for d in (2, 4, 8):
        m = mesh_lib.make_mesh({"cam": d}, devices=jax.devices()[:d])
        _, out = dist_frame_step(m, make_init_state(rig),
                                 jnp.asarray(frames_u8), dt, Ps, K, dist,
                                 M, Fs, rig, cfg)
        assert np.array_equal(np.asarray(out.blob_valid),
                              np.asarray(ref.blob_valid)), d
        assert np.abs(np.asarray(out.blob_px)
                      - np.asarray(ref.blob_px)).max() < 1e-5, d
        assert np.array_equal(np.asarray(out.point_valid),
                              np.asarray(ref.point_valid)), d
        pv = np.asarray(ref.point_valid)
        assert np.abs((np.asarray(out.object_points)
                       - np.asarray(ref.object_points))[pv]).max() < 1e-4, d
        assert np.array_equal(np.asarray(out.tracked.valid),
                              np.asarray(ref.tracked.valid)), d
        tvalid = np.asarray(ref.tracked.valid)
        assert np.abs((np.asarray(out.tracked.pos)
                       - np.asarray(ref.tracked.pos))[tvalid]).max() < 1e-4, d


@pytest.mark.slow
def test_cam_sharded_batched_scan_matches_single_device():
    """dist_scan_frame_step (batched x cam-sharded) == single-device
    scan_track_from_blobs on the same B-frame batch, at 2 and 4 shards."""
    from low_cost_mocap_tpu.models.pipeline import (scan_track_from_blobs,
                                                    unpack_outputs)
    from low_cost_mocap_tpu.ops import detect
    from low_cost_mocap_tpu.parallel.dist_pipeline import dist_scan_frame_step

    Rs, ts, rig = syn.ring_rig(num_cameras=8)
    cfg = EngineConfig()
    rng = np.random.default_rng(1)
    B = 5
    frames_seq = []
    for t in range(B):
        X = np.concatenate([
            syn.drone_markers(
                np.array([0.1 + 0.02 * t, -0.1, 0.9], np.float32), 0.4, rig),
            syn.random_points(rng, 3),
        ])
        pts, mask = syn.observe(X, Rs, ts, rig)
        frames_seq.append(np.asarray(
            syn.render_frames(pts, mask, rig.image_size, sigma=0.8)))
    frames_b = (np.stack(frames_seq) * 255).astype(np.uint8)
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    Fs = _pairwise_fundamentals(Ps)
    M = jnp.eye(4, dtype=jnp.float32)
    dts = jnp.full((B,), 1.0 / 60.0, jnp.float32)
    tail = dict(gate_px=cfg.epipolar_gate_px,
                max_candidates=cfg.max_candidates_per_cam,
                marker_dist1=rig.marker_dist_short,
                marker_dist2=rig.marker_dist_long,
                marker_tol=rig.marker_dist_tol,
                marker_side_min=rig.marker_side_min,
                kalman_report=cfg.kalman_report)

    # single-device reference: same detection (find_blobs_multi), same tail
    f = jnp.asarray(frames_b).astype(jnp.float32) * (1.0 / 255.0)
    blobs_b, valid_b, _ = jax.vmap(
        lambda fr: detect.find_blobs_multi(
            fr, cfg.detect_threshold, cfg.max_blobs,
            cc_iters=cfg.cc_iters))(f)
    ref_fn = jax.jit(functools.partial(scan_track_from_blobs, **tail))
    _, ref_rows = ref_fn(make_init_state(rig), blobs_b, valid_b, dts,
                         Ps, K, dist, M, Fs)
    ref_rows = np.asarray(ref_rows)

    for d in (2, 4):
        m = mesh_lib.make_mesh({"cam": d}, devices=jax.devices()[:d])
        _, rows = dist_scan_frame_step(
            m, make_init_state(rig), jnp.asarray(frames_b), dts,
            Ps, K, dist, M, Fs, rig, cfg)
        rows = np.asarray(rows)
        assert rows.shape == ref_rows.shape, d
        # bit-exact on the virtual mesh: per-shard detection is the same
        # kernel on the same data, the all-gathered centroids concatenate
        # in camera order, and the replicated tail is the identical HLO
        np.testing.assert_array_equal(rows, ref_rows)
        # decode a row to prove the serving contract holds
        out = unpack_outputs(rows[-1], rig.num_cameras, cfg.max_blobs,
                             rig.num_objects)
        assert out.tracked.valid.any(), d
