"""Bit-packed binary ingest: parity with the full-frame path."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.config import EngineConfig
from low_cost_mocap_tpu.models.pipeline import frame_step
from low_cost_mocap_tpu.ops import detect, kalman
from low_cost_mocap_tpu.ops import camera as cam_ops
from low_cost_mocap_tpu.utils import synthetic as syn


def test_unpack_bits_roundtrip():
    rng = np.random.default_rng(0)
    frames = (rng.random((3, 64, 64)) > 0.8).astype(np.uint8)
    packed = np.packbits(frames.astype(bool), axis=-1)
    un = np.asarray(detect.unpack_bits(jnp.asarray(packed)))
    np.testing.assert_array_equal(un, frames.astype(np.float32))


def test_packed_pipeline_matches_full_frame():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    e = EngineConfig()
    rng = np.random.default_rng(1)
    X = syn.random_points(rng, 6)
    pts, mask = syn.observe(X, Rs, ts, rig)
    frames = (syn.render_frames(pts, mask, rig.image_size, sigma=0.8)
              * 255).astype(np.uint8)

    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    M = jnp.eye(4)
    kw = dict(threshold=e.detect_threshold, max_blobs=e.max_blobs,
              cc_iters=e.cc_iters, gate_px=e.epipolar_gate_px,
              max_candidates=e.max_candidates_per_cam,
              marker_dist1=rig.marker_dist_short,
              marker_dist2=rig.marker_dist_long,
              marker_tol=rig.marker_dist_tol,
              marker_side_min=rig.marker_side_min,
              do_preprocess=False)

    st_full = kalman.init_state(rig.num_objects)
    _, out_full = frame_step(st_full, jnp.asarray(frames), 1 / 60, Ps, K,
                             dist, M, **kw)

    packed = detect.pack_frames(frames, e.detect_threshold)
    st_p = kalman.init_state(rig.num_objects)
    _, out_p = frame_step(st_p, jnp.asarray(packed), 1 / 60, Ps, K, dist, M,
                          packed_input=True, **kw)

    # identical blob sets (host threshold == device threshold on these
    # noise-free frames) -> identical reconstructions
    np.testing.assert_array_equal(np.asarray(out_full.blob_valid),
                                  np.asarray(out_p.blob_valid))
    np.testing.assert_allclose(np.asarray(out_full.blob_px),
                               np.asarray(out_p.blob_px), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_full.object_points),
                               np.asarray(out_p.object_points), atol=1e-4)


def test_pack_frames_matches_float_threshold_exactly():
    # the uint8-cutoff fast path (native SIMD) must reproduce the device
    # path's float32 thresholding bit-for-bit, including edge pixel values
    edge = np.arange(256, dtype=np.uint8).reshape(1, 2, 128)
    rng = np.random.default_rng(2)
    noise = (rng.random((3, 32, 64)) * 255).astype(np.uint8)
    for t in list(np.linspace(0.0, 1.001, 53)) + [0.2]:
        for f in (edge, noise):
            ref = np.packbits(
                (f.astype(np.float32) * np.float32(1 / 255.0))
                > np.float32(t), axis=-1)
            np.testing.assert_array_equal(detect.pack_frames(f, float(t)),
                                          ref, err_msg=f"t={t}")


def test_pack_frames_odd_width_fallback():
    rng = np.random.default_rng(3)
    f = (rng.random((2, 16, 44)) * 255).astype(np.uint8)  # 44 % 8 != 0
    ref = np.packbits(
        (f.astype(np.float32) * np.float32(1 / 255.0)) > np.float32(0.2),
        axis=-1)
    np.testing.assert_array_equal(detect.pack_frames(f, 0.2), ref)


def test_sparse_ingest_roundtrip_and_overflow():
    rng = np.random.default_rng(4)
    frames = ((rng.random((3, 32, 64)) > 0.97) * 255).astype(np.uint8)
    idx, ok, packed = detect.sparse_ingest(frames, 0.2, budget=4096)
    assert ok
    dense_from_idx = np.asarray(detect.scatter_pixels(
        jnp.asarray(idx), frames.shape))
    dense_from_bits = np.asarray(detect.unpack_bits(jnp.asarray(packed)))
    np.testing.assert_array_equal(dense_from_idx, dense_from_bits)
    # indices are the lit pixels, in raster order
    lit = np.flatnonzero(frames.reshape(-1) >= 52)
    np.testing.assert_array_equal(idx[:lit.size], lit)
    assert (idx[lit.size:] == np.iinfo(np.int32).max).all()

    # overflow: more lit pixels than budget -> ok=False, packed still usable
    idx2, ok2, packed2 = detect.sparse_ingest(frames, 0.2, budget=4)
    assert not ok2
    np.testing.assert_array_equal(packed2, packed)


def test_sparse_pipeline_matches_packed():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    e = EngineConfig()
    rng = np.random.default_rng(5)
    X = syn.random_points(rng, 6)
    pts, mask = syn.observe(X, Rs, ts, rig)
    frames = (syn.render_frames(pts, mask, rig.image_size, sigma=0.8)
              * 255).astype(np.uint8)

    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    M = jnp.eye(4)
    kw = dict(threshold=e.detect_threshold, max_blobs=e.max_blobs,
              cc_iters=e.cc_iters, gate_px=e.epipolar_gate_px,
              max_candidates=e.max_candidates_per_cam,
              marker_dist1=rig.marker_dist_short,
              marker_dist2=rig.marker_dist_long,
              marker_tol=rig.marker_dist_tol,
              marker_side_min=rig.marker_side_min,
              do_preprocess=False)

    packed = detect.pack_frames(frames, e.detect_threshold)
    st_p = kalman.init_state(rig.num_objects)
    _, out_p = frame_step(st_p, jnp.asarray(packed), 1 / 60, Ps, K, dist, M,
                          packed_input=True, **kw)

    idx, ok, _ = detect.sparse_ingest(frames, e.detect_threshold,
                                      e.sparse_budget)
    assert ok
    st_s = kalman.init_state(rig.num_objects)
    _, out_s = frame_step(st_s, jnp.asarray(idx), 1 / 60, Ps, K, dist, M,
                          sparse_input=True, image_shape=frames.shape, **kw)

    np.testing.assert_array_equal(np.asarray(out_p.blob_valid),
                                  np.asarray(out_s.blob_valid))
    np.testing.assert_array_equal(np.asarray(out_p.blob_px),
                                  np.asarray(out_s.blob_px))
    np.testing.assert_array_equal(np.asarray(out_p.object_points),
                                  np.asarray(out_s.object_points))


def test_ingest_detect_packed_rejects_nonpositive_max_blobs():
    from low_cost_mocap_tpu.control.bindings import ingest_detect_packed
    frames = np.zeros((2, 16, 16), np.uint8)
    for bad in (0, -1):
        with pytest.raises(ValueError, match="max_blobs"):
            ingest_detect_packed(frames, 50, bad)
