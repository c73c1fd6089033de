"""Rectangular (H, W) frames through every ingest path.

The reference's sensor yields 320x240 landscape frames that become
240-wide portrait after its display rot90 and are then PADDED square
(``computer_code/api/helpers.py:71,507-523``), wasting up to ~33% of
detection work on black columns.  ``RigConfig.image_size=(H, W)`` runs
the native rectangle unpadded; these tests prove the rectangular paths
are bit-identical to the square-padded compat mode and consistent across
dense / packed / sparse / host-native ingest.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.config import EngineConfig, RigConfig
from low_cost_mocap_tpu.models.pipeline import MocapPipeline, frame_step
from low_cost_mocap_tpu.ops import detect, kalman
from low_cost_mocap_tpu.ops import camera as cam_ops
from low_cost_mocap_tpu.utils import synthetic as syn

HW = (320, 240)  # the reference's rotated-sensor shape (helpers.py:71)


@pytest.fixture(scope="module")
def scene():
    Rs, ts, rig = syn.ring_rig(num_cameras=4, image_size=HW)
    return Rs, ts, rig


def _render_drone(pos, heading, Rs, ts, rig):
    markers = syn.drone_markers(np.asarray(pos), heading, rig)
    pts, mask = syn.observe(markers, Rs, ts, rig)
    assert mask.all()
    return syn.render_frames(pts, mask, rig.image_size, sigma=0.8), markers


def test_rig_config_rect_shapes(scene):
    _, _, rig = scene
    assert rig.image_hw() == HW
    assert rig.image_size == HW
    K = rig.K_stack()
    np.testing.assert_allclose(K[:, 0, 2], HW[1] / 2.0)  # cx from W
    np.testing.assert_allclose(K[:, 1, 2], HW[0] / 2.0)  # cy from H


def test_rect_pipeline_end_to_end(scene):
    Rs, ts, rig = scene
    pipe = MocapPipeline(rig, EngineConfig(), Rs, ts,
                         preprocess_frames=False)
    state = pipe.init_state()
    frames, markers = _render_drone([0.1, 0.05, 0.6], 0.3, Rs, ts, rig)
    assert frames.shape == (4, *HW)
    for _ in range(5):
        state, out = pipe.step(state, jnp.asarray(frames), 1.0 / 60.0)
    assert np.asarray(out.point_valid).sum() == 3
    from low_cost_mocap_tpu.ops import world as world_ops

    expect = np.asarray(world_ops.to_world(jnp.asarray(markers), jnp.eye(4)))
    got = np.asarray(out.object_points)[np.asarray(out.point_valid)]
    for e in expect:
        assert np.linalg.norm(got - e, axis=1).min() < 5e-3
    assert np.asarray(out.tracked.valid).sum() == 1


def test_rect_bit_parity_with_square_pad_compat(scene):
    """Blob detection on the native rectangle must be bit-identical to the
    reference-compatible square-pad mode (zeros padded right/bottom keep
    pixel coordinates unchanged)."""
    Rs, ts, rig = scene
    rng = np.random.default_rng(0)
    frames, _ = _render_drone([0.05, -0.1, 0.55], 0.2, Rs, ts, rig)
    frames_u8 = (np.clip(frames + rng.normal(scale=0.01, size=frames.shape),
                         0, 1) * 255).astype(np.uint8)
    H, W = HW
    S = max(H, W)
    padded = np.zeros((4, S, S), np.uint8)
    padded[:, :H, :W] = frames_u8

    c_r, v_r, s_r = map(np.asarray, detect.find_blobs_multi(
        jnp.asarray(frames_u8, jnp.float32) / 255.0, 0.2, 8, cc_iters=24))
    c_p, v_p, s_p = map(np.asarray, detect.find_blobs_multi(
        jnp.asarray(padded, jnp.float32) / 255.0, 0.2, 8, cc_iters=24))
    np.testing.assert_array_equal(v_r, v_p)
    np.testing.assert_array_equal(c_r, c_p)
    np.testing.assert_array_equal(s_r, s_p)


def test_rect_native_host_detect_bit_identical(scene):
    from low_cost_mocap_tpu.control import bindings

    try:
        bindings.get_lib()
    except Exception as e:  # pragma: no cover - no toolchain
        pytest.skip(f"native lib unavailable: {e}")

    Rs, ts, rig = scene
    rng = np.random.default_rng(1)
    H, W = HW
    frames = np.zeros((4, H, W), np.uint8)
    for c in range(4):
        for _ in range(6):
            r, col = rng.integers(2, H - 4), rng.integers(2, W - 4)
            rad = int(rng.integers(1, 4))
            frames[c, r - rad:r + rad + 1, col - rad:col + rad + 1] = \
                rng.integers(100, 255)
    frames[0, 0:2, 0:2] = 200
    frames[1, -1, -3:] = 210

    packed = detect.pack_frames(frames, 0.2)
    cent_n, valid_n, sizes_n = bindings.detect_blobs(packed, H, W, 8)
    unpacked = detect.unpack_bits(jnp.asarray(packed))
    assert unpacked.shape == (4, H, W)
    cent_d, valid_d, sizes_d = map(np.asarray, detect.find_blobs_multi(
        unpacked, 0.5, 8, cc_iters=64))
    np.testing.assert_array_equal(valid_n, valid_d)
    np.testing.assert_array_equal(cent_n, cent_d)
    np.testing.assert_array_equal(sizes_n, sizes_d)

    # fused packed-centroid ingest too (the production path)
    out = bindings.ingest_detect_packed(frames, detect.threshold_cutoff(0.2),
                                        8)
    np.testing.assert_array_equal(out[..., 2] > 0.5, valid_d)
    np.testing.assert_array_equal(out[..., :2][valid_d], cent_d[valid_d])


def test_rect_dense_packed_sparse_parity(scene):
    """frame_step over dense / bit-packed / sparse ingest agrees exactly on
    rectangular frames."""
    Rs, ts, rig = scene
    e = EngineConfig()
    frames, _ = _render_drone([0.0, 0.1, 0.6], 0.0, Rs, ts, rig)
    frames_u8 = (frames * 255).astype(np.uint8)

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
              marker_side_min=rig.marker_side_min, do_preprocess=False)

    st = kalman.init_state(rig.num_objects)
    _, out_d = frame_step(st, jnp.asarray(frames_u8), 1 / 60, Ps, K, dist,
                          M, **kw)

    packed = detect.pack_frames(frames_u8, e.detect_threshold)
    st = kalman.init_state(rig.num_objects)
    _, out_p = frame_step(st, jnp.asarray(packed), 1 / 60, Ps, K, dist, M,
                          packed_input=True, **kw)

    idx, ok, _ = detect.sparse_ingest(frames_u8, e.detect_threshold,
                                      e.sparse_budget)
    assert ok
    st = kalman.init_state(rig.num_objects)
    _, out_s = frame_step(st, jnp.asarray(idx), 1 / 60, Ps, K, dist, M,
                          sparse_input=True, image_shape=frames_u8.shape,
                          **kw)

    for a, b in ((out_d, out_p), (out_p, out_s)):
        np.testing.assert_array_equal(np.asarray(a.blob_valid),
                                      np.asarray(b.blob_valid))
        np.testing.assert_array_equal(np.asarray(a.blob_px),
                                      np.asarray(b.blob_px))
        np.testing.assert_array_equal(np.asarray(a.object_points),
                                      np.asarray(b.object_points))


def test_rect_engine_live_tracking(scene):
    from low_cost_mocap_tpu.runtime.engine import (
        Engine, camera_poses_to_serializable)
    from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
    from low_cost_mocap_tpu.runtime.sources import SyntheticSource

    Rs, ts, rig = scene
    source = SyntheticSource(rig, Rs, ts, num_drones=1, orbit_hz=0.0)
    link = CollectingLink()
    eng = Engine(rig, EngineConfig(), source, link)
    events = []
    eng.on("object-points", events.append)
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist()})
    eng.handle("locate-objects", {"startOrStop": "start"})
    hits = 0
    for _ in range(10):
        out = eng.process_frame(source.read(), 1 / 60)
        if out is not None and np.asarray(out.tracked.valid).any():
            hits += 1
    assert hits >= 8
    assert len(events) == 10
