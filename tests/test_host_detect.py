"""Native host-side blob detection (control/native/detect.cc).

The production ingest path detects blobs on the host during threshold+pack
and ships only (K, 2) centroids to the device; results must be bit-identical
to the device detector (ops/detect.py) so the fast path never changes
semantics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from low_cost_mocap_tpu.ops import detect
from low_cost_mocap_tpu.utils import synthetic as syn


@pytest.fixture(scope="module")
def lib():
    from low_cost_mocap_tpu.control import bindings

    try:
        bindings.get_lib()
    except Exception as e:  # pragma: no cover - no toolchain
        pytest.skip(f"native lib unavailable: {e}")
    return bindings


def _random_frames(seed, C=4, H=320, W=320, blobs=6):
    rng = np.random.default_rng(seed)
    frames = np.zeros((C, H, W), np.uint8)
    for c in range(C):
        for _ in range(blobs):
            r, col = rng.integers(2, H - 4), rng.integers(2, W - 4)
            rad = int(rng.integers(1, 4))
            frames[c, r - rad:r + rad + 1, col - rad:col + rad + 1] = \
                rng.integers(100, 255)
    return frames


def test_native_detect_bit_identical_to_device(lib):
    for seed in range(4):
        frames = _random_frames(seed)
        frames[0, 0:2, 0:2] = 200      # corner component
        frames[1, -1, -3:] = 210       # bottom-edge strip
        packed = detect.pack_frames(frames, 0.2)
        cent_n, valid_n, sizes_n = lib.detect_blobs(packed, 320, 320, 8)
        unpacked = detect.unpack_bits(jnp.asarray(packed))
        cent_d, valid_d, sizes_d = map(np.asarray, detect.find_blobs_multi(
            unpacked, 0.5, 8, cc_iters=64))
        np.testing.assert_array_equal(valid_n, valid_d)
        np.testing.assert_array_equal(cent_n, cent_d)
        np.testing.assert_array_equal(sizes_n, sizes_d)


def test_native_detect_empty_and_overflow(lib):
    frames = np.zeros((2, 320, 320), np.uint8)
    packed = detect.pack_frames(frames, 0.2)
    cent, valid, sizes = lib.detect_blobs(packed, 320, 320, 8)
    assert not valid.any() and (sizes == 0).all()

    # more components than slots: first K in raster order win
    frames[0, ::10, ::10] = 255  # 32*32 isolated pixels
    packed = detect.pack_frames(frames, 0.2)
    cent, valid, sizes = lib.detect_blobs(packed, 320, 320, 8)
    assert valid[0].all()
    np.testing.assert_array_equal(cent[0, :, 1], 0.0)   # all row 0
    np.testing.assert_array_equal(cent[0, :, 0], np.arange(8) * 10.0)


def test_weighted_centroids_subpixel_gain(lib):
    """Intensity-weighted centroids recover Gaussian spot centres with
    substantially less error than binary centroids (the sub-pixel option,
    EngineConfig.weighted_centroids)."""
    rng = np.random.default_rng(0)
    H = W = 320
    true_xy = np.stack([rng.uniform(20, 300, 12),
                        rng.uniform(20, 300, 12)], -1)
    frame = np.asarray(syn.render_frames(
        true_xy[:, None, :].astype(np.float32), np.ones((12, 1), bool),
        H, sigma=1.2))
    f_u8 = (frame * 255).astype(np.uint8)
    packed = detect.pack_frames(f_u8, 0.2)
    cb, vb, sb = lib.detect_blobs(packed, H, W, 16)
    cw, vw, sw = lib.detect_blobs(packed, H, W, 16, gray=f_u8)
    # components/ordering/sizes identical — only the centroids move
    np.testing.assert_array_equal(vb, vw)
    np.testing.assert_array_equal(sb, sw)

    def mean_err(cents, valid):
        return np.mean([np.linalg.norm(true_xy - c, axis=1).min()
                        for c, v in zip(cents[0], valid[0]) if v])

    e_bin, e_w = mean_err(cb, vb), mean_err(cw, vw)
    assert vb[0].sum() == 12
    assert e_w < 0.6 * e_bin, (e_bin, e_w)
    assert e_w < 0.1  # sub-0.1-px on clean Gaussian spots


def test_engine_weighted_centroids_runs_close_to_binary():
    """EngineConfig.weighted_centroids: same detections, sub-pixel-shifted
    centroids — reconstructed points stay within a pixel-noise bound of
    the binary path."""
    import jax

    if jax.default_backend() != "cpu":  # pragma: no cover
        pytest.skip("CPU-only parity test")
    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.runtime.engine import Engine
    from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
    from low_cost_mocap_tpu.runtime.sources import SyntheticSource

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    outs = []
    src = SyntheticSource(rig, Rs, ts, num_drones=1, orbit_hz=0.0)
    frames = src.read()
    for weighted in (False, True):
        e = Engine(rig, EngineConfig(weighted_centroids=weighted),
                   SyntheticSource(rig, Rs, ts, num_drones=1),
                   CollectingLink(), fast_path=True, host_detect=True)
        e.set_camera_poses(Rs, ts)
        e.is_capturing_points = True
        e.is_triangulating_points = True
        outs.append(e.process_frame(frames, 1 / 60))
    pv = [np.asarray(o.point_valid) for o in outs]
    np.testing.assert_array_equal(pv[0], pv[1])
    np.testing.assert_allclose(np.asarray(outs[0].object_points)[pv[0]],
                               np.asarray(outs[1].object_points)[pv[1]],
                               atol=5e-3)
    # ...but not identical (the weighting really changed the centroids)
    assert not np.array_equal(np.asarray(outs[0].blob_px),
                              np.asarray(outs[1].blob_px))


def test_engine_host_detect_matches_reference_path():
    """Full engine with host detection reproduces the slow path's outputs."""
    import jax

    if jax.default_backend() != "cpu":  # pragma: no cover
        pytest.skip("CPU-only parity test")
    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.runtime.engine import Engine
    from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
    from low_cost_mocap_tpu.runtime.sources import SyntheticSource

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    src = SyntheticSource(rig, Rs, ts, num_drones=1)
    engines = []
    for kw in (dict(fast_path=False),
               dict(fast_path=True, host_detect=True)):
        e = Engine(rig, cfg, SyntheticSource(rig, Rs, ts, num_drones=1),
                   CollectingLink(), **kw)
        e.set_camera_poses(Rs, ts)
        e.is_capturing_points = True
        e.is_triangulating_points = True
        e.is_locating_objects = True
        engines.append(e)
    assert engines[1]._host_detect

    frames = src.read()
    outs = [e.process_frame(frames, 1 / 60) for e in engines]
    pv = [np.asarray(o.point_valid) for o in outs]
    np.testing.assert_array_equal(pv[0], pv[1])
    np.testing.assert_array_equal(np.asarray(outs[0].blob_px),
                                  np.asarray(outs[1].blob_px))
    np.testing.assert_allclose(np.asarray(outs[0].object_points)[pv[0]],
                               np.asarray(outs[1].object_points)[pv[1]],
                               atol=1e-5)


def test_dispatch_batch_bit_identical_to_per_frame():
    """Batched-dispatch serving (EngineConfig.dispatch_batch) emits the
    SAME outputs as per-frame dispatch over the same frame sequence — one
    scan program vs B single steps, tracker state carried identically."""
    import jax

    if jax.default_backend() != "cpu":  # pragma: no cover
        pytest.skip("CPU-only parity test")
    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.runtime.engine import Engine
    from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
    from low_cost_mocap_tpu.runtime.sources import SyntheticSource

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    B = 4
    src = SyntheticSource(rig, Rs, ts, num_drones=1)
    frames_seq = [np.array(src.read()) for _ in range(2 * B)]

    events = []
    for cfg in (EngineConfig(), EngineConfig(dispatch_batch=B),
                EngineConfig(dispatch_batch=B, readback_pipeline_depth=1),
                EngineConfig(dispatch_batch=B, batch_emit_thread=True)):
        e = Engine(rig, cfg, SyntheticSource(rig, Rs, ts, num_drones=1),
                   CollectingLink(), fast_path=True, host_detect=True)
        if cfg.dispatch_batch > 1:
            assert e._step_scan is not None
        e.set_camera_poses(Rs, ts)
        e.is_capturing_points = True
        e.is_triangulating_points = True
        e.is_locating_objects = True
        got = []
        e.on("object-points", got.append)
        rets = [e.process_frame(f, 1 / 60) for f in frames_seq]
        if cfg.batch_emit_thread:
            # worker decodes/emits asynchronously; flush waits for drain
            e.flush_batches()
            e.stop()        # retires the worker thread
        elif cfg.dispatch_batch > 1 and cfg.readback_pipeline_depth > 0:
            # pipelined decode lags one batch; flush drains + emits it
            assert len(got) == B
            e.flush_batches()
        events.append(got)
        if (cfg.dispatch_batch > 1 and cfg.readback_pipeline_depth == 0
                and not cfg.batch_emit_thread):
            # outputs appear only when a batch completes
            assert [r is None for r in rets] == \
                [(i + 1) % B != 0 for i in range(2 * B)]
    assert all(len(ev) == 2 * B for ev in events)
    for ref_ev in events[1:]:
        for a, b in zip(events[0], ref_ev):
            np.testing.assert_array_equal(
                np.asarray(a["object_points"]),
                np.asarray(b["object_points"]))
            assert a["filtered_objects"] == b["filtered_objects"]
            assert a["objects"] == b["objects"]


def test_packed_ingest_matches_triple_form(lib):
    """ingest_detect_packed == ingest_detect repacked, on every layout.

    The packed entry (control/native/detect.cc lcm_ingest_detect_packed)
    writes the (..., K, 3) [x, y, valid] device-upload tensor directly —
    bench.py and the batched-dispatch path depend on it being
    bit-identical to the (cent, valid, sizes) triple form.
    """
    frames = _random_frames(11, C=4, H=96, W=128)
    batch = np.stack([_random_frames(s, C=4, H=96, W=128)
                      for s in range(3)])
    K = 12
    for weighted in (False, True):
        for f in (frames, batch):
            got = lib.ingest_detect_packed(f, 90, K, weighted=weighted)
            assert got.shape == f.shape[:-2] + (K, 3)
            flat = f.reshape(-1, *f.shape[-2:])
            for i, g in enumerate(got.reshape(-1, K, 3)):
                cent, val, _ = lib.ingest_detect(
                    flat[i][None], 90, K, weighted=weighted)
                np.testing.assert_array_equal(g[:, :2], cent[0])
                np.testing.assert_array_equal(g[:, 2] > 0.5, val[0])
    # caller-owned buffer reuse (the double-buffered batch path)
    buf = np.empty((3, 4, K, 3), np.float32)
    out = lib.ingest_detect_packed(batch, 90, K, out=buf)
    assert out is buf
    np.testing.assert_array_equal(
        buf, lib.ingest_detect_packed(batch, 90, K))
    # threshold above uint8 range -> all-invalid, zeroed
    assert not lib.ingest_detect_packed(frames, 256, K).any()
