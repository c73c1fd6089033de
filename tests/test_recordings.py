"""Recording save/replay + engine fast path + reference-mode BA coverage."""

import numpy as np
import jax.numpy as jnp
import pytest

from low_cost_mocap_tpu.config import EngineConfig
from low_cost_mocap_tpu.runtime.engine import Engine, camera_poses_to_serializable
from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
from low_cost_mocap_tpu.runtime.sources import RecordedSource, SyntheticSource
from low_cost_mocap_tpu.utils import recordings, synthetic as syn


def test_recording_roundtrip(tmp_path):
    p = str(tmp_path / "rec.npz")
    recordings.record_synthetic(p, num_cameras=2, T=6, image_size=96)
    frames, fps, meta, truth = recordings.load_recording(p)
    assert frames.shape == (6, 2, 96, 96)
    assert fps == 60.0
    assert meta["num_cameras"] == 2
    assert truth.shape == (6, 1, 3)


def test_recorded_source_replays_and_loops(tmp_path):
    p = str(tmp_path / "rec.npz")
    recordings.record_synthetic(p, num_cameras=2, T=4, image_size=96)
    src = RecordedSource(p)
    first = src.read()
    for _ in range(3):
        src.read()
    again = src.read()  # looped back to frame 0
    np.testing.assert_array_equal(first, again)


def test_recorded_sequence_through_engine(tmp_path):
    p = str(tmp_path / "rec.npz")
    recordings.record_synthetic(p, num_cameras=4, T=8)
    frames, fps, meta, truth = recordings.load_recording(p)
    src = RecordedSource(p)
    from low_cost_mocap_tpu.config import RigConfig

    rig = RigConfig(num_cameras=4)
    eng = Engine(rig, EngineConfig(), src, CollectingLink())
    Rs = np.asarray(meta["camera_Rs"], np.float32)
    ts = np.asarray(meta["camera_ts"], np.float32)
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist()})
    got = []
    eng.on("object-points", got.append)
    for _ in range(8):
        eng.process_frame(src.read(), 1 / fps)
    assert len(got) == 8
    assert all(len(g["object_points"]) >= 3 for g in got)


def test_engine_fast_path_matches_slow_path():
    """fast_path (packed ingest) and the plain path emit identical points."""
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    poses = camera_poses_to_serializable(Rs, ts)

    outs = {}
    for fast in (False, True):
        src = SyntheticSource(rig, Rs, ts, num_drones=1, orbit_hz=0.0)
        eng = Engine(rig, cfg, src, CollectingLink(), fast_path=fast)
        # fast path uses Pallas only off-CPU; force packed-ingest-only here
        eng.handle("triangulate-points", {
            "startOrStop": "start", "cameraPoses": poses,
            "toWorldCoordsMatrix": np.eye(4).tolist()})
        frames = src.read()
        out = eng.process_frame(frames, 1 / 60)
        outs[fast] = out

    pv0 = np.asarray(outs[False].point_valid)
    pv1 = np.asarray(outs[True].point_valid)
    np.testing.assert_array_equal(pv0, pv1)
    np.testing.assert_allclose(np.asarray(outs[False].object_points),
                               np.asarray(outs[True].object_points),
                               atol=1e-4)


def test_annotated_frame_strip():
    Rs, ts, rig = syn.ring_rig(num_cameras=2)
    src = SyntheticSource(rig, Rs, ts, num_drones=1, orbit_hz=0.0)
    eng = Engine(rig, EngineConfig(), src, CollectingLink())
    eng.handle("capture-points", {"startOrStop": "start"})
    frames = src.read()
    eng.process_frame(frames, 1 / 60)
    strip = eng.latest_frame_strip()
    assert strip.shape == (rig.image_size, 2 * rig.image_size)
    # crosshairs drawn: more saturated pixels than the raw montage
    raw = np.hstack(list(frames))
    assert (strip == 255).sum() > (raw == 255).sum()


def test_epiline_overlay_during_triangulation():
    """During triangulation the stream paints each root point's epilines
    into the other cameras' tiles (reference: helpers.py:363-368 +
    drawlines at :497-504); host-side only, not on the jitted path."""
    from low_cost_mocap_tpu.runtime.engine import camera_poses_to_serializable

    Rs, ts, rig = syn.ring_rig(num_cameras=2)
    src = SyntheticSource(rig, Rs, ts, num_drones=1, orbit_hz=0.0)
    eng = Engine(rig, EngineConfig(), src, CollectingLink())
    eng.handle("capture-points", {"startOrStop": "start"})
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist()})
    frames = src.read()
    out = eng.process_frame(frames, 1 / 60)
    strip = eng.latest_frame_strip()
    H = W = rig.image_size

    # expected epiline of camera 0's first valid blob in camera 1's tile
    blobs = np.asarray(out.blob_px)
    bvalid = np.asarray(out.blob_valid)
    k = int(np.where(bvalid[0])[0][0])
    F = np.asarray(eng._F)
    a, b, c = F[0, 1] @ np.array([blobs[0, k, 0], blobs[0, k, 1], 1.0])
    if abs(b) >= abs(a):
        xs = np.linspace(0, W - 1, 200)
        ys = -(c + a * xs) / b
    else:
        ys = np.linspace(0, H - 1, 200)
        xs = -(c + b * ys) / a
    m = (ys >= 0) & (ys <= H - 1) & (xs >= 0) & (xs <= W - 1)
    assert m.sum() > 20   # the line crosses the tile
    xi = xs[m].astype(int) + W   # camera 1's tile
    yi = ys[m].astype(int)
    lit = strip[yi, xi] >= 150
    assert lit.mean() > 0.8, lit.mean()

    # no overlay when triangulation is off
    eng.handle("triangulate-points", {"startOrStop": "stop"})
    eng.process_frame(src.read(), 1 / 60)
    strip2 = eng.latest_frame_strip()
    lit2 = strip2[yi, xi] >= 150
    assert lit2.mean() < 0.5, lit2.mean()


def test_reference_mode_ba_runs():
    """mode='reference' reproduces the reference's residual layout
    (one residual per point = its mean squared error, helpers.py:264-276)."""
    from low_cost_mocap_tpu.ops import ba as ba_ops

    Rs, ts, rig = syn.ring_rig(num_cameras=3)
    rng = np.random.default_rng(5)
    X = syn.random_points(rng, 40)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.3, rng=rng)
    R0, t0 = Rs[0].copy(), ts[0].copy()
    Rs = np.einsum("cij,jk->cik", Rs, R0.T).astype(np.float32)
    ts = (ts - np.einsum("cij,j->ci", Rs, t0)).astype(np.float32)
    r = ba_ops.residuals(
        ba_ops.pack_params(jnp.asarray(Rs), jnp.asarray(ts),
                           jnp.asarray(rig.K_stack()[:, 0, 0])),
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(rig.K_stack()),
        3, "reference")
    assert r.shape == (40,)          # one residual per point
    assert float(jnp.max(r)) < 1.0   # near-perfect poses -> small errors
    res = ba_ops.bundle_adjust(jnp.asarray(pts), jnp.asarray(mask),
                               jnp.asarray(rig.K_stack()), jnp.asarray(Rs),
                               jnp.asarray(ts), num_cameras=3, max_iters=5,
                               mode="reference")
    assert np.isfinite(float(res.cost))


@pytest.mark.slow
def test_offline_sparse_mode_matches_dense():
    """process_recording(sparse=True) must equal the raw-frames path."""
    import jax.numpy as jnp
    from low_cost_mocap_tpu.config import RigConfig
    from low_cost_mocap_tpu.models import offline
    from low_cost_mocap_tpu.ops import camera as cam_ops
    from low_cost_mocap_tpu.ops.detect import sparse_ingest

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    rng = np.random.default_rng(11)
    X0 = syn.random_points(rng, 6)
    T = 12
    frames = []
    for t in range(T):
        X = X0 + 0.05 * np.sin(2 * np.pi * t / T + np.arange(6)[:, None])
        pts, mask = syn.observe(X.astype(np.float32), Rs, ts, rig)
        frames.append(syn.render_frames(pts, mask, rig.image_size, sigma=0.8))
    frames_u8 = (np.stack(frames) * 255).astype(np.uint8)
    enc = [sparse_ingest(f, cfg.detect_threshold, cfg.sparse_budget)
           for f in frames_u8]
    assert all(ok for _, ok, _ in enc)
    idx_seq = np.stack([i for i, _, _ in enc])

    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    M = jnp.eye(4, dtype=jnp.float32)

    dense = offline.process_recording(jnp.asarray(frames_u8), Ps, K, dist, M,
                                      rig, cfg, chunk=3)
    sparse = offline.process_recording(jnp.asarray(idx_seq), Ps, K, dist, M,
                                       rig, cfg, sparse=True, chunk=4)
    np.testing.assert_array_equal(np.asarray(dense.point_valid),
                                  np.asarray(sparse.point_valid))
    np.testing.assert_allclose(np.asarray(dense.object_points),
                               np.asarray(sparse.object_points), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dense.tracked.pos),
                               np.asarray(sparse.tracked.pos), atol=1e-5)

    # host-detected blobs input (control/native/detect.cc): same results,
    # device program starts at undistort+match
    try:
        blobs, bvalid = offline.detect_recording_host(
            frames_u8, cfg.detect_threshold, cfg.max_blobs)
    except Exception as e:  # pragma: no cover - no toolchain
        import pytest

        pytest.skip(f"native lib unavailable: {e}")
    hosted = offline.process_recording(
        (jnp.asarray(blobs), jnp.asarray(bvalid)), Ps, K, dist, M,
        rig, cfg, chunk=4)
    np.testing.assert_array_equal(np.asarray(dense.point_valid),
                                  np.asarray(hosted.point_valid))
    np.testing.assert_allclose(np.asarray(dense.object_points),
                               np.asarray(hosted.object_points), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dense.tracked.pos),
                               np.asarray(hosted.tracked.pos), atol=1e-5)
