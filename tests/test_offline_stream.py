"""Block-streamed recording processing (models/offline.stream_recording):
bounded memory, carried tracker state, host detect overlapped with device
compute.  Must match the one-shot compiled path."""

import numpy as np
import jax.numpy as jnp
import pytest

from low_cost_mocap_tpu.config import EngineConfig
from low_cost_mocap_tpu.models import offline
from low_cost_mocap_tpu.ops import camera as cam_ops
from low_cost_mocap_tpu.utils import synthetic as syn


@pytest.fixture(scope="module")
def recording():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    T = 64
    frames = []
    for t in range(T):
        pos = np.array([0.3 * np.cos(t / 40), 0.3 * np.sin(t / 40), 0.6],
                       np.float32)
        X = syn.drone_markers(pos, 0.0, rig)
        pts, mask = syn.observe(X, Rs, ts, rig)
        frames.append(syn.render_frames(pts, mask, rig.image_size,
                                        sigma=0.8))
    frames = (np.stack(frames) * 255).astype(np.uint8)
    Ps = cam_ops.projection_matrix(jnp.asarray(rig.K_stack()),
                                   jnp.asarray(Rs), jnp.asarray(ts))
    return frames, Ps, rig, cfg


def test_streamed_matches_oneshot(recording):
    frames, Ps, rig, cfg = recording
    T = frames.shape[0]
    dts = np.full((T,), 1 / 60, np.float32)
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())

    blobs, valid = offline.detect_recording_host(
        frames, cfg.detect_threshold, cfg.max_blobs)
    ref = offline.process_recording((jnp.asarray(blobs),
                                     jnp.asarray(valid)), Ps, K, dist,
                                    jnp.eye(4), rig, cfg,
                                    dts=jnp.asarray(dts))
    got, state = offline.stream_recording(frames, Ps, K, dist, jnp.eye(4),
                                          rig, cfg, dts=dts, block=16)
    np.testing.assert_allclose(np.asarray(got.tracked.pos),
                               np.asarray(ref.tracked.pos), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.tracked.valid),
                                  np.asarray(ref.tracked.valid))
    np.testing.assert_allclose(np.asarray(got.object_points),
                               np.asarray(ref.object_points), atol=1e-4)
    assert state is not None


def test_streamed_state_carries_across_calls(recording):
    frames, Ps, rig, cfg = recording
    T = frames.shape[0]
    dts = np.full((T,), 1 / 60, np.float32)
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())

    one, _ = offline.stream_recording(frames, Ps, K, dist, jnp.eye(4),
                                      rig, cfg, dts=dts, block=16)
    h = T // 2
    a, st = offline.stream_recording(frames[:h], Ps, K, dist, jnp.eye(4),
                                     rig, cfg, dts=dts[:h], block=16)
    b, _ = offline.stream_recording(frames[h:], Ps, K, dist, jnp.eye(4),
                                    rig, cfg, dts=dts[h:], block=16,
                                    state=st)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(a.tracked.pos), np.asarray(b.tracked.pos)]),
        np.asarray(one.tracked.pos), atol=1e-6)


def test_streamed_partial_final_block(recording):
    """Arbitrary T: the padded tail is live-masked inside the SAME
    compiled program — outputs trimmed to T and bit-identical to the
    one-shot path, tracker state identical to the divisible case."""
    frames, Ps, rig, cfg = recording
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    T = 30                                   # 16 + 14: partial tail
    dts = np.full((T,), 1 / 60, np.float32)

    blobs, valid = offline.detect_recording_host(
        frames[:T], cfg.detect_threshold, cfg.max_blobs)
    ref = offline.process_recording(
        (jnp.asarray(blobs), jnp.asarray(valid)), Ps, K, dist, jnp.eye(4),
        rig, cfg, dts=jnp.asarray(dts))
    got, state = offline.stream_recording(
        frames[:T], Ps, K, dist, jnp.eye(4), rig, cfg, dts=dts, block=16)
    assert np.asarray(got.tracked.pos).shape[0] == T
    np.testing.assert_allclose(np.asarray(got.tracked.pos),
                               np.asarray(ref.tracked.pos), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.tracked.valid),
                                  np.asarray(ref.tracked.valid))
    # the pad must not have advanced the carried tracker state: continuing
    # from `state` matches a contiguous run over the same frames
    rest, _ = offline.stream_recording(
        frames[T:48], Ps, K, dist, jnp.eye(4), rig, cfg,
        dts=np.full((18,), 1 / 60, np.float32), block=16, state=state)
    one, _ = offline.stream_recording(
        frames[:48], Ps, K, dist, jnp.eye(4), rig, cfg,
        dts=np.full((48,), 1 / 60, np.float32), block=16)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(got.tracked.pos),
                        np.asarray(rest.tracked.pos)]),
        np.asarray(one.tracked.pos), atol=1e-6)


def test_streamed_body_sets_match_oneshot(recording):
    """Streamed body tracking: per-set BodyTrackState carried across
    blocks — matches process_recording WITH body sets on a
    non-block-divisible T (VERDICT r2 item 4).

    Uses an ASYMMETRIC 4-marker template: the drone's isoceles triple has
    an exact two-fold fit ambiguity (swapping the equal arms mirrors the
    triangle onto itself), so its quats tie-break on float noise that
    differs between the two paths' compiled programs."""
    frames_unused, Ps, rig, cfg = recording
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    from low_cost_mocap_tpu.ops.rigid_general import make_template
    from low_cost_mocap_tpu.utils import synthetic as syn

    BODY = np.array([[0.0, 0.0, 0.0], [0.12, 0.0, 0.0],
                     [0.0, 0.09, 0.0], [0.05, 0.03, 0.06]], np.float32)
    A = np.array([[-1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)
    tmpl = make_template(BODY @ A.T)
    T = 40                                   # 2.5 blocks of 16
    dts = np.full((T,), 1 / 60, np.float32)
    Rs_cams, ts_cams, _ = syn.ring_rig(num_cameras=4)
    frames = []
    for t in range(T):
        c, s = np.cos(0.08 * t), np.sin(0.08 * t)
        Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        pos = np.array([0.3 * np.cos(t / 40), 0.3 * np.sin(t / 40), 0.6],
                       np.float32)
        world = BODY @ Rz.T + pos
        pts, mask = syn.observe(world, Rs_cams, ts_cams, rig)
        frames.append(syn.render_frames(pts, mask, rig.image_size,
                                        sigma=0.8))
    frames = (np.stack(frames) * 255).astype(np.uint8)
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs_cams),
                                   jnp.asarray(ts_cams))

    blobs, valid = offline.detect_recording_host(
        frames[:T], cfg.detect_threshold, cfg.max_blobs)
    ref = offline.process_recording(
        (jnp.asarray(blobs), jnp.asarray(valid)), Ps, K, dist, jnp.eye(4),
        rig, cfg, dts=jnp.asarray(dts), body_sets=((tmpl, 2),))
    got, state = offline.stream_recording(
        frames[:T], Ps, K, dist, jnp.eye(4), rig, cfg, dts=dts, block=16,
        body_sets=((tmpl, 2),))
    assert got.bodies is not None and got.body_tracks is not None
    assert np.asarray(got.bodies.valid).shape == (T, 2)
    assert np.asarray(ref.bodies.valid).any(), "fixture found no bodies"
    np.testing.assert_array_equal(np.asarray(got.bodies.valid),
                                  np.asarray(ref.bodies.valid))
    np.testing.assert_allclose(np.asarray(got.bodies.t),
                               np.asarray(ref.bodies.t), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.body_tracks.valid),
                                  np.asarray(ref.body_tracks.valid))
    np.testing.assert_allclose(np.asarray(got.body_tracks.pos),
                               np.asarray(ref.body_tracks.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.body_tracks.quat),
                               np.asarray(ref.body_tracks.quat), atol=1e-4)
    # carried state has the (KalmanState, (BodyTrackState,)) structure
    assert isinstance(state, tuple) and len(state) == 2
