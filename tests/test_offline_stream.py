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


def test_streamed_rejects_partial_block(recording):
    frames, Ps, rig, cfg = recording
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    with pytest.raises(ValueError):
        offline.stream_recording(frames[:30], Ps, K, dist, jnp.eye(4),
                                 rig, cfg, block=16)
