"""Per-camera failure detection + elastic recovery (runtime/health.py).

The reference leaves camera dropout unhandled (SURVEY.md §5): a stalled
USB pipeline keeps replaying the last buffer and its stale blobs keep
feeding triangulation.  Here the engine detects the frozen transport,
masks the camera out of the rig (tracking continues on the remaining
views), and re-admits it the moment its frames move again.
"""

import numpy as np

from low_cost_mocap_tpu.config import EngineConfig
from low_cost_mocap_tpu.runtime.engine import (
    Engine, camera_poses_to_serializable)
from low_cost_mocap_tpu.runtime.health import (
    DARK, FROZEN, OK, CameraHealthMonitor)
from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
from low_cost_mocap_tpu.runtime.sources import SyntheticSource
from low_cost_mocap_tpu.utils import synthetic as syn


# ------------------------------------------------------------- unit level


def _noise_frames(rng, c=4, s=32):
    return rng.integers(0, 255, size=(c, s, s)).astype(np.uint8)


def test_frozen_detected_and_recovered():
    rng = np.random.default_rng(0)
    mon = CameraHealthMonitor(4, freeze_frames=5)
    frozen_frame = _noise_frames(rng)[1]
    events = []
    for i in range(12):
        frames = _noise_frames(rng)
        frames[1] = frozen_frame               # camera 1 transport stalls
        events += mon.update(frames)
    assert (1, FROZEN) in events
    assert mon.status[1] == FROZEN
    assert mon.frozen_mask.tolist() == [False, True, False, False]
    # stream moves again -> instant recovery
    events = mon.update(_noise_frames(rng))
    assert (1, OK) in events
    assert mon.status == [OK] * 4


def test_static_scene_does_not_trip():
    # a globally static (synthetic/recorded) scene means nothing moves —
    # no camera should be flagged frozen
    frames = _noise_frames(np.random.default_rng(1))
    mon = CameraHealthMonitor(4, freeze_frames=3)
    events = []
    for _ in range(20):
        events += mon.update(frames.copy())
    assert events == []
    assert mon.status == [OK] * 4


def test_dark_camera_advisory():
    mon = CameraHealthMonitor(4, dark_frames=5)
    events = []
    for _ in range(8):
        events += mon.update_blobs(np.array([3, 0, 2, 1]))
    assert (1, DARK) in events
    assert not mon.frozen_mask.any()          # advisory: nothing masked
    events = mon.update_blobs(np.array([3, 2, 2, 1]))
    assert (1, OK) in events

    # all cameras empty (idle scene) is NOT dark — needs >= 2 seeing blobs
    mon2 = CameraHealthMonitor(4, dark_frames=3)
    for _ in range(10):
        assert mon2.update_blobs(np.zeros(4, int)) == []


# ----------------------------------------------------------- engine level


class FreezableSource:
    """Wraps SyntheticSource; when frozen, camera ``cam`` replays its
    last-delivered buffer (exactly what a stalled USB pipeline does)."""

    def __init__(self, inner, cam):
        self.inner = inner
        self.cam = cam
        self.num_cameras = inner.num_cameras
        self.image_size = inner.image_size
        self.frozen = False
        self._stale = None

    def read(self):
        f = self.inner.read()
        if self.frozen and self._stale is not None:
            f[self.cam] = self._stale
        else:
            self._stale = f[self.cam].copy()
        return f

    def set_settings(self, e, g):
        pass

    def close(self):
        pass


def test_engine_masks_frozen_camera_and_recovers():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    # interval=1: this test drives single-frame freeze/recover timing (the
    # production default samples the compare every 4th frame)
    cfg = EngineConfig(health_freeze_frames=4, health_interval=1)
    src = FreezableSource(
        SyntheticSource(rig, Rs, ts, num_drones=1, orbit_hz=0.0), cam=2)
    eng = Engine(rig, cfg, src, CollectingLink())
    health_events, points_events = [], []
    eng.on("camera-health", health_events.append)
    eng.on("object-points", points_events.append)
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist(),
    })
    eng.handle("locate-objects", {"startOrStop": "start"})

    # the orbit is static (orbit_hz=0) but the drone markers still render:
    # give the other cameras per-frame motion via a tiny gain wobble so the
    # "others are changing" guard sees live streams
    for i in range(3):
        src.inner.gain = 10.0 + 0.5 * (i % 2)
        eng.process_frame(src.read(), 1 / 60)
    assert health_events == []

    src.frozen = True
    out = None
    for i in range(10):
        src.inner.gain = 10.0 + 0.5 * (i % 2)
        out = eng.process_frame(src.read(), 1 / 60)
    assert any(e == {"camera": 2, "status": "frozen"}
               for e in health_events)
    # the frozen camera is masked: its blobs are gone from the outputs ...
    assert not np.asarray(out.blob_valid)[2].any()
    # ... and tracking CONTINUES on the remaining 3 cameras
    assert np.asarray(out.tracked.valid).any()
    assert len(points_events[-1]["filtered_objects"]) == 1
    # expected tracked pos: the source's camera-frame pose through the
    # engine's world convention (ops/world.to_world, identity matrix:
    # flip diag(-1,-1,1) then swap y/z)
    exp = (np.asarray(src.inner.drone_pose(0, 0.0)[0])
           * np.array([-1.0, -1.0, 1.0]))[[0, 2, 1]]
    d = np.linalg.norm(np.asarray(points_events[-1]["filtered_objects"][0]
                                  ["pos"]) - exp)
    assert d < 0.05                      # still millimetre-scale tracking

    # transport recovers -> camera rejoins, blobs come back
    src.frozen = False
    for i in range(3):
        src.inner.gain = 10.0 + 0.5 * (i % 2)
        out = eng.process_frame(src.read(), 1 / 60)
    assert any(e == {"camera": 2, "status": "ok"} for e in health_events)
    assert np.asarray(out.blob_valid)[2].any()


def test_masking_copies_never_mutates_source_buffer():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig(health_freeze_frames=2)
    src = FreezableSource(
        SyntheticSource(rig, Rs, ts, num_drones=1, orbit_hz=0.0), cam=0)
    eng = Engine(rig, cfg, src, CollectingLink())
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist(),
    })
    src.frozen = True
    for i in range(6):
        src.inner.gain = 10.0 + 0.5 * (i % 2)
        frames = src.read()
        keep = frames.copy()
        eng.process_frame(frames, 1 / 60)
        # a RecordedSource returns views into its stored array; the engine
        # must mask a copy, not the caller's buffer
        np.testing.assert_array_equal(frames, keep)


def test_frozen_recovery_does_not_flag_dark():
    """Regression: the engine masks a FROZEN camera's blobs, so its zero
    blob counts must not accumulate toward DARK while frozen."""
    rng = np.random.default_rng(7)
    mon = CameraHealthMonitor(4, freeze_frames=3, dark_frames=5)
    frozen_frame = _noise_frames(rng)[1]
    for _ in range(6):
        frames = _noise_frames(rng)
        frames[1] = frozen_frame
        mon.update(frames)
    assert mon.status[1] == FROZEN
    # 20 masked frames: counts for cam 1 are 0 (engine masking)
    for _ in range(20):
        mon.update_blobs(np.array([3, 0, 2, 1]))
    # recover: frames move again, blobs return a few frames later
    events = mon.update(_noise_frames(rng))
    assert (1, OK) in events
    for _ in range(3):
        events = mon.update_blobs(np.array([3, 0, 2, 1]))
        assert (1, DARK) not in events       # lagging counts: no flap
    mon.update_blobs(np.array([3, 2, 2, 1]))
    assert mon.status[1] == OK
