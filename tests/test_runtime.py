"""Engine orchestration: mode flags, event surface, serial out."""

import numpy as np
import pytest

from low_cost_mocap_tpu.config import EngineConfig, RigConfig
from low_cost_mocap_tpu.runtime.engine import (
    Engine, camera_poses_to_serializable)
from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
from low_cost_mocap_tpu.runtime.sources import SyntheticSource
from low_cost_mocap_tpu.utils import synthetic as syn


@pytest.fixture(scope="module")
def scene():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig(ransac_iters=128, ba_max_iters=16)
    return Rs, ts, rig, cfg


@pytest.fixture()
def engine(scene):
    Rs, ts, rig, cfg = scene
    source = SyntheticSource(rig, Rs, ts, num_drones=1)
    link = CollectingLink()
    eng = Engine(rig, cfg, source, link)
    return eng, source, link, Rs, ts


def test_capture_mode_emits_image_points(engine):
    eng, source, link, Rs, ts = engine
    events = []
    eng.on("image-points", events.append)
    eng.handle("capture-points", {"startOrStop": "start"})
    assert eng.is_capturing_points
    for _ in range(3):
        eng.process_frame(source.read(), 1 / 60)
    assert len(events) == 3
    assert len(events[0]) == 4  # one [x, y] (or [None, None]) per camera
    assert len(eng.captured_points) == 3
    eng.handle("capture-points", {"startOrStop": "stop"})
    assert not eng.is_capturing_points


def test_idle_mode_processes_nothing(engine):
    eng, source, *_ = engine
    out = eng.process_frame(source.read(), 1 / 60)
    assert out is None
    assert eng.latest_frame_strip() is not None  # display still fed


def test_triangulate_and_locate_with_serial_out(scene):
    # dedicated static-drone source: the shared fixture's orbiting drone
    # makes hit rate wall-clock dependent (blob merges at some view angles)
    Rs, ts, rig, cfg = scene
    source = SyntheticSource(rig, Rs, ts, num_drones=1, orbit_hz=0.0)
    link = CollectingLink()
    eng = Engine(rig, cfg, source, link)
    events = []
    eng.on("object-points", events.append)
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist(),
    })
    eng.handle("locate-objects", {"startOrStop": "start"})
    eng.handle("arm-drone", {"droneArmed": [True, True]})
    # arming sent per-drone armed frames over the wire
    assert link.frames[0].startswith(b"0{")
    n_before = len(link.frames)
    for _ in range(5):
        eng.process_frame(source.read(), 1 / 60)
    assert len(events) == 5
    last = events[-1]
    # >= 3: the drone's LEDs, possibly plus ghost duplicates from unclaimed
    # roots (the reference's matcher has the same property,
    # computer_code/api/helpers.py:377-380 comment)
    assert 3 <= len(last["object_points"]) <= 8
    assert len(last["objects"]) == 1
    assert len(last["filtered_objects"]) == 1
    # pose+vel serial feed for the tracked armed drone, stable identity
    pose_frames = [f for f in link.frames[n_before:] if b'"pos"' in f]
    assert len(pose_frames) == 5
    assert len({f[0:1] for f in pose_frames}) == 1  # index doesn't flap


def test_unknown_event_raises(engine):
    eng, *_ = engine
    with pytest.raises(KeyError):
        eng.handle("no-such-event", {})


def test_set_drone_commands_forward_to_link(engine):
    eng, source, link, *_ = engine
    eng.handle("set-drone-pid", {"droneIndex": 1, "dronePID": list(range(17))})
    eng.handle("set-drone-setpoint", {"droneIndex": 0,
                                      "droneSetpoint": [0.1, 0.2, 0.3]})
    eng.handle("set-drone-trim", {"droneTrim": [1, 2, 3, 4], "droneIndex": 1})
    assert any(b'"pid"' in f and f.startswith(b"1") for f in link.frames)
    assert any(b'"setpoint"' in f and f.startswith(b"0") for f in link.frames)
    assert any(b'"trim"' in f and f.startswith(b"1") for f in link.frames)


@pytest.mark.slow
def test_calibration_through_event_surface(scene):
    """Full operator workflow: capture wand points -> calculate-camera-pose."""
    Rs, ts, rig, cfg = scene
    rng = np.random.default_rng(0)
    # synthesize captured wand sweeps (one dot per camera per frame)
    X = syn.random_points(rng, 60)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.3, rng=rng)
    captured = []
    for n in range(len(X)):
        captured.append([
            pts[n, c].tolist() if mask[n, c] else [None, None]
            for c in range(rig.num_cameras)
        ])

    source = SyntheticSource(rig, Rs, ts, num_drones=0)
    eng = Engine(rig, cfg, source, CollectingLink())
    got = []
    eng.on("camera-pose", got.append)
    eng.handle("calculate-camera-pose", {"cameraPoints": captured})
    # intermediate BA progress events (helpers.py:274 parity) + final result
    assert len(got) >= 2
    assert all(g.get("ba_iters") for g in got[:-1])
    assert got[-1]["error"] < 1.0
    assert len(got[-1]["camera_poses"]) == 4
    assert eng.camera_poses is not None


def test_world_events(engine):
    eng, source, *_ = engine
    got = []
    eng.on("to-world-coords-matrix", got.append)
    # floor: tilted cloud in current world frame
    rng = np.random.default_rng(1)
    xy = rng.normal(size=(40, 2)).astype(np.float32)
    cloud = np.column_stack([xy[:, 0], 0.1 * xy[:, 0] + 0.3, xy[:, 1]])
    eng.handle("acquire-floor", {"objectPoints": [cloud.tolist()]})
    assert len(got) == 1
    # origin
    eng.handle("set-origin", {
        "objectPoint": [0.1, 0.2, 0.3],
        "toWorldCoordsMatrix": eng.to_world_matrix.tolist(),
    })
    assert len(got) == 2
    M = np.asarray(got[1]["to_world_coords_matrix"])
    assert M.shape == (4, 4)


def test_artifacts_roundtrip(tmp_path, scene):
    from low_cost_mocap_tpu.utils.artifacts import (
        Calibration, load_calibration, save_calibration)

    Rs, ts, rig, cfg = scene
    calib = Calibration(Rs=Rs, ts=ts, focals=None,
                        to_world_matrix=np.eye(4, dtype=np.float32),
                        mean_reprojection_error=0.12, scale_applied=True)
    p = str(tmp_path / "calib.json")
    save_calibration(p, calib)
    back = load_calibration(p)
    np.testing.assert_allclose(back.Rs, Rs, atol=1e-6)
    np.testing.assert_allclose(back.ts, ts, atol=1e-6)
    assert back.scale_applied
    assert abs(back.mean_reprojection_error - 0.12) < 1e-9


@pytest.mark.slow
def test_live_body_tracking_agrees_with_triple_locator(scene):
    # configure the drone's own LED triple as a generalized body template
    # (body-frame origin at the arm midpoint, so the 6-DoF t must agree
    # with the triple locator's midpoint position)
    import dataclasses
    import math

    Rs, ts, rig, cfg = scene
    h = math.sqrt(rig.marker_dist_short ** 2
                  - (rig.marker_dist_long / 2) ** 2)
    tri = ((-rig.marker_dist_long / 2, 0.0, 0.0),
           (rig.marker_dist_long / 2, 0.0, 0.0),
           (0.0, h, 0.0))
    rig2 = dataclasses.replace(rig, body_markers=tri, max_bodies=1)
    source = SyntheticSource(rig2, Rs, ts, num_drones=1, orbit_hz=0.0)
    eng = Engine(rig2, cfg, source, CollectingLink())
    events = []
    eng.on("object-points", events.append)
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist(),
    })
    eng.handle("locate-objects", {"startOrStop": "start"})
    for _ in range(3):
        eng.process_frame(source.read(), 1 / 60)
    last = events[-1]
    assert len(last["bodies"]) == 1
    body = last["bodies"][0]
    drone = last["objects"][0]
    assert np.abs(np.asarray(body["t"]) - np.asarray(drone["pos"])).max() \
        < 0.01
    assert body["rms"] < 5e-3
    R = np.asarray(body["R"])
    assert np.abs(R @ R.T - np.eye(3)).max() < 1e-4  # proper pose
    # the temporal tracker locked on and agrees with the per-frame fit
    assert len(last["tracked_bodies"]) == 1
    tb = last["tracked_bodies"][0]
    assert np.abs(np.asarray(tb["pos"]) - np.asarray(body["t"])).max() < 0.01
    Rt = np.asarray(tb["R"])
    assert np.abs(Rt @ Rt.T - np.eye(3)).max() < 1e-4


@pytest.mark.slow
def test_learn_body_template_live(scene):
    """'Create rigid body from capture' over the live event surface: learn
    the drone's own LED triple from triangulated frames, apply it, and the
    engine starts 6-DoF-tracking it without a restart."""
    Rs, ts, rig = scene[0], scene[1], scene[2]
    cfg = scene[3]
    source = SyntheticSource(rig, Rs, ts, num_drones=1, orbit_hz=0.0)
    eng = Engine(rig, cfg, source, CollectingLink())
    events = []
    eng.on("body-template", events.append)
    obj_events = []
    eng.on("object-points", obj_events.append)
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist(),
    })
    eng.handle("learn-body-template", {"startOrStop": "start"})
    for _ in range(6):
        eng.process_frame(source.read(), 1 / 60)
    eng.handle("learn-body-template", {"startOrStop": "stop", "apply": True,
                                       "maxBodies": 1})
    assert len(events) == 1
    tpl = events[0]
    assert tpl["error"] is None
    assert len(tpl["markers"]) == 3          # the drone's LED triple
    assert tpl["applied"]
    # the engine now 6-DoF-tracks the learned body live
    eng.handle("locate-objects", {"startOrStop": "start"})
    for _ in range(3):
        eng.process_frame(source.read(), 1 / 60)
    last = obj_events[-1]
    assert len(last["bodies"]) == 1
    assert last["bodies"][0]["rms"] < 5e-3
    assert len(last["tracked_bodies"]) == 1


@pytest.mark.slow
def test_refine_camera_pose_live(scene):
    """Live recalibration: a slightly-off calibration is refined from the
    matcher's correspondence-resolved observations WHILE tracking runs,
    and per-point reprojection errors drop."""
    Rs, ts, rig, cfg = scene
    rng = np.random.default_rng(7)
    # perturb extrinsics: ~0.01 rad rotations + 1 cm translations
    def small_rot(r):
        a, b, c = r
        Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                       [0, np.sin(a), np.cos(a)]])
        Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0],
                       [-np.sin(b), 0, np.cos(b)]])
        return (Rx @ Ry).astype(np.float32)
    Rs_p = np.stack([small_rot(rng.normal(scale=0.01, size=3)) @ R
                     for R in Rs]).astype(np.float32)
    ts_p = (ts + rng.normal(scale=0.01, size=ts.shape)).astype(np.float32)

    # deterministic frames: drone swept through the volume on a script
    # (a wall-clock orbiting source makes geometry depend on host load)
    def frame_at(i):
        phase = 2 * np.pi * i / 40.0
        pos = np.array([0.35 * np.cos(phase), 0.35 * np.sin(phase),
                        0.6 + 0.15 * np.sin(2 * phase)], np.float32)
        X = syn.drone_markers(pos, 0.0, rig)
        pts, mask = syn.observe(X, Rs, ts, rig)
        return (np.asarray(syn.render_frames(
            pts, mask, rig.image_size, sigma=0.8)) * 255).astype(np.uint8)

    source = SyntheticSource(rig, Rs, ts, num_drones=0)
    eng = Engine(rig, cfg, source, CollectingLink())
    events, poses = [], []
    eng.on("object-points", events.append)
    eng.on("camera-pose", poses.append)
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs_p, ts_p),
        "toWorldCoordsMatrix": np.eye(4).tolist(),
    })
    def med_err(evs):
        errs = [e for ev in evs for e in ev["errors"]]
        return float(np.median(errs))

    eng.handle("refine-camera-pose", {"startOrStop": "start"})
    for i in range(30):   # scripted sweep through the volume
        eng.process_frame(frame_at(i), 1 / 60)
    before = med_err(events)
    eng.handle("refine-camera-pose", {"startOrStop": "stop"})
    assert len(poses) == 1
    assert poses[0]["refined_from_points"] >= 30

    events.clear()
    for i in range(10):
        eng.process_frame(frame_at(30 + i), 1 / 60)
    after = med_err(events)
    assert after < before * 0.5, (before, after)
    assert after < 0.3  # sub-pixel after refinement


@pytest.mark.slow
def test_capture_profile_emits_trace(engine, tmp_path):
    """capture-profile records a TensorBoard-loadable jax.profiler trace
    while the loop runs and emits its path (SURVEY.md §5 observability)."""
    import os
    import time

    eng, source, *_ = engine
    events = []
    eng.on("profile", events.append)
    eng.is_capturing_points = True
    eng.handle("capture-profile",
               {"durationMs": 200, "path": str(tmp_path / "trace")})
    t0 = time.time()
    while time.time() - t0 < 2.0 and not events:
        eng.process_frame(source.read(), 1 / 60)
    eng.is_capturing_points = False
    # the trace serialises in a worker thread; under a loaded machine the
    # stop + write can take a while after the capture window
    t0 = time.time()
    while time.time() - t0 < 20.0 and not events:
        time.sleep(0.1)
    assert events and events[0]["error"] is None, events
    files = [f for _, _, fs in os.walk(events[0]["path"]) for f in fs]
    assert files  # xplane/trace artifacts written


def test_record_frames_saves_replayable_npz(engine, tmp_path):
    """record-frames captures the raw stream to a .npz that RecordedSource
    and the offline pipeline replay (SURVEY.md §5: the reference has no
    recording facility)."""
    from low_cost_mocap_tpu.utils.recordings import load_recording

    eng, source, *_ = engine
    events = []
    eng.on("recording", events.append)
    path = str(tmp_path / "cap.npz")
    eng.handle("record-frames", {"startOrStop": "start", "maxFrames": 2})
    sent = [source.read() for _ in range(3)]
    for f in sent:
        eng.process_frame(f, 1 / 60)  # third frame exceeds the cap
    eng.handle("record-frames", {"startOrStop": "stop", "path": path})
    assert events and events[0]["error"] is None
    assert events[0]["frames"] == 2
    frames, fps, meta, _ = load_recording(path)
    np.testing.assert_array_equal(frames[0], sent[0])
    np.testing.assert_array_equal(frames[1], sent[1])
    assert meta["num_cameras"] == eng.rig.num_cameras
