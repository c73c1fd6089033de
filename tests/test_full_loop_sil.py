"""Full-system software-in-the-loop flight: vision closes the control loop.

The complete chain, no hardware, no shortcuts: the simulated drone's marker
LEDs are *rendered into camera frames*, the vision pipeline detects /
matches / triangulates / identifies them, the Kalman pose feed goes over
the serial wire format into the native C++ cascade, and the cascade's SBUS
output drives the drone simulator's dynamics.  The drone must take off and
hold a setpoint using only what the cameras saw — the system-level test the
reference could only do by flying real drones.
"""

import numpy as np
import pytest

from low_cost_mocap_tpu.config import EngineConfig, RigConfig
from low_cost_mocap_tpu.runtime.engine import Engine, camera_poses_to_serializable
from low_cost_mocap_tpu.runtime.serial_link import LoopbackLink
from low_cost_mocap_tpu.runtime.sources import SimulatedRigSource
from low_cost_mocap_tpu.utils import synthetic as syn


@pytest.mark.slow
def test_vision_in_the_loop_hover():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    link = LoopbackLink(1)
    link.sims[0].set_state([0.25, -0.15, 0.07])   # landed, off-centre
    source = SimulatedRigSource(rig, Rs, ts, link)
    eng = Engine(rig, EngineConfig(), source, link)

    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist()})
    eng.handle("locate-objects", {"startOrStop": "start"})
    eng.handle("arm-drone", {"droneArmed": [True, True]})
    # gains tuned for the simulated airframe via the operator's PID event
    # (the reference's workflow too — defaults are airframe-specific)
    pid = [0.8, 0, 0.02, 0.4, 0, 0.0, 0.3, 0.1, 0.05,
           0.25, 0.05, 0.08, 0.3, 0.3, 0.02, 5.0, -0.035]
    eng.handle("set-drone-pid", {"droneIndex": 0, "dronePID": pid})
    target = [0.0, 0.0, 0.5]                      # firmware frame: x, y, alt
    eng.handle("set-drone-setpoint", {"droneIndex": 0,
                                      "droneSetpoint": target})

    # vision at 60 Hz; control cascade + dynamics at 300 Hz
    fps = 60.0
    n_frames = int(40 * fps)
    fed = 0
    for f in range(n_frames):
        out = eng.process_frame(source.read(), 1.0 / fps)
        if out is not None and bool(np.asarray(out.tracked.valid).any()):
            fed += 1
        for _ in range(5):
            link.tick(1.0 / fps / 5)
        # keep the arm alive (the UI pings every 500 ms, src/App.tsx:95)
        if f % 30 == 0:
            eng.handle("arm-drone", {"droneArmed": [True, True]})

    pos, vel, yaw = link.drone_state(0)
    assert fed > n_frames * 0.5, f"vision fed only {fed}/{n_frames} frames"
    err = np.linalg.norm(pos - np.asarray(target))
    assert err < 0.05, (pos, target)
    assert np.linalg.norm(vel) < 0.1, vel
    assert abs(yaw) < 0.2, yaw


@pytest.mark.slow
def test_vision_in_the_loop_two_drones():
    """Two drones fly simultaneously to different setpoints, identities
    kept apart by the mirrored third-LED convention — vision only."""
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    link = LoopbackLink(2)
    link.sims[0].set_state([0.35, -0.2, 0.07])
    link.sims[1].set_state([-0.35, 0.2, 0.07])
    source = SimulatedRigSource(rig, Rs, ts, link)
    eng = Engine(rig, EngineConfig(), source, link)
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist()})
    eng.handle("locate-objects", {"startOrStop": "start"})
    eng.handle("arm-drone", {"droneArmed": [True, True]})
    pid = [0.8, 0, 0.02, 0.4, 0, 0.0, 0.3, 0.1, 0.05,
           0.25, 0.05, 0.08, 0.3, 0.3, 0.02, 5.0, -0.035]
    targets = {0: [0.3, -0.2, 0.5], 1: [-0.3, 0.2, 0.6]}
    for d in (0, 1):
        eng.handle("set-drone-pid", {"droneIndex": d, "dronePID": pid})
        eng.handle("set-drone-setpoint", {"droneIndex": d,
                                          "droneSetpoint": targets[d]})
    fps = 60.0
    for f in range(int(40 * fps)):
        eng.process_frame(source.read(), 1.0 / fps)
        for _ in range(5):
            link.tick(1.0 / fps / 5)
        if f % 30 == 0:
            eng.handle("arm-drone", {"droneArmed": [True, True]})
    for d in (0, 1):
        pos, vel, _ = link.drone_state(d)
        assert np.linalg.norm(pos - np.asarray(targets[d])) < 0.05, (d, pos)
        assert np.linalg.norm(vel) < 0.1, (d, vel)


def test_simulated_rig_source_renders_markers():
    Rs, ts, rig = syn.ring_rig(num_cameras=2)
    link = LoopbackLink(1)
    link.sims[0].set_state([0.1, 0.2, 0.5])
    src = SimulatedRigSource(rig, Rs, ts, link)
    frames = src.read()
    assert frames.shape == (2, rig.image_size, rig.image_size)
    assert (frames > 50).sum() > 10   # LEDs visible


@pytest.mark.slow
def test_failure_injection_frozen_camera_and_blob_dropout():
    """Fly to hover, then freeze one camera's transport mid-flight: the
    health monitor must mask it, tracking + altitude hold must continue
    within bounds on the remaining views, and the camera must re-admit
    when its stream recovers.  A blob-dropout burst (all frames dark for
    a few frames) must coast through the Kalman bank without destabilising
    the hover.  The reference's ONLY failsafe is the firmware disarm
    timeout (``receiver_esp32/receiver_esp32.ino:213-215``) — camera
    dropout crashes or corrupts it silently (SURVEY.md §5).
    """
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    link = LoopbackLink(1)
    link.sims[0].set_state([0.2, -0.1, 0.07])
    source = SimulatedRigSource(rig, Rs, ts, link)
    eng = Engine(rig, EngineConfig(), source, link)
    health_events = []
    eng.on("camera-health", health_events.append)

    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist()})
    eng.handle("locate-objects", {"startOrStop": "start"})
    eng.handle("arm-drone", {"droneArmed": [True, True]})
    pid = [0.8, 0, 0.02, 0.4, 0, 0.0, 0.3, 0.1, 0.05,
           0.25, 0.05, 0.08, 0.3, 0.3, 0.02, 5.0, -0.035]
    eng.handle("set-drone-pid", {"droneIndex": 0, "dronePID": pid})
    target = [0.0, 0.0, 0.5]
    eng.handle("set-drone-setpoint", {"droneIndex": 0,
                                      "droneSetpoint": target})

    fps = 60.0
    n_frames = int(45 * fps)
    freeze = range(int(18 * fps), int(26 * fps))     # 8 s transport freeze
    dropout = range(int(32 * fps), int(32 * fps) + 5)  # 5-frame blob burst
    stale = None
    hover_err = []
    tracked_in_freeze = 0
    for f in range(n_frames):
        frames = np.array(source.read())
        if f in freeze:
            if stale is None:
                stale = frames[0].copy()
            frames[0] = stale                        # camera 0 wedged
        else:
            stale = None
        if f in dropout:
            frames[:] = 0                            # no blobs anywhere
        out = eng.process_frame(frames, 1.0 / fps)
        if f in freeze and out is not None \
                and bool(np.asarray(out.tracked.valid).any()):
            tracked_in_freeze += 1
        if f >= int(10 * fps):
            pos, _, _ = link.drone_state(0)
            hover_err.append(np.linalg.norm(pos - np.asarray(target)))
        for _ in range(5):
            link.tick(1.0 / fps / 5)
        if f % 30 == 0:
            eng.handle("arm-drone", {"droneArmed": [True, True]})

    # the freeze was detected and the camera re-admitted on recovery
    frozen_ev = [e for e in health_events
                 if e["camera"] == 0 and e["status"] == "frozen"]
    ok_ev = [e for e in health_events
             if e["camera"] == 0 and e["status"] == "ok"]
    assert frozen_ev, f"freeze never detected: {health_events}"
    assert ok_ev, f"camera never re-admitted: {health_events}"
    assert not eng.health.frozen_mask.any()

    # tracking survived the freeze on the remaining 3 views
    assert tracked_in_freeze > len(freeze) * 0.8, tracked_in_freeze

    # the hover held through freeze AND dropout burst
    hover_err = np.asarray(hover_err)
    assert hover_err.max() < 0.15, hover_err.max()
    pos, vel, _ = link.drone_state(0)
    assert np.linalg.norm(pos - np.asarray(target)) < 0.05, pos
    assert np.linalg.norm(vel) < 0.1, vel


@pytest.mark.slow
def test_armed_flight_survives_link_stall():
    """Wedge the dongle mid-flight: the vision loop must NOT throttle (the
    old inline serial write blocked up to 1 s per armed frame), the link
    must report stalled (engine emits link-health + drops its armed
    mirror), and the firmware's 2 s ping failsafe must cut the motors —
    the drone falls instead of flying blind on stale setpoints
    (receiver_esp32.ino:213-215)."""
    import json as _json
    import time as _time
    import types as _types

    from low_cost_mocap_tpu.runtime.serial_link import PyserialLink

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    loop = LoopbackLink(1)
    loop.sims[0].set_state([0.15, -0.1, 0.07])

    class BridgeSerial:
        """The USB dongle, faithfully: serial frames in, command link out
        (sender_esp32.ino:70-88) — wedgeable."""

        def __init__(self, device, baud, write_timeout=0.25):
            self.wedged = False

        def write(self, b):
            if self.wedged:
                _time.sleep(0.005)
                raise TimeoutError("write timeout (wedged dongle)")
            loop.send(int(chr(b[0])), _json.loads(b[1:].decode()))

        def close(self):
            pass

    mod = _types.ModuleType("serial")
    insts = []

    def Serial(device, baud, write_timeout=0.25):
        inst = BridgeSerial(device, baud, write_timeout)
        insts.append(inst)
        return inst

    mod.Serial = Serial
    link = PyserialLink("/dev/fake", serial_module=mod, pacing_s=0.0,
                        stall_after_s=0.3)
    source = SimulatedRigSource(rig, Rs, ts, loop)
    eng = Engine(rig, EngineConfig(), source, link)
    health = []
    eng.on("link-health", health.append)

    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist()})
    eng.handle("locate-objects", {"startOrStop": "start"})
    eng.handle("arm-drone", {"droneArmed": [True, True]})
    pid = [0.8, 0, 0.02, 0.4, 0, 0.0, 0.3, 0.1, 0.05,
           0.25, 0.05, 0.08, 0.3, 0.3, 0.02, 5.0, -0.035]
    eng.handle("set-drone-pid", {"droneIndex": 0, "dronePID": pid})
    eng.handle("set-drone-setpoint", {"droneIndex": 0,
                                      "droneSetpoint": [0.0, 0.0, 0.5]})
    assert link.flush(2.0)

    fps = 60.0
    wedge_start, wedge_end = int(14 * fps), int(18 * fps)
    frame_wall = []
    for f in range(int(19 * fps)):
        if f == wedge_start:
            pos, _, _ = loop.drone_state(0)
            assert pos[2] > 0.35, f"not airborne before stall: {pos}"
            insts[0].wedged = True
        t0 = _time.perf_counter()
        eng.process_frame(source.read(), 1.0 / fps)
        if f >= wedge_start:
            frame_wall.append(_time.perf_counter() - t0)
        for _ in range(5):
            loop.tick(1.0 / fps / 5)
        # UI keepalive until the UI sees the disarm notice
        if f % 30 == 0 and not any(h.get("disarmed") for h in health):
            eng.handle("arm-drone", {"droneArmed": [True, True]})

    # vision loop never throttled during the stall (old inline write:
    # ~1 s per armed frame)
    assert np.mean(frame_wall) < 0.1, np.mean(frame_wall)
    assert np.max(frame_wall) < 0.5, np.max(frame_wall)
    # link health surfaced + engine dropped its armed mirror
    assert any(h["state"] == "stalled" for h in health)
    assert any(h.get("disarmed") for h in health)
    assert eng.drone_armed == [False, False]
    # firmware failsafe cut the motors: the drone fell
    pos, _, _ = loop.drone_state(0)
    assert pos[2] < 0.25, f"failsafe did not cut motors: {pos}"
    link.close()


@pytest.mark.slow
def test_trajectory_run_fly_to_start_in_flight():
    """Full SIL: hover away from the plan start, issue run-trajectory, and
    verify the fly-to-start gate (reference src/App.tsx:299-324,696-732):
    execution begins only once the drone is AT the plan start, and during
    execution the drone stays close to the commanded setpoint — a plan
    starting 0.3 m away never turns into a step input mid-plan."""
    from low_cost_mocap_tpu.models.trajectory import plan_waypoint_route

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    link = LoopbackLink(1)
    link.sims[0].set_state([0.25, -0.15, 0.07])
    source = SimulatedRigSource(rig, Rs, ts, link)
    eng = Engine(rig, EngineConfig(), source, link)
    statuses = []
    eng.on("trajectory-status", statuses.append)

    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist()})
    eng.handle("locate-objects", {"startOrStop": "start"})
    eng.handle("arm-drone", {"droneArmed": [True, True]})
    pid = [0.8, 0, 0.02, 0.4, 0, 0.0, 0.3, 0.1, 0.05,
           0.25, 0.05, 0.08, 0.3, 0.3, 0.02, 5.0, -0.035]
    eng.handle("set-drone-pid", {"droneIndex": 0, "dronePID": pid})
    hover = [0.25, -0.15, 0.5]
    eng.handle("set-drone-setpoint", {"droneIndex": 0,
                                      "droneSetpoint": hover})

    # plan: start at [0,0,0.5] (0.3 m from the hover), line to [0.3,0.2,0.5]
    n = rig.num_objects
    way0 = [0.0, 0.0, 0.5] + [0.0] * 3 * (n - 1) + [True]
    way1 = [0.3, 0.2, 0.5] + [0.0] * 3 * (n - 1) + [True]
    sps = plan_waypoint_route([way0, way1], [0.15] * 3, [0.5] * 3,
                              [1.0] * 3, 0.05, num_objects=n)

    fps = 60.0
    started = None
    exec_err = []
    for f in range(int(36 * fps)):
        out = eng.process_frame(source.read(), 1.0 / fps)
        for _ in range(5):
            link.tick(1.0 / fps / 5)
        if f % 30 == 0:
            eng.handle("arm-drone", {"droneArmed": [True, True]})
        if f == int(12 * fps):
            pos, _, _ = link.drone_state(0)
            assert np.linalg.norm(pos - np.asarray(hover)) < 0.1, pos
            eng.handle("run-trajectory", {
                "setpoints": sps, "timestep": 0.05, "droneIndices": [0],
                "arrivalTol": 0.12, "arrivalTimeout": 15.0})
        if statuses and statuses[-1]["phase"] == "executing":
            if started is None:
                started = f
                pos, _, _ = link.drone_state(0)
                # the gate held until the drone reached the plan START
                assert np.linalg.norm(pos - np.asarray(way0[:3])) < 0.15, pos
            tr = eng._traj
            if tr is not None and tr["idx"] >= 0:
                sp = np.asarray(sps[tr["idx"]][:3])
                pos, _, _ = link.drone_state(0)
                exec_err.append(np.linalg.norm(pos - sp))

    assert started is not None, [s["phase"] for s in statuses]
    phases = [s["phase"] for s in statuses]
    assert phases[0] == "fly-to-start" and "done" in phases
    # no step input: during execution the tracking error stays bounded by
    # the P-controller's intrinsic following lag (~vmax/kp = 0.19 m at
    # these gains) + the arrival tolerance — far below the 0.36 m step
    # (growing toward ~0.7 m against the moving drip) that running the
    # plan from the hover without the gate would command
    assert np.max(exec_err) < 0.28, np.max(exec_err)
    pos, vel, _ = link.drone_state(0)
    assert np.linalg.norm(pos - np.asarray(way1[:3])) < 0.08, pos


class _JitterLink:
    """Wraps the loopback link, delaying POSE feeds by a random number of
    extra vision frames — the sim-time model of tunnel dispatch jitter
    (measured p50 31.7 / p99 53.6 ms ≈ 2-3 frames at 60 fps,
    benchmarks/SCALING.md §2).  Commands pass through immediately."""

    def __init__(self, inner, rng, max_extra=2, p=(0.5, 0.35, 0.15)):
        self.inner = inner
        self.rng = rng
        self.choices = list(range(max_extra + 1))
        self.p = p
        self._q = []

    def send(self, drone_index, payload):
        if "pos" in payload:
            delay = int(self.rng.choice(self.choices, p=self.p))
            self._q.append([delay, drone_index, payload])
        else:
            self.inner.send(drone_index, payload)

    def tick_frame(self):
        keep = []
        for item in self._q:
            if item[0] <= 0:
                self.inner.send(item[1], item[2])
            else:
                item[0] -= 1
                keep.append(item)
        self._q = keep

    def close(self):
        pass


def _hover_with_stale_poses(depth, jitter_frames, seconds=30.0):
    """SIL hover with readback_pipeline_depth=depth + per-pose jitter.
    Returns (final position error m, final |velocity|)."""
    rng = np.random.default_rng(0)
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    loop = LoopbackLink(1)
    loop.sims[0].set_state([0.25, -0.15, 0.07])
    link = (_JitterLink(loop, rng, max_extra=jitter_frames)
            if jitter_frames else loop)
    source = SimulatedRigSource(rig, Rs, ts, loop)
    eng = Engine(rig, EngineConfig(readback_pipeline_depth=depth),
                 source, link)
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist()})
    eng.handle("locate-objects", {"startOrStop": "start"})
    eng.handle("arm-drone", {"droneArmed": [True, True]})
    pid = [0.8, 0, 0.02, 0.4, 0, 0.0, 0.3, 0.1, 0.05,
           0.25, 0.05, 0.08, 0.3, 0.3, 0.02, 5.0, -0.035]
    eng.handle("set-drone-pid", {"droneIndex": 0, "dronePID": pid})
    target = [0.0, 0.0, 0.5]
    eng.handle("set-drone-setpoint", {"droneIndex": 0,
                                      "droneSetpoint": target})
    fps = 60.0
    for f in range(int(seconds * fps)):
        eng.process_frame(source.read(), 1.0 / fps)
        if jitter_frames:
            link.tick_frame()
        for _ in range(5):
            loop.tick(1.0 / fps / 5)
        if f % 30 == 0:
            eng.handle("arm-drone", {"droneArmed": [True, True]})
    pos, vel, _ = loop.drone_state(0)
    return (float(np.linalg.norm(pos - np.asarray(target))),
            float(np.linalg.norm(vel)))


@pytest.mark.slow
def test_hover_stable_with_pipelined_readback_and_jitter():
    """The engine's latency-hiding (readback_pipeline_depth) feeds the
    cascade stale poses; the hover must still converge with depth=2 plus
    tunnel-profile jitter (total pose age ~3-4 frames ≈ 50-70 ms) — the
    configuration a tunneled chip actually serves with.  A deeper sweep
    is recorded in benchmarks/SCALING.md (latency-robustness margin)."""
    err, vel = _hover_with_stale_poses(depth=2, jitter_frames=2)
    assert err < 0.08, err
    assert vel < 0.15, vel


@pytest.mark.slow
def test_hover_stable_at_double_tunnel_latency():
    """2x the tunnel's worst case (depth 6 ≈ 100 ms pose age + jitter):
    the cascade still holds the hover — the stability margin is real."""
    err, vel = _hover_with_stale_poses(depth=6, jitter_frames=2)
    assert err < 0.12, err
    assert vel < 0.2, vel


def _hover_with_batched_dispatch(B, seconds=30.0):
    """SIL hover with ``dispatch_batch=B``: the vision step runs as ONE
    XLA program per B frames, so the cascade receives its pose feed in
    bursts at batch boundaries — pose age sawtooths between 1 and B
    frames.  Returns (final position error m, final |velocity|)."""
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    loop = LoopbackLink(1)
    loop.sims[0].set_state([0.25, -0.15, 0.07])
    source = SimulatedRigSource(rig, Rs, ts, loop)
    # batched mode runs on the host-detect ingest path (the serving
    # configuration; bit-identical to the device detector, tested)
    eng = Engine(rig, EngineConfig(dispatch_batch=B), source, loop,
                 fast_path=True, host_detect=True)
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist()})
    eng.handle("locate-objects", {"startOrStop": "start"})
    eng.handle("arm-drone", {"droneArmed": [True, True]})
    pid = [0.8, 0, 0.02, 0.4, 0, 0.0, 0.3, 0.1, 0.05,
           0.25, 0.05, 0.08, 0.3, 0.3, 0.02, 5.0, -0.035]
    eng.handle("set-drone-pid", {"droneIndex": 0, "dronePID": pid})
    target = [0.0, 0.0, 0.5]
    eng.handle("set-drone-setpoint", {"droneIndex": 0,
                                      "droneSetpoint": target})
    fps = 60.0
    for f in range(int(seconds * fps)):
        eng.process_frame(source.read(), 1.0 / fps)
        for _ in range(5):
            loop.tick(1.0 / fps / 5)
        if f % 30 == 0:
            eng.handle("arm-drone", {"droneArmed": [True, True]})
    eng.flush_batches()
    pos, vel, _ = loop.drone_state(0)
    return (float(np.linalg.norm(pos - np.asarray(target))),
            float(np.linalg.norm(vel)))


@pytest.mark.slow
@pytest.mark.parametrize("B", [2, 4, 8])
def test_hover_stable_under_batched_dispatch(B):
    """The batched serving mode can CLOSE THE LOOP at small B: the SIL
    hover flies with dispatch_batch in {2, 4, 8} (pose bursts every
    33-133 ms — inside the ~233 ms stability margin measured in the
    latency-robustness sweep, SCALING.md §2).  Per-frame dispatch stays
    the control default; this pins the latency-throughput frontier."""
    err, vel = _hover_with_batched_dispatch(B)
    assert err < 0.10, (B, err)
    assert vel < 0.2, (B, vel)
