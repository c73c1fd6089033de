"""Server-side run-trajectory: fly-to-start arrival gate + timed drip.

The reference flies each drone to the plan's first setpoint and gates on
arrival before executing (``src/App.tsx:299-324,696-732``); its webui Run
used to drip from wherever the drone was — a plan starting away from the
drone commanded a step input.  These tests drive the engine's
``run-trajectory`` event directly (the SIL flight version lives in
``test_full_loop_sil.py``).
"""

import json

import numpy as np

from low_cost_mocap_tpu.config import EngineConfig
from low_cost_mocap_tpu.runtime.engine import (
    Engine, camera_poses_to_serializable)
from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
from low_cost_mocap_tpu.runtime.sources import SyntheticSource
from low_cost_mocap_tpu.utils import synthetic as syn


def _tracking_engine():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    source = SyntheticSource(rig, Rs, ts, num_drones=1, orbit_hz=0.0)
    link = CollectingLink()
    eng = Engine(rig, EngineConfig(), source, link)
    eng.handle("triangulate-points", {
        "startOrStop": "start",
        "cameraPoses": camera_poses_to_serializable(Rs, ts),
        "toWorldCoordsMatrix": np.eye(4).tolist()})
    eng.handle("locate-objects", {"startOrStop": "start"})
    # settle tracking and read the drone's firmware-frame position
    out = None
    for _ in range(5):
        out = eng.process_frame(source.read(), 1 / 60)
    tv = np.asarray(out.tracked.valid)
    assert tv.any()
    d = int(np.argmax(tv))
    w = np.asarray(out.tracked.pos)[d]
    fw = [float(w[0]), float(w[2]), float(w[1])]   # world -> firmware
    return eng, source, link, d, fw


def _row(eng, d, xyz):
    """A plan row with drone ``d``'s columns set (others zero)."""
    row = [0.0] * (3 * eng.rig.num_objects)
    row[3 * d:3 * d + 3] = [float(v) for v in xyz]
    return row


def _setpoint_frames(link, drone):
    out = []
    for f in link.frames:
        if int(chr(f[0])) != drone:
            continue
        payload = json.loads(f[1:])
        if "setpoint" in payload:
            out.append(payload["setpoint"])
    return out


def test_fly_to_start_gates_execution():
    eng, source, link, d, fw = _tracking_engine()
    statuses = []
    eng.on("trajectory-status", statuses.append)

    # plan starts 1 m away from the drone: must NOT start dripping
    start = [fw[0] + 1.0, fw[1], fw[2]]
    mid = [fw[0] + 1.2, fw[1], fw[2]]
    sps = [_row(eng, d, start), _row(eng, d, mid)] * 5
    link.frames.clear()
    eng.handle("run-trajectory", {"setpoints": sps, "timestep": 0.05,
                                  "droneIndices": [d], "arrivalTol": 0.12,
                                  "arrivalTimeout": 0.5})
    assert statuses[-1]["phase"] == "fly-to-start"
    for _ in range(20):   # 20 frames = 0.33 s < timeout
        eng.process_frame(source.read(), 1 / 60)
    sent = _setpoint_frames(link, d)
    # only the START setpoint was ever commanded — no plan drip, no step
    # through the trajectory
    assert sent and all(sp == start for sp in sent)
    assert statuses[-1]["phase"] == "fly-to-start"

    # drone never arrives (static synthetic scene): gate must time out
    for _ in range(15):
        eng.process_frame(source.read(), 1 / 60)
    assert statuses[-1]["phase"] == "aborted"
    assert "timeout" in statuses[-1]["reason"]


def test_execution_drips_in_order_when_already_at_start():
    eng, source, link, d, fw = _tracking_engine()
    statuses = []
    eng.on("trajectory-status", statuses.append)

    T = 12
    plan = [[fw[0] + 0.01 * k, fw[1], fw[2]] for k in range(T)]
    sps = [_row(eng, d, p) for p in plan]
    link.frames.clear()
    eng.handle("run-trajectory", {"setpoints": sps, "timestep": 1 / 60,
                                  "droneIndices": [d], "arrivalTol": 0.2})
    # already within tol of start: first processed frame flips to executing
    for _ in range(T + 3):
        eng.process_frame(source.read(), 1 / 60)
    phases = [s["phase"] for s in statuses]
    assert phases[0] == "fly-to-start"
    assert "executing" in phases
    assert phases[-1] == "done"
    sent = _setpoint_frames(link, d)
    # the full plan was dripped in order (start setpoint possibly repeated
    # by the gate's initial command)
    tail = sent[-T:]
    assert tail == plan
    # stop is idempotent after done
    eng.handle("run-trajectory", {"startOrStop": "stop"})
    assert statuses[-1]["phase"] == "done"


def test_stop_cancels_run():
    eng, source, link, d, fw = _tracking_engine()
    statuses = []
    eng.on("trajectory-status", statuses.append)
    sps = [_row(eng, d, [fw[0] + 1.0, fw[1], fw[2]])] * 3
    eng.handle("run-trajectory", {"setpoints": sps, "timestep": 0.05,
                                  "droneIndices": [d]})
    eng.process_frame(source.read(), 1 / 60)
    eng.handle("run-trajectory", {"startOrStop": "stop"})
    assert statuses[-1]["phase"] == "stopped"
    before = len(link.frames)
    eng.process_frame(source.read(), 1 / 60)
    # no further trajectory traffic (pose feeds are disarmed anyway)
    assert len(link.frames) == before


def test_server_forwards_trajectory_and_link_health_events():
    """Engine events reach socket clients only if the server forwards
    them — regression guard for the broadcast list.  The forwarding
    listeners attach while at least one client is connected (an idle
    server must not force per-frame payload construction) and detach at
    zero clients."""
    from low_cost_mocap_tpu.runtime.server import MocapServer

    eng, source, link, d, fw = _tracking_engine()
    srv = MocapServer(eng, port=0)
    wired = {ev for ev, _ in srv._event_cbs}
    for ev in ("trajectory-status", "link-health"):
        assert ev in wired, f"server does not forward {ev}"
    assert not eng._listeners.get("trajectory-status")  # idle: detached

    class _FakeClient:
        def send_text(self, text):
            return True

    c = _FakeClient()
    srv._add_client(c)
    for ev in ("trajectory-status", "link-health"):
        assert eng._listeners.get(ev), f"not attached with a client: {ev}"
    srv._remove_client(c)
    assert not eng._listeners.get("trajectory-status")
