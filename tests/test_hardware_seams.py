"""Hardware-seam coverage without hardware: fake pseyepy + fake serial.

``PseyepySource`` and ``PyserialLink`` are the only components whose first
execution would otherwise be on a live rig.  These tests inject fake
``pseyepy``/``serial`` modules to verify the rot90/pad frame layout, the
``update-camera-settings`` -> ``set_settings`` plumbing (reference anchors
``computer_code/api/helpers.py:24,71,195-200``), the ``<digit><json>``
wire framing (``helpers.py:121``), and the non-blocking stall/recovery
semantics of the dongle link.
"""

import json
import sys
import threading
import time
import types

import numpy as np
import pytest

from low_cost_mocap_tpu.config import EngineConfig, RigConfig
from low_cost_mocap_tpu.runtime.serial_link import PyserialLink
from low_cost_mocap_tpu.utils import synthetic as syn


# --------------------------------------------------------------- fakes

def make_fake_pseyepy(frames):
    """A pseyepy stand-in whose Camera returns ``frames`` (list per cam)."""
    mod = types.ModuleType("pseyepy")

    class Camera:
        RES_SMALL = 0
        RES_LARGE = 1
        instances = []

        def __init__(self, fps=90, resolution=0, gain=10, exposure=100):
            n = len(frames)
            self.fps = fps
            self.resolution = resolution
            self.gain = [gain] * n
            self.exposure = [exposure] * n
            self.ended = False
            Camera.instances.append(self)

        def read(self):
            return [f.copy() for f in frames], [0.0] * len(frames)

        def end(self):
            self.ended = True

    mod.Camera = Camera
    return mod


class FakeSerialInstance:
    """serial.Serial stand-in: records writes; can wedge (block + raise)."""

    def __init__(self, device, baud, write_timeout=0.25):
        self.device = device
        self.baud = baud
        self.write_timeout = write_timeout
        self.writes: list[bytes] = []
        self.wedged = False
        self.wedge_block_s = 0.02
        self.closed = False
        self._lock = threading.Lock()

    def write(self, data: bytes):
        if self.wedged:
            time.sleep(self.wedge_block_s)   # a real write blocks
            raise TimeoutError("write timeout (wedged dongle)")
        with self._lock:
            self.writes.append(bytes(data))
        return len(data)

    def close(self):
        self.closed = True


def make_fake_serial():
    mod = types.ModuleType("serial")
    instances = []

    def Serial(device, baud, write_timeout=0.25):
        inst = FakeSerialInstance(device, baud, write_timeout)
        instances.append(inst)
        return inst

    mod.Serial = Serial
    mod.instances = instances
    return mod


# ------------------------------------------------------- PseyepySource

def _with_fake_pseyepy(frames, fn):
    saved = sys.modules.get("pseyepy")
    sys.modules["pseyepy"] = make_fake_pseyepy(frames)
    try:
        return fn()
    finally:
        if saved is None:
            sys.modules.pop("pseyepy", None)
        else:
            sys.modules["pseyepy"] = saved


def test_pseyepy_source_rect_rot90_layout():
    """Sensor frames are 240x320 landscape; rotation=1 + image_size
    (320, 240) must reproduce np.rot90 exactly, unpadded."""
    from low_cost_mocap_tpu.config import CameraIntrinsics
    from low_cost_mocap_tpu.runtime.sources import PseyepySource

    rng = np.random.default_rng(0)
    sensor = [rng.integers(0, 255, (240, 320), np.uint8) for _ in range(2)]
    cams = tuple(
        CameraIntrinsics(intrinsic_matrix=((272.0, 0, 120), (0, 272.0, 160),
                                           (0, 0, 1)),
                         distortion_coef=(0.0,) * 5, rotation=1)
        for _ in range(2))
    rig = RigConfig(num_cameras=2, image_size=(320, 240), cameras=cams)

    def run():
        src = PseyepySource(rig)
        out = src.read()
        assert out.shape == (2, 320, 240)
        for i in range(2):
            np.testing.assert_array_equal(out[i], np.rot90(sensor[i], 1))
        src.close()
        return src

    _with_fake_pseyepy(sensor, run)


def test_pseyepy_source_square_pad_centred_and_rgb():
    """Square compat mode centre-pads the rotated frame (reference
    helpers.py:507-523); RGB sensor frames collapse to grayscale."""
    from low_cost_mocap_tpu.runtime.sources import PseyepySource

    rng = np.random.default_rng(1)
    sensor = [rng.integers(0, 255, (240, 320, 3), np.uint8)]
    rig = RigConfig(num_cameras=1, image_size=320)
    # default rotation 0: 240-high frame centre-padded vertically
    expect_gray = sensor[0].mean(axis=-1).astype(np.uint8)

    def run():
        src = PseyepySource(rig)
        out = src.read()
        assert out.shape == (1, 320, 320)
        np.testing.assert_array_equal(out[0, 40:280, :], expect_gray)
        assert (out[0, :40] == 0).all() and (out[0, 280:] == 0).all()

    _with_fake_pseyepy(sensor, run)


def test_pseyepy_source_settings_plumbing_through_engine():
    """update-camera-settings -> source.set_settings -> pseyepy lists
    (reference helpers.py:195-200, index.py:212-216)."""
    from low_cost_mocap_tpu.runtime.engine import Engine
    from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
    from low_cost_mocap_tpu.runtime.sources import PseyepySource

    sensor = [np.zeros((240, 320), np.uint8) for _ in range(2)]
    rig = RigConfig(num_cameras=2, image_size=320)

    def run():
        src = PseyepySource(rig)
        eng = Engine(rig, EngineConfig(), src, CollectingLink())
        eng.handle("update-camera-settings", {"exposure": 55, "gain": 3})
        cam = src._cam
        assert cam.exposure == [55, 55]
        assert cam.gain == [3, 3]
        src.close()
        assert cam.ended

    _with_fake_pseyepy(sensor, run)


# -------------------------------------------------------- PyserialLink

def test_pyserial_link_wire_format_and_command_order():
    fake = make_fake_serial()
    link = PyserialLink("/dev/fake", serial_module=fake, pacing_s=0.0)
    ser = fake.instances[0]
    link.send(0, {"armed": True})
    link.send(1, {"pid": [1.0, 2.0]})
    link.send(0, {"setpoint": [0.0, 0.0, 0.5]})
    assert link.flush(2.0)
    frames = ser.writes
    assert frames[0] == b'0' + json.dumps({"armed": True}).encode()
    assert frames[1] == b'1' + json.dumps({"pid": [1.0, 2.0]}).encode()
    assert frames[2] == b'0' + json.dumps(
        {"setpoint": [0.0, 0.0, 0.5]}).encode()
    link.close()
    assert ser.closed


def test_pyserial_link_pose_feed_is_latest_only():
    """Poses queued while the dongle is busy collapse to the newest one."""
    fake = make_fake_serial()
    link = PyserialLink("/dev/fake", serial_module=fake, pacing_s=0.0)
    ser = fake.instances[0]
    ser.wedged = True     # writer fails; pose slot keeps being replaced
    for k in range(20):
        link.send(0, {"pos": [k, 0, 0, 0], "vel": [0, 0, 0]})
    time.sleep(0.05)
    ser.wedged = False
    link.send(0, {"pos": [99, 0, 0, 0], "vel": [0, 0, 0]})
    assert link.flush(2.0)
    link.close()
    poses = [f for f in ser.writes if b"pos" in f]
    assert len(poses) >= 1
    # the LAST written pose is the newest; the stale backlog (0..19) is
    # never replayed — failed poses are dropped, superseded ones replaced
    assert json.loads(poses[-1][1:])["pos"][0] == 99
    assert len(poses) <= 3   # nothing like 21 replays


def test_pyserial_link_stall_health_and_recovery():
    fake = make_fake_serial()
    events = []
    link = PyserialLink("/dev/fake", serial_module=fake, pacing_s=0.0,
                        stall_after_s=0.05, on_health=events.append)
    ser = fake.instances[0]
    ser.wedge_block_s = 0.01
    link.send(0, {"armed": True})
    assert link.flush(2.0)
    assert link.health()["state"] == "ok"

    ser.wedged = True
    link.send(0, {"pid": [1.0]})
    deadline = time.monotonic() + 2.0
    while link.health()["state"] != "stalled":
        assert time.monotonic() < deadline, link.health()
        time.sleep(0.01)
    assert events and events[-1]["state"] == "stalled"

    # send() must never block while the dongle is wedged
    t0 = time.perf_counter()
    for _ in range(50):
        link.send(0, {"pos": [0, 0, 0.5, 0], "vel": [0, 0, 0]})
    assert time.perf_counter() - t0 < 0.05

    ser.wedged = False
    deadline = time.monotonic() + 2.0
    while link.health()["state"] != "ok":
        assert time.monotonic() < deadline, link.health()
        time.sleep(0.01)
    assert events[-1]["state"] == "ok"
    # the queued command survived the stall (re-queued, not dropped)
    assert link.flush(2.0)
    assert any(b"pid" in f for f in ser.writes)
    link.close()


def test_engine_disarms_on_link_stall():
    """Engine surfaces link-health and drops its armed mirror on a stall
    (the firmware's 2 s ping failsafe has cut the motors by then)."""
    from low_cost_mocap_tpu.runtime.engine import Engine
    from low_cost_mocap_tpu.runtime.sources import SyntheticSource

    Rs, ts, rig = syn.ring_rig(num_cameras=2)
    fake = make_fake_serial()
    link = PyserialLink("/dev/fake", serial_module=fake, pacing_s=0.0,
                        stall_after_s=0.05)
    src = SyntheticSource(rig, Rs, ts, num_drones=1)
    eng = Engine(rig, EngineConfig(), src, link)
    events = []
    eng.on("link-health", events.append)

    eng.handle("arm-drone", {"droneArmed": [True, True]})
    assert link.flush(2.0)
    assert eng.drone_armed == [True, True]

    fake.instances[0].wedged = True
    # pose feed keeps flowing while armed (the live loop at 60 fps) —
    # stall detection is traffic-driven
    deadline = time.monotonic() + 2.0
    while not events:
        link.send(0, {"pos": [0, 0, 0.5, 0], "vel": [0, 0, 0]})
        assert time.monotonic() < deadline
        time.sleep(0.01)
    assert events[-1]["state"] == "stalled"
    assert events[-1].get("disarmed") is True
    assert eng.drone_armed == [False, False]
    link.close()
