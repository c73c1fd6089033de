"""Capture-loop fault tolerance: camera hiccups must not kill the engine."""

import time

import numpy as np

from low_cost_mocap_tpu.config import EngineConfig
from low_cost_mocap_tpu.runtime.engine import Engine
from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
from low_cost_mocap_tpu.runtime.sources import SyntheticSource
from low_cost_mocap_tpu.utils import synthetic as syn


class FlakySource:
    """Source that fails every third read (camera dropout simulation)."""

    def __init__(self, inner):
        self.inner = inner
        self.num_cameras = inner.num_cameras
        self.image_size = inner.image_size
        self.calls = 0

    def read(self):
        self.calls += 1
        if self.calls % 3 == 0:
            raise RuntimeError("USB transfer failed")
        return self.inner.read()

    def set_settings(self, e, g):
        pass

    def close(self):
        pass


def test_loop_survives_source_errors():
    Rs, ts, rig = syn.ring_rig(num_cameras=2, image_size=96)
    src = FlakySource(SyntheticSource(rig, Rs, ts, num_drones=0))
    eng = Engine(rig, EngineConfig(target_fps=60), src, CollectingLink())
    errors = []
    eng.on("engine-error", errors.append)
    eng.handle("capture-points", {"startOrStop": "start"})
    eng.process_frame(src.inner.read(), 1 / 60)  # compile outside the loop
    eng.start()
    time.sleep(1.5)
    eng.stop()
    assert eng.frame_count > 10          # kept processing despite failures
    assert len(errors) >= 3              # failures surfaced, not swallowed
    assert not any(e.get("fatal") for e in errors)


class DeadSource(FlakySource):
    def read(self):
        raise RuntimeError("camera gone")


def test_loop_gives_up_after_persistent_failure():
    Rs, ts, rig = syn.ring_rig(num_cameras=2, image_size=96)
    src = DeadSource(SyntheticSource(rig, Rs, ts, num_drones=0))
    eng = Engine(rig, EngineConfig(target_fps=500), src, CollectingLink())
    errors = []
    eng.on("engine-error", errors.append)
    eng.handle("capture-points", {"startOrStop": "start"})
    eng.start()
    deadline = time.time() + 10
    while time.time() < deadline and not any(e.get("fatal") for e in errors):
        time.sleep(0.1)
    eng.stop()
    assert any(e.get("fatal") for e in errors)
    assert not eng.is_capturing_points   # capture disabled, loop alive
