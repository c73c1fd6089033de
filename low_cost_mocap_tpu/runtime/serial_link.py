"""Drone command link: the reference's serial wire protocol, abstracted.

Wire format: ``"<droneIndex digit><json>"`` at 1 Mbaud
(``computer_code/api/helpers.py:121``, ``computer_code/api/index.py:21``),
guarded by a lock (``computer_code/api/index.py:19``).

Implementations:
  - ``LoopbackLink``: feeds frames straight into the native cascade bank +
    simulator — full software-in-the-loop without radios;
  - ``CollectingLink``: records frames for tests;
  - ``PyserialLink``: real dongle via pyserial (gated import).
"""

from __future__ import annotations

import json
import threading
import time
from typing import Protocol


class SerialLink(Protocol):
    def send(self, drone_index: int, payload: dict) -> None:
        ...

    def close(self) -> None:
        ...


class CollectingLink:
    """Test double: records every frame."""

    def __init__(self):
        self.frames: list[bytes] = []
        self._lock = threading.Lock()

    def send(self, drone_index: int, payload: dict) -> None:
        with self._lock:
            self.frames.append(f"{drone_index}{json.dumps(payload)}".encode())

    def close(self) -> None:
        pass


class LoopbackLink:
    """Software-in-the-loop: commands drive the native cascade + simulator.

    Replaces the radio chain (serial -> sender ESP32 -> ESP-NOW -> receiver
    ESP32, SURVEY.md §2.2) with the host-side native runtime for closed-loop
    testing without hardware.
    """

    def __init__(self, num_drones: int):
        from low_cost_mocap_tpu.control import CascadeBank, DroneSimulator

        self.bank = CascadeBank(num_drones)
        self.sims = [DroneSimulator() for _ in range(num_drones)]
        for sim in self.sims:
            sim.set_state([0.0, 0.0, 0.04])
        self.num_drones = num_drones
        self._lock = threading.Lock()
        # Simulated clock, advanced by exactly dt per tick().  The cascade
        # derives its PID dt and the 2 s ping failsafe from these timestamps
        # (cascade.cc Step/OnCommand), so stamping with wall-clock time would
        # couple the *simulated* control loop to host execution speed —
        # slower-than-real-time test runs then see inflated PID dt and
        # spurious failsafe disarms (nondeterministic flight).
        self._sim_us = 0

    def send(self, drone_index: int, payload: dict) -> None:
        with self._lock:
            frame = f"{drone_index}{json.dumps(payload)}".encode()
            self.bank.feed(frame, self._sim_us)

    def tick(self, dt: float) -> None:
        """Advance cascades + simulators by dt (call at control rate)."""
        with self._lock:
            self._sim_us += int(dt * 1e6)
            for i, sim in enumerate(self.sims):
                ch = self.bank.step(i, self._sim_us)
                sim.step(ch, dt)

    def drone_state(self, i: int):
        return self.sims[i].get_state()

    def close(self) -> None:
        pass


class PyserialLink:
    """Real 1 Mbaud dongle link (``computer_code/api/index.py:21``)."""

    def __init__(self, device: str, baud: int = 1_000_000):
        try:
            import serial  # type: ignore
        except ImportError as e:  # pragma: no cover - hardware path
            raise RuntimeError("pyserial is not installed") from e
        self._ser = serial.Serial(device, baud, write_timeout=1)
        self._lock = threading.Lock()

    def send(self, drone_index: int, payload: dict) -> None:  # pragma: no cover
        with self._lock:
            self._ser.write(f"{drone_index}{json.dumps(payload)}".encode())
            time.sleep(0.001)  # pacing as the reference does (helpers.py:122)

    def close(self) -> None:  # pragma: no cover
        self._ser.close()
