"""Native (C++) control runtime: drone cascade, simulator, SBUS, OTG."""

from low_cost_mocap_tpu.control.bindings import (
    CascadeBank,
    DroneSimulator,
    plan_trajectory_segment,
    sbus_decode,
    sbus_encode,
)

__all__ = [
    "CascadeBank",
    "DroneSimulator",
    "plan_trajectory_segment",
    "sbus_encode",
    "sbus_decode",
]
