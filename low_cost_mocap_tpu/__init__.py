"""low_cost_mocap_tpu — a TPU-native multi-view motion-capture / SfM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jyjblrd/Low-Cost-Mocap (reference mounted read-only at /root/reference):

- IR blob detection on camera frames (`ops.detect`)
- cross-view epipolar correspondence (`ops.correspond`)
- batched DLT triangulation (`ops.triangulate`)
- extrinsics auto-calibration: RANSAC fundamental + essential decomposition
  + bundle adjustment (`ops.ransac`, `ops.epipolar`, `ops.ba`)
- rigid-body (drone) fitting + Kalman/low-pass tracking (`ops.rigid`,
  `ops.kalman`, `ops.lowpass`)
- world-frame tools: floor fit, origin, metric scale (`ops.world`)
- a streaming per-frame pipeline compiled to ONE XLA program per frame
  (`models.pipeline`)
- device-mesh distribution over (cam, point) axes with XLA collectives
  (`parallel`)
- a native C++ control runtime mirroring the reference's ESP32 firmware
  semantics (`control`)

Everything numeric is pure, fixed-shape, batched JAX: variable-size
quantities (blob counts, correspondence hypotheses) are padded tensors with
validity masks. Python keeps only I/O and orchestration.
"""

__version__ = "0.1.0"

from low_cost_mocap_tpu.config import RigConfig, EngineConfig, CameraIntrinsics

__all__ = [
    "RigConfig",
    "EngineConfig",
    "CameraIntrinsics",
    "__version__",
]
