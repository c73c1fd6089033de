"""Typed configuration for the whole rig + engine.

The reference scatters its constants across code: ``num_objects = 2``
(``computer_code/api/index.py:29``), camera fps/gain/exposure
(``computer_code/api/helpers.py:24``), marker geometry 0.095/0.15 m
(``computer_code/api/helpers.py:425-426``), the 5 px epipolar gate
(``computer_code/api/helpers.py:375``), the 0.15 m scale wand
(``computer_code/api/index.py:294``), and intrinsics in
``computer_code/api/camera-params.json``.  Here all of that is one typed,
serialisable config object.

Fixed-shape budgets (``max_blobs``, ``max_tracks``, ``max_hyp_per_cam``)
replace the reference's dynamic Python lists so every kernel compiles to a
static-shape XLA program.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Pinhole + radial/tangential distortion intrinsics for one camera.

    Mirrors one entry of the reference's ``camera-params.json``
    (``computer_code/api/helpers.py:188-193``): 3x3 intrinsic matrix, 5-term
    distortion (k1, k2, p1, p2, k3) and a display rotation (multiples of 90°).
    """

    intrinsic_matrix: tuple  # 3x3 nested tuple
    distortion_coef: tuple   # length-5
    rotation: int = 0

    def K(self) -> np.ndarray:
        return np.asarray(self.intrinsic_matrix, dtype=np.float32)

    def dist(self) -> np.ndarray:
        return np.asarray(self.distortion_coef, dtype=np.float32)


def _normalize_image_size(image_size):
    """int -> square; (H, W) sequence -> tuple.  Used by RigConfig."""
    if isinstance(image_size, (int, np.integer)):
        return int(image_size)
    h, w = image_size
    return (int(h), int(w))


def _image_hw(image_size) -> tuple:
    s = _normalize_image_size(image_size)
    return (s, s) if isinstance(s, int) else s


def _default_intrinsics(num_cameras: int, image_size) -> tuple:
    h, w = _image_hw(image_size)
    f = float(max(h, w)) * 0.85
    K = ((f, 0.0, w / 2.0), (0.0, f, h / 2.0), (0.0, 0.0, 1.0))
    return tuple(
        CameraIntrinsics(intrinsic_matrix=K, distortion_coef=(0.0,) * 5)
        for _ in range(num_cameras)
    )


@dataclasses.dataclass(frozen=True)
class RigConfig:
    """Physical rig description: cameras, marker geometry, world scale."""

    num_cameras: int = 4
    # Frame geometry: an int means square frames (the reference pads its
    # rotated 320x240 sensor frames square, computer_code/api/helpers.py:
    # 507-523); an (H, W) tuple runs the native rectangular shape unpadded
    # through every ingest path — e.g. (320, 240) for the reference's
    # sensor after its rot90 (helpers.py:71) with no padded columns.
    image_size: Any = 320            # int | (H, W)
    cameras: tuple = ()              # tuple[CameraIntrinsics]
    # Drone marker geometry (reference computer_code/api/helpers.py:425-426):
    marker_dist_short: float = 0.095   # LED#3 to each arm LED
    marker_dist_long: float = 0.15     # arm LED to arm LED
    marker_dist_tol: float = 0.025     # gate, computer_code/api/helpers.py:441,448
    marker_side_min: float = 0.02      # third-LED off-axis floor (see ops/rigid.py)
    wand_length: float = 0.15          # scale wand, computer_code/api/index.py:294
    num_objects: int = 2               # tracked drones, computer_code/api/index.py:29
    # Generalized rigid bodies (capability beyond the reference, which only
    # fits its hardcoded LED triple): an arbitrary marker constellation in
    # the engine's world frame, 6-DoF-fit per frame (ops/rigid_general.py).
    body_markers: tuple = ()           # ((x, y, z), ...); () = disabled
    max_bodies: int = 2                # instances extracted per frame
    # Additional DISTINCT body templates tracked simultaneously (multiple
    # prop types in one capture): each entry is (markers, max_instances)
    # with markers = ((x, y, z), ...).  ``body_markers``/``max_bodies``
    # above is shorthand for the first entry.
    body_sets: tuple = ()              # (((xyz, ...), max_instances), ...)

    def __post_init__(self):
        object.__setattr__(
            self, "image_size", _normalize_image_size(self.image_size))
        if not self.cameras:
            object.__setattr__(
                self, "cameras",
                _default_intrinsics(self.num_cameras, self.image_size))
        if len(self.cameras) != self.num_cameras:
            raise ValueError(
                f"{len(self.cameras)} intrinsics for {self.num_cameras} cameras")

    def image_hw(self) -> tuple:
        """(H, W) frame shape — square configs return (s, s)."""
        return _image_hw(self.image_size)

    def body_template(self):
        """``rigid_general.BodyTemplate`` for ``body_markers``, or None."""
        if not self.body_markers:
            return None
        from low_cost_mocap_tpu.ops.rigid_general import make_template

        return make_template(np.asarray(self.body_markers, np.float32))

    def body_sets_resolved(self) -> tuple:
        """All configured body templates as ((BodyTemplate, max_inst), ...).

        ``body_markers``/``max_bodies`` (when set) is entry 0, followed by
        every ``body_sets`` entry.  Hashable (templates are NamedTuples of
        tuples), so the result is a valid static jit argument."""
        from low_cost_mocap_tpu.ops.rigid_general import make_template

        sets = []
        if self.body_markers:
            sets.append((self.body_template(), int(self.max_bodies)))
        for markers, max_inst in self.body_sets:
            sets.append((make_template(np.asarray(markers, np.float32)),
                         int(max_inst)))
        return tuple(sets)

    def total_body_slots(self) -> int:
        """Sum of max_instances across all configured body sets."""
        return sum(mi for _, mi in self.body_sets_resolved())

    # --- stacked array views (device-friendly) ---
    def K_stack(self) -> np.ndarray:
        """(C, 3, 3) stacked intrinsic matrices."""
        return np.stack([c.K() for c in self.cameras])

    def dist_stack(self) -> np.ndarray:
        """(C, 5) stacked distortion coefficients."""
        return np.stack([c.dist() for c in self.cameras])


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Engine/runtime knobs + static shape budgets."""

    # detection (reference threshold 0.2*255, computer_code/api/helpers.py:146)
    detect_threshold: float = 0.2
    max_blobs: int = 8              # fixed K blob slots per camera
    cc_iters: int = 24              # label-propagation iterations (≥ blob diameter)
    # Intensity-weighted sub-pixel centroids on the host-detect path
    # (control/native/detect.cc): the weighted mean of a Gaussian spot is
    # its true optical centre; binary centroids (the reference's contour
    # moments, computer_code/api/helpers.py:152-156) quantise at the
    # threshold boundary.  Off by default for reference parity.
    weighted_centroids: bool = False

    # correspondence (5 px gate, computer_code/api/helpers.py:375,383)
    epipolar_gate_px: float = 5.0
    max_candidates_per_cam: int = 2  # gated candidates kept per camera per root
    # hypotheses per root = (max_candidates_per_cam+1) ** (num_cameras-1)

    # calibration
    ransac_iters: int = 512
    ransac_threshold_px: float = 1.0      # computer_code/api/index.py:246
    ba_max_iters: int = 64
    ba_ftol: float = 1e-2                 # computer_code/api/helpers.py:288
    ba_loss: str = "cauchy"               # computer_code/api/helpers.py:288

    # tracking (computer_code/api/KalmanFilter.py:33-34,45-47)
    kalman_process_noise: float = 1e-2
    kalman_measurement_noise: float = 1.0
    # "pre" reports the predicted state (the reference's statePre quirk —
    # the report never includes the current frame's measurement,
    # KalmanFilter.py:83,94); "post" reports the corrected state
    # (measured: steady-state tracked ATE 3.0 -> 2.5 mm)
    kalman_report: str = "pre"
    lpf_cutoff_hz: float = 20.0
    lpf_sample_hz: float = 60.0
    lpf_order: int = 5

    # Sparse ingest: lit-pixel index budget per frame-set (host->device
    # payload = 4*budget bytes).  Thresholded mocap frames carry a few
    # hundred lit pixels (markers on black); frames exceeding the budget
    # fall back to the dense 1-bit packed path, bit-exactly.
    sparse_budget: int = 2048

    # Per-camera failure detection + elastic recovery (runtime/health.py;
    # the reference leaves camera dropout unhandled — SURVEY.md §5).
    # A camera whose frames are bit-identical for ``health_freeze_frames``
    # consecutive frames (while others change) is masked out of the rig
    # until its stream moves again; ``health_dark_frames`` of zero blobs
    # (while >= 2 other cameras see blobs) flags an advisory "dark" state.
    health_enabled: bool = True
    health_freeze_frames: int = 15
    health_dark_frames: int = 90
    # frame-compare sampling interval for freeze detection: the compare
    # runs every Nth frame (thresholds still count frames).  Freeze is a
    # 15-frame-scale decision; comparing every frame cost ~100 us/frame
    # of host time on the serving loop (measured, engine_serving.py)
    health_interval: int = 4

    # Batched-dispatch serving: process this many consecutive frames per
    # device dispatch — ONE XLA program with the frame-independent
    # geometry vmapped over the batch and only the Kalman bank scanned
    # (models/pipeline.scan_track_from_blobs; bit-identical to per-frame
    # mode).  Amortises the per-dispatch RPC floor (~250 us on tunneled
    # links) at the cost of dispatch_batch frames of output latency.
    # 1 = per-frame (the default: right for closed-loop control); raise to
    # 64-128 for high-rate serving/ingest where latency is secondary
    # (measured 18.8k frames/s at 128 on a v5e, benchmarks/SCALING.md §2).
    # Requires the host-detect ingest path.
    dispatch_batch: int = 1

    # runtime
    target_fps: float = 150.0             # computer_code/api/index.py:40-41
    serial_baud: int = 1_000_000          # computer_code/api/index.py:21
    # Deferred async readback: results are harvested N frames after
    # dispatch so device->host latency overlaps compute. 0 = synchronous
    # (same-frame outputs; right for low-latency links and tests); raise on
    # high-latency device links (tunneled TPU: ~20 ms/fetch).  In batched
    # mode (dispatch_batch > 1) the unit is BATCHES: N batches stay in
    # flight, decode runs N batches behind dispatch.
    readback_pipeline_depth: int = 0

    # Batched serving only: decode + emit completed batches on a worker
    # thread instead of inline in the capture loop.  The capture loop then
    # runs pure ingest -> dispatch (nothing ever blocks on a device
    # readback), and payload construction / listener fan-out / websocket
    # writes overlap ingest on another core.  Output ordering is unchanged
    # (single worker, FIFO); ``process_frame`` returns None (outputs flow
    # through the event surface); backpressure caps in-flight batches at
    # max(readback_pipeline_depth, 4).  Off by default: inline emits keep
    # per-batch results available to the caller, and tests compare them.
    batch_emit_thread: bool = False

    # numerics
    dtype: str = "float32"


def save_config(path: str, rig: RigConfig, engine: EngineConfig) -> None:
    blob: dict[str, Any] = {
        "version": 1,
        "rig": dataclasses.asdict(rig),
        "engine": dataclasses.asdict(engine),
    }
    with open(path, "w") as f:
        json.dump(blob, f, indent=2)


def load_config(path: str) -> tuple[RigConfig, EngineConfig]:
    with open(path) as f:
        blob = json.load(f)
    rig_d = blob["rig"]
    cams = tuple(
        CameraIntrinsics(
            intrinsic_matrix=tuple(tuple(r) for r in c["intrinsic_matrix"]),
            distortion_coef=tuple(c["distortion_coef"]),
            rotation=c.get("rotation", 0),
        )
        for c in rig_d.pop("cameras")
    )
    if "body_markers" in rig_d:
        rig_d["body_markers"] = tuple(
            tuple(m) for m in rig_d["body_markers"])
    if "body_sets" in rig_d:
        rig_d["body_sets"] = tuple(
            (tuple(tuple(m) for m in markers), int(max_inst))
            for markers, max_inst in rig_d["body_sets"])
    rig = RigConfig(cameras=cams, **rig_d)
    engine = EngineConfig(**blob["engine"])
    return rig, engine
