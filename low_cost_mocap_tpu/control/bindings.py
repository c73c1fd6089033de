"""ctypes bindings to the native control runtime (liblcmcontrol.so).

The reference's control path is native C++ on ESP32s (receiver/sender
firmware, SURVEY.md §2.2 N1/N2) plus the C++ Ruckig library for trajectory
generation (``computer_code/api/index.py:87``).  This module binds their
host-side native re-implementations; the library auto-builds from source on
first use (g++, no external deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "liblcmcontrol.so"


def _build_lib() -> None:
    subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True)


def _load() -> ctypes.CDLL:
    sources = list(_NATIVE_DIR.glob("*.cc")) + list(_NATIVE_DIR.glob("*.h"))
    if (not _LIB_PATH.exists()
            or any(s.stat().st_mtime > _LIB_PATH.stat().st_mtime
                   for s in sources)):
        _build_lib()
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.lcm_bank_create.restype = ctypes.c_void_p
    lib.lcm_bank_create.argtypes = [ctypes.c_int]
    lib.lcm_bank_destroy.argtypes = [ctypes.c_void_p]
    lib.lcm_bank_feed.restype = ctypes.c_int
    lib.lcm_bank_feed.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_int, ctypes.c_uint64]
    lib.lcm_bank_step.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_uint64,
                                  ctypes.POINTER(ctypes.c_int16)]
    lib.lcm_bank_armed.restype = ctypes.c_int
    lib.lcm_bank_armed.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.lcm_bank_pwm.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_double)]

    lib.lcm_sim_create.restype = ctypes.c_void_p
    lib.lcm_sim_destroy.argtypes = [ctypes.c_void_p]
    lib.lcm_sim_step.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int16),
                                 ctypes.c_double]
    lib.lcm_sim_set_state.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_double),
                                      ctypes.POINTER(ctypes.c_double),
                                      ctypes.c_double]
    lib.lcm_sim_get_state.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_double),
                                      ctypes.POINTER(ctypes.c_double),
                                      ctypes.POINTER(ctypes.c_double)]

    lib.lcm_sbus_encode.argtypes = [ctypes.POINTER(ctypes.c_uint16),
                                    ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_uint8)]
    lib.lcm_sbus_decode.restype = ctypes.c_int
    lib.lcm_sbus_decode.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.POINTER(ctypes.c_uint16),
                                    ctypes.POINTER(ctypes.c_int)]

    lib.lcm_otg_plan.restype = ctypes.c_int
    lib.lcm_otg_plan.argtypes = [ctypes.c_int] + \
        [ctypes.POINTER(ctypes.c_double)] * 5 + \
        [ctypes.c_double, ctypes.POINTER(ctypes.c_double), ctypes.c_int]

    lib.lcm_pack_bits.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_int64, ctypes.c_uint8,
                                  ctypes.POINTER(ctypes.c_uint8)]

    lib.lcm_extract_bits.restype = ctypes.c_int64
    lib.lcm_extract_bits.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_int32),
                                     ctypes.c_int64]

    lib.lcm_detect_blobs_multi.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float)]
    lib.lcm_detect_blobs_weighted_multi.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float)]
    lib.lcm_ingest_detect_multi.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_uint8, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float)]
    lib.lcm_ingest_detect_packed.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_uint8, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float)]
    return lib


_lib: ctypes.CDLL | None = None


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class CascadeBank:
    """Bank of per-drone control cascades with reference wire framing."""

    def __init__(self, num_drones: int):
        self._lib = get_lib()
        self._h = self._lib.lcm_bank_create(num_drones)
        self.num_drones = num_drones

    def feed(self, frame: bytes, now_us: int) -> int:
        """One '<digit><json>' frame (computer_code/api/helpers.py:121)."""
        return self._lib.lcm_bank_feed(self._h, frame, len(frame), now_us)

    def feed_command(self, drone_index: int, payload: dict, now_us: int) -> int:
        import json

        frame = f"{drone_index}{json.dumps(payload)}".encode()
        return self.feed(frame, now_us)

    def step(self, drone_index: int, now_us: int) -> np.ndarray:
        out = np.zeros(16, np.int16)
        self._lib.lcm_bank_step(
            self._h, drone_index, now_us,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
        return out

    def armed(self, drone_index: int) -> bool:
        return bool(self._lib.lcm_bank_armed(self._h, drone_index))

    def pwm(self, drone_index: int) -> np.ndarray:
        out = np.zeros(4, np.float64)
        self._lib.lcm_bank_pwm(self._h, drone_index, _dptr(out))
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.lcm_bank_destroy(self._h)
            self._h = None


class DroneSimulator:
    """Point-mass quadrotor consuming cascade SBUS channels."""

    def __init__(self):
        self._lib = get_lib()
        self._h = self._lib.lcm_sim_create()

    def step(self, channels: np.ndarray, dt: float) -> None:
        ch = np.ascontiguousarray(channels, np.int16)
        self._lib.lcm_sim_step(
            self._h, ch.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), dt)

    def set_state(self, pos, vel=(0, 0, 0), yaw: float = 0.0) -> None:
        p = np.ascontiguousarray(pos, np.float64)
        v = np.ascontiguousarray(vel, np.float64)
        self._lib.lcm_sim_set_state(self._h, _dptr(p), _dptr(v), yaw)

    def get_state(self):
        p = np.zeros(3, np.float64)
        v = np.zeros(3, np.float64)
        yaw = ctypes.c_double()
        self._lib.lcm_sim_get_state(self._h, _dptr(p), _dptr(v),
                                    ctypes.byref(yaw))
        return p, v, yaw.value

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.lcm_sim_destroy(self._h)
            self._h = None


def sbus_encode(channels: np.ndarray, flags: int = 0) -> bytes:
    ch = np.ascontiguousarray(channels, np.uint16)
    out = np.zeros(25, np.uint8)
    get_lib().lcm_sbus_encode(
        ch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), flags,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()


def sbus_decode(frame: bytes):
    buf = np.frombuffer(frame, np.uint8).copy()
    ch = np.zeros(16, np.uint16)
    flags = ctypes.c_int()
    ok = get_lib().lcm_sbus_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.byref(flags))
    if not ok:
        return None
    return ch, flags.value


def plan_trajectory_segment(start, end, max_vel, max_accel, max_jerk,
                            timestep: float, max_steps: int = 100000):
    """Jerk-limited synchronized multi-DoF segment (Ruckig role).

    start/end: (D,) positions; limits scalars or (D,).  Returns (N, D)
    setpoints sampled at ``timestep``.
    """
    start = np.ascontiguousarray(start, np.float64)
    end = np.ascontiguousarray(end, np.float64)
    D = len(start)

    def lim(x):
        return np.ascontiguousarray(np.broadcast_to(np.asarray(x, np.float64), (D,)))

    out = np.zeros((max_steps, D), np.float64)
    n = get_lib().lcm_otg_plan(
        D, _dptr(start), _dptr(end), _dptr(lim(max_vel)),
        _dptr(lim(max_accel)), _dptr(lim(max_jerk)), timestep,
        _dptr(out.reshape(-1)), max_steps)
    return out[:n].copy()


def pack_bits(frames_u8: np.ndarray, cutoff: int) -> np.ndarray:
    """Fused threshold + MSB-first bit-pack along the last axis (SIMD).

    Equivalent to ``np.packbits(frames_u8 >= cutoff, axis=-1)`` for a last
    axis divisible by 8; the per-frame host ingest hot path (ops/detect.py
    ``pack_frames``).
    """
    assert frames_u8.dtype == np.uint8 and frames_u8.shape[-1] % 8 == 0
    flat = np.ascontiguousarray(frames_u8).reshape(-1)
    out = np.empty(flat.size // 8, np.uint8)
    get_lib().lcm_pack_bits(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), flat.size,
        np.uint8(cutoff),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.reshape(*frames_u8.shape[:-1], frames_u8.shape[-1] // 8)


def detect_blobs(packed: np.ndarray, height: int, width: int,
                 max_blobs: int, gray: np.ndarray | None = None):
    """Host-side blob detection over packed 1-bit frames (native CCL).

    packed: (C, H, W//8) uint8 MSB-first bitmap (``pack_bits`` output).
    Returns (centroids (C, K, 2) f32 xy, valid (C, K) bool, sizes (C, K)).
    Semantics match ``ops.detect.find_blobs_multi`` on the unpacked frames
    (raster-order components, binary-mass f32 centroids) — see detect.cc.

    ``gray``: optional (C, H, W) uint8 ORIGINAL frames — centroids become
    intensity-weighted (sub-pixel; the weighted mean of a Gaussian spot is
    its true optical centre, while the binary centroid quantises at the
    threshold boundary).  Components/ordering/sizes are unchanged.
    """
    flat = np.ascontiguousarray(packed).reshape(-1)
    C = packed.shape[0]
    cent = np.zeros((C, max_blobs, 2), np.float32)
    valid = np.zeros((C, max_blobs), np.uint8)
    sizes = np.zeros((C, max_blobs), np.float32)
    if gray is not None:
        gflat = np.ascontiguousarray(gray).reshape(-1)
        get_lib().lcm_detect_blobs_weighted_multi(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            gflat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), C,
            height, width, max_blobs,
            cent.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    else:
        get_lib().lcm_detect_blobs_multi(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), C,
            height, width, max_blobs,
            cent.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return cent, valid.astype(bool), sizes


def ingest_detect(frames_u8: np.ndarray, cutoff: int, max_blobs: int,
                  weighted: bool = False):
    """Fused threshold+pack+CC-centroid detection, ONE FFI crossing.

    frames_u8: (C, H, W) uint8, W % 8 == 0; ``cutoff`` from
    ``ops.detect.threshold_cutoff`` (bit-identical to the device
    thresholding).  Returns (centroids (C, K, 2) f32 xy, valid (C, K)
    bool, sizes (C, K)) — identical to ``pack_bits`` + ``detect_blobs``,
    at roughly half the per-frame-set host cost (no Python-visible
    bitmap, no second crossing; the live host-detect hot path).
    """
    assert frames_u8.dtype == np.uint8 and frames_u8.shape[-1] % 8 == 0
    flat = np.ascontiguousarray(frames_u8).reshape(-1)
    C, H, W = frames_u8.shape
    cent = np.zeros((C, max_blobs, 2), np.float32)
    valid = np.zeros((C, max_blobs), np.uint8)
    sizes = np.zeros((C, max_blobs), np.float32)
    if cutoff > 255:        # threshold above every uint8 value: no blobs
        return cent, valid.astype(bool), sizes
    get_lib().lcm_ingest_detect_multi(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), C, H, W,
        np.uint8(cutoff), max_blobs, int(weighted),
        cent.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return cent, valid.astype(bool), sizes


def ingest_detect_packed(frames_u8: np.ndarray, cutoff: int,
                         max_blobs: int, weighted: bool = False,
                         out: np.ndarray | None = None) -> np.ndarray:
    """Fused detection straight into the device-upload layout.

    frames_u8: (..., H, W) uint8, any number of leading dims (a single
    frame set is (C, H, W); a dispatch batch is (B, C, H, W)).  Returns
    (..., max_blobs, 3) float32 with slot = [x, y, valid] — exactly the
    packed centroid tensor the jitted step consumes (pipeline
    ``track_from_blobs(packed[..., :2], packed[..., 2] > 0.5)``).  ONE
    FFI crossing for the whole batch: no per-frame Python loop, no
    intermediate (cent, valid, sizes) triple, no np.stack.  ``out``
    reuses a caller-owned C-contiguous buffer of the right shape/dtype
    (double-buffer it if the previous batch may still be in flight).
    """
    if frames_u8.dtype != np.uint8 or frames_u8.shape[-1] % 8:
        raise ValueError(
            f"frames must be uint8 with W % 8 == 0, got "
            f"{frames_u8.dtype} {frames_u8.shape}")
    if max_blobs <= 0:
        # a zero-width slot tensor would only fail later, deep inside the
        # jitted step, with an opaque shape error
        raise ValueError(f"max_blobs must be positive, got {max_blobs}")
    lead, (H, W) = frames_u8.shape[:-2], frames_u8.shape[-2:]
    n = int(np.prod(lead, dtype=np.int64)) if lead else 1
    shape = (*lead, max_blobs, 3)
    if out is None:
        out = np.empty(shape, np.float32)
    elif (out.shape != shape or out.dtype != np.float32
          or not out.flags.c_contiguous):
        # a real exception, not an assert: the native call writes
        # n*max_blobs*3 floats through the raw pointer, so a wrong
        # buffer under `python -O` would be silent heap corruption
        raise ValueError(
            f"out must be C-contiguous float32 of shape {shape}, got "
            f"{out.dtype} {out.shape} contiguous={out.flags.c_contiguous}")
    if cutoff > 255:        # threshold above every uint8 value: no blobs
        out[:] = 0.0
        return out
    flat = np.ascontiguousarray(frames_u8).reshape(-1)
    get_lib().lcm_ingest_detect_packed(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, H, W,
        np.uint8(cutoff), max_blobs, int(weighted),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def extract_bits(packed: np.ndarray, max_out: int) -> tuple[np.ndarray, int]:
    """Pixel indices of all set bits in an MSB-first packed bitmap.

    Returns (idx, total_count): idx is (max_out,) int32, entries beyond the
    true count are padded with INT32_MAX (unambiguously out of range, so a
    JAX scatter with mode="drop" discards them — negative padding would WRAP
    to a valid index); total_count may exceed max_out (overflow — callers
    fall back to dense ingest).
    """
    flat = np.ascontiguousarray(packed).reshape(-1)
    out = np.full(max_out, np.iinfo(np.int32).max, np.int32)
    count = get_lib().lcm_extract_bits(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), flat.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_out)
    return out, int(count)
