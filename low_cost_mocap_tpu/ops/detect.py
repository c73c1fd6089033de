"""Blob detection front-end: threshold -> connected components -> centroids.

Replaces the reference's per-frame OpenCV chain — GaussianBlur + sharpen
filter2D (``computer_code/api/helpers.py:75-81``) and
threshold/findContours/moments (``computer_code/api/helpers.py:143-163``) —
with a TPU-first design:

- Preprocessing is ONE fused depthwise convolution: the 9x9 Gaussian and the
  reference's 5x5 sharpen kernel are composed into a single 13x13 kernel at
  trace time, applied to all cameras at once via ``lax.conv`` (MXU/VPU).
- Connected components use iterative min-label propagation (a fixed number
  of 3x3 ``reduce_window`` steps — static shapes, no data-dependent loops).
- Per-component moments are ONE matmul: a (H*W, K) membership one-hot against
  per-pixel features, which XLA tiles onto the MXU.
- Output is a fixed K blob slots + validity mask per camera, replacing the
  reference's variable-length lists with ``[[None, None]]`` sentinels
  (``computer_code/api/helpers.py:160-161``).

The whole detector vmaps over the camera axis and jits into the per-frame
step; nothing here ever re-specialises on blob count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Preprocessing: fused blur + sharpen
# ---------------------------------------------------------------------------


def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    if sigma <= 0:
        # OpenCV's default sigma for GaussianBlur(ksize, sigmaX=0)
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


# The reference's hand-tuned sharpen kernel (computer_code/api/helpers.py:76-80)
SHARPEN_KERNEL = np.array(
    [
        [-2, -1, -1, -1, -2],
        [-1, 1, 3, 1, -1],
        [-1, 3, 4, 3, -1],
        [-1, 1, 3, 1, -1],
        [-2, -1, -1, -1, -2],
    ],
    dtype=np.float32,
)


@functools.lru_cache(maxsize=8)
def fused_preprocess_kernel(blur_ksize: int = 9, sigma: float = 0.0) -> np.ndarray:
    """Compose Gaussian blur and sharpen into one conv kernel.

    Convolution is associative: sharpen * (gauss * img) == (sharpen * gauss)
    * img, so the reference's two passes collapse into one
    (blur_ksize + 4)^2 kernel computed once at trace time.
    """
    g1 = _gaussian_kernel_1d(blur_ksize, sigma)
    g2 = np.outer(g1, g1)
    from scipy.signal import convolve2d

    return convolve2d(SHARPEN_KERNEL, g2, mode="full").astype(np.float32)


def preprocess(frames, blur_ksize: int = 9, sigma: float = 0.0):
    """Blur + sharpen all camera frames in one conv.

    frames: (C, H, W) float32 in [0, 1].  Returns same shape, clipped to
    [0, 1] (the uint8 saturation the reference gets implicitly).
    """
    k = jnp.asarray(fused_preprocess_kernel(blur_ksize, sigma))
    kh, kw = k.shape
    out = jax.lax.conv_general_dilated(
        frames[:, None],                     # (C, 1, H, W)
        k[None, None],                       # (1, 1, kh, kw)
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    return jnp.clip(out, 0.0, 1.0)


@functools.lru_cache(maxsize=64)
def threshold_cutoff(threshold: float) -> int:
    """Smallest uint8 pixel value passing the device float32 threshold
    test (``v * f32(1/255) > f32(threshold)``), or 256 when none does.
    Cached — recomputing the 256-entry table cost ~14 us per frame on the
    host ingest hot path."""
    passes = (np.arange(256, dtype=np.float32)
              * np.float32(1.0 / 255.0)) > np.float32(threshold)
    return int(np.argmax(passes)) if passes.any() else 256


def pack_frames(frames_u8: np.ndarray, threshold: float) -> np.ndarray:
    """Host-side threshold + bit-pack of (C, H, W) uint8 frames.

    Reproduces the device path's thresholding bit-exactly
    (``frames * float32(1/255) > float32(threshold)`` — the float32 rounding
    matters for edge-value pixels), then packs rows MSB-first for
    ``unpack_bits``.

    Hot path (runs per frame on the host ingest side): the float32 test is
    monotone in the uint8 pixel value, so it reduces to one unsigned compare
    against a precomputed cutoff — fused with the bit-pack in native SIMD
    (``control/native/ingest.cc``) when the last axis is byte-aligned.
    """
    frames_u8 = np.asarray(frames_u8)
    if frames_u8.dtype != np.uint8:
        # a float frame would silently pack to all-zeros through the
        # native byte path — fail loudly instead
        raise TypeError(
            f"pack_frames expects uint8 frames, got {frames_u8.dtype}; "
            "convert with (frames * 255).astype(np.uint8)")
    cutoff = threshold_cutoff(float(threshold))
    if cutoff > 255:
        return np.zeros(frames_u8.shape[:-1] + (frames_u8.shape[-1] // 8,),
                        np.uint8)
    if frames_u8.shape[-1] % 8 == 0:
        try:
            from low_cost_mocap_tpu.control.bindings import pack_bits

            return pack_bits(frames_u8, cutoff)
        except Exception:  # pragma: no cover - no toolchain: numpy fallback
            pass
    return np.packbits(frames_u8 >= cutoff, axis=-1)


def sparse_ingest(frames_u8: np.ndarray, threshold: float,
                  budget: int) -> tuple[np.ndarray, bool]:
    """Host-side threshold + set-pixel index extraction (sparsest ingest).

    Thresholded mocap frames are ~99.9% zero (a handful of LED blobs on
    black), so shipping the *indices* of lit pixels beats even the 1-bit
    bitmap of ``pack_frames``: (budget,) int32 = 4*budget bytes, independent
    of resolution.  Returns (idx, ok, packed): idx is (budget,) int32 padded
    with INT32_MAX (out-of-range — ``scatter_pixels`` drops it); ok=False
    means more than ``budget`` pixels were lit and the caller must fall back
    to the dense ``packed`` bitmap for this frame (bit-exactness is never
    sacrificed — both encodings are returned from one packing pass).
    """
    from low_cost_mocap_tpu.control.bindings import extract_bits

    packed = pack_frames(frames_u8, threshold)
    idx, count = extract_bits(packed, budget)
    return idx, count <= budget, packed


def scatter_pixels(idx, shape) -> "jnp.ndarray":
    """(budget,) int32 lit-pixel indices -> dense float32 binary frames.

    Device-side inverse of ``sparse_ingest``; padding (INT32_MAX) entries
    drop out via scatter ``mode="drop"``.  Bit-identical to ``unpack_bits`` of the
    corresponding packed bitmap whenever the budget was not exceeded.
    """
    C, H, W = shape
    flat = jnp.zeros((C * H * W,), jnp.float32)
    flat = flat.at[idx].set(1.0, mode="drop")
    return flat.reshape(C, H, W)


def unpack_bits(packed):
    """(…, W//8) uint8 bit-packed rows -> (…, W) float32 binary frames.

    Production ingest path: the host (or a smart camera) thresholds frames
    and ships 1 bit/pixel — an 8x cut of host->device bandwidth, which is
    the live pipeline's bottleneck on tunneled links.  Matches numpy's
    ``packbits`` bit order (MSB first).
    """
    shifts = (7 - jnp.arange(8, dtype=jnp.uint8))
    bits = (packed[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8).astype(
        jnp.float32)


# ---------------------------------------------------------------------------
# Connected-component blob extraction
# ---------------------------------------------------------------------------


def _min_label_step(labels, big: int):
    """One 8-connected min-label propagation step via reduce_window."""
    return jax.lax.reduce_window(
        labels,
        np.int32(big),  # static init value (traced values are rejected)
        jax.lax.min,
        window_dimensions=(3, 3),
        window_strides=(1, 1),
        padding="SAME",
    )


def find_blobs(frame, threshold: float, max_blobs: int, cc_iters: int = 24,
               integer_centroids: bool = False):
    """Detect up to ``max_blobs`` bright blobs in one frame.

    frame: (H, W) float32 in [0, 1].
    Returns (centroids (K, 2) xy pixels, valid (K,) bool, sizes (K,) f32).

    Semantics match ``Cameras._find_dot``
    (``computer_code/api/helpers.py:143-163``): binary threshold at
    ``threshold`` (reference: 0.2), connected regions, centroid per region.
    Components are reported in raster order of their topmost-leftmost pixel;
    ``integer_centroids=True`` reproduces the reference's ``int()`` cast.
    """
    H, W = frame.shape
    big = H * W  # static sentinel label
    mask = frame > threshold

    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    )
    labels = jnp.where(mask, idx, big)

    def body(_, lab):
        prop = _min_label_step(lab, big)
        return jnp.where(mask, prop, big)

    labels = jax.lax.fori_loop(0, cc_iters, body, labels)

    # Component ids = distinct label values (each component's label is its
    # root pixel's raster index).  The first K components in raster order are
    # the K smallest distinct labels — extracted with K min-reductions, which
    # is ~5x cheaper than a sort-based top_k over H*W on TPU.
    def next_root(cur, _):
        r = jnp.min(cur)
        cur = jnp.where(cur == r, big, cur)
        return cur, r

    _, root_ids = jax.lax.scan(next_root, labels.reshape(-1), None,
                               length=max_blobs)
    slot_valid = root_ids < big

    # Per-component moments as ONE matmul on the MXU:
    # membership (K, H*W) against features (H*W, 3) = [1, x, y].
    flat_labels = labels.reshape(-1)
    membership = (flat_labels[None, :] == root_ids[:, None]).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(-1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(-1)
    ones = jnp.ones_like(xs)
    feats = jnp.stack([ones, xs, ys], axis=-1)           # (H*W, 3)
    moments = jnp.dot(membership, feats,
                      preferred_element_type=jnp.float32)  # (K, 3)
    m00 = moments[:, 0]
    m00_safe = jnp.maximum(m00, 1.0)
    cx = moments[:, 1] / m00_safe
    cy = moments[:, 2] / m00_safe
    if integer_centroids:
        cx = jnp.floor(cx)
        cy = jnp.floor(cy)
    centroids = jnp.stack([cx, cy], axis=-1)
    valid = slot_valid & (m00 > 0)
    centroids = jnp.where(valid[:, None], centroids, 0.0)
    return centroids, valid, m00 * valid


def find_blobs_multi(frames, threshold: float, max_blobs: int,
                     cc_iters: int = 24, integer_centroids: bool = False):
    """vmapped ``find_blobs`` over the camera axis.

    frames: (C, H, W) -> centroids (C, K, 2), valid (C, K), sizes (C, K).
    """
    fn = functools.partial(
        find_blobs,
        threshold=threshold,
        max_blobs=max_blobs,
        cc_iters=cc_iters,
        integer_centroids=integer_centroids,
    )
    return jax.vmap(fn)(frames)
