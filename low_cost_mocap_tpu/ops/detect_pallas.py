"""Fused Pallas TPU kernel for blob detection.

The XLA path (``ops/detect.py``) lowers to ~30 separate HBM-roundtripping
ops per camera: threshold, 24x (reduce_window + select) label-propagation
sweeps, K root-extraction reductions, and the moment matmul.  This kernel
fuses the entire detector into ONE ``pallas_call`` per camera: the frame is
loaded to VMEM once, every propagation sweep runs on-chip (VPU min/select
over shifted views), root extraction and moments reduce in VMEM, and only
the (K, 2) centroids + validity leave the chip.

Semantics are identical to ``ops.detect.find_blobs`` (same min-label
propagation, raster-order roots, binary-mass centroids) — the test suite
cross-checks both paths bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_min(lab, big):
    """min over the 8-neighbourhood + self, entirely in registers/VMEM.

    lab: (H, W) int32.  Implemented as three shifted mins per axis with the
    out-of-frame border filled by ``big``.
    """
    H, W = lab.shape

    up = jnp.concatenate([lab[1:], jnp.full((1, W), big, lab.dtype)], axis=0)
    down = jnp.concatenate([jnp.full((1, W), big, lab.dtype), lab[:-1]], axis=0)
    vert = jnp.minimum(jnp.minimum(up, down), lab)

    left = jnp.concatenate([vert[:, 1:], jnp.full((H, 1), big, lab.dtype)],
                           axis=1)
    right = jnp.concatenate([jnp.full((H, 1), big, lab.dtype), vert[:, :-1]],
                            axis=1)
    return jnp.minimum(jnp.minimum(left, right), vert)


def _detect_kernel(frame_ref, cent_ref, valid_ref, size_ref, *,
                   threshold: float, max_blobs: int, cc_iters: int,
                   height: int, width: int):
    H, W = height, width
    big = jnp.int32(H * W)

    frame = frame_ref[:]
    mask = frame > threshold

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    idx = rows * W + cols
    labels = jnp.where(mask, idx, big)

    def prop(_, lab):
        return jnp.where(mask, _shift_min(lab, big), big)

    labels = jax.lax.fori_loop(0, cc_iters, prop, labels)

    # first-K distinct labels via K min-reductions (raster order)
    colf = cols.astype(jnp.float32)
    rowf = rows.astype(jnp.float32)

    slot = jax.lax.broadcasted_iota(jnp.int32, (max_blobs, 1), 0)

    def extract(k, carry):
        lab, cent, valid, size = carry
        r = jnp.min(lab)
        member = lab == r
        m00 = jnp.sum(member.astype(jnp.float32))
        m00_safe = jnp.maximum(m00, 1.0)
        cx = jnp.sum(jnp.where(member, colf, 0.0)) / m00_safe
        cy = jnp.sum(jnp.where(member, rowf, 0.0)) / m00_safe
        ok = r < big
        # scatter into slot k with a one-hot mask (VMEM forbids scalar stores)
        oh = (slot == k).astype(jnp.float32)                     # (K, 1)
        row = jnp.where(ok, jnp.stack([cx, cy])[None, :], 0.0)   # (1, 2)
        cent = cent + oh * row
        valid = valid + (slot == k).astype(jnp.int32) * ok.astype(jnp.int32)
        size = size + oh * jnp.where(ok, m00, 0.0)
        return jnp.where(member, big, lab), cent, valid, size

    _, cent, valid, size = jax.lax.fori_loop(
        0, max_blobs, extract,
        (labels,
         jnp.zeros((max_blobs, 2), jnp.float32),
         jnp.zeros((max_blobs, 1), jnp.int32),
         jnp.zeros((max_blobs, 1), jnp.float32)))
    cent_ref[:] = cent
    valid_ref[:] = valid
    size_ref[:] = size


@functools.partial(jax.jit, static_argnames=("threshold", "max_blobs",
                                             "cc_iters"))
def find_blobs_pallas(frames, threshold: float, max_blobs: int,
                      cc_iters: int = 24):
    """Drop-in fused detector: (C, H, W) float32 -> (C, K, 2), (C, K), (C, K).

    Same contract as ``ops.detect.find_blobs_multi``.
    """
    C, H, W = frames.shape
    kernel = functools.partial(
        _detect_kernel, threshold=threshold, max_blobs=max_blobs,
        cc_iters=cc_iters, height=H, width=W)

    def one(frame):
        cent, valid, size = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((max_blobs, 2), jnp.float32),
                jax.ShapeDtypeStruct((max_blobs, 1), jnp.int32),
                jax.ShapeDtypeStruct((max_blobs, 1), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        )(frame)
        return cent, valid[:, 0] > 0, size[:, 0]

    return jax.vmap(one)(frames)
