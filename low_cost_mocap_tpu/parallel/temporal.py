"""Temporal (sequence) parallelism: time-sharded offline processing.

The reference keeps no history server-side (SURVEY.md §5); recorded-sequence
work has no analogue there.  Here long recordings scale across the mesh's
``time`` axis — the mocap analogue of context parallelism:

- ``process_sequence``: the per-frame vision pipeline is frame-independent,
  so a recorded (T, C, H, W) sequence shards over ``time`` with ZERO
  communication — XLA partitions the vmapped step automatically from the
  input sharding.
- ``smooth_sharded``: zero-phase Butterworth smoothing of marker tracks is
  a sequential IIR, which *does* couple time steps.  It block-parallelises
  with halo exchange: each device pulls ``halo`` frames from its neighbour
  via ``ppermute`` (ring, rides ICI), runs the forward and backward passes
  over [halo | block | halo], and keeps only its own block.  The IIR's
  impulse response decays geometrically, so a few dozen halo frames make
  the block-parallel result match the sequential filtfilt to float precision
  everywhere except the global sequence edges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from low_cost_mocap_tpu.ops import lowpass


def process_sequence(mesh: Mesh, frames_seq, per_frame_fn, axis: str = "time"):
    """Run a pure per-frame fn over a (T, ...) sequence, sharded over time.

    per_frame_fn: frames (C, H, W) -> pytree of outputs.  T must divide the
    ``axis`` size.  No collectives — pure data parallelism over frames.
    """
    fn = jax.jit(jax.vmap(per_frame_fn),
                 in_shardings=NamedSharding(mesh, P(axis)),
                 out_shardings=NamedSharding(mesh, P(axis)))
    return fn(frames_seq)


def _filtfilt_block(x, b, a):
    """Zero-phase forward+backward IIR over the leading axis."""
    y = lowpass.lpf_scan(x, b, a)
    y = lowpass.lpf_scan(y[::-1], b, a)[::-1]
    return y


@functools.lru_cache(maxsize=32)
def _compiled_smooth(mesh: Mesh, axis: str, halo: int, order: int,
                     cutoff_hz: float, sample_hz: float):
    """Cache the jitted shard_mapped smoother (inline jit retraces/call)."""
    b, a = lowpass.butter_coeffs(order, cutoff_hz, sample_hz)
    n_dev = mesh.shape[axis]

    def block_fn(x):
        # x: (T/n, D) local block
        idx = jax.lax.axis_index(axis)
        # halo from LEFT neighbour (previous time block): ring ppermute
        left_halo = jax.lax.ppermute(
            x[-halo:], axis,
            [(i, (i + 1) % n_dev) for i in range(n_dev)])
        right_halo = jax.lax.ppermute(
            x[:halo], axis,
            [(i, (i - 1) % n_dev) for i in range(n_dev)])
        # first/last block: pad with edge replication instead of wrap
        left_halo = jnp.where(idx == 0, jnp.broadcast_to(x[:1], left_halo.shape),
                              left_halo)
        right_halo = jnp.where(idx == n_dev - 1,
                               jnp.broadcast_to(x[-1:], right_halo.shape),
                               right_halo)
        ext = jnp.concatenate([left_halo, x, right_halo], axis=0)
        sm = _filtfilt_block(ext, b, a)
        return sm[halo:halo + x.shape[0]]

    fn = shard_map(block_fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                   check_vma=False)
    return jax.jit(fn)


def smooth_sharded(mesh: Mesh, tracks, halo: int, axis: str = "time",
                   order: int = 5, cutoff_hz: float = 20.0,
                   sample_hz: float = 60.0):
    """Block-parallel zero-phase smoothing of (T, D) tracks with halos.

    Matches the sequential ``filtfilt``-style smoother away from block
    edges; ``halo`` controls the approximation (32 is plenty for the
    reference's order-5 / 20 Hz-at-60 Hz design,
    ``computer_code/api/KalmanFilter.py:45-47``).
    """
    n_dev = mesh.shape[axis]
    T = tracks.shape[0]
    assert T % n_dev == 0, (T, n_dev)
    fn = _compiled_smooth(mesh, axis, halo, order, cutoff_hz, sample_hz)
    tracks_s = jax.device_put(tracks, NamedSharding(mesh, P(axis)))
    return fn(tracks_s)


def smooth_reference(tracks, order: int = 5, cutoff_hz: float = 20.0,
                     sample_hz: float = 60.0):
    """Sequential zero-phase smoother (single device, golden for tests)."""
    b, a = lowpass.butter_coeffs(order, cutoff_hz, sample_hz)
    return _filtfilt_block(tracks, b, a)
