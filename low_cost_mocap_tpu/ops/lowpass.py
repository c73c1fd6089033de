"""Streaming Butterworth low-pass bank (order-5 IIR, direct form II-T).

Replaces ``LowPassFilter`` (``computer_code/api/LowPassFilter.py:4-23``),
which re-runs ``scipy.signal.lfilter`` over a 300-sample rolling buffer on
EVERY sample — O(buffer) per step and a discontinuity each time the buffer
truncates (``LowPassFilter.py:20-21``).

TPU-first: carry the 5-element direct-form-II-transposed state per channel
and advance it in O(order) per sample.  With zero initial state this is
*exactly* ``lfilter`` over the full history — i.e. the reference's output
between truncations, without the truncation transients (a strict
improvement, documented divergence).  The filter bank is a single batched
update over all (object, channel) pairs, jittable inside the per-frame step,
and an offline ``lax.scan`` version processes recorded sequences in one go.

Coefficients match the reference's design: Butterworth order 5, 20 Hz cutoff
at 60 Hz sampling (``computer_code/api/KalmanFilter.py:45-47``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def butter_coeffs(order: int = 5, cutoff_hz: float = 20.0,
                  sample_hz: float = 60.0):
    """(b, a) float32 coefficient arrays (scipy design, computed on host)."""
    from scipy.signal import butter

    b, a = butter(order, cutoff_hz / (sample_hz / 2.0), btype="low")
    return np.asarray(b, np.float32), np.asarray(a, np.float32)


def init_state(shape: tuple, order: int = 5, dtype=jnp.float32):
    """Zero filter state for a bank of channels: shape + (order,)."""
    return jnp.zeros(tuple(shape) + (order,), dtype)


def lpf_step(state, x, b, a):
    """One direct-form-II-transposed step for a bank of channels.

    state: (..., order) carried per channel; x: (...) new samples.
    Returns (new_state, y).  Identical recurrence to ``scipy.signal.lfilter``
    with ``zi=state``.
    """
    b = jnp.asarray(b, x.dtype)
    a = jnp.asarray(a, x.dtype)
    y = b[0] * x + state[..., 0]
    order = state.shape[-1]
    new = [
        b[i + 1] * x + state[..., i + 1] - a[i + 1] * y
        for i in range(order - 1)
    ]
    new.append(b[order] * x - a[order] * y)
    return jnp.stack(new, axis=-1), y


def lpf_scan(x_seq, b, a, state=None):
    """Offline: filter a whole (T, ...) sequence with one lax.scan."""
    if state is None:
        state = init_state(x_seq.shape[1:], order=len(b) - 1, dtype=x_seq.dtype)

    def step(s, x):
        s2, y = lpf_step(s, x, b, a)
        return s2, y

    _, ys = jax.lax.scan(step, state, x_seq)
    return ys
