"""Pallas fused detector: parity with the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from low_cost_mocap_tpu.ops import detect, detect_pallas
from low_cost_mocap_tpu.utils import synthetic as syn


def _frames(seed=0, n=5, size=128):
    rng = np.random.default_rng(seed)
    Rs, ts, rig = syn.ring_rig(num_cameras=2, image_size=size)
    X = syn.random_points(rng, n)
    pts, mask = syn.observe(X, Rs, ts, rig)
    return syn.render_frames(pts, mask, size, sigma=0.8).astype(np.float32)


def test_pallas_matches_xla_detector():
    frames = _frames()
    with pltpu.force_tpu_interpret_mode():
        c2, v2, s2 = detect_pallas.find_blobs_pallas(
            jnp.asarray(frames), 0.2, 8, cc_iters=16)
    c1, v1, s1 = detect.find_blobs_multi(jnp.asarray(frames), 0.2, 8,
                                         cc_iters=16)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=0)


def test_pallas_empty_frame():
    frames = np.zeros((2, 128, 128), np.float32)
    with pltpu.force_tpu_interpret_mode():
        c, v, s = detect_pallas.find_blobs_pallas(
            jnp.asarray(frames), 0.2, 4, cc_iters=8)
    assert not np.asarray(v).any()
