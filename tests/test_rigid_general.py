"""Generalized rigid-body fitting (ops/rigid_general.py).

The reference only locates its hardcoded 3-LED triple
(``computer_code/api/helpers.py:424-480``); these tests cover the
framework's arbitrary-template extension: Horn/Kabsch absolute
orientation, single-body fits under noise/clutter/missing markers, and
greedy multi-instance extraction.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from low_cost_mocap_tpu.ops import rigid_general as rg


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


WAND5 = np.array([
    [0.0, 0.0, 0.0],
    [0.10, 0.0, 0.0],
    [0.25, 0.0, 0.0],
    [0.10, 0.08, 0.0],
    [0.10, 0.0, 0.05],
], np.float32)


def _scatter(points, rng, n_total=16):
    """Embed body markers among clutter; returns (points, valid, where)."""
    n_body = len(points)
    clutter = rng.uniform(-1.0, 1.0, size=(n_total - n_body, 3)).astype(
        np.float32)
    all_pts = np.concatenate([clutter[: n_total // 3], points,
                              clutter[n_total // 3:]])
    valid = np.ones(len(all_pts), bool)
    lo = n_total // 3
    return all_pts, valid, np.arange(lo, lo + n_body)


def test_absolute_orientation_exact():
    rng = np.random.default_rng(0)
    R = _random_rotation(rng)
    t = rng.normal(size=3).astype(np.float32)
    P = rng.normal(size=(6, 3)).astype(np.float32)
    Q = P @ R.T + t
    R2, t2 = rg.weighted_absolute_orientation(
        jnp.asarray(P), jnp.asarray(Q), jnp.ones(6))
    assert np.abs(np.asarray(R2) - R).max() < 1e-5
    assert np.abs(np.asarray(t2) - t).max() < 1e-5


def test_absolute_orientation_weighted_ignores_outlier():
    rng = np.random.default_rng(1)
    R = _random_rotation(rng)
    t = rng.normal(size=3).astype(np.float32)
    P = rng.normal(size=(5, 3)).astype(np.float32)
    Q = P @ R.T + t
    Q[4] += 10.0  # gross outlier, weight 0
    w = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0])
    R2, t2 = rg.weighted_absolute_orientation(jnp.asarray(P), jnp.asarray(Q), w)
    assert np.abs(np.asarray(R2) - R).max() < 1e-5
    assert np.abs(np.asarray(t2) - t).max() < 1e-5


def test_make_template_rejects_degenerate():
    with pytest.raises(ValueError):
        rg.make_template(np.array([[0, 0, 0], [1, 0, 0]], np.float32))
    with pytest.raises(ValueError):  # collinear
        rg.make_template(np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]],
                                  np.float32))


def test_fit_body_recovers_pose_under_noise_and_clutter():
    tmpl = rg.make_template(WAND5)
    rng = np.random.default_rng(2)
    R = _random_rotation(rng)
    t = np.array([0.3, -0.2, 1.1], np.float32)
    world = WAND5 @ R.T + t + rng.normal(scale=1e-3, size=WAND5.shape
                                         ).astype(np.float32)
    pts, valid, _ = _scatter(world, rng)
    fit = rg.fit_body(jnp.asarray(pts), jnp.asarray(valid), tmpl)
    assert bool(fit.valid)
    assert int(fit.matched.sum()) == 5
    assert float(fit.rms) < 5e-3
    assert np.abs(np.asarray(fit.R) - R).max() < 0.05
    assert np.abs(np.asarray(fit.t) - t).max() < 5e-3


def test_fit_body_with_missing_marker():
    tmpl = rg.make_template(WAND5)
    rng = np.random.default_rng(3)
    R = _random_rotation(rng)
    t = np.array([-0.5, 0.4, 0.8], np.float32)
    world = (WAND5 @ R.T + t).astype(np.float32)
    world = world[[0, 1, 2, 4]]  # marker 3 occluded (not an anchor)
    pts, valid, _ = _scatter(world, rng)
    fit = rg.fit_body(jnp.asarray(pts), jnp.asarray(valid), tmpl)
    assert bool(fit.valid)
    assert int(fit.matched.sum()) == 4
    assert np.abs(np.asarray(fit.t) - t).max() < 5e-3


def test_fit_body_rejects_pure_clutter():
    tmpl = rg.make_template(WAND5)
    rng = np.random.default_rng(4)
    pts = rng.uniform(-1, 1, size=(16, 3)).astype(np.float32)
    fit = rg.fit_body(jnp.asarray(pts), jnp.ones(16, bool), tmpl,
                      min_markers=4)
    assert not bool(fit.valid)


def test_locate_bodies_two_instances():
    tmpl = rg.make_template(WAND5)
    rng = np.random.default_rng(5)
    R1, R2 = _random_rotation(rng), _random_rotation(rng)
    t1 = np.array([0.5, 0.0, 1.0], np.float32)
    t2 = np.array([-0.6, 0.3, 1.4], np.float32)
    w1 = (WAND5 @ R1.T + t1).astype(np.float32)
    w2 = (WAND5 @ R2.T + t2).astype(np.float32)
    pts = np.concatenate([w1, rng.uniform(-1, 1, (4, 3)).astype(np.float32),
                          w2])
    res = rg.locate_bodies(jnp.asarray(pts), jnp.ones(len(pts), bool), tmpl,
                           max_instances=3)
    ok = np.asarray(res.valid)
    assert ok.sum() == 2
    ts = np.asarray(res.t)[ok]
    got = {tuple(np.round(x, 2)) for x in ts}
    want = {tuple(np.round(t1, 2)), tuple(np.round(t2, 2))}
    assert got == want
