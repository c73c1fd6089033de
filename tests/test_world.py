import numpy as np
import jax.numpy as jnp

from low_cost_mocap_tpu.ops import world


def _reference_to_world(object_point, M):
    """Reference conversion re-derived in numpy
    (computer_code/api/helpers.py:97-103)."""
    p = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1]]) @ object_point
    p = np.concatenate([p, [1.0]])
    p = M @ p
    p = p[:3] / p[3]
    p[1], p[2] = p[2], p[1].copy()
    return p


def test_to_world_matches_reference_formula():
    rng = np.random.default_rng(0)
    M = np.eye(4)
    M[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    M[:3, 3] = rng.normal(size=3)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    ours = np.asarray(world.to_world(jnp.asarray(pts), jnp.asarray(M.astype(np.float32))))
    for i in range(10):
        ref = _reference_to_world(pts[i].astype(np.float64), M)
        np.testing.assert_allclose(ours[i], ref, atol=1e-4)


def test_fit_floor_flattens_plane():
    """Points on a tilted floor become constant-height (component 1, the
    display up-axis) after the refit, for an arbitrary starting matrix."""
    rng = np.random.default_rng(1)
    # camera-frame floor points: tilted plane
    M0 = np.eye(4, dtype=np.float32)
    M0[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    n_true = np.array([0.2, -0.15, 1.0])
    n_true /= np.linalg.norm(n_true)
    basis = np.linalg.svd(n_true[None])[2][1:]
    cam = (rng.normal(size=(120, 2)) @ basis + [0.1, 0.2, 1.5]).astype(np.float32)
    collected = np.asarray(world.to_world(jnp.asarray(cam), jnp.asarray(M0)))
    assert collected[:, 1].std() > 0.05  # genuinely tilted before
    M1 = world.fit_floor(jnp.asarray(collected), jnp.asarray(M0))
    out = np.asarray(world.to_world(jnp.asarray(cam), M1))
    assert out[:, 1].std() < 1e-3        # level after


def test_fit_floor_identity_when_already_level():
    rng = np.random.default_rng(5)
    xy = rng.normal(size=(50, 2)).astype(np.float32)
    cloud = np.column_stack([xy[:, 0], np.full(50, 0.3, np.float32), xy[:, 1]])
    M0 = np.eye(4, dtype=np.float32)
    M1 = np.asarray(world.fit_floor(jnp.asarray(cloud.astype(np.float32)),
                                    jnp.asarray(M0)))
    np.testing.assert_allclose(M1, M0, atol=1e-4)


def test_set_origin_zeroes_chosen_point():
    rng = np.random.default_rng(2)
    M0 = np.eye(4, dtype=np.float32)
    cam_pt = rng.normal(size=3).astype(np.float32)
    world_pt = np.asarray(world.to_world(jnp.asarray(cam_pt), jnp.asarray(M0)))
    M1 = np.asarray(world.set_origin(jnp.asarray(world_pt), jnp.asarray(M0)))
    new_world = np.asarray(world.to_world(jnp.asarray(cam_pt), jnp.asarray(M1)))
    np.testing.assert_allclose(new_world, 0.0, atol=1e-5)


def test_determine_scale():
    rng = np.random.default_rng(3)
    # wand observed at half scale: pairs 0.075 apart instead of 0.15
    base = rng.normal(size=(20, 3)).astype(np.float32)
    d = rng.normal(size=(20, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=1, keepdims=True) * 0.075
    pairs = np.stack([base, base + d], axis=1)
    ts = rng.normal(size=(4, 3)).astype(np.float32)
    scale, ts2 = world.determine_scale(jnp.asarray(pairs), jnp.asarray(ts))
    np.testing.assert_allclose(float(scale), 2.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ts2), ts * 2.0, rtol=1e-4)
