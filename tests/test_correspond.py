import numpy as np
import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.ops import camera, correspond
from low_cost_mocap_tpu.utils import synthetic as syn


def _setup(n_cams=4, n_pts=3, seed=0, noise=0.0):
    Rs, ts, rig = syn.ring_rig(num_cameras=n_cams)
    rng = np.random.default_rng(seed)
    X = syn.random_points(rng, n_pts)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=noise,
                            rng=rng if noise else None)
    Ps = np.asarray(camera.projection_matrix(
        jnp.asarray(rig.K_stack()), jnp.asarray(Rs), jnp.asarray(ts)))
    return X, pts, mask, Ps


def _to_slots(pts, mask, K=8):
    """Pack (N, C, 2) observations into (C, K, 2) detector-style slots."""
    N, C, _ = pts.shape
    out = np.zeros((C, K, 2), np.float32)
    ok = np.zeros((C, K), bool)
    for c in range(C):
        vis = np.where(mask[:, c])[0]
        out[c, : len(vis)] = pts[vis, c]
        ok[c, : len(vis)] = True
    return out, ok


def test_matches_and_triangulates_all_markers():
    X, pts, mask, Ps = _setup(n_pts=3)
    slots, ok = _to_slots(pts, mask)
    res = correspond.match_points(jnp.asarray(slots), jnp.asarray(ok), jnp.asarray(Ps))
    got = np.asarray(res["object_points"])[np.asarray(res["valid"])]
    assert len(got) == 3
    for x in X:
        assert np.linalg.norm(got - x, axis=1).min() < 1e-2


def test_noisy_markers_still_matched():
    X, pts, mask, Ps = _setup(n_pts=4, seed=3, noise=1.0)
    slots, ok = _to_slots(pts, mask)
    res = correspond.match_points(jnp.asarray(slots), jnp.asarray(ok), jnp.asarray(Ps))
    got = np.asarray(res["object_points"])[np.asarray(res["valid"])]
    errs = np.asarray(res["errors"])[np.asarray(res["valid"])]
    assert len(got) >= 4
    for x in X:
        assert np.linalg.norm(got - x, axis=1).min() < 0.05
    assert np.isfinite(errs).all()


def test_point_missing_in_camera0_becomes_new_root():
    """A marker invisible to camera 0 must still be reconstructed
    (reference: unmatched points become roots, helpers.py:402-406)."""
    X, pts, mask, Ps = _setup(n_pts=3)
    mask = mask.copy()
    mask[0, 0] = False  # point 0 not seen by camera 0
    slots, ok = _to_slots(pts, mask)
    res = correspond.match_points(jnp.asarray(slots), jnp.asarray(ok), jnp.asarray(Ps))
    got = np.asarray(res["object_points"])[np.asarray(res["valid"])]
    for x in X:
        assert np.linalg.norm(got - x, axis=1).min() < 1e-2


def test_no_duplicate_reconstructions():
    """Each marker yields exactly one surviving root (closest-match points
    are claimed and don't re-seed, helpers.py:391-403)."""
    X, pts, mask, Ps = _setup(n_pts=5, seed=7)
    slots, ok = _to_slots(pts, mask)
    res = correspond.match_points(jnp.asarray(slots), jnp.asarray(ok), jnp.asarray(Ps))
    got = np.asarray(res["object_points"])[np.asarray(res["valid"])]
    assert len(got) == 5


def test_empty_frame():
    _, pts, mask, Ps = _setup(n_pts=2)
    slots, ok = _to_slots(pts, mask)
    ok[:] = False
    res = correspond.match_points(jnp.asarray(slots), jnp.asarray(ok), jnp.asarray(Ps))
    assert not np.asarray(res["valid"]).any()
    assert np.isfinite(np.asarray(res["object_points"])).all()


def test_two_cameras_only():
    X, pts, mask, Ps = _setup(n_cams=2, n_pts=2, seed=5)
    slots, ok = _to_slots(pts, mask)
    res = correspond.match_points(jnp.asarray(slots), jnp.asarray(ok), jnp.asarray(Ps))
    got = np.asarray(res["object_points"])[np.asarray(res["valid"])]
    for x in X:
        assert np.linalg.norm(got - x, axis=1).min() < 1e-2


def test_same_camera_pairs_are_gated_out():
    """F[a, a] is exactly degenerate (duplicated projection rows), so
    d[a, k, a, j] is ~0 up to rounding noise — the gate must mask the
    b == a diagonal explicitly or the assoc seed can pair a root with a
    blob of its OWN camera and emit a ghost on the root's ray (advisor
    round-1 finding)."""
    _, pts, mask, Ps = _setup(n_pts=4, seed=2)
    slots, ok = _to_slots(pts, mask)
    _, gated = correspond._epipolar_distances(
        jnp.asarray(slots), jnp.asarray(ok), jnp.asarray(Ps), gate_px=5.0)
    g = np.asarray(gated)
    for a in range(g.shape[0]):
        assert not g[a, :, a, :].any()


def test_assoc_needs_a_second_view_to_seed():
    """With blobs in only one camera, assoc mode must emit nothing — a
    same-camera seed would reconstruct a ghost point on the ray."""
    _, pts, mask, Ps = _setup(n_pts=3)
    slots, ok = _to_slots(pts, mask)
    only0 = np.zeros_like(ok)
    only0[0] = ok[0]
    res = correspond.match_points(jnp.asarray(slots), jnp.asarray(only0),
                                  jnp.asarray(Ps), mode="assoc")
    assert not np.asarray(res["valid"]).any()


def test_jit_compiles_once_and_reruns():
    X, pts, mask, Ps = _setup(n_pts=3)
    slots, ok = _to_slots(pts, mask)
    fn = jax.jit(correspond.match_points, static_argnames=("gate_px", "max_candidates"))
    r1 = fn(jnp.asarray(slots), jnp.asarray(ok), jnp.asarray(Ps))
    r2 = fn(jnp.asarray(slots * 1.0), jnp.asarray(ok), jnp.asarray(Ps))
    np.testing.assert_allclose(np.asarray(r1["object_points"]),
                               np.asarray(r2["object_points"]), atol=1e-6)
