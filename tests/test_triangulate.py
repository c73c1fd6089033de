import numpy as np
import jax.numpy as jnp

from low_cost_mocap_tpu.ops import camera as cam
from low_cost_mocap_tpu.ops import triangulate as tri
from low_cost_mocap_tpu.utils import synthetic as syn


def _reference_dlt(Ps, image_points):
    """Line-for-line the reference DLT math (computer_code/api/helpers.py:311-323),
    re-derived in numpy for golden comparison."""
    A = []
    for P, image_point in zip(Ps, image_points):
        A.append(image_point[1] * P[2, :] - P[1, :])
        A.append(P[0, :] - image_point[0] * P[2, :])
    A = np.array(A).reshape((len(Ps) * 2, 4))
    B = A.transpose() @ A
    _, _, Vh = np.linalg.svd(B)
    return Vh[3, 0:3] / Vh[3, 3]


def _rig(n=4):
    Rs, ts, rig = syn.ring_rig(num_cameras=n)
    Ps = np.asarray(cam.projection_matrix(jnp.asarray(rig.K_stack()),
                                          jnp.asarray(Rs), jnp.asarray(ts)))
    return Rs, ts, rig, Ps


def test_triangulate_recovers_ground_truth():
    Rs, ts, rig, Ps = _rig()
    rng = np.random.default_rng(7)
    X = syn.random_points(rng, 20)
    pts, mask = syn.observe(X, Rs, ts, rig)
    Xr, valid = tri.triangulate_points(jnp.asarray(pts), jnp.asarray(Ps), jnp.asarray(mask))
    assert np.all(np.asarray(valid))
    np.testing.assert_allclose(np.asarray(Xr), X, atol=1e-3)


def test_triangulate_matches_reference_dlt():
    Rs, ts, rig, Ps = _rig()
    rng = np.random.default_rng(8)
    X = syn.random_points(rng, 10)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=1.0, rng=rng)
    Xr, _ = tri.triangulate_points(jnp.asarray(pts), jnp.asarray(Ps), jnp.asarray(mask))
    for n in range(len(X)):
        ref = _reference_dlt(Ps, pts[n])
        np.testing.assert_allclose(np.asarray(Xr)[n], ref, atol=1e-3)


def test_triangulate_masked_matches_row_deletion():
    """Zeroing masked rows must equal deleting them (reference removes
    [None, None] rows, computer_code/api/helpers.py:296-298)."""
    Rs, ts, rig, Ps = _rig()
    rng = np.random.default_rng(9)
    X = syn.random_points(rng, 6)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.5, rng=rng)
    mask = mask.copy()
    mask[:, 1] = False  # camera 1 blind
    Xr, valid = tri.triangulate_points(jnp.asarray(pts), jnp.asarray(Ps), jnp.asarray(mask))
    assert np.all(np.asarray(valid))
    for n in range(len(X)):
        keep = [0, 2, 3]
        ref = _reference_dlt(Ps[keep], pts[n][keep])
        np.testing.assert_allclose(np.asarray(Xr)[n], ref, atol=1e-3)


def test_triangulate_under_two_views_invalid():
    Rs, ts, rig, Ps = _rig()
    rng = np.random.default_rng(10)
    X = syn.random_points(rng, 3)
    pts, mask = syn.observe(X, Rs, ts, rig)
    mask = mask.copy()
    mask[0, 1:] = False  # point 0 visible only in camera 0
    _, valid = tri.triangulate_points(jnp.asarray(pts), jnp.asarray(Ps), jnp.asarray(mask))
    assert not np.asarray(valid)[0]
    assert np.all(np.asarray(valid)[1:])


def test_reprojection_error_semantics():
    """err = mean over 2*n_vis squared residual components
    (computer_code/api/helpers.py:227-241)."""
    Rs, ts, rig, Ps = _rig()
    rng = np.random.default_rng(11)
    X = syn.random_points(rng, 5)
    pts, mask = syn.observe(X, Rs, ts, rig)
    # perfect observations -> ~0 error
    err = np.asarray(tri.reprojection_errors(jnp.asarray(pts), jnp.asarray(X),
                                             jnp.asarray(Ps), jnp.asarray(mask)))
    assert np.all(err < 1e-4)
    # shift one observation of point 0 by (3, 4) px -> err += (9+16)/(2*4)
    pts2 = pts.copy()
    pts2[0, 2] += np.array([3.0, 4.0], np.float32)
    err2 = np.asarray(tri.reprojection_errors(jnp.asarray(pts2), jnp.asarray(X),
                                              jnp.asarray(Ps), jnp.asarray(mask)))
    np.testing.assert_allclose(err2[0], err[0] + 25.0 / 8.0, atol=1e-3)


def test_reprojection_error_invalid_is_inf():
    Rs, ts, rig, Ps = _rig()
    rng = np.random.default_rng(12)
    X = syn.random_points(rng, 2)
    pts, mask = syn.observe(X, Rs, ts, rig)
    mask = mask.copy()
    mask[0] = False
    err = np.asarray(tri.reprojection_errors(jnp.asarray(pts), jnp.asarray(X),
                                             jnp.asarray(Ps), jnp.asarray(mask)))
    assert np.isinf(err[0])
