import numpy as np
import jax.numpy as jnp
import cv2 as cv

from low_cost_mocap_tpu.config import RigConfig, CameraIntrinsics
from low_cost_mocap_tpu.ops import camera as cam
from low_cost_mocap_tpu.utils import synthetic as syn


def _one_camera():
    K = np.array([[300.0, 0, 160.0], [0, 300.0, 160.0], [0, 0, 1.0]], np.float32)
    dist = np.array([-0.12, 0.05, 0.001, -0.002, 0.01], np.float32)
    R, t = syn.look_at(np.array([2.0, 1.0, 1.5]), np.array([0.0, 0.0, 0.5]))
    return K, dist, R, t


def test_project_matches_opencv_no_distortion():
    K, _, R, t = _one_camera()
    rng = np.random.default_rng(2)
    X = syn.random_points(rng, 32)
    ours = np.asarray(
        cam.project_points(jnp.asarray(X), jnp.asarray(R), jnp.asarray(t), jnp.asarray(K))
    )
    rvec, _ = cv.Rodrigues(R.astype(np.float64))
    ref, _ = cv.projectPoints(X.astype(np.float64), rvec, t.astype(np.float64), K.astype(np.float64), np.array([]))
    np.testing.assert_allclose(ours, ref[:, 0, :], atol=1e-2)


def test_project_matches_opencv_with_distortion():
    K, dist, R, t = _one_camera()
    rng = np.random.default_rng(3)
    X = syn.random_points(rng, 32)
    ours = np.asarray(
        cam.project_points(jnp.asarray(X), jnp.asarray(R), jnp.asarray(t),
                           jnp.asarray(K), jnp.asarray(dist))
    )
    rvec, _ = cv.Rodrigues(R.astype(np.float64))
    ref, _ = cv.projectPoints(X.astype(np.float64), rvec, t.astype(np.float64),
                              K.astype(np.float64), dist.astype(np.float64))
    np.testing.assert_allclose(ours, ref[:, 0, :], atol=5e-2)


def test_undistort_points_inverts_distortion():
    K, dist, _, _ = _one_camera()
    rng = np.random.default_rng(4)
    px_clean = rng.random((64, 2)).astype(np.float32) * 280 + 20
    xy = cam.pixels_to_normalized(jnp.asarray(px_clean), jnp.asarray(K))
    xy_d = cam.distort_normalized(xy, jnp.asarray(dist))
    px_dist = cam.normalized_to_pixels(xy_d, jnp.asarray(K))
    recovered = np.asarray(cam.undistort_points(px_dist, jnp.asarray(K), jnp.asarray(dist)))
    np.testing.assert_allclose(recovered, px_clean, atol=1e-3)


def test_undistort_points_matches_opencv():
    K, dist, _, _ = _one_camera()
    rng = np.random.default_rng(5)
    px = rng.random((32, 2)).astype(np.float32) * 280 + 20
    ours = np.asarray(cam.undistort_points(jnp.asarray(px), jnp.asarray(K), jnp.asarray(dist)))
    ref = cv.undistortPoints(px.reshape(-1, 1, 2).astype(np.float64),
                             K.astype(np.float64), dist.astype(np.float64),
                             P=K.astype(np.float64))[:, 0, :]
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_undistort_image_roundtrip_centroid():
    """Blob centre in an undistorted image == undistorted blob centre."""
    K, dist, _, _ = _one_camera()
    size = 320
    # render a blob at a known distorted location
    true_px = np.array([80.0, 220.0], np.float32)
    xy = cam.pixels_to_normalized(jnp.asarray(true_px), jnp.asarray(K))
    xy_d = cam.distort_normalized(xy, jnp.asarray(dist))
    px_d = np.asarray(cam.normalized_to_pixels(xy_d, jnp.asarray(K)))
    frame = syn.render_frames(px_d.reshape(1, 1, 2), np.ones((1, 1), bool), size)[0]
    smap = cam.build_undistort_map(jnp.asarray(K), jnp.asarray(dist), size, size)
    und = np.asarray(cam.undistort_image(jnp.asarray(frame), smap))
    ys, xs = np.mgrid[0:size, 0:size]
    m = und.sum()
    cx, cy = (und * xs).sum() / m, (und * ys).sum() / m
    np.testing.assert_allclose([cx, cy], true_px, atol=0.5)


def test_rig_config_stacks():
    rig = RigConfig(num_cameras=3, image_size=128)
    assert rig.K_stack().shape == (3, 3, 3)
    assert rig.dist_stack().shape == (3, 5)
