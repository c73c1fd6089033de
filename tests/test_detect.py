import numpy as np
import jax.numpy as jnp
import cv2 as cv

from low_cost_mocap_tpu.ops import detect
from low_cost_mocap_tpu.utils import synthetic as syn


def _frame_with_blobs(centers, size=320, sigma=1.5):
    pts = np.asarray(centers, np.float32).reshape(-1, 1, 2)
    mask = np.ones((len(pts), 1), bool)
    return syn.render_frames(pts, mask, size, sigma=sigma)[0]


def test_detects_isolated_blobs():
    centers = [[50.0, 60.0], [200.5, 120.25], [280.0, 300.0]]
    frame = _frame_with_blobs(centers)
    c, valid, sizes = detect.find_blobs(jnp.asarray(frame), 0.2, max_blobs=8)
    c, valid = np.asarray(c), np.asarray(valid)
    assert valid.sum() == 3
    got = c[valid]
    for ctr in centers:
        d = np.linalg.norm(got - np.asarray(ctr), axis=1).min()
        assert d < 0.5, (ctr, got)


def test_no_blobs_all_invalid():
    frame = np.zeros((320, 320), np.float32)
    _, valid, _ = detect.find_blobs(jnp.asarray(frame), 0.2, max_blobs=8)
    assert not np.asarray(valid).any()


def test_more_blobs_than_slots_keeps_first_k():
    rng = np.random.default_rng(0)
    centers = rng.random((12, 2)) * 280 + 20
    frame = _frame_with_blobs(centers)
    c, valid, _ = detect.find_blobs(jnp.asarray(frame), 0.2, max_blobs=4)
    assert np.asarray(valid).sum() == 4


def test_touching_blobs_merge_to_one_component():
    # two gaussians 3px apart merge into one thresholded region
    frame = _frame_with_blobs([[100.0, 100.0], [103.0, 100.0]])
    c, valid, _ = detect.find_blobs(jnp.asarray(frame), 0.2, max_blobs=8)
    assert np.asarray(valid).sum() == 1
    np.testing.assert_allclose(np.asarray(c)[0], [101.5, 100.0], atol=0.6)


def test_matches_opencv_connected_components():
    rng = np.random.default_rng(1)
    centers = rng.random((6, 2)) * 280 + 20
    frame = _frame_with_blobs(centers)
    ours_c, ours_v, _ = detect.find_blobs(jnp.asarray(frame), 0.2, max_blobs=8)
    ours = np.asarray(ours_c)[np.asarray(ours_v)]

    binary = ((frame > 0.2) * 255).astype(np.uint8)
    n, _, _, cv_centroids = cv.connectedComponentsWithStats(binary, connectivity=8)
    ref = cv_centroids[1:]  # drop background
    assert len(ours) == len(ref)
    for r in ref:
        assert np.linalg.norm(ours - r, axis=1).min() < 0.75


def test_preprocess_matches_two_pass_opencv():
    """Fused blur+sharpen conv == OpenCV GaussianBlur then filter2D
    (computer_code/api/helpers.py:75-81 semantics, float, no uint8 rounding)."""
    rng = np.random.default_rng(2)
    frame = (rng.random((64, 64)) * 0.3).astype(np.float32)
    frame[20:24, 30:34] = 1.0
    ours = np.asarray(detect.preprocess(jnp.asarray(frame[None])))[0]
    blurred = cv.GaussianBlur(frame, (9, 9), 0)
    ref = cv.filter2D(blurred, -1, detect.SHARPEN_KERNEL)
    ref = np.clip(ref, 0.0, 1.0)
    # interior only: border handling differs (zero-pad vs reflect)
    np.testing.assert_allclose(ours[8:-8, 8:-8], ref[8:-8, 8:-8], atol=2e-2)


def test_multi_camera_vmap():
    centers = [[50.0, 60.0], [200.0, 120.0]]
    f0 = _frame_with_blobs(centers)
    f1 = _frame_with_blobs([[10.0, 10.0]])
    frames = np.stack([f0, f1])
    c, valid, _ = detect.find_blobs_multi(jnp.asarray(frames), 0.2, max_blobs=8)
    assert np.asarray(valid)[0].sum() == 2
    assert np.asarray(valid)[1].sum() == 1


def test_integer_centroids_mode():
    frame = _frame_with_blobs([[100.6, 50.4]])
    c, valid, _ = detect.find_blobs(jnp.asarray(frame), 0.2, max_blobs=4,
                                    integer_centroids=True)
    c = np.asarray(c)[np.asarray(valid)]
    assert c[0][0] == np.floor(c[0][0]) and c[0][1] == np.floor(c[0][1])
