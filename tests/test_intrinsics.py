"""Intrinsic (Zhang) calibration: golden parity vs cv2.calibrateCamera,
masked/NaN robustness, RMS convention, and dot-grid ordering through the
real blob detector.

The reference never produces intrinsics — it loads a pre-made
``computer_code/api/camera-params.json`` (``computer_code/api/helpers.py:19-22``)
and leaves calibration to an external tool; ``ops/intrinsics.py`` closes
that day-one gap, and these tests pin it to OpenCV's answer.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from low_cost_mocap_tpu.ops import intrinsics as intr

K_TRUE = np.array([[300.0, 0.0, 162.0],
                   [0.0, 295.0, 158.0],
                   [0.0, 0.0, 1.0]], np.float64)
DIST_TRUE = np.array([0.08, -0.12, 0.001, -0.0005, 0.05], np.float64)
ROWS, COLS, SPACING = 5, 7, 0.04


def _poses(n_views: int):
    """Varied board poses: tilted, rotated, translated, all in view."""
    rng = np.random.default_rng(7)
    poses = []
    for v in range(n_views):
        ax = np.deg2rad(rng.uniform(-30, 30))
        ay = np.deg2rad(rng.uniform(-30, 30))
        az = np.deg2rad(rng.uniform(-25, 25))
        rvec = np.array([ax, ay, az])
        # board extent is 0.24 x 0.16 m; centre it and push it out
        t = np.array([
            -0.12 + rng.uniform(-0.03, 0.03),
            -0.08 + rng.uniform(-0.03, 0.03),
            rng.uniform(0.55, 0.8),
        ])
        poses.append((rvec, t))
    return poses


def _views(n_views: int, noise_px: float = 0.0, seed: int = 0):
    """(board_xy (N,2), obj3 (N,3), img_pts (V,N,2)) via cv2.projectPoints
    (an implementation-independent projector)."""
    board = intr.make_grid(ROWS, COLS, SPACING).astype(np.float64)
    obj3 = np.concatenate([board, np.zeros((len(board), 1))], axis=-1)
    rng = np.random.default_rng(seed)
    img = []
    for rvec, t in _poses(n_views):
        uv, _ = cv2.projectPoints(obj3, rvec, t, K_TRUE, DIST_TRUE)
        uv = uv.reshape(-1, 2)
        if noise_px > 0:
            uv = uv + rng.normal(scale=noise_px, size=uv.shape)
        img.append(uv)
    img = np.stack(img)
    assert (img > 0).all() and (img < 320).all(), "board left the frame"
    return board.astype(np.float32), obj3, img


def test_golden_vs_cv2_calibrate_camera():
    """K within 0.5% / dist within tolerance / RMS parity vs OpenCV."""
    board, obj3, img = _views(10, noise_px=0.15)
    res = intr.calibrate_intrinsics(board, img.astype(np.float32))
    assert int(res.iters) > 0

    rms_cv, K_cv, dist_cv, _, _ = cv2.calibrateCamera(
        [obj3.astype(np.float32)] * len(img),
        [im.reshape(-1, 1, 2).astype(np.float32) for im in img],
        (320, 320), None, None)
    K = np.asarray(res.K, np.float64)
    for (i, j) in ((0, 0), (1, 1), (0, 2), (1, 2)):
        assert abs(K[i, j] - K_cv[i, j]) < 0.005 * abs(K_cv[i, j]), (
            (i, j), K[i, j], K_cv[i, j])
    dist = np.asarray(res.dist, np.float64)
    np.testing.assert_allclose(dist, dist_cv.reshape(-1), atol=0.02)
    # same convention (per-point RMS), same data -> near-identical quality
    assert abs(float(res.rms_px) - rms_cv) < 0.3 * rms_cv + 0.02, (
        float(res.rms_px), rms_cv)
    # and both recover the ground truth
    np.testing.assert_allclose(K[:2], K_TRUE[:2], rtol=0.01)


def test_noiseless_recovery_is_exact():
    board, _, img = _views(8, noise_px=0.0)
    res = intr.calibrate_intrinsics(board, img.astype(np.float32))
    assert float(res.rms_px) < 5e-3
    np.testing.assert_allclose(np.asarray(res.K), K_TRUE, atol=0.2)
    np.testing.assert_allclose(np.asarray(res.dist), DIST_TRUE, atol=2e-3)


def test_masked_slots_and_nan_sentinels():
    """A fully-masked view + NaN-filled masked points must not poison the
    solve (advisor r2: damping floor + sentinel sanitisation)."""
    board, _, img = _views(9, noise_px=0.1)
    img = img.astype(np.float32)
    mask = np.ones(img.shape[:2], bool)
    mask[3] = False                       # one dead view
    rng = np.random.default_rng(3)
    drop = rng.random(mask.shape) < 0.15  # scattered missing detections
    mask &= ~drop
    img[~mask] = np.nan                   # the natural sentinel
    res = intr.calibrate_intrinsics(board, img, mask=mask)
    assert np.isfinite(np.asarray(res.K)).all()
    assert np.isfinite(float(res.rms_px))
    assert int(res.iters) > 0, "LM rejected every step (NaN damping?)"
    np.testing.assert_allclose(np.asarray(res.K)[:2], K_TRUE[:2], rtol=0.02)


def test_too_few_views_raises():
    board, _, img = _views(4)
    with pytest.raises(ValueError):
        intr.calibrate_intrinsics(board, img[:2].astype(np.float32))


def _grid_symmetries(rows, cols):
    """The 4 labelings indistinguishable for an unmarked rows x cols grid
    (identity, 180-degree rotation, and the two mirrors — a mirror
    relabelling composes with the homography, so it snaps exactly too)."""
    k = np.arange(rows * cols)
    r, c = k // cols, k % cols
    return [
        k,
        (rows - 1 - r) * cols + (cols - 1 - c),
        r * cols + (cols - 1 - c),
        (rows - 1 - r) * cols + c,
    ]


def _grid_ok(order, true_node_of_point, rows, cols):
    """order recovers the generating labelling up to grid symmetry."""
    if order is None:
        return False
    labels = true_node_of_point[order]
    return any(np.array_equal(labels, s) for s in _grid_symmetries(rows, cols))


def test_order_grid_permutation_recovery():
    board = intr.make_grid(ROWS, COLS, SPACING).astype(np.float64)
    obj3 = np.concatenate([board, np.zeros((len(board), 1))], axis=-1)
    rng = np.random.default_rng(11)
    for rvec, t in _poses(6):
        uv, _ = cv2.projectPoints(obj3, rvec, t, K_TRUE, DIST_TRUE)
        uv = uv.reshape(-1, 2)
        perm = rng.permutation(len(uv))
        order, resid = intr.order_grid(uv[perm], ROWS, COLS)
        assert order is not None, "ordering failed on a plain view"
        assert resid < 0.1
        # point j of the permuted set is grid node perm[j]
        assert _grid_ok(order, perm, ROWS, COLS)


def test_order_grid_rejects_wrong_count():
    board = intr.make_grid(ROWS, COLS, SPACING)
    order, resid = intr.order_grid(board[:-1], ROWS, COLS)
    assert order is None


def test_engine_calibrate_intrinsics_event(tmp_path):
    """The calibrate-intrinsics event end-to-end: dot-grid frames in,
    per-view capture with progress events, K applied to the live rig,
    artifact persisted and reloaded by a fresh engine."""
    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.runtime.engine import Engine
    from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
    from low_cost_mocap_tpu.runtime.sources import SyntheticSource
    from low_cost_mocap_tpu.utils import synthetic as syn
    from low_cost_mocap_tpu.utils.synthetic import render_frames

    Rs, ts, rig = syn.ring_rig(num_cameras=2)
    eng = Engine(rig, EngineConfig(), SyntheticSource(rig, Rs, ts),
                 CollectingLink(), artifacts_dir=str(tmp_path))

    rows, cols, spacing = 4, 5, 0.05
    board = intr.make_grid(rows, cols, spacing).astype(np.float64)
    obj3 = np.concatenate([board, np.zeros((len(board), 1))], axis=-1)
    n = rows * cols
    S = rig.image_size
    K_t = np.array([[0.8 * S, 0.0, S / 2 + 3.0],
                    [0.0, 0.79 * S, S / 2 - 4.0],
                    [0.0, 0.0, 1.0]])

    got = {"views": 0, "result": None}
    eng.on("intrinsics-views", lambda d: got.__setitem__("views", d["views"]))
    eng.on("camera-intrinsics", lambda d: got.__setitem__("result", d))
    eng.handle("calibrate-intrinsics",
               {"startOrStop": "start", "cameraIndex": 0,
                "rows": rows, "cols": cols, "spacing": spacing})

    rng = np.random.default_rng(9)
    fed = 0
    while fed < 10 and got["views"] < 6:
        rvec = np.deg2rad(rng.uniform(-25, 25, size=3) * [1, 1, 0.7])
        t = np.array([-0.10 + rng.uniform(-0.02, 0.02),
                      -0.08 + rng.uniform(-0.02, 0.02),
                      rng.uniform(0.5, 0.7)])
        uv, _ = cv2.projectPoints(obj3, rvec, t, K_t, np.zeros(5))
        uv = uv.reshape(-1, 2)
        if not ((uv > 4).all() and (uv < S - 5).all()):
            continue
        f0 = render_frames(uv[:, None, :].astype(np.float32),
                           np.ones((n, 1), bool), S, sigma=1.2)
        frames = np.zeros((rig.num_cameras, S, S), np.uint8)
        frames[0] = (f0[0] * 255).astype(np.uint8)
        eng.process_frame(frames, 1 / 60)
        fed += 1
    assert got["views"] >= 3, f"only {got['views']} views captured"

    eng.handle("calibrate-intrinsics", {"startOrStop": "stop"})
    res = got["result"]
    assert res is not None and res["error"] is None and res["applied"]
    K = np.asarray(res["K"])
    np.testing.assert_allclose(K[0, 0], K_t[0, 0], rtol=0.03)
    np.testing.assert_allclose(K[1, 1], K_t[1, 1], rtol=0.03)
    # applied to the live rig + runtime arrays
    np.testing.assert_allclose(eng.rig.cameras[0].K(), K, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(eng._K)[0], K, rtol=1e-5)
    # persisted; a fresh engine picks it up
    eng2 = Engine(rig, EngineConfig(), SyntheticSource(rig, Rs, ts),
                  CollectingLink(), artifacts_dir=str(tmp_path))
    np.testing.assert_allclose(eng2.rig.cameras[0].K(), K, rtol=1e-5)


def test_calibration_through_real_detector():
    """End-to-end: render dot-grid frames, detect blobs with the real
    detector, order them with order_grid, calibrate — K recovered."""
    from low_cost_mocap_tpu.ops import detect
    from low_cost_mocap_tpu.utils.synthetic import render_frames

    rows, cols, spacing = 4, 5, 0.05
    board = intr.make_grid(rows, cols, spacing).astype(np.float64)
    obj3 = np.concatenate([board, np.zeros((len(board), 1))], axis=-1)
    n = rows * cols
    K_t = np.array([[210.0, 0.0, 128.0],
                    [0.0, 205.0, 126.0],
                    [0.0, 0.0, 1.0]])
    dist_t = np.zeros(5)

    views = []
    rng = np.random.default_rng(5)
    for v in range(6):
        rvec = np.deg2rad(rng.uniform(-22, 22, size=3) * [1, 1, 0.8])
        t = np.array([-0.10 + rng.uniform(-0.02, 0.02),
                      -0.08 + rng.uniform(-0.02, 0.02),
                      rng.uniform(0.45, 0.6)])
        uv, _ = cv2.projectPoints(obj3, rvec, t, K_t, dist_t)
        uv = uv.reshape(-1, 2)
        assert (uv > 4).all() and (uv < 251).all()
        frames = render_frames(uv[:, None, :].astype(np.float32),
                               np.ones((n, 1), bool), 256, sigma=1.2)
        blobs, valid, _ = detect.find_blobs_multi(
            frames, 0.2, n + 4, cc_iters=24)
        pts = np.asarray(blobs)[0][np.asarray(valid)[0]]
        assert len(pts) == n, "detector missed a dot"
        order, _ = intr.order_grid(pts, rows, cols)
        assert order is not None
        views.append(pts[order])

    res = intr.calibrate_intrinsics(
        board.astype(np.float32), np.stack(views).astype(np.float32))
    K = np.asarray(res.K)
    # 180-degree grid ambiguity only flips extrinsics, not K
    assert float(res.rms_px) < 0.5
    np.testing.assert_allclose(K[0, 0], K_t[0, 0], rtol=0.02)
    np.testing.assert_allclose(K[1, 1], K_t[1, 1], rtol=0.02)
    np.testing.assert_allclose(K[0, 2], K_t[0, 2], rtol=0.03)
    np.testing.assert_allclose(K[1, 2], K_t[1, 2], rtol=0.03)
