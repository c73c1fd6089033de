import numpy as np
import jax
import jax.numpy as jnp
import cv2 as cv

from low_cost_mocap_tpu.ops import ransac as ransac_ops
from low_cost_mocap_tpu.ops import ba as ba_ops
from low_cost_mocap_tpu.ops import camera, triangulate
from low_cost_mocap_tpu.models import calibrator
from low_cost_mocap_tpu.utils import synthetic as syn


def _correspondences(n=100, noise=0.5, outliers=0, seed=0, n_cams=2):
    Rs, ts, rig = syn.ring_rig(num_cameras=n_cams)
    rng = np.random.default_rng(seed)
    X = syn.random_points(rng, n)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=noise, rng=rng)
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        pts[idx, 1] = rng.random((outliers, 2)) * 300
    return X, pts, mask, Rs, ts, rig


def test_ransac_fundamental_inliers_and_accuracy():
    X, pts, mask, Rs, ts, rig = _correspondences(n=120, noise=0.3, outliers=30)
    key = jax.random.PRNGKey(0)
    F, inl = ransac_ops.ransac_fundamental(
        key, jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
        jnp.asarray(mask.all(axis=1)))
    inl = np.asarray(inl)
    # most non-outlier points recovered as inliers
    assert inl.sum() >= 70
    # F maps true correspondences to near-zero epipolar residual
    Ffit = np.asarray(F)
    ref, _ = cv.findFundamentalMat(pts[:, 0].astype(np.float64),
                                   pts[:, 1].astype(np.float64),
                                   cv.FM_RANSAC, 1.0, 0.99999)
    # compare by action: sampson distance of clean points under both
    from low_cost_mocap_tpu.ops.epipolar import sampson_distance
    clean = np.setdiff1d(np.arange(120), np.arange(120)[~inl])
    d_ours = np.asarray(sampson_distance(jnp.asarray(pts[clean, 0]),
                                         jnp.asarray(pts[clean, 1]), jnp.asarray(Ffit)))
    d_ref = np.asarray(sampson_distance(jnp.asarray(pts[clean, 0]),
                                        jnp.asarray(pts[clean, 1]),
                                        jnp.asarray(ref.astype(np.float32))))
    assert np.sqrt(np.median(d_ours)) < 1.0
    assert np.sqrt(np.median(d_ours)) < np.sqrt(np.median(d_ref)) + 0.5


def test_bootstrap_poses_recovers_relative_geometry():
    X, pts, mask, Rs, ts, rig = _correspondences(n=80, noise=0.2, seed=2)
    key = jax.random.PRNGKey(1)
    Rb, tb = calibrator.bootstrap_poses(key, jnp.asarray(pts), jnp.asarray(mask),
                                        jnp.asarray(rig.K_stack()))
    # true relative pose (cam1 w.r.t. cam0, up to translation scale)
    R_rel_true = Rs[1] @ Rs[0].T
    t_rel_true = ts[1] - R_rel_true @ ts[0]
    t_rel_true /= np.linalg.norm(t_rel_true)
    np.testing.assert_allclose(np.asarray(Rb[1]), R_rel_true, atol=5e-2)
    t_est = np.array(tb[1])
    t_est = t_est / np.linalg.norm(t_est)
    assert min(np.abs(t_est - t_rel_true).max(),
               np.abs(t_est + t_rel_true).max()) < 5e-2


def test_ba_param_pack_roundtrip():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    # express poses in the camera-0 frame (the BA gauge: camera 0 = identity)
    R0, t0 = Rs[0].copy(), ts[0].copy()
    Rs = np.einsum("cij,jk->cik", Rs, R0.T)
    ts = ts - np.einsum("cij,j->ci", Rs, t0)
    focals = rig.K_stack()[:, 0, 0]
    p = ba_ops.pack_params(jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(focals))
    assert p.shape == (1 + 7 * 3,)
    R2, t2, f2 = ba_ops.unpack_params(p, 4)
    np.testing.assert_allclose(np.asarray(R2), Rs, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2)[1:], ts[1:], atol=1e-5)
    np.testing.assert_allclose(np.asarray(f2), focals, atol=1e-4)


def test_bundle_adjust_reduces_error_from_perturbed_poses():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    rng = np.random.default_rng(3)
    X = syn.random_points(rng, 60)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.3, rng=rng)
    # express in camera-0 frame (BA gauge), then perturb cameras 1..3
    R0, t0 = Rs[0].copy(), ts[0].copy()
    Rs = np.einsum("cij,jk->cik", Rs, R0.T).astype(np.float32)
    ts = (ts - np.einsum("cij,j->ci", Rs, t0)).astype(np.float32)
    from low_cost_mocap_tpu.ops import rotations as rot
    dR = np.asarray(rot.rotvec_to_matrix(jnp.asarray(
        rng.normal(scale=0.03, size=(4, 3)).astype(np.float32))))
    Rs_p = np.einsum("cij,cjk->cik", dR, Rs).astype(np.float32)
    ts_p = (ts + rng.normal(scale=0.05, size=ts.shape)).astype(np.float32)
    Rs_p[0], ts_p[0] = np.eye(3, dtype=np.float32), 0  # keep gauge

    # world frame = camera-0 frame for BA comparison
    def err_for(Rs_, ts_):
        Ps = camera.projection_matrix(jnp.asarray(rig.K_stack()),
                                      jnp.asarray(Rs_), jnp.asarray(ts_))
        Xh, _ = triangulate.triangulate_points(jnp.asarray(pts), Ps, jnp.asarray(mask))
        e = triangulate.reprojection_errors(jnp.asarray(pts), Xh, Ps, jnp.asarray(mask))
        return float(jnp.mean(jnp.where(jnp.isfinite(e), e, 0.0)))

    e_perturbed = err_for(Rs_p, ts_p)
    res = ba_ops.bundle_adjust(jnp.asarray(pts), jnp.asarray(mask),
                               jnp.asarray(rig.K_stack()),
                               jnp.asarray(Rs_p), jnp.asarray(ts_p),
                               num_cameras=4, max_iters=40)
    e_after = err_for(np.asarray(res.Rs), np.asarray(res.ts))
    assert e_perturbed > 1.0          # perturbation really hurt
    assert e_after < 0.35             # BA pulls it back to ~noise level
    assert e_after < e_perturbed / 10


def test_bundle_adjust_freeze_focals_pins_intrinsics():
    """Extrinsics-only BA: focals must come out exactly as K's and the
    refinement must still fix the perturbed extrinsics (the live-recalib
    path applies Rs/ts against the ORIGINAL K — advisor round-1 finding)."""
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    rng = np.random.default_rng(9)
    X = syn.random_points(rng, 60)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.3, rng=rng)
    R0, t0 = Rs[0].copy(), ts[0].copy()
    Rs = np.einsum("cij,jk->cik", Rs, R0.T).astype(np.float32)
    ts = (ts - np.einsum("cij,j->ci", Rs, t0)).astype(np.float32)
    from low_cost_mocap_tpu.ops import rotations as rot
    dR = np.asarray(rot.rotvec_to_matrix(jnp.asarray(
        rng.normal(scale=0.02, size=(4, 3)).astype(np.float32))))
    Rs_p = np.einsum("cij,cjk->cik", dR, Rs).astype(np.float32)
    ts_p = (ts + rng.normal(scale=0.03, size=ts.shape)).astype(np.float32)
    Rs_p[0], ts_p[0] = np.eye(3, dtype=np.float32), 0

    res = ba_ops.bundle_adjust(jnp.asarray(pts), jnp.asarray(mask),
                               jnp.asarray(rig.K_stack()),
                               jnp.asarray(Rs_p), jnp.asarray(ts_p),
                               num_cameras=4, max_iters=40,
                               freeze_focals=True)
    np.testing.assert_array_equal(np.asarray(res.focals),
                                  rig.K_stack()[:, 0, 0])
    Ps = camera.projection_matrix(jnp.asarray(rig.K_stack()),
                                  res.Rs, res.ts)
    Xh, _ = triangulate.triangulate_points(jnp.asarray(pts), Ps,
                                           jnp.asarray(mask))
    e = triangulate.reprojection_errors(jnp.asarray(pts), Xh, Ps,
                                        jnp.asarray(mask))
    assert float(jnp.mean(e)) < 0.35


def test_full_calibrate_pipeline():
    Rs, ts, rig = syn.ring_rig(num_cameras=3)
    rng = np.random.default_rng(4)
    X = syn.random_points(rng, 80)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.3, rng=rng)
    res = calibrator.calibrate(jax.random.PRNGKey(2), jnp.asarray(pts),
                               jnp.asarray(mask), jnp.asarray(rig.K_stack()),
                               ba_iters=40)
    assert float(res.mean_error) < 0.5  # mean squared px error ~ noise^2 level
