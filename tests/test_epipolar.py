import numpy as np
import jax.numpy as jnp

from low_cost_mocap_tpu.ops import camera as cam
from low_cost_mocap_tpu.ops import epipolar as epi
from low_cost_mocap_tpu.ops import triangulate as tri
from low_cost_mocap_tpu.utils import synthetic as syn


def _pair():
    Rs, ts, rig = syn.ring_rig(num_cameras=2, radius=2.0)
    K = rig.K_stack()
    Ps = np.asarray(cam.projection_matrix(jnp.asarray(K), jnp.asarray(Rs), jnp.asarray(ts)))
    return Rs, ts, rig, K, Ps


def test_fundamental_from_projections_epipolar_constraint():
    Rs, ts, rig, K, Ps = _pair()
    rng = np.random.default_rng(20)
    X = syn.random_points(rng, 50)
    pts, mask = syn.observe(X, Rs, ts, rig)
    assert mask.all()
    F = np.asarray(epi.fundamental_from_projections(jnp.asarray(Ps[0]), jnp.asarray(Ps[1])))
    p1 = np.concatenate([pts[:, 0], np.ones((50, 1), np.float32)], axis=1)
    p2 = np.concatenate([pts[:, 1], np.ones((50, 1), np.float32)], axis=1)
    resid = np.einsum("ni,ij,nj->n", p2, F, p1)
    # normalise: epipolar constraint x2' F x1 = 0 up to scale of F
    assert np.abs(resid).max() / (np.abs(F).max() * 320 * 320) < 1e-5


def test_epiline_distance_zero_for_true_match():
    Rs, ts, rig, K, Ps = _pair()
    rng = np.random.default_rng(21)
    X = syn.random_points(rng, 20)
    pts, _ = syn.observe(X, Rs, ts, rig)
    F = epi.fundamental_from_projections(jnp.asarray(Ps[0]), jnp.asarray(Ps[1]))
    lines = epi.epiline(jnp.asarray(pts[:, 0]), F)
    d = np.asarray(epi.point_line_distance(jnp.asarray(pts[:, 1]), lines))
    assert d.max() < 0.1  # sub-0.1 px for perfect observations


def test_epiline_matches_opencv():
    import cv2 as cv
    Rs, ts, rig, K, Ps = _pair()
    rng = np.random.default_rng(22)
    X = syn.random_points(rng, 10)
    pts, _ = syn.observe(X, Rs, ts, rig)
    F = np.asarray(epi.fundamental_from_projections(jnp.asarray(Ps[0]), jnp.asarray(Ps[1])))
    ours = np.asarray(epi.epiline(jnp.asarray(pts[:, 0]), jnp.asarray(F)))
    ref = cv.computeCorrespondEpilines(pts[:, 0].reshape(-1, 1, 2).astype(np.float64), 1,
                                       F.astype(np.float64))[:, 0, :]
    # lines match up to global sign
    for o, r in zip(ours, ref):
        assert min(np.abs(o - r).max(), np.abs(o + r).max()) < 1e-3


def test_motion_from_essential_recovers_pose():
    """E from true relative pose -> one of the 4 candidates matches (R, t̂)."""
    Rs, ts, rig, K, Ps = _pair()
    # relative pose camera0 -> camera1 (world frame of cam0)
    R_rel = Rs[1] @ Rs[0].T
    t_rel = ts[1] - R_rel @ ts[0]
    E = epi.hat(jnp.asarray(t_rel)) @ jnp.asarray(R_rel)
    Rcands, tcands = epi.motion_from_essential(E)
    t_unit = t_rel / np.linalg.norm(t_rel)
    found = False
    for i in range(4):
        dR = np.abs(np.asarray(Rcands[i]) - R_rel).max()
        dt = np.abs(np.asarray(tcands[i]) - t_unit).max()
        if dR < 1e-4 and dt < 1e-4:
            found = True
    assert found


def test_essential_from_fundamental_consistency():
    Rs, ts, rig, K, Ps = _pair()
    F = epi.fundamental_from_projections(jnp.asarray(Ps[0]), jnp.asarray(Ps[1]))
    E = np.asarray(epi.essential_from_fundamental(F, jnp.asarray(K[0]), jnp.asarray(K[1])))
    # essential matrix property: 2 equal singular values, third ~0
    s = np.linalg.svd(E, compute_uv=False)
    assert s[2] / s[0] < 1e-4
    np.testing.assert_allclose(s[0], s[1], rtol=1e-3)


def test_sampson_distance_small_for_inliers():
    Rs, ts, rig, K, Ps = _pair()
    rng = np.random.default_rng(23)
    X = syn.random_points(rng, 30)
    pts, _ = syn.observe(X, Rs, ts, rig)
    F = epi.fundamental_from_projections(jnp.asarray(Ps[0]), jnp.asarray(Ps[1]))
    F = F / jnp.linalg.norm(F)
    d_in = np.asarray(epi.sampson_distance(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), F))
    assert np.sqrt(d_in.max()) < 0.1
    # outliers (shuffled correspondences) should be far
    perm = rng.permutation(30)
    d_out = np.asarray(epi.sampson_distance(jnp.asarray(pts[:, 0]), jnp.asarray(pts[perm, 1]), F))
    assert np.median(np.sqrt(d_out)) > 5.0
