"""Differential parity against the ACTUAL reference implementation.

These tests import the reference backend from /root/reference (hardware
seams stubbed — ``utils/reference_impl.py``), feed it and this framework
IDENTICAL detection streams, and assert the outputs agree:

- per-op: ``triangulate_points`` (``helpers.py:293-336``) and
  ``locate_objects`` (``helpers.py:424-480``);
- end-to-end: full tracked 2-drone trajectories through the reference's
  own correspondence + cv.KalmanFilter vs the framework pipeline, with
  the ATE-vs-reference bound of BASELINE.json checked directly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from low_cost_mocap_tpu.utils import reference_impl, synthetic as syn
from low_cost_mocap_tpu.utils import differential

pytestmark = pytest.mark.skipif(
    not reference_impl.reference_available(),
    reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref():
    return reference_impl.load_reference()


@pytest.fixture(scope="module")
def rig4():
    return differential.reference_rig()


def test_triangulate_points_matches_reference(ref, rig4):
    """Identical grouped observations -> identical 3D points (f32 vs the
    reference's f64 scipy SVD agree to ~1e-7 m on this rig)."""
    from low_cost_mocap_tpu.ops import camera as cam_ops, triangulate

    Rs, ts, rig = rig4
    rng = np.random.default_rng(3)
    X = syn.random_points(rng, 40)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.3, rng=rng)
    assert mask.all()

    poses = [{"R": Rs[i].tolist(), "t": ts[i].tolist()} for i in range(4)]
    ref_X = ref.helpers.triangulate_points(pts.astype(np.float64), poses)

    Ps = cam_ops.projection_matrix(jnp.asarray(rig.K_stack()),
                                   jnp.asarray(Rs), jnp.asarray(ts))
    repo_X, valid = triangulate.triangulate_points(
        jnp.asarray(pts), Ps, jnp.asarray(mask))
    assert np.asarray(valid).all()
    d = np.linalg.norm(np.asarray(ref_X) - np.asarray(repo_X), axis=1)
    assert d.max() < 1e-5  # metres

    # <2-view points: reference returns [None]*3 (helpers.py:300-301),
    # the framework flags valid=False
    mask2 = mask.copy()
    mask2[0, 1:] = False
    pts_ref = pts.astype(object).copy()
    pts_ref[0, 1:] = None
    ref_X2 = ref.helpers.triangulate_points(pts_ref, poses)
    assert all(v is None for v in np.asarray(ref_X2[0]).ravel())
    _, valid2 = triangulate.triangulate_points(
        jnp.asarray(pts), Ps, jnp.asarray(mask2))
    assert not bool(np.asarray(valid2)[0])
    assert np.asarray(valid2)[1:].all()


def test_locate_objects_matches_reference(ref, rig4):
    """Same point cloud -> same triples, positions, headings, identities.

    Axes matched to the reference convention (ax_h1=0, ax_h2=1,
    side_min=0) so this is a like-for-like comparison of the fit itself.
    """
    from low_cost_mocap_tpu.ops import rigid

    _, _, rig = rig4
    rng = np.random.default_rng(11)
    clouds = []
    for trial in range(8):
        # two drones + distractors, flat in the (0, 1) plane (reference
        # heading convention), constant comp-2
        pts = []
        for s, dlt in ((+1, +0.01), (-1, -0.01)):
            pos = rng.uniform(-0.5, 0.5, 3)
            phi = rng.uniform(-1.0, 1.0)
            u = np.array([np.cos(phi), np.sin(phi), 0.0])
            w = np.array([-np.sin(phi), np.cos(phi), 0.0])
            h = np.sqrt(rig.marker_dist_short ** 2
                        - (rig.marker_dist_long / 2) ** 2)
            pts += [pos + 0.075 * u, pos - 0.075 * u,
                    pos + s * h * w + np.array([0.0, dlt, 0.0])]
        pts += [rng.uniform(-0.5, 0.5, 3) + np.array([0, 0, 2.0]),
                rng.uniform(-0.5, 0.5, 3) - np.array([0, 0, 2.0])]
        clouds.append(np.asarray(pts))

    for cloud in clouds:
        errors = np.abs(np.random.default_rng(0).normal(size=len(cloud)))
        ref_objs = ref.helpers.locate_objects(cloud, errors)
        got = rigid.locate_objects(
            jnp.asarray(cloud, jnp.float32), jnp.asarray(errors, jnp.float32),
            jnp.ones(len(cloud), bool), dist1=rig.marker_dist_short,
            dist2=rig.marker_dist_long, tol=rig.marker_dist_tol,
            ax_h1=0, ax_h2=1, side_min=0.0)
        gv = np.asarray(got.valid)
        assert gv.sum() == len(ref_objs) == 2
        ref_by_idx = {o["droneIndex"]: o for o in ref_objs}
        for slot in np.flatnonzero(gv):
            idx = int(np.asarray(got.index)[slot])
            assert idx in ref_by_idx
            r = ref_by_idx[idx]
            np.testing.assert_allclose(np.asarray(got.pos)[slot], r["pos"],
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(got.heading)[slot],
                                       float(r["heading"]), atol=1e-5)
            np.testing.assert_allclose(np.asarray(got.error)[slot],
                                       float(r["error"]), atol=1e-5)


def test_tracked_trajectory_matches_reference_within_its_ate():
    """BASELINE.json clause, measured directly: full 2-drone trajectories
    through BOTH systems on identical detection streams.  The framework
    must (a) track every frame the reference tracks, (b) agree with the
    reference within the reference's own error vs ground truth, and
    (c) be at least as accurate as the reference."""
    m = differential.run_differential(T=240, noise_px=0.3, seed=7)
    for idx in (0, 1):
        r = m[idx]
        assert r["frames_common"] >= 230, r
        # (b): ref-vs-repo within the reference's own ATE bound
        assert r["ate_ref_vs_repo_mm"] <= r["ate_ref_vs_truth_mm"] * 1.10, r
        assert r["ate_ref_vs_repo_mm"] < 6.0, r
        # startup transient (different Kalman P0, documented) has decayed
        assert r["ate_ref_vs_repo_steady_mm"] < 3.0, r
        # (c): at least as accurate as the reference
        assert r["ate_repo_vs_truth_mm"] <= r["ate_ref_vs_truth_mm"], r


@pytest.mark.slow
def test_tracked_trajectory_zero_noise_structural_parity():
    """With exact detections the only remaining differences are the
    documented startup transient and f32 vs f64: steady state must agree
    to sub-millimetre."""
    m = differential.run_differential(T=240, noise_px=0.0, seed=7)
    for idx in (0, 1):
        r = m[idx]
        assert r["frames_common"] == 240, r
        assert r["ate_ref_vs_repo_steady_mm"] < 0.8, r
