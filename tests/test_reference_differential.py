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


def test_partial_occlusion_tracks_through_where_reference_drops_out():
    """HARD REGIME: one camera loses one drone's markers for 40 frames
    (markers leaving a view — the clean harness never exercises this).

    Measured divergence, documented here: the reference's hypothesis
    growth FORCES a camera point into every group whenever anything
    passes the 5 px epipolar gate (``helpers.py:385-399`` has no skip
    branch in the else-arm), so when camera 2 loses drone A while
    drone B's points still gate-pass A's epilines, every A-group is
    poisoned and the reference emits NOTHING for A during the entire
    window (0/40 frames, measured).  This framework's matcher always
    enumerates the miss option (``ops/correspond.py`` ``n_opt``) and —
    when a camera-0 root's winner collides with another camera-0 root's
    (the two-objects-aligned-in-one-view ghost geometry) — re-selects
    its best non-duplicate >= 3-view assembly (dedupe-aware winner
    re-selection, ``ops/correspond.py``), recovering most of the window.
    """
    m = differential.run_differential(T=140, occlusions=((60, 100, 2, 0, 3),))
    occluded, clear = m[0], m[1]
    # the reference loses exactly the occlusion window
    assert occluded["frames_ref"] <= 100, occluded
    # we track over 2/3 of what it drops (measured 127 vs its 100)
    assert occluded["frames_repo"] >= occluded["frames_ref"] + 20, occluded
    # on common frames we stay within the reference's own error...
    assert (occluded["ate_ref_vs_repo_mm"]
            <= occluded["ate_ref_vs_truth_mm"] * 1.10), occluded
    # ...and hold ground truth ~4x better through the disturbance
    assert (occluded["ate_repo_vs_truth_mm"]
            <= occluded["ate_ref_vs_truth_mm"] * 0.45), occluded
    # the unoccluded drone is unaffected: steady parity as in clean scenes
    assert clear["ate_ref_vs_repo_steady_mm"] < 3.0, clear
    assert clear["frames_common"] >= 135, clear


def test_full_dropout_reacquisition():
    """HARD REGIME: a drone vanishes from ALL cameras for 30 frames
    (0.5 s).  Both systems emit nothing during the gap (the reference
    ``continue``s without advancing its filter, ``KalmanFilter.py:61-63``;
    this framework freezes the bank the same way).  At reacquisition the
    reference's finite-difference velocity spikes by the gap length
    (``KalmanFilter.py:79`` divides a 30-frame displacement by one frame
    dt); this framework re-seeds the filter after ``gap_reset_s``
    (``ops/kalman.py``) and must reconverge FASTER than the reference."""
    m = differential.run_differential(T=200, occlusions=((80, 110, -1, 0, 3),))
    r = m[0]
    # coverage: both systems lose (only) roughly the gap
    assert r["frames_ref"] >= 165 and r["frames_repo"] >= 160, r
    # steady-state (excluding gap + 60-frame reacquisition window): parity
    assert r["ate_ref_vs_repo_steady_mm"] < 3.0, r
    # reacquisition transient: the re-seeded bank beats the reference's
    # velocity-spike reconvergence by a wide margin (measured 2.2 vs
    # 10.7 mm RMS over the 60 frames after the gap)
    assert (r["postgap_repo_vs_truth_mm"]
            <= r["postgap_ref_vs_truth_mm"] * 0.6), r
    # the never-occluded drone stays in clean-scene parity
    assert m[1]["ate_ref_vs_repo_steady_mm"] < 3.0, m[1]


def test_distractor_blobs_parity():
    """HARD REGIME: two persistent false blobs per camera (reflections),
    identical in both streams.  They are epipolar-inconsistent across
    views, so they exercise ghost handling: unmatched points become new
    roots in both systems (``helpers.py:402-406``); the garbage 3D points
    they spawn must die in ``locate_objects``'s geometry gates / the
    dedupe pass without disturbing the tracked drones."""
    m = differential.run_differential(T=140, n_distractors=2)
    for idx in (0, 1):
        r = m[idx]
        assert r["frames_common"] >= 125, r
        assert r["ate_ref_vs_repo_steady_mm"] < 3.0, r
        # neither system degrades much vs its clean-scene accuracy
        assert r["ate_repo_vs_truth_steady_mm"] < 3.5, r
        # and we remain at least as accurate as the reference overall
        assert r["ate_repo_vs_truth_mm"] <= r["ate_ref_vs_truth_mm"], r


def test_crowded_scene_beyond_candidate_budget():
    """HARD REGIME: four extra free-flying real markers (10 markers
    total) so gate-passing candidate counts routinely exceed
    ``max_candidates_per_cam = 2`` — the regime where this framework's
    fixed-budget matcher truncates candidates the reference's unbounded
    cartesian growth keeps (``helpers.py:394-400``).  The truncation must
    not cost tracking parity: the budget keeps the CLOSEST candidates by
    epipolar distance (the reference sorts the same way,
    ``helpers.py:383-385``), and the per-root argmin still sees the true
    assembly."""
    m = differential.run_differential(T=140, n_extra_markers=4,
                                      max_blobs=16)
    for idx in (0, 1):
        r = m[idx]
        assert r["frames_common"] >= 130, r
        assert r["ate_ref_vs_repo_steady_mm"] < 3.5, r
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


def test_reprojection_errors_match_reference(ref, rig4):
    """Identical (points, 3D, poses) -> identical per-point mean squared
    pixel error (reference helpers.py:203-241 vs ops/triangulate.py)."""
    from low_cost_mocap_tpu.ops import camera as cam_ops, triangulate as tri

    Rs, ts, rig = rig4
    rng = np.random.default_rng(9)
    X = syn.random_points(rng, 25)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.7, rng=rng)
    assert mask.all()
    poses = [{"R": Rs[i].tolist(), "t": ts[i].tolist()} for i in range(4)]

    ref_err = ref.helpers.calculate_reprojection_errors(
        pts.astype(np.float64), X.astype(np.float64), poses)
    Ps = cam_ops.projection_matrix(jnp.asarray(rig.K_stack()),
                                   jnp.asarray(Rs), jnp.asarray(ts))
    ours = np.asarray(tri.reprojection_errors(
        jnp.asarray(pts), jnp.asarray(X), Ps, jnp.asarray(mask)))
    np.testing.assert_allclose(ours, np.asarray(ref_err), rtol=1e-4,
                               atol=1e-5)


def test_lowpass_filter_matches_reference_stream(ref):
    """The reference LowPassFilter re-runs lfilter over a growing buffer
    (LowPassFilter.py:14-23); for streams shorter than its 300-sample
    truncation that equals our O(1) streaming IIR exactly."""
    from low_cost_mocap_tpu.ops import lowpass

    rng = np.random.default_rng(2)
    x = rng.normal(size=(250, 3)).astype(np.float64)
    lpf_ref = ref.LowPassFilter.LowPassFilter(
        cutoff_frequency=20, sampling_frequency=60.0, dims=3)
    b, a = lowpass.butter_coeffs()
    s = lowpass.init_state((3,))
    for t in range(len(x)):
        want = lpf_ref.filter(x[t])
        s, got = lowpass.lpf_step(s, jnp.asarray(x[t], jnp.float32), b, a)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_bundle_adjustment_beats_reference_on_its_own_metric(ref, rig4):
    """Same noisy capture, same perturbed initial chain, camera-0 gauge:
    our explicit LM (mode='reference' residual layout, focals frozen —
    the reference's focal params are dead: its residual mutates a COPY
    of the intrinsics, helpers.py:267-270/188-193) must reach a mean
    reprojection error at least as low as scipy least_squares
    (loss='cauchy', ftol=1e-2) computed by the REFERENCE's own metric."""
    import contextlib
    import io
    import types as types_mod

    from scipy.spatial.transform import Rotation

    from low_cost_mocap_tpu.ops import ba as ba_ops

    Rs, ts, rig = rig4
    rng = np.random.default_rng(5)
    R0, t0 = Rs[0].copy(), ts[0].copy()
    Rs_g = np.einsum("cij,jk->cik", Rs, R0.T).astype(np.float64)
    ts_g = (ts - np.einsum("cij,j->ci", Rs_g, t0)).astype(np.float64)
    F = 40
    t = np.arange(F) * 0.2
    X = np.stack([0.45 * np.sin(0.9 * t), 0.45 * np.cos(0.7 * t),
                  0.5 + 0.3 * np.sin(0.35 * t)], -1).astype(np.float32)
    X_g = (X @ R0.T + t0).astype(np.float32)
    K = rig.K_stack().astype(np.float64)
    pts = np.zeros((F, 4, 2), np.float32)
    for c in range(4):
        Xc = X_g @ Rs_g[c].T + ts_g[c]
        uv = Xc @ K[c].T
        pts[:, c] = (uv[:, :2] / uv[:, 2:3]) + rng.normal(scale=0.5,
                                                          size=(F, 2))
    Rs_p = Rs_g.copy()
    ts_p = ts_g.copy()
    for c in range(1, 4):
        Rs_p[c] = (Rotation.from_rotvec(rng.normal(scale=0.02, size=3))
                   .as_matrix() @ Rs_g[c])
        ts_p[c] = ts_g[c] + rng.normal(scale=0.03, size=3)
    poses_p = [{"R": Rs_p[c], "t": ts_p[c]} for c in range(4)]

    def mean_err(poses):
        op = ref.helpers.triangulate_points(pts.astype(np.float64), poses)
        return float(np.mean(ref.helpers.calculate_reprojection_errors(
            pts.astype(np.float64), op, poses)))

    e_init = mean_err([{"R": p["R"].copy(), "t": p["t"].copy()}
                       for p in poses_p])
    dummy = types_mod.SimpleNamespace(emit=lambda *a, **k: None)
    with contextlib.redirect_stdout(io.StringIO()):   # scipy verbose=2
        ref_out = ref.helpers.bundle_adjustment(
            pts.astype(np.float64),
            [{"R": p["R"].copy(), "t": p["t"].copy()} for p in poses_p],
            dummy)
    e_ref = mean_err([{"R": np.asarray(p["R"]), "t": np.asarray(p["t"])}
                      for p in ref_out])

    res = ba_ops.bundle_adjust(
        jnp.asarray(pts), jnp.asarray(np.ones((F, 4), bool)),
        jnp.asarray(rig.K_stack()), jnp.asarray(Rs_p, jnp.float32),
        jnp.asarray(ts_p, jnp.float32), num_cameras=4, mode="reference",
        freeze_focals=True)
    e_ours = mean_err([{"R": np.asarray(res.Rs)[c].astype(np.float64),
                        "t": np.asarray(res.ts)[c].astype(np.float64)}
                       for c in range(4)])

    # both converged far below the perturbed start; ours at least as good
    assert e_ref < e_init * 0.1, (e_ref, e_init)
    assert e_ours <= e_ref * 1.05, (e_ours, e_ref)
    # and the solutions describe the same rig (loose: the reference stops
    # at ftol=1e-2)
    for c in range(1, 4):
        Rr = np.asarray(ref_out[c]["R"])
        Ro = np.asarray(res.Rs)[c]
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(Rr @ Ro.T) - 1) / 2, -1, 1)))
        assert ang < 5.0, (c, ang)
