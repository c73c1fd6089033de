"""End-to-end evaluations mirroring BASELINE.json's config list.

1. 2-camera sequence: blob detect + epipolar match + DLT of one marker.
2. 4-camera extrinsics auto-calibration via BA (tests/test_calibration.py).
3. multi-marker rigid-body fit + Kalman tracking across 4 cameras (ATE).
4. 2-drone simultaneous tracking with per-frame disambiguation.
5. 16-camera / 8-drone synthetic rig with mesh-distributed BA.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.config import EngineConfig, RigConfig
from low_cost_mocap_tpu.models import offline
from low_cost_mocap_tpu.ops import camera as cam_ops
from low_cost_mocap_tpu.ops import world as world_ops
from low_cost_mocap_tpu.utils import metrics, synthetic as syn


def _render_seq(Rs, ts, rig, marker_fn, T):
    frames = []
    truth = []
    for t in range(T):
        X = marker_fn(t)
        pts, mask = syn.observe(X, Rs, ts, rig)
        frames.append(syn.render_frames(pts, mask, rig.image_size, sigma=0.8))
        truth.append(X)
    return ((np.stack(frames) * 255).astype(np.uint8), np.stack(truth))


def _world(X):
    return np.asarray(world_ops.to_world(jnp.asarray(X), jnp.eye(4)))


def test_config1_two_camera_single_marker_sequence():
    Rs, ts, rig = syn.ring_rig(num_cameras=2)
    cfg = EngineConfig()
    T = 24

    def marker(t):
        return np.array([[0.3 * np.cos(t / 6), 0.3 * np.sin(t / 6),
                          0.5 + 0.01 * t]], np.float32)

    frames, truth = _render_seq(Rs, ts, rig, marker, T)
    Ps = cam_ops.projection_matrix(jnp.asarray(rig.K_stack()),
                                   jnp.asarray(Rs), jnp.asarray(ts))
    res = offline.process_recording(jnp.asarray(frames), Ps,
                                    jnp.asarray(rig.K_stack()),
                                    jnp.asarray(rig.dist_stack()),
                                    jnp.eye(4), rig, cfg)
    pv = np.asarray(res.point_valid)
    pw = np.asarray(res.object_points)
    assert pv.sum() >= T  # the marker reconstructed in (at least) every frame
    errs = []
    for t in range(T):
        got = pw[t][pv[t]]
        want = _world(truth[t])[0]
        errs.append(np.linalg.norm(got - want, axis=-1).min())
    # ATE (mm): single marker, 2 cameras
    assert float(np.mean(errs)) * 1000 < 10.0, np.mean(errs)


def test_config3_rigid_body_kalman_ate():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    T = 60

    def markers(t):
        # ~0.3 m/s at 60 fps — realistic indoor drone speed (faster motion
        # mostly measures the reference's statePre-reporting lag, not
        # reconstruction quality)
        pos = np.array([0.3 * np.cos(t / 60), 0.3 * np.sin(t / 60), 0.6],
                       np.float32)
        return syn.drone_markers(pos, 0.0, rig)

    frames, _ = _render_seq(Rs, ts, rig, markers, T)
    Ps = cam_ops.projection_matrix(jnp.asarray(rig.K_stack()),
                                   jnp.asarray(Rs), jnp.asarray(ts))
    res = offline.process_recording(jnp.asarray(frames), Ps,
                                    jnp.asarray(rig.K_stack()),
                                    jnp.asarray(rig.dist_stack()),
                                    jnp.eye(4), rig, cfg,
                                    dts=jnp.full((T,), 1 / 60))
    tr = res.tracked
    tv = np.asarray(tr.valid)          # (T, O)
    # the drone is occasionally lost when its arm axis aligns with a view
    # direction and two LED blobs merge (real optics the reference shares);
    # the dominant identity slot must still carry most of the sequence
    d = int(np.argmax(tv.sum(axis=0)))
    assert tv[:, d].sum() > T * 0.6, tv.sum(axis=0)
    centres = np.stack([
        _world((markers(t)[0] + markers(t)[1]) / 2) for t in range(T)])
    est = np.asarray(tr.pos)[:, d]
    # skip the Kalman settle-in, compare steady-state tracking
    m = metrics.ate(est[10:], centres[10:], valid=tv[10:, d])
    assert m["rmse"] * 1000 < 25.0, m   # < 25 mm ATE with prediction lag
    ov = np.asarray(res.objects_valid)
    assert (ov.sum(axis=1) >= 1).mean() > 0.6


def test_config4_two_drone_disambiguation():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig(max_blobs=8)
    T = 40

    def markers(t):
        p0 = np.array([0.45 + 0.002 * t, 0.35, 0.6], np.float32)
        p1 = np.array([-0.45, -0.35 - 0.002 * t, 0.8], np.float32)
        m0 = syn.drone_markers(p0, 0.0, rig)
        m1 = syn.drone_markers(p1, 0.0, rig)
        m1[2] = 2 * ((m1[0] + m1[1]) / 2) - m1[2]  # third LED mirrored: id 1
        return np.concatenate([m0, m1])

    frames, _ = _render_seq(Rs, ts, rig, markers, T)
    Ps = cam_ops.projection_matrix(jnp.asarray(rig.K_stack()),
                                   jnp.asarray(Rs), jnp.asarray(ts))
    res = offline.process_recording(jnp.asarray(frames), Ps,
                                    jnp.asarray(rig.K_stack()),
                                    jnp.asarray(rig.dist_stack()),
                                    jnp.eye(4), rig, cfg,
                                    dts=jnp.full((T,), 1 / 60))
    tv = np.asarray(res.tracked.valid)
    # each drone individually tracked most of the time; both simultaneously
    # in at least half the frames (blob merges cost the occasional frame)
    assert tv[:, 0].mean() > 0.7, tv.mean(axis=0)
    assert tv[:, 1].mean() > 0.7, tv.mean(axis=0)
    both = (tv.sum(axis=1) == 2).mean()
    assert both > 0.5, both
    # identities stay separated: per-drone tracks don't cross
    pos = np.asarray(res.tracked.pos)
    ok = tv.all(axis=1)
    d01 = np.linalg.norm(pos[ok, 0] - pos[ok, 1], axis=-1)
    assert d01.min() > 0.5


@pytest.mark.slow
def test_config5_sixteen_camera_distributed_ba():
    from low_cost_mocap_tpu.parallel import mesh as mesh_lib
    from low_cost_mocap_tpu.parallel.schur_ba import schur_bundle_adjust
    from low_cost_mocap_tpu.ops import ba as ba_ops, triangulate, rotations as rot

    Rs, ts, rig = syn.ring_rig(num_cameras=16)
    rng = np.random.default_rng(0)
    # 8 drones x 3 markers over a few frames -> 96 landmark observations
    X = np.concatenate([
        syn.drone_markers(syn.random_points(rng, 1)[0], float(rng.random()),
                          rig)
        for _ in range(32)
    ])
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.3, rng=rng)
    R0, t0 = Rs[0].copy(), ts[0].copy()
    Rs_g = np.einsum("cij,jk->cik", Rs, R0.T).astype(np.float32)
    ts_g = (ts - np.einsum("cij,j->ci", Rs_g, t0)).astype(np.float32)
    dR = np.asarray(rot.rotvec_to_matrix(jnp.asarray(
        rng.normal(scale=0.01, size=(16, 3)).astype(np.float32))))
    Rs_p = np.einsum("cij,cjk->cik", dR, Rs_g).astype(np.float32)
    ts_p = (ts_g + rng.normal(scale=0.02, size=ts_g.shape)).astype(np.float32)
    Rs_p[0], ts_p[0] = np.eye(3, dtype=np.float32), 0

    m = mesh_lib.make_mesh({"point": 8})
    res = schur_bundle_adjust(m, jnp.asarray(pts), jnp.asarray(mask),
                              jnp.asarray(rig.K_stack()), jnp.asarray(Rs_p),
                              jnp.asarray(ts_p), max_iters=30)
    K = ba_ops._apply_focals(jnp.asarray(rig.K_stack()), res.focals)
    Ps = cam_ops.projection_matrix(K, res.Rs, res.ts)
    e = triangulate.reprojection_errors(jnp.asarray(pts), res.points, Ps,
                                        jnp.asarray(mask))
    rmse_px = float(jnp.sqrt(jnp.mean(jnp.where(jnp.isfinite(e), e, 0.0))))
    assert rmse_px < 0.6, rmse_px
