"""Schur-complement BA + temporal sharding on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.parallel import mesh as mesh_lib
from low_cost_mocap_tpu.parallel import temporal
from low_cost_mocap_tpu.parallel.schur_ba import schur_bundle_adjust
from low_cost_mocap_tpu.ops import ba as ba_ops
from low_cost_mocap_tpu.ops import camera, triangulate
from low_cost_mocap_tpu.utils import synthetic as syn


def _scene(n_pts=64, noise=0.3, seed=3, perturb=True):
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    rng = np.random.default_rng(seed)
    X = syn.random_points(rng, n_pts)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=noise, rng=rng)
    R0, t0 = Rs[0].copy(), ts[0].copy()
    Rs = np.einsum("cij,jk->cik", Rs, R0.T).astype(np.float32)
    ts = (ts - np.einsum("cij,j->ci", Rs, t0)).astype(np.float32)
    if perturb:
        from low_cost_mocap_tpu.ops import rotations as rot
        dR = np.asarray(rot.rotvec_to_matrix(jnp.asarray(
            rng.normal(scale=0.02, size=(4, 3)).astype(np.float32))))
        Rs_p = np.einsum("cij,cjk->cik", dR, Rs).astype(np.float32)
        ts_p = (ts + rng.normal(scale=0.03, size=ts.shape)).astype(np.float32)
        Rs_p[0], ts_p[0] = np.eye(3, dtype=np.float32), 0
        return X, pts, mask, Rs, ts, Rs_p, ts_p, rig
    return X, pts, mask, Rs, ts, Rs, ts, rig


def _mean_err(pts, mask, rig, Rs, ts, focals=None):
    K = jnp.asarray(rig.K_stack())
    if focals is not None:
        K = ba_ops._apply_focals(K, focals)
    Ps = camera.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    Xh, _ = triangulate.triangulate_points(jnp.asarray(pts), Ps, jnp.asarray(mask))
    e = triangulate.reprojection_errors(jnp.asarray(pts), Xh, Ps, jnp.asarray(mask))
    return float(jnp.mean(jnp.where(jnp.isfinite(e), e, 0.0)))


def test_schur_ba_converges_distributed():
    X, pts, mask, Rs, ts, Rs_p, ts_p, rig = _scene()
    e_before = _mean_err(pts, mask, rig, Rs_p, ts_p)
    m = mesh_lib.make_mesh({"point": 8})
    res = schur_bundle_adjust(
        m, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(rig.K_stack()),
        jnp.asarray(Rs_p), jnp.asarray(ts_p), max_iters=40)
    e_after = _mean_err(pts, mask, rig, np.asarray(res.Rs), np.asarray(res.ts),
                        res.focals)
    assert e_before > 0.5
    assert e_after < 0.3
    # refined landmarks reproject tightly too
    K = ba_ops._apply_focals(jnp.asarray(rig.K_stack()), res.focals)
    Ps = camera.projection_matrix(K, res.Rs, res.ts)
    e_pts = triangulate.reprojection_errors(jnp.asarray(pts), res.points, Ps,
                                            jnp.asarray(mask))
    assert float(jnp.mean(e_pts)) < 0.3


def test_schur_ba_single_vs_eight_devices_agree():
    X, pts, mask, Rs, ts, Rs_p, ts_p, rig = _scene(n_pts=32, seed=5)
    m1 = mesh_lib.make_mesh({"point": 1}, devices=jax.devices()[:1])
    m8 = mesh_lib.make_mesh({"point": 8})
    kw = dict(max_iters=20)
    r1 = schur_bundle_adjust(m1, jnp.asarray(pts), jnp.asarray(mask),
                             jnp.asarray(rig.K_stack()), jnp.asarray(Rs_p),
                             jnp.asarray(ts_p), **kw)
    r8 = schur_bundle_adjust(m8, jnp.asarray(pts), jnp.asarray(mask),
                             jnp.asarray(rig.K_stack()), jnp.asarray(Rs_p),
                             jnp.asarray(ts_p), **kw)
    # same math, different layout: costs agree tightly
    np.testing.assert_allclose(float(r1.cost), float(r8.cost), rtol=1e-3)


def test_process_sequence_time_sharded():
    from low_cost_mocap_tpu.ops import detect

    Rs, ts, rig = syn.ring_rig(num_cameras=2, image_size=64)
    rng = np.random.default_rng(0)
    T = 16
    frames = np.stack([
        syn.render_frames(*_obs(rng, Rs, ts, rig), rig.image_size, sigma=0.8)
        for _ in range(T)
    ])  # (T, C, H, W)
    m = mesh_lib.make_mesh({"time": 8})
    c, v, s = temporal.process_sequence(
        m, jnp.asarray(frames),
        lambda f: detect.find_blobs_multi(f, 0.2, 4, cc_iters=8))
    assert c.shape == (T, 2, 4, 2)
    assert np.asarray(v).sum() >= T * 2  # every frame found its blob(s)


def _obs(rng, Rs, ts, rig):
    X = syn.random_points(rng, 2)
    return syn.observe(X, Rs, ts, rig)


def test_smooth_sharded_matches_sequential():
    rng = np.random.default_rng(1)
    T, D = 256, 3
    x = np.cumsum(rng.normal(size=(T, D)).astype(np.float32), axis=0) * 0.01
    m = mesh_lib.make_mesh({"time": 8})
    ours = np.asarray(temporal.smooth_sharded(m, jnp.asarray(x), halo=32))
    ref = np.asarray(temporal.smooth_reference(jnp.asarray(x)))
    # interior matches tightly; block edges inherit halo accuracy
    err = np.abs(ours - ref)[40:-40]
    assert err.max() < 1e-4, err.max()


@pytest.mark.slow
def test_process_sequence_from_host_blobs():
    """Time-sharded vision over HOST-DETECTED blobs (the production
    offline fast path): pytree (blobs, valid) input shards over the time
    axis with zero collectives, results match the unsharded run."""
    from low_cost_mocap_tpu.ops import camera, correspond

    try:
        from low_cost_mocap_tpu.models.offline import detect_recording_host
        from low_cost_mocap_tpu.control.bindings import get_lib

        get_lib()
    except Exception as e:  # pragma: no cover - no toolchain
        pytest.skip(f"native lib unavailable: {e}")

    Rs, ts, rig = syn.ring_rig(num_cameras=2, image_size=64)
    rng = np.random.default_rng(0)
    T = 16
    frames_u8 = (np.stack([
        syn.render_frames(*_obs(rng, Rs, ts, rig), rig.image_size, sigma=0.8)
        for _ in range(T)
    ]) * 255).astype(np.uint8)
    blobs, valid = detect_recording_host(frames_u8, 0.2, 4)
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = camera.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))

    def per_frame(inp):
        b, v = inp
        bu = camera.undistort_points(b, K[:, None], dist[:, None])
        bu = jnp.where(v[..., None], bu, 0.0)
        m = correspond.match_points(bu, v, Ps)
        return m["object_points"], m["valid"]

    m = mesh_lib.make_mesh({"time": 8})
    pts_s, val_s = temporal.process_sequence(
        m, (jnp.asarray(blobs), jnp.asarray(valid)), per_frame)
    pts_1, val_1 = jax.vmap(per_frame)((jnp.asarray(blobs),
                                        jnp.asarray(valid)))
    np.testing.assert_array_equal(np.asarray(val_s), np.asarray(val_1))
    np.testing.assert_allclose(np.asarray(pts_s), np.asarray(pts_1),
                               atol=1e-6)
