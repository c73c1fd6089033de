"""Distribution tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.parallel import mesh as mesh_lib
from low_cost_mocap_tpu.parallel import dist_ba
from low_cost_mocap_tpu.ops import ba as ba_ops
from low_cost_mocap_tpu.ops import camera, triangulate
from low_cost_mocap_tpu.utils import synthetic as syn


def _scene(n_pts=64, noise=0.3, seed=3):
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    rng = np.random.default_rng(seed)
    X = syn.random_points(rng, n_pts)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=noise, rng=rng)
    # camera-0 gauge frame
    R0, t0 = Rs[0].copy(), ts[0].copy()
    Rs = np.einsum("cij,jk->cik", Rs, R0.T).astype(np.float32)
    ts = (ts - np.einsum("cij,j->ci", Rs, t0)).astype(np.float32)
    return X, pts, mask, Rs, ts, rig


def test_make_mesh_shapes():
    m = mesh_lib.make_mesh({"point": 8})
    assert m.devices.shape == (8,)
    m2 = mesh_lib.make_mesh({"cam": 4, "point": 2})
    assert m2.devices.shape == (4, 2)
    import pytest
    with pytest.raises(ValueError):
        mesh_lib.make_mesh({"point": 3})


@pytest.mark.slow
def test_dist_ba_matches_single_device():
    X, pts, mask, Rs, ts, rig = _scene()
    rng = np.random.default_rng(4)
    from low_cost_mocap_tpu.ops import rotations as rot
    dR = np.asarray(rot.rotvec_to_matrix(jnp.asarray(
        rng.normal(scale=0.02, size=(4, 3)).astype(np.float32))))
    Rs_p = np.einsum("cij,cjk->cik", dR, Rs).astype(np.float32)
    ts_p = (ts + rng.normal(scale=0.03, size=ts.shape)).astype(np.float32)
    Rs_p[0], ts_p[0] = np.eye(3, dtype=np.float32), 0

    single = ba_ops.bundle_adjust(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(rig.K_stack()),
        jnp.asarray(Rs_p), jnp.asarray(ts_p), num_cameras=4, max_iters=30)

    m = mesh_lib.make_mesh({"point": 8})
    dist = dist_ba.dist_bundle_adjust(
        m, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(rig.K_stack()),
        jnp.asarray(Rs_p), jnp.asarray(ts_p), max_iters=30)

    # both reach the same optimum (same math, different layout)
    def err_for(res):
        K = ba_ops._apply_focals(jnp.asarray(rig.K_stack()), res.focals)
        Ps = camera.projection_matrix(K, res.Rs, res.ts)
        Xh, _ = triangulate.triangulate_points(jnp.asarray(pts), Ps, jnp.asarray(mask))
        e = triangulate.reprojection_errors(jnp.asarray(pts), Xh, Ps, jnp.asarray(mask))
        return float(jnp.mean(jnp.where(jnp.isfinite(e), e, 0.0)))

    e_single = err_for(single)
    e_dist = err_for(dist)
    assert e_dist < 0.35
    assert abs(e_dist - e_single) < 0.05


def test_dist_ba_on_2d_mesh_axis():
    """BA shards over 'point' even when the mesh also has a 'cam' axis."""
    X, pts, mask, Rs, ts, rig = _scene(n_pts=32)
    m = mesh_lib.make_mesh({"cam": 4, "point": 2})
    res = dist_ba.dist_bundle_adjust(
        m, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(rig.K_stack()),
        jnp.asarray(Rs), jnp.asarray(ts), max_iters=10)
    assert np.isfinite(float(res.cost))
