"""Offline 6-DoF body-track smoothing (ops/body_tracker.smooth_body_sequence).

Mirrors tests/test_smoother.py's drone checks for the rigid-body path:
occlusion-gap frames must carry smoothly interpolated poses (<1 cm, the
same bound the drone RTS test enforces) instead of frozen/zeroed ones.
"""

import jax.numpy as jnp
import numpy as np

from low_cost_mocap_tpu.ops import body_tracker
from low_cost_mocap_tpu.ops.rotations import quat_to_matrix


def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _sim(T=120, dt=1.0 / 60.0, seed=0, noise=0.002):
    """One body on a gentle arc, rotating about z at constant rate."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) * dt
    pos = np.stack([
        0.4 * np.cos(0.9 * t),
        0.4 * np.sin(0.9 * t),
        0.6 + 0.03 * t,
    ], axis=-1).astype(np.float32)
    Rt = np.stack([_rz(1.2 * tt) for tt in t]).astype(np.float32)
    meas = pos + rng.normal(scale=noise, size=pos.shape).astype(np.float32)
    return pos, Rt, meas, dt


def _fits(pos_meas, Rt, valid_t, F=2):
    """Pack one body's measurements into (T, F, ...) fit tensors."""
    T = len(pos_meas)
    fit_t = np.zeros((T, F, 3), np.float32)
    fit_R = np.tile(np.eye(3, dtype=np.float32), (T, F, 1, 1))
    fit_rms = np.full((T, F), 1.0, np.float32)
    fit_valid = np.zeros((T, F), bool)
    fit_t[:, 0] = pos_meas
    fit_R[:, 0] = Rt
    fit_rms[:, 0] = 0.001
    fit_valid[:, 0] = valid_t
    return (jnp.asarray(fit_t), jnp.asarray(fit_R), jnp.asarray(fit_rms),
            jnp.asarray(fit_valid))


def _angle_deg(Ra, Rb):
    tr = np.einsum("...ij,...ij->...", Ra, Rb)
    return np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))


def test_occlusion_gap_interpolates():
    T, gap = 120, slice(55, 65)
    pos, Rt, meas, dt = _sim(T)
    valid_t = np.ones(T, bool)
    valid_t[gap] = False

    # noise parameters matched to the scenario (2 mm/axis measurement
    # noise, gentle real acceleration absorbed as process noise)
    sm = body_tracker.smooth_body_sequence(
        *_fits(meas, Rt, valid_t), jnp.full((T,), dt, jnp.float32),
        max_bodies=2, process_noise=1e-6, meas_noise=4e-6)
    v = np.asarray(sm.valid)
    assert v[gap, 0].all(), "gap frames must stay valid (interpolated)"
    assert not v[:, 1].any(), "empty slot must stay invalid"

    err = np.linalg.norm(np.asarray(sm.pos)[:, 0] - pos, axis=-1)
    assert err[gap].max() < 0.01, f"gap pos error {err[gap].max():.4f} m"
    # outside the gap the smoother must beat the raw measurement error
    # (mean NORM of 2 mm/axis 3D noise is ~3.3 mm)
    outside = v[:, 0] & valid_t
    assert err[outside].mean() < 0.002

    R_s = np.asarray(quat_to_matrix(sm.quat))[:, 0]
    ang = _angle_deg(R_s, Rt)
    assert ang[gap].max() < 3.0, f"gap angle error {ang[gap].max():.2f} deg"


def test_smoother_beats_causal_tracker_in_gap():
    """The causal tracker coasts (constant velocity, frozen quat) through
    an occlusion; the smoother interpolates — it must be strictly better."""
    T, gap = 120, slice(55, 68)
    pos, Rt, meas, dt = _sim(T)
    valid_t = np.ones(T, bool)
    valid_t[gap] = False
    fit_t, fit_R, fit_rms, fit_valid = _fits(meas, Rt, valid_t)
    dts = jnp.full((T,), dt, jnp.float32)

    sm = body_tracker.smooth_body_sequence(fit_t, fit_R, fit_rms,
                                           fit_valid, dts, max_bodies=2)

    st = body_tracker.init_state(2)
    causal = []
    for k in range(T):
        st, tb = body_tracker.update(st, fit_t[k], fit_R[k], fit_rms[k],
                                     fit_valid[k], dts[k], max_missed=30)
        causal.append(np.asarray(tb.pos)[0])
    causal = np.stack(causal)

    e_sm = np.linalg.norm(np.asarray(sm.pos)[gap, 0] - pos[gap], axis=-1)
    e_ca = np.linalg.norm(causal[gap] - pos[gap], axis=-1)
    assert e_sm.max() < e_ca.max()
    assert e_sm.mean() < 0.5 * e_ca.mean()


def test_process_recording_smoothed_bodies():
    """Integration: process_recording(body_sets=..., smooth=True) carries
    a SmoothedBodies field whose gap frames interpolate the true path."""
    import jax.numpy as jnp
    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.models import offline
    from low_cost_mocap_tpu.ops import camera as cam_ops
    from low_cost_mocap_tpu.ops import world as world_ops
    from low_cost_mocap_tpu.ops.rigid_general import make_template
    from low_cost_mocap_tpu.utils import synthetic as syn
    from low_cost_mocap_tpu.utils.synthetic import drone_markers

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    T, gap = 48, slice(20, 28)
    true_pos = []
    frames = []
    for t in range(T):
        pos = np.array([0.3 * np.cos(t / 40), 0.3 * np.sin(t / 40), 0.6],
                       np.float32)
        true_pos.append(pos)
        X = drone_markers(pos, 0.0, rig)
        pts, mask = syn.observe(X, Rs, ts, rig)
        f = syn.render_frames(pts, mask, rig.image_size, sigma=0.8)
        if gap.start <= t < gap.stop:
            f = np.zeros_like(f)            # full occlusion
        frames.append(f)
    frames = (np.stack(frames) * 255).astype(np.uint8)
    true_pos = np.stack(true_pos)

    Ps = cam_ops.projection_matrix(jnp.asarray(rig.K_stack()),
                                   jnp.asarray(Rs), jnp.asarray(ts))
    tmpl = make_template(drone_markers(np.zeros(3), 0.0, rig))
    res = offline.process_recording(
        frames, Ps, jnp.asarray(rig.K_stack()),
        jnp.asarray(rig.dist_stack()), jnp.eye(4), rig, cfg,
        dts=jnp.full((T,), 1 / 60, jnp.float32),
        body_sets=((tmpl, 1),), smooth=True, use_pallas=False)
    sm = res.smoothed_bodies
    assert sm is not None
    v = np.asarray(sm.valid)
    assert v.shape == (T, 1)
    assert v[gap, 0].all(), "occlusion frames must be interpolated"
    # compare in the ENGINE's world frame (the pipeline applies the
    # reference's flip + y/z swap convention — helpers.py:98-102)
    true_w = np.asarray(world_ops.to_world(jnp.asarray(true_pos),
                                           jnp.eye(4)))
    err = np.linalg.norm(np.asarray(sm.pos)[gap, 0] - true_w[gap],
                         axis=-1)
    assert err.max() < 0.01, f"gap error {err.max():.4f} m"
