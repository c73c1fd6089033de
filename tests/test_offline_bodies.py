"""End-to-end 6-DoF body tracking through the offline pipeline.

A rigid 4-marker constellation moves through a synthetic rig; frames are
rendered, processed by ``models/offline.process_recording`` with a
``body_template``, and the recovered per-frame 6-DoF poses must follow the
ground-truth trajectory.  (The reference has no analogue — it only tracks
its hardcoded drone triple, ``computer_code/api/helpers.py:424-480``.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from low_cost_mocap_tpu.config import EngineConfig
from low_cost_mocap_tpu.models.offline import process_recording
from low_cost_mocap_tpu.ops import camera as cam_ops
from low_cost_mocap_tpu.ops import rigid_general as rg
from low_cost_mocap_tpu.utils import synthetic as syn

BODY = np.array([
    [0.0, 0.0, 0.0],
    [0.12, 0.0, 0.0],
    [0.0, 0.09, 0.0],
    [0.05, 0.03, 0.06],
], np.float32)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


# The engine's world frame is the reference's display convention
# (``ops/world.to_world``: flip diag(-1,-1,1), then swap y/z) — an
# IMPROPER transform A of the rig frame.  Body templates live in the
# frame the engine reports, so rig-frame truth maps via
# R_eng = A R A^T, t_eng = A t, template_eng = template @ A^T.
A_CONV = np.array([[-1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)


def test_offline_recording_tracks_body_pose():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    tmpl = rg.make_template(BODY @ A_CONV.T)

    T = 16
    true_t = np.stack([
        np.linspace(-0.3, 0.3, T),
        np.linspace(-0.2, 0.2, T),
        np.full(T, 0.8),
    ], axis=-1).astype(np.float32)
    true_R = [_rot_z(0.15 * i) for i in range(T)]

    frames = []
    for i in range(T):
        world = BODY @ true_R[i].T + true_t[i]
        pts, mask = syn.observe(world, Rs, ts, rig)
        frames.append(syn.render_frames(pts, mask, rig.image_size, sigma=0.8))
    frames_u8 = (np.stack(frames) * 255).astype(np.uint8)

    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    res = process_recording(jnp.asarray(frames_u8), Ps, K, dist,
                            jnp.eye(4, dtype=jnp.float32), rig, cfg,
                            chunk=8, body_template=tmpl, max_bodies=1)
    assert res.bodies is not None
    ok = np.asarray(res.bodies.valid)[:, 0]
    assert ok.all(), f"body lost in frames {np.where(~ok)[0]}"
    t_eng = true_t @ A_CONV.T
    R_eng = [A_CONV @ R @ A_CONV.T for R in true_R]
    t_err = np.abs(np.asarray(res.bodies.t)[:, 0] - t_eng).max()
    assert t_err < 0.01, t_err
    # rotation error bound: ~3 mm triangulated-centroid noise over the
    # body's ~0.1 m marker extent is ~0.05 rad of orientation uncertainty
    R_err = max(np.abs(np.asarray(res.bodies.R)[i, 0] - R_eng[i]).max()
                for i in range(T))
    assert R_err < 0.15, R_err
    assert float(np.asarray(res.bodies.rms)[:, 0].max()) < 8e-3

    # temporal tracker: locked on from frame 1 and follows the truth
    assert res.body_tracks is not None
    tv = np.asarray(res.body_tracks.valid)[:, 0]
    assert tv[1:].all()
    tt_err = np.abs(np.asarray(res.body_tracks.pos)[2:, 0]
                    - t_eng[2:]).max()
    assert tt_err < 0.02, tt_err


@pytest.mark.slow
def test_learn_template_from_capture():
    """Auto-derive the marker template from a recording (mocap 'create
    rigid body' workflow), then track with it."""
    from low_cost_mocap_tpu.models.offline import process_recording

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    T = 16
    true_t = np.stack([
        np.linspace(-0.25, 0.25, T),
        np.linspace(0.15, -0.15, T),
        np.full(T, 0.9),
    ], axis=-1).astype(np.float32)
    true_R = [_rot_z(0.2 * i) for i in range(T)]
    frames = []
    for i in range(T):
        world = BODY @ true_R[i].T + true_t[i]
        pts, mask = syn.observe(world, Rs, ts, rig)
        frames.append(syn.render_frames(pts, mask, rig.image_size,
                                        sigma=0.8))
    frames_u8 = (np.stack(frames) * 255).astype(np.uint8)
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    res = process_recording(jnp.asarray(frames_u8), Ps, K, dist,
                            jnp.eye(4, dtype=jnp.float32), rig, cfg,
                            chunk=8)

    learned = rg.learn_template(res.object_points, res.point_valid)
    got = learned.marker_array()
    assert got.shape[0] == 4
    # geometry check: learned pairwise distances match the true body's
    want = BODY @ A_CONV.T
    Dg = np.sort(np.linalg.norm(got[:, None] - got[None, :], axis=-1),
                 axis=None)
    Dw = np.sort(np.linalg.norm(want[:, None] - want[None, :], axis=-1),
                 axis=None)
    assert np.abs(Dg - Dw).max() < 5e-3

    # and the learned template tracks the capture it was learned from
    res2 = process_recording(jnp.asarray(frames_u8), Ps, K, dist,
                             jnp.eye(4, dtype=jnp.float32), rig, cfg,
                             chunk=8, body_template=learned, max_bodies=1)
    assert np.asarray(res2.bodies.valid)[:, 0].all()
    assert float(np.asarray(res2.bodies.rms)[:, 0].max()) < 8e-3
