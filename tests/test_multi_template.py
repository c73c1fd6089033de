"""Simultaneous tracking of multiple DISTINCT rigid-body templates
(``RigConfig.body_sets`` — several prop types in one capture; capability
beyond the reference, which fits only its hardcoded LED triple,
``computer_code/api/helpers.py:424-480``)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from low_cost_mocap_tpu.config import EngineConfig, RigConfig, load_config, \
    save_config
from low_cost_mocap_tpu.ops import camera
from low_cost_mocap_tpu.ops.rotations import quat_to_matrix_np
from low_cost_mocap_tpu.utils import synthetic as syn

# two clearly distinct constellations (metres, body frame)
TMPL_A = ((0.0, 0.0, 0.0), (0.12, 0.0, 0.0), (0.0, 0.09, 0.0),
          (0.05, 0.04, 0.07))
TMPL_B = ((0.0, 0.0, 0.0), (0.2, 0.0, 0.0), (0.1, 0.16, 0.0),
          (0.02, 0.05, 0.11))


def _world_markers(tmpl, R, t):
    return np.asarray(tmpl, np.float32) @ np.asarray(R, np.float32).T + t


def _to_tri_frame(Xw):
    """Inverse of ops.world.to_world under an identity matrix: templates
    live in the engine's display world frame ([x, up, z] — flip + y/z
    swap of the triangulation frame), so synthetic scenes are authored
    there and mapped back before rendering observations."""
    Xs = np.asarray(Xw, np.float32)[:, [0, 2, 1]]       # undo output swap
    return Xs @ np.diag([-1.0, -1.0, 1.0]).astype(np.float32)  # undo flip


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def test_config_roundtrip_with_body_sets(tmp_path):
    rig = RigConfig(num_cameras=2, body_markers=TMPL_A, max_bodies=1,
                    body_sets=((TMPL_B, 2),))
    save_config(str(tmp_path / "c.json"), rig, EngineConfig())
    rig2, _ = load_config(str(tmp_path / "c.json"))
    assert rig2.body_sets == ((TMPL_B, 2),)
    sets = rig2.body_sets_resolved()
    assert len(sets) == 2
    assert sets[0][1] == 1 and sets[1][1] == 2
    assert rig2.total_body_slots() == 3


@pytest.mark.slow
def test_two_templates_located_and_tracked():
    """Both templates present in one scene: each set's slots lock onto the
    right constellation, and the per-frame fits carry the right poses."""
    from low_cost_mocap_tpu.models.pipeline import (make_init_state,
                                                    track_from_blobs)

    Rs, ts, rig0 = syn.ring_rig(num_cameras=4)
    rig = dataclasses.replace(rig0, body_markers=TMPL_A, max_bodies=1,
                              body_sets=((TMPL_B, 1),))
    sets = rig.body_sets_resolved()
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = camera.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))

    t_a = np.array([-0.25, 0.1, 0.05], np.float32)
    t_b = np.array([0.3, -0.1, 0.12], np.float32)
    R_a = _rot_z(0.4)
    R_b = _rot_z(-0.7)

    state = make_init_state(rig)
    assert isinstance(state, tuple) and len(state[1]) == 2

    out = None
    for step_i in range(3):  # a few frames so trackers activate
        X = _to_tri_frame(np.concatenate([
            _world_markers(TMPL_A, R_a, t_a + 0.002 * step_i),
            _world_markers(TMPL_B, R_b, t_b - 0.002 * step_i),
        ]))
        pts, mask = syn.observe(X, Rs, ts, rig)
        slots = np.zeros((rig.num_cameras, 16, 2), np.float32)
        ok = np.zeros((rig.num_cameras, 16), bool)
        for c in range(rig.num_cameras):
            vis = np.where(mask[:, c])[0]
            slots[c, :len(vis)] = pts[vis, c]
            ok[c, :len(vis)] = True
        state, out = track_from_blobs(
            state, jnp.asarray(slots), jnp.asarray(ok),
            jnp.asarray(1.0 / 60.0), Ps, K, dist,
            jnp.eye(4, dtype=jnp.float32), None,
            gate_px=5.0, max_candidates=2,
            marker_dist1=rig.marker_dist_short,
            marker_dist2=rig.marker_dist_long,
            marker_tol=rig.marker_dist_tol,
            marker_side_min=rig.marker_side_min,
            body_sets=sets)

    bodies = out.bodies
    bvalid = np.asarray(bodies.valid)
    assert bvalid[0] and bvalid[1], bvalid     # one instance of each
    np.testing.assert_allclose(np.asarray(bodies.t)[0], t_a + 0.004,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(bodies.t)[1], t_b - 0.004,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(bodies.R)[0], R_a, atol=0.05)
    np.testing.assert_allclose(np.asarray(bodies.R)[1], R_b, atol=0.05)

    tb = out.tracked_bodies
    tbv = np.asarray(tb.valid)
    assert tbv[0] and tbv[1]
    np.testing.assert_allclose(np.asarray(tb.pos)[0], t_a + 0.004, atol=2e-2)
    np.testing.assert_allclose(np.asarray(tb.pos)[1], t_b - 0.004, atol=2e-2)
    np.testing.assert_allclose(quat_to_matrix_np(np.asarray(tb.quat)[0]),
                               R_a, atol=0.1)


def test_single_template_shorthand_unchanged():
    """body_template/max_bodies still works and matches the sets path."""
    from low_cost_mocap_tpu.models.pipeline import (make_init_state,
                                                    track_from_blobs)

    Rs, ts, rig0 = syn.ring_rig(num_cameras=4)
    rig = dataclasses.replace(rig0, body_markers=TMPL_A, max_bodies=1)
    tmpl = rig.body_template()
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = camera.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    X = _to_tri_frame(_world_markers(
        TMPL_A, np.eye(3, dtype=np.float32),
        np.array([0.1, 0.0, 0.1], np.float32)))
    pts, mask = syn.observe(X, Rs, ts, rig)
    slots = np.zeros((rig.num_cameras, 8, 2), np.float32)
    ok = np.zeros((rig.num_cameras, 8), bool)
    for c in range(rig.num_cameras):
        vis = np.where(mask[:, c])[0]
        slots[c, :len(vis)] = pts[vis, c]
        ok[c, :len(vis)] = True
    kw = dict(gate_px=5.0, max_candidates=2,
              marker_dist1=rig.marker_dist_short,
              marker_dist2=rig.marker_dist_long,
              marker_tol=rig.marker_dist_tol,
              marker_side_min=rig.marker_side_min)
    args = (jnp.asarray(slots), jnp.asarray(ok), jnp.asarray(1.0 / 60.0),
            Ps, K, dist, jnp.eye(4, dtype=jnp.float32), None)
    _, o1 = track_from_blobs(make_init_state(rig), *args,
                             body_template=tmpl, max_bodies=1, **kw)
    _, o2 = track_from_blobs(make_init_state(rig), *args,
                             body_sets=rig.body_sets_resolved(), **kw)
    np.testing.assert_array_equal(np.asarray(o1.bodies.valid),
                                  np.asarray(o2.bodies.valid))
    np.testing.assert_allclose(np.asarray(o1.bodies.t),
                               np.asarray(o2.bodies.t), atol=1e-6)


def test_engine_with_body_sets_emits_template_index():
    """Live engine compiled with two body sets: object-points payloads
    carry templateIndex per body slot (pack/unpack sized by the TOTAL
    slot count across sets)."""
    from low_cost_mocap_tpu.runtime.engine import Engine
    from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
    from low_cost_mocap_tpu.runtime.sources import SyntheticSource

    Rs, ts, rig0 = syn.ring_rig(num_cameras=4)
    rig = dataclasses.replace(rig0, body_markers=TMPL_A, max_bodies=1,
                              body_sets=((TMPL_B, 2),))
    cfg = EngineConfig(max_blobs=16)
    eng = Engine(rig, cfg, SyntheticSource(rig, Rs, ts, num_drones=1),
                 CollectingLink())
    assert eng._num_bodies == 3
    np.testing.assert_array_equal(eng._body_set_of_slot, [0, 1, 1])
    eng.set_camera_poses(Rs, ts)
    eng.is_capturing_points = True
    eng.is_triangulating_points = True
    eng.is_locating_objects = True
    events = []
    eng.on("object-points", events.append)

    t_a = np.array([-0.25, 0.1, 0.05], np.float32)
    t_b = np.array([0.3, -0.1, 0.12], np.float32)
    for step_i in range(3):
        X = _to_tri_frame(np.concatenate([
            _world_markers(TMPL_A, _rot_z(0.3), t_a),
            _world_markers(TMPL_B, np.eye(3, dtype=np.float32), t_b),
        ]))
        pts, mask = syn.observe(X, Rs, ts, rig)
        frames = (np.asarray(syn.render_frames(
            pts, mask, rig.image_size, sigma=0.8)) * 255).astype(np.uint8)
        eng.process_frame(frames, 1 / 60)
    assert events
    bodies = events[-1]["bodies"]
    idxs = sorted(b["templateIndex"] for b in bodies)
    assert idxs[:1] == [0] and 1 in idxs, bodies
    for b in bodies:
        want = t_a if b["templateIndex"] == 0 else t_b
        np.testing.assert_allclose(b["t"], want, atol=2e-2)
    tracked = events[-1]["tracked_bodies"]
    assert {tb["templateIndex"] for tb in tracked} == {0, 1}


def test_legacy_single_state_structure_round_trips():
    """A legacy (KalmanState, BodyTrackState) input must come back with
    the SAME pytree structure — scan carries and jitted serving loops
    retrace (1-3 min on tunneled TPUs) on any structure change."""
    import jax

    from low_cost_mocap_tpu.models.pipeline import track_from_blobs
    from low_cost_mocap_tpu.ops import body_tracker, kalman

    Rs, ts, rig0 = syn.ring_rig(num_cameras=4)
    rig = dataclasses.replace(rig0, body_markers=TMPL_A, max_bodies=1)
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = camera.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    legacy = (kalman.init_state(rig.num_objects),
              body_tracker.init_state(1))
    new_state, _ = track_from_blobs(
        legacy, jnp.zeros((4, 8, 2)), jnp.zeros((4, 8), bool),
        jnp.asarray(1.0 / 60.0), Ps, K, dist,
        jnp.eye(4, dtype=jnp.float32), None,
        gate_px=5.0, max_candidates=2,
        marker_dist1=rig.marker_dist_short,
        marker_dist2=rig.marker_dist_long,
        marker_tol=rig.marker_dist_tol,
        marker_side_min=rig.marker_side_min,
        body_template=rig.body_template(), max_bodies=1)
    assert (jax.tree.structure(new_state)
            == jax.tree.structure(legacy))


def test_offline_recording_with_body_sets():
    """Offline path: both templates recovered across a short recording."""
    from low_cost_mocap_tpu.models.offline import process_recording
    from low_cost_mocap_tpu.utils.synthetic import render_frames

    Rs, ts, rig0 = syn.ring_rig(num_cameras=4)
    rig = dataclasses.replace(rig0, body_markers=TMPL_A, max_bodies=1,
                              body_sets=((TMPL_B, 1),))
    cfg = EngineConfig(max_blobs=16)
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = camera.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    t_a = np.array([-0.2, 0.05, 0.0], np.float32)
    t_b = np.array([0.25, -0.05, 0.1], np.float32)
    frames = []
    for i in range(8):
        X = _to_tri_frame(np.concatenate([
            _world_markers(TMPL_A, _rot_z(0.1 * i), t_a),
            _world_markers(TMPL_B, np.eye(3, dtype=np.float32),
                           t_b + [0.005 * i, 0, 0]),
        ]))
        pts, mask = syn.observe(X, Rs, ts, rig)
        frames.append((np.asarray(render_frames(
            pts, mask, rig.image_size, sigma=0.8)) * 255).astype(np.uint8))
    res = process_recording(jnp.asarray(np.stack(frames)), Ps, K, dist,
                            jnp.eye(4, dtype=jnp.float32), rig, cfg,
                            chunk=8, body_sets=rig.body_sets_resolved())
    bvalid = np.asarray(res.bodies.valid)       # (T, 2)
    assert bvalid[:, 0].mean() > 0.7            # template A slot
    assert bvalid[:, 1].mean() > 0.7            # template B slot
    tA = np.asarray(res.bodies.t)[:, 0]
    tB = np.asarray(res.bodies.t)[:, 1]
    ok = bvalid[:, 0]
    np.testing.assert_allclose(tA[ok], np.broadcast_to(t_a, tA[ok].shape),
                               atol=2e-2)
    assert np.all(np.abs(tB[bvalid[:, 1]][:, 2] - 0.1) < 2e-2)
    assert np.asarray(res.body_tracks.valid).any()
