"""Camera-sharded live engine (Engine(mesh=...)): multi-chip serving as
a product mode, validated on the virtual CPU mesh."""

import numpy as np
import pytest

from low_cost_mocap_tpu.config import EngineConfig
from low_cost_mocap_tpu.runtime.engine import Engine
from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
from low_cost_mocap_tpu.runtime.sources import SyntheticSource
from low_cost_mocap_tpu.utils import synthetic as syn


def _make_mesh(n):
    import jax

    from low_cost_mocap_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < n:
        pytest.skip(f"need {n} devices")
    return mesh_lib.make_mesh({"cam": n}, devices=jax.devices()[:n])


def test_mesh_engine_matches_single_device():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    src = SyntheticSource(rig, Rs, ts, num_drones=1, orbit_hz=0.0)

    def build(**kw):
        e = Engine(rig, cfg, SyntheticSource(rig, Rs, ts, num_drones=1,
                                             orbit_hz=0.0),
                   CollectingLink(), **kw)
        e.set_camera_poses(Rs, ts)
        e.is_capturing_points = True
        e.is_triangulating_points = True
        e.is_locating_objects = True
        return e

    ref = build(fast_path=True, host_detect=False)
    mesh_eng = build(mesh=_make_mesh(4))
    assert mesh_eng._step_dist is not None

    for _ in range(3):
        frames = src.read()
        o_ref = ref.process_frame(frames, 1 / 60)
        o_mesh = mesh_eng.process_frame(frames, 1 / 60)
        pv_r = np.asarray(o_ref.point_valid)
        pv_m = np.asarray(o_mesh.point_valid)
        np.testing.assert_array_equal(pv_r, pv_m)
        np.testing.assert_allclose(np.asarray(o_ref.object_points)[pv_r],
                                   np.asarray(o_mesh.object_points)[pv_m],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(o_ref.tracked.pos),
                                   np.asarray(o_mesh.tracked.pos),
                                   atol=1e-5)


def test_mesh_engine_rejects_indivisible_cameras():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    with pytest.raises(ValueError, match="divisible"):
        Engine(rig, EngineConfig(),
               SyntheticSource(rig, Rs, ts, num_drones=1),
               CollectingLink(), mesh=_make_mesh(3))


def test_mesh_engine_batched_matches_per_frame():
    """Engine(mesh=..., dispatch_batch=B): the batched x camera-sharded
    product mode emits the same outputs as per-frame mesh serving, at
    batch boundaries only."""
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    B = 4
    src = SyntheticSource(rig, Rs, ts, num_drones=1)
    frames_seq = [np.array(src.read()) for _ in range(2 * B)]

    events = []
    for cfg in (EngineConfig(), EngineConfig(dispatch_batch=B)):
        e = Engine(rig, cfg, SyntheticSource(rig, Rs, ts, num_drones=1),
                   CollectingLink(), mesh=_make_mesh(4))
        e.set_camera_poses(Rs, ts)
        e.is_capturing_points = True
        e.is_triangulating_points = True
        e.is_locating_objects = True
        got = []
        e.on("object-points", got.append)
        rets = [e.process_frame(f, 1 / 60) for f in frames_seq]
        events.append(got)
        if cfg.dispatch_batch > 1:
            # outputs appear only when a batch completes
            assert [r is None for r in rets] == \
                [(i + 1) % B != 0 for i in range(2 * B)]
    assert len(events[0]) == len(events[1]) == 2 * B
    for a, b in zip(events[0], events[1]):
        np.testing.assert_allclose(
            np.asarray(a["object_points"]), np.asarray(b["object_points"]),
            atol=1e-5)
        for fa, fb in zip(a["filtered_objects"], b["filtered_objects"]):
            np.testing.assert_allclose(fa["pos"], fb["pos"], atol=1e-5)
