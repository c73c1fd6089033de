"""End-to-end: rendered frames -> tracked drone poses, one jitted step."""

import numpy as np
import jax.numpy as jnp

from low_cost_mocap_tpu.config import EngineConfig, RigConfig
from low_cost_mocap_tpu.models.pipeline import MocapPipeline
from low_cost_mocap_tpu.utils import synthetic as syn


def _make_scene(num_cameras=4, image_size=320):
    Rs, ts, rig = syn.ring_rig(num_cameras=num_cameras, image_size=image_size)
    engine = EngineConfig()
    return Rs, ts, rig, engine


def _render_drone(pos, heading, Rs, ts, rig):
    markers_cam0 = syn.drone_markers(np.asarray(pos), heading, rig)
    pts, mask = syn.observe(markers_cam0, Rs, ts, rig)
    frames = syn.render_frames(pts, mask, rig.image_size, sigma=0.8)
    return frames, markers_cam0


def test_pipeline_end_to_end_single_drone():
    Rs, ts, rig, engine = _make_scene()
    pipe = MocapPipeline(rig, engine, Rs, ts, preprocess_frames=False)
    state = pipe.init_state()

    # drone hovering; markers built in the camera-0 "world" frame directly
    pos = np.array([0.1, 0.05, 0.6], np.float32)
    frames, markers = _render_drone(pos, 0.3, Rs, ts, rig)

    for _ in range(5):
        state, out = pipe.step(state, jnp.asarray(frames), 1.0 / 60.0)

    pv = np.asarray(out.point_valid)
    assert pv.sum() == 3  # the three LEDs triangulated, no duplicates
    # world transform is identity matrix path: swap+flip of camera frame
    from low_cost_mocap_tpu.ops import world as world_ops
    expect = np.asarray(world_ops.to_world(jnp.asarray(markers), jnp.eye(4)))
    got = np.asarray(out.object_points)[pv]
    for e in expect:
        assert np.linalg.norm(got - e, axis=1).min() < 5e-3

    ok = np.asarray(out.objects.valid)
    assert ok.sum() == 1
    tracked_ok = np.asarray(out.tracked.valid)
    assert tracked_ok.sum() == 1


def test_pipeline_no_markers_is_quiet():
    Rs, ts, rig, engine = _make_scene()
    pipe = MocapPipeline(rig, engine, Rs, ts, preprocess_frames=False)
    state = pipe.init_state()
    frames = np.zeros((rig.num_cameras, rig.image_size, rig.image_size), np.float32)
    state, out = pipe.step(state, jnp.asarray(frames), 1.0 / 60.0)
    assert not np.asarray(out.blob_valid).any()
    assert not np.asarray(out.point_valid).any()
    assert not np.asarray(out.tracked.valid).any()
    # everything stays finite
    assert np.isfinite(np.asarray(out.object_points)).all()


def test_pipeline_tracks_motion():
    Rs, ts, rig, engine = _make_scene()
    pipe = MocapPipeline(rig, engine, Rs, ts, preprocess_frames=False)
    state = pipe.init_state()
    from low_cost_mocap_tpu.ops import world as world_ops

    errs = []
    for t in range(30):
        pos = np.array([0.1 + 0.004 * t, 0.0, 0.6], np.float32)
        frames, markers = _render_drone(pos, 0.0, Rs, ts, rig)
        state, out = pipe.step(state, jnp.asarray(frames), 1.0 / 60.0)
        centre_world = np.asarray(world_ops.to_world(
            jnp.asarray((markers[0] + markers[1]) / 2), jnp.eye(4)))
        tv = np.asarray(out.tracked.valid)
        if t > 15 and tv.any():
            d = int(np.argmax(tv))  # identity slot is geometry-determined
            errs.append(np.linalg.norm(np.asarray(out.tracked.pos)[d] - centre_world))
    assert len(errs) > 5
    assert np.mean(errs) < 0.05
