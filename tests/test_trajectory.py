import numpy as np

from low_cost_mocap_tpu.models.trajectory import plan_trajectory, plan_waypoint_route


def test_plan_trajectory_via_waypoints():
    sp = plan_trajectory([0, 0, 0], [1, 0, 0], [[0.5, 0.5, 0.0]],
                         max_vel=[0.5] * 3, max_accel=[1.0] * 3,
                         max_jerk=[2.0] * 3, timestep=0.05)
    sp = np.asarray(sp)
    np.testing.assert_allclose(sp[0], [0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(sp[-1], [1, 0, 0], atol=1e-6)
    # passes through the via point
    d = np.linalg.norm(sp - [0.5, 0.5, 0.0], axis=1).min()
    assert d < 0.02
    # continuous: no jump larger than vmax * dt between samples
    steps = np.linalg.norm(np.diff(sp, axis=0), axis=1)
    assert steps.max() <= 0.5 * 0.05 * 1.8  # sqrt(3)-ish slack for 3 axes


def test_plan_waypoint_route_two_drones():
    # reference waypoint format: [x,y,z]*num_objects + stop flag
    # (computer_code/api/index.py:67-73)
    wps = [
        [0, 0, 0.5, 1, 1, 0.5, True],
        [0.5, 0, 0.5, 1, 0.5, 0.5, False],   # via (no stop)
        [1, 0, 0.5, 0, 0, 0.5, True],
    ]
    sp = plan_waypoint_route(wps, max_vel=[1.0] * 3, max_accel=[1.0] * 3,
                             max_jerk=[4.0] * 3, timestep=0.05, num_objects=2)
    sp = np.asarray(sp)
    assert sp.shape[1] == 6
    np.testing.assert_allclose(sp[0], [0, 0, 0.5, 1, 1, 0.5], atol=1e-9)
    np.testing.assert_allclose(sp[-1], [1, 0, 0.5, 0, 0, 0.5], atol=1e-6)


def test_route_single_group_is_empty():
    # one stop waypoint: no segments to plan (matches reference loop bounds)
    sp = plan_waypoint_route([[0, 0, 0, True]], [1] * 3, [1] * 3, [1] * 3,
                             0.05, num_objects=1)
    assert sp == []


def test_plan_trajectory_blended_vias():
    """blend > 0: rounds the via without stopping, stays within limits,
    and still reaches the endpoints exactly."""
    vmax, amax = 0.5, 1.0
    ts = 0.05
    sp = np.asarray(plan_trajectory(
        [0, 0, 0], [1, 0, 0], [[0.5, 0.5, 0.0]],
        max_vel=[vmax] * 3, max_accel=[amax] * 3, max_jerk=[2.0] * 3,
        timestep=ts, blend=0.25))
    np.testing.assert_allclose(sp[0], [0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(sp[-1], [1, 0, 0], atol=1e-6)
    # passes NEAR the via (blend radius), moving — no stop
    d = np.linalg.norm(sp - [0.5, 0.5, 0.0], axis=1)
    k = int(d.argmin())
    assert d[k] < 0.05
    speed = np.linalg.norm(np.diff(sp, axis=0), axis=1) / ts
    assert speed[max(k - 1, 0)] > 0.05    # not stopped at the via
    # per-axis velocity and acceleration within the full limits
    v = np.diff(sp, axis=0) / ts
    a = np.diff(v, axis=0) / ts
    assert np.abs(v).max() <= vmax + 1e-6
    assert np.abs(a).max() <= amax + 1e-6
