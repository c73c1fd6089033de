"""Trajectory planning API: jerk-limited multi-drone setpoint generation.

Reproduces the reference's ``POST /api/trajectory-planning`` semantics
(``computer_code/api/index.py:63-112``): waypoints carry one
[x, y, z] * num_objects block plus a trailing stop flag; consecutive
waypoints group into continuous-motion segments split at stop points; each
segment is planned over 3*num_objects DoF with shared velocity /
acceleration / jerk limits and sampled at ``timestep`` (the UI drips the
resulting setpoints to the drones at 20 Hz, ``src/App.tsx:187-199``).

The OTG core is the native C++ jerk-limited planner
(``control/native/otg.cc``) standing in for Ruckig
(``computer_code/api/index.py:15,87``).
"""

from __future__ import annotations

import numpy as np

from low_cost_mocap_tpu.control import plan_trajectory_segment


def plan_trajectory(start_pos, end_pos, waypoints, max_vel, max_accel,
                    max_jerk, timestep: float) -> list[list[float]]:
    """One continuous segment through optional via waypoints.

    Mirrors ``plan_trajectory`` (``computer_code/api/index.py:86-112``).
    Via waypoints are chained stop-to-stop (see otg.h for the documented
    divergence from Ruckig's blended pass-through).
    """
    pts = [np.asarray(start_pos, np.float64)]
    pts += [np.asarray(w, np.float64) for w in waypoints]
    pts.append(np.asarray(end_pos, np.float64))

    D = len(pts[0])
    vmax = np.broadcast_to(np.asarray(max_vel, np.float64), (D,))
    amax = np.broadcast_to(np.asarray(max_accel, np.float64), (D,))
    jmax = np.broadcast_to(np.asarray(max_jerk, np.float64), (D,))

    out: list[list[float]] = []
    for a, b in zip(pts[:-1], pts[1:]):
        seg = plan_trajectory_segment(a, b, vmax, amax, jmax, timestep)
        if out:
            seg = seg[1:]  # avoid duplicating the join sample
        out += [list(map(float, s)) for s in seg]
    return out


def plan_waypoint_route(waypoints, max_vel, max_accel, max_jerk,
                        timestep: float, num_objects: int) -> list[list[float]]:
    """Full route with stop flags — the `/api/trajectory-planning` body.

    waypoints: iterable of [x, y, z]*num_objects + [stop_flag]; limits are
    per-axis [vx, vy, vz] tiled over objects (``index.py:101-103``).
    """
    groups: list[list[list[float]]] = []
    for w in waypoints:
        stop = bool(w[-1])
        coords = list(w[: 3 * num_objects])
        if stop or not groups:
            groups.append([coords])
        else:
            groups[-1].append(coords)

    vmax = list(max_vel) * num_objects
    amax = list(max_accel) * num_objects
    jmax = list(max_jerk) * num_objects

    setpoints: list[list[float]] = []
    for i in range(len(groups) - 1):
        start = groups[i][0]
        end = groups[i + 1][0]
        vias = groups[i][1:]
        setpoints += plan_trajectory(start, end, vias, vmax, amax, jmax,
                                     timestep)
    return setpoints
