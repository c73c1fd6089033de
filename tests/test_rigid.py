import numpy as np
import jax.numpy as jnp

from low_cost_mocap_tpu.config import RigConfig
from low_cost_mocap_tpu.ops import rigid
from low_cost_mocap_tpu.utils import synthetic as syn


def _pack(points_list, errors=None, N=16):
    pts = np.zeros((N, 3), np.float32)
    errs = np.zeros((N,), np.float32)
    valid = np.zeros((N,), bool)
    if len(points_list):
        pts[: len(points_list)] = points_list
    valid[: len(points_list)] = True
    if errors is not None:
        errs[: len(errors)] = errors
    return jnp.asarray(pts), jnp.asarray(errs), jnp.asarray(valid)


def test_single_drone_recovered():
    rig = RigConfig()
    markers = syn.drone_markers(np.array([0.3, -0.2, 0.8]), heading=0.4, rig=rig)
    pts, errs, valid = _pack(markers)
    res = rigid.locate_objects(pts, errs, valid)
    ok = np.asarray(res.valid)
    assert ok.sum() == 1
    i = np.argmax(ok)
    np.testing.assert_allclose(np.asarray(res.pos)[i], [0.3, -0.2, 0.8], atol=1e-3)
    # heading is recovered mod pi, negated (reference convention)
    h = np.asarray(res.heading)[i]
    assert min(abs(-h - 0.4), abs(-h - (0.4 - np.pi)), abs(-h - (0.4 + np.pi))) < 1e-3


def test_two_drones_with_clutter():
    rig = RigConfig()
    m0 = syn.drone_markers(np.array([0.5, 0.5, 1.0]), heading=0.0, rig=rig)
    m1 = syn.drone_markers(np.array([-0.5, -0.5, 0.6]), heading=1.2, rig=rig)
    clutter = np.array([[2.0, 2.0, 2.0], [-2.0, 1.0, 0.3]], np.float32)
    all_pts = np.concatenate([m0, clutter[:1], m1, clutter[1:]])
    pts, errs, valid = _pack(all_pts)
    res = rigid.locate_objects(pts, errs, valid)
    ok = np.asarray(res.valid)
    assert ok.sum() == 2
    locs = np.asarray(res.pos)[ok]
    for target in ([0.5, 0.5, 1.0], [-0.5, -0.5, 0.6]):
        assert np.linalg.norm(locs - np.asarray(target), axis=1).min() < 1e-3


def test_drone_index_from_third_led_side():
    rig = RigConfig()
    # heading 0: arm LEDs along x, third LED on +y -> index 0
    markers = syn.drone_markers(np.array([0.0, 0.0, 1.0]), heading=0.0, rig=rig)
    pts, errs, valid = _pack(markers)
    res = rigid.locate_objects(pts, errs, valid)
    i = np.argmax(np.asarray(res.valid))
    assert int(np.asarray(res.index)[i]) == 0
    # mirror the third LED to -y -> index 1
    markers2 = markers.copy()
    markers2[2, 1] = -markers2[2, 1]
    pts, errs, valid = _pack(markers2)
    res2 = rigid.locate_objects(pts, errs, valid)
    j = np.argmax(np.asarray(res2.valid))
    assert int(np.asarray(res2.index)[j]) == 1


def test_wrong_geometry_rejected():
    # triple with wrong arm distance must not match
    bad = np.array([[0.0, 0.0, 1.0], [0.3, 0.0, 1.0], [0.15, 0.1, 1.0]], np.float32)
    pts, errs, valid = _pack(bad)
    res = rigid.locate_objects(pts, errs, valid)
    assert not np.asarray(res.valid).any()


def test_error_is_mean_of_triple():
    rig = RigConfig()
    markers = syn.drone_markers(np.array([0.0, 0.0, 1.0]), heading=0.0, rig=rig)
    pts, errs, valid = _pack(markers, errors=[3.0, 6.0, 9.0])
    res = rigid.locate_objects(pts, errs, valid)
    i = np.argmax(np.asarray(res.valid))
    np.testing.assert_allclose(np.asarray(res.error)[i], 6.0, atol=1e-5)


def test_empty_input():
    pts, errs, valid = _pack([])
    res = rigid.locate_objects(pts, errs, valid)
    assert not np.asarray(res.valid).any()


def test_fuzz_matches_sequential_greedy_reference():
    """The vectorised greedy must equal a literal sequential implementation
    of the reference semantics (computer_code/api/helpers.py:424-480) on
    random clouds dense enough to trigger consumed-root collisions."""
    def greedy_np(points, errors, valid, dist1, dist2, tol, side_min,
                  ax_h1, ax_h2):
        N = len(points)
        D = np.sqrt(((points[:, None] - points[None]) ** 2).sum(-1))
        vv = valid[:, None] & valid[None]
        near1 = (np.abs(D - dist1) < tol) & vv
        pair_ok = np.abs(D - dist2) <= tol
        cand = near1[:, :, None] & near1[:, None, :] & pair_ok[None]
        cand &= ~np.eye(N, dtype=bool)[None]
        consumed = np.zeros(N, bool)
        out = dict(pos=np.zeros((N, 3), np.float32), heading=np.zeros(N),
                   err=np.full(N, np.inf), idx=np.full(N, -1), ok=np.zeros(N, bool))
        for i in range(N):
            row = cand[i] & valid[i] & ~consumed[i]
            if not row.any():
                continue
            j, k = np.unravel_index(np.argmax(row), row.shape)
            loc = (points[j] + points[k]) / 2.0
            hv = points[j] - points[k]
            hv = hv / max(np.linalg.norm(hv), 1e-12)
            heading = np.arctan2(hv[ax_h2], hv[ax_h1])
            if heading > np.pi / 2:
                heading -= np.pi
            if heading < -np.pi / 2:
                heading += np.pi
            side = (points[i] - loc)[ax_h2]
            if abs(side) < side_min:
                continue
            consumed[[i, j, k]] = True
            out["pos"][i] = loc
            out["heading"][i] = -heading
            out["err"][i] = (errors[i] + errors[j] + errors[k]) / 3.0
            out["idx"][i] = 0 if side > 0 else 1
            out["ok"][i] = True
        return out

    rng = np.random.default_rng(7)
    for trial in range(30):
        N = 24
        # cluster points at marker-geometry scale so gates fire often
        points = rng.normal(scale=0.12, size=(N, 3)).astype(np.float32)
        errors = rng.random(N).astype(np.float32)
        valid = rng.random(N) > 0.2
        got = rigid.locate_objects(
            jnp.asarray(points), jnp.asarray(errors), jnp.asarray(valid),
            dist1=0.095, dist2=0.15, tol=0.025, side_min=0.02,
            ax_h1=0, ax_h2=2)
        want = greedy_np(points.astype(np.float64), errors, valid,
                         0.095, 0.15, 0.025, 0.02, 0, 2)
        np.testing.assert_array_equal(np.asarray(got.valid), want["ok"],
                                      err_msg=f"trial {trial}")
        m = want["ok"]
        np.testing.assert_allclose(np.asarray(got.pos)[m], want["pos"][m],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.heading)[m],
                                   want["heading"][m], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.index)[m], want["idx"][m])
