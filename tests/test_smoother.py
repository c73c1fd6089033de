"""Fixed-interval RTS smoothing of recorded tracks (ops/kalman.py).

The causal filter's estimate lags the trajectory (the dominant term of
the tracked ATE); offline, the backward Rauch-Tung-Striebel pass removes
it.  Golden-checked against a straightforward numpy RTS implementation.
"""

import pytest
import jax.numpy as jnp
import numpy as np

from low_cost_mocap_tpu.ops import kalman


def _sim(T=120, dt=1.0 / 60.0, seed=0, noise=0.004):
    rng = np.random.default_rng(seed)
    t = np.arange(T) * dt
    pos = np.stack([
        0.4 * np.sin(1.8 * t),
        0.3 * np.cos(1.3 * t),
        0.7 + 0.05 * t,
    ], axis=-1).astype(np.float32)
    meas = pos + rng.normal(scale=noise, size=pos.shape).astype(np.float32)
    return pos, meas, dt


def _forward(meas, dt, valid=None):
    """Forward filter with advance_on_miss + return_cov, stepwise."""
    T = len(meas)
    if valid is None:
        valid = np.ones(T, bool)
    st = kalman.init_state(1)
    xs, Ps, rep = [], [], []
    for tt in range(T):
        st, (out, x, P) = kalman.update(
            st, jnp.asarray(meas[tt][None]), jnp.zeros((1,)),
            jnp.zeros((1,), jnp.int32), jnp.asarray([valid[tt]]),
            jnp.asarray(dt), report="post", advance_on_miss=True,
            return_cov=True)
        xs.append(np.asarray(x))
        Ps.append(np.asarray(P))
        rep.append(np.asarray(out.pos)[0])
    return np.stack(xs), np.stack(Ps), np.stack(rep)


def _numpy_rts(xs, Ps, dts, q=1e-2):
    """Textbook RTS backward pass (per object), float64."""
    T, O, _ = xs.shape
    xs = xs.astype(np.float64)
    Ps = Ps.astype(np.float64)
    Q = np.eye(9) * q
    xs_s, Ps_s = xs.copy(), Ps.copy()
    for k in range(T - 2, -1, -1):
        dt = float(dts[k + 1])
        F = np.eye(9)
        F[0:3, 3:6] = dt * np.eye(3)
        F[3:6, 6:9] = dt * np.eye(3)
        F[0:3, 6:9] = 0.5 * dt * dt * np.eye(3)
        for o in range(O):
            x_pred = F @ xs[k, o]
            P_pred = F @ Ps[k, o] @ F.T + Q
            C = Ps[k, o] @ F.T @ np.linalg.inv(P_pred)
            xs_s[k, o] = xs[k, o] + C @ (xs_s[k + 1, o] - x_pred)
            Ps_s[k, o] = Ps[k, o] + C @ (Ps_s[k + 1, o] - P_pred) @ C.T
    return xs_s, Ps_s


def test_rts_matches_numpy_golden():
    _, meas, dt = _sim(T=40)
    xs, Ps, _ = _forward(meas, dt)
    dts = np.full(len(meas), dt, np.float32)
    xs_s, Ps_s = kalman.rts_smooth(jnp.asarray(xs), jnp.asarray(Ps),
                                   jnp.asarray(dts))
    ref_x, ref_P = _numpy_rts(xs, Ps, dts)
    np.testing.assert_allclose(np.asarray(xs_s), ref_x, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Ps_s), ref_P, atol=2e-4)
    # boundary: smoothed last frame IS the filtered last frame
    np.testing.assert_allclose(np.asarray(xs_s)[-1], xs[-1], atol=1e-6)


def test_smoothing_beats_causal_filter():
    pos, meas, dt = _sim(T=150, seed=2)
    xs, Ps, filtered = _forward(meas, dt)
    dts = np.full(len(meas), dt, np.float32)
    xs_s, _ = kalman.rts_smooth(jnp.asarray(xs), jnp.asarray(Ps),
                                jnp.asarray(dts))
    sm = np.asarray(xs_s)[:, 0, :3]
    e_filt = np.linalg.norm(filtered[20:] - pos[20:], axis=1).mean()
    e_smooth = np.linalg.norm(sm[20:] - pos[20:], axis=1).mean()
    assert e_smooth < 0.7 * e_filt, (e_smooth, e_filt)


def test_smoother_interpolates_through_gaps():
    pos, meas, dt = _sim(T=120, seed=3)
    valid = np.ones(len(meas), bool)
    valid[50:62] = False                     # occlusion gap
    xs, Ps, filtered = _forward(meas, dt, valid)
    dts = np.full(len(meas), dt, np.float32)
    xs_s, _ = kalman.rts_smooth(jnp.asarray(xs), jnp.asarray(Ps),
                                jnp.asarray(dts))
    sm = np.asarray(xs_s)[:, 0, :3]
    assert np.isfinite(sm).all()
    gap_filt = np.linalg.norm(filtered[50:62] - pos[50:62], axis=1).mean()
    gap_smooth = np.linalg.norm(sm[50:62] - pos[50:62], axis=1).mean()
    # the filter extrapolates blind through the gap; the smoother
    # interpolates using the frames on BOTH sides
    assert gap_smooth < gap_filt, (gap_smooth, gap_filt)
    assert gap_smooth < 0.01                 # < 1 cm through a 12-frame gap


def test_smooth_sequence_wrapper():
    pos, meas, dt = _sim(T=100, seed=4)
    T = len(meas)
    cp = jnp.asarray(meas[:, None, :])
    ch = jnp.zeros((T, 1))
    ci = jnp.zeros((T, 1), jnp.int32)
    cv = jnp.ones((T, 1), bool)
    dts = jnp.full((T,), dt)
    smoothed, xs_s = kalman.smooth_sequence(
        kalman.init_state(1), cp, ch, ci, cv, dts)
    assert smoothed.pos.shape == (T, 1, 3)
    assert bool(np.asarray(smoothed.valid).all())
    e = np.linalg.norm(np.asarray(smoothed.pos)[20:, 0] - pos[20:],
                       axis=1).mean()
    assert e < 0.003, e                      # < 3 mm mean, noise 4 mm


def test_rts_assoc_matches_sequential():
    """The associative-scan (temporally parallel) RTS must equal the
    sequential backward pass to float precision."""
    _, meas, dt = _sim(T=48, seed=6)
    xs, Ps, _ = _forward(meas, dt)
    dts = np.full(len(meas), dt, np.float32)
    a_x, a_P = kalman.rts_smooth(jnp.asarray(xs), jnp.asarray(Ps),
                                 jnp.asarray(dts))
    b_x, b_P = kalman.rts_smooth_assoc(jnp.asarray(xs), jnp.asarray(Ps),
                                       jnp.asarray(dts))
    np.testing.assert_allclose(np.asarray(a_x), np.asarray(b_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_P), np.asarray(b_P), atol=1e-5)


@pytest.mark.slow
def test_rts_assoc_time_sharded():
    """The parallel smoother runs with its (T, ...) inputs sharded over a
    'time' mesh axis — the log-depth combine tree partitions across
    devices (a sequential scan cannot)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        import pytest
        pytest.skip("needs the 8-device CPU mesh")
    _, meas, dt = _sim(T=64, seed=7)
    xs, Ps, _ = _forward(meas, dt)
    dts = np.full(len(meas), dt, np.float32)
    ref_x, _ = kalman.rts_smooth_assoc(jnp.asarray(xs), jnp.asarray(Ps),
                                       jnp.asarray(dts))
    mesh = Mesh(np.array(devs[:8]), ("time",))
    sh = lambda spec: NamedSharding(mesh, spec)
    xs_d = jax.device_put(jnp.asarray(xs), sh(P("time")))
    Ps_d = jax.device_put(jnp.asarray(Ps), sh(P("time")))
    dts_d = jax.device_put(jnp.asarray(dts), sh(P("time")))
    fn = jax.jit(lambda x, p, d: kalman.rts_smooth_assoc(x, p, d)[0])
    got = fn(xs_d, Ps_d, dts_d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_x),
                               atol=1e-5)


def test_smooth_sequence_exposes_interpolated_gaps():
    """Regression: the wrapper must NOT zero the occlusion-gap frames —
    interpolating them is the smoother's purpose.  valid = initialized,
    not per-frame detection."""
    pos, meas, dt = _sim(T=120, seed=5)
    T = len(meas)
    valid = np.ones((T, 1), bool)
    valid[40:52] = False                         # occlusion gap
    smoothed, _ = kalman.smooth_sequence(
        kalman.init_state(1), jnp.asarray(meas[:, None, :]),
        jnp.zeros((T, 1)), jnp.zeros((T, 1), jnp.int32),
        jnp.asarray(valid), jnp.full((T,), dt))
    sm = np.asarray(smoothed.pos)[:, 0]
    sv = np.asarray(smoothed.valid)[:, 0]
    assert sv[40:52].all()                       # gap frames ARE valid
    gap_err = np.linalg.norm(sm[40:52] - pos[40:52], axis=1)
    assert (gap_err > 0).all()                   # not zeroed
    assert gap_err.mean() < 0.01                 # interpolated, < 1 cm


def test_process_recording_smooth_flag():
    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.models import offline
    from low_cost_mocap_tpu.ops import camera as cam_ops
    from low_cost_mocap_tpu.ops import world as world_ops
    from low_cost_mocap_tpu.utils import synthetic as syn

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    T = 64

    def markers(t):
        p = np.array([0.3 * np.cos(t / 40), 0.3 * np.sin(t / 40), 0.6],
                     np.float32)
        return syn.drone_markers(p, 0.0, rig)

    frames, truth = [], []
    for t in range(T):
        X = markers(t)
        pts, mask = syn.observe(X, Rs, ts, rig)
        frames.append(syn.render_frames(pts, mask, rig.image_size,
                                        sigma=0.8))
        truth.append(X)
    frames = (np.stack(frames) * 255).astype(np.uint8)
    Ps = cam_ops.projection_matrix(jnp.asarray(rig.K_stack()),
                                   jnp.asarray(Rs), jnp.asarray(ts))
    res = offline.process_recording(
        jnp.asarray(frames), Ps, jnp.asarray(rig.K_stack()),
        jnp.asarray(rig.dist_stack()), jnp.eye(4), rig, cfg,
        dts=jnp.full((T,), 1 / 60), smooth=True)
    assert res.smoothed is not None
    tv = np.asarray(res.smoothed.valid)
    d = int(np.argmax(tv.sum(axis=0)))
    centres = np.stack([
        np.asarray(world_ops.to_world(
            jnp.asarray((markers(t)[0] + markers(t)[1]) / 2), jnp.eye(4)))
        for t in range(T)])
    sm = np.asarray(res.smoothed.pos)[:, d]
    ft = np.asarray(res.tracked.pos)[:, d]
    keep = tv[10:, d]
    e_sm = np.linalg.norm((sm[10:] - centres[10:])[keep], axis=1).mean()
    e_ft = np.linalg.norm((ft[10:] - centres[10:])[keep], axis=1).mean()
    # the smoothed track must beat the causal reference-parity track
    assert e_sm < e_ft, (e_sm, e_ft)
    assert e_sm * 1000 < 3.0, e_sm * 1000    # < 3 mm smoothed ATE
