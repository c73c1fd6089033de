import numpy as np
import jax.numpy as jnp
from scipy.signal import butter, lfilter

from low_cost_mocap_tpu.ops import kalman, lowpass


def test_lpf_step_matches_scipy_lfilter():
    b, a = lowpass.butter_coeffs()
    rng = np.random.default_rng(0)
    x = rng.normal(size=200).astype(np.float32)
    ref = lfilter(b.astype(np.float64), a.astype(np.float64), x.astype(np.float64))
    s = lowpass.init_state(())
    ys = []
    for v in x:
        s, y = lowpass.lpf_step(s, jnp.asarray(v), b, a)
        ys.append(float(y))
    np.testing.assert_allclose(ys, ref, atol=1e-3)


def test_lpf_scan_matches_step_loop():
    b, a = lowpass.butter_coeffs()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(50, 3)).astype(np.float32)
    ys_scan = np.asarray(lowpass.lpf_scan(jnp.asarray(x), b, a))
    s = lowpass.init_state((3,))
    for t in range(50):
        s, y = lowpass.lpf_step(s, jnp.asarray(x[t]), b, a)
        np.testing.assert_allclose(np.asarray(y), ys_scan[t], atol=1e-5)


def _simulate_track(T=60, dt=1.0 / 60.0, seed=0):
    """Ballistic-ish smooth trajectory + noisy detections."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) * dt
    pos = np.stack([
        0.5 * np.sin(1.5 * t),
        0.3 * np.cos(1.1 * t),
        0.8 + 0.1 * t,
    ], axis=-1).astype(np.float32)
    meas = pos + rng.normal(scale=0.004, size=pos.shape).astype(np.float32)
    return pos, meas, dt


def test_kalman_tracks_single_object():
    pos, meas, dt = _simulate_track(T=150)
    st = kalman.init_state(1)
    outs = []
    for z in meas:
        cp = jnp.asarray(z[None])
        st, out = kalman.update(st, cp, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
                                jnp.ones((1,), bool), dt)
        outs.append(np.asarray(out.pos)[0])
    outs = np.asarray(outs)
    err = np.linalg.norm(outs - pos, axis=1)
    assert err[20:].mean() < 0.02


def test_kalman_matches_opencv_filter():
    """Our predict/correct must match cv.KalmanFilter numerically."""
    import cv2 as cv
    pos, meas, dt = _simulate_track(T=30, seed=2)

    kf = cv.KalmanFilter(9, 6)
    kf.processNoiseCov = np.eye(9, dtype=np.float32) * 1e-2
    kf.measurementNoiseCov = np.eye(6, dtype=np.float32)
    kf.measurementMatrix = np.hstack([np.eye(6), np.zeros((6, 3))]).astype(np.float32)
    kf.statePost = np.zeros((9, 1), np.float32)
    kf.errorCovPost = np.eye(9, dtype=np.float32)

    st = kalman.init_state(1)
    prev = np.zeros(3, np.float32)
    first = True
    for z in meas:
        F = np.eye(9, dtype=np.float32)
        F[:3, 3:6] = dt * np.eye(3)
        F[3:6, 6:9] = dt * np.eye(3)
        F[:3, 6:9] = 0.5 * dt * dt * np.eye(3)
        kf.transitionMatrix = F
        if first:
            A = kf.statePost
            A[0:3] = z.reshape(3, 1)
            kf.statePost = A
            prev = z.copy()  # our init also seeds prev_pos (documented fix)
            first = False
        pred = kf.predict()[:3, 0]
        vel = (z - prev) / dt
        prev = z.copy()
        kf.correct(np.concatenate([z, vel]).astype(np.float32).reshape(6, 1))

        st, out = kalman.update(st, jnp.asarray(z[None]), jnp.zeros((1,)),
                                jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool),
                                dt)
        np.testing.assert_allclose(np.asarray(out.pos)[0], pred, atol=1e-3)
        np.testing.assert_allclose(np.asarray(st.x)[0], kf.statePost[:, 0], atol=1e-3)


def test_kalman_multi_object_association():
    """Two objects with interleaved candidate slots track independently."""
    dt = 1.0 / 60.0
    st = kalman.init_state(2)
    p0 = np.array([0.0, 0.0, 1.0], np.float32)
    p1 = np.array([1.0, 1.0, 0.5], np.float32)
    for t in range(40):
        c0 = p0 + np.array([0.002 * t, 0, 0], np.float32)
        c1 = p1 - np.array([0, 0.002 * t, 0], np.float32)
        cand_pos = jnp.asarray(np.stack([c1, c0]))   # slots swapped on purpose
        cand_idx = jnp.asarray(np.array([1, 0], np.int32))
        st, out = kalman.update(st, cand_pos, jnp.zeros((2,)), cand_idx,
                                jnp.ones((2,), bool), dt)
    final = np.asarray(out.pos)
    assert np.linalg.norm(final[0] - (p0 + [0.078, 0, 0])) < 0.02
    assert np.linalg.norm(final[1] - (p1 - [0, 0.078, 0])) < 0.02


def test_kalman_missing_detection_keeps_state():
    dt = 1.0 / 60.0
    st = kalman.init_state(1)
    z = np.array([0.5, 0.5, 0.5], np.float32)
    st, out1 = kalman.update(st, jnp.asarray(z[None]), jnp.zeros((1,)),
                             jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool), dt)
    x_before = np.asarray(st.x).copy()
    st, out2 = kalman.update(st, jnp.asarray(z[None]), jnp.zeros((1,)),
                             jnp.zeros((1,), jnp.int32), jnp.zeros((1,), bool), dt)
    assert not bool(np.asarray(out2.valid)[0])
    np.testing.assert_allclose(np.asarray(st.x), x_before, atol=0)


def test_track_sequence_scan_matches_stepwise():
    pos, meas, dt = _simulate_track(T=25, seed=3)
    T = len(meas)
    cp = jnp.asarray(meas[:, None, :])
    ch = jnp.zeros((T, 1))
    ci = jnp.zeros((T, 1), jnp.int32)
    cv_ = jnp.ones((T, 1), bool)
    dts = jnp.full((T,), dt)
    st = kalman.init_state(1)
    _, outs = kalman.track_sequence(st, cp, ch, ci, cv_, dts)
    st2 = kalman.init_state(1)
    for t in range(T):
        st2, o = kalman.update(st2, cp[t], ch[t], ci[t], cv_[t], dt)
        np.testing.assert_allclose(np.asarray(outs.pos)[t], np.asarray(o.pos), atol=1e-5)


def test_kalman_report_post_reduces_lag():
    """report='post' includes the current frame's measurement; on a
    constant-velocity track its steady-state error must undercut the
    reference's statePre reporting (which never sees the newest frame)."""
    import jax.numpy as jnp

    from low_cost_mocap_tpu.ops import kalman

    T, v = 60, np.array([0.3, 0.0, 0.0], np.float32)
    dt = 1.0 / 60.0
    errs = {}
    for report in ("pre", "post"):
        st = kalman.init_state(1)
        es = []
        for t in range(T):
            pos = v * (t * dt)
            st, out = kalman.update(
                st, jnp.asarray(pos[None]), jnp.zeros((1,)),
                jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool),
                jnp.asarray(dt), report=report)
            if t > 20:
                es.append(np.linalg.norm(np.asarray(out.pos)[0] - pos))
        errs[report] = float(np.mean(es))
    assert errs["post"] < errs["pre"], errs

    with np.testing.assert_raises(Exception):
        kalman.update(kalman.init_state(1), jnp.zeros((1, 3)),
                      jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
                      jnp.ones((1,), bool), jnp.asarray(dt),
                      report="bogus")


def test_pallas_kalman_scan_matches_xla_chain():
    """The fused Pallas bank kernel (ops/kalman_pallas.py — the batched
    serving mode's Kalman scan on TPU) runs the identical per-step
    formulas as ``kalman.update``: interpret mode must match the XLA
    chain through init, dropouts, association ties and the long-gap
    re-seed.  (On the chip the two are BITWISE identical — asserted by
    benchmarks/onchip_differential.py; this CPU test guards the
    kernel's semantics.)"""
    import jax

    from low_cost_mocap_tpu.ops.kalman_pallas import kalman_scan

    rng = np.random.default_rng(3)
    B, M, O = 14, 8, 2
    st = kalman.init_state(O)
    cand_pos = rng.normal(0, 0.4, (B, M, 3)).astype(np.float32)
    cand_h = rng.normal(0, 1, (B, M)).astype(np.float32)
    cand_i = rng.integers(0, O, (B, M)).astype(np.int32)
    cand_v = rng.random((B, M)) < 0.6
    cand_v[4:8][cand_i[4:8] == 0] = False          # dropout window
    dts = np.full((B,), 1 / 60, np.float32)
    dts[9] = 0.7                                   # trips gap_reset_s

    st_x = st
    want = []
    for t in range(B):
        st_x, tr = kalman.update(
            st_x, jnp.asarray(cand_pos[t]), jnp.asarray(cand_h[t]),
            jnp.asarray(cand_i[t]), jnp.asarray(cand_v[t]),
            jnp.asarray(dts[t]))
        want.append(tr)

    st_p, got = kalman_scan(
        st, jnp.asarray(cand_pos), jnp.asarray(cand_h),
        jnp.asarray(cand_i), jnp.asarray(cand_v), jnp.asarray(dts),
        interpret=True)
    for t in range(B):
        np.testing.assert_array_equal(np.asarray(want[t].valid),
                                      np.asarray(got.valid[t]))
        np.testing.assert_allclose(np.asarray(want[t].pos),
                                   np.asarray(got.pos[t]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(want[t].vel),
                                   np.asarray(got.vel[t]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(want[t].heading),
                                   np.asarray(got.heading[t]), atol=1e-5)
    for leaf_w, leaf_g in zip(jax.tree.leaves(st_x), jax.tree.leaves(st_p)):
        np.testing.assert_allclose(np.asarray(leaf_w, np.float32),
                                   np.asarray(leaf_g, np.float32),
                                   atol=1e-5)
