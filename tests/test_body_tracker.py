"""Temporal 6-DoF body tracking (ops/body_tracker.py)."""

import numpy as np

import jax.numpy as jnp

from low_cost_mocap_tpu.ops import body_tracker as bt


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    Rs = np.stack([_random_rotation(rng) for _ in range(32)])
    q = bt.rot_to_quat(jnp.asarray(Rs))
    R2 = bt.quat_to_rot(q)
    assert np.abs(np.asarray(R2) - Rs).max() < 1e-5


def _step(st, t, R, rms=1e-3, valid=True, dt=1 / 60):
    return bt.update(
        st,
        jnp.asarray(t, jnp.float32)[None],
        jnp.asarray(R, jnp.float32)[None],
        jnp.asarray([rms], jnp.float32),
        jnp.asarray([valid]),
        jnp.asarray(dt, jnp.float32))


def test_track_follows_and_coasts_through_dropout():
    rng = np.random.default_rng(1)
    R = _random_rotation(rng)
    st = bt.init_state(1)
    v = np.array([0.6, 0.0, 0.3], np.float32)
    pos = lambda i: np.array([0.1, 0.0, 0.8]) + v * (i / 60.0)
    for i in range(10):
        st, out = _step(st, pos(i), R)
    assert bool(out.valid[0])
    assert np.abs(np.asarray(out.pos[0]) - pos(9)).max() < 0.01
    assert np.abs(np.asarray(out.vel[0]) - v).max() < 0.2

    # dropout: no measurement for 3 frames -> coasts on velocity
    for i in range(10, 13):
        st, out = _step(st, pos(i), R, valid=False)
    assert bool(out.valid[0])
    assert np.abs(np.asarray(out.pos[0]) - pos(12)).max() < 0.05

    # reacquire
    st, out = _step(st, pos(13), R)
    assert np.abs(np.asarray(out.pos[0]) - pos(13)).max() < 0.02


def test_gate_rejects_teleporting_wrong_fit():
    rng = np.random.default_rng(2)
    R = _random_rotation(rng)
    st = bt.init_state(1)
    here = np.array([0.0, 0.0, 0.8], np.float32)
    for _ in range(5):
        st, out = _step(st, here, R)
    # a confident but wrong interpretation 0.5 m away (the single-frame
    # ambiguity case rigid_general documents) must NOT capture the track
    st, out = _step(st, here + 0.5, R)
    assert bool(out.valid[0])
    assert np.abs(np.asarray(out.pos[0]) - here).max() < 0.02


def test_track_dies_after_max_missed_and_respawns():
    rng = np.random.default_rng(3)
    R = _random_rotation(rng)
    st = bt.init_state(1)
    st, out = _step(st, [0.0, 0.0, 0.8], R)
    assert bool(out.valid[0])
    for _ in range(10):  # > max_missed
        st, out = _step(st, [0, 0, 0], R, valid=False)
    assert not bool(out.valid[0])
    st, out = _step(st, [1.0, 0.2, 0.5], R)
    assert bool(out.valid[0])
    assert np.abs(np.asarray(out.pos[0]) - [1.0, 0.2, 0.5]).max() < 1e-5


def test_two_bodies_keep_identities():
    rng = np.random.default_rng(4)
    R1, R2 = _random_rotation(rng), _random_rotation(rng)
    st = bt.init_state(2)
    p1 = lambda i: np.array([0.5, 0.0, 1.0 + 0.01 * i], np.float32)
    p2 = lambda i: np.array([-0.5, 0.0, 1.0 - 0.01 * i], np.float32)
    for i in range(8):
        ts = jnp.asarray(np.stack([p1(i), p2(i)]))
        Rs = jnp.asarray(np.stack([R1, R2]))
        st, out = bt.update(st, ts, Rs,
                            jnp.asarray([1e-3, 1e-3], jnp.float32),
                            jnp.asarray([True, True]),
                            jnp.asarray(1 / 60, jnp.float32))
    # slot 0 stayed on body 1, slot 1 on body 2
    assert np.abs(np.asarray(out.pos[0]) - p1(7)).max() < 0.02
    assert np.abs(np.asarray(out.pos[1]) - p2(7)).max() < 0.02


def test_partial_visibility_assignment_precision():
    """Regression: with one fit occluded, the exhaustive matcher's padded
    cost entries must not swamp float32 precision — the NEAR track claims
    the one visible fit, not the first permutation in table order (a
    1e9 sentinel made all totals tie at ulp(1e9)=64)."""
    st = bt.init_state(2)
    I3 = np.eye(3, dtype=np.float32)
    # activate two tracks at distinct positions
    for _ in range(3):
        st, _ = bt.update(
            st,
            jnp.asarray([[0.0, 0.0, 0.0], [0.12, 0.0, 0.0]], jnp.float32),
            jnp.asarray(np.stack([I3, I3])),
            jnp.asarray([1e-3, 1e-3], jnp.float32),
            jnp.asarray([True, True]),
            jnp.asarray(1 / 60, jnp.float32))
    assert bool(np.asarray(st.active).all())
    # one fit visible, 5 mm from track 0 and 115 mm from track 1 — BOTH
    # inside the 0.15 m gate; the second fit is occluded (invalid)
    st2, out = bt.update(
        st,
        jnp.asarray([[0.005, 0.0, 0.0], [9.9, 9.9, 9.9]], jnp.float32),
        jnp.asarray(np.stack([I3, I3])),
        jnp.asarray([1e-3, 1e-3], jnp.float32),
        jnp.asarray([True, False]),
        jnp.asarray(1 / 60, jnp.float32))
    pos = np.asarray(out.pos)
    # track 0 moved toward the fit; track 1 coasted at its position
    assert np.linalg.norm(pos[0] - [0.005, 0, 0]) < 0.01, pos
    assert np.linalg.norm(pos[1] - [0.12, 0, 0]) < 0.01, pos
