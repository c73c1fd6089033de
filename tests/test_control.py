"""Native control runtime: protocol parity, failsafes, closed-loop flight."""

import json

import numpy as np
import pytest

from low_cost_mocap_tpu.control import (
    CascadeBank, DroneSimulator, plan_trajectory_segment, sbus_decode,
    sbus_encode)


US = 1_000_000


def test_frame_protocol_routing():
    bank = CascadeBank(2)
    # reference framing: index digit + JSON (computer_code/api/helpers.py:121)
    assert bank.feed(b'1{"armed": true}', now_us=0) == 1
    assert bank.armed(1)
    assert not bank.armed(0)
    assert bank.feed(b'9{"armed": true}', now_us=0) == -1  # out of range
    assert bank.feed(b'x', now_us=0) == -1                 # malformed


def test_arm_disarm_and_failsafe():
    bank = CascadeBank(1)
    bank.feed_command(0, {"armed": True}, now_us=0)
    ch = bank.step(0, now_us=10_000)
    assert ch[4] == 1800  # arm channel high (receiver_esp32.ino:218)
    # 2 s without ping -> auto disarm (receiver_esp32.ino:213-215)
    ch = bank.step(0, now_us=2 * US + 20_000)
    assert ch[4] == 172
    assert not bank.armed(0)


def test_post_arm_throttle_inhibit():
    bank = CascadeBank(1)
    bank.feed_command(0, {"armed": True}, now_us=0)
    bank.feed_command(0, {"setpoint": [0.0, 0.0, 1.0]}, now_us=1000)
    # airborne pose: at z=0 the ground-effect clamp zeroes throttle entirely
    # (1 - 28*((2*0.0225)/(4*0.035))^2 < 0, receiver_esp32.ino:242-243)
    bank.feed_command(0, {"pos": [0, 0, 0.5, 0], "vel": [0, 0, 0]}, now_us=2000)
    ch = bank.step(0, now_us=50_000)   # 50 ms after arming
    assert ch[2] == 172                # throttle held (receiver_esp32.ino:244)
    bank.feed_command(0, {"pos": [0, 0, 0.5, 0], "vel": [0, 0, 0]}, now_us=150_000)
    ch = bank.step(0, now_us=200_000)  # 200 ms after arming
    assert ch[2] > 172                 # throttle now live


def test_trim_and_pid_commands():
    bank = CascadeBank(1)
    bank.feed_command(0, {"trim": [10, -5, 7, 3]}, now_us=0)
    bank.feed_command(0, {"armed": True}, now_us=0)
    bank.step(0, now_us=10_000)
    pwm = bank.pwm(0)
    # with zero error and zero state, PWM = 992 + trim
    np.testing.assert_allclose(pwm, [992 + 10, 992 - 5, 0, 992 + 3], atol=1.0)
    # z PWM is ground-effect scaled at z=0: 1 - 28*((0.045)/(4*0.035))^2 < 0
    # -> clamps to 0 (receiver_esp32.ino:242-243)
    pid17 = [1, 0, 0, 1.5, 0, 0, 0.3, 0.1, 0.05,
             0.2, 0.03, 0.05, 0.3, 0.1, 0.05, 0.0, -0.035]
    bank.feed_command(0, {"pid": [float(x) for x in pid17]}, now_us=20_000)
    bank.feed_command(0, {"pos": [0, 0, 1.0, 0], "vel": [0, 0, 0]}, now_us=20_000)
    bank.step(0, now_us=30_000)
    pwm = bank.pwm(0)
    assert pwm[2] != 0  # ground effect disabled (coef 0), away from ground


def test_sbus_roundtrip():
    rng = np.random.default_rng(0)
    ch = rng.integers(0, 2048, size=16).astype(np.uint16)
    frame = sbus_encode(ch, flags=0b1010)
    assert len(frame) == 25 and frame[0] == 0x0F and frame[-1] == 0x00
    dec = sbus_decode(frame)
    assert dec is not None
    ch2, flags = dec
    np.testing.assert_array_equal(ch, ch2)
    assert flags == 0b1010
    assert sbus_decode(b"\x00" * 25) is None


def test_closed_loop_hover():
    """Cascade + simulator converge to a hover setpoint — the HIL test the
    reference never had (its validation was flying real drones)."""
    bank = CascadeBank(1)
    sim = DroneSimulator()
    sim.set_state([0.3, -0.2, 0.04])  # landed: marker ~4 cm above floor
    target = np.array([0.0, 0.0, 0.8])

    bank.feed_command(0, {"armed": True}, now_us=0)
    bank.feed_command(0, {"setpoint": list(map(float, target))}, now_us=0)

    dt = 1.0 / 500.0
    now = 0
    for i in range(int(30.0 / dt)):
        now = int(i * dt * US)
        pos, vel, yaw = sim.get_state()
        # mocap feedback at full rate (pose+vel feed, helpers.py:113-122)
        bank.feed_command(0, {
            "pos": [round(float(x), 4) for x in pos] + [round(yaw, 4)],
            "vel": [round(float(x), 4) for x in vel],
        }, now_us=now)
        ch = bank.step(0, now_us=now)
        sim.step(ch, dt)

    pos, vel, _ = sim.get_state()
    assert np.linalg.norm(pos - target) < 0.1, pos
    assert np.linalg.norm(vel) < 0.2, vel


def test_otg_respects_limits_and_reaches_target():
    start = np.array([0.0, 1.0, -0.5])
    end = np.array([1.0, 1.0, 0.5])
    ts = 0.05  # reference setpoint cadence (src/App.tsx:19)
    sp = plan_trajectory_segment(start, end, max_vel=0.5, max_accel=1.0,
                                 max_jerk=2.0, timestep=ts)
    assert sp.shape[1] == 3
    np.testing.assert_allclose(sp[0], start, atol=1e-9)
    np.testing.assert_allclose(sp[-1], end, atol=1e-6)
    v = np.diff(sp, axis=0) / ts
    a = np.diff(v, axis=0) / ts
    assert np.abs(v).max() <= 0.5 * 1.05 + 1e-6     # small sampling slack
    assert np.abs(a).max() <= 1.0 * 1.15 + 1e-6
    # monotone progress along the moving DoF
    assert (np.diff(sp[:, 0]) >= -1e-9).all()


def test_otg_zero_distance():
    sp = plan_trajectory_segment([1.0], [1.0], 1.0, 1.0, 1.0, 0.05)
    assert len(sp) >= 1
    np.testing.assert_allclose(sp[-1], [1.0])


def test_otg_synchronized_arrival():
    # two DoFs with very different distances arrive together
    sp = plan_trajectory_segment([0.0, 0.0], [2.0, 0.1], 1.0, 2.0, 5.0, 0.01)
    # DoF 1 should NOT finish early: its motion spans most of the profile
    moving = np.abs(np.diff(sp[:, 1])) > 1e-7
    assert moving[int(len(moving) * 0.7)]
