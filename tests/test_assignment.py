"""Optimal assignment op + its use in body-track association."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from low_cost_mocap_tpu.ops import assignment, body_tracker


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
def test_matches_scipy_linear_sum_assignment(n):
    rng = np.random.default_rng(n)
    for _ in range(20):
        cost = rng.random((n, n)).astype(np.float32)
        col, total = assignment.assign(jnp.asarray(cost))
        rows, cols = linear_sum_assignment(cost)
        np.testing.assert_allclose(float(total),
                                   cost[rows, cols].sum(), rtol=1e-6)
        # optimal value unique even when the argmin permutation isn't
        assert abs(cost[np.arange(n), np.asarray(col)].sum()
                   - float(total)) < 1e-6


def test_rejects_oversized():
    with pytest.raises(ValueError, match="N <= 8"):
        assignment.assign(jnp.zeros((9, 9)))


def test_crossing_bodies_keep_identities():
    """Two tracks on head-on courses: greedy nearest-neighbour can swap
    identities at the crossing; the optimal matcher must not."""
    dt = 1.0 / 60.0
    st = body_tracker.init_state(2)
    eye = np.eye(3, dtype=np.float32)

    def step(st, p0, p1):
        return body_tracker.update(
            st, jnp.asarray(np.stack([p0, p1]).astype(np.float32)),
            jnp.asarray(np.stack([eye, eye])),
            jnp.zeros((2,)), jnp.ones((2,), bool), jnp.asarray(dt))

    # approach along x at +-0.3 m/s, offset 2 cm in y so they never merge
    for t in range(40):
        x = -0.3 + 0.015 * t
        a = np.array([x, 0.01, 0.5])
        b = np.array([-x, -0.01, 0.5])
        # fits arrive in a scrambled order after the crossing
        p0, p1 = (a, b) if t < 20 else (b, a)
        st, out = step(st, p0, p1)
    tv = np.asarray(out.valid)
    assert tv.all()
    pos = np.asarray(out.pos)
    # track 0 followed body a (now at +x side), track 1 body b
    assert pos[0, 1] > 0 and pos[1, 1] < 0, pos
    assert pos[0, 0] > 0.2 and pos[1, 0] < -0.2, pos
