"""Multi-rig batched serving: R capture volumes in one compiled step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from low_cost_mocap_tpu.models.pipeline import (batched_track_from_blobs,
                                                make_init_state,
                                                track_from_blobs)
from low_cost_mocap_tpu.ops import camera
from low_cost_mocap_tpu.ops.correspond import _pairwise_fundamentals
from low_cost_mocap_tpu.utils import synthetic as syn


def _rig_inputs(seed):
    Rs, ts, rig = syn.ring_rig(num_cameras=4,
                               radius=1.8 + 0.2 * (seed % 3))
    rng = np.random.default_rng(seed)
    X = syn.random_points(rng, 5)
    pts, mask = syn.observe(X, Rs, ts, rig)
    slots = np.zeros((rig.num_cameras, 8, 2), np.float32)
    ok = np.zeros((rig.num_cameras, 8), bool)
    for c in range(rig.num_cameras):
        vis = np.where(mask[:, c])[0]
        slots[c, :len(vis)] = pts[vis, c]
        ok[c, :len(vis)] = True
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = camera.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    return rig, slots, ok, Ps, K, dist, _pairwise_fundamentals(Ps)


@pytest.mark.slow
def test_batched_equals_per_rig():
    R = 3
    per = [_rig_inputs(s) for s in range(R)]
    rig = per[0][0]
    kw = dict(gate_px=5.0, max_candidates=2,
              marker_dist1=rig.marker_dist_short,
              marker_dist2=rig.marker_dist_long,
              marker_tol=rig.marker_dist_tol,
              marker_side_min=rig.marker_side_min)
    M = jnp.eye(4, dtype=jnp.float32)
    dt = jnp.asarray(1.0 / 60.0)

    singles = []
    for _, slots, ok, Ps, K, dist, Fs in per:
        st, out = track_from_blobs(
            make_init_state(rig), jnp.asarray(slots), jnp.asarray(ok),
            dt, Ps, K, dist, M, Fs, **kw)
        singles.append(out)

    stack = lambda xs: jnp.stack([jnp.asarray(x) for x in xs])
    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[make_init_state(rig) for _ in range(R)])
    _, bout = batched_track_from_blobs(
        states,
        stack([p[1] for p in per]), stack([p[2] for p in per]),
        jnp.full((R,), 1.0 / 60.0),
        stack([p[3] for p in per]), stack([p[4] for p in per]),
        stack([p[5] for p in per]),
        jnp.tile(M, (R, 1, 1)), stack([p[6] for p in per]), **kw)

    for r in range(R):
        np.testing.assert_array_equal(np.asarray(bout.point_valid[r]),
                                      np.asarray(singles[r].point_valid))
        np.testing.assert_allclose(np.asarray(bout.object_points[r]),
                                   np.asarray(singles[r].object_points),
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(bout.tracked.pos[r]),
            np.asarray(singles[r].tracked.pos), atol=1e-5)
