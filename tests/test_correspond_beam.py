"""Beam-search correspondence: agreement with exact mode + large-rig scaling."""

import numpy as np
import jax.numpy as jnp

from low_cost_mocap_tpu.ops import camera, correspond
from low_cost_mocap_tpu.utils import synthetic as syn
from tests.test_correspond import _setup, _to_slots


def test_beam_matches_exact_small_rig():
    X, pts, mask, Ps = _setup(n_pts=4, seed=11, noise=0.5)
    slots, ok = _to_slots(pts, mask)
    exact = correspond.match_points(jnp.asarray(slots), jnp.asarray(ok),
                                    jnp.asarray(Ps), mode="exact")
    beam = correspond.match_points(jnp.asarray(slots), jnp.asarray(ok),
                                   jnp.asarray(Ps), mode="beam")
    ve, vb = np.asarray(exact["valid"]), np.asarray(beam["valid"])
    pe = np.asarray(exact["object_points"])[ve]
    pb = np.asarray(beam["object_points"])[vb]
    assert len(pe) == len(pb)
    for p in pe:
        assert np.linalg.norm(pb - p, axis=1).min() < 1e-3


def test_beam_sixteen_cameras():
    Rs, ts, rig = syn.ring_rig(num_cameras=16)
    rng = np.random.default_rng(12)
    X = syn.random_points(rng, 5)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.5, rng=rng)
    Ps = np.asarray(camera.projection_matrix(
        jnp.asarray(rig.K_stack()), jnp.asarray(Rs), jnp.asarray(ts)))
    slots, ok = _to_slots(pts, mask)
    # auto mode must route to beam (exact would need 3^15 hypotheses/root)
    res = correspond.match_points(jnp.asarray(slots), jnp.asarray(ok),
                                  jnp.asarray(Ps))
    got = np.asarray(res["object_points"])[np.asarray(res["valid"])]
    assert len(got) >= 5
    for x in X:
        assert np.linalg.norm(got - x, axis=1).min() < 0.02
