"""Beam-search correspondence: agreement with exact mode + large-rig scaling."""

import numpy as np
import pytest
import jax.numpy as jnp

from low_cost_mocap_tpu.ops import camera, correspond
from low_cost_mocap_tpu.utils import synthetic as syn
from tests.test_correspond import _setup, _to_slots


@pytest.mark.slow
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


def test_assoc_mode_accuracy_matches_beam_on_large_rig():
    """mode="assoc" (constant-depth large-rig path) reconstructs every
    marker as well as beam at 16 cameras (and is ~8x faster on TPU)."""
    import jax.numpy as jnp
    import numpy as np

    from low_cost_mocap_tpu.ops import camera as cam_ops, correspond as co
    from low_cost_mocap_tpu.utils import synthetic as syn

    for n_pts, seed in [(8, 2), (12, 3)]:
        Rs, ts, rig = syn.ring_rig(num_cameras=16)
        rng = np.random.default_rng(seed)
        X = syn.random_points(rng, n_pts)
        pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.3, rng=rng)
        K = 16
        ptsp = np.zeros((16, K, 2), np.float32)
        maskp = np.zeros((16, K), bool)
        ptsp[:, :n_pts] = pts.transpose(1, 0, 2)
        maskp[:, :n_pts] = mask.T
        Ps = cam_ops.projection_matrix(jnp.asarray(rig.K_stack()),
                                       jnp.asarray(Rs), jnp.asarray(ts))
        m = co.match_points(jnp.asarray(ptsp), jnp.asarray(maskp), Ps,
                            mode="assoc")
        got = np.asarray(m["object_points"])[np.asarray(m["valid"])]
        worst = max(np.linalg.norm(got - x, axis=-1).min() for x in X)
        assert worst < 0.01, worst
    # the default for large rigs IS assoc
    m2 = co.match_points(jnp.asarray(ptsp), jnp.asarray(maskp), Ps)
    got2 = np.asarray(m2["object_points"])[np.asarray(m2["valid"])]
    assert max(np.linalg.norm(got2 - x, axis=-1).min() for x in X) < 0.01
