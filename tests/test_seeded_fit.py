"""Track-seeded joint temporal fit (ops/rigid_general.fit_body seeds).

Two failure modes of pure single-frame fitting that the track-prediction
hypotheses close:
  1. every anchor seed triple contains an occluded marker -> no hypothesis
     survives even though >= min_markers markers are visible;
  2. two template-consistent interpretations exist -> selection between
     them is arbitrary without the proximity-to-prediction tie-break.
"""

import numpy as np
import jax.numpy as jnp

from low_cost_mocap_tpu.ops import rigid_general as rg

# 5 markers, engineered so the two seed edges are (0,1)-ish and (2,3)-ish:
# far pair along x, second-longest disjoint pair along y, marker 4 central
MARKERS = np.array([
    [0.00, 0.00, 0.00],
    [0.30, 0.00, 0.00],
    [0.10, 0.12, 0.02],
    [0.18, -0.10, 0.05],
    [0.14, 0.02, 0.09],
], np.float32)


def _edge_markers(tmpl):
    used = set()
    for (a, b, c) in tmpl.seeds:
        used.add((a, b))
    return sorted({m for e in used for m in e})


def test_seed_recovers_fit_when_all_anchor_edges_occluded():
    tmpl = rg.make_template(MARKERS)
    # occlude one endpoint of EVERY seed edge
    edges = sorted({(a, b) for (a, b, c) in tmpl.seeds})
    occluded = sorted({e[0] for e in edges})
    visible = [m for m in range(len(MARKERS)) if m not in occluded]
    assert len(visible) >= 3, (edges, occluded)

    t_true = np.array([0.2, -0.1, 0.3], np.float32)
    pts = np.zeros((8, 3), np.float32)
    valid = np.zeros((8,), bool)
    world = np.asarray(tmpl.markers) + t_true
    for s, m in enumerate(visible):
        pts[s] = world[m]
        valid[s] = True

    unseeded = rg.fit_body(jnp.asarray(pts), jnp.asarray(valid), tmpl)
    assert not bool(unseeded.valid)      # anchor enumeration is dead

    seeded = rg.fit_body(
        jnp.asarray(pts), jnp.asarray(valid), tmpl,
        seed_R=jnp.eye(3, dtype=jnp.float32)[None],
        seed_t=jnp.asarray((t_true + 0.01)[None]),  # near, not exact
        seed_ok=jnp.ones((1,), bool))
    assert bool(seeded.valid)
    np.testing.assert_allclose(np.asarray(seeded.t), t_true, atol=1e-3)
    assert float(seeded.rms) < 1e-3


def test_seed_tiebreak_selects_track_consistent_interpretation():
    """Two identical constellations; the fit follows the prediction."""
    tmpl = rg.make_template(MARKERS)
    t_a = np.array([-0.4, 0.0, 0.1], np.float32)
    t_b = np.array([0.5, 0.2, -0.1], np.float32)
    world = np.concatenate([np.asarray(tmpl.markers) + t_a,
                            np.asarray(tmpl.markers) + t_b])
    pts = jnp.asarray(world)
    valid = jnp.ones((len(world),), bool)
    eye = jnp.eye(3, dtype=jnp.float32)[None]

    for target in (t_a, t_b):
        fit = rg.fit_body(pts, valid, tmpl,
                          seed_R=eye,
                          seed_t=jnp.asarray((target + 0.02)[None]),
                          seed_ok=jnp.ones((1,), bool))
        assert bool(fit.valid)
        np.testing.assert_allclose(np.asarray(fit.t), target, atol=1e-3)


def test_seed_never_overrules_a_clearly_better_fit():
    """A prediction 0.5 m off must lose to the true constellation."""
    tmpl = rg.make_template(MARKERS)
    t_true = np.array([0.1, 0.1, 0.1], np.float32)
    world = np.asarray(tmpl.markers) + t_true
    fit = rg.fit_body(jnp.asarray(world), jnp.ones((len(world),), bool),
                      tmpl,
                      seed_R=jnp.eye(3, dtype=jnp.float32)[None],
                      seed_t=jnp.asarray((t_true + 0.5)[None]),
                      seed_ok=jnp.ones((1,), bool))
    assert bool(fit.valid)
    np.testing.assert_allclose(np.asarray(fit.t), t_true, atol=1e-3)


def test_pipeline_track_survives_anchor_occlusion():
    """Live tail: a tracked body keeps its 6-DoF fit through a frame where
    the anchor-edge markers vanish (the joint temporal fit in action)."""
    import dataclasses

    from low_cost_mocap_tpu.models.pipeline import (make_init_state,
                                                    track_from_blobs)
    from low_cost_mocap_tpu.ops import camera
    from low_cost_mocap_tpu.utils import synthetic as syn

    Rs, ts, rig0 = syn.ring_rig(num_cameras=4)
    rig = dataclasses.replace(rig0,
                              body_markers=tuple(map(tuple,
                                                     MARKERS.tolist())),
                              max_bodies=1)
    tmpl = rig.body_template()
    edges = sorted({(a, b) for (a, b, c) in tmpl.seeds})
    occluded = sorted({e[0] for e in edges})

    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = camera.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    t_disp = np.array([0.05, 0.02, 0.1], np.float32)

    def to_tri(Xw):
        Xs = np.asarray(Xw, np.float32)[:, [0, 2, 1]]
        return Xs @ np.diag([-1.0, -1.0, 1.0]).astype(np.float32)

    state = make_init_state(rig)
    kw = dict(gate_px=5.0, max_candidates=2,
              marker_dist1=rig.marker_dist_short,
              marker_dist2=rig.marker_dist_long,
              marker_tol=rig.marker_dist_tol,
              marker_side_min=rig.marker_side_min,
              body_sets=rig.body_sets_resolved())
    out = None
    for step_i in range(5):
        drop = occluded if step_i == 3 else ()
        keep = [m for m in range(len(MARKERS)) if m not in drop]
        Xw = np.asarray(tmpl.markers)[keep] + t_disp
        X = to_tri(Xw)
        pts, mask = syn.observe(X, Rs, ts, rig)
        slots = np.zeros((rig.num_cameras, 8, 2), np.float32)
        ok = np.zeros((rig.num_cameras, 8), bool)
        for c in range(rig.num_cameras):
            vis = np.where(mask[:, c])[0]
            slots[c, :len(vis)] = pts[vis, c]
            ok[c, :len(vis)] = True
        state, out = track_from_blobs(
            state, jnp.asarray(slots), jnp.asarray(ok),
            jnp.asarray(1.0 / 60.0), Ps, K, dist,
            jnp.eye(4, dtype=jnp.float32), None, **kw)
        if step_i == 3:
            # occlusion frame: the PER-FRAME fit still lands (seeded)
            assert bool(np.asarray(out.bodies.valid)[0])
            np.testing.assert_allclose(np.asarray(out.bodies.t)[0],
                                       t_disp, atol=5e-3)
    assert bool(np.asarray(out.tracked_bodies.valid)[0])
    np.testing.assert_allclose(np.asarray(out.tracked_bodies.pos)[0],
                               t_disp, atol=1e-2)
