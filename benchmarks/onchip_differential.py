"""On-chip accuracy gate: the vs-reference differential on the real TPU.

The CPU test suite cannot see TPU matmul-precision effects; this script
runs ``utils/differential.run_differential`` with the framework side on
the actual chip and asserts the BASELINE bounds hold there.  Round 4
caught a ~1.2 mm on-chip accuracy loss (TPU-default bf16 matmul inputs
truncating positions/pixels) exactly this way — run it after ANY change
to the geometry ops (einsums/matmuls on metric data).

Exit code 0 = bounds hold on-chip; 1 = bounds FAIL; 2 = reference
checkout missing (no-op, NOT a pass).  ~3-5 min warm (the clean scene
plus the four hard-regime scenes; two distinct compiled programs).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    from low_cost_mocap_tpu.utils import differential, reference_impl

    if not reference_impl.reference_available():
        print("reference checkout not present; nothing to compare against")
        return 2   # distinct from PASS so callers can't mistake a no-op

    m = differential.run_differential(T=240, noise_px=0.3, seed=7)
    print(f"backend: {jax.default_backend()}")
    ok = True
    for idx in (0, 1):
        r = m[idx]
        bound = r["ate_ref_vs_truth_mm"] * 1.10
        good = (r["ate_ref_vs_repo_mm"] <= bound
                and r["ate_repo_vs_truth_mm"] <= r["ate_ref_vs_truth_mm"])
        ok &= good
        print(f"drone {idx}: ref-vs-THIS {r['ate_ref_vs_repo_mm']:6.3f} mm "
              f"(bound {bound:5.3f})  THIS-vs-truth "
              f"{r['ate_repo_vs_truth_mm']:6.3f} mm "
              f"(ref-vs-truth {r['ate_ref_vs_truth_mm']:6.3f})  "
              f"{'OK' if good else 'FAIL'}")

    # hard regimes on-chip (same scenes + bounds as
    # tests/test_reference_differential.py; the occlusion/distractor
    # scenes reuse the clean program's shapes — only the crowded scene
    # costs an extra compile)
    m = differential.run_differential(T=140, occlusions=((60, 100, 2, 0, 3),))
    r = m[0]
    good = (r["frames_repo"] >= r["frames_ref"] + 20
            and r["ate_repo_vs_truth_mm"]
            <= r["ate_ref_vs_truth_mm"] * 0.45)
    ok &= good
    print(f"partial occlusion: THIS {r['frames_repo']} vs ref "
          f"{r['frames_ref']} frames; THIS-vs-truth "
          f"{r['ate_repo_vs_truth_mm']:5.2f} mm (ref "
          f"{r['ate_ref_vs_truth_mm']:5.2f})  {'OK' if good else 'FAIL'}")

    m = differential.run_differential(T=200, occlusions=((80, 110, -1, 0, 3),))
    r = m[0]
    good = (r["ate_ref_vs_repo_steady_mm"] < 3.0
            and r["postgap_repo_vs_truth_mm"]
            <= r["postgap_ref_vs_truth_mm"] * 0.6)
    ok &= good
    print(f"dropout reacquire: postgap THIS "
          f"{r['postgap_repo_vs_truth_mm']:5.2f} mm vs ref "
          f"{r['postgap_ref_vs_truth_mm']:5.2f}  {'OK' if good else 'FAIL'}")

    m = differential.run_differential(T=140, n_distractors=2)
    good = all(m[i]["ate_ref_vs_repo_steady_mm"] < 3.0
               and m[i]["ate_repo_vs_truth_mm"]
               <= m[i]["ate_ref_vs_truth_mm"] for i in (0, 1))
    ok &= good
    print(f"distractors: steady ref-vs-THIS "
          f"{m[0]['ate_ref_vs_repo_steady_mm']:5.2f}/"
          f"{m[1]['ate_ref_vs_repo_steady_mm']:5.2f} mm  "
          f"{'OK' if good else 'FAIL'}")

    m = differential.run_differential(T=140, n_extra_markers=4, max_blobs=16)
    good = all(m[i]["ate_ref_vs_repo_steady_mm"] < 3.5
               and m[i]["ate_repo_vs_truth_mm"]
               <= m[i]["ate_ref_vs_truth_mm"] for i in (0, 1))
    ok &= good
    print(f"crowded (>budget): steady ref-vs-THIS "
          f"{m[0]['ate_ref_vs_repo_steady_mm']:5.2f}/"
          f"{m[1]['ate_ref_vs_repo_steady_mm']:5.2f} mm  "
          f"{'OK' if good else 'FAIL'}")

    # Serving-mode parity ON THE CHIP.  Two assertions:
    # (1) the fused Pallas Kalman bank (ops/kalman_pallas.py — the
    #     batched mode's scan) is BITWISE identical to the XLA
    #     per-step chain given identical inputs;
    # (2) through the REAL pipeline, batched vs per-frame agree to
    #     float-fusion noise.  (They are bitwise on CPU — the tested
    #     product guarantee — but NOT on TPU, with or without the
    #     Pallas bank: the vmapped geometry fuses differently from the
    #     inline per-frame geometry, a pre-existing ulp-level effect
    #     measured below.)
    import functools

    import numpy as np
    import jax.numpy as jnp

    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.models.pipeline import (
        make_init_state, pack_outputs, scan_track_from_blobs,
        track_from_blobs)
    from low_cost_mocap_tpu.ops import camera as cam_ops
    from low_cost_mocap_tpu.ops.correspond import _pairwise_fundamentals
    from low_cost_mocap_tpu.utils import synthetic as syn

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    e = EngineConfig()
    rng = np.random.default_rng(1)
    B = 64
    blobs = np.zeros((B, 4, e.max_blobs, 2), np.float32)
    valid = np.zeros((B, 4, e.max_blobs), bool)
    for t in range(B):
        X = syn.random_points(rng, 6)
        pts, msk = syn.observe(X, Rs, ts, rig, noise_px=0.4, rng=rng)
        n = pts.shape[0]
        blobs[t, :, :n] = np.transpose(pts, (1, 0, 2))
        valid[t, :, :n] = np.asarray(msk).T
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    Fs = _pairwise_fundamentals(Ps)
    M = jnp.eye(4, dtype=jnp.float32)
    kw = dict(gate_px=e.epipolar_gate_px,
              max_candidates=e.max_candidates_per_cam,
              marker_dist1=rig.marker_dist_short,
              marker_dist2=rig.marker_dist_long,
              marker_tol=rig.marker_dist_tol,
              marker_side_min=rig.marker_side_min)
    dts = jnp.full((B,), 1 / 60, jnp.float32)

    def pf(state, b, v, dt):
        st, out = track_from_blobs(state, b, v, dt, Ps, K, dist, M, Fs,
                                   **kw)
        return st, pack_outputs(out)

    # (1) isolated bank: bitwise
    from low_cost_mocap_tpu.ops import kalman as _k
    from low_cost_mocap_tpu.ops.kalman_pallas import kalman_scan

    rng2 = np.random.default_rng(42)
    Bk, Mk, O = 256, 32, 2
    cp = jnp.asarray(rng2.normal(0, 0.4, (Bk, Mk, 3)).astype(np.float32))
    chd = jnp.asarray(rng2.normal(0, 1, (Bk, Mk)).astype(np.float32))
    cidx = jnp.asarray(rng2.integers(0, O, (Bk, Mk)).astype(np.int32))
    cval = jnp.asarray(rng2.random((Bk, Mk)) < 0.5)
    dts_k = np.full((Bk,), 1 / 60, np.float32)
    dts_k[100] = 0.8
    upd = jax.jit(_k.update)
    st_x = _k.init_state(O)
    want = []
    for t in range(Bk):
        st_x, tr = upd(st_x, cp[t], chd[t], cidx[t], cval[t],
                       jnp.asarray(dts_k[t]))
        want.append(np.asarray(tr.pos))
    _, tr_p = kalman_scan(_k.init_state(O), cp, chd, cidx, cval,
                          jnp.asarray(dts_k))
    bank_bitwise = bool((np.stack(want) == np.asarray(tr_p.pos)).all())
    ok &= bank_bitwise
    print(f"Pallas bank vs XLA chain ({Bk} frames, dropouts+reseed): "
          f"{'BITWISE IDENTICAL' if bank_bitwise else 'MISMATCH'}")

    # (2) full pipeline: tight numerical agreement
    pf_j = jax.jit(pf)
    st = make_init_state(rig)
    rows_pf = []
    for t in range(B):
        st, row = pf_j(st, jnp.asarray(blobs[t]), jnp.asarray(valid[t]),
                       dts[t])
        rows_pf.append(np.asarray(row))
    scan_j = jax.jit(functools.partial(scan_track_from_blobs, **kw))
    _, rows_b = scan_j(make_init_state(rig), jnp.asarray(blobs),
                       jnp.asarray(valid), dts, Ps, K, dist, M, Fs)
    a = np.stack(rows_pf)
    b2 = np.asarray(rows_b)
    finite = np.isfinite(a) & np.isfinite(b2)
    same_class = bool((np.isfinite(a) == np.isfinite(b2)).all())
    dmax = float(np.abs(a[finite] - b2[finite]).max())
    mode_ok = same_class and dmax < 1e-3
    ok &= mode_ok
    print(f"per-frame vs batched through the full pipeline ({B} frames):"
          f" max |diff| {dmax:.2e} (vmapped-vs-inline geometry fusion; "
          f"bitwise on CPU)  {'OK' if mode_ok else 'FAIL'}")

    print("on-chip differential:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
