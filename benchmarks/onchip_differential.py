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

    print("on-chip differential:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
