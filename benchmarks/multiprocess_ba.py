"""Distributed BA across REAL OS processes (the multi-host demonstration).

Runs the Schur-complement bundle adjustment on actual multi-process
clusters (jax.distributed + Gloo collectives over localhost TCP — the CPU
stand-in for DCN between TPU hosts) and checks every configuration lands
on the single-process solution.  Complements ``scaling.py --invariance``
(virtual in-process mesh) by crossing a real process boundary.

Usage: python benchmarks/multiprocess_ba.py [--n-points 4096] [--n-cams 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from low_cost_mocap_tpu.parallel.multiprocess import run_cluster  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-points", type=int, default=4096)
    ap.add_argument("--n-cams", type=int, default=8)
    ap.add_argument("--max-iters", type=int, default=8)
    args = ap.parse_args()
    scene = dict(n_points=args.n_points, n_cams=args.n_cams,
                 max_iters=args.max_iters)

    ref = run_cluster(1, local_devices=1, solver="schur", **scene)[0]
    t_ref = np.asarray(ref["ts"])
    print(f"# Schur BA, {args.n_points} landmarks x {args.n_cams} cameras, "
          f"{args.max_iters} LM iterations, real process boundaries")
    print("| processes x local devices | global devices | ms / LM iter | "
          "cost rel diff vs 1 proc | scale-aligned |t| diff |")
    print("|---|---|---|---|---|")
    print(f"| 1 x 1 (reference) | 1 | {ref['ms_per_iter']:.1f} | — | — |")
    for procs, local in ((2, 1), (2, 2), (4, 1)):
        res = run_cluster(procs, local_devices=local, solver="schur",
                          **scene)
        costs = {r["cost"] for r in res}
        assert len(costs) == 1, "processes disagree on the replicated cost"
        t_d = np.asarray(res[0]["ts"])
        s = float((t_d * t_ref).sum() / max((t_d * t_d).sum(), 1e-12))
        dt = float(np.abs(s * t_d - t_ref).max())
        rel = abs(res[0]["cost"] - ref["cost"]) / ref["cost"]
        assert dt < 1e-3 and rel < 1e-4
        print(f"| {procs} x {local} | {res[0]['global_devices']} | "
              f"{res[0]['ms_per_iter']:.1f} | {rel:.1e} | {dt:.1e} m |")
    print("# (wall times timeshare 2 host cores; the point of this table "
          "is exactness across real process boundaries)")


if __name__ == "__main__":
    main()
