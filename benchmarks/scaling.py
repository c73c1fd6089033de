"""Scaling measurements for the distributed solvers (BASELINE.json).

Three honest measurements (this box has ONE real TPU chip and 2 host
cores, so multi-device *wall-clock* cannot be measured here — virtual CPU
devices timeshare the same cores):

1. ``--tpu``: real-chip Schur-BA cost per LM iteration vs landmark count
   (demonstrates the O(N) local point-block work and MXU-friendly
   reductions; parallel/schur_ba.py).
2. ``--invariance``: on a virtual 8-device CPU mesh, the distributed
   solution is invariant to the ``point``-axis size (1, 2, 4, 8 devices
   produce the same poses/cost) — the correctness half of scaling.
3. ``--comms``: per-iteration collective volume, from the compiled HLO:
   ONE psum of the reduced camera system S ((P+1)·P bytes·4, P = camera
   DoF) regardless of landmark count — the reason point-axis scaling is
   flat in comms.

Usage: python benchmarks/scaling.py [--tpu] [--invariance] [--comms]
(defaults to all that fit the current backend).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scene(n_pts: int, n_cams: int, seed: int = 0):
    import jax.numpy as jnp
    from low_cost_mocap_tpu.utils import synthetic as syn

    Rs, ts, rig = syn.ring_rig(num_cameras=n_cams)
    rng = np.random.default_rng(seed)
    X = syn.random_points(rng, n_pts)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.3, rng=rng)
    # camera-0 gauge
    R0, t0 = Rs[0].copy(), ts[0].copy()
    Rs_g = np.einsum("cij,jk->cik", Rs, R0.T).astype(np.float32)
    ts_g = (ts - np.einsum("cij,j->ci", Rs_g, t0)).astype(np.float32)
    K = jnp.asarray(rig.K_stack())
    return jnp.asarray(pts), jnp.asarray(mask), K, \
        jnp.asarray(Rs_g), jnp.asarray(ts_g)


def bench_tpu_ba():
    import jax
    from low_cost_mocap_tpu.parallel import mesh as mesh_lib
    from low_cost_mocap_tpu.parallel.schur_ba import schur_bundle_adjust

    mesh = mesh_lib.make_mesh({"point": 1}, devices=jax.devices()[:1])
    print(f"# Schur BA per-iteration cost on {jax.devices()[0].platform}"
          f" ({jax.devices()[0].device_kind})")
    print("| landmarks | cameras | ms / LM iteration | final px RMSE |")
    print("|---|---|---|---|")
    for n_pts in (1024, 8192, 65536):
        pts, mask, K, Rs, ts = _scene(n_pts, 8)
        iters = 8

        def run():
            return schur_bundle_adjust(mesh, pts, mask, K, Rs, ts,
                                       max_iters=iters, ftol=0.0)
        res = run()  # compile + warm
        jax.block_until_ready(res.cost)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = run()
            jax.block_until_ready(res.cost)
            best = min(best, time.perf_counter() - t0)
        n_obs = float(np.asarray(mask).sum())
        rmse = float(np.sqrt(float(res.cost) / max(n_obs, 1.0)))
        print(f"| {n_pts} | 8 | {best / iters * 1e3:.2f} | {rmse:.3f} |")


def bench_invariance():
    import jax
    from low_cost_mocap_tpu.parallel import mesh as mesh_lib
    from low_cost_mocap_tpu.parallel.schur_ba import schur_bundle_adjust

    devices = jax.devices()
    pts, mask, K, Rs, ts = _scene(1024, 4)
    results = {}
    for d in (1, 2, 4, 8):
        if d > len(devices):
            continue
        mesh = mesh_lib.make_mesh({"point": d}, devices=devices[:d])
        res = schur_bundle_adjust(mesh, pts, mask, K, Rs, ts, max_iters=8,
                                  ftol=0.0)
        results[d] = (np.asarray(res.ts), float(res.cost))
    base_ts, base_cost = results[1]
    print("# point-axis invariance (same solution at any device count)")
    for d, (ts_d, cost_d) in results.items():
        # free-point BA with camera-0 fixed leaves the global-scale gauge
        # free; different shard-reduction orders settle on minutely
        # different scales, so compare after scale alignment
        s = float((ts_d * base_ts).sum() / max((ts_d * ts_d).sum(), 1e-12))
        dt = float(np.abs(s * ts_d - base_ts).max())
        print(f"devices={d}: scale-aligned |t - t(1 dev)|_max = {dt:.2e}, "
              f"cost rel diff = {abs(cost_d - base_cost) / base_cost:.2e}")
        assert dt < 1e-3 and abs(cost_d - base_cost) / base_cost < 1e-4


def bench_comms():
    import jax
    import re
    from low_cost_mocap_tpu.parallel import mesh as mesh_lib
    from low_cost_mocap_tpu.parallel.schur_ba import schur_bundle_adjust
    import functools

    devices = jax.devices()
    d = min(8, len(devices))
    mesh = mesh_lib.make_mesh({"point": d}, devices=devices[:d])
    print(f"# collective volume per LM iteration ({d}-device point axis)")
    for n_pts in (1024, 8192):
        pts, mask, K, Rs, ts = _scene(n_pts, 8)
        fn = functools.partial(schur_bundle_adjust, mesh, max_iters=8,
                               ftol=0.0)
        lowered = jax.jit(lambda *a: fn(*a)).lower(pts, mask, K, Rs, ts)
        hlo = lowered.compile().as_text()
        # all-reduce payload bytes: sum of f32 elements in all-reduce ops
        elems = [int(np.prod([int(x) for x in re.findall(r"\d+", shape)]))
                 for shape in re.findall(r"all-reduce[^=]*=\s*\(?f32\[([\d,]*)\]",
                                          hlo)]
        total = sum(elems) * 4
        print(f"landmarks={n_pts}: all-reduce payload/iteration = "
              f"{total} bytes (independent of landmark count)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--invariance", action="store_true")
    ap.add_argument("--comms", action="store_true")
    args = ap.parse_args()
    none = not (args.tpu or args.invariance or args.comms)

    import jax

    on_tpu = jax.default_backend() not in ("cpu",)
    if args.tpu or (none and on_tpu):
        bench_tpu_ba()
    if args.invariance or (none and not on_tpu):
        bench_invariance()
    if args.comms or (none and not on_tpu):
        bench_comms()
