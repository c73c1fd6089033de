"""Real multi-process execution of the distributed solvers.

The virtual 8-device mesh (``tests/conftest.py``) validates sharding
*semantics* inside one process; this module runs the same solvers across
separate OS processes joined through ``jax.distributed`` — each process
owns a slice of the global device mesh and collectives cross a real
process boundary (Gloo over localhost TCP here; the same program shape
rides ICI/DCN on a TPU pod, SURVEY.md §5 "distributed communication
backend").  The reference has no analogue: it is a single Python process
(``computer_code/api/index.py:39-59``).

Two halves:

- ``worker_main()`` — the per-process program (also ``python -m
  low_cost_mocap_tpu.parallel.multiprocess``): joins the cluster, builds
  the deterministic synthetic scene, runs a distributed bundle adjustment
  over the global ``point`` mesh, and writes a JSON result file.
- ``run_cluster()`` — host-side launcher used by tests and
  ``benchmarks/multiprocess_ba.py``: spawns N workers, waits, and returns
  their parsed results.

The launcher never imports jax, so it is safe to call from pytest without
disturbing the calling process's backend.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# --------------------------------------------------------------- worker

def _build_scene(n_points: int, n_cams: int, seed: int = 0):
    """Deterministic synthetic rig + camera-0-gauge initial poses.

    Every process builds the identical scene from the seed — the mocap
    analogue of each host loading the same shard-able dataset.
    """
    import jax.numpy as jnp
    import numpy as np

    from low_cost_mocap_tpu.utils import synthetic as syn

    Rs, ts, rig = syn.ring_rig(num_cameras=n_cams)
    rng = np.random.default_rng(seed)
    X = syn.random_points(rng, n_points)
    pts, mask = syn.observe(X, Rs, ts, rig, noise_px=0.3, rng=rng)
    R0, t0 = Rs[0].copy(), ts[0].copy()
    Rs_g = np.einsum("cij,jk->cik", Rs, R0.T).astype(np.float32)
    ts_g = (ts - np.einsum("cij,j->ci", Rs_g, t0)).astype(np.float32)
    return (jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(rig.K_stack()),
            jnp.asarray(Rs_g), jnp.asarray(ts_g))


def worker_main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host:port; omit for a single-process reference run")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-points", type=int, default=512)
    ap.add_argument("--n-cams", type=int, default=4)
    ap.add_argument("--max-iters", type=int, default=8)
    ap.add_argument("--solver",
                    choices=("schur", "reference", "live-pipeline",
                             "batched-sharded", "rts-assoc"),
                    default="schur")
    args = ap.parse_args(argv)

    # Backend setup must precede every other jax call: the environment's
    # sitecustomize pins JAX_PLATFORMS to the tunneled TPU, and the CPU
    # collectives implementation is latched at backend initialisation.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if args.coordinator is not None:
        jax.distributed.initialize(args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)

    import numpy as np

    from low_cost_mocap_tpu.parallel import mesh as mesh_lib

    if args.solver == "live-pipeline":
        _run_live_pipeline(args)
        return
    if args.solver == "batched-sharded":
        _run_batched_sharded(args)
        return
    if args.solver == "rts-assoc":
        _run_rts_assoc(args)
        return

    pts, mask, K, Rs0, ts0 = _build_scene(args.n_points, args.n_cams)
    mesh = mesh_lib.make_mesh({"point": jax.device_count()})

    if args.solver == "schur":
        from low_cost_mocap_tpu.parallel.schur_ba import schur_bundle_adjust

        def solve():
            return schur_bundle_adjust(mesh, pts, mask, K, Rs0, ts0,
                                       max_iters=args.max_iters, ftol=0.0)
    else:
        from low_cost_mocap_tpu.parallel.dist_ba import dist_bundle_adjust

        def solve():
            return dist_bundle_adjust(mesh, pts, mask, K, Rs0, ts0,
                                      max_iters=args.max_iters, ftol=0.0)

    res = solve()          # compile + solve
    jax.block_until_ready(res.cost)
    t0 = time.perf_counter()
    res = solve()          # timed warm run
    jax.block_until_ready(res.cost)
    wall = time.perf_counter() - t0

    out = {
        "process_id": args.process_id,
        "num_processes": args.num_processes,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "solver": args.solver,
        "cost": float(res.cost),
        "ts": np.asarray(res.ts).tolist(),
        "wall_s": wall,
        "ms_per_iter": wall / args.max_iters * 1e3,
    }
    tmp = args.out + f".tmp{args.process_id}"
    with open(tmp, "w") as f:
        json.dump(out, f)
    os.replace(tmp, args.out)


def _run_live_pipeline(args) -> None:
    """Camera-sharded LIVE step across the process mesh (the deployment
    shape where each host owns a camera group): every rank detects only
    its cameras' frames, centroids cross the process boundary in ONE
    all_gather, and all ranks report the identical replicated tracking
    result."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.models.pipeline import make_init_state
    from low_cost_mocap_tpu.ops import camera as cam_ops
    from low_cost_mocap_tpu.ops.correspond import _pairwise_fundamentals
    from low_cost_mocap_tpu.parallel import mesh as mesh_lib
    from low_cost_mocap_tpu.parallel.dist_pipeline import dist_frame_step
    from low_cost_mocap_tpu.utils import synthetic as syn

    Rs, ts, rig = syn.ring_rig(num_cameras=args.n_cams)
    cfg = EngineConfig()
    rng = np.random.default_rng(0)
    X = np.concatenate([
        syn.drone_markers(np.array([0.1, -0.1, 0.9], np.float32), 0.4, rig),
        syn.random_points(rng, 3),
    ])
    pts, mask = syn.observe(X, Rs, ts, rig)
    frames = syn.render_frames(pts, mask, rig.image_size, sigma=0.8)
    frames_u8 = (np.asarray(frames) * 255).astype(np.uint8)
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    Fs = _pairwise_fundamentals(Ps)
    mesh = mesh_lib.make_mesh({"cam": jax.device_count()})

    state = make_init_state(rig)
    t0 = time.perf_counter()
    for _ in range(3):   # a few frames: state threads through
        state, out = dist_frame_step(
            mesh, state, jnp.asarray(frames_u8), jnp.asarray(1.0 / 60.0),
            Ps, K, dist, jnp.eye(4, dtype=jnp.float32), Fs, rig, cfg)
    jax.block_until_ready(out.object_points)
    wall = time.perf_counter() - t0

    tracked = np.asarray(out.tracked.pos)
    tvalid = np.asarray(out.tracked.valid)
    result = {
        "process_id": args.process_id,
        "num_processes": args.num_processes,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "solver": args.solver,
        "tracked_pos": tracked.tolist(),
        "tracked_valid": tvalid.tolist(),
        "n_points": int(np.asarray(out.point_valid).sum()),
        "wall_s": wall,
    }
    tmp = args.out + f".tmp{args.process_id}"
    with open(tmp, "w") as f:
        json.dump(result, f)
    os.replace(tmp, args.out)


def _run_batched_sharded(args) -> None:
    """Batched x camera-sharded SERVING step (dist_scan_frame_step) across
    real process boundaries: B frames in ONE program, each rank ingesting
    only its camera shard, packed (B, L) output rows replicated — the
    high-throughput serving mode of a one-host-per-camera-group cluster."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.models.pipeline import (make_init_state,
                                                    unpack_outputs)
    from low_cost_mocap_tpu.ops import camera as cam_ops
    from low_cost_mocap_tpu.ops.correspond import _pairwise_fundamentals
    from low_cost_mocap_tpu.parallel import mesh as mesh_lib
    from low_cost_mocap_tpu.parallel.dist_pipeline import dist_scan_frame_step
    from low_cost_mocap_tpu.utils import synthetic as syn

    B = 8
    Rs, ts, rig = syn.ring_rig(num_cameras=args.n_cams)
    cfg = EngineConfig()
    frames_b = []
    for f in range(B):   # drone drifting deterministically over the batch
        X = syn.drone_markers(
            np.array([0.1 + 0.004 * f, -0.1, 0.9], np.float32), 0.4, rig)
        pts, mask = syn.observe(X, Rs, ts, rig)
        frames_b.append(syn.render_frames(pts, mask, rig.image_size,
                                          sigma=0.8))
    frames_u8 = (np.stack(frames_b) * 255).astype(np.uint8)
    K = jnp.asarray(rig.K_stack())
    dist = jnp.asarray(rig.dist_stack())
    Ps = cam_ops.projection_matrix(K, jnp.asarray(Rs), jnp.asarray(ts))
    Fs = _pairwise_fundamentals(Ps)
    mesh = mesh_lib.make_mesh({"cam": jax.device_count()})
    dts = jnp.full((B,), 1.0 / 60.0, jnp.float32)

    state = make_init_state(rig)
    t0 = time.perf_counter()
    state, rows = dist_scan_frame_step(
        mesh, state, jnp.asarray(frames_u8), dts, Ps, K, dist,
        jnp.eye(4, dtype=jnp.float32), Fs, rig, cfg)
    rows = np.asarray(rows)
    wall = time.perf_counter() - t0
    outs = [unpack_outputs(rows[i], rig.num_cameras, cfg.max_blobs,
                           rig.num_objects) for i in range(rows.shape[0])]
    last = outs[-1]

    result = {
        "process_id": args.process_id,
        "num_processes": args.num_processes,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "solver": args.solver,
        "rows_sha": __import__("hashlib").sha256(
            rows.tobytes()).hexdigest(),
        "tracked_pos": np.asarray(last.tracked.pos).tolist(),
        "tracked_valid": np.asarray(last.tracked.valid).tolist(),
        "frames_tracked": int(sum(
            bool(np.asarray(o.tracked.valid).any()) for o in outs)),
        "wall_s": wall,
    }
    tmp = args.out + f".tmp{args.process_id}"
    with open(tmp, "w") as f:
        json.dump(result, f)
    os.replace(tmp, args.out)


def _run_rts_assoc(args) -> None:
    """Temporally-parallel RTS smoother (O(log T) associative scan) with
    the sequence sharded over a real multi-process ``time`` mesh — the
    offline long-recording analogue of context parallelism."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from low_cost_mocap_tpu.ops import kalman

    T = 64
    dt = 1.0 / 60.0
    rng = np.random.default_rng(3)
    t = np.arange(T) * dt
    pos = np.stack([0.4 * np.sin(1.3 * t), 0.3 * np.cos(1.7 * t),
                    0.6 + 0.1 * t], -1).astype(np.float32)
    meas = pos + rng.normal(scale=0.004, size=pos.shape).astype(np.float32)

    # forward filter pass (host loop, deterministic) -> per-frame (x, P)
    st = kalman.init_state(1)
    xs, Ps_cov = [], []
    for z in meas:
        st, (_out, x_f, P_f) = kalman.update(
            st, jnp.asarray(z[None]), jnp.zeros((1,)),
            jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool), dt,
            advance_on_miss=True, return_cov=True)
        xs.append(np.asarray(x_f))       # (O=1, 9) per frame
        Ps_cov.append(np.asarray(P_f))
    xs = np.stack(xs)
    Ps_cov = np.stack(Ps_cov)
    dts = np.full(T, dt, np.float32)

    mesh = Mesh(np.array(jax.devices()), ("time",))
    sh = lambda spec: NamedSharding(mesh, spec)
    xs_d = jax.device_put(jnp.asarray(xs), sh(P("time")))
    Ps_d = jax.device_put(jnp.asarray(Ps_cov), sh(P("time")))
    dts_d = jax.device_put(jnp.asarray(dts), sh(P("time")))
    fn = jax.jit(lambda x, p, d: kalman.rts_smooth_assoc(x, p, d)[0])
    t0 = time.perf_counter()
    sm_g = fn(xs_d, Ps_d, dts_d)
    jax.block_until_ready(sm_g)
    wall = time.perf_counter() - t0
    # the smoothed track is sharded over the global time mesh; gather the
    # full array on every process for the invariance check
    from jax.experimental import multihost_utils

    sm = np.asarray(multihost_utils.process_allgather(sm_g, tiled=True))

    result = {
        "process_id": args.process_id,
        "num_processes": args.num_processes,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "solver": args.solver,
        "smoothed": sm.tolist(),
        "rmse_vs_truth_mm": float(np.sqrt(
            ((sm[:, 0, :3] - pos) ** 2).mean()) * 1e3),
        "wall_s": wall,
    }
    tmp = args.out + f".tmp{args.process_id}"
    with open(tmp, "w") as f:
        json.dump(result, f)
    os.replace(tmp, args.out)


# -------------------------------------------------------------- launcher

def run_cluster(num_processes: int, local_devices: int = 1, *,
                n_points: int = 512, n_cams: int = 4, max_iters: int = 8,
                solver: str = "schur", timeout_s: float = 600.0
                ) -> list[dict]:
    """Spawn a real multi-process cluster; return each process's result.

    ``num_processes == 1`` runs a plain single-process worker (the
    reference solution for invariance checks).
    """
    with tempfile.TemporaryDirectory(prefix="lcm_mp_") as tmpdir:
        coord = (f"localhost:{_free_port()}" if num_processes > 1 else None)
        procs = []
        outs = []
        env = dict(os.environ)
        kept = [f for f in env.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in f]
        env["XLA_FLAGS"] = " ".join(
            kept + [f"--xla_force_host_platform_device_count={local_devices}"])
        # keep worker BLAS/XLA threading modest: workers timeshare the host
        env.setdefault("OPENBLAS_NUM_THREADS", "1")
        err_files = []
        for pid in range(num_processes):
            out = os.path.join(tmpdir, f"result_{pid}.json")
            outs.append(out)
            cmd = [sys.executable, "-m",
                   "low_cost_mocap_tpu.parallel.multiprocess",
                   "--out", out, "--n-points", str(n_points),
                   "--n-cams", str(n_cams), "--max-iters", str(max_iters),
                   "--solver", solver]
            if coord is not None:
                cmd += ["--coordinator", coord,
                        "--num-processes", str(num_processes),
                        "--process-id", str(pid)]
            # stderr goes to a file, not a pipe: a crashed worker spewing a
            # long traceback into a full pipe buffer would block while its
            # peers sit in a collective waiting for it and the launcher
            # waits on an earlier worker — a three-way deadlock
            ef = open(os.path.join(tmpdir, f"stderr_{pid}.log"), "wb")
            err_files.append(ef)
            procs.append(subprocess.Popen(
                cmd, env=env, cwd=os.path.dirname(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__)))),
                stdout=subprocess.DEVNULL, stderr=ef))
        deadline = time.monotonic() + timeout_s
        try:
            for p in procs:
                try:
                    p.wait(timeout=max(1.0, deadline - time.monotonic()))
                except subprocess.TimeoutExpired:
                    for q in procs:
                        q.kill()
                    raise RuntimeError(
                        f"multiprocess worker timed out after {timeout_s}s")
        finally:
            for ef in err_files:
                ef.close()
        for pid, p in enumerate(procs):
            if p.returncode != 0:
                with open(os.path.join(tmpdir, f"stderr_{pid}.log"),
                          errors="replace") as f:
                    err = f.read()
                raise RuntimeError(
                    f"worker {pid} exited {p.returncode}:\n{err[-2000:]}")
        results = []
        for out in outs:
            with open(out) as f:
                results.append(json.load(f))
        return results


if __name__ == "__main__":
    worker_main()
