"""The per-frame mocap pipeline: ONE compiled XLA step per frame.

This is the TPU-native replacement for the reference's hot loop
(``computer_code/api/index.py:39-59`` driving
``computer_code/api/helpers.py:68-135``), which runs blob detection,
correspondence, triangulation, world transform, rigid-body location and
Kalman filtering as sequential Python/OpenCV calls per frame.

Here the entire chain

    frames -> preprocess -> blobs -> undistort -> epipolar match ->
    DLT triangulate -> world transform -> rigid-body fit -> Kalman bank

is a single pure function of (tracker state, frames, dt), jit-compiled once
(static shapes everywhere: fixed camera count, fixed blob/track budgets) and
re-dispatched at camera rate with zero recompilation.  The reference's mode
flags (``is_capturing_points`` / ``is_triangulating_points`` /
``is_locating_objects``, ``computer_code/api/helpers.py:28-33``) stay
host-side: the runtime always dispatches the same compiled program and the
flags only select which *outputs* to emit, so toggling modes never
recompiles (full-chain device cost is ~0.43 ms/frame, per-stage table in
benchmarks/SCALING.md — cheaper than a second executable's compile +
swap).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from low_cost_mocap_tpu.config import EngineConfig, RigConfig
from low_cost_mocap_tpu.ops import camera as cam_ops
from low_cost_mocap_tpu.ops import correspond, detect, kalman, rigid, world


class FrameOutputs(NamedTuple):
    """Everything the reference emits per frame, fixed-shape."""

    blob_px: jnp.ndarray        # (C, K, 2) detected centroids (undistorted)
    blob_valid: jnp.ndarray     # (C, K)
    object_points: jnp.ndarray  # (C*K, 3) world-frame triangulated points
    point_errors: jnp.ndarray   # (C*K,) reprojection errors
    point_valid: jnp.ndarray    # (C*K,)
    objects: rigid.LocatedObjects       # raw rigid-body fits
    tracked: kalman.TrackedObjects      # Kalman/low-pass output
    point_obs: Any = None       # (C*K, C, 2) winner's per-camera pixels
    point_obs_mask: Any = None  # (C*K, C) — correspondence-resolved
    #                             measurements (with_obs=True; the engine
    #                             enables them for live recalibration BA)
    bodies: Any = None          # rigid_general.LocatedBodies (I, ...) when
    #                             a body template is configured
    tracked_bodies: Any = None  # body_tracker.TrackedBodies (I, ...) —
    #                             gated + smoothed 6-DoF body tracks


def pack_outputs(out: FrameOutputs) -> jnp.ndarray:
    """Flatten FrameOutputs into ONE float32 vector on device.

    A serving loop that reads results back per frame pays the host<->device
    round-trip once per *array*; the ~20 small leaves of FrameOutputs cost
    20 latencies.  Packing on device makes the readback a single ~2 KB
    transfer.  Decode with ``unpack_outputs``.
    """
    parts = [
        out.blob_px.reshape(-1),
        out.blob_valid.astype(jnp.float32).reshape(-1),
        out.object_points.reshape(-1),
        out.point_errors.reshape(-1),
        out.point_valid.astype(jnp.float32).reshape(-1),
        out.objects.pos.reshape(-1),
        out.objects.heading.reshape(-1),
        out.objects.error.reshape(-1),
        out.objects.index.astype(jnp.float32).reshape(-1),
        out.objects.valid.astype(jnp.float32).reshape(-1),
        out.tracked.pos.reshape(-1),
        out.tracked.vel.reshape(-1),
        out.tracked.heading.reshape(-1),
        out.tracked.valid.astype(jnp.float32).reshape(-1),
    ]
    if out.point_obs is not None:
        parts += [
            out.point_obs.reshape(-1),
            out.point_obs_mask.astype(jnp.float32).reshape(-1),
        ]
    if out.bodies is not None:
        parts += [
            out.bodies.R.reshape(-1),
            out.bodies.t.reshape(-1),
            out.bodies.rms.reshape(-1),
            out.bodies.valid.astype(jnp.float32).reshape(-1),
            out.tracked_bodies.pos.reshape(-1),
            out.tracked_bodies.vel.reshape(-1),
            out.tracked_bodies.quat.reshape(-1),
            out.tracked_bodies.valid.astype(jnp.float32).reshape(-1),
        ]
    return jnp.concatenate(parts)


def unpack_outputs(arr: np.ndarray, num_cameras: int, max_blobs: int,
                   num_objects: int, num_bodies: int = 0,
                   with_obs: bool = False) -> FrameOutputs:
    """Inverse of ``pack_outputs`` on a host numpy array.

    ``num_bodies``: the ``max_bodies`` the step was compiled with when a
    body template is configured, else 0; ``with_obs`` mirrors the step's
    ``with_obs`` flag."""
    C, K, O, I = num_cameras, max_blobs, num_objects, num_bodies
    N = C * K
    sizes = [C * K * 2, C * K, N * 3, N, N, N * 3, N, N, N, N,
             O * 3, O * 3, O, O] \
        + ([N * C * 2, N * C] if with_obs else []) \
        + ([I * 9, I * 3, I, I, I * 3, I * 3, I * 4, I] if I else [])
    splits = np.split(np.asarray(arr), np.cumsum(sizes)[:-1])
    (blob_px, blob_valid, obj_pts, errs, pvalid, lpos, lhead,
     lerr, lidx, lvalid, tpos, tvel, thead, tvalid) = splits[:14]
    import low_cost_mocap_tpu.ops.rigid as rigid_mod
    import low_cost_mocap_tpu.ops.kalman as kalman_mod

    n = 14
    pobs = pobs_m = None
    if with_obs:
        pobs, pobs_m = splits[n:n + 2]
        n += 2
    bodies = None
    tracked_bodies = None
    if I:
        from low_cost_mocap_tpu.ops.body_tracker import TrackedBodies
        from low_cost_mocap_tpu.ops.rigid_general import LocatedBodies

        bR, bt, brms, bvalid, tbpos, tbvel, tbquat, tbvalid = splits[n:]
        bodies = LocatedBodies(R=bR.reshape(I, 3, 3), t=bt.reshape(I, 3),
                               rms=brms, valid=bvalid > 0.5)
        tracked_bodies = TrackedBodies(
            pos=tbpos.reshape(I, 3), vel=tbvel.reshape(I, 3),
            quat=tbquat.reshape(I, 4), valid=tbvalid > 0.5)

    return FrameOutputs(
        blob_px=blob_px.reshape(C, K, 2),
        blob_valid=blob_valid.reshape(C, K) > 0.5,
        object_points=obj_pts.reshape(N, 3),
        point_errors=errs,
        point_valid=pvalid > 0.5,
        point_obs=pobs.reshape(N, C, 2) if with_obs else None,
        point_obs_mask=(pobs_m.reshape(N, C) > 0.5) if with_obs else None,
        objects=rigid_mod.LocatedObjects(
            pos=lpos.reshape(N, 3), heading=lhead, error=lerr,
            index=lidx.astype(np.int32), valid=lvalid > 0.5),
        tracked=kalman_mod.TrackedObjects(
            pos=tpos.reshape(O, 3), vel=tvel.reshape(O, 3), heading=thead,
            valid=tvalid > 0.5),
        bodies=bodies,
        tracked_bodies=tracked_bodies,
    )


def unpack_outputs_batch(rows: np.ndarray, num_cameras: int, max_blobs: int,
                         num_objects: int, num_bodies: int = 0,
                         with_obs: bool = False) -> list:
    """Vectorized ``unpack_outputs`` over a (B, L) batch of packed rows.

    ONE split/reshape/compare pass along the feature axis for the whole
    batch; the returned per-frame ``FrameOutputs`` are zero-copy views
    into the batch arrays.  This is the batched-serving decode: per-row
    ``unpack_outputs`` costs ~39 us/frame of Python on the 2-core serving
    host (measured), the batch form ~3 us/frame.
    """
    C, K, O, I = num_cameras, max_blobs, num_objects, num_bodies
    N = C * K
    sizes = [C * K * 2, C * K, N * 3, N, N, N * 3, N, N, N, N,
             O * 3, O * 3, O, O] \
        + ([N * C * 2, N * C] if with_obs else []) \
        + ([I * 9, I * 3, I, I, I * 3, I * 3, I * 4, I] if I else [])
    rows = np.asarray(rows)
    B = rows.shape[0]
    splits = np.split(rows, np.cumsum(sizes)[:-1], axis=1)
    import low_cost_mocap_tpu.ops.kalman as kalman_mod
    import low_cost_mocap_tpu.ops.rigid as rigid_mod

    (blob_px, blob_valid, obj_pts, errs, pvalid, lpos, lhead,
     lerr, lidx, lvalid, tpos, tvel, thead, tvalid) = splits[:14]
    blob_px = blob_px.reshape(B, C, K, 2)
    blob_valid = blob_valid.reshape(B, C, K) > 0.5
    obj_pts = obj_pts.reshape(B, N, 3)
    pvalid_b = pvalid > 0.5
    lpos = lpos.reshape(B, N, 3)
    lidx = lidx.astype(np.int32)
    lvalid_b = lvalid > 0.5
    tpos = tpos.reshape(B, O, 3)
    tvel = tvel.reshape(B, O, 3)
    tvalid_b = tvalid > 0.5
    n = 14
    if with_obs:
        pobs = splits[n].reshape(B, N, C, 2)
        pobs_m = splits[n + 1].reshape(B, N, C) > 0.5
        n += 2
    if I:
        from low_cost_mocap_tpu.ops.body_tracker import TrackedBodies
        from low_cost_mocap_tpu.ops.rigid_general import LocatedBodies

        bR, bt, brms, bvalid, tbpos, tbvel, tbquat, tbvalid = splits[n:]
        bR = bR.reshape(B, I, 3, 3)
        bt = bt.reshape(B, I, 3)
        bvalid_b = bvalid > 0.5
        tbpos = tbpos.reshape(B, I, 3)
        tbvel = tbvel.reshape(B, I, 3)
        tbquat = tbquat.reshape(B, I, 4)
        tbvalid_b = tbvalid > 0.5

    return [FrameOutputs(
        blob_px=blob_px[i], blob_valid=blob_valid[i],
        object_points=obj_pts[i], point_errors=errs[i],
        point_valid=pvalid_b[i],
        point_obs=pobs[i] if with_obs else None,
        point_obs_mask=pobs_m[i] if with_obs else None,
        objects=rigid_mod.LocatedObjects(
            pos=lpos[i], heading=lhead[i], error=lerr[i],
            index=lidx[i], valid=lvalid_b[i]),
        tracked=kalman_mod.TrackedObjects(
            pos=tpos[i], vel=tvel[i], heading=thead[i],
            valid=tvalid_b[i]),
        bodies=LocatedBodies(R=bR[i], t=bt[i], rms=brms[i],
                             valid=bvalid_b[i]) if I else None,
        tracked_bodies=TrackedBodies(
            pos=tbpos[i], vel=tbvel[i], quat=tbquat[i],
            valid=tbvalid_b[i]) if I else None,
    ) for i in range(B)]


class MocapPipeline:
    """Holds rig geometry + compiled per-frame steps.

    The full chain always runs (the engine's mode flags pick which outputs
    to emit, ``runtime/engine.py``).
    """

    def __init__(self, rig: RigConfig, engine: EngineConfig,
                 Rs: np.ndarray, ts: np.ndarray,
                 to_world_matrix: np.ndarray | None = None,
                 preprocess_frames: bool = True):
        self.rig = rig
        self.engine = engine
        self.K = jnp.asarray(rig.K_stack())
        self.dist = jnp.asarray(rig.dist_stack())
        self.Rs = jnp.asarray(Rs)
        self.ts = jnp.asarray(ts)
        self.Ps = cam_ops.projection_matrix(self.K, self.Rs, self.ts)
        if to_world_matrix is None:
            to_world_matrix = np.eye(4, dtype=np.float32)
        self.to_world_matrix = jnp.asarray(to_world_matrix, jnp.float32)
        self.Fs = correspond._pairwise_fundamentals(self.Ps)
        self.preprocess_frames = preprocess_frames

        e = engine
        self._step = jax.jit(
            functools.partial(
                frame_step,
                threshold=e.detect_threshold,
                max_blobs=e.max_blobs,
                cc_iters=e.cc_iters,
                gate_px=e.epipolar_gate_px,
                max_candidates=e.max_candidates_per_cam,
                marker_dist1=rig.marker_dist_short,
                marker_dist2=rig.marker_dist_long,
                marker_tol=rig.marker_dist_tol,
                marker_side_min=rig.marker_side_min,
                do_preprocess=preprocess_frames,
                body_sets=rig.body_sets_resolved(),
            ),
            static_argnames=(),
            donate_argnums=(0,),
        )

    def init_state(self):
        return make_init_state(self.rig)

    def step(self, state, frames, dt):
        """One frame: (state, (C, H, W) float frames, dt) -> (state, outputs)."""
        return self._step(state, jnp.asarray(frames), jnp.asarray(dt),
                          self.Ps, self.K, self.dist, self.to_world_matrix,
                          self.Fs)


def make_init_state(rig: RigConfig):
    """Initial tracker state for ``frame_step`` under this rig config:
    a KalmanState, plus one BodyTrackState per configured body set
    (``rig.body_sets_resolved()`` — multiple distinct templates tracked
    simultaneously)."""
    ks = kalman.init_state(rig.num_objects)
    sets = rig.body_sets_resolved()
    if sets:
        from low_cost_mocap_tpu.ops import body_tracker

        return (ks, tuple(body_tracker.init_state(mi) for _, mi in sets))
    return ks


def frame_step(state, frames, dt, Ps, K, dist, to_world_matrix, Fs=None, *,
               threshold: float, max_blobs: int, cc_iters: int,
               gate_px: float, max_candidates: int,
               marker_dist1: float, marker_dist2: float, marker_tol: float,
               marker_side_min: float,
               do_preprocess: bool, packed_input: bool = False,
               sparse_input: bool = False,
               image_shape: tuple[int, int, int] | None = None,
               use_pallas: bool = False,
               body_template=None, max_bodies: int = 2,
               body_sets=None, with_obs: bool = False,
               kalman_report: str = "pre"):
    """Pure per-frame step (see module docstring). Fully static shapes.

    ``packed_input=True`` takes (C, H, W//8) uint8 bit-packed binary frames
    (host/camera-side threshold, 1 bit/pixel — the production ingest path;
    see ``ops.detect.unpack_bits``); ``sparse_input=True`` takes (budget,)
    int32 lit-pixel indices (``ops.detect.sparse_ingest`` — minimal
    host->device bytes; ``image_shape`` = (C, H, W) must be given);
    otherwise (C, H, W) uint8/float frames thresholded on device.

    ``state`` is a ``kalman.KalmanState``, or the 2-tuple
    ``(KalmanState, body_tracker.BodyTrackState)`` when ``body_template``
    is configured (build with ``make_init_state``).

    ``Fs``: precomputed (C, C, 3, 3) pairwise fundamental matrices
    (``correspond._pairwise_fundamentals(Ps)``).  They only change when
    the calibration does, and recomputing them inside the step costs
    ~0.2 ms/dispatch on TPU — half the step itself — so serving loops
    must pass them in (None recomputes; fine for offline/scanned use
    where XLA hoists the loop-invariant work).
    """
    if sparse_input:
        frames = detect.scatter_pixels(frames, image_shape)
        eff_threshold = 0.5
    elif packed_input:
        frames = detect.unpack_bits(frames)
        eff_threshold = 0.5
    else:
        # cameras deliver uint8; normalise on device (uint8 host->device
        # transfer is far cheaper than float32 through the ingest link)
        if jnp.issubdtype(frames.dtype, jnp.integer):
            frames = frames.astype(jnp.float32) * (1.0 / 255.0)
        if do_preprocess:
            frames = detect.preprocess(frames)
        eff_threshold = threshold

    if use_pallas:
        # fused single-kernel detector (TPU only; bit-identical to the XLA
        # path, ~2x faster — see ops/detect_pallas.py)
        from low_cost_mocap_tpu.ops.detect_pallas import find_blobs_pallas

        blobs, blob_valid, _ = find_blobs_pallas(
            frames, eff_threshold, max_blobs, cc_iters=cc_iters)
    else:
        blobs, blob_valid, _ = detect.find_blobs_multi(
            frames, eff_threshold, max_blobs, cc_iters=cc_iters)

    return track_from_blobs(
        state, blobs, blob_valid, dt, Ps, K, dist, to_world_matrix, Fs,
        gate_px=gate_px, max_candidates=max_candidates,
        marker_dist1=marker_dist1, marker_dist2=marker_dist2,
        marker_tol=marker_tol, marker_side_min=marker_side_min,
        body_template=body_template, max_bodies=max_bodies,
        body_sets=body_sets, with_obs=with_obs,
        kalman_report=kalman_report)


def scan_track_from_blobs(state, blobs_b, blob_valid_b, dts, Ps, K, dist,
                          to_world_matrix, Fs, **kw):
    """Batched-dispatch serving: B consecutive frames in ONE XLA program.

    A per-frame dispatch through a remote/tunneled device link costs a
    ~250 us RPC floor while the device tail of one frame is ~48 us — the
    chip idles >80% in per-frame mode (measured, benchmarks/SCALING.md).
    ONE dispatch (and one packed (B, L) readback) amortises the RPC over
    B frames.  The price is B frames of output latency — keep per-frame
    mode for closed-loop control and use this for high-rate
    serving/ingest (``EngineConfig.dispatch_batch``).

    Structure (the TPU-shaped part): only the tracker update carries
    state frame-to-frame — the heavy geometry (undistort -> epipolar
    match -> DLT -> world -> rigid fit) is frame-INDEPENDENT, so it runs
    vmapped over all B frames as large batched ops (MXU-friendly, one
    fused launch group) and only the tiny Kalman bank update (O x 9x9)
    rides a ``lax.scan``.  A naive scan of whole per-frame steps
    serializes the geometry into B sequential copies of many small HLOs
    (~135 us/frame device-bound, measured round 3); the vmap+scan split
    is ~4x faster at B=64.  With ``body_sets`` the rigid-body stage is
    seeded by tracker state (``ops/rigid_general.fit_body`` temporal
    seeding), so the whole step falls back to the sequential scan.

    blobs_b: (B, C, K, 2); blob_valid_b: (B, C, K); dts: (B,).
    Returns (state_after_B_frames, packed (B, L)) with rows decodable by
    ``unpack_outputs`` — bit-identical to B per-frame steps (same update
    chain, same packing; tested).

    Replaces the reference's only serving mode, the per-frame Python loop
    at ``computer_code/api/index.py:39-59``.
    """
    if kw.get("body_sets") or kw.get("body_template") is not None:
        # sequential whole-step fallback: a pallas kernel launch per scan
        # iteration buys nothing here — keep the XLA bank
        kw = dict(kw, kalman_impl="xla")

        def step(st, inp):
            b, v, dt = inp
            st2, out = track_from_blobs(st, b, v, dt, Ps, K, dist,
                                        to_world_matrix, Fs, **kw)
            return st2, pack_outputs(out)

        return jax.lax.scan(step, state, (blobs_b, blob_valid_b, dts))

    kw.pop("body_sets", None)
    kw.pop("body_template", None)
    kw.pop("max_bodies", None)
    report = kw.pop("kalman_report", "pre")
    kalman_impl = kw.pop("kalman_impl", "auto")

    locate = functools.partial(_locate_frame, **kw)
    blobs_u_b, match_b, pts_b, located_b = jax.vmap(
        locate, in_axes=(0, 0, None, None, None, None, None))(
        blobs_b, blob_valid_b, Ps, K, dist, to_world_matrix, Fs)

    if _use_pallas_kalman(kalman_impl):
        # ONE fused kernel for all B bank updates (sequential grid,
        # state in VMEM across steps): the lax.scan body below is ~90
        # tiny XLA ops = ~17 us/frame of the batched program; the kernel
        # runs the identical per-step formulas at ~0.7 us/frame and is
        # BITWISE identical to the XLA chain on TPU (verified + asserted
        # by benchmarks/onchip_differential.py), so this swap adds zero
        # divergence between serving modes (ops/kalman_pallas.py —
        # incl. why per-frame mode deliberately keeps the XLA bank).
        from low_cost_mocap_tpu.ops import kalman_pallas

        new_state, tracked_b = kalman_pallas.kalman_scan(
            state, located_b.pos, located_b.heading, located_b.index,
            located_b.valid, dts.astype(jnp.float32), report=report)
    else:
        def step(st, inp):
            loc, dt = inp
            st2, tracked = kalman.update(st, loc.pos, loc.heading,
                                         loc.index, loc.valid, dt,
                                         report=report)
            return st2, tracked

        # NOTE: no scan unroll here — unrolling lets XLA fuse across
        # iterations and perturbs the Butterworth IIR by 1 ulp, breaking
        # the tested bit-identical guarantee vs per-frame mode (worth
        # more than the ~8% it buys; measured round 3)
        new_state, tracked_b = jax.lax.scan(step, state, (located_b, dts))

    out_b = FrameOutputs(
        blob_px=blobs_u_b,
        blob_valid=blob_valid_b,
        object_points=pts_b,
        point_errors=match_b["errors"],
        point_valid=match_b["valid"],
        point_obs=match_b.get("obs"),
        point_obs_mask=match_b.get("obs_mask"),
        objects=located_b,
        tracked=tracked_b,
    )
    return new_state, jax.vmap(pack_outputs)(out_b)


def batched_track_from_blobs(states, blobs, blob_valid, dts, Ps, K, dist,
                             to_world_matrices, Fs, **kw):
    """Multi-rig serving: R independent capture volumes in ONE dispatch.

    vmap of ``track_from_blobs`` over a leading rig axis on every
    argument (states (R, ...) pytree, blobs (R, C, K, 2), per-rig
    calibrations).  The per-frame device tail is ~50 us while a dispatch
    through a remote link costs ~250 us — batching R rigs into one
    program amortises the dispatch so per-chip aggregate throughput
    scales nearly linearly until the device saturates (measured:
    benchmarks/multirig.py).  All rigs must share the static config
    (camera count, blob budget, gates, body sets).
    """
    # a vmapped pallas_call needs an explicit batching path — the XLA
    # bank is correct (and cheap relative to R-way batched geometry) here
    kw.setdefault("kalman_impl", "xla")
    fn = functools.partial(track_from_blobs, **kw)
    return jax.vmap(fn)(states, blobs, blob_valid, dts, Ps, K, dist,
                        to_world_matrices, Fs)


def _locate_frame(blobs, blob_valid, Ps, K, dist, to_world_matrix, Fs, *,
                  gate_px, max_candidates, marker_dist1, marker_dist2,
                  marker_tol, marker_side_min, with_obs=False):
    """Frame-independent geometry: undistort -> epipolar match -> DLT ->
    world transform -> rigid-body triple fit.  No tracker state touched,
    so batched serving vmaps this over whole frame batches
    (``scan_track_from_blobs``) while the per-frame path calls it inline.

    Returns (blobs_u (C, K, 2), match dict, obj_pts_world (C*K, 3),
    located ``rigid.LocatedObjects``).
    """
    # undistort centroids analytically (replaces the reference's full-frame
    # cv.undistort, computer_code/api/helpers.py:74 — see ops/camera.py)
    blobs_u = cam_ops.undistort_points(blobs, K[:, None], dist[:, None])
    blobs_u = jnp.where(blob_valid[..., None], blobs_u, 0.0)

    match = correspond.match_points(blobs_u, blob_valid, Ps,
                                    gate_px=gate_px,
                                    max_candidates=max_candidates,
                                    Fs=Fs, with_obs=with_obs)
    obj_pts_world = world.to_world(match["object_points"], to_world_matrix)
    obj_pts_world = jnp.where(match["valid"][:, None], obj_pts_world, 0.0)

    # heading/side axes (0, 2): the horizontal plane of the engine's world
    # convention (component 1 = up after helpers.py:102's swap — see
    # ops/rigid.py docstring)
    located = rigid.locate_objects(obj_pts_world, match["errors"],
                                   match["valid"], dist1=marker_dist1,
                                   dist2=marker_dist2, tol=marker_tol,
                                   side_min=marker_side_min,
                                   ax_h1=0, ax_h2=2)
    return blobs_u, match, obj_pts_world, located


def _use_pallas_kalman(impl: str) -> bool:
    """Resolve a ``kalman_impl`` flag ("auto"/"pallas"/"xla")."""
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    if impl != "auto":
        raise ValueError(f"kalman_impl must be auto/pallas/xla: {impl!r}")
    return jax.default_backend() == "tpu"


def track_from_blobs(state, blobs, blob_valid, dt, Ps, K, dist,
                     to_world_matrix, Fs=None, *, gate_px: float,
                     max_candidates: int, marker_dist1: float,
                     marker_dist2: float, marker_tol: float,
                     marker_side_min: float, body_template=None,
                     max_bodies: int = 2, body_sets=None,
                     with_obs: bool = False, kalman_report: str = "pre",
                     kalman_impl: str = "auto"):
    """Post-detection tail of the per-frame step: undistort -> match ->
    world -> rigid fit -> trackers.  Split out so the camera-sharded
    distributed step (``parallel/dist_pipeline.py``) can run detection
    per shard and this tail replicated on the all-gathered blobs.

    ``body_sets``: tuple of (BodyTemplate, max_instances) — multiple
    DISTINCT rigid-body templates tracked simultaneously (each template
    consumes its matched points before the next is fit; per-set tracker
    states; outputs concatenated over all slots in set order).
    ``body_template``/``max_bodies`` is single-set shorthand."""
    if body_sets is None and body_template is not None:
        body_sets = ((body_template, max_bodies),)
    if body_sets:
        state, body_states = state

    blobs_u, match, obj_pts_world, located = _locate_frame(
        blobs, blob_valid, Ps, K, dist, to_world_matrix, Fs,
        gate_px=gate_px, max_candidates=max_candidates,
        marker_dist1=marker_dist1, marker_dist2=marker_dist2,
        marker_tol=marker_tol, marker_side_min=marker_side_min,
        with_obs=with_obs)
    if kalman_impl == "pallas" and body_sets is None:
        # Explicit opt-in only: in the PER-FRAME program a pallas call is
        # a custom call, and custom calls serialize the tunnel's async
        # dispatch pipelining (measured: per-frame 1,113 -> 559 fps).
        # "auto" therefore resolves to the XLA bank here; the batched
        # scan (scan_track_from_blobs) is where the kernel pays off, and
        # its outputs are BITWISE identical to this XLA chain on TPU
        # (verified over 512 random frames incl. dropouts + reseeds;
        # asserted by benchmarks/onchip_differential.py), so the
        # bit-identical-across-serving-modes guarantee is preserved.
        from low_cost_mocap_tpu.ops import kalman_pallas

        dt1 = jnp.asarray(dt, jnp.float32).reshape(1)
        new_state, tracked1 = kalman_pallas.kalman_scan(
            state, located.pos[None], located.heading[None],
            located.index[None], located.valid[None], dt1,
            report=kalman_report)
        tracked = jax.tree.map(lambda x: x[0], tracked1)
    else:
        new_state, tracked = kalman.update(
            state, located.pos, located.heading, located.index,
            located.valid, dt, report=kalman_report)

    if body_sets:
        from low_cost_mocap_tpu.ops import body_tracker
        from low_cost_mocap_tpu.ops.rigid_general import locate_bodies

        legacy_state = isinstance(body_states, body_tracker.BodyTrackState)
        if legacy_state:
            body_states = (body_states,)  # legacy single-set state
        live = match["valid"]
        b_parts, t_parts, new_bstates = [], [], []
        for si, (tmpl, max_inst) in enumerate(body_sets):
            # joint temporal fit: each track's constant-velocity predicted
            # pose enters the fit as an extra hypothesis (survives frames
            # where the anchor markers are occluded) with a gentle
            # proximity tie-break (rejects ghost-consistent wrong
            # interpretations) — see ops/rigid_general.fit_body
            bs = body_states[si]
            b, live = locate_bodies(
                obj_pts_world, live, tmpl, max_instances=max_inst,
                return_live=True,
                seed_R=body_tracker.quat_to_rot(bs.quat),
                seed_t=bs.pos + bs.vel * dt, seed_ok=bs.active)
            nbs, tb = body_tracker.update(
                body_states[si], b.t, b.R, b.rms, b.valid, dt)
            b_parts.append(b)
            t_parts.append(tb)
            new_bstates.append(nbs)
        bodies = jax.tree.map(lambda *xs: jnp.concatenate(xs), *b_parts)
        tracked_bodies = jax.tree.map(
            lambda *xs: jnp.concatenate(xs), *t_parts)
        # round-trip the caller's state structure: a legacy bare
        # BodyTrackState must come back bare, or scan carries and
        # jitted serving loops retrace on the second frame
        new_state = (new_state,
                     new_bstates[0] if legacy_state else tuple(new_bstates))
    else:
        bodies = None
        tracked_bodies = None

    return new_state, FrameOutputs(
        blob_px=blobs_u,
        blob_valid=blob_valid,
        object_points=obj_pts_world,
        point_errors=match["errors"],
        point_valid=match["valid"],
        point_obs=match.get("obs"),
        point_obs_mask=match.get("obs_mask"),
        objects=located,
        tracked=tracked,
        bodies=bodies,
        tracked_bodies=tracked_bodies,
    )
