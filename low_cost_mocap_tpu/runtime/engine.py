"""The streaming mocap engine: capture loop + event surface.

This is the L3/L4 replacement for the reference's ``Cameras`` singleton and
Flask-SocketIO handlers (``computer_code/api/helpers.py:16-200``,
``computer_code/api/index.py``).  Differences by design:

- all math lives in the jitted per-frame step (``models/pipeline.py``) —
  the engine is orchestration only;
- mode flags (capture / triangulate / locate) mirror the reference
  (``helpers.py:28-33``) but select which *outputs* to emit — the compiled
  step never changes shape, so toggling modes never recompiles;
- camera poses and the world matrix are server-side state with versioned
  persistence (``utils/artifacts.py``) instead of living only in the
  browser (reference quirk: ``src/App.tsx:44-45``, SURVEY.md §1);
- the event surface (names + payloads) matches the reference's Socket.IO
  contract exactly (SURVEY.md §2.3) so the reference frontend can connect.
"""

from __future__ import annotations

import functools
import threading
import time
from typing import Any, Callable

import numpy as np

from low_cost_mocap_tpu.config import EngineConfig, RigConfig
from low_cost_mocap_tpu.models.pipeline import (frame_step,
                                                unpack_outputs)
from low_cost_mocap_tpu.ops.detect import sparse_ingest
from low_cost_mocap_tpu.ops.rotations import quat_to_matrix_np
from low_cost_mocap_tpu.runtime.serial_link import SerialLink
from low_cost_mocap_tpu.runtime.sources import FrameSource


class Engine:
    def __init__(self, rig: RigConfig, cfg: EngineConfig, source: FrameSource,
                 link: SerialLink, preprocess_frames: bool = False,
                 fast_path: bool | None = None,
                 host_detect: bool | None = None,
                 artifacts_dir: str | None = None,
                 mesh=None):
        """``fast_path`` (default: auto — on unless running on CPU) enables
        the production ingest/compute path: host-side threshold + 1-bit
        packed transfer and the fused Pallas detector (bit-identical
        results; see ops/detect.py, ops/detect_pallas.py).  Unavailable
        with ``preprocess_frames`` (blur/sharpen needs full frames).

        ``host_detect`` (default: auto — on when the fast path is on and
        the native library builds) runs blob detection on the host during
        ingest (``control/native/detect.cc``, bit-identical CC centroids):
        the device step then starts at ``track_from_blobs`` with a
        ~100-byte centroid upload, removing the scatter + detector kernel
        (~160 us/frame device time) from the hot loop entirely.

        ``mesh``: a ``jax.sharding.Mesh`` with a ``cam`` axis — the live
        step shards ingest + detection over cameras
        (``parallel/dist_pipeline.py``; the axis size must divide the
        camera count) and the tail runs replicated.  Mutually exclusive with
        ``host_detect`` (the point of camera sharding is per-device
        ingest + on-device detection)."""
        import jax
        import jax.numpy as jnp

        self.rig = rig
        self.cfg = cfg
        self.source = source
        self.link = link
        if hasattr(link, "on_health"):
            # command-link health (PyserialLink): surface state changes as a
            # ``link-health`` event and mirror a stall as a local disarm —
            # the firmware's 2 s ping failsafe (receiver_esp32.ino:213-215)
            # has cut the motors by then, and dropping the armed mirror
            # stops queueing pose feeds a wedged dongle will never send.
            # Chain rather than overwrite a caller-installed callback.
            prev_cb = link.on_health

            def _chained(health, _prev=prev_cb):
                self._on_link_health(health)
                if _prev is not None:
                    _prev(health)

            link.on_health = _chained
        explicit_no_fast = fast_path is False   # caller asked for dense
        if fast_path is None:
            fast_path = jax.default_backend() != "cpu"
        self._fast = bool(fast_path) and not preprocess_frames
        # packed ingest works on any backend; the fused Pallas kernel is
        # TPU-only (interpret mode is test-only, too slow for the live loop)
        self._pallas = self._fast and jax.default_backend() != "cpu"
        self._mesh = mesh
        if mesh is not None:
            if rig.num_cameras % mesh.shape["cam"] != 0:
                raise ValueError(
                    f"{rig.num_cameras} cameras not divisible by cam axis "
                    f"size {mesh.shape['cam']}")
            if preprocess_frames:
                raise ValueError(
                    "mesh mode has no preprocess path (blur/sharpen); "
                    "use preprocess_frames=False")
            if host_detect:
                raise ValueError(
                    "mesh mode shards on-device detection per camera "
                    "shard; host_detect does not apply")
            if explicit_no_fast:
                raise ValueError(
                    "mesh mode requires the packed fast path (per-shard "
                    "1-bit ingest); fast_path=False is not available")
            self._fast = True  # packed 1-bit shard ingest
            host_detect = False
        if host_detect is None:
            host_detect = self._fast
        self._host_detect = bool(host_detect) and self._fast
        if self._host_detect:
            try:  # native lib availability decides, not the platform
                from low_cost_mocap_tpu.control.bindings import get_lib
                get_lib()
            except Exception:
                self._host_detect = False
        self._batch = max(int(cfg.dispatch_batch), 1)
        if self._batch > 1 and not (self._host_detect or mesh is not None):
            raise ValueError(
                "dispatch_batch > 1 requires the host-detect ingest path "
                "(native detector + fast path) or mesh mode: the batched "
                "program runs pre-detected (or per-shard-detected) blobs "
                "through scan_track_from_blobs")
        # (packed (C,K,3), dt) — or (mesh payload, dt) in mesh mode —
        # awaiting dispatch
        self._batch_buf: list = []
        # dispatched batches whose async readback is still in flight
        # (readback_pipeline_depth > 0; see _run_batched)
        import collections as _collections
        self._batch_pending: _collections.deque = _collections.deque()

        self.is_capturing_points = False
        self.is_triangulating_points = False
        self.is_locating_objects = False

        self.camera_poses: tuple[np.ndarray, np.ndarray] | None = None
        self.to_world_matrix = np.eye(4, dtype=np.float32)
        self.drone_armed = [False] * rig.num_objects
        self.captured_points: list[list[list[float | None]]] = []
        self.artifacts_dir = artifacts_dir
        if artifacts_dir:
            # persisted per-camera intrinsics (calibrate-intrinsics event)
            # replace the rig defaults BEFORE any K-derived state is built
            rig = self._load_intrinsics_artifact(rig)
            self.rig = rig

        self._K = jnp.asarray(rig.K_stack())
        self._dist = jnp.asarray(rig.dist_stack())
        self._Ps = jnp.tile(jnp.eye(3, 4), (rig.num_cameras, 1, 1))
        from low_cost_mocap_tpu.ops.correspond import _pairwise_fundamentals
        self._F = _pairwise_fundamentals(self._Ps)
        self._F_np = None        # host cache for the epiline overlay
        self._F_np_src = None
        self._M = jnp.asarray(self.to_world_matrix)
        from low_cost_mocap_tpu.models.pipeline import make_init_state
        self._kalman_state = make_init_state(rig)
        if artifacts_dir:
            self._load_calibration_artifact()  # resume persisted calibration

        self._preprocess_frames = preprocess_frames
        self._build_steps()

        import collections

        from low_cost_mocap_tpu.utils.profiling import StageTimer

        self._pending = collections.deque()  # in-flight async readbacks
        self.timer = StageTimer()
        self._listeners: dict[str, list[Callable[[Any], None]]] = {}
        self._traj: dict | None = None   # run-trajectory state machine
        self._thread: threading.Thread | None = None
        self._running = False
        self._last_frames: np.ndarray | None = None
        self._last_out = None
        self._frame_lock = threading.Lock()
        # guards the compiled step + its packed-layout state
        # (_step/_step_sparse/_kalman_state/_num_bodies/_pending) against
        # server-thread rebuilds (learn-body-template apply) racing a
        # capture-loop process_frame mid-flight
        self._model_lock = threading.Lock()
        # signals the batch emit worker (batch_emit_thread) — built on the
        # model lock so enqueue/dequeue and the layout snapshots it
        # protects stay atomic
        self._batch_cond = threading.Condition(self._model_lock)
        self._emit_worker: threading.Thread | None = None
        self._emit_worker_busy = False
        if cfg.batch_emit_thread and self._batch > 1:
            self._emit_worker = threading.Thread(
                target=self._emit_worker_loop, daemon=True,
                name="lcm-batch-emit")
            self._emit_worker.start()
        self.fps = 0.0
        self.frame_count = 0
        self._learning_frames: list | None = None  # learn-body-template
        self._refine_obs: list | None = None        # refine-camera-pose
        self._intrinsics_capture: dict | None = None  # calibrate-intrinsics
        self._recording: list | None = None         # record-frames
        self._recording_cap = 0
        # per-camera failure detection + elastic recovery (runtime/health.py)
        from low_cost_mocap_tpu.runtime.health import CameraHealthMonitor
        self.health = (CameraHealthMonitor(
            rig.num_cameras, freeze_frames=cfg.health_freeze_frames,
            dark_frames=cfg.health_dark_frames,
            interval=cfg.health_interval)
            if cfg.health_enabled else None)

    def _build_steps(self) -> None:
        """(Re)compile the per-frame steps for the current self.rig —
        called at init and when learn-body-template applies a template."""
        import jax

        rig, cfg = self.rig, self.cfg

        def _step_packed(*args, **kw):
            from low_cost_mocap_tpu.models.pipeline import pack_outputs

            state, out = frame_step(*args, **kw)
            return state, pack_outputs(out)

        _tail = dict(
            gate_px=cfg.epipolar_gate_px,
            max_candidates=cfg.max_candidates_per_cam,
            marker_dist1=rig.marker_dist_short,
            marker_dist2=rig.marker_dist_long,
            marker_tol=rig.marker_dist_tol,
            marker_side_min=rig.marker_side_min,
            body_sets=rig.body_sets_resolved(),
            kalman_report=cfg.kalman_report,
            with_obs=True,   # live recalibration needs the matcher's
                             # correspondence-resolved observations
        )
        _common = dict(
            threshold=cfg.detect_threshold,
            max_blobs=cfg.max_blobs,
            cc_iters=cfg.cc_iters,
            do_preprocess=self._preprocess_frames,
            use_pallas=self._pallas,
            **_tail,
        )
        self._num_bodies = rig.total_body_slots()
        # body output slot -> template (set) index, for client payloads
        self._body_set_of_slot = np.concatenate(
            [np.full(mi, si, np.int32)
             for si, (_, mi) in enumerate(rig.body_sets_resolved())]
        ) if self._num_bodies else np.zeros((0,), np.int32)
        self._step = jax.jit(functools.partial(
            _step_packed, packed_input=self._fast, **_common),
            donate_argnums=(0,))
        # Sparse-ingest variant (lit-pixel indices, minimal host->device
        # bytes); used on the fast path whenever the frame fits the budget,
        # with self._step as the bit-exact dense fallback.
        self._step_sparse = jax.jit(functools.partial(
            _step_packed, sparse_input=True,
            image_shape=(rig.num_cameras, *rig.image_hw()),
            **_common), donate_argnums=(0,)) if self._fast else None
        # Camera-sharded mesh variant: ingest + detection per device shard,
        # centroids all_gathered, tail replicated (parallel/dist_pipeline).
        if self._mesh is not None:
            from low_cost_mocap_tpu.parallel.dist_pipeline import \
                _compiled_dist_step

            self._step_dist = _compiled_dist_step(
                self._mesh, "cam", rig, cfg, packed=self._fast,
                use_pallas=self._pallas, with_obs=True, pack=True)
        else:
            self._step_dist = None
        # Host-detect variant: blobs found during ingest (native CCL,
        # control/native/detect.cc) — the device step is the tail only.
        if self._host_detect:
            from low_cost_mocap_tpu.models.pipeline import (pack_outputs,
                                                            track_from_blobs)

            # the host detector hands over ONE (C, K, 3) [x, y, valid]
            # array (control/native/detect.cc lcm_ingest_detect_packed);
            # the split happens on device
            def _tail_packed(state, packed, *args, **kw):
                state, out = track_from_blobs(state, packed[..., :2],
                                              packed[..., 2] > 0.5,
                                              *args, **kw)
                return state, pack_outputs(out)

            self._step_blobs = jax.jit(functools.partial(
                _tail_packed, **_tail), donate_argnums=(0,))
            # Batched-dispatch variant: B frames per program (frame-
            # parallel geometry + scanned Kalman bank,
            # models/pipeline.scan_track_from_blobs) — the
            # high-throughput serving mode (EngineConfig.dispatch_batch)
            if self._batch > 1:
                from low_cost_mocap_tpu.models.pipeline import \
                    scan_track_from_blobs

                def _tail_scan(state, packed_b, dts, *args, **kw):
                    return scan_track_from_blobs(
                        state, packed_b[..., :2], packed_b[..., 2] > 0.5,
                        dts, *args, **kw)

                self._step_scan = jax.jit(functools.partial(
                    _tail_scan, **_tail), donate_argnums=(0,))
            else:
                self._step_scan = None
        else:
            self._step_blobs = None
            self._step_scan = None

    # ------------------------------------------------------------ events

    def on(self, event: str, cb: Callable[[Any], None]) -> None:
        self._listeners.setdefault(event, []).append(cb)

    def off(self, event: str, cb: Callable[[Any], None]) -> None:
        """Remove a listener added with ``on`` (unknown cb is a no-op).
        Lets the server detach its broadcast fan-out while no clients are
        connected, which in turn gates payload construction off entirely
        (see ``_emit_frame_outputs``)."""
        cbs = self._listeners.get(event)
        if cbs is not None:
            try:
                cbs.remove(cb)
            except ValueError:
                pass

    def emit(self, event: str, data: Any) -> None:
        # iterate a snapshot: a server thread may attach/detach listeners
        # (client connect/disconnect) while the capture loop is emitting
        for cb in tuple(self._listeners.get(event, ())):
            cb(data)

    # ---------------------------------------------------- client handlers
    # One method per reference Socket.IO event (SURVEY.md §2.3).

    def handle(self, event: str, data: Any) -> None:
        name = "handle_" + event.replace("-", "_")
        fn = getattr(self, name, None)
        if fn is None:
            raise KeyError(f"unknown event {event!r}")
        fn(data if data is not None else {})

    def handle_update_camera_settings(self, data):
        # computer_code/api/index.py:212-216
        self.source.set_settings(data["exposure"], data["gain"])

    def handle_capture_points(self, data):
        # computer_code/api/index.py:218-227
        if data["startOrStop"] == "start":
            self.captured_points = []
            self.is_capturing_points = True
        else:
            self.flush_batches()   # emit in-flight pipelined batches
            self.is_capturing_points = False

    def handle_calculate_camera_pose(self, data):
        # computer_code/api/index.py:229-277
        import jax
        import jax.numpy as jnp
        from low_cost_mocap_tpu.models import calibrator

        raw = data["cameraPoints"]  # (frames, cameras, 2) with None entries
        pts = np.zeros((len(raw), self.rig.num_cameras, 2), np.float32)
        mask = np.zeros((len(raw), self.rig.num_cameras), bool)
        for f, per_cam in enumerate(raw):
            for c, p in enumerate(per_cam):
                if p is not None and p[0] is not None:
                    pts[f, c] = p
                    mask[f, c] = True
        def progress(Rs_i, ts_i, iters_done):
            # stream intermediate poses like the reference does on every BA
            # residual evaluation (computer_code/api/helpers.py:274)
            self.emit("camera-pose", {
                "error": None,
                "camera_poses": camera_poses_to_serializable(Rs_i, ts_i),
                "ba_iters": int(iters_done),
            })

        res = calibrator.calibrate(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask),
            self._K, ransac_iters=self.cfg.ransac_iters,
            threshold_px=self.cfg.ransac_threshold_px,
            ba_iters=self.cfg.ba_max_iters, progress_cb=progress)
        Rs = np.asarray(res.Rs)
        ts = np.asarray(res.ts)
        self.set_camera_poses(Rs, ts)
        self.emit("camera-pose", {
            "error": float(res.mean_error),
            "camera_poses": camera_poses_to_serializable(Rs, ts),
        })

    def handle_locate_objects(self, data):
        # computer_code/api/index.py:279-288
        self.is_locating_objects = data["startOrStop"] == "start"

    def handle_determine_scale(self, data):
        # computer_code/api/index.py:290-309
        import jax.numpy as jnp
        from low_cost_mocap_tpu.ops import world

        object_points = [p for p in data["objectPoints"] if len(p) == 2]
        pairs = jnp.asarray(np.asarray(object_points, np.float32))
        Rs, ts = serializable_to_camera_poses(data["cameraPoses"])
        _, ts2 = world.determine_scale(pairs, jnp.asarray(ts),
                                       wand_length=self.rig.wand_length)
        self.set_camera_poses(Rs, np.asarray(ts2))
        self.emit("camera-pose", {
            "error": None,
            "camera_poses": camera_poses_to_serializable(Rs, np.asarray(ts2)),
        })

    def handle_triangulate_points(self, data):
        # computer_code/api/index.py:312-323
        if data["startOrStop"] == "start":
            Rs, ts = serializable_to_camera_poses(data["cameraPoses"])
            self.set_camera_poses(Rs, ts)
            if data.get("toWorldCoordsMatrix") is not None:
                self.set_to_world_matrix(
                    np.asarray(data["toWorldCoordsMatrix"], np.float32))
            from low_cost_mocap_tpu.models.pipeline import make_init_state
            with self._model_lock:
                self._kalman_state = make_init_state(self.rig)
                self._pending.clear()  # drop pre-reset in-flight readbacks
                self._batch_buf = []   # pre-reset buffered frames
                self._batch_pending.clear()
            self.is_capturing_points = True
            self.is_triangulating_points = True
        else:
            # emit in-flight pipelined batches BEFORE dropping the mode
            # flags so the output stream ends complete, not truncated
            self.flush_batches()
            self.is_capturing_points = False
            self.is_triangulating_points = False

    def handle_acquire_floor(self, data):
        # computer_code/api/index.py:158-194 (corrected fit, ops/world.py)
        import jax.numpy as jnp
        from low_cost_mocap_tpu.ops import world

        pts = np.asarray(
            [p for sub in data["objectPoints"] for p in sub], np.float32)
        M = world.fit_floor(jnp.asarray(pts), jnp.asarray(self.to_world_matrix))
        self.set_to_world_matrix(np.asarray(M))
        self.emit("to-world-coords-matrix",
                  {"to_world_coords_matrix": np.asarray(M).tolist()})

    def handle_set_origin(self, data):
        # computer_code/api/index.py:197-210
        import jax.numpy as jnp
        from low_cost_mocap_tpu.ops import world

        M = world.set_origin(
            jnp.asarray(np.asarray(data["objectPoint"], np.float32)),
            jnp.asarray(np.asarray(data["toWorldCoordsMatrix"], np.float32)))
        self.set_to_world_matrix(np.asarray(M))
        self.emit("to-world-coords-matrix",
                  {"to_world_coords_matrix": np.asarray(M).tolist()})

    def handle_refine_camera_pose(self, data):
        """Live recalibration: refine extrinsics from the correspondence-
        resolved observations collected DURING tracking, without stopping
        it (no reference analogue — there, recalibration means stopping
        and redoing the wand capture).

        start: begin accumulating the matcher's winner observations
        (``FrameOutputs.point_obs``) while triangulation runs.
        stop: bundle-adjust from the CURRENT extrinsics over the collected
        points, apply, and emit ``camera-pose`` with the refined error.
        """
        if data["startOrStop"] == "start":
            self._refine_obs = []
            return
        obs_frames, self._refine_obs = self._refine_obs, None
        if self.camera_poses is None:
            self.emit("camera-pose", {"error": None,
                                      "refine_error": "not calibrated"})
            return
        pts = (np.concatenate([o for o, _ in obs_frames])
               if obs_frames else np.zeros((0, 1, 2), np.float32))
        msk = (np.concatenate([m for _, m in obs_frames])
               if obs_frames else np.zeros((0, 1), bool))
        keep = msk.sum(axis=1) >= 2
        pts, msk = pts[keep], msk[keep]
        if len(pts) < 24:
            self.emit("camera-pose", {
                "error": None,
                "refine_error": f"only {len(pts)} usable points"})
            return
        import jax.numpy as jnp

        from low_cost_mocap_tpu.ops import ba as ba_ops
        from low_cost_mocap_tpu.ops import triangulate as tri_ops

        Rs0, ts0 = self.camera_poses
        # BA's parameterisation anchors camera 0 at identity; gauge the
        # current poses into the camera-0 frame, refine, and un-gauge so
        # camera 0's absolute pose (and the world matrix derived under it)
        # is the fixed anchor of the refinement
        R0, t0 = np.asarray(Rs0[0]), np.asarray(ts0[0]).reshape(3)
        Rs_g = np.einsum("cij,kj->cik", np.asarray(Rs0), R0)  # R_i R0^T
        ts_g = (np.asarray(ts0).reshape(-1, 3)
                - np.einsum("cij,j->ci", Rs_g, t0))
        # Extrinsics-only refinement: focals stay pinned to the rig
        # intrinsics (applying refined extrinsics against the ORIGINAL K
        # would otherwise be inconsistent), and the free-point BA's scale
        # gauge is re-anchored afterwards so the wand-derived metric scale
        # can't drift across repeated refines.
        res = ba_ops.bundle_adjust(
            jnp.asarray(pts), jnp.asarray(msk), self._K,
            jnp.asarray(Rs_g.astype(np.float32)),
            jnp.asarray(ts_g.astype(np.float32)),
            num_cameras=self.rig.num_cameras,
            max_iters=self.cfg.ba_max_iters, ftol=self.cfg.ba_ftol,
            freeze_focals=True)
        Rg, tg = np.asarray(res.Rs), np.asarray(res.ts)
        norm0 = float(np.linalg.norm(ts_g[1:], axis=-1).sum())
        norm1 = float(np.linalg.norm(tg[1:], axis=-1).sum())
        if norm1 > 1e-9 and norm0 > 1e-9:
            tg = tg * (norm0 / norm1)
        Rs = np.einsum("cij,jk->cik", Rg, R0)
        ts = tg + np.einsum("cij,j->ci", Rg, t0)
        from low_cost_mocap_tpu.ops.camera import projection_matrix

        Ps = projection_matrix(self._K, jnp.asarray(Rs), jnp.asarray(ts))
        X, _ = tri_ops.triangulate_points(jnp.asarray(pts), Ps,
                                          jnp.asarray(msk))
        errs = tri_ops.reprojection_errors(jnp.asarray(pts), X, Ps,
                                           jnp.asarray(msk))
        mean_err = float(np.sqrt(np.mean(np.asarray(errs))))
        self.set_camera_poses(Rs, ts)
        self.emit("camera-pose", {
            "error": mean_err,
            "camera_poses": camera_poses_to_serializable(Rs, ts),
            "refined_from_points": int(len(pts)),
        })

    def handle_learn_body_template(self, data):
        """Learn a rigid-body template from live triangulated points
        (``ops/rigid_general.learn_template`` — the mocap "create rigid
        body from capture" workflow; no reference analogue).

        start: begin accumulating frames (requires triangulation running).
        stop: learn, emit ``body-template``; with ``apply``: rebuild the
        compiled step with the learned template and track it live.
        """
        if data["startOrStop"] == "start":
            self._learning_frames = []
            return
        frames, self._learning_frames = self._learning_frames, None
        if not frames:
            self.emit("body-template", {"error": "no frames captured"})
            return
        from low_cost_mocap_tpu.ops.rigid_general import learn_template

        try:
            tmpl = learn_template(np.stack([f[0] for f in frames]),
                                  np.stack([f[1] for f in frames]))
        except ValueError as e:
            self.emit("body-template", {"error": str(e)})
            return
        payload = {"markers": [list(m) for m in tmpl.markers],
                   "frames_used": len(frames), "error": None}
        if data.get("apply"):
            import dataclasses

            from low_cost_mocap_tpu.models.pipeline import make_init_state

            rig = dataclasses.replace(
                self.rig, body_markers=tmpl.markers,
                max_bodies=int(data.get("maxBodies", self.rig.max_bodies)))
            # swap under the model lock so the capture loop never sees a
            # torn (old step, new-layout state) combination mid-frame
            with self._model_lock:
                self.rig = rig
                self._build_steps()      # recompile with the template
                self._kalman_state = make_init_state(self.rig)
                self._pending.clear()    # old-layout packed outputs
                self._batch_buf = []     # old-layout buffered frames
                self._batch_pending.clear()
            payload["applied"] = True
        self.emit("body-template", payload)

    def handle_calibrate_intrinsics(self, data):
        """In-framework intrinsic calibration from a handheld dot-grid
        target (``ops/intrinsics.py``, Zhang's method).  Closes the
        reference's day-one gap: it LOADS intrinsics it cannot produce
        (``computer_code/api/helpers.py:19-22`` reads a JSON made by an
        external tool).

        start: ``{"startOrStop": "start", "cameraIndex": c, "rows": r,
        "cols": k, "spacing": m}`` — while the loop runs, every frame
        where camera ``c`` sees exactly r*k blobs that order into a
        consistent grid (``order_grid``) and the board has moved since the
        last keeper is captured as a view (progress via
        ``intrinsics-views`` events).  Per-view grid orientation may
        differ (the unmarked grid has a 4-fold labelling symmetry) —
        harmless: the symmetry composes into the per-view extrinsics, K
        and distortion are unaffected.

        stop: calibrate over the captured views, emit
        ``camera-intrinsics`` ``{K, dist, rms_px, views}``, apply to the
        rig (skippable with ``"apply": false``) and persist
        (``utils/artifacts.save_intrinsics``).  No recompilation: K/dist
        are runtime arguments of the compiled step, not static shapes.
        """
        if data["startOrStop"] == "start":
            rows = int(data.get("rows", 4))
            cols = int(data.get("cols", 5))
            from low_cost_mocap_tpu.ops.intrinsics import make_grid

            self._intrinsics_capture = {
                "camera": int(data.get("cameraIndex", 0)),
                "rows": rows, "cols": cols,
                "spacing": float(data.get("spacing", 0.03)),
                "board": make_grid(rows, cols,
                                   float(data.get("spacing", 0.03))),
                "min_sep_px": float(data.get("minSeparationPx", 8.0)),
                "max_views": int(data.get("maxViews", 40)),
                "views": [],
            }
            return
        cap, self._intrinsics_capture = self._intrinsics_capture, None
        if cap is None or len(cap["views"]) < 3:
            n = 0 if cap is None else len(cap["views"])
            self.emit("camera-intrinsics", {
                "error": f"only {n} usable views captured (need >= 3); "
                         "move the board through varied tilts"})
            return
        from low_cost_mocap_tpu.ops.intrinsics import calibrate_intrinsics

        res = calibrate_intrinsics(cap["board"], np.stack(cap["views"]))
        K = np.asarray(res.K, np.float64)
        dist = np.asarray(res.dist, np.float64)
        if not (np.isfinite(K).all() and np.isfinite(dist).all()):
            self.emit("camera-intrinsics",
                      {"error": "calibration diverged; recapture"})
            return
        payload = {
            "cameraIndex": cap["camera"],
            "K": K.tolist(),
            "dist": dist.tolist(),
            "rms_px": float(res.rms_px),
            "views": len(cap["views"]),
            "error": None,
        }
        if data.get("apply", True):
            self._apply_intrinsics(cap["camera"], K, dist)
            payload["applied"] = True
        self.emit("camera-intrinsics", payload)

    def _intrinsics_step(self, frames: np.ndarray) -> None:
        """Per-frame intrinsics-capture hook: host-native blob detection on
        the target camera only (its budget, rows*cols, is independent of
        the compiled step's ``max_blobs``), grid ordering, movement gate."""
        cap = self._intrinsics_capture
        if cap is None or len(cap["views"]) >= cap["max_views"]:
            return
        c, rows, cols = cap["camera"], cap["rows"], cap["cols"]
        n = rows * cols
        try:
            from low_cost_mocap_tpu.control.bindings import ingest_detect
            from low_cost_mocap_tpu.ops.detect import threshold_cutoff

            f = np.ascontiguousarray(frames[c:c + 1])
            blobs, valid, _ = ingest_detect(
                f, threshold_cutoff(self.cfg.detect_threshold), n + 8,
                weighted=self.cfg.weighted_centroids)
        except Exception as e:
            self._intrinsics_capture = None
            self.emit("camera-intrinsics",
                      {"error": f"native detector unavailable: {e}"})
            return
        pts = np.asarray(blobs)[0][np.asarray(valid)[0].astype(bool)]
        if len(pts) != n:
            return
        from low_cost_mocap_tpu.ops.intrinsics import order_grid

        order, _ = order_grid(pts, rows, cols)
        if order is None:
            return
        ordered = pts[order].astype(np.float32)
        if cap["views"]:
            sep = float(np.linalg.norm(
                ordered - cap["views"][-1], axis=-1).mean())
            if sep < cap["min_sep_px"]:
                return                      # board hasn't moved enough
        cap["views"].append(ordered)
        self.emit("intrinsics-views",
                  {"camera": c, "views": len(cap["views"])})

    def _apply_intrinsics(self, camera_index: int, K: np.ndarray,
                          dist: np.ndarray) -> None:
        """Install calibrated intrinsics for one camera: swap the runtime
        K/dist arrays (no recompile — they're traced args), re-derive
        projection matrices + pairwise fundamentals, persist."""
        import dataclasses

        import jax.numpy as jnp

        from low_cost_mocap_tpu.config import CameraIntrinsics

        cams = list(self.rig.cameras)
        cams[camera_index] = CameraIntrinsics(
            intrinsic_matrix=tuple(tuple(float(x) for x in row)
                                   for row in K),
            distortion_coef=tuple(float(x) for x in dist),
            rotation=cams[camera_index].rotation)
        rig = dataclasses.replace(self.rig, cameras=tuple(cams))
        with self._model_lock:
            self.rig = rig
            self._K = jnp.asarray(rig.K_stack())
            self._dist = jnp.asarray(rig.dist_stack())
            if self.camera_poses is not None:
                from low_cost_mocap_tpu.ops import camera as cam_ops
                from low_cost_mocap_tpu.ops.correspond import \
                    _pairwise_fundamentals

                Rs, ts = self.camera_poses
                self._Ps = cam_ops.projection_matrix(
                    self._K, jnp.asarray(Rs), jnp.asarray(ts))
                self._F = _pairwise_fundamentals(self._Ps)
        self._save_intrinsics_artifact()

    def _save_intrinsics_artifact(self) -> None:
        if not self.artifacts_dir:
            return
        import os

        from low_cost_mocap_tpu.utils.artifacts import save_intrinsics

        os.makedirs(self.artifacts_dir, exist_ok=True)
        save_intrinsics(os.path.join(self.artifacts_dir, "intrinsics.json"),
                        self.rig.cameras)

    def _load_intrinsics_artifact(self, rig: RigConfig) -> RigConfig:
        import dataclasses
        import os

        path = os.path.join(self.artifacts_dir, "intrinsics.json")
        if not os.path.exists(path):
            return rig
        from low_cost_mocap_tpu.utils.artifacts import load_intrinsics

        cams = load_intrinsics(path)
        if len(cams) != rig.num_cameras:
            return rig                      # stale artifact, rig changed
        return dataclasses.replace(rig, cameras=cams)

    def handle_record_frames(self, data):
        """Record the raw camera stream to a replayable .npz artifact
        (``utils/recordings.py``; the reference has no recording facility
        — SURVEY.md §5).  start: begin collecting frame-sets (capped at
        ``maxFrames``, default 600); stop: save and emit ``recording``
        with the path.  Recordings replay through ``RecordedSource`` and
        the offline pipeline.
        """
        import os
        import tempfile

        if data["startOrStop"] == "start":
            self._recording_cap = int(data.get("maxFrames", 600))
            self._recording = []
            return
        # swap under the frame lock: the capture thread appends under it,
        # so no append can land while np.stack iterates the list below
        with self._frame_lock:
            frames, self._recording = self._recording, None
        if not frames:
            self.emit("recording", {"error": "no frames recorded"})
            return
        from low_cost_mocap_tpu.utils.recordings import save_recording

        path = data.get("path") or os.path.join(
            self.artifacts_dir or tempfile.gettempdir(),
            f"recording-{int(time.time())}.npz")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        save_recording(path, np.stack(frames), fps=max(self.fps, 1.0),
                       meta={"num_cameras": self.rig.num_cameras})
        self.emit("recording",
                  {"path": path, "frames": len(frames), "error": None})

    def handle_capture_profile(self, data):
        """Capture a ``jax.profiler`` device trace while the loop runs
        (SURVEY.md §5: the reference's only 'profiling' is an fps counter;
        here a TensorBoard-loadable XPlane trace of the live pipeline is
        one event away).

        data: {"durationMs": 500, "path": optional}.  Emits ``profile``
        with the trace directory when done (captured in a worker thread so
        the capture loop keeps running — the trace records IT, not us).
        """
        import os
        import tempfile

        duration_s = float(data.get("durationMs", 500)) / 1e3
        path = data.get("path") or os.path.join(
            self.artifacts_dir or tempfile.gettempdir(), "profiles",
            f"trace-{int(time.time())}")
        os.makedirs(path, exist_ok=True)

        def capture():
            import jax

            try:
                jax.profiler.start_trace(path)
                time.sleep(duration_s)
                jax.profiler.stop_trace()
            except Exception as e:
                self.emit("profile", {"error": str(e)})
                return
            self.emit("profile",
                      {"path": path, "durationMs": duration_s * 1e3,
                       "error": None})

        threading.Thread(target=capture, daemon=True).start()

    def _on_link_health(self, health: dict) -> None:
        if health.get("state") == "stalled" and any(self.drone_armed):
            self.drone_armed = [False] * len(self.drone_armed)
            health = dict(health, disarmed=True)
        self.emit("link-health", health)

    def handle_run_trajectory(self, data):
        """Execute a planned trajectory with the reference's fly-to-start
        gate (``src/App.tsx:299-324,696-732``): first command every drone
        to the plan's FIRST setpoint and hold until each tracked position
        arrives within ``arrivalTol`` metres, then drip the setpoints at
        ``timestep`` cadence.  Without the gate a plan starting away from
        the drone commands a step input.  The reference runs this loop in
        the browser; here it is server-side (advanced once per processed
        frame, so it is deterministic in SIL tests and survives UI
        disconnects).  Emits ``trajectory-status`` phase events:
        fly-to-start -> executing -> done (or aborted/stopped)."""
        if data.get("startOrStop") == "stop":
            if self._traj is not None:
                self._traj = None
                self.emit("trajectory-status", {"phase": "stopped"})
            return
        sps = [[float(x) for x in sp] for sp in data["setpoints"]]
        n = self.rig.num_objects
        if not sps or any(len(sp) != 3 * n for sp in sps):
            raise ValueError(
                f"setpoints must be non-empty rows of {3 * n} floats")
        timestep = float(data.get("timestep", 0.05))
        if not timestep > 0.0:
            raise ValueError(f"timestep must be positive, got {timestep}")
        drones = [int(d) for d in data.get("droneIndices", range(n))]
        if any(not 0 <= d < n for d in drones):
            raise ValueError(f"droneIndices out of range 0..{n - 1}: {drones}")
        self._traj = {
            "setpoints": sps,
            "timestep": timestep,
            "drones": drones,
            "tol": float(data.get("arrivalTol", 0.15)),
            "timeout": float(data.get("arrivalTimeout", 20.0)),
            "phase": "fly-to-start", "t": 0.0, "idx": -1,
            "wait": 0.0, "resend": 0.0,
        }
        for d in drones:
            self.link.send(d, {"setpoint": sps[0][3 * d:3 * d + 3]})
        self.emit("trajectory-status",
                  {"phase": "fly-to-start", "setpoints": len(sps)})

    def _advance_trajectory(self, out, dt: float) -> None:
        """One tick of the run-trajectory state machine (per processed
        frame; ``out`` supplies the tracked positions for the arrival
        gate)."""
        tr = self._traj
        if tr is None:
            return
        sps = tr["setpoints"]
        if tr["phase"] == "fly-to-start":
            tr["wait"] += dt
            tr["resend"] += dt
            tv = np.asarray(out.tracked.valid)
            tp = np.asarray(out.tracked.pos)
            arrived = True
            for d in tr["drones"]:
                target = np.asarray(sps[0][3 * d:3 * d + 3])
                if not (d < len(tv) and tv[d]):
                    arrived = False
                    break
                # engine world [x, up, z] -> firmware [x, y, alt]
                # (same mapping as the armed pose feed below)
                fw = np.array([tp[d][0], tp[d][2], tp[d][1]])
                if np.linalg.norm(fw - target) > tr["tol"]:
                    arrived = False
                    break
            if self._traj is not tr:   # stopped/replaced mid-tick
                return
            if arrived:
                tr["phase"] = "executing"
                tr["t"] = 0.0
                tr["idx"] = 0   # sps[0] was asserted by the gate itself
                self.emit("trajectory-status",
                          {"phase": "executing",
                           "waited_s": round(tr["wait"], 3)})
            elif tr["wait"] > tr["timeout"]:
                self._traj = None
                self.emit("trajectory-status",
                          {"phase": "aborted",
                           "reason": "fly-to-start timeout"})
            elif tr["resend"] >= 0.5:
                # keep asserting the start setpoint (UI-drip cadence)
                tr["resend"] = 0.0
                for d in tr["drones"]:
                    self.link.send(d, {"setpoint": sps[0][3 * d:3 * d + 3]})
            return
        tr["t"] += dt
        # drip EVERY index up to the elapsed-time target — never skip a
        # setpoint to float accumulation (dt == timestep must send all)
        target = min(int(tr["t"] / tr["timestep"] + 1e-6), len(sps) - 1)
        while tr["idx"] < target:
            if self._traj is not tr:   # stopped/replaced mid-tick
                return
            tr["idx"] += 1
            for d in tr["drones"]:
                self.link.send(
                    d, {"setpoint": sps[tr["idx"]][3 * d:3 * d + 3]})
        if tr["idx"] >= len(sps) - 1 and self._traj is tr:
            self._traj = None
            self.emit("trajectory-status", {"phase": "done"})

    def handle_arm_drone(self, data):
        # computer_code/api/index.py:114-128
        self.drone_armed = list(data["droneArmed"])
        for i in range(self.rig.num_objects):
            self.link.send(i, {"armed": bool(self.drone_armed[i])})

    def handle_set_drone_pid(self, data):
        # computer_code/api/index.py:130-137
        self.link.send(int(data["droneIndex"]),
                       {"pid": [float(x) for x in data["dronePID"]]})

    def handle_set_drone_setpoint(self, data):
        # computer_code/api/index.py:139-146
        self.link.send(int(data["droneIndex"]),
                       {"setpoint": [float(x) for x in data["droneSetpoint"]]})

    def handle_set_drone_trim(self, data):
        # computer_code/api/index.py:148-155
        self.link.send(int(data["droneIndex"]),
                       {"trim": [int(x) for x in data["droneTrim"]]})

    # ------------------------------------------------------------- state

    def set_camera_poses(self, Rs: np.ndarray, ts: np.ndarray) -> None:
        import jax.numpy as jnp
        from low_cost_mocap_tpu.ops import camera as cam_ops

        self.camera_poses = (Rs, ts)
        self._Ps = cam_ops.projection_matrix(
            self._K, jnp.asarray(Rs), jnp.asarray(ts))
        # pairwise fundamentals change only here; recomputing them inside
        # the per-frame step costs ~0.2 ms/dispatch on TPU (see
        # models/pipeline.frame_step docstring)
        from low_cost_mocap_tpu.ops.correspond import _pairwise_fundamentals
        self._F = _pairwise_fundamentals(self._Ps)
        self._save_calibration_artifact()

    def set_to_world_matrix(self, M: np.ndarray) -> None:
        import jax.numpy as jnp

        self.to_world_matrix = M.astype(np.float32)
        self._M = jnp.asarray(self.to_world_matrix)
        self._save_calibration_artifact()

    def _artifact_path(self) -> str:
        import os

        return os.path.join(self.artifacts_dir, "calibration.json")

    def _save_calibration_artifact(self) -> None:
        """Persist full calibration server-side (the reference keeps
        extrinsics + world matrix as browser state only, SURVEY.md §5)."""
        if not self.artifacts_dir or self.camera_poses is None:
            return
        import os

        from low_cost_mocap_tpu.utils.artifacts import (
            Calibration, save_calibration)

        os.makedirs(self.artifacts_dir, exist_ok=True)
        Rs, ts = self.camera_poses
        save_calibration(self._artifact_path(), Calibration(
            Rs=np.asarray(Rs), ts=np.asarray(ts), focals=None,
            to_world_matrix=self.to_world_matrix))

    def _load_calibration_artifact(self) -> None:
        import os

        path = self._artifact_path()
        if not os.path.exists(path):
            return
        from low_cost_mocap_tpu.utils.artifacts import load_calibration

        calib = load_calibration(path)
        self.set_camera_poses(calib.Rs, calib.ts)
        self.set_to_world_matrix(calib.to_world_matrix)

    # -------------------------------------------------------------- loop

    def start(self) -> None:
        if self._running:
            return
        if (self.cfg.batch_emit_thread and self._batch > 1
                and self._emit_worker is None):
            # re-spawn after a stop() (which drains + retires the worker)
            self._emit_worker = threading.Thread(
                target=self._emit_worker_loop, daemon=True,
                name="lcm-batch-emit")
            self._emit_worker.start()
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        self.flush_batches()
        worker = self._emit_worker
        if worker is not None:
            with self._batch_cond:
                self._emit_worker = None    # worker exits once drained
                self._batch_cond.notify_all()
            worker.join(timeout=5)

    def flush_batches(self) -> None:
        """Drain dispatched-but-undecoded batches (readback pipelining,
        ``_run_batched``): decode + emit them in order so the output
        stream is complete.  Called at ``stop()`` and on capture-stop.
        Frames still *buffering* (less than a full batch) are not
        dispatched — batched mode emits whole batches only.  With the
        emit worker active this waits for the worker to drain instead."""
        if self._emit_worker is not None:
            with self._batch_cond:
                while self._batch_pending or self._emit_worker_busy:
                    self._batch_cond.wait(timeout=0.1)
            return
        while True:
            with self._model_lock:
                if not self._batch_pending:
                    return
                rows, dl, num_bodies, set_of_slot = \
                    self._batch_pending.popleft()
                with self.timer.stage("batch-decode"):
                    outs = self._decode_batch_rows(rows, num_bodies)
            with self.timer.stage("batch-emit"):
                self._emit_batch_outs(outs, set_of_slot, dts=dl)

    def _emit_worker_loop(self) -> None:
        """batch_emit_thread worker: pop dispatched batches FIFO, block on
        their readback, decode + emit — entirely off the capture loop."""
        while True:
            with self._batch_cond:
                while not self._batch_pending:
                    if self._emit_worker is None:   # stop() requested
                        return
                    self._batch_cond.wait(timeout=0.2)
                rows, dl, num_bodies, set_of_slot = \
                    self._batch_pending.popleft()
                self._emit_worker_busy = True
                self._batch_cond.notify_all()       # release backpressure
            # decode outside the lock: layout was snapshotted at dispatch
            try:
                with self.timer.stage("batch-decode"):
                    outs = self._decode_batch_rows(rows, num_bodies)
                with self.timer.stage("batch-emit"):
                    self._emit_batch_outs(outs, set_of_slot, dts=dl)
            except Exception as e:   # a bad batch must not wedge the drain
                self.emit("engine-error",
                          {"error": f"batch emit worker: {e}"})
            finally:
                with self._batch_cond:
                    self._emit_worker_busy = False
                    self._batch_cond.notify_all()   # flush_batches waiters

    def _loop(self) -> None:
        interval = 1.0 / self.cfg.target_fps
        last = time.monotonic()
        consecutive_errors = 0
        while self._running:
            now = time.monotonic()
            if now - last < interval:
                time.sleep(last + interval - now)
            dt = max(time.monotonic() - last, 1e-4)
            last = time.monotonic()
            try:
                with self.timer.stage("read"):
                    frames = self.source.read()
                with self.timer.stage("process"):
                    self.process_frame(frames, dt)
                consecutive_errors = 0
            except Exception as e:
                # a camera hiccup or transient device error must not kill the
                # capture loop (the reference simply crashes — SURVEY.md §5
                # "camera dropout ... unhandled")
                consecutive_errors += 1
                self.emit("engine-error",
                          {"error": str(e), "count": consecutive_errors})
                if consecutive_errors >= 50:
                    self.emit("engine-error",
                              {"error": "too many consecutive failures; "
                                        "stopping capture", "fatal": True})
                    self.is_capturing_points = False
                    consecutive_errors = 0
                time.sleep(0.05)
                continue
            self.frame_count += 1
            self.fps = 0.9 * self.fps + 0.1 * (1.0 / dt)
            if self.frame_count % 10 == 0:
                self.emit("fps", {"fps": round(self.fps)})
            if self.frame_count % 120 == 0:
                # per-stage timing telemetry (SURVEY.md §5: the reference
                # has only the fps counter)
                self.emit("metrics", self.timer.summary())

    def process_frame(self, frames: np.ndarray, dt: float):
        """One frame through the compiled step + reference-shaped emits."""
        with self._frame_lock:
            self._last_frames = frames
            # append under the lock (handle_record_frames swaps + stacks
            # from the server thread) and always COPY: a source may reuse
            # its read buffer, which would alias every recorded frame
            rec = self._recording
            if rec is not None and len(rec) < self._recording_cap:
                rec.append(np.array(frames, np.uint8))

        if self.health is not None:
            # frozen-transport detection on the RAW stream (recording above
            # keeps the unmasked truth); a frozen camera is masked out of
            # the rig below and rejoins automatically when its frames move
            for cam, status in self.health.update(frames):
                self.emit("camera-health",
                          {"camera": int(cam), "status": status})

        if self._intrinsics_capture is not None:
            # dot-grid intrinsics capture: self-contained host-side path,
            # independent of the capture/triangulate mode flags
            self._intrinsics_step(frames)

        if not self.is_capturing_points:
            return None

        if self.health is not None:
            frozen = self.health.frozen_mask
            if frozen.any():
                # copy, never mutate the source's buffer (RecordedSource
                # returns views into its stored array); zeroed frames mean
                # zero blobs on EVERY ingest path (dense/packed/sparse/
                # host-detect/mesh) — the mask is data, not structure, so
                # nothing recompiles and >= 2 live views still triangulate
                frames = frames.copy()
                frames[frozen] = 0

        # Host arrays go STRAIGHT into the jitted call (no device_put /
        # jnp.asarray): the transfer rides the dispatch RPC, which matters
        # on tunneled devices where every extra round trip costs ~300 us.
        blob_args = mesh_payload = None
        if self._mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            from low_cost_mocap_tpu.ops.detect import pack_frames

            payload = (pack_frames(frames, self.cfg.detect_threshold)
                       if self._fast else frames)
            if self._batch > 1:
                # batched x camera-sharded serving: buffer host payloads,
                # ONE dist_scan program per dispatch_batch frames
                # (per-shard detection over the whole batch, centroids
                # all_gathered once, frame-parallel scan tail)
                from low_cost_mocap_tpu.parallel.dist_pipeline import \
                    dist_scan_frame_step

                def dispatch_mesh(pb, dl):
                    return dist_scan_frame_step(
                        self._mesh, self._kalman_state, pb, dl,
                        self._Ps, self._K, self._dist, self._M, self._F,
                        self.rig, self.cfg, packed=self._fast,
                        use_pallas=self._pallas, with_obs=True)

                return self._run_batched(np.asarray(payload),
                                         np.float32(dt), dispatch_mesh)
            mesh_payload = jax.device_put(
                payload, NamedSharding(self._mesh, P("cam")))
        elif self._host_detect:
            from low_cost_mocap_tpu.control.bindings import \
                ingest_detect_packed
            from low_cost_mocap_tpu.ops.detect import threshold_cutoff

            # fused native threshold+pack+CC straight into the (C, K, 3)
            # [x, y, valid] upload layout (ONE FFI crossing, no Python
            # packing; bit-identical to the split pack_bits +
            # detect_blobs path)
            blob_args = ingest_detect_packed(
                frames, threshold_cutoff(self.cfg.detect_threshold),
                self.cfg.max_blobs, weighted=self.cfg.weighted_centroids)
        elif self._fast:
            idx, ok, packed = sparse_ingest(
                frames, self.cfg.detect_threshold, self.cfg.sparse_budget)
            payload = idx if ok else packed  # dense 1-bit path is bit-exact
        else:
            ok, payload = False, frames
        dt32 = np.float32(dt)
        if blob_args is not None and self._batch > 1:
            # batched-dispatch serving: buffer host-detected frames, ONE
            # scan program per dispatch_batch frames (state carried on
            # device), outputs emitted in order when the batch completes
            def dispatch_blobs(pb, dl):
                return self._step_scan(
                    self._kalman_state, pb, dl,
                    self._Ps, self._K, self._dist, self._M, self._F)

            return self._run_batched(blob_args, dt32, dispatch_blobs)

        with self._model_lock:
            if mesh_payload is not None:
                self._kalman_state, packed = self._step_dist(
                    self._kalman_state, mesh_payload, dt32,
                    self._Ps, self._K, self._dist, self._M, self._F)
            elif blob_args is not None:
                self._kalman_state, packed = self._step_blobs(
                    self._kalman_state, blob_args, dt32,
                    self._Ps, self._K, self._dist, self._M, self._F)
            else:
                step = (self._step_sparse if (self._fast and ok)
                        else self._step)
                self._kalman_state, packed = step(
                    self._kalman_state, payload, dt32,
                    self._Ps, self._K, self._dist, self._M, self._F)
            # ONE ~2 KB device->host transfer for all outputs (fetching the
            # ~20 pytree leaves individually pays the readback latency per
            # array).  With readback_pipeline_depth > 0 the fetch is issued
            # async and harvested `depth` frames later, overlapping
            # device->host latency with subsequent frames' compute
            # (high-latency links).
            depth = self.cfg.readback_pipeline_depth
            if depth > 0:
                packed.copy_to_host_async()
                self._pending.append(packed)
                if len(self._pending) <= depth:
                    return None
                packed = self._pending.popleft()
            out = unpack_outputs(np.asarray(packed), self.rig.num_cameras,
                                 self.cfg.max_blobs, self.rig.num_objects,
                                 num_bodies=self._num_bodies, with_obs=True)
            # snapshot the slot->template map with the outputs it describes:
            # a learn-body-template apply can rebuild it mid-emit otherwise
            set_of_slot = self._body_set_of_slot

        self._emit_frame_outputs(out, set_of_slot)
        self._advance_trajectory(out, float(dt))
        with self._frame_lock:
            self._last_out = out
        return out

    def _run_batched(self, payload, dt32, dispatch):
        """Shared batched-dispatch protocol for both serving backends
        (host-detect scan and camera-sharded dist scan): buffer
        (payload, dt) under ``_model_lock``, and when ``dispatch_batch``
        frames have accumulated, stack them, run ``dispatch(pb, dl)``
        (which must consume ``self._kalman_state`` and return
        (new_state, packed (B, L) rows)), decode under the lock, emit
        outside it.  Returns the newest frame's outputs, or None while
        the batch is still filling."""
        with self._model_lock:
            self._batch_buf.append((payload, dt32))
            if len(self._batch_buf) < self._batch:
                return None
            with self.timer.stage("batch-stack"):
                pb = np.stack([p for p, _ in self._batch_buf])
                dl = np.asarray([d for _, d in self._batch_buf], np.float32)
            self._batch_buf = []
            with self.timer.stage("batch-dispatch"):
                self._kalman_state, packed_rows = dispatch(pb, dl)
            # Snapshot the packed-row layout WITH the rows it describes: a
            # learn-body-template apply can rebuild the step (new
            # num_bodies) between dispatch and decode.
            item = (packed_rows, dl, self._num_bodies,
                    self._body_set_of_slot)
            if self._emit_worker is not None:
                # batch_emit_thread: hand the dispatched batch to the
                # worker — the capture loop never blocks on a readback,
                # decode/emit/fan-out overlap ingest on another core.
                packed_rows.copy_to_host_async()
                self._batch_pending.append(item)
                self._batch_cond.notify_all()
                cap = max(self.cfg.readback_pipeline_depth, 4)
                while len(self._batch_pending) > cap:   # backpressure
                    self._batch_cond.wait(timeout=1.0)
                return None
            # With readback_pipeline_depth > 0, decode is pipelined: the
            # freshly dispatched batch's readback is issued async and
            # harvested ``depth`` batches later, so the host decodes batch
            # N-depth while the device computes batch N.  Blocking here
            # instead costs a full dispatch+readback round trip per batch
            # (~70 ms through a congested tunnel — measured 742 fps
            # blocked vs 11,395 fps chained on the same window).  Costs
            # depth*B frames of output latency; per-frame mode (the
            # control loop) is unaffected.
            depth = self.cfg.readback_pipeline_depth
            if depth > 0:
                packed_rows.copy_to_host_async()
                self._batch_pending.append(item)
                if len(self._batch_pending) <= depth:
                    return None
                item = self._batch_pending.popleft()
            packed_rows, dl, num_bodies, set_of_slot = item
            with self.timer.stage("batch-decode"):
                outs = self._decode_batch_rows(packed_rows, num_bodies)
        with self.timer.stage("batch-emit"):
            return self._emit_batch_outs(outs, set_of_slot, dts=dl)

    def _decode_batch_rows(self, packed_rows, num_bodies):
        """Decode a batched dispatch's (B, L) packed rows into per-frame
        FrameOutputs (ONE readback, vectorized across the batch).
        ``num_bodies`` is the layout snapshot taken at dispatch time."""
        from low_cost_mocap_tpu.models.pipeline import unpack_outputs_batch

        return unpack_outputs_batch(
            np.asarray(packed_rows), self.rig.num_cameras,
            self.cfg.max_blobs, self.rig.num_objects,
            num_bodies=num_bodies, with_obs=True)

    def _emit_batch_outs(self, outs, set_of_slot, dts=None):
        """Emit a completed batch's outputs in frame order (outside the
        model lock) and return the newest one."""
        for i, o in enumerate(outs):
            self._emit_frame_outputs(o, set_of_slot)
            if dts is not None:
                self._advance_trajectory(o, float(dts[i]))
        with self._frame_lock:
            self._last_out = outs[-1]
        return outs[-1]

    def _emit_frame_outputs(self, out, set_of_slot) -> None:
        """Per-frame output fan-out: health counters, mode-gated reference
        emits (image-points / object-points), armed pose+vel serial feed.
        Shared by the per-frame and batched-dispatch paths."""
        if self.health is not None:
            counts = np.asarray(out.blob_valid).sum(axis=1)
            for cam, status in self.health.update_blobs(counts):
                self.emit("camera-health",
                          {"camera": int(cam), "status": status})

        if self.is_capturing_points and not self.is_triangulating_points:
            # first blob per camera, [None, None] when absent
            # (computer_code/api/helpers.py:91-92 emits [x[0] for x in ...])
            blobs = np.asarray(out.blob_px)
            valid = np.asarray(out.blob_valid)
            image_points = [
                blobs[c, 0].tolist() if valid[c, 0] else [None, None]
                for c in range(self.rig.num_cameras)
            ]
            if any(v[0] is not None for v in image_points):
                self.captured_points.append(image_points)
                self.emit("image-points", image_points)
        elif self.is_triangulating_points:
            pv = np.asarray(out.point_valid)
            if self._learning_frames is not None:   # learn-body-template
                self._learning_frames.append(
                    (np.asarray(out.object_points), pv))
            if self._refine_obs is not None and pv.any():
                # live recalibration: keep the winner observations of this
                # frame's valid points (cap the collection so a forgotten
                # session can't grow unbounded)
                if sum(len(o) for o, _ in self._refine_obs) < 4096:
                    self._refine_obs.append(
                        (np.asarray(out.point_obs)[pv],
                         np.asarray(out.point_obs_mask)[pv]))
            # Payload construction is listener-gated: building the
            # object-points dicts costs ~80 us/frame of Python on the
            # serving host — pure waste when nobody subscribed.  State
            # consumers (learning/refine collections above, the armed-drone
            # pose feed below) always run at full rate.
            want_payload = bool(self._listeners.get("object-points"))
            objects = []
            filtered = []
            if self.is_locating_objects:
                if want_payload:
                    ov = np.asarray(out.objects.valid)
                    for i in np.where(ov)[0]:
                        objects.append({
                            "pos": np.asarray(out.objects.pos)[i].tolist(),
                            "heading":
                                float(np.asarray(out.objects.heading)[i]),
                            "error":
                                float(np.asarray(out.objects.error)[i]),
                            "droneIndex":
                                int(np.asarray(out.objects.index)[i]),
                        })
                tv = np.asarray(out.tracked.valid)
                for d in np.where(tv)[0]:
                    armed = self.drone_armed[d]
                    if not (want_payload or armed):
                        continue
                    pos = np.asarray(out.tracked.pos)[d]
                    vel = np.asarray(out.tracked.vel)[d]
                    heading = float(np.asarray(out.tracked.heading)[d])
                    if want_payload:
                        filtered.append({
                            "pos": pos.tolist(),
                            "vel": vel.tolist(),
                            "heading": heading,
                            "droneIndex": int(d),
                        })
                    if armed:
                        # pose+vel feed (computer_code/api/helpers.py:113-122).
                        # Frame conversion at the link boundary: the engine's
                        # world frame is display-y-up [x, up, z] while the
                        # firmware reads pos[2] as ALTITUDE
                        # (receiver_esp32.ino:84-88, zPos drives throttle/
                        # ground effect) — so send [x, z, up].
                        self.link.send(int(d), {
                            "pos": [round(float(pos[0]), 4),
                                    round(float(pos[2]), 4),
                                    round(float(pos[1]), 4),
                                    round(heading, 4)],
                            "vel": [round(float(vel[0]), 4),
                                    round(float(vel[2]), 4),
                                    round(float(vel[1]), 4)],
                        })
            if not want_payload:
                return
            obj_pts = np.asarray(out.object_points)[pv]
            errs = np.asarray(out.point_errors)[pv]
            payload = {
                "object_points": obj_pts.tolist(),
                "errors": errs.tolist(),
                "objects": objects,
                "filtered_objects": filtered,
            }
            if out.bodies is not None:
                # 6-DoF rigid-body fits + gated/smoothed tracks (capability
                # beyond the reference; additive fields, reference clients
                # ignore them)
                bv = np.asarray(out.bodies.valid)
                payload["bodies"] = [{
                    "R": np.asarray(out.bodies.R)[i].tolist(),
                    "t": np.asarray(out.bodies.t)[i].tolist(),
                    "rms": float(np.asarray(out.bodies.rms)[i]),
                    "templateIndex": int(set_of_slot[i]),
                } for i in np.where(bv)[0]]
                tb = out.tracked_bodies
                tbv = np.asarray(tb.valid)
                # quat->R on host numpy: tb is already host data, and a jnp
                # call here would dispatch to the (tunneled) device + block
                # on readback once per body per frame
                payload["tracked_bodies"] = [{
                    "bodyIndex": int(i),
                    "templateIndex": int(set_of_slot[i]),
                    "pos": np.asarray(tb.pos)[i].tolist(),
                    "vel": np.asarray(tb.vel)[i].tolist(),
                    "quat": np.asarray(tb.quat)[i].tolist(),
                    "R": quat_to_matrix_np(tb.quat[i]).tolist(),
                } for i in np.where(tbv)[0]]
            self.emit("object-points", payload)

    # ------------------------------------------------------------ frames

    def latest_frame_strip(self) -> np.ndarray | None:
        """(H, C*W) uint8 montage for the MJPEG display path
        (``computer_code/api/helpers.py:137-141``), with detected blobs
        annotated like the reference stream: a contour ring around each
        blob plus its pixel coordinates as text
        (``computer_code/api/helpers.py:148-157`` — cv.drawContours +
        cv.putText; here a crosshair + box outline + bitmap digits, no
        OpenCV dependency on the serving path)."""
        with self._frame_lock:
            if self._last_frames is None:
                return None
            frames = self._last_frames
            out = self._last_out
        strip = np.hstack(list(frames)).copy()
        if out is not None and self.is_capturing_points:
            H, W = frames.shape[1], frames.shape[2]
            blobs = np.asarray(out.blob_px)
            bvalid = np.asarray(out.blob_valid)
            for c in range(frames.shape[0]):
                for k in np.where(bvalid[c])[0]:
                    bx, by = blobs[c, k, 0], blobs[c, k, 1]
                    x = int(np.clip(bx, 0, W - 1)) + c * W
                    y = int(np.clip(by, 0, H - 1))
                    x0, x1 = max(x - 4, 0), min(x + 5, strip.shape[1])
                    y0, y1 = max(y - 4, 0), min(y + 5, H)
                    strip[y, x0:x1] = 255   # crosshair
                    strip[y0:y1, x] = 255
                    # contour ring (box outline at the blob boundary)
                    strip[y0:y1, x0] = 255
                    strip[y0:y1, x1 - 1] = 255
                    strip[y0, x0:x1] = 255
                    strip[y1 - 1, x0:x1] = 255
                    # coordinate label (reference: helpers.py:153-157)
                    _draw_text(strip, x + 6, y - 6,
                               f"{bx:.0f},{by:.0f}")
            # epipolar-line overlay during triangulation (reference:
            # helpers.py:363-368 paints each root's epiline into every
            # later camera's frame via drawlines, helpers.py:497-504).
            # Host-side only, off the jitted path: lines at a dim grey so
            # blob annotations (255) stay distinct on the mono stream.
            if self.is_triangulating_points and self._F is not None:
                if self._F_np_src is not self._F:
                    # cache the host copy: one device readback per pose
                    # set, not one per displayed frame
                    self._F_np = np.asarray(self._F)
                    self._F_np_src = self._F
                C = frames.shape[0]
                for b in range(1, C):
                    for a in range(b):
                        for k in np.where(bvalid[a])[0]:
                            ph = np.array([blobs[a, k, 0], blobs[a, k, 1],
                                           1.0])
                            _draw_epiline(strip, self._F_np[a, b] @ ph,
                                          b * W, W, H)
        return strip


# 3x5 bitmap glyphs for the stream's coordinate labels (digits + ',' '-'
# '.'), row-major bits — enough for "x,y" annotations without cv2.putText
_GLYPHS = {
    "0": 0b111101101101111, "1": 0b010110010010111, "2": 0b111001111100111,
    "3": 0b111001111001111, "4": 0b101101111001001, "5": 0b111100111001111,
    "6": 0b111100111101111, "7": 0b111001010010010, "8": 0b111101111101111,
    "9": 0b111101111001111, ",": 0b000000010010100, "-": 0b000000111000000,
    ".": 0b000000000000010,
}


def _draw_text(img: np.ndarray, x: int, y: int, text: str,
               value: int = 255) -> None:
    """Render 3x5 bitmap text into a grayscale image in place (clipped)."""
    H, W = img.shape
    for ch in text:
        bits = _GLYPHS.get(ch)
        if bits is None:
            x += 4
            continue
        for r in range(5):
            for col in range(3):
                if bits >> (14 - r * 3 - col) & 1:
                    yy, xx = y + r, x + col
                    if 0 <= yy < H and 0 <= xx < W:
                        img[yy, xx] = value
        x += 4


def _draw_epiline(strip: np.ndarray, line, x_off: int, W: int, H: int,
                  value: int = 150) -> None:
    """Draw epipolar line ``ax + by + c = 0`` into the tile starting at
    column ``x_off`` of the hstacked strip (the reference's ``drawlines``,
    ``computer_code/api/helpers.py:497-504``, draws from (0, -c/b) to
    (W, -(c+aW)/b) with cv.line).  Dim grey, max-blended so blob
    annotations stay visible where a line crosses them."""
    a, b, c = (float(v) for v in line)
    if abs(a) < 1e-12 and abs(b) < 1e-12:
        return
    n = 2 * max(W, H)
    if abs(b) >= abs(a):
        xs = np.linspace(0.0, W - 1.0, n)
        ys = -(c + a * xs) / b
    else:
        ys = np.linspace(0.0, H - 1.0, n)
        xs = -(c + b * ys) / a
    m = (ys >= 0) & (ys <= H - 1) & (xs >= 0) & (xs <= W - 1)
    if not m.any():
        return
    xi = xs[m].astype(np.intp) + x_off
    yi = ys[m].astype(np.intp)
    strip[yi, xi] = np.maximum(strip[yi, xi], value)


def camera_poses_to_serializable(Rs: np.ndarray, ts: np.ndarray):
    """Reference wire shape (``computer_code/api/helpers.py:526-530``)."""
    return [{"R": R.tolist(), "t": np.asarray(t).reshape(-1).tolist()}
            for R, t in zip(np.asarray(Rs), np.asarray(ts))]


def serializable_to_camera_poses(poses):
    Rs = np.asarray([p["R"] for p in poses], np.float32)
    ts = np.asarray([np.asarray(p["t"], np.float32).reshape(-1)
                     for p in poses], np.float32)
    return Rs, ts
