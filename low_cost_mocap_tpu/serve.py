"""App launcher: ``python -m low_cost_mocap_tpu.serve``.

Boots source + engine + API server + operator console — the counterpart of
running ``python3 api/index.py`` + ``yarn dev`` in the reference
(``README.md:25-29``), in one process with no external dependencies.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="low-cost-mocap-tpu server")
    p.add_argument("--port", type=int, default=3001)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--source", choices=["synthetic", "recorded", "pseyepy"],
                   default="synthetic")
    p.add_argument("--recording", help="path to .npz for --source recorded")
    p.add_argument("--cameras", type=int, default=4)
    p.add_argument("--image-size", default="320",
                   help="square size or HxW (e.g. 320x240 runs the "
                        "reference's rotated sensor shape unpadded)")
    p.add_argument("--drones", type=int, default=1,
                   help="synthetic drones rendered by the synthetic source")
    p.add_argument("--link", choices=["loopback", "serial", "none"],
                   default="loopback")
    p.add_argument("--serial-device", default="/dev/ttyUSB0")
    p.add_argument("--fps", type=float, default=150.0)
    p.add_argument("--weighted-centroids", action="store_true",
                   help="intensity-weighted sub-pixel blob centroids "
                        "(host-detect path; ~2x lower 3D marker error)")
    p.add_argument("--dispatch-batch", type=int, default=1,
                   help="frames per device dispatch (one XLA program per "
                        "batch: geometry vmapped over the frames, Kalman "
                        "bank scanned; amortises the per-dispatch RPC on "
                        "tunneled links at N frames of latency — keep 1 "
                        "for closed-loop control, raise for high-rate "
                        "serving; composes with --cam-shards)")
    p.add_argument("--ui-decimation", type=int, default=1,
                   help="forward every Nth per-frame stream event "
                        "(object-points/image-points) to socket clients; "
                        "1 = every frame (reference parity).  The lever "
                        "for UI subscribers under batched serving — "
                        "in-process consumers always get every frame")
    p.add_argument("--calibration", help="calibration artifact (json) to load")
    p.add_argument("--body-markers",
                   help="JSON [[x,y,z],...] rigid-body template (engine "
                        "world frame) to 6-DoF-track alongside the drones")
    p.add_argument("--max-bodies", type=int, default=2)
    p.add_argument("--body-sets",
                   help="JSON [[[[x,y,z],...], maxInstances], ...] — "
                        "additional distinct rigid-body templates tracked "
                        "simultaneously (see RigConfig.body_sets)")
    p.add_argument("--cam-shards", type=int, default=0,
                   help="shard live ingest+detection over this many devices "
                        "(a 'cam' mesh axis that must divide the camera count)")
    p.add_argument("--artifacts-dir", default="artifacts",
                   help="directory for auto-persisted calibration state")
    args = p.parse_args(argv)

    from low_cost_mocap_tpu.config import EngineConfig, RigConfig
    from low_cost_mocap_tpu.runtime.engine import Engine
    from low_cost_mocap_tpu.runtime.server import MocapServer
    from low_cost_mocap_tpu.runtime import serial_link, sources
    from low_cost_mocap_tpu.utils import synthetic as syn

    import jax

    # tunneled/remote accelerators have ~20 ms device->host fetch latency;
    # overlap it with compute by harvesting results a few frames late
    depth = 0 if jax.default_backend() == "cpu" else 6
    cfg = EngineConfig(target_fps=args.fps, readback_pipeline_depth=depth,
                       weighted_centroids=args.weighted_centroids,
                       dispatch_batch=args.dispatch_batch)

    body_kw = {}
    if args.body_markers:
        import json as _json

        body_kw = dict(
            body_markers=tuple(tuple(m)
                               for m in _json.loads(args.body_markers)),
            max_bodies=args.max_bodies)
    if args.body_sets:
        import json as _json

        body_kw["body_sets"] = tuple(
            (tuple(tuple(m) for m in markers), int(max_inst))
            for markers, max_inst in _json.loads(args.body_sets))

    size_arg = args.image_size.lower()
    if "x" in size_arg:
        h, w = size_arg.split("x")
        image_size = (int(h), int(w))
    else:
        image_size = int(size_arg)

    if args.source == "synthetic":
        Rs, ts, rig = syn.ring_rig(num_cameras=args.cameras,
                                   image_size=image_size)
        if body_kw:
            import dataclasses

            rig = dataclasses.replace(rig, **body_kw)
        source = sources.SyntheticSource(rig, Rs, ts, num_drones=args.drones)
    elif args.source == "recorded":
        if not args.recording:
            p.error("--recording required with --source recorded")
        source = sources.RecordedSource(args.recording)
        rig = RigConfig(num_cameras=source.num_cameras,
                        image_size=source.image_size, **body_kw)
        Rs = ts = None
    else:
        rig = RigConfig(num_cameras=args.cameras, image_size=image_size,
                        **body_kw)
        source = sources.PseyepySource(rig)
        Rs = ts = None

    if args.link == "loopback":
        link = serial_link.LoopbackLink(rig.num_objects)
    elif args.link == "serial":
        link = serial_link.PyserialLink(args.serial_device)
    else:
        link = serial_link.CollectingLink()

    mesh = None
    if args.cam_shards:
        from low_cost_mocap_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(
            {"cam": args.cam_shards},
            devices=jax.devices()[:args.cam_shards])

    engine = Engine(rig, cfg, source, link,
                    artifacts_dir=args.artifacts_dir, mesh=mesh)
    if args.calibration:
        from low_cost_mocap_tpu.utils.artifacts import load_calibration

        calib = load_calibration(args.calibration)
        engine.set_camera_poses(calib.Rs, calib.ts)
        engine.set_to_world_matrix(calib.to_world_matrix)
    elif args.source == "synthetic":
        # synthetic rigs know their own ground-truth extrinsics
        engine.set_camera_poses(Rs, ts)

    server = MocapServer(engine, host=args.host, port=args.port,
                         ui_decimation=args.ui_decimation)
    server.start()
    engine.start()
    print(f"console: http://{args.host}:{server.port}/  "
          f"(source={args.source}, link={args.link})")

    # loopback SIL: run the cascade+simulator at 500 Hz in its own thread
    stop_flag = []
    if args.link == "loopback":
        import threading

        def sil_loop():
            while not stop_flag:
                link.tick(0.002)
                time.sleep(0.002)

        threading.Thread(target=sil_loop, daemon=True).start()

    try:
        while True:
            time.sleep(0.5)
    except KeyboardInterrupt:
        pass
    finally:
        stop_flag.append(True)
        engine.stop()
        server.stop()
        source.close()
        link.close()


if __name__ == "__main__":
    main()
