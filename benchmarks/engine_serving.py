"""Engine END-TO-END serving throughput — the *product* number.

``bench.py`` times the raw step loop (ingest + jitted dispatch + packed
readback).  The product — ``runtime/engine.py`` — adds per frame: health
monitoring, batch buffering, ``unpack_outputs`` decode, Python payload
construction (``_emit_frame_outputs``), listener fan-out, and (when a
server is attached) JSON encoding + websocket writes.  The reference's
product loop IS its benchmark number (``computer_code/api/index.py:39-59``
runs capture -> emit inline); ours must be measured the same way.

Measures a real ``Engine`` fed pre-rendered synthetic drone frames
through ``process_frame`` (the full product path; source.read() excluded,
matching bench.py's ingest-onward scope), in three listener regimes:

- ``none``:      no subscribers (emit payloads still gated off/on below)
- ``listener``:  one in-process object-points listener (counts payloads)
- ``ws``:        a ``MocapServer`` broadcasting every event to ONE
                 connected direct-websocket subscriber (drained by a
                 background thread), i.e. ``serve.py`` + a live client

and two dispatch modes: batched (``dispatch_batch=128``, the serving
headline) and per-frame (the control-loop default).

Prints ONE JSON line; run on the TPU for real numbers (CPU works for the
logic).  Env: LCM_SERVE_PASSES (default 3), LCM_SERVE_DISPATCHES
(batched dispatches per pass, default 24 — must exceed the pipeline
depth or the figure measures the trailing drain, not steady-state
serving), LCM_SERVE_FRAMES (per-frame frames per pass, default 400).
"""

from __future__ import annotations

import json
import os
import socket
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_frames(num_cameras=4, image_size=320, n_frames=64):
    """Pre-render a cycling sequence of (C, H, W) uint8 frame sets with a
    moving synthetic drone (3-LED constellation) so every stage of the
    product path (detect -> match -> DLT -> rigid fit -> Kalman -> emit)
    does real work every frame."""
    from low_cost_mocap_tpu.runtime.sources import SyntheticSource
    from low_cost_mocap_tpu.utils import synthetic as syn

    Rs, ts, rig = syn.ring_rig(num_cameras=num_cameras,
                               image_size=image_size)
    src = SyntheticSource(rig, Rs, ts, num_drones=1)
    frames = [np.array(src.read()) for _ in range(n_frames)]
    return Rs, ts, rig, frames


class _WsSubscriber:
    """Direct-websocket Socket.IO subscriber that drains the socket on a
    background thread (so the server is never back-pressured by an idle
    client buffer) and counts bytes + frames received."""

    def __init__(self, host, port):
        from low_cost_mocap_tpu.runtime import wsproto

        self._wsproto = wsproto
        self.sock = socket.create_connection((host, port), timeout=10.0)
        self.parser = wsproto.FrameParser()
        self.bytes = 0
        self.msgs = 0
        self.sample = None
        self._stop = False
        key = "dGhlIHNhbXBsZSBub25jZQ=="
        req = (f"GET /socket.io/?EIO=4&transport=websocket HTTP/1.1\r\n"
               f"Host: {host}:{port}\r\nUpgrade: websocket\r\n"
               f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
               f"Sec-WebSocket-Version: 13\r\n\r\n")
        self.sock.sendall(req.encode())
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += self.sock.recv(4096)
        head, rest = buf.split(b"\r\n\r\n", 1)
        assert b"101" in head.split(b"\r\n")[0], head
        pkts = [p for op, p in self.parser.feed(rest) if op == 0x1]
        # engine.io OPEN then socket.io connect
        deadline = time.time() + 5.0
        while not any(p.startswith(b"0") for p in pkts):
            pkts += [p for op, p in
                     self.parser.feed(self.sock.recv(4096)) if op == 0x1]
            assert time.time() < deadline, "no OPEN"
        self.sock.sendall(wsproto.encode_frame(b"40", mask=True))
        while not any(p.startswith(b"40") for p in pkts):
            pkts += [p for op, p in
                     self.parser.feed(self.sock.recv(4096)) if op == 0x1]
            assert time.time() < deadline, "no 40 ack"
        self.thread = threading.Thread(target=self._drain, daemon=True)
        self.thread.start()

    def _drain(self):
        self.sock.settimeout(0.5)
        while not self._stop:
            try:
                data = self.sock.recv(1 << 20)
            except socket.timeout:
                continue
            except OSError:
                return
            if not data:
                return
            self.bytes += len(data)
            for op, p in self.parser.feed(data):
                if op == 0x1 and p.startswith(b'42["object-points"'):
                    self.msgs += 1
                    if self.sample is None:
                        self.sample = p

    def close(self):
        self._stop = True
        try:
            self.sock.close()
        except OSError:
            pass
        self.thread.join(timeout=2.0)


def _measure(engine, frames, n_frames, passes, dt=np.float32(1 / 60),
             flush=False):
    """Feed ``n_frames`` (cycling the pre-rendered sets) per pass; return
    max fps across passes (min-time estimator, same as bench.py).

    ``flush=True`` drains in-flight batches INSIDE the timed window so a
    pipelined/worker engine is measured on sustained emitted throughput,
    not on how fast it can enqueue."""
    F = len(frames)
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for i in range(n_frames):
            engine.process_frame(frames[i % F], dt)
        if flush:
            engine.flush_batches()
        best = min(best, time.perf_counter() - t0)
    return n_frames / best


def _build_engine(rig, Rs, ts, cfg):
    from low_cost_mocap_tpu.runtime.engine import Engine
    from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
    from low_cost_mocap_tpu.runtime.sources import SyntheticSource

    e = Engine(rig, cfg, SyntheticSource(rig, Rs, ts, num_drones=1),
               CollectingLink(), fast_path=True, host_detect=True)
    e.set_camera_poses(Rs, ts)
    e.is_capturing_points = True
    e.is_triangulating_points = True
    e.is_locating_objects = True
    return e


def main():
    from low_cost_mocap_tpu.config import EngineConfig
    from low_cost_mocap_tpu.runtime.server import MocapServer

    passes = int(os.environ.get("LCM_SERVE_PASSES", "3"))
    # deep enough that pipelined harvests reach steady state IN the loop
    # (depth 8 must be < dispatches/pass, or every readback lands in the
    # trailing flush and the figure measures drain, not serving)
    n_disp = int(os.environ.get("LCM_SERVE_DISPATCHES", "24"))
    n_pf = int(os.environ.get("LCM_SERVE_FRAMES", "400"))
    B = 128

    Rs, ts, rig, frames = _build_frames()
    out = {"dispatch_batch": B, "unit": "frames/s"}

    # ---- batched serving engine (one compiled scan program) ----
    eng = _build_engine(rig, Rs, ts, EngineConfig(dispatch_batch=B))
    # warmup/compile: one full batch through the scan program
    for i in range(B):
        eng.process_frame(frames[i % len(frames)], np.float32(1 / 60))

    # synchronous decode (readback_pipeline_depth=0): every batch blocks
    # on its own device round trip — the pre-r5 behavior, kept as the
    # comparison row
    out["batched_sync"] = round(
        _measure(eng, frames, n_disp * B, passes, flush=True), 1)

    # pipelined decode (depth=D): decode batch N-D while batch N is on
    # the device — hides D round trips at D*B frames of output latency.
    # Scan depths: through a congested tunnel the round trip can reach
    # ~70 ms, needing several batches in flight to hide it fully.
    import dataclasses

    from low_cost_mocap_tpu.utils.profiling import StageTimer

    best_depth, best_fps = 0, out["batched_sync"]
    for depth in (2, 8):
        eng.cfg = dataclasses.replace(
            eng.cfg, readback_pipeline_depth=depth)
        eng.timer = StageTimer()   # per-mode stages (no cross-pollution)
        fps = round(_measure(eng, frames, n_disp * B, passes, flush=True), 1)
        out[f"batched_d{depth}"] = fps
        if fps > best_fps:
            best_depth, best_fps = depth, fps

    # emit worker thread (batch_emit_thread): the capture loop runs pure
    # ingest -> dispatch; decode/emit/fan-out run on a second core.
    eng.cfg = dataclasses.replace(
        eng.cfg, batch_emit_thread=True, readback_pipeline_depth=8)
    eng.timer = StageTimer()
    eng._emit_worker = threading.Thread(
        target=eng._emit_worker_loop, daemon=True, name="lcm-batch-emit")
    eng._emit_worker.start()
    fps = round(_measure(eng, frames, n_disp * B, passes, flush=True), 1)
    out["batched_worker"] = fps
    if fps > best_fps:
        best_depth, best_fps = "worker", fps
    out["batched_mode"] = best_depth
    out["batched_none"] = best_fps
    if best_depth != "worker":
        # retire the worker and re-measure the winning depth mode with a
        # fresh timer so the reported stages describe the headline row
        eng.stop()
        eng.cfg = dataclasses.replace(
            eng.cfg, batch_emit_thread=False,
            readback_pipeline_depth=best_depth)
        eng.timer = StageTimer()
        _measure(eng, frames, n_disp * B, 1, flush=True)

    got = []
    cb = got.append
    eng.on("object-points", cb)
    out["batched_listener"] = round(
        _measure(eng, frames, n_disp * B, passes, flush=True), 1)
    assert len(got) >= n_disp * B, (len(got), n_disp * B)
    eng._listeners["object-points"].remove(cb)

    srv = MocapServer(eng, port=0)
    srv.start()
    sub = _WsSubscriber("127.0.0.1", srv.port)
    out["batched_ws"] = round(
        _measure(eng, frames, n_disp * B, passes, flush=True), 1)
    # the subscriber must actually be receiving the stream
    deadline = time.time() + 5.0
    while sub.msgs == 0 and time.time() < deadline:
        time.sleep(0.05)
    out["ws_msgs"] = sub.msgs
    out["ws_mbytes"] = round(sub.bytes / 1e6, 1)
    assert sub.msgs > 0, "ws subscriber received nothing"
    sub.close()
    srv.stop()

    # UI-decimated subscriber (serve.py --ui-decimation): every 10th
    # object-points crosses the socket — the lever when the subscriber
    # is a UI scene, not a recorder (in-process listeners keep full rate)
    srv = MocapServer(eng, port=0, ui_decimation=10)
    srv.start()
    sub = _WsSubscriber("127.0.0.1", srv.port)
    out["batched_ws_decim10"] = round(
        _measure(eng, frames, n_disp * B, passes, flush=True), 1)
    sub.close()
    srv.stop()
    # per-stage p50s of the batched loop (ms per batch of B frames)
    s = eng.timer.summary()
    out["stage_p50_ms"] = {
        k.replace("batch-", ""): round(s[k]["p50_ms"], 2)
        for k in ("batch-stack", "batch-dispatch", "batch-decode",
                  "batch-emit") if k in s}

    # ---- per-frame engine (control-loop default) ----
    eng2 = _build_engine(rig, Rs, ts, EngineConfig())
    for i in range(4):
        eng2.process_frame(frames[i], np.float32(1 / 60))
    # depth=0: the control-loop default — every frame blocks on its own
    # readback (minimum latency, throughput = 1 / round-trip)
    out["perframe_none"] = round(_measure(eng2, frames, n_pf, passes), 1)
    # depth=2: async readback harvested 2 frames later (latency +2 frames,
    # round trips overlapped)
    eng2.cfg = dataclasses.replace(eng2.cfg, readback_pipeline_depth=2)
    out["perframe_pipelined"] = round(
        _measure(eng2, frames, n_pf, passes), 1)
    srv2 = MocapServer(eng2, port=0)
    srv2.start()
    sub2 = _WsSubscriber("127.0.0.1", srv2.port)
    out["perframe_ws"] = round(_measure(eng2, frames, n_pf, passes), 1)
    sub2.close()
    srv2.stop()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
