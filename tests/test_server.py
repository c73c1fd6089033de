"""API server: Socket.IO event surface, MJPEG stream, trajectory endpoint."""

import http.client
import json
import socket
import time

import numpy as np
import pytest

from low_cost_mocap_tpu.config import EngineConfig
from low_cost_mocap_tpu.runtime import wsproto
from low_cost_mocap_tpu.runtime.engine import Engine
from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
from low_cost_mocap_tpu.runtime.server import MocapServer
from low_cost_mocap_tpu.runtime.sources import SyntheticSource
from low_cost_mocap_tpu.utils import synthetic as syn


class SioClient:
    """Minimal Socket.IO-over-WebSocket client (stdlib only)."""

    def __init__(self, host, port, timeout=5.0, query=""):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.parser = wsproto.FrameParser()
        self.packets = []
        key = "dGhlIHNhbXBsZSBub25jZQ=="
        req = (f"GET /socket.io/?EIO=4&transport=websocket{query} HTTP/1.1\r\n"
               f"Host: {host}:{port}\r\nUpgrade: websocket\r\n"
               f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
               f"Sec-WebSocket-Version: 13\r\n\r\n")
        self.sock.sendall(req.encode())
        # read HTTP 101 response headers
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += self.sock.recv(4096)
        head, rest = buf.split(b"\r\n\r\n", 1)
        assert b"101" in head.split(b"\r\n")[0], head
        assert wsproto.accept_key(key).encode() in head
        if rest:
            self.packets += [p.decode() for op, p in self.parser.feed(rest)
                             if op == 0x1]

    def _pump(self, deadline):
        try:
            self.sock.settimeout(max(deadline - time.time(), 0.05))
            data = self.sock.recv(65536)
        except socket.timeout:
            return
        for op, p in self.parser.feed(data):
            if op == 0x1:
                self.packets.append(p.decode())

    def wait_packet(self, pred, timeout=5.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            for p in self.packets:
                if pred(p):
                    return p
            self._pump(deadline)
        raise TimeoutError(f"no packet matching; got {self.packets[-5:]}")

    def send_text(self, text: str):
        self.sock.sendall(wsproto.encode_frame(text.encode(), mask=True))

    def emit(self, event, data):
        self.send_text(wsproto.sio_event(event, data))

    def events(self, name):
        out = []
        for p in self.packets:
            evt = wsproto.parse_sio_event(p)
            if evt and evt[0] == name:
                out.append(evt[1][0] if evt[1] else None)
        return out

    def close(self):
        self.sock.close()


@pytest.fixture(scope="module")
def server():
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    cfg = EngineConfig()
    source = SyntheticSource(rig, Rs, ts, num_drones=1)
    eng = Engine(rig, cfg, source, CollectingLink())
    srv = MocapServer(eng, port=0)
    srv.start()
    yield srv, eng, source
    srv.stop()


def test_socketio_handshake_and_event_roundtrip(server):
    srv, eng, source = server
    c = SioClient("127.0.0.1", srv.port)
    c.wait_packet(lambda p: p.startswith("0{"))      # engine.io OPEN
    c.send_text("40")
    c.wait_packet(lambda p: p.startswith("40{"))     # socket.io ack

    # client -> server event flips an engine mode flag
    c.emit("capture-points", {"startOrStop": "start"})
    deadline = time.time() + 5
    while not eng.is_capturing_points and time.time() < deadline:
        time.sleep(0.02)
    assert eng.is_capturing_points

    # server -> client: engine emit reaches the websocket
    eng.process_frame(source.read(), 1 / 60)
    c.wait_packet(lambda p: p.startswith('42["image-points"'))
    eng.handle("capture-points", {"startOrStop": "stop"})
    c.close()


class PollingClient:
    """Engine.IO v4 HTTP long-polling client, speaking the DEFAULT
    socket.io-client handshake (polling first — the reference frontend's
    ``io("http://localhost:3001")`` at socket.ts:3 starts here)."""

    def __init__(self, host, port, timeout=10.0):
        self.host, self.port, self.timeout = host, port, timeout
        self.n = 0
        packets = self.get(sid=None)
        open_pkts = [p for p in packets if p.startswith("0")]
        assert open_pkts, packets
        self.handshake = json.loads(open_pkts[0][1:])
        self.sid = self.handshake["sid"]

    def _url(self, sid):
        self.n += 1
        url = f"/socket.io/?EIO=4&transport=polling&t=t{self.n}"
        return url + (f"&sid={sid}" if sid else "")

    def get(self, sid="default"):
        sid = self.sid if sid == "default" else sid
        conn = http.client.HTTPConnection(self.host, self.port,
                                          timeout=self.timeout)
        conn.request("GET", self._url(sid))
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        body = resp.read().decode()
        conn.close()
        return [p for p in body.split("\x1e") if p]

    def post(self, *packets):
        conn = http.client.HTTPConnection(self.host, self.port,
                                          timeout=self.timeout)
        conn.request("POST", self._url(self.sid), "\x1e".join(packets),
                     {"Content-Type": "text/plain; charset=UTF-8"})
        resp = conn.getresponse()
        body = resp.read()
        conn.close()
        return resp.status, body

    def wait_packet(self, pred, timeout=5.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            for p in self.get():
                if pred(p):
                    return p
        raise TimeoutError("no matching packet over polling")


def test_polling_default_client_handshake(server):
    """The unmodified reference client connects polling-first
    (socket.ts:3): open handshake, socket.io connect, event exchange both
    ways — all over plain HTTP GET/POST."""
    srv, eng, source = server
    c = PollingClient("127.0.0.1", srv.port)
    assert "websocket" in c.handshake["upgrades"]
    assert c.handshake["pingInterval"] > 0

    status, body = c.post("40")          # socket.io connect
    assert status == 200 and body == b"ok"
    ack = c.wait_packet(lambda p: p.startswith("40{"))
    assert json.loads(ack[2:])["sid"]

    # client -> server event through POST
    c.post(wsproto.sio_event("capture-points", {"startOrStop": "start"}))
    deadline = time.time() + 5
    while not eng.is_capturing_points and time.time() < deadline:
        time.sleep(0.02)
    assert eng.is_capturing_points

    # server -> client broadcast through long-poll GET
    eng.process_frame(source.read(), 1 / 60)
    c.wait_packet(lambda p: p.startswith('42["image-points"'))
    eng.handle("capture-points", {"startOrStop": "stop"})

    # heartbeat: client pong accepted
    status, body = c.post("3")
    assert status == 200

    # unknown sid is rejected
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=5)
    conn.request("GET", "/socket.io/?EIO=4&transport=polling&sid=nope")
    assert conn.getresponse().status == 400
    conn.close()
    c.post("1")                          # engine.io close


def test_polling_upgrade_to_websocket(server):
    """Full default-client flow: polling handshake -> sio connect ->
    probe/upgrade -> events ride the websocket afterwards."""
    srv, eng, source = server
    c = PollingClient("127.0.0.1", srv.port)
    c.post("40")
    c.wait_packet(lambda p: p.startswith("40{"))

    ws = SioClient("127.0.0.1", srv.port, query=f"&sid={c.sid}")
    ws.send_text("2probe")
    ws.wait_packet(lambda p: p == "3probe")
    # no second open packet on an upgrade connection
    assert not any(p.startswith("0{") for p in ws.packets)
    ws.send_text("5")                    # commit upgrade
    time.sleep(0.1)

    # post-upgrade: broadcasts arrive over the websocket...
    eng.emit("fps", {"fps": 42})
    ws.wait_packet(lambda p: (wsproto.parse_sio_event(p) or (None,))[0]
                   == "fps")
    # ...and a subsequent poll releases with the noop packet
    assert c.get() == ["6"]

    # client -> server events over the upgraded socket still dispatch
    ws.emit("locate-objects", {"startOrStop": "start"})
    deadline = time.time() + 5
    while not eng.is_locating_objects and time.time() < deadline:
        time.sleep(0.02)
    assert eng.is_locating_objects
    eng.handle("locate-objects", {"startOrStop": "stop"})
    ws.close()


def test_unknown_event_returns_server_error(server):
    srv, eng, source = server
    c = SioClient("127.0.0.1", srv.port)
    c.wait_packet(lambda p: p.startswith("0{"))
    c.send_text("40")
    c.wait_packet(lambda p: p.startswith("40{"))
    c.emit("bogus-event", {"x": 1})
    p = c.wait_packet(lambda p: p.startswith('42["server-error"'))
    assert "bogus-event" in p
    c.close()


def test_body_template_event_reaches_clients(server):
    """The webui's Learn-body button listens on('body-template'); the
    engine->client broadcast tuple must include it (advisor round-1
    finding: success/failure feedback never reached the browser)."""
    srv, eng, source = server
    c = SioClient("127.0.0.1", srv.port)
    c.wait_packet(lambda p: p.startswith("0{"))
    c.send_text("40")
    c.wait_packet(lambda p: p.startswith("40{"))
    eng.emit("body-template", {"error": "no frames captured"})
    c.wait_packet(lambda p: p.startswith('42["body-template"'))
    c.close()


def test_trajectory_planning_endpoint(server):
    srv, eng, source = server
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
    body = json.dumps({
        "waypoints": [
            [0, 0, 0.5, 1, 1, 0.5, True],
            [1, 0, 0.5, 0, 0, 0.5, True],
        ],
        "maxVel": [1.0, 1.0, 1.0],
        "maxAccel": [1.0, 1.0, 1.0],
        "maxJerk": [4.0, 4.0, 4.0],
        "timestep": 0.05,
    })
    conn.request("POST", "/api/trajectory-planning", body,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    data = json.loads(resp.read())
    sp = np.asarray(data["setpoints"])
    assert sp.shape[1] == 6
    np.testing.assert_allclose(sp[-1], [1, 0, 0.5, 0, 0, 0.5], atol=1e-6)
    conn.close()


def test_mjpeg_stream_yields_frames(server):
    srv, eng, source = server
    eng.process_frame(source.read(), 1 / 60)  # ensure a frame exists
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
    conn.request("GET", "/api/camera-stream")
    resp = conn.getresponse()
    assert resp.status == 200
    assert "multipart/x-mixed-replace" in resp.getheader("Content-Type")
    chunk = resp.read(16384)
    assert b"--frame" in chunk
    assert b"image/" in chunk
    conn.close()


def test_404(server):
    srv, eng, source = server
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
    conn.request("GET", "/definitely-not-here")
    assert conn.getresponse().status == 404
    conn.close()


def test_ui_decimation_thins_stream_events_only():
    """``ui_decimation=N`` forwards every Nth object-points/image-points
    to socket clients (the UI lever under batched serving); other events
    and in-process listeners keep full rate.  Default 1 = reference
    parity (the ``server`` fixture above asserts per-frame forwarding)."""
    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    source = SyntheticSource(rig, Rs, ts, num_drones=1)
    eng = Engine(rig, EngineConfig(), source, CollectingLink())
    srv = MocapServer(eng, port=0, ui_decimation=4)
    srv.start()
    try:
        c = SioClient("127.0.0.1", srv.port)
        c.wait_packet(lambda p: p.startswith("0{"))
        c.send_text("40")
        c.wait_packet(lambda p: p.startswith("40{"))

        inproc = []
        eng.on("image-points", inproc.append)
        eng.handle("capture-points", {"startOrStop": "start"})
        for _ in range(8):
            eng.process_frame(source.read(), 1 / 60)
        # in-process listener saw every frame
        assert len(inproc) == 8
        deadline = time.time() + 5
        while len(c.events("image-points")) < 2 and time.time() < deadline:
            c._pump(deadline)
        # socket client saw every 4th (frames 0 and 4)
        assert len(c.events("image-points")) == 2

        # non-stream events pass through undecimated
        for i in range(3):
            eng.emit("link-health", {"n": i})
        deadline = time.time() + 5
        while len(c.events("link-health")) < 3 and time.time() < deadline:
            c._pump(deadline)
        assert len(c.events("link-health")) == 3
        c.close()
    finally:
        srv.stop()
