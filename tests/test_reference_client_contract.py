"""Conformance against the GENUINE reference frontend client's source.

The ideal check — executing the reference's own ``socket.io-client``
against this server — is impossible in this image: there is no node
binary anywhere on the filesystem and the reference checkout has no
installed ``node_modules`` (and no egress to fetch them).  This file is
the strongest available substitute: the contract is EXTRACTED
MECHANICALLY from the reference client's source at test time —

- every event the client emits (``socket.emit(...)`` in
  ``computer_code/src/App.tsx``) must have a handler here;
- every event the client subscribes to (``socket.on(...)``) must be
  emitted by this server, carrying every field the handler body
  dereferences (``data["..."]``), with the nested element fields the 3D
  components destructure (``Objects.tsx:19``, ``chart.tsx:192-226``);

so if the client's expectations change — or this server stops
satisfying them — the test breaks.  The wire protocol the real client
speaks (Engine.IO v4 polling-first handshake, probe/upgrade dance,
heartbeats) is separately conformance-tested in ``tests/test_server.py``
with both transports.
"""

import pathlib
import re
import time

import numpy as np
import pytest

from low_cost_mocap_tpu.config import EngineConfig
from low_cost_mocap_tpu.runtime.engine import (Engine,
                                               camera_poses_to_serializable)
from low_cost_mocap_tpu.runtime.serial_link import CollectingLink
from low_cost_mocap_tpu.runtime.server import MocapServer
from low_cost_mocap_tpu.runtime.sources import SyntheticSource
from low_cost_mocap_tpu.utils import synthetic as syn

REF_SRC = pathlib.Path("/root/reference/computer_code/src")

pytestmark = pytest.mark.skipif(not REF_SRC.exists(),
                                reason="reference checkout not present")


def _app_tsx() -> str:
    return (REF_SRC / "App.tsx").read_text()


def client_emitted_events() -> set:
    """Event names the reference client sends (App.tsx socket.emit)."""
    return set(re.findall(r'socket\.emit\("([\w-]+)"', _app_tsx()))


def client_listened_events() -> set:
    """Event names the reference client subscribes to (socket.on)."""
    return set(re.findall(r'socket\.on\("([\w-]+)"', _app_tsx()))


def handler_required_fields(event: str) -> set:
    """Fields the client's handler body dereferences as data["..."]."""
    src = _app_tsx()
    i = src.index(f'socket.on("{event}"')
    body = src[i:]
    stop = body.find("socket.off")
    if stop > 0:
        body = body[:stop]
    return set(re.findall(r'data\[\"([\w_]+)\"\]', body))


def filtered_object_fields() -> set:
    """Element fields of ``filtered_objects`` the components consume:
    the Objects.tsx destructure plus chart.tsx's indexing."""
    objects_tsx = (REF_SRC / "components" / "Objects.tsx").read_text()
    chart_tsx = (REF_SRC / "components" / "chart.tsx").read_text()
    m = re.search(r"objects\.forEach\(\(\{([^}]*)\}", objects_tsx)
    fields = {f.strip() for f in m.group(1).split(",")} if m else set()
    fields |= set(re.findall(r'lastFilteredPoint\[\"(\w+)\"\]', chart_tsx))
    fields |= {"droneIndex"} if "droneIndex" in chart_tsx else set()
    return fields


def test_every_client_emitted_event_has_a_handler():
    emitted = client_emitted_events()
    assert len(emitted) >= 11, emitted   # the reference's 13-event surface
    for ev in emitted:
        name = "handle_" + ev.replace("-", "_")
        assert hasattr(Engine, name), f"no handler for client event {ev!r}"


def test_every_client_subscribed_event_is_emitted_by_this_server():
    listened = client_listened_events()
    assert {"image-points", "object-points", "camera-pose",
            "to-world-coords-matrix", "fps"} <= listened, listened
    sources = "".join(
        p.read_text() for p in [
            pathlib.Path("low_cost_mocap_tpu/runtime/engine.py"),
            pathlib.Path("low_cost_mocap_tpu/runtime/server.py"),
        ])
    for ev in listened:
        assert f'"{ev}"' in sources, f"server never emits {ev!r}"


def test_live_payload_shapes_satisfy_the_client_source():
    """Drive the full capture → triangulate → locate loop and check each
    received payload against the field set parsed from App.tsx."""
    from tests.test_server import SioClient

    Rs, ts, rig = syn.ring_rig(num_cameras=4)
    source = SyntheticSource(rig, Rs, ts, num_drones=1)
    eng = Engine(rig, EngineConfig(), source, CollectingLink())
    srv = MocapServer(eng, port=0)
    srv.start()
    try:
        c = SioClient("127.0.0.1", srv.port)
        c.wait_packet(lambda p: p.startswith("0{"))
        c.send_text("40")
        c.wait_packet(lambda p: p.startswith("40{"))

        # capture only first: image-points is emitted in this mode alone
        # (reference helpers.py:91-92 skips it once triangulation starts)
        c.emit("capture-points", {"startOrStop": "start"})
        deadline = time.time() + 5
        while not eng.is_capturing_points and time.time() < deadline:
            time.sleep(0.02)
        eng.process_frame(source.read(), 1 / 60)
        c.wait_packet(lambda p: p.startswith('42["image-points"'))
        # client JSON.stringify's the whole payload — it must be the
        # per-camera points list the reference emits (one [x, y] per
        # camera, helpers.py:91-92)
        ip = c.events("image-points")[-1]
        assert isinstance(ip, list) and len(ip) == rig.num_cameras

        c.emit("triangulate-points", {
            "startOrStop": "start",
            "cameraPoses": camera_poses_to_serializable(Rs, ts),
            "toWorldCoordsMatrix": np.eye(4).tolist()})
        c.emit("locate-objects", {"startOrStop": "start"})
        deadline = time.time() + 5
        while not (eng.is_locating_objects and eng.is_triangulating_points
                   ) and time.time() < deadline:
            time.sleep(0.02)
        assert eng.is_locating_objects

        for _ in range(3):
            eng.process_frame(source.read(), 1 / 60)
        c.wait_packet(lambda p: p.startswith('42["object-points"'))

        # object-points: every field the App.tsx handler dereferences
        payload = c.events("object-points")[-1]
        for field in handler_required_fields("object-points"):
            assert field in payload, (field, sorted(payload))
        assert len(payload["object_points"]) == len(payload["errors"])
        # filtered_objects elements: fields the components destructure
        assert payload["filtered_objects"], "tracker produced no objects"
        need = filtered_object_fields()
        assert {"pos", "heading", "droneIndex"} <= need  # parsed, not guessed
        for el in payload["filtered_objects"]:
            for field in need:
                assert field in el, (field, sorted(el))
            assert len(el["pos"]) == 3 and len(el["vel"]) == 3
            assert isinstance(el["droneIndex"], int)

        # to-world-coords-matrix: emitted on set-origin (index.py:197-210)
        c.emit("set-origin", {
            "objectPoint": [0.1, 0.2, 0.3],
            "toWorldCoordsMatrix": np.eye(4).tolist()})
        c.wait_packet(lambda p: p.startswith('42["to-world-coords-matrix"'))
        m = c.events("to-world-coords-matrix")[-1]
        for field in handler_required_fields("to-world-coords-matrix"):
            assert field in m, (field, sorted(m))
        assert np.asarray(m["to_world_coords_matrix"]).shape == (4, 4)

        # fps: emitted by the capture loop (index.py:48-50); the engine
        # loop isn't running here, so emit via the engine's own path
        eng.emit("fps", {"fps": 60})
        c.wait_packet(lambda p: p.startswith('42["fps"'))
        for field in handler_required_fields("fps"):
            assert field in c.events("fps")[-1]

        c.close()
    finally:
        srv.stop()
