"""Replay determinism + video output (runtime/replay.py, utils/video.py)."""

import numpy as np
import pytest

from raytracing_engine_tpu.runtime import FrameLoop, InputEvent
from raytracing_engine_tpu.runtime.replay import (
    Recorder,
    event_from_dict,
    event_to_dict,
    load_replay,
    save_replay,
)
from raytracing_engine_tpu.utils.video import VideoWriter, read_y4m


def _events():
    return [
        InputEvent(move=(1.0, 0.0, 0.0), dt=0.02),
        InputEvent(rot=(0.0, 1.0), cursor=(3.0, -2.0), dt=0.016),
        InputEvent(),  # all defaults -> serializes to {}
        InputEvent(focus=False),
        InputEvent(focus=True, move=(0.0, -1.0, 1.0)),
        InputEvent(resize=(96, 64)),
        InputEvent(fullscreen_toggle=True),
        InputEvent(fullscreen_toggle=True),
        InputEvent(quit=True),
    ]


def test_event_roundtrip_sparse():
    for ev in _events():
        d = event_to_dict(ev)
        assert event_from_dict(d) == ev
    assert event_to_dict(InputEvent()) == {}


def test_replay_file_roundtrip(tmp_path):
    path = str(tmp_path / "session.replay")
    n = save_replay(path, _events())
    assert n == len(_events())
    assert load_replay(path) == _events()


def test_replay_rejects_other_files(tmp_path):
    path = str(tmp_path / "not_a_replay.json")
    with open(path, "w") as f:
        f.write('{"something": "else"}\n')
    with pytest.raises(ValueError):
        load_replay(path)


def test_recorder_passthrough(tmp_path):
    rec = Recorder()
    seen = list(rec.wrap(iter(_events())))
    assert seen == _events()
    path = str(tmp_path / "rec.replay")
    rec.save(path)
    assert load_replay(path) == _events()


def test_replayed_frames_bit_identical(tmp_path):
    """Same replay file -> bit-identical frames (pure-f32 camera math,
    counter-free renderer)."""
    import raytracing_engine_tpu as rt

    cfg = rt.RenderConfig(width=64, height=48)
    scene = rt.default_scene()
    events = [
        InputEvent(move=(1.0, 1.0, 0.0), cursor=(5.0, 2.0), dt=0.02),
        InputEvent(rot=(1.0, 0.0), dt=0.02),
        InputEvent(move=(0.0, -1.0, 1.0), dt=0.02),
    ]
    path = str(tmp_path / "s.replay")
    save_replay(path, events)

    def render_frames():
        loop = FrameLoop(cfg, scene)
        frames = []
        loop.run(load_replay(path), sink=lambda i, img: frames.append(img))
        return frames

    a = render_frames()
    b = render_frames()
    assert len(a) == len(events)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(fa, fb)


def test_y4m_roundtrip(tmp_path):
    path = str(tmp_path / "clip.y4m")
    rng = np.random.RandomState(0)
    frames = [rng.rand(32, 48, 3).astype(np.float32) for _ in range(3)]
    with VideoWriter(path, fps=24) as w:
        for f in frames:
            w.add(f)
    assert w.frames == 3
    got, fps = read_y4m(path)
    assert fps == 24
    assert got.shape == (3, 32, 48, 3)
    from raytracing_engine_tpu.utils.image import to_srgb_u8

    for f, g in zip(frames, got):
        # BT.601 8-bit round trip: within 3 LSB of the UNORM-quantized frame
        assert np.abs(g.astype(int) - to_srgb_u8(f).astype(int)).max() <= 3


def test_apng_roundtrip_exact(tmp_path):
    """APNG is LOSSLESS: the u8 pixel bytes round-trip exactly (unlike
    y4m's BT.601 quantization)."""
    from raytracing_engine_tpu.utils.video import ApngWriter, read_apng
    from raytracing_engine_tpu.utils.image import to_srgb_u8

    path = str(tmp_path / "clip.apng")
    rng = np.random.RandomState(1)
    frames = [rng.rand(24, 40, 3).astype(np.float32) for _ in range(4)]
    with ApngWriter(path, fps=25) as w:
        for f in frames:
            w.add(f)
    assert w.frames == 4
    got, fps = read_apng(path)
    assert fps == 25
    assert got.shape == (4, 24, 40, 3)
    for f, g in zip(frames, got):
        np.testing.assert_array_equal(g, to_srgb_u8(f))


def test_apng_rejects_resize(tmp_path):
    from raytracing_engine_tpu.utils.video import ApngWriter

    w = ApngWriter(str(tmp_path / "clip.apng"))
    w.add(np.zeros((16, 16, 3), np.uint8))
    with pytest.raises(ValueError):
        w.add(np.zeros((16, 32, 3), np.uint8))
    w.close()


def test_cli_orbit_apng(tmp_path):
    """End-to-end: CLI orbit -> one lossless animation file."""
    from raytracing_engine_tpu.cli import main
    from raytracing_engine_tpu.utils.video import read_apng

    path = str(tmp_path / "orbit.apng")
    main(["orbit", "--size", "64x48", "--frames", "2", "--chunk", "2",
          "--apng", path, "--fps", "30"])
    frames, fps = read_apng(path)
    assert frames.shape == (2, 48, 64, 3)
    assert fps == 30
    assert frames.max() > 0  # rendered something


def test_y4m_rejects_resize(tmp_path):
    path = str(tmp_path / "clip.y4m")
    w = VideoWriter(path)
    w.add(np.zeros((16, 16, 3), np.float32))
    with pytest.raises(ValueError):
        w.add(np.zeros((16, 32, 3), np.float32))
    w.close()


def test_cli_replay_fullscreen_focus_end_to_end(tmp_path):
    """End-to-end window-event parity through the CLI replay path: F11
    switches frames to the --monitor resolution and back (borderless
    toggle, src/main.rs:689-696), focus-lost freezes frames (:711-717,
    :726). Exercises the chunked (cfg-grouped) dispatch path too."""
    from raytracing_engine_tpu.cli import main
    from raytracing_engine_tpu.utils.image import read_png

    rpath = str(tmp_path / "s.replay")
    save_replay(rpath, [
        InputEvent(move=(1.0, 0.0, 0.0), dt=0.02),   # 0: windowed 64x48
        InputEvent(fullscreen_toggle=True),           # 1: -> monitor 96x64
        InputEvent(focus=False),                      # frozen: no frame
        InputEvent(focus=True, rot=(0.0, 1.0)),       # 3: still fullscreen
        InputEvent(fullscreen_toggle=True),           # 4: -> windowed again
    ])
    out = str(tmp_path / "frames")
    main(["replay", rpath, "--size", "64x48", "--monitor", "96x64",
          "--out", out, "--chunk", "4"])
    import os

    names = sorted(os.listdir(out))
    assert names == [f"frame_{i:04d}.png" for i in (0, 1, 3, 4)]
    sizes = {n: read_png(os.path.join(out, n)).shape[:2] for n in names}
    assert sizes["frame_0000.png"] == (48, 64)
    assert sizes["frame_0001.png"] == (64, 96)
    assert sizes["frame_0003.png"] == (64, 96)
    assert sizes["frame_0004.png"] == (48, 64)


def test_cli_replay_y4m(tmp_path):
    """End-to-end: CLI replay -> y4m with one frame per non-frozen event."""
    from raytracing_engine_tpu.cli import main

    rpath = str(tmp_path / "s.replay")
    save_replay(rpath, [
        InputEvent(move=(1.0, 0.0, 0.0), dt=0.02),
        InputEvent(rot=(0.0, 1.0), dt=0.02),
    ])
    vpath = str(tmp_path / "out.y4m")
    main(["replay", rpath, "--size", "64x48", "--y4m", vpath, "--fps", "30"])
    frames, fps = read_y4m(vpath)
    assert frames.shape == (2, 48, 64, 3)
    assert fps == 30
