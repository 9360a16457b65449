"""Live-serving demo on chip: a scripted wire-driven session at 1080p.

Proves the reference's interactive loop (input -> camera integrate ->
render -> present, /root/reference/src/main.rs:721-928) end-to-end at
interactive rates OVER THE WIRE: starts runtime/live.LiveFrameServer on
loopback, drives a scripted fly-through (WASD + mouse-look exactly like
the browser viewer would emit), and records the full round-trip per
frame — HTTP parse + event integrate + jitted cone-march render on the
TPU + PNG encode + response.

Writes benchmarks/live_demo.json (same committed-artifact pattern as
ab_instanced_orders.json) and appends a history.jsonl record.

Usage: python benchmarks/live_demo.py [--size 1920x1080] [--frames 120]
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    from raytracing_engine_tpu.config import RenderConfig
    from raytracing_engine_tpu.runtime.frame import FrameLoop
    from raytracing_engine_tpu.runtime.live import LiveFrameServer
    from raytracing_engine_tpu.scene import default_scene

    import jax

    cfg = RenderConfig(width=w, height=h)
    srv = LiveFrameServer(FrameLoop(cfg, default_scene()))
    print(f"serving {w}x{h} at {srv.url} "
          f"(backend={jax.default_backend()})")

    def step(ev: dict):
        t0 = time.perf_counter()
        req = urllib.request.Request(
            srv.url + "/step", data=json.dumps(ev).encode(), method="POST")
        with urllib.request.urlopen(req) as r:
            body = r.read()
            code = r.status
        return (time.perf_counter() - t0) * 1e3, code, len(body)

    # scripted fly-through: the same event mix a human at the browser
    # viewer produces — walk forward, strafe, mouse-look arcs
    DT = 1.0 / 60.0
    session = []
    for i in range(args.frames):
        phase = i % 40
        ev = {"dt": DT}
        if phase < 15:
            ev["move"] = [0, 1, 0]              # W: walk forward
        elif phase < 25:
            ev["move"] = [1, 0, 0]              # D: strafe
            ev["cursor"] = [6.0, 0.0]           # mouse-look right
        else:
            ev["move"] = [0, 0, 0]
            ev["cursor"] = [-4.0, 1.5]          # look back + slight down
        session.append(ev)

    # warmup (first step compiles the jitted frame fn)
    t_compile, code, nbytes = step({"dt": DT})
    assert code == 200, code
    print(f"first frame (compile): {t_compile:.0f} ms, {nbytes} B png")

    # component breakdown OUTSIDE the wire path (same loop/lock objects):
    # device render+u8 fetch vs PNG encode — says where wire ms goes
    import numpy as np

    from raytracing_engine_tpu.runtime.frame import InputEvent
    from raytracing_engine_tpu.utils.image import encode_png

    t0 = time.perf_counter()
    dev = srv.loop.step(InputEvent(move=(0, 1, 0), dt=DT))
    u8 = np.asarray(jax.block_until_ready(srv._to_u8(dev)))
    t_fetch = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    png = encode_png(u8, level=1)
    t_enc = (time.perf_counter() - t0) * 1e3
    print(f"breakdown: render+u8-fetch {t_fetch:.0f} ms, "
          f"encode(level=1) {t_enc:.0f} ms, png {len(png)} B")

    lat = []
    for ev in session:
        ms, code, nbytes = step(ev)
        assert code == 200, code
        lat.append(ms)
    lat_sorted = sorted(lat)
    med = statistics.median(lat)
    p95 = lat_sorted[int(0.95 * len(lat_sorted))]
    mean = statistics.fmean(lat)
    print(f"{len(lat)} wire frames @{w}x{h}: median {med:.1f} ms "
          f"({1e3 / med:.1f} fps), mean {mean:.1f}, p95 {p95:.1f}")

    # determinism spot-check: state advanced exactly len(session)+1 frames
    with urllib.request.urlopen(srv.url + "/state") as r:
        state = json.loads(r.read())
    assert state["frame"] == len(session), state
    srv.close()

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
        text=True).stdout.strip()
    rec = {
        "experiment": "live_demo",
        "commit": commit,
        "date": time.strftime("%Y-%m-%d"),
        "backend": jax.default_backend(),
        "size": [w, h],
        "frames": len(lat),
        "first_frame_compile_ms": round(t_compile, 1),
        "render_u8_fetch_ms": round(t_fetch, 1),
        "encode_ms": round(t_enc, 1),
        "wire_ms_median": round(med, 2),
        "wire_ms_mean": round(mean, 2),
        "wire_ms_p95": round(p95, 2),
        "fps_median": round(1e3 / med, 1),
        "note": "full loopback HTTP round-trip per frame: event parse + "
                "camera integrate + jitted cone-march on TPU + PNG encode "
                "+ response; scripted WASD/mouse fly-through "
                "(src/main.rs:721-928 semantics, transport-independent)",
    }
    out = args.out or os.path.join(os.path.dirname(__file__),
                                   "live_demo.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}")
    try:
        from history import append_history
        append_history("live_demo", rec)
    except Exception as e:  # history append is best-effort
        print(f"history append skipped: {e}")


if __name__ == "__main__":
    main()
