"""Perf-regression gate: fail loudly when a fresh chip measurement regresses
more than --tol (default 10%) against the median of the last N quiet-chip
records in benchmarks/history.jsonl.

Round-3 verdict item: the history discipline recorded drift (headline band
±6-24% environmental across reruns with zero code changes) but nothing
FAILED when a real regression landed on a quiet chip. This gate is that
check. Two metrics:

  headline   1080p cone-march Mrays/s (bench.py methodology, fresh run)
  config3    70k-tri 2-bounce+NEE frame ms at 512^2 (time_config3 scene,
             best engine: rebin)

Median-of-last-3 absorbs single-record drift; --tol covers the residual
band. Exit code 1 on regression (CI-able: `make gate`). Fresh measurements
are appended to the history like every other benchmark run.

Usage: python benchmarks/gate.py [--tol 0.10] [--skip config3|headline]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from history import HISTORY, append_history  # noqa: E402


def _records(path=HISTORY):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def history_medians(n=3, path=HISTORY):
    """(headline_mrays_median, config3_ms_median) over the last n records
    that carry each metric (from `headline`, `gate` and `run_all` rows)."""
    heads, cfg3s = [], []
    for rec in _records(path):
        if rec.get("kind") in ("headline", "gate") and "mrays" in rec:
            heads.append(float(rec["mrays"]))
        if rec.get("kind") == "gate" and "config3_ms" in rec:
            cfg3s.append(float(rec["config3_ms"]))
        if rec.get("kind") == "run_all":
            r = rec.get("results", {})
            if "headline_1080p_conemarch" in r:
                heads.append(float(r["headline_1080p_conemarch"]["mrays"]))
            if "config3_70ktri_bvh" in r:
                cfg3s.append(float(r["config3_70ktri_bvh"]["frame_ms"]))
    med = lambda xs: statistics.median(xs[-n:]) if xs else None
    return med(heads), med(cfg3s)


def measure_headline():
    from bench import bench_conemarch

    mrays, _frame_s = bench_conemarch()
    return mrays


def measure_config3():
    import jax
    import jax.numpy as jnp

    from run_all import config3_scene
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_rebin

    _, bvh, scene, cfg, _ = config3_scene(size=512)
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(1)

    def run(z):
        img, _ = render_pt_rebin(cfg, scene, jnp.array([0.0, 0.0, z]), quat,
                                 1, key, bvh=bvh)
        return img

    img = jax.block_until_ready(run(0.0))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        chain = jnp.float32(0.0)
        for i in range(4):
            img = run(1e-4 * i + chain)
            chain = img[0, 0, 0] * 0.0
        float(img[0, 0, 0])  # fetch — block alone is unreliable over axon
        best = min(best, (time.perf_counter() - t0) / 4)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=0.10)
    ap.add_argument("--skip", action="append", default=[],
                    choices=["headline", "config3"])
    args = ap.parse_args()
    head_med, cfg3_med = history_medians()
    failures = []
    payload = {}

    if "headline" not in args.skip:
        mrays = measure_headline()
        payload["mrays"] = round(mrays, 2)
        if head_med is None:
            print(f"headline: {mrays:.1f} Mrays/s (no history — recording)")
        else:
            floor = head_med * (1.0 - args.tol)
            verdict = "OK" if mrays >= floor else "REGRESSION"
            print(f"headline: {mrays:.1f} Mrays/s vs median {head_med:.1f} "
                  f"(floor {floor:.1f}) -> {verdict}")
            if mrays < floor:
                failures.append("headline")

    if "config3" not in args.skip:
        ms = measure_config3()
        payload["config3_ms"] = round(ms, 2)
        if cfg3_med is None:
            print(f"config3: {ms:.1f} ms (no history — recording)")
        else:
            ceil = cfg3_med * (1.0 + args.tol)
            verdict = "OK" if ms <= ceil else "REGRESSION"
            print(f"config3: {ms:.1f} ms vs median {cfg3_med:.1f} "
                  f"(ceiling {ceil:.1f}) -> {verdict}")
            if ms > ceil:
                failures.append("config3")

    append_history("gate", {**payload, "tol": args.tol,
                            "failures": failures})
    if failures:
        print(f"GATE FAILED: {failures}")
        sys.exit(1)
    print("gate ok")


if __name__ == "__main__":
    main()
