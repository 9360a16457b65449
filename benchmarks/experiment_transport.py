"""Price ray-state TRANSPORT primitives for between-bounce regrouping.

The regroup model (experiment_regroup.py) says per-ray compact+oct
re-binning would roughly halve config-3's bounce-sweep arithmetic — but
the round-2/3 attempts measured NET NEGATIVE because the permutation
transport (one `jnp.take(flat, perm)` per state plane) cost more than
the sweeps saved. This script prices every transport formulation we can
build, on chip, at the bench shape (512^2 rays, 14 f32 state planes):

  elem_take     jnp.take(flat, perm) per plane          (the measured-bad one)
  sort_multi    ONE lax.sort call, key + all planes co-sorted
  argsort_take  jnp.argsort(key) then elem_take         (round-2 sort=True)
  page_take     (8,128)-page granularity: take whole pages along axis 0
  row_take      128-lane row granularity: take rows along axis 0
  cumsum_perm   permutation BUILD cost alone (alive-partition cumsums)
  scatter_back  flat .at[dest].set per plane (the un-permute)

Each timed over dependency-chained reps inside one jit. Writes
benchmarks/experiment_transport.json.

Usage: python benchmarks/experiment_transport.py [--size 512] [--planes 14]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, reps=12):
    out = jax.block_until_ready(fn(*args))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--planes", type=int, default=14)
    args = ap.parse_args()
    n = args.size * args.size
    K = args.planes
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.standard_normal((K, n), np.float32))
    # a realistic regroup permutation: random 22-bit keys (morton+oct)
    keys = jnp.asarray(rng.integers(0, 1 << 22, n, dtype=np.int32))
    perm = jnp.asarray(np.argsort(np.asarray(keys), kind="stable"))
    alive = jnp.asarray((rng.random(n) < 0.1).astype(np.float32))

    def chain(body, reps=12):
        @jax.jit
        def run(planes, keys, perm, alive):
            def step(i, carry):
                p = body(carry, keys, perm, alive)
                # dependency chain without changing shapes
                return p.at[0, 0].add(jnp.float32(1e-12))

            return jax.lax.fori_loop(0, reps, step, planes)

        return run

    results = {}

    def elem_take(p, keys, perm, alive):
        return jnp.stack([jnp.take(p[k], perm, axis=0) for k in range(K)])

    def sort_multi(p, keys, perm, alive):
        ops = [keys] + [p[k] for k in range(K)]
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        return jnp.stack(out[1:])

    def argsort_take(p, keys, perm, alive):
        pm = jnp.argsort(keys)
        return jnp.stack([jnp.take(p[k], pm, axis=0) for k in range(K)])

    def page_take(p, keys, perm, alive):
        pages = n // (8 * 128)
        v = p.reshape(K, pages, 8 * 128)
        pperm = perm[:pages] % pages  # page-count-sized perm (cost model)
        return jnp.take(v, pperm, axis=1).reshape(K, n)

    def row_take(p, keys, perm, alive):
        rows = n // 128
        v = p.reshape(K, rows, 128)
        rperm = perm[:rows] % rows
        return jnp.take(v, rperm, axis=1).reshape(K, n)

    def cumsum_perm(p, keys, perm, alive):
        # alive-partition + 8-octant sub-buckets: 9 cumsums + scatter
        key = jnp.where(alive != 0.0, keys & 7, 8)
        dest = jnp.zeros(n, jnp.int32)
        start = jnp.int32(0)
        for b in range(9):
            m = key == b
            c = jnp.cumsum(m.astype(jnp.int32))
            dest = jnp.where(m, start + c - 1, dest)
            start = start + c[n - 1]
        pm = jnp.zeros(n, jnp.int32).at[dest].set(
            jnp.arange(n, dtype=jnp.int32))
        return p.at[0, 0].add(pm[0].astype(jnp.float32) * 1e-20)

    def scatter_back(p, keys, perm, alive):
        return jnp.stack(
            [jnp.zeros(n, jnp.float32).at[perm].set(p[k]) for k in range(K)])

    for name, body in [("elem_take", elem_take), ("sort_multi", sort_multi),
                       ("argsort_take", argsort_take),
                       ("page_take", page_take), ("row_take", row_take),
                       ("cumsum_perm", cumsum_perm),
                       ("scatter_back", scatter_back)]:
        try:
            dt, _ = _time(chain(body), planes, keys, perm, alive)
            results[name] = round(dt * 1e3, 3)
            print(f"{name:14s} {dt*1e3:8.3f} ms  ({K} planes, {n} rays)")
        except Exception as e:  # pragma: no cover - survey tool
            results[name] = f"error: {type(e).__name__}: {e}"[:200]
            print(f"{name:14s} FAILED: {e}")

    out = dict(size=args.size, planes=K, ms=results,
               device=str(jax.devices()[0]))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "experiment_transport.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
