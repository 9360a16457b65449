"""Price per-lane compaction via MXU one-hot dispatch for config 3.

The committed roofline (instrument_config3.py) shows the config-3 frame
is ~96% arithmetic at ~92% of the rate the chip sustains on the ops the
sweep ISSUES, and that the remaining waste is per-LANE: a touched
sub-block's triangle batch issues over all 4096 tile lanes though only
~0.1-1% of (block, lane) pairs are useful. Every transport-style fix
measured negative (between-bounce regroup, row groups — see ROADMAP).

The one mechanism left is MoE-style one-hot dispatch on the MXU — the
standard TPU answer to "gather by per-lane index", since Mosaic has no
per-lane dynamic addressing. Two formulations:

  A. data->lane: per round, each lane selects ITS k-th candidate
     sub-block's triangle batch (14 rows x SUB_TRIS ~= 112 f32) via
     onehot(4096 x K) @ rows(K x 112), K = touched sub-blocks per tile.
  B. lane->block (dual): compact the useful (block, lane) pairs into a
     dense ray list via onehot(N x 4096) @ rays(4096 x 8), test densely,
     scatter-min results back with the transposed one-hot.

This script MEASURES the two primitives on the real chip — the selection
matmul (bf16 and exact-f32/HIGHEST, since bit-exact row selection needs
the 3-pass f32 decomposition) and the one-hot construction
(iota == idx broadcast compare) — then prices both formulations with the
committed per-sweep counts (instrument_config3.json) against the
lane-issue they would save. Output: a verdict table + experiment_onehot
.json. Run on TPU; falls back to pricing-only from cached timings
(--no-measure) elsewhere.

Usage: python benchmarks/experiment_onehot.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
LANES = 32 * 128          # config-3 tile
SUB_TRIS = 32             # tris per sub-block gate (accel/clusters.py SUBS)
ROWS_PER_BATCH = 14 * SUB_TRIS  # BW rows x tris = f32 per candidate batch
RAY_PLANES = 8            # o(3) d(3) t(1) slot(1) for formulation B
OPS_TEST = 30             # VPU ops per lane per TRIANGLE test (roofline)


def _time(fn, *args, iters=8):
    """Median-of-iters steady-state seconds for jitted fn(*args).

    Times input-fresh dispatches (new data each call via a donated-free
    scale bump) and forces a fetch, per the repo timing-honesty rules.
    """
    out = jax.block_until_ready(fn(*args))  # compile
    del out
    best = []
    for i in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        float(jnp.ravel(r if not isinstance(r, tuple) else r[0])[0])
        best.append(time.perf_counter() - t0)
    return float(np.median(best))


@functools.partial(jax.jit, static_argnames=("reps", "prec"))
def _sel_chain(onehot, data, reps: int, prec: str):
    """reps chained selection matmuls (output feeds a cheap update so XLA
    cannot collapse the chain)."""
    acc = jnp.zeros((onehot.shape[0], data.shape[1]), jnp.float32)

    def body(i, acc):
        y = jax.lax.dot_general(
            onehot, data, (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)
        return acc + y * (1.0 + i * 1e-9)

    return jax.lax.fori_loop(0, reps, body, acc)


@functools.partial(jax.jit, static_argnames=("reps", "k"))
def _onehot_build_chain(idx, reps: int, k: int):
    """reps rounds of one-hot construction: (N,1) idx vs (1,K) iota."""
    iota = jnp.arange(k, dtype=jnp.int32)[None, :]

    def body(i, acc):
        oh = (idx[:, None] + (i % 2) == iota).astype(jnp.float32)
        return acc + oh.sum()

    return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))


def measure(quick=False):
    key = jax.random.PRNGKey(0)
    reps = 4 if quick else 16
    res = {"device": str(jax.devices()[0])}

    # A-shape: (LANES x K) @ (K x 112) — selection of triangle batches.
    for k in (1024, 4096):
        oh = jnp.zeros((LANES, k), jnp.bfloat16).at[:, 0].set(1)
        data = jax.random.normal(key, (k, ROWS_PER_BATCH), jnp.bfloat16)
        dt = _time(_sel_chain, oh, data, reps, "default") / reps
        res[f"A_bf16_K{k}_s"] = dt
        ohf = oh.astype(jnp.float32)
        dataf = data.astype(jnp.float32)
        dtf = _time(_sel_chain, ohf, dataf, reps, "highest") / reps
        res[f"A_f32hi_K{k}_s"] = dtf
        print(f"A select (4096x{k})@({k}x112): bf16 {dt*1e6:8.1f} us  "
              f"f32/HIGHEST {dtf*1e6:8.1f} us per round")

    # B-shape: (N x 4096) @ (4096 x 8) — ray gather to dense list.
    for n in (8192, 65536):
        oh = jnp.zeros((n, LANES), jnp.bfloat16).at[:, 0].set(1)
        data = jax.random.normal(key, (LANES, RAY_PLANES), jnp.bfloat16)
        dt = _time(_sel_chain, oh, data, reps, "default") / reps
        res[f"B_bf16_N{n}_s"] = dt
        dtf = _time(_sel_chain, oh.astype(jnp.float32),
                    data.astype(jnp.float32), reps, "highest") / reps
        res[f"B_f32hi_N{n}_s"] = dtf
        print(f"B gather ({n}x4096)@(4096x8):  bf16 {dt*1e6:8.1f} us  "
              f"f32/HIGHEST {dtf*1e6:8.1f} us per round")

    # One-hot construction: N x K compares.
    idx = jax.random.randint(key, (65536,), 0, 4096, jnp.int32)
    dt = _time(_onehot_build_chain, idx, reps, 4096) / reps
    res["onehot_build_64kx4096_s"] = dt
    print(f"one-hot build 64k x 4096 compares: {dt*1e6:8.1f} us per round")
    return res


def price(res):
    """Combine measured primitive costs with the committed sweep counts."""
    inst = json.load(open(os.path.join(HERE, "instrument_config3.json")))
    fit = inst["fit"]
    ms_per_top = 1e3 / fit["sustained_top_s"]
    tiles = 64

    table = []
    tot_save = tot_a = tot_b = 0.0
    for name, sw in inst["sweeps"].items():
        if "@tile" in name or name.startswith(("closest_b0", "shadow_b0")):
            continue  # b0 is coherent; compaction targets b1+
        tests = sw["tests"]                  # issued triangle tests (batches*32)
        useful = sw["useful_lane_tests"]     # useful lane-triangle tests
        pairs = useful / SUB_TRIS            # useful (block, lane) pairs
        issued_ms = tests * LANES * OPS_TEST / 1e12 * ms_per_top
        dense_ms = useful * OPS_TEST / 1e12 * ms_per_top
        save_ms = issued_ms - dense_ms

        # A: rounds/tile >= avg candidate batches per lane (floor: assumes
        # zero divergence in list lengths — real max-per-lane is higher).
        k_per_tile = tests / SUB_TRIS / tiles        # touched blocks/tile
        rounds_a = max(1.0, pairs / max(sw["lanes"], 1))
        # scale measured K=4096 cost linearly in K (MXU flops dominate)
        a_round = res["A_f32hi_K4096_s"] * (k_per_tile / 4096.0)
        a_ms = rounds_a * tiles * a_round * 1e3
        # B: gather useful pairs (ray planes) + scatter-back (t, idx) with
        # the transposed one-hot (~2/8 of planes) + one-hot construction.
        n_sel = pairs / tiles
        b_gather = res["B_f32hi_N65536_s"] * (n_sel / 65536.0)
        b_build = res["onehot_build_64kx4096_s"] * (n_sel / 65536.0)
        b_ms = tiles * (b_gather * (1 + 2 / RAY_PLANES) + b_build) * 1e3
        table.append((name, issued_ms, save_ms, a_ms, b_ms))
        tot_save += save_ms
        tot_a += a_ms
        tot_b += b_ms

    print(f"\n{'sweep':14s} {'issued':>8s} {'max save':>9s} "
          f"{'A cost':>8s} {'B cost':>8s}   (ms, config-3 totals)")
    for name, issued, save, a, b in table:
        print(f"{name:14s} {issued:8.1f} {save:9.1f} {a:8.1f} {b:8.1f}")
    print(f"{'TOTAL':14s} {'':8s} {tot_save:9.1f} {tot_a:8.1f} {tot_b:8.1f}")
    verdict = ("REJECTED: selection costs exceed or wash the savings"
               if min(tot_a, tot_b) > 0.6 * tot_save else
               "REVISIT: formulation "
               + ("A" if tot_a < tot_b else "B") + " prices under savings")
    print("verdict:", verdict)
    return {"rows": [{"sweep": n, "issued_ms": round(i, 1),
                      "max_save_ms": round(s, 1), "A_ms": round(a, 1),
                      "B_ms": round(b, 1)} for n, i, s, a, b in table],
            "total_max_save_ms": round(tot_save, 1),
            "total_A_ms": round(tot_a, 1), "total_B_ms": round(tot_b, 1),
            "verdict": verdict}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--no-measure", action="store_true",
                    help="price from cached timings in experiment_onehot.json")
    args = ap.parse_args()
    out_path = os.path.join(HERE, "experiment_onehot.json")
    if args.no_measure:
        res = json.load(open(out_path))["measured"]
    else:
        res = measure(args.quick)
    pricing = price(res)
    with open(out_path, "w") as f:
        json.dump({"measured": res, "pricing": pricing}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
