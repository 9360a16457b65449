"""Counter-based PCG4D hash RNG (pure jnp — fuses into consumers).

jax.random's threefry costs ~26 ms per path-trace pass worth of uniforms at
800x608, and a separate Pallas hardware-PRNG kernel pays per-launch
pipeline overhead. PCG4D (Jarzynski & Olano, JCGT 2020 — public domain
construction) is ~12 int32 ops per value of pure elementwise work, so XLA
fuses it straight into the consuming kernel: effectively free, identical on
every backend, and high-quality enough for Monte-Carlo rendering (validated
by the furnace/NEE cross-estimator tests, which hold for any healthy RNG).

Stream layout: value = hash(pixel_x, pixel_y, draw_counter, seed) — fully
counter-based, so any slice of the image draws the same numbers (tile
sharding stays bit-identical to single-device).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

# numpy scalars (not jnp arrays): they trace as literals, so Pallas kernels
# can close over them without 'captured constants' errors
_M = np.uint32(1664525)
_A = np.uint32(1013904223)


def pcg4d(x, y, z, w):
    """PCG4D hash of four uint32 arrays -> four uint32 arrays."""
    x = x * _M + _A
    y = y * _M + _A
    z = z * _M + _A
    w = w * _M + _A
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _to_unit(u):
    """uint32 -> float32 in [0, 1) via the 24-bit mantissa scale.
    Mosaic can't cast uint32->f32; u>>8 < 2^24 is exact through int32."""
    u24 = jax.lax.bitcast_convert_type(u >> np.uint32(8), jnp.int32)
    return u24.astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def uniform_pcg(seed, ctr: jax.Array | int, n: int, h: int, w: int,
                row0=0, col0=0):
    """(n, h, w) float32 uniforms in [0,1), as a tuple of planes.

    seed: int32/uint32 scalar (traced ok); ctr: draw counter (traced ok) —
    distinct (seed, ctr) pairs give independent planes. Values are keyed by
    GLOBAL pixel coordinates (row0/col0 offset a window into the image), so
    any tiling/sharding of the image draws identical numbers — the property
    that lets the Pallas megakernel, the XLA path and shard_map bands all
    share one stream. Works inside Pallas kernels (pure elementwise jnp).
    """
    px = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    px = (px + col0).astype(jnp.uint32)
    py = (py + row0).astype(jnp.uint32)
    seed = jnp.asarray(seed).astype(jnp.uint32)
    ctr = jnp.asarray(ctr).astype(jnp.uint32)

    planes = []
    blocks = -(-n // 4)
    for b in range(blocks):
        zz = jnp.broadcast_to(ctr * jnp.uint32(blocks) + jnp.uint32(b), (h, w))
        ww = jnp.broadcast_to(seed, (h, w))
        o1, o2, o3, o4 = pcg4d(px, py, zz, ww)
        planes.extend([_to_unit(o1), _to_unit(o2), _to_unit(o3), _to_unit(o4)])
    return tuple(planes[:n])


def uniform_pcg_coords(seed, ctr, n: int, px, py):
    """Like uniform_pcg, but keyed by EXPLICIT int32 coordinate planes.

    The sorted wavefront permutes ray state between bounces; carrying each
    ray's original pixel coordinates through the permutation and hashing on
    them keeps the sample stream identical to the unsorted render, so
    sorting is a pure execution-order optimization (bit-identical images).
    """
    shape = px.shape
    px = px.astype(jnp.uint32)
    py = py.astype(jnp.uint32)
    seed = jnp.asarray(seed).astype(jnp.uint32)
    ctr = jnp.asarray(ctr).astype(jnp.uint32)

    planes = []
    blocks = -(-n // 4)
    for b in range(blocks):
        zz = jnp.broadcast_to(ctr * jnp.uint32(blocks) + jnp.uint32(b), shape)
        ww = jnp.broadcast_to(seed, shape)
        o1, o2, o3, o4 = pcg4d(px, py, zz, ww)
        planes.extend([_to_unit(o1), _to_unit(o2), _to_unit(o3), _to_unit(o4)])
    return tuple(planes[:n])
