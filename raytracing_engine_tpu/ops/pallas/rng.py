"""Pallas hardware-PRNG uniform planes.

jax.random's threefry costs ~26 ms per 120 (608, 800) planes on a v5e —
that was ~75% of a whole path-trace pass. The TPU has a hardware PRNG
(pltpu.prng_random_bits); this kernel seeds it per tile from (seed, plane,
tile) and emits uniforms in [0, 1) at near memory speed.

Stream properties: deterministic for a given (seed, shape, tiling);
NOT the threefry stream — integrator tests that rely on physics invariants
(furnace, NEE-vs-brute) hold for any healthy RNG, and the PT configs select
the implementation explicitly (PTConfig.rng).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rng_kernel(seed_ref, out_ref, *, tile_h, tile_w):
    n = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    # distinct stream per (plane, tile): mix grid coords into the seed
    # golden-ratio-style mixing constants as two's-complement int32 literals
    mix = (
        seed_ref[0]
        + n * jnp.int32(-1640531527)   # 0x9E3779B9
        + i * jnp.int32(-2048144789)   # 0x85EBCA6B
        + j * jnp.int32(-1028477387)   # 0xC2B2AE35
    )
    pltpu.prng_seed(mix)
    bits = pltpu.prng_random_bits((tile_h, tile_w))
    # 24-bit mantissa trick: uniform in [0, 1)
    u24 = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)
    )
    # Mosaic can't cast uint32->f32 directly; u24 < 2^24 fits int32 exactly
    u24i = pltpu.bitcast(u24, jnp.int32)
    out_ref[0] = u24i.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


@functools.partial(
    jax.jit, static_argnames=("n", "h", "w", "interpret", "tile")
)
def uniform_planes(seed, n: int, h: int, w: int, interpret=None,
                   tile=(16, 256)):
    """(n, h, w) float32 uniforms in [0,1) from an int32 scalar seed.

    On non-TPU backends (interpret mode) the TPU PRNG primitives don't
    exist; a threefry emulation with the same API stands in. The stream
    therefore differs across backends — callers must not rely on
    cross-backend bit equality (physics tests don't).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        key = jax.random.fold_in(
            jax.random.PRNGKey(0), jnp.asarray(seed, jnp.int32).astype(jnp.uint32)
        )
        return jax.random.uniform(key, (n, h, w), jnp.float32)
    from raytracing_engine_tpu.ops.pallas.common import pick_tile

    tile_h, tile_w = pick_tile(h, w, *tile)
    grid = (n, h // tile_h, w // tile_w)
    kernel = functools.partial(_rng_kernel, tile_h=tile_h, tile_w=tile_w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, tile_h, tile_w),
                               lambda n, i, j: (n, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1))


def key_to_seed(key) -> jnp.ndarray:
    """Derive an int32 seed scalar from a jax PRNG key (any impl)."""
    data = jax.random.key_data(key).astype(jnp.uint32).ravel()
    s = jnp.uint32(0)
    for i in range(data.shape[0]):
        s = s ^ (data[i] * jnp.uint32(2654435761))
    return pltpu_safe_int32(s)


def pltpu_safe_int32(u):
    return jax.lax.bitcast_convert_type(u, jnp.int32)
