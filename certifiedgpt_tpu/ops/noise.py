"""Fused Monte-Carlo noise injection (Pallas TPU kernel).

The certification hot loop tiles one clean image to a large noise batch
and perturbs every copy (ref ``smoothing.py:81-99`` does
``x.repeat((B,1,1,1)) + randn*sigma`` on CUDA — two full HBM batch
round-trips). This kernel fuses tile + sample + add into a single pass:
each grid program holds the clean image in VMEM, draws Gaussian noise
with the on-core PRNG (Box-Muller over ``prng_random_bits``), and writes
its noisy copy to HBM exactly once. The batch is written once and read
once by the ViT's patch embedding — the bandwidth floor for this op.

Noise is added in the processor's normalized space, matching where the
reference applies both train noise and certification noise (processor
output; SURVEY.md §2.6/2.4).

A pure-XLA fallback (`_noisy_tile_xla`) keeps CPU tests and non-TPU
backends working; ``noisy_tile`` dispatches on the default backend.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TWO_PI = 2.0 * np.pi


def _uniform_from_bits(shape):
    """Uniform (0, 1] fp32 from raw PRNG bits.

    Mosaic has no uint32->float32 cast; build a float in [1, 2) by
    stuffing 23 random mantissa bits under a fixed exponent, then shift
    to (0, 1] as ``2 - x`` (avoids an exact 0 for the log).
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    mantissa = bits >> 9  # keep 23 bits
    one_to_two = pltpu.bitcast(
        mantissa | jnp.uint32(0x3F800000), jnp.float32
    )
    return 2.0 - one_to_two


def _gaussian_from_bits(shape):
    """Box-Muller transform over raw PRNG bits -> N(0,1) fp32."""
    u1 = _uniform_from_bits(shape)
    u2 = _uniform_from_bits(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _noise_kernel(seed_ref, x_ref, out_ref, *, sigma: float):
    draw = pl.program_id(0)
    # seed with (key-word-0, key-word-1, draw): two independent 32-bit
    # words give each image a 64-bit stream id, so two images' draw
    # windows cannot overlap the way ``seed + draw`` windows could
    # (image B's base seed landing inside image A's [s, s+n) range made
    # rows of two certificates byte-identical — the exact correlation
    # agents.certify.certify_seed exists to prevent)
    pltpu.prng_seed(seed_ref[0], seed_ref[1], draw)
    out_ref[0] = x_ref[:] + sigma * _gaussian_from_bits(x_ref.shape)


def _noisy_tile_pallas(
    x_flat: jnp.ndarray, n: int, sigma: float, seed: jnp.ndarray
) -> jnp.ndarray:
    rows, lanes = x_flat.shape
    kernel = functools.partial(_noise_kernel, sigma=sigma)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((rows, lanes), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, lanes), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, rows, lanes), jnp.float32),
        grid_spec=grid_spec,
    )(seed, x_flat)


def _noisy_tile_xla(
    x: jnp.ndarray, n: int, sigma: float, key: jnp.ndarray
) -> jnp.ndarray:
    """``sigma`` may be a Python float OR a traced scalar (the certify
    pipeline passes it as a runtime argument so one compiled graph serves
    a whole sigma sweep). sigma=0 is exact either way: ``x + 0.0*normal``
    is bit-identical to ``x`` in IEEE f32."""
    tiled = jnp.broadcast_to(x[None], (n,) + x.shape)
    if isinstance(sigma, (int, float)) and sigma <= 0:
        return tiled
    return tiled + sigma * jax.random.normal(key, tiled.shape, jnp.float32)


def noisy_tile(
    x: jnp.ndarray,  # [H, W, C] clean normalized image
    n: int,
    sigma: float,
    key: jnp.ndarray,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Return ``n`` noisy copies [n, H, W, C] of the clean image.

    Default path is XLA: broadcast + threefry normal + add fuse into one
    HBM pass and measure ~8x faster than the hand-written kernel on v5e
    (3.2 ms vs 26.5 ms for 100 x 448^2 draws — the TPU Pallas grid runs
    sequentially per core, so the kernel cannot beat XLA's fused RNG
    here). The Pallas path stays available for future tuning.
    """
    if (
        not use_pallas
        or jax.default_backend() != "tpu"
        # the Pallas kernel bakes sigma as a compile-time constant; a
        # traced sigma (runtime sweep argument) takes the XLA path, as
        # does sigma<=0 (clean tile)
        or not isinstance(sigma, (int, float))
        or sigma <= 0
    ):
        return _noisy_tile_xla(x, n, sigma, key)

    h, w, c = x.shape
    total = h * w * c
    if total % _LANES != 0:
        return _noisy_tile_xla(x, n, sigma, key)

    x_flat = x.astype(jnp.float32).reshape(total // _LANES, _LANES)
    seed = jax.random.randint(
        key, (2,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
    )
    out = _noisy_tile_pallas(x_flat, n, sigma, seed)
    return out.reshape(n, h, w, c)
