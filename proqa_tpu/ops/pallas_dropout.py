"""Fused inverted-dropout op (TPU Pallas, hardware PRNG, nothing saved).

Why: tools/train_decomp.py measured hidden-state dropout at ~200 ms of the
572 ms retriever train step (35%) even on the rbg PRNG — jax.random mask
generation + apply is several full-tensor passes, and remat replays it. This
op generates the mask with the on-core hardware PRNG inside a single fused
pass (read x -> write y, bandwidth-optimal) and the custom VJP REGENERATES
the mask from the same seed in backward, so no mask is ever stored and the
rematerialized forward stays bit-identical.

The signed-int32 thresholding and two-word seed mixing follow
ops/pallas_attention.py (this Mosaic lowers uint32 `>=`/`>>` with signed
semantics; prng_seed takes at most 2 words — both verified on v5e by
tools/attention_tpu_check.py). NOTE: the interpreter's PRNG returns zero
bits => interpret mode KEEPS everything (scaled by 1/(1-rate)); statistical
behavior is hardware-only (tools/dropout_tpu_check.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _threshold(rate: float) -> int:
    return min(max(int(rate * (1 << 32)) - (1 << 31), -(1 << 31)), (1 << 31) - 1)


def _kernel(seed_ref, x_ref, o_ref, *, rate):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] + i * jnp.int32(40503))
    bits = pltpu.prng_random_bits(x_ref.shape)
    keep = pltpu.bitcast(bits, jnp.int32) >= jnp.int32(_threshold(rate))
    scaled = x_ref[:].astype(jnp.float32) * (1.0 / (1.0 - rate))  # f32 scale
    o_ref[:] = jnp.where(keep, scaled, 0.0).astype(o_ref.dtype)


def _call(x2d, seed, rate, tile, interpret):
    rows, cols = x2d.shape
    kernel = functools.partial(_kernel, rate=rate)
    interp = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        kernel,
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=x2d.size, bytes_accessed=2 * x2d.size * x2d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interp,
    )(seed, x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _dropout2d(x2d, seed, rate, tile, interpret):
    return _call(x2d, seed, rate, tile, interpret)


def _fwd(x2d, seed, rate, tile, interpret):
    return _call(x2d, seed, rate, tile, interpret), seed


def _bwd(rate, tile, interpret, seed, g):
    # same seed => same regenerated mask; dropout is linear given the mask
    return _call(g, seed, rate, tile, interpret), None


_dropout2d.defvjp(_fwd, _bwd)


def pallas_dropout(
    x: jax.Array,
    rng: jax.Array,
    rate: float,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Inverted dropout with an in-kernel hardware-PRNG mask. Any shape; the
    trailing dim must be a multiple of 128 and the leading dims' product a
    multiple of 8 (standard activations [B, T, H] qualify)."""
    if rate <= 0.0:
        return x
    assert rate < 1.0
    data = (
        rng if jnp.issubdtype(rng.dtype, jnp.integer) else jax.random.key_data(rng)
    ).reshape(-1).astype(jnp.uint32)
    seed = jnp.stack([data[0], data[-1]]).astype(jnp.int32)[None, :]
    cols = x.shape[-1]
    rows = x.size // cols
    x2d = x.reshape(rows, cols)
    tile = rows
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            tile = cand
            break
    return _dropout2d(x2d, seed, float(rate), tile, interpret).reshape(x.shape)
