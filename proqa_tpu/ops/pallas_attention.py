"""Fused attention kernel with in-kernel attention-prob dropout (TPU Pallas).

Why not the library flash kernel: BERT sequences are <= 512 (reference
max_position_embeddings; /root/reference/retrieval/config.py:25-27), and the
round-1 tuning showed full-sequence blocks (block=512) beat the streaming
defaults 4x at these lengths — i.e. the flash streaming machinery buys
nothing here. What the library kernel *cannot* do is attention-probability
dropout (/root/reference/qa/bert_retrieve_qa.py:28 — attention dropout is
part of reference training), which round 1 had to skip. This kernel computes
the full [T, T] score matrix per (batch, head) in VMEM — softmax + dropout +
PV in one fused pass, no HBM round trip for scores/probs — and regenerates
the dropout mask in the backward kernel from the same per-(batch, head)
hardware PRNG seed, so nothing but (q, k, v) is saved for backward.

Semantics match models/bert.py's vanilla path exactly at dropout_rate=0
(f32 scores/softmax, bf16 matmul inputs, additive key-padding mask), and are
inverted-dropout on the attention probabilities otherwise.

Memory: per grid step (one batch x head) the f32 [T, T] intermediates take
T^2 * 4 bytes each; at T=512 the backward kernel peaks ~6 MB VMEM, well
under the ~16 MB/core budget. T must be a multiple of 128 and <= 1024.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _keep_mask(seed_ref, b, h, shape, rate):
    """Regenerate the per-(batch, head) dropout keep-mask. Called identically
    from forward and backward so the mask replays exactly. Mosaic supports at
    most TWO seed words, so (b, h) are mixed into the second one (odd
    multipliers => distinct per (b, h) under int32 wraparound).

    The thresholding runs in SIGNED int32 space: this Mosaic version lowers
    uint32 `>=` AND uint32 `>>` with signed semantics (both verified on v5e —
    each silently dropped ~60% instead of 10%), so unsigned ops on the raw
    bits cannot be trusted. Bitcasting to int32 (uniform over the full signed
    range) and comparing against rate*2^32 - 2^31 is well-defined on every
    backend: P(si < t) = (t + 2^31) / 2^32 = rate."""
    mix = seed_ref[0, 1] + b * jnp.int32(-1640531535) + h * jnp.int32(40503)
    pltpu.prng_seed(seed_ref[0, 0], mix)
    bits = pltpu.prng_random_bits(shape)          # uint32, uniform
    si = pltpu.bitcast(bits, jnp.int32)           # uniform over int32
    t = min(max(int(rate * (1 << 32)) - (1 << 31), -(1 << 31)), (1 << 31) - 1)
    return si >= jnp.int32(t)                     # P(keep) = 1 - rate


def _prec(dtype):
    # f32 inputs: force true-f32 MXU passes (default would run a single bf16
    # pass, ~4e-3 relative noise). bf16 (production) pins DEFAULT explicitly
    # — `None` would defer to jax_default_matmul_precision, and a global
    # "highest" (the from-scratch-training fix, CLAUDE.md) turns bf16 dots
    # into fp32 contracts that Mosaic rejects at compile ("Bad lhs type").
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _fwd_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref, o_ref, *, scale, rate):
    b, h = pl.program_id(0), pl.program_id(1)
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]          # [T, Dh]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_prec(q.dtype),
    ) * scale                                                 # [T, T] f32
    bias = jnp.where(mask_ref[0, 0, :] != 0, 0.0, _NEG).astype(jnp.float32)
    p = jax.nn.softmax(s + bias[None, :], axis=-1)
    if rate > 0.0:
        keep = _keep_mask(seed_ref, b, h, p.shape, rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(q.dtype),
    ).astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, mask_ref, q_ref, k_ref, v_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, scale, rate,
):
    b, h = pl.program_id(0), pl.program_id(1)
    q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
    prec = _prec(q.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * scale
    bias = jnp.where(mask_ref[0, 0, :] != 0, 0.0, _NEG).astype(jnp.float32)
    p = jax.nn.softmax(s + bias[None, :], axis=-1)            # [T, T] f32

    if rate > 0.0:
        keep = _keep_mask(seed_ref, b, h, p.shape, rate)
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, p * inv, 0.0)                    # dropped probs
    else:
        pd = p

    # dV = Pd^T dO
    dv_ref[0, 0] = jax.lax.dot_general(
        pd.astype(q.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dv_ref.dtype)
    # dPd = dO V^T ; dP = dropout-mask-scaled dPd ; softmax backward
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    dp = jnp.where(keep, dpd * inv, 0.0) if rate > 0.0 else dpd
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))   # f32
    ds = (ds * scale).astype(q.dtype)
    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(dk_ref.dtype)


def _interp(interpret: bool, rate: float):
    """Plain interpret mode lowers pltpu.prng_* to the host platform (no CPU
    rule); the TPU-simulating interpreter implements them (as zero bits)."""
    if interpret and rate > 0.0:
        return pltpu.InterpretParams()
    return interpret


def _specs(bh_shape, t):
    """(seed, mask, per-(b,h) tensors...) block specs for grid (B, H)."""
    _, _, _, dh = bh_shape
    tensor = pl.BlockSpec(
        (1, 1, t, dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    seed = pl.BlockSpec((1, 2), lambda b, h: (0, 0), memory_space=pltpu.SMEM)
    # mask is [B, 1, T]: TPU lowering requires the last two block dims to be
    # (8k, 128k)-divisible OR equal to the array dims — (1, T) on [B, T] is
    # neither, (1, 1, T) on [B, 1, T] matches exactly.
    mask = pl.BlockSpec((1, 1, t), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM)
    return seed, mask, tensor


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_attention(q, k, v, key_mask, seed, scale, rate, interpret):
    bsz, nh, t, dh = q.shape
    seed_spec, mask_spec, tensor_spec = _specs(q.shape, t)
    kernel = functools.partial(_fwd_kernel, scale=scale, rate=rate)
    flops = 4 * bsz * nh * t * t * dh
    return pl.pallas_call(
        kernel,
        grid=(bsz, nh),
        in_specs=[seed_spec, mask_spec] + [tensor_spec] * 3,
        out_specs=tensor_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=bsz * nh * t * t,
        ),
        interpret=_interp(interpret, rate),
    )(seed, key_mask, q, k, v)


def _fa_fwd(q, k, v, key_mask, seed, scale, rate, interpret):
    out = _fused_attention(q, k, v, key_mask, seed, scale, rate, interpret)
    return out, (q, k, v, key_mask, seed)


def _fa_bwd(scale, rate, interpret, res, do):
    q, k, v, key_mask, seed = res
    bsz, nh, t, dh = q.shape
    seed_spec, mask_spec, tensor_spec = _specs(q.shape, t)
    kernel = functools.partial(_bwd_kernel, scale=scale, rate=rate)
    flops = 10 * bsz * nh * t * t * dh
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bsz, nh),
        in_specs=[seed_spec, mask_spec] + [tensor_spec] * 4,
        out_specs=(tensor_spec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct(q.shape, q.dtype) for _ in range(3)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=7 * q.size * q.dtype.itemsize,
            transcendentals=bsz * nh * t * t,
        ),
        interpret=_interp(interpret, rate),
    )(seed, key_mask, q, k, v, do)
    return dq, dk, dv, None, None


_fused_attention.defvjp(_fa_fwd, _fa_bwd)


def fused_attention(
    q: jax.Array,            # [B, H, T, Dh]
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array,     # [B, T] nonzero = attend
    *,
    sm_scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused softmax(QK^T * scale + key-padding bias) @ V with optional
    inverted dropout on the attention probabilities (mask generated by the
    on-core hardware PRNG; regenerated, not stored, for backward).

    NOTE: the interpreter's prng_random_bits returns zeros, so dropout_rate>0
    under interpret=True keeps every position scaled by 1/(1-rate) for
    rate<0.5 (the signed threshold is negative — nothing drops): silently
    wrong training math. Use rate>0 only on real TPU.
    """
    bsz, nh, t, dh = q.shape
    assert t % 128 == 0 and t <= 1024, f"T={t} must be a multiple of 128, <= 1024"
    assert key_mask.shape == (bsz, t)
    if dropout_rate > 0.0:
        assert dropout_rng is not None, "dropout_rate > 0 requires dropout_rng"
        data = (
            dropout_rng
            if jnp.issubdtype(dropout_rng.dtype, jnp.integer)
            else jax.random.key_data(dropout_rng)
        ).reshape(-1).astype(jnp.uint32)
        seed = jnp.stack([data[0], data[-1]]).astype(jnp.int32)[None, :]  # [1, 2]
    else:
        seed = jnp.zeros((1, 2), jnp.int32)
    return _fused_attention(
        q, k, v, key_mask.astype(jnp.int32)[:, None, :], seed,
        float(sm_scale), float(dropout_rate), interpret,
    )


# NOTE: the hardware PRNG's bit PLACEMENT depends on the kernel context (a
# bare bit-dump kernel draws a different stream than a compute kernel with
# the same seed; verified on v5e), so masks cannot be replayed outside a
# structurally identical kernel. tools/attention_tpu_check.py validates the
# dropout path with an instrumented twin of the forward kernel plus an exact
# linearity-in-v VJP identity for forward/backward consistency.
