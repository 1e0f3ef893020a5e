"""Pure-JAX BERT encoder, designed for TPU/XLA.

Replaces the reference's dependency on HuggingFace `BertModel`
(/root/reference/retrieval/retriever.py:16-17, /root/reference/qa/bert_retrieve_qa.py:24-27)
with a from-scratch functional implementation:

* params are a plain pytree (stacked per-layer leaves, `lax.scan` over layers —
  one compiled layer body instead of 12 unrolled ones),
* bfloat16 activation policy with fp32 master params, fp32 layernorm/softmax,
* static shapes everywhere; attention mask is additive, applied pre-softmax,
* weight layout converts 1:1 from HF checkpoints (models/hf_convert.py) so
  pretrained BERT recipes carry over.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = Any  # nested dict pytree


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    dtype: Any = jnp.bfloat16  # activation/compute dtype
    remat: bool = False  # rematerialize layer activations in backward
                         # (jax.checkpoint over the layer scan; trades ~30%
                         # FLOPs for O(1)-in-depth activation memory, the TPU
                         # analogue of the reference's apex O1 memory savings)
    remat_policy: str | None = None  # name of a jax.checkpoint_policies
                         # policy (e.g. "dots_with_no_batch_dims_saveable")
                         # to save selected intermediates instead of
                         # recomputing everything; None = full recompute.
                         # NOTE: policies are REJECTED by the axon remote
                         # compiler (HTTP 500, re-confirmed round 3) — use
                         # remat_scope for partial remat there.
    remat_scope: str = "layer"  # "layer": checkpoint the whole layer body
                         # (max memory savings, recomputes attention+MLP);
                         # "mlp": checkpoint only the MLP block — attention
                         # outputs are saved, halving recompute FLOPs for
                         # ~2x the activation memory (manual stand-in for
                         # the rejected save-dots policies)
    flash_attention: bool = False  # fused Pallas attention kernel
                                   # (ops/pallas_attention.py): softmax +
                                   # attention-prob dropout + PV in one VMEM
                                   # pass, dropout mask regenerated in the
                                   # backward kernel from the hardware PRNG.
                                   # Applies to seq % 128 == 0 (<= 1024);
                                   # other lengths fall back to vanilla.

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_heads == 0
        return self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls, **kw) -> "BertConfig":
        """Small config for tests/CI (CPU-mesh friendly)."""
        base = dict(
            vocab_size=128,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            max_position_embeddings=64,
        )
        base.update(kw)
        return cls(**base)


def _dense_init(rng, shape, scale):
    return (scale * jax.random.normal(rng, shape)).astype(jnp.float32)


def _ln_params(width):
    return {"scale": jnp.ones((width,), jnp.float32), "bias": jnp.zeros((width,), jnp.float32)}


def init_bert_params(rng: jax.Array, cfg: BertConfig) -> Params:
    """Truncated-normal-ish init matching BERT's initializer_range."""
    h, i = cfg.hidden_size, cfg.intermediate_size
    s = cfg.initializer_range
    keys = jax.random.split(rng, 16)
    k = iter(keys)

    def dense(rng_, d_in, d_out):
        return {"kernel": _dense_init(rng_, (d_in, d_out), s), "bias": jnp.zeros((d_out,), jnp.float32)}

    # Per-layer weights are stacked on a leading num_layers axis for lax.scan.
    def stacked_dense(rng_, d_in, d_out):
        return {
            "kernel": _dense_init(rng_, (cfg.num_layers, d_in, d_out), s),
            "bias": jnp.zeros((cfg.num_layers, d_out), jnp.float32),
        }

    def stacked_ln():
        return {
            "scale": jnp.ones((cfg.num_layers, h), jnp.float32),
            "bias": jnp.zeros((cfg.num_layers, h), jnp.float32),
        }

    return {
        "embeddings": {
            "word": _dense_init(next(k), (cfg.vocab_size, h), s),
            "position": _dense_init(next(k), (cfg.max_position_embeddings, h), s),
            "token_type": _dense_init(next(k), (cfg.type_vocab_size, h), s),
            "ln": _ln_params(h),
        },
        "layers": {
            "q": stacked_dense(next(k), h, h),
            "k": stacked_dense(next(k), h, h),
            "v": stacked_dense(next(k), h, h),
            "attn_out": stacked_dense(next(k), h, h),
            "attn_ln": stacked_ln(),
            "mlp_in": stacked_dense(next(k), h, i),
            "mlp_out": stacked_dense(next(k), i, h),
            "mlp_ln": stacked_ln(),
        },
        "pooler": dense(next(k), h, h),
    }


def _layer_norm(x: jax.Array, p: Params, eps: float) -> jax.Array:
    """LayerNorm in fp32 regardless of activation dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def _dense(x: jax.Array, p: Params) -> jax.Array:
    kernel = p["kernel"].astype(x.dtype)
    y = jnp.einsum("...d,df->...f", x, kernel, preferred_element_type=jnp.float32)
    return (y + p["bias"]).astype(x.dtype)


def _dropout(x: jax.Array, rate: float, rng, deterministic: bool) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    # TPU: fused hardware-PRNG dropout (single pass, mask regenerated in
    # backward — tools/train_decomp.py measured the jax.random path at ~200ms
    # of a 572ms train step). CPU/odd shapes: plain bernoulli masking.
    if (
        jax.default_backend() == "tpu"
        and x.shape[-1] % 128 == 0
        and (x.size // x.shape[-1]) % 8 == 0
    ):
        from proqa_tpu.ops.pallas_dropout import pallas_dropout

        return pallas_dropout(x, rng, rate)
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _attention(x, mask_bias, p, cfg: BertConfig, drop_rng, deterministic, key_mask=None):
    b, t, h = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim

    def heads(y):
        return y.reshape(b, t, nh, hd)

    q = heads(_dense(x, p["q"]))
    k = heads(_dense(x, p["k"]))
    v = heads(_dense(x, p["v"]))

    # fused kernel needs block-divisible sequence lengths; other shapes fall
    # back to the vanilla path transparently. Off-TPU it runs interpreted,
    # where the PRNG returns zero bits — with dropout active that would keep
    # everything scaled by 1/(1-rate) (silently wrong training math), so
    # dropout training off-TPU also falls back to vanilla attention.
    rate = 0.0 if deterministic else cfg.attention_dropout
    fused_ok = rate == 0.0 or jax.default_backend() == "tpu"
    if cfg.flash_attention and key_mask is not None and t % 128 == 0 \
            and t <= 1024 and fused_ok:
        from proqa_tpu.ops.pallas_attention import fused_attention

        ctx = fused_attention(
            q.transpose(0, 2, 1, 3),  # [B, H, T, D]
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            key_mask,
            sm_scale=1.0 / math.sqrt(hd),
            dropout_rate=rate,
            dropout_rng=drop_rng if rate > 0.0 else None,
            interpret=jax.default_backend() != "tpu",
        ).transpose(0, 2, 1, 3)
        return _dense(ctx.reshape(b, t, h).astype(x.dtype), p["attn_out"])

    scores = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd) + mask_bias  # fp32
    probs = jax.nn.softmax(scores, axis=-1)
    probs = _dropout(probs, cfg.attention_dropout, drop_rng, deterministic)
    ctx = jnp.einsum(
        "bnqk,bknd->bqnd", probs.astype(x.dtype), v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return _dense(ctx.reshape(b, t, h), p["attn_out"])


def bert_encoder(
    params: Params,
    cfg: BertConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    token_type_ids: jax.Array | None = None,
    *,
    deterministic: bool = True,
    dropout_rng: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (sequence_output [B,T,H], pooled_output [B,H]).

    pooled_output = tanh(W · h_CLS), the embedding both retriever towers and
    the reader's selection head consume (reference retriever.py:24-29).
    """
    b, t = input_ids.shape
    emb = params["embeddings"]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)

    x = (
        jnp.take(emb["word"], input_ids, axis=0)
        + emb["position"][None, :t, :]
        + jnp.take(emb["token_type"], token_type_ids, axis=0)
    )
    x = _layer_norm(x.astype(cfg.dtype), emb["ln"], cfg.layer_norm_eps)

    assert cfg.remat_scope in ("layer", "mlp"), (
        f"remat_scope={cfg.remat_scope!r}: must be 'layer' or 'mlp' (a typo "
        "would silently disable remat and OOM base-size training at compile)"
    )
    dropout_on = not deterministic and (
        cfg.hidden_dropout > 0 or cfg.attention_dropout > 0
    )
    if dropout_rng is None:
        # A silent fixed key would replay IDENTICAL dropout masks every step —
        # a correctness trap, not a default (round-1 advisor weak #7).
        assert not dropout_on, (
            "bert_encoder: deterministic=False with nonzero dropout requires "
            "an explicit dropout_rng (pass deterministic=True for inference)"
        )
        dropout_rng = jax.random.PRNGKey(0)  # unused: dropout rates are 0
    # split BEFORE use: consuming dropout_rng for the embedding mask AND as
    # the parent of the per-layer keys would correlate the embedding mask
    # with the layer masks (same counter stream under threefry)
    emb_rng, dropout_rng = jax.random.split(dropout_rng)
    x = _dropout(x, cfg.hidden_dropout, emb_rng, deterministic)

    # Additive attention bias in fp32: 0 where attended, -1e30 where masked.
    mask_bias = jnp.where(attention_mask[:, None, None, :] != 0, 0.0, -1e30).astype(jnp.float32)
    # fused-attention path: key-padding mask applied in-kernel (same additive
    # -1e30 bias as the vanilla path — bitwise-equivalent masking)
    key_mask = attention_mask.astype(jnp.int32) if cfg.flash_attention else None

    layer_rngs = jax.random.split(dropout_rng, cfg.num_layers * 3).reshape(cfg.num_layers, 3, -1)

    def mlp_block(x, layer_p, rng):
        mlp = _dense(x, layer_p["mlp_in"])
        mlp = jax.nn.gelu(mlp.astype(jnp.float32), approximate=False).astype(x.dtype)
        mlp = _dense(mlp, layer_p["mlp_out"])
        mlp = _dropout(mlp, cfg.hidden_dropout, rng, deterministic)
        return _layer_norm(x + mlp, layer_p["mlp_ln"], cfg.layer_norm_eps)

    if cfg.remat and cfg.remat_scope == "mlp":
        mlp_block = jax.checkpoint(mlp_block, prevent_cse=False)

    def layer_body(x, scanned):
        layer_p, rngs = scanned
        attn = _attention(x, mask_bias, layer_p, cfg, rngs[0], deterministic, key_mask)
        attn = _dropout(attn, cfg.hidden_dropout, rngs[1], deterministic)
        x = _layer_norm(x + attn, layer_p["attn_ln"], cfg.layer_norm_eps)
        x = mlp_block(x, layer_p, rngs[2])
        return x, None

    if cfg.remat and cfg.remat_scope == "layer":
        policy = (
            getattr(jax.checkpoint_policies, cfg.remat_policy)
            if cfg.remat_policy else None
        )
        layer_body = jax.checkpoint(layer_body, prevent_cse=False, policy=policy)
    x, _ = jax.lax.scan(layer_body, x, (params["layers"], layer_rngs))

    pooled = jnp.tanh(_dense(x[:, 0, :], params["pooler"]).astype(jnp.float32)).astype(cfg.dtype)
    return x, pooled


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
