"""Round-3 train-step variant hunt, interleaved in one process:

  base       current default (remat full layer, f32 LN, erf gelu)
  remat_mlp  remat_scope="mlp" (attention saved, only MLP recomputed)
  ln_bf16    layernorm computed in activation dtype (parity-risky; measure
             the ceiling before deciding)
  gelu_tanh  tanh-approximated gelu (HF parity risk; ceiling measurement)
  qkv_fused  one [h,3h] projection instead of three [h,h]

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/train_variants_ab.py
"""
from __future__ import annotations

import functools
import json
import math
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import proqa_tpu.models.bert as bm
    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import init_retriever_params
    from proqa_tpu.train.optim import init_train_state, make_optimizer
    from proqa_tpu.train.retriever_trainer import make_train_step

    jax.config.update("jax_default_prng_impl", "rbg")
    b, tq, tc = 80, 32, 512
    rng = np.random.default_rng(2)
    res = {}

    orig_ln = bm._layer_norm
    orig_gelu = jax.nn.gelu
    orig_attn = bm._attention

    def ln_bf16(x, p, eps):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        return (y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype))

    def attn_fused_qkv(x, mask_bias, p, cfg, drop_rng, deterministic, key_mask=None):
        bsz, t, h = x.shape
        nh, hd = cfg.num_heads, cfg.head_dim
        kern = jnp.concatenate(
            [p["q"]["kernel"], p["k"]["kernel"], p["v"]["kernel"]], axis=-1
        ).astype(x.dtype)
        bias = jnp.concatenate([p["q"]["bias"], p["k"]["bias"], p["v"]["bias"]])
        qkv = (jnp.einsum("bth,hf->btf", x, kern,
                          preferred_element_type=jnp.float32) + bias).astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        heads = lambda y: y.reshape(bsz, t, nh, hd)
        q, k, v = heads(q), heads(k), heads(v)
        from proqa_tpu.ops.pallas_attention import fused_attention

        rate = 0.0 if deterministic else cfg.attention_dropout
        ctx = fused_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), key_mask,
            sm_scale=1.0 / math.sqrt(hd), dropout_rate=rate,
            dropout_rng=drop_rng if rate > 0.0 else None,
            interpret=jax.default_backend() != "tpu",
        ).transpose(0, 2, 1, 3)
        return bm._dense(ctx.reshape(bsz, t, h).astype(x.dtype), p["attn_out"])

    variants = {
        "base": {},
        "remat_mlp": {"cfg": dict(remat_scope="mlp")},
        "ln_bf16": {"ln": ln_bf16},
        "gelu_tanh": {"gelu": functools.partial(orig_gelu, approximate=True)},
        "qkv_fused": {"attn": attn_fused_qkv},
    }
    steps, states = {}, {}
    batch = None

    for name, spec in variants.items():
        bm._layer_norm = spec.get("ln", orig_ln)
        jax.nn.gelu = spec.get("gelu", orig_gelu)
        bm._attention = spec.get("attn", orig_attn)
        try:
            cfg = BertConfig(
                dtype=jnp.bfloat16, remat=True, flash_attention=True,
                **spec.get("cfg", {}),
            )
            params = init_retriever_params(jax.random.PRNGKey(0), cfg)
            tx = make_optimizer(1e-5, max_grad_norm=2.0)
            states[name] = init_train_state(params, tx)
            steps[name] = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))
            if batch is None:
                batch = {
                    "input_ids_q": jnp.asarray(rng.integers(5, cfg.vocab_size, (b, tq)), jnp.int32),
                    "input_mask_q": jnp.ones((b, tq), jnp.int32),
                    "input_ids_c": jnp.asarray(rng.integers(5, cfg.vocab_size, (b, tc)), jnp.int32),
                    "input_mask_c": jnp.ones((b, tc), jnp.int32),
                }
            t0 = time.perf_counter()
            states[name], m = steps[name](states[name], batch, jax.random.PRNGKey(3))
            float(m["loss"])
            res[name + "_compile_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {e}"[:140]
            steps.pop(name, None)
        finally:
            bm._layer_norm, jax.nn.gelu, bm._attention = orig_ln, orig_gelu, orig_attn
        print(json.dumps(res), flush=True)

    key = jax.random.PRNGKey(7)
    for name in steps:  # warm-up round
        for i in range(8):
            states[name], m = steps[name](states[name], batch, jax.random.fold_in(key, i))
        float(m["loss"])
    for rnd in range(3):
        for name in steps:
            t0 = time.perf_counter()
            for i in range(5):
                states[name], m = steps[name](
                    states[name], batch, jax.random.fold_in(key, 100 * rnd + i)
                )
            float(m["loss"])
            res[f"{name}_ms_r{rnd}"] = round((time.perf_counter() - t0) / 5 * 1e3, 1)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
