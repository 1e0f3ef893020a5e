"""Chase the ~176 ms hidden-dropout cost: is it random-bit VOLUME?

Variants monkeypatch bert._dropout inside the full train step:
  u8_xla:   jax.random.bits uint8 (4x fewer random bytes than bernoulli's
            uint32 draw), threshold quantized to 1/256, where() fuses
  u32_xla:  the original bernoulli path (baseline)
Plus a PRNG-throughput microbench of the pallas hardware generator.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/train_decomp3.py
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import proqa_tpu.models.bert as bert_mod
    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import init_retriever_params
    from proqa_tpu.train.optim import init_train_state, make_optimizer
    from proqa_tpu.train.retriever_trainer import make_train_step

    jax.config.update("jax_default_prng_impl", "rbg")
    res = {}

    # (PRNG-throughput microbench removed: dynamic-row store variant
    #  crashed the device runtime; the step A/B below is the decisive test)

    # --- train-step A/B with monkeypatched hidden dropout ---
    b, tq, tc = 80, 32, 512
    rng_np = np.random.default_rng(2)

    def step_ms(name):
        cfg = BertConfig(dtype=jnp.bfloat16, remat=True, flash_attention=True)
        params = init_retriever_params(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(1e-5, max_grad_norm=2.0)
        state = init_train_state(params, tx)
        step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))
        batch = {
            "input_ids_q": jnp.asarray(rng_np.integers(5, cfg.vocab_size, (b, tq)), jnp.int32),
            "input_mask_q": jnp.ones((b, tq), jnp.int32),
            "input_ids_c": jnp.asarray(rng_np.integers(5, cfg.vocab_size, (b, tc)), jnp.int32),
            "input_mask_c": jnp.ones((b, tc), jnp.int32),
        }
        key = jax.random.PRNGKey(3)
        state, m = step(state, batch, key)
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(8):
            state, m = step(state, batch, jax.random.fold_in(key, i))
        float(m["loss"])
        res[name] = round((time.perf_counter() - t0) / 8 * 1e3, 1)
        print(json.dumps(res), flush=True)

    def u8_dropout(x, rate, rng, deterministic):
        if deterministic or rate == 0.0:
            return x
        thr = max(1, int(round(rate * 256)))
        bits = jax.random.bits(rng, x.shape, jnp.uint8)
        keep = bits >= jnp.uint8(thr)
        inv = 1.0 / (1.0 - thr / 256.0)
        return jnp.where(keep, x.astype(jnp.float32) * inv, 0.0).astype(x.dtype)

    orig = bert_mod._dropout
    try:
        bert_mod._dropout = u8_dropout
        step_ms("u8_xla")
        bert_mod._dropout = lambda x, rate, rng, det: (
            x if det or rate == 0.0 else jnp.where(
                jax.random.bernoulli(rng, 1.0 - rate, x.shape), x / (1.0 - rate), 0.0
            ).astype(x.dtype)
        )
        step_ms("u32_xla_bernoulli")
    finally:
        bert_mod._dropout = orig

    print("FINAL", json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
