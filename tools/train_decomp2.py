"""Isolate WHERE hidden-dropout's ~200 ms goes: the mask op itself, or the
structural effect of having dropout ops in the graph (fusion breaks, remat
recompute shape). Monkeypatches bert._dropout to identity (rng still
threaded) and microbenches the standalone fused dropout op.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/train_decomp2.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import proqa_tpu.models.bert as bert_mod
    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import init_retriever_params
    from proqa_tpu.ops.pallas_dropout import pallas_dropout
    from proqa_tpu.train.optim import init_train_state, make_optimizer
    from proqa_tpu.train.retriever_trainer import make_train_step

    jax.config.update("jax_default_prng_impl", "rbg")
    res = {}

    # --- standalone op microbench: [40960, 768] bf16 (one tower activation) ---
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).standard_normal((40960, 768)), jnp.bfloat16)
    )
    key = jax.random.PRNGKey(0)
    f = jax.jit(lambda x, k: pallas_dropout(x, k, 0.1))
    y = f(x, key); np.asarray(y[:1]); y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(16):
        y = f(x, key)
    np.asarray(y[:1]); y.block_until_ready()
    res["pallas_dropout_40960x768_ms"] = round((time.perf_counter() - t0) / 16 * 1e3, 2)

    g = jax.jit(lambda x, k: jax.grad(lambda xx: jnp.sum(
        pallas_dropout(xx, k, 0.1).astype(jnp.float32) ** 2))(x))
    y = g(x, key); np.asarray(y[:1]); y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(16):
        y = g(x, key)
    np.asarray(y[:1]); y.block_until_ready()
    res["pallas_dropout_grad_ms"] = round((time.perf_counter() - t0) / 16 * 1e3, 2)
    print(json.dumps(res), flush=True)

    # --- train step with dropout monkeypatched to identity ---
    b, tq, tc = 80, 32, 512
    rng = np.random.default_rng(2)

    def step_ms(name):
        cfg = BertConfig(dtype=jnp.bfloat16, remat=True, flash_attention=True)
        params = init_retriever_params(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(1e-5, max_grad_norm=2.0)
        state = init_train_state(params, tx)
        step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))
        batch = {
            "input_ids_q": jnp.asarray(rng.integers(5, cfg.vocab_size, (b, tq)), jnp.int32),
            "input_mask_q": jnp.ones((b, tq), jnp.int32),
            "input_ids_c": jnp.asarray(rng.integers(5, cfg.vocab_size, (b, tc)), jnp.int32),
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

    orig = bert_mod._dropout
    step_ms("real_dropout")
    bert_mod._dropout = lambda x, rate, rng, det: x
    try:
        step_ms("identity_dropout")
    finally:
        bert_mod._dropout = orig

    print("FINAL", json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
