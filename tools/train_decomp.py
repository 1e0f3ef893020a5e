"""Decompose the retriever train step (446 ms @ 80x(32q+512c), SOL ~195 ms).

Variants isolate: hidden dropout cost (rbg mask gen + apply under remat),
attention dropout (in-kernel), fused vs vanilla attention, remat overhead.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/train_decomp.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def _force(out):
    import jax

    for leaf in jax.tree.leaves(out):
        np.asarray(leaf.reshape(-1)[:1]) if hasattr(leaf, "reshape") else None
        leaf.block_until_ready()


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import init_retriever_params
    from proqa_tpu.train.optim import init_train_state, make_optimizer
    from proqa_tpu.train.retriever_trainer import make_train_step

    jax.config.update("jax_default_prng_impl", "rbg")
    b, tq, tc = 80, 32, 512
    rng = np.random.default_rng(2)
    res = {}

    variants = [
        ("full_fused", dict(flash_attention=True)),
        ("no_hidden_drop", dict(flash_attention=True, hidden_dropout=0.0)),
        ("no_drop_at_all", dict(flash_attention=True, hidden_dropout=0.0,
                                attention_dropout=0.0)),
        ("vanilla_attn", dict(flash_attention=False)),
    ]
    for name, kw in variants:
        cfg = BertConfig(dtype=jnp.bfloat16, remat=True, **kw)
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
        # amortized: steps chained via donated state
        t0 = time.perf_counter()
        for i in range(8):
            state, m = step(state, batch, jax.random.fold_in(key, i))
        float(m["loss"])
        res[name] = round((time.perf_counter() - t0) / 8 * 1e3, 1)
        print(json.dumps(res), flush=True)
        del state, params

    print("FINAL", json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
