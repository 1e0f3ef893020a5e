"""Interleaved A/B of jax.checkpoint policies for the retriever train step
(full recompute vs saving matmul outputs). OOM at compile => variant skipped.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/remat_policy_ab.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import init_retriever_params
    from proqa_tpu.train.optim import init_train_state, make_optimizer
    from proqa_tpu.train.retriever_trainer import make_train_step

    jax.config.update("jax_default_prng_impl", "rbg")
    b, tq, tc = 80, 32, 512
    rng_np = np.random.default_rng(2)
    batch = None
    tx = make_optimizer(1e-5, max_grad_norm=2.0)
    key = jax.random.PRNGKey(3)

    policies = [
        ("full_recompute", None),
        ("dots_no_batch", "dots_with_no_batch_dims_saveable"),
        ("dots_saveable", "dots_saveable"),
    ]
    steps = {}
    for name, pol in policies:
        cfg = BertConfig(
            dtype=jnp.bfloat16, remat=True, flash_attention=True, remat_policy=pol
        )
        if batch is None:
            batch = {
                "input_ids_q": jnp.asarray(rng_np.integers(5, cfg.vocab_size, (b, tq)), jnp.int32),
                "input_mask_q": jnp.ones((b, tq), jnp.int32),
                "input_ids_c": jnp.asarray(rng_np.integers(5, cfg.vocab_size, (b, tc)), jnp.int32),
                "input_mask_c": jnp.ones((b, tc), jnp.int32),
            }
        try:
            params = init_retriever_params(jax.random.PRNGKey(0), cfg)
            state = init_train_state(params, tx)
            step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))
            state, m = step(state, batch, key)
            float(m["loss"])
            steps[name] = (step, state)
            print(f"compiled {name}", flush=True)
        except Exception as e:
            print(f"{name}: SKIP ({type(e).__name__}: {str(e)[:120]})", flush=True)

    res = {n: [] for n in steps}
    for rnd in range(3):
        for name in steps:
            step, state = steps[name]
            t0 = time.perf_counter()
            for i in range(6):
                state, m = step(state, batch, jax.random.fold_in(key, i))
            float(m["loss"])
            steps[name] = (step, state)
            res[name].append(round((time.perf_counter() - t0) / 6 * 1e3, 1))
        print(json.dumps(res), flush=True)

    print("FINAL", json.dumps({n: min(v) for n, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
