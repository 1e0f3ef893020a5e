"""Round-3 train-step A/B on hardware: full-recompute remat (round-2
default) vs checkpoint-policy remat (save matmul outputs) — the policies
were rejected by the axon remote compiler in round 2 (HTTP 500); retry.
Interleaved in one process per CLAUDE.md timing rules.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/train_ab_round3.py
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
    rng = np.random.default_rng(2)
    res = {}

    variants = {
        "base": dict(remat=True, remat_policy=None),
        "dots": dict(remat=True, remat_policy="dots_with_no_batch_dims_saveable"),
        "dots_batch": dict(remat=True, remat_policy="dots_saveable"),
    }
    steps = {}
    states = {}
    batch = None
    for name, kw in variants.items():
        cfg = BertConfig(dtype=jnp.bfloat16, flash_attention=True, **kw)
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
        key = jax.random.PRNGKey(3)
        t0 = time.perf_counter()
        try:
            states[name], m = steps[name](states[name], batch, key)
            float(m["loss"])
            res[name + "_compile_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {e}"[:160]
            steps.pop(name)
        print(json.dumps(res), flush=True)

    key = jax.random.PRNGKey(7)
    # warm-up round (first timed loop reads ~50% high)
    for name in steps:
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
