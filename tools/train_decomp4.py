"""Definitive hidden-dropout A/B: all variants compiled in ONE process and
timed in interleaved rounds (cross-process step timings drifted 396 vs 570 ms
for identical code — the tunnel/chip state is not stable across processes).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/train_decomp4.py
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
    from proqa_tpu.train.optim import init_train_state, make_optimizer
    from proqa_tpu.train.retriever_trainer import make_train_step

    jax.config.update("jax_default_prng_impl", "rbg")
    b, tq, tc = 80, 32, 512
    rng_np = np.random.default_rng(2)
    batch = None

    def identity_drop(x, rate, rng, det):
        return x

    def bernoulli_drop(x, rate, rng, det):
        if det or rate == 0.0:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)

    def u8_drop(x, rate, rng, det):
        if det or rate == 0.0:
            return x
        thr = max(1, int(round(rate * 256)))
        bits = jax.random.bits(rng, x.shape, jnp.uint8)
        inv = 1.0 / (1.0 - thr / 256.0)
        return jnp.where(bits >= jnp.uint8(thr), x.astype(jnp.float32) * inv, 0.0).astype(x.dtype)

    pallas_drop = bert_mod._dropout  # current default (fused hardware-PRNG)

    variants = {
        "identity": identity_drop,
        "bernoulli": bernoulli_drop,
        "u8": u8_drop,
        "pallas": pallas_drop,
    }

    # compile all variants first
    steps = {}
    cfg = BertConfig(dtype=jnp.bfloat16, remat=True, flash_attention=True)
    batch = {
        "input_ids_q": jnp.asarray(rng_np.integers(5, cfg.vocab_size, (b, tq)), jnp.int32),
        "input_mask_q": jnp.ones((b, tq), jnp.int32),
        "input_ids_c": jnp.asarray(rng_np.integers(5, cfg.vocab_size, (b, tc)), jnp.int32),
        "input_mask_c": jnp.ones((b, tc), jnp.int32),
    }
    tx = make_optimizer(1e-5, max_grad_norm=2.0)
    key = jax.random.PRNGKey(3)
    for name, fn in variants.items():
        bert_mod._dropout = fn
        params = init_retriever_params(jax.random.PRNGKey(0), cfg)
        state = init_train_state(params, tx)
        step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))
        state, m = step(state, batch, key)
        float(m["loss"])
        steps[name] = (step, state)
        print(f"compiled {name}", flush=True)
    bert_mod._dropout = pallas_drop

    res = {n: [] for n in variants}
    for rnd in range(3):
        for name in variants:
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
