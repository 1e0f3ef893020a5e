"""Round 2 of the CPU recipe sweep: does shrinking the output-projection
init (x0.1) — near-uniform initial softmax without killing trunk
input-dependence — speed up from-scratch contrastive learning?
Run: python tools/collapse_sweep2.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import init_retriever_params
    from proqa_tpu.train.optim import init_train_state, make_optimizer
    from proqa_tpu.train.retriever_trainer import make_train_step

    n, bsz, steps = 32768, 32, 700
    rng = np.random.default_rng(0)
    para_words = rng.integers(5, 2005, (n, 20)).astype(np.int32)

    def make_batch(i):
        r = np.random.default_rng(9000 + i)
        rows = rng.integers(0, n, bsz)
        starts = r.integers(0, 14, bsz)
        sel = para_words[rows]
        snips = np.stack([sel[j, s:s + 6] for j, s in enumerate(starts)])
        q = np.concatenate([np.full((bsz, 1), 2, np.int32), snips,
                            np.full((bsz, 1), 3, np.int32)], 1)
        c = np.concatenate([np.full((bsz, 1), 2, np.int32), para_words[rows],
                            np.full((bsz, 1), 3, np.int32)], 1)
        return {
            "input_ids_q": jnp.asarray(q),
            "input_ids_c": jnp.asarray(c),
            "input_mask_q": jnp.ones_like(jnp.asarray(q)),
            "input_mask_c": jnp.ones_like(jnp.asarray(c)),
        }

    batches = [make_batch(i) for i in range(steps)]

    for lr, init, pscale in [(3e-4, 0.05, 1.0), (3e-4, 0.05, 0.1),
                             (1e-3, 0.05, 0.1), (1e-3, 0.1, 0.1)]:
        cfg = BertConfig(dtype=jnp.float32, vocab_size=2005, hidden_size=128,
                         num_layers=2, num_heads=4, intermediate_size=512,
                         max_position_embeddings=64, initializer_range=init,
                         hidden_dropout=0.0, attention_dropout=0.0)
        params = init_retriever_params(jax.random.PRNGKey(0), cfg)
        for k in ("proj_q", "proj_c"):
            params[k]["kernel"] = params[k]["kernel"] * pscale
        tx = make_optimizer(lr, warmup_steps=100, total_steps=steps)
        state = init_train_state(params, tx)
        step_fn = jax.jit(make_train_step(cfg, tx))
        key = jax.random.PRNGKey(1)
        t0 = time.monotonic()
        tr = []
        for i, b in enumerate(batches):
            state, m = step_fn(state, b, jax.random.fold_in(key, i))
            if i % 100 == 0 or i == steps - 1:
                tr.append((i, round(float(m["loss"]), 3),
                           round(float(m["acc"]), 3)))
        print(json.dumps({"lr": lr, "init": init, "pscale": pscale,
                          "s": round(time.monotonic() - t0, 1),
                          "trace": tr}), flush=True)


if __name__ == "__main__":
    main()
