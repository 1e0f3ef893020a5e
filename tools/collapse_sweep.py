"""CPU sweep: find a from-scratch recipe for the production in-batch loss
that escapes the uniform-collapse fixed point (all embeddings identical ->
exactly zero gradient) on the int8_real_probe's snippet->paragraph task.

Observed on TPU (tools/int8_real_probe.py): BERT-base @1e-4, @6e-4-warmup,
4L/256 bf16 @3e-3, 4L/256 f32/init0.1 @3e-3 ALL end at loss = ln(80),
acc = 1/80, constant row norms. Hypothesis: large initial logit variance
saturates the softmax; the gradient then only crushes variance.

Run: python tools/collapse_sweep.py  (forces CPU)
"""
from __future__ import annotations

import itertools
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

    n, bsz, steps = 32768, 32, 400
    rng = np.random.default_rng(0)
    para_words = rng.integers(5, 2005, (n, 20)).astype(np.int32)

    def snippets(rows, seed):
        r = np.random.default_rng(seed)
        starts = r.integers(0, 14, len(rows))
        sel = para_words[rows]
        snips = np.stack([sel[i, s:s + 6] for i, s in enumerate(starts)])
        return snips

    def make_batch(i):
        rows = rng.integers(0, n, bsz)
        q = np.concatenate([np.full((bsz, 1), 2, np.int32),
                            snippets(rows, 1000 + i),
                            np.full((bsz, 1), 3, np.int32)], 1)
        c = np.concatenate([np.full((bsz, 1), 2, np.int32),
                            para_words[rows],
                            np.full((bsz, 1), 3, np.int32)], 1)
        return {
            "input_ids_q": jnp.asarray(q),
            "input_ids_c": jnp.asarray(c),
            "input_mask_q": jnp.ones_like(jnp.asarray(q)),
            "input_mask_c": jnp.ones_like(jnp.asarray(c)),
        }

    batches = [make_batch(i) for i in range(steps)]

    for lr, init, wu in itertools.product(
        [1e-3, 3e-4, 1e-4], [0.02, 0.05, 0.1], [100]
    ):
        cfg = BertConfig(dtype=jnp.float32, vocab_size=2005, hidden_size=128,
                         num_layers=2, num_heads=4, intermediate_size=512,
                         max_position_embeddings=64, initializer_range=init,
                         hidden_dropout=0.0, attention_dropout=0.0)
        params = init_retriever_params(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(lr, warmup_steps=wu, total_steps=steps)
        state = init_train_state(params, tx)
        step_fn = jax.jit(make_train_step(cfg, tx))
        key = jax.random.PRNGKey(1)
        t0 = time.monotonic()
        tr = []
        for i, b in enumerate(batches):
            state, m = step_fn(state, b, jax.random.fold_in(key, i))
            if i % 50 == 0 or i == steps - 1:
                tr.append((i, round(float(m["loss"]), 3),
                           round(float(m["acc"]), 3)))
        print(json.dumps({"lr": lr, "init": init, "warmup": wu,
                          "s": round(time.monotonic() - t0, 1),
                          "trace": tr}), flush=True)


if __name__ == "__main__":
    main()
