"""Interleaved A/B: retrieval_batch grouping (one fused retrieval dispatch
serving 4 train batches) vs per-batch retrieval, same process, same world as
tools/qa_wall_decomp.py."""
from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from proqa_tpu.data.collate import batch_pad
    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.reader import QAConfig
    from proqa_tpu.qa.sampler import OnlineSampler, OnlineSamplerConfig
    from proqa_tpu.train.qa_trainer import QATrainer, QATrainerConfig
    from qa_world import build_qa_world

    jax.config.update("jax_default_prng_impl", "rbg")

    w = build_qa_world()
    index = w["index"]

    on_tpu = jax.default_backend() == "tpu"
    cfg = BertConfig(dtype=jnp.bfloat16, remat=True, flash_attention=on_tpu)
    scfg = OnlineSamplerConfig(
        max_query_length=30, max_length=512, candidates=5000,
        question_batch=4, num_workers=0,
    )
    tcfg = QATrainerConfig(
        learning_rate=1e-5, questions_per_batch=4, train_k=5,
        num_train_epochs=1, eval_period=-1, prefetch_batches=2,
        output_dir=os.path.join(w["root"], "run"),
    )
    trainer = QATrainer(cfg, QAConfig(shared_norm=True), tcfg)
    trainer.set_corpus(index)
    samplers = {
        "per_batch": OnlineSampler(w["qa_path"], w["tok"], w["db"], index, scfg),
        "grouped16": OnlineSampler(
            w["qa_path"], w["tok"], w["db"], index,
            dataclasses.replace(scfg, retrieval_batch=16),
        ),
    }
    enc = trainer.query_encoder()

    def one_pass(sampler):
        times, t_prev, n = [], None, 0
        for batch in trainer._prefetched(sampler.load(enc, 5, 4)):
            net, rows = batch_pad(batch["net_input"], 4)
            net["question_mask"] = (np.arange(4) < rows).astype(np.int32)
            trainer.rng, step_rng = jax.random.split(trainer.rng)
            with trainer._state_lock:
                trainer.state, comp = trainer._train_step(trainer.state, net, step_rng)
            float(comp["loss"])
            now = time.perf_counter()
            if t_prev is not None and n >= 4:
                times.append(now - t_prev)
            t_prev = now
            n += 1
        return float(np.median(times)) * 1e3

    for name, s in samplers.items():
        print(f"warmup {name}: {one_pass(s):.1f}", flush=True)

    res = {k: [] for k in samplers}
    for rep in range(4):
        for name, s in samplers.items():
            res[name].append(one_pass(s))
        print(f"rep {rep}: " + " ".join(f"{k} {res[k][-1]:.1f}" for k in res), flush=True)
    print(json.dumps({
        k: round(float(np.median(v)), 1) for k, v in res.items()
    } | {"detail": {k: [round(x, 1) for x in v] for k, v in res.items()}}))
    for s in samplers.values():
        s.close()


if __name__ == "__main__":
    main()
