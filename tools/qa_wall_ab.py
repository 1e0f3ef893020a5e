"""Interleaved A/B: QA sampler wall-clock with fused single-dispatch
encode+search vs the two-dispatch encoder closure, SAME process, SAME world
(cross-process timings on this tunnel drift more than the effect size).

Builds the bench.py _bench_qa_wall world once, then alternates measuring
full sampler+train-step passes with (A) trainer.query_encoder() [fused] and
(B) a plain closure [unfused]."""
from __future__ import annotations

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
    trainer.set_corpus(w["index"])
    sampler = OnlineSampler(w["qa_path"], w["tok"], w["db"], w["index"], scfg)

    fused_enc = trainer.query_encoder()

    def plain_enc(ids, mask):  # the round-2 two-dispatch shape
        with trainer._state_lock:
            return trainer._encode_query(
                trainer.state.params["retriever"], jnp.asarray(ids), jnp.asarray(mask)
            )

    def one_pass(enc):
        times, t_prev, nsteps = [], None, 0
        for batch in trainer._prefetched(sampler.load(enc, 5, 4)):
            net, rows = batch_pad(batch["net_input"], 4)
            net["question_mask"] = (np.arange(4) < rows).astype(np.int32)
            trainer.rng, step_rng = jax.random.split(trainer.rng)
            with trainer._state_lock:
                trainer.state, comp = trainer._train_step(trainer.state, net, step_rng)
            float(comp["loss"])
            now = time.perf_counter()
            if t_prev is not None and nsteps >= 4:
                times.append(now - t_prev)
            t_prev = now
            nsteps += 1
        return float(np.median(times)) * 1e3

    # compile both variants + a full throwaway round each
    print("warmup fused:", round(one_pass(fused_enc), 1), flush=True)
    print("warmup plain:", round(one_pass(plain_enc), 1), flush=True)

    res = {"fused": [], "plain": []}
    for rep in range(4):
        res["fused"].append(one_pass(fused_enc))
        res["plain"].append(one_pass(plain_enc))
        print(f"rep {rep}: fused {res['fused'][-1]:.1f} plain {res['plain'][-1]:.1f}",
              flush=True)
    print(json.dumps({
        "fused_ms_median": round(float(np.median(res["fused"])), 1),
        "plain_ms_median": round(float(np.median(res["plain"])), 1),
        "fused": [round(x, 1) for x in res["fused"]],
        "plain": [round(x, 1) for x in res["plain"]],
    }))
    sampler.close()


if __name__ == "__main__":
    main()
