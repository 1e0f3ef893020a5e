"""Attribute the QA wall-clock residual (wall ms/step - device step ms).

Same world as tools/qa_wall_ab.py. Three interleaved variants, one process:

  A full    — fused sampler + prefetch + train step  (the production loop)
  B prebuilt— batches built once on the host, loop = device_batch + step
              (isolates sampler retrieval-dispatch + host-build cost = A-B)
  C predev  — batches already ON DEVICE, loop = step only
              (isolates host->device transfer cost = B-C)

Run on the TPU: python tools/qa_wall_decomp.py
"""
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
    sampler = OnlineSampler(w["qa_path"], w["tok"], w["db"], index, scfg)
    fused_enc = trainer.query_encoder()

    def step_once(net):
        # host nets take the packed single-transfer path; predev's device
        # dicts fall through to the per-array jit path (no transfer at all)
        trainer.rng, step_rng = jax.random.split(trainer.rng)
        with trainer._state_lock:
            trainer.state, comp = trainer._train_step(trainer.state, net, step_rng)
        float(comp["loss"])

    def nets_of_pass():
        nets = []
        for batch in sampler.load(fused_enc, 5, 4):
            net, rows = batch_pad(batch["net_input"], 4)
            net["question_mask"] = (np.arange(4) < rows).astype(np.int32)
            nets.append(net)
        return nets

    def run_full():
        times, t_prev, n = [], None, 0
        for batch in trainer._prefetched(sampler.load(fused_enc, 5, 4)):
            net, rows = batch_pad(batch["net_input"], 4)
            net["question_mask"] = (np.arange(4) < rows).astype(np.int32)
            step_once(net)
            now = time.perf_counter()
            if t_prev is not None and n >= 4:
                times.append(now - t_prev)
            t_prev = now
            n += 1
        return float(np.median(times)) * 1e3

    prebuilt = nets_of_pass()

    def run_prebuilt():
        times, t_prev = [], None
        for i, net in enumerate(prebuilt):
            step_once(net)
            now = time.perf_counter()
            if t_prev is not None and i >= 4:
                times.append(now - t_prev)
            t_prev = now
        return float(np.median(times)) * 1e3

    ondev = [
        {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v) for k, v in net.items()}
        for net in prebuilt
    ]

    def run_predev():
        times, t_prev = [], None
        for i, net in enumerate(ondev):
            step_once(net)
            now = time.perf_counter()
            if t_prev is not None and i >= 4:
                times.append(now - t_prev)
            t_prev = now
        return float(np.median(times)) * 1e3

    variants = {"full": run_full, "prebuilt": run_prebuilt, "predev": run_predev}
    # compile + one full throwaway round each
    for name, fn in variants.items():
        print(f"warmup {name}: {fn():.1f}", flush=True)

    res = {k: [] for k in variants}
    for rep in range(4):
        for name, fn in variants.items():
            res[name].append(fn())
        print(f"rep {rep}: " + " ".join(f"{k} {res[k][-1]:.1f}" for k in res), flush=True)
    med = {k: round(float(np.median(v)), 1) for k, v in res.items()}
    print(json.dumps({
        **med,
        "sampler_cost_ms": round(med["full"] - med["prebuilt"], 1),
        "transfer_cost_ms": round(med["prebuilt"] - med["predev"], 1),
        "detail": {k: [round(x, 1) for x in v] for k, v in res.items()},
    }))
    sampler.close()


if __name__ == "__main__":
    main()
