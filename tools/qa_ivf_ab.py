"""Interleaved A/B of the QA finetune retrieval mode (round-3 VERDICT #9):
`--use-ivf` (reference online-QA config, IVF nlist=100/nprobe=20,
/root/reference/qa/online_sampler.py:75-79,113) vs the default exact search,
at the production operating point (candidates=5000, question_batch=4,
retrieval_batch=16, 512-tok paras).

World: 100k paras with SPARSE gold (every 50th para carries the answer span)
so gold retention is a real signal — with the bench world's 1-in-2 gold
density every top-5000 trivially contains gold and both modes read 100%.

Reports per mode, medians over interleaved passes in ONE process:
  wall_ms_per_step   end-to-end train wall (sampler + transfer + step)
  failed_retrieval   questions dropped (no gold in top-M, no span in top-k)
  gold_in_topM       mean count of gold paras among the M=5000 candidates

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/qa_ivf_ab.py
"""
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

    tiny = bool(os.environ.get("TINY"))  # CPU smoke: TINY=1 python ...
    n_paras, cand, L, qL = (
        (4000, 500, 64, 12) if tiny else (100_000, 5000, 512, 30)
    )
    w = build_qa_world(n_paras=n_paras, n_questions=48, gold_every=50)
    index = w["index"]

    # sparse gold needs the matched-paras annotation (the reference's
    # prepro_dense output) or every question is dropped: span coverage in a
    # random top-k is ~2% at gold_every=50. Every 50th para carries the
    # planted answer, for every question.
    matched_path = os.path.join(w["root"], "matched.jsonl")
    gold = {f"p{i}": ["tok1 tok2"] for i in range(0, n_paras, 50)}
    with open(matched_path, "w") as f, open(w["qa_path"]) as qf:
        for line in qf:
            qa = json.loads(line)
            f.write(json.dumps(
                {"question": qa["question"], "matched_paras": gold}) + "\n")

    on_tpu = jax.default_backend() == "tpu"
    cfg = (BertConfig.tiny(dtype=jnp.float32) if tiny else
           BertConfig(dtype=jnp.bfloat16, remat=True, flash_attention=on_tpu))
    scfg = OnlineSamplerConfig(
        max_query_length=qL, max_length=L, candidates=cand,
        question_batch=4, num_workers=0, retrieval_batch=16,
    )
    tcfg = QATrainerConfig(
        learning_rate=1e-5, questions_per_batch=4, train_k=5,
        num_train_epochs=1, eval_period=-1, prefetch_batches=2,
        output_dir=os.path.join(w["root"], "run"),
    )
    trainer = QATrainer(cfg, QAConfig(shared_norm=True), tcfg)
    trainer.set_corpus(index)

    ivf = index.to_ivf(nlist=100, nprobe=20)
    samplers = {
        "exact": OnlineSampler(
            w["qa_path"], w["tok"], w["db"], index, scfg,
            matched_para_path=matched_path,
        ),
        "ivf_100_20": OnlineSampler(
            w["qa_path"], w["tok"], w["db"], ivf,
            dataclasses.replace(scfg, exact_search=False),
            matched_para_path=matched_path,
        ),
    }
    enc = trainer.query_encoder()

    def one_pass(sampler):
        sampler.failed_retrieval = 0
        times, golds, t_prev, n = [], [], None, 0
        for batch in trainer._prefetched(sampler.load(enc, 5, 4)):
            golds.append(
                np.asarray(batch["net_input"]["top5000_labels"]).sum(-1).mean()
            )
            net, rows = batch_pad(batch["net_input"], 4)
            net["question_mask"] = (np.arange(4) < rows).astype(np.int32)
            trainer.rng, step_rng = jax.random.split(trainer.rng)
            with trainer._state_lock:
                trainer.state, comp = trainer._train_step(
                    trainer.state, net, step_rng
                )
            float(comp["loss"])
            now = time.perf_counter()
            if t_prev is not None and n >= 4:
                times.append(now - t_prev)
            t_prev = now
            n += 1
        return {
            "wall_ms_per_step": float(np.median(times)) * 1e3,
            "failed_retrieval": sampler.failed_retrieval,
            "gold_in_topM": float(np.mean(golds)),
            "steps": n,
        }

    for name, s in samplers.items():
        print(f"warmup {name}: {json.dumps(one_pass(s))}", flush=True)

    res = {k: [] for k in samplers}
    for rep in range(4):
        for name, s in samplers.items():
            res[name].append(one_pass(s))
        print(f"rep {rep}: " + " ".join(
            f"{k} {res[k][-1]['wall_ms_per_step']:.1f}" for k in res
        ), flush=True)
    out = {}
    for k, reps in res.items():
        out[k] = {
            "wall_ms_per_step": round(float(np.median(
                [r["wall_ms_per_step"] for r in reps])), 1),
            "failed_retrieval": int(np.median(
                [r["failed_retrieval"] for r in reps])),
            "gold_in_topM": round(float(np.mean(
                [r["gold_in_topM"] for r in reps])), 2),
        }
    print("FINAL", json.dumps(out))
    for s in samplers.values():
        s.close()


if __name__ == "__main__":
    main()
