"""Measure the QA trainer's host/device overlap on the real chip (round-1
VERDICT follow-up: 'Done = measured QA wall-clock/step on TPU drops
materially below step + host-build sum').

Builds a mid-size synthetic world (6k paragraphs so the online sampler's
top-5000 candidate shape matches the production operating point), runs the
REAL trainer loop (base-size BERT, online retrieval, span matching) with the
prefetch thread off vs on, and reports wall-clock per step. Order:
off -> on -> off (drift control).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/qa_overlap_check.py
"""
from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

WORDS = [f"tok{i}" for i in range(2000)]


def build_world(root: str, n_paras=6000, n_qs=48, para_words=220):
    import random

    from proqa_tpu.data.docdb import DocDB

    rng = random.Random(0)
    paras = []
    for i in range(n_paras):
        words = [rng.choice(WORDS) for _ in range(para_words)]
        if i % 2 == 0:  # half the corpus contains the common answer bigram,
            j = rng.randrange(len(words) - 2)   # so top-5 of a random
            words[j:j + 2] = ["tok1", "tok2"]   # retrieval covers ~97% of qs
        paras.append((f"p{i}", " ".join(words)))
    DocDB.create(os.path.join(root, "docs.db"), paras).close()

    qa = []
    for i in range(n_qs):
        qa.append({"question": " ".join(rng.choice(WORDS) for _ in range(6)),
                   "answer": ["tok1 tok2"]})
    qa_path = os.path.join(root, "qa.jsonl")
    with open(qa_path, "w") as f:
        for r in qa:
            f.write(json.dumps(r) + "\n")

    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS))
    return qa_path, vocab_path, os.path.join(root, "docs.db"), paras


def main():
    import jax
    import jax.numpy as jnp

    from proqa_tpu.index.dense import DenseIndex
    from proqa_tpu.index.idmap import IdMap
    from proqa_tpu.data.docdb import DocDB
    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.reader import QAConfig
    from proqa_tpu.qa.sampler import OnlineSampler, OnlineSamplerConfig
    from proqa_tpu.text.wordpiece import BertTokenizer
    from proqa_tpu.train.qa_trainer import QATrainer, QATrainerConfig

    jax.config.update("jax_default_prng_impl", "rbg")
    root = tempfile.mkdtemp(prefix="qa_overlap_")
    qa_path, vocab_path, db_path, paras = build_world(root)
    print(f"world at {root}", flush=True)

    cfg = BertConfig(dtype=jnp.bfloat16, remat=True, flash_attention=True)
    qcfg = QAConfig(shared_norm=True)
    tok = BertTokenizer.from_vocab_file(vocab_path)
    db = DocDB(db_path)

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((len(paras), 128)).astype(np.float32)
    index = DenseIndex.from_embeddings(
        emb, id_map=IdMap([p[0] for p in paras]), dtype=jnp.bfloat16
    )
    scfg = OnlineSamplerConfig(
        max_query_length=30, max_length=512, candidates=5000,
        question_batch=4, num_workers=0,
    )

    res = {}
    for label, prefetch in [("off1", 0), ("on", 2), ("off2", 0)]:
        tcfg = QATrainerConfig(
            learning_rate=1e-5, questions_per_batch=4, train_k=5,
            num_train_epochs=1, eval_period=-1, prefetch_batches=prefetch,
            output_dir=os.path.join(root, f"run_{label}"),
        )
        trainer = QATrainer(cfg, qcfg, tcfg)  # fresh random params
        trainer.set_corpus(index)
        sampler = OnlineSampler(qa_path, tok, db, index, scfg)

        # run the REAL training inner loop manually, timing steps past warm-up
        from proqa_tpu.data.collate import batch_pad

        it = trainer._prefetched(sampler.load(trainer.query_encoder(), 5, 4))
        times, t_prev = [], None
        n = 0
        for batch in it:
            net, rows = batch_pad(batch["net_input"], 4)
            net["question_mask"] = (np.arange(4) < rows).astype(np.int32)
            trainer.rng, step_rng = jax.random.split(trainer.rng)
            with trainer._state_lock:
                trainer.state, comp = trainer._train_step(
                    trainer.state, trainer._device_batch(net), step_rng
                )
            float(comp["loss"])  # force
            now = time.perf_counter()
            if t_prev is not None and n >= 4:  # skip warm-up steps
                times.append(now - t_prev)
            t_prev = now
            n += 1
        res[f"wall_per_step_ms_{label}"] = round(float(np.median(times)) * 1e3, 1)
        res[f"steps_{label}"] = n
        print(json.dumps(res), flush=True)

    print("FINAL", json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
